"""Graph motif counting: distributed exact triangle counts.

Extends the link-graph family (``operators/links.py`` — PageRank,
centrality, components) with the classic motif operator the reference
lacks entirely (its graph surface is pandas-side; see
``modeling/datasets/test_data.py`` for the reference's flat-table view).
Triangle counts feed spam/quality features on web host graphs
(clustering coefficient of a host's neighborhood).

Algorithm: degree-oriented wedge closing (Suri & Vassilvitskii,
"Counting triangles and the curse of the last reducer", WWW'11 — public
paper). Orient every undirected edge from its (degree, id)-smaller
endpoint to the larger; each vertex's oriented out-degree is then
O(sqrt(m)), so the wedge self-join is bounded even on power-law graphs
where a raw neighbor join explodes on hub vertices. Every triangle is
produced exactly once (its three vertices are totally ordered by
(degree, id); the wedge pivots at the smallest).

Scale shape: distinct + degree groupBy + two degree-attach joins + one
wedge self-join keyed on the pivot + one closing equi-join keyed on the
(x, y) pair. All hash equi-joins, no cartesian, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["triangle_count", "triangles", "ktruss", "clustering_coefficient"]


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected edges as (a, b) with a < b; self-loops and
    null endpoints dropped."""
    u, v = F.col(src), F.col(dst)
    return (
        edges.where(u.isNotNull() & v.isNotNull() & (u != v))
        .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .distinct()
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Enumerate each undirected triangle exactly once.

    Returns columns (ta, tb, tc): the triangle's vertices with ``ta`` the
    wedge pivot (the (degree, id)-smallest vertex) and (tb, tc) its
    (degree, id)-ordered other corners. Note tb/tc order follows the
    degree orientation, not plain id order.
    """
    return _triangles_canonical(_canonical_edges(edges, src, dst))


def _triangles_canonical(e: DataFrame, deg: DataFrame | None = None) -> DataFrame:
    """:func:`triangles` body for an ALREADY canonical (a < b, distinct,
    loop-free) edge frame — skips the re-canonicalization shuffle; the
    peel loop in :func:`ktruss` keeps edges canonical by construction
    and calls this each round. Pass ``deg`` (node, deg over distinct
    neighbors) when the caller already computed it — e.g.
    :func:`clustering_coefficient` — to skip the duplicate degree
    shuffle."""
    if deg is None:
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # Wedges at pivot u: pick the (deg, id)-ordered pair of out-neighbors
    # so the closing edge (x -> y) matches its oriented spelling.
    o1 = oriented.select(
        F.col("u").alias("wu"), F.col("v").alias("x"), F.col("dv").alias("dx")
    )
    o2 = oriented.select(
        F.col("u").alias("wu"), F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    wedge = o1.join(o2, "wu").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    return wedge.join(closing, ["x", "y"]).select(
        F.col("wu").alias("ta"), F.col("x").alias("tb"), F.col("y").alias("tc")
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the undirected graph.

    Returns (node, n_triangles) for every node that participates in at
    least one triangle (nodes with zero triangles are absent — join back
    against your vertex set if you need explicit zeros). The global
    triangle count is ``sum(n_triangles) / 3``.
    """
    tri = triangles(edges, src, dst)
    nodes = (
        tri.select(F.col("ta").alias("node"))
        .unionAll(tri.select(F.col("tb").alias("node")))
        .unionAll(tri.select(F.col("tc").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def ktruss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 60,
) -> DataFrame:
    """Edges of the k-truss: the maximal subgraph where every edge
    participates in >= k-2 triangles (support counted WITHIN the
    surviving subgraph). The edge-grained sibling of :func:`kcore` —
    a stricter community filter (a k-truss is always inside the
    (k-1)-core, never vice versa).

    Iterative peeling: each round recounts per-edge support via the
    degree-oriented :func:`triangles` enumeration (each triangle
    credits its three canonical edges once), drops edges below
    support k-2, and repeats to a fixpoint. Per-round lineage is
    truncated with ``localCheckpoint(eager=True)`` — the kcore
    discipline: support recount references the edge frame ~5x, so a
    persist-only loop re-expands the logical plan 5^rounds-fold.
    ``max_iter`` exhaustion RAISES rather than returning a
    not-yet-fixpoint edge set. k=2 is the whole (deduped) graph by
    definition and returns immediately.

    Returns canonical surviving edges (a, b) with a < b. An ANSI-SQL
    twin unrolls the rounds (fixpoint rounds are idempotent, so
    over-unrolling is safe).
    """
    if k < 2:
        raise ValueError("ktruss: k must be >= 2")
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    if k == 2:
        return e
    thresh = k - 2
    for _ in range(max_iter):
        # edges stay canonical across rounds (supp keys by (a, b)), so
        # the enumeration skips triangles()'s re-canonicalize shuffle
        tri = _triangles_canonical(e)
        sides = (
            tri.select(F.col("ta").alias("p"), F.col("tb").alias("q"))
            .unionAll(tri.select(F.col("ta").alias("p"), F.col("tc").alias("q")))
            .unionAll(tri.select(F.col("tb").alias("p"), F.col("tc").alias("q")))
        )
        supp = (
            sides.select(
                F.least(F.col("p"), F.col("q")).alias("a"),
                F.greatest(F.col("p"), F.col("q")).alias("b"),
            )
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("s"))
        )
        # checkpoint FIRST, fixpoint-check against the materialized
        # frame: checking unpersisted lineage and then checkpointing
        # would run the whole triangle chain twice per round
        good = (
            supp.where(F.col("s") >= thresh)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        if e.join(good, ["a", "b"], "left_anti").isEmpty():
            return good
        e = good
    raise RuntimeError(
        f"ktruss: not converged after {max_iter} rounds; raise max_iter"
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node, exact micro-units:
    cc = 2 * triangles(v) / (deg(v) * (deg(v) - 1)) — how close a
    node's neighborhood is to a clique (the spam-farm / community
    signal the triangle counts feed).

    cc_micro = (2_000_000 * n_triangles) div (deg * (deg - 1)) in
    exact BIGINT; degree-1 nodes return NULL (undefined), nodes in no
    triangle return 0. Degrees count distinct neighbors (canonical
    dedup first, shared with :func:`triangles`).

    Scale shape: the triangle enumeration's joins plus one degree
    groupBy and one co-partitioned LEFT join — no new shuffle class.
    Overflow is impossible: n_triangles <= deg^2 and 2e6 * deg^2
    needs deg > ~2^21 distinct neighbors to wrap, but deg is bounded
    by the distinct node count per partition key long before that;
    a guard still raises past 2^20 for honesty.
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # hand deg to the enumeration: it needs the identical frame for
    # orientation, and recomputing it would duplicate a full shuffle
    tri = _triangles_canonical(e, deg=deg)
    pern = (
        tri.select(F.col("ta").alias("node"))
        .unionAll(tri.select(F.col("tb").alias("node")))
        .unionAll(tri.select(F.col("tc").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    j = deg.join(pern, "node", "left")
    ok = F.when(F.col("deg") <= F.lit(1 << 20), F.lit(1)).otherwise(
        F.raise_error(
            F.lit("clustering_coefficient: degree too large for micro scale")
        ).cast("int")
    )
    ntri = F.coalesce(F.col("n_triangles"), F.lit(0))
    # ok FIRST: And short-circuits (the _guarded_moments rule)
    return j.select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        ntri.cast("long").alias("n_triangles"),
        F.when(
            (ok == 1) & (F.col("deg") >= 2),
            F.expr(
                "(2000000 * coalesce(n_triangles, CAST(0 AS BIGINT)))"
                " div (deg * (deg - 1))"
            ),
        ).cast("long").alias("cc_micro"),
    )
