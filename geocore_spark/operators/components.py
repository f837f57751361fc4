"""Connected components over near-duplicate pair graphs.

Dedup pipelines emit *pairs* (MinHash/SimHash/cosine); deduplication
needs *clusters* (every transitively-connected doc under one canonical
id). This is the alternating large-star / small-star iteration from
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14)
expressed in DataFrame ops — each round is two self-joins + aggregations,
state is one (node, label) table, and convergence is checked with a
single count. For duplicate graphs (small diameter) it converges in a
handful of rounds; no driver-side graph ever materializes.

Simplified here to the classic "hash-to-min" label propagation: each
round every node adopts the min label in its neighborhood (including via
reverse edges); rounds double the reach, so O(log diameter) iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id reachable. Deterministic, partitioning-independent."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        # every round self-joins against this frame — without the persist
        # the whole upstream pairs pipeline (for LSH dedup: the banded
        # self-join) re-executes once per round x max_iter
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        # propagate: every node adopts min(own label, neighbors' labels)
        neigh = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("src", "node")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        # localCheckpoint truncates lineage — without it each round's plan
        # embeds every previous round and Catalyst planning time explodes
        # exponentially (the standard iterative-algorithm failure mode).
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
        # label shortcut (pointer jumping): relabel via the label's label,
        # which doubles convergence speed on chains
        lab2 = labels.select(
            F.col("node").alias("label"), F.col("label").alias("label2")
        )
        labels = (
            labels.join(lab2, "label", "left")
            .select(
                "node", F.least(F.col("label"), F.coalesce("label2", "label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    if not converged:
        # returning unconverged labels would silently split one duplicate
        # cluster into several keeper_ids — duplicates survive dedup with
        # no signal anywhere; fail loudly instead (hash-to-min + pointer
        # jumping covers any realistic diameter in far fewer rounds)
        raise RuntimeError(
            f"connected_components: not converged after {max_iter} rounds; "
            "raise max_iter (graph diameter is pathologically large)"
        )
    return labels.withColumnRenamed("label", "component")


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full dedup resolution: every row keeps ``keeper_id`` = the min id
    of its near-duplicate cluster (itself when unpaired)."""
    comp = connected_components(pairs, id_a, id_b).select(
        # reserved name: df may legitimately carry a 'component' column
        F.col("node").alias(id_col),
        F.col("component").alias("__cc_component"),
    )
    return (
        df.join(comp, id_col, "left")
        .withColumn("keeper_id", F.coalesce("__cc_component", F.col(id_col)))
        .drop("__cc_component")
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 60,
) -> DataFrame:
    """Nodes of the k-core: the maximal subgraph where every node keeps
    degree >= k — the standard density filter for link-graph quality
    (spam farms shed fast; genuinely interlinked hubs survive).

    Iterative peeling: each round drops every node whose CURRENT degree
    is below k (degrees recomputed on the surviving subgraph), until a
    fixpoint. Rounds are one degree groupBy + two anti-joins over the
    shrinking edge list; the previous round's persisted frame is
    released each time. Converges in at most n rounds (each round that
    continues removes >= 1 node); exhaustion of ``max_iter`` RAISES
    like :func:`connected_components` rather than returning a
    not-yet-fixpoint set. Degree counts distinct neighbors (parallel
    edges and self-loops dropped up front).

    Returns one ``node`` column. Empty for k larger than the densest
    core. An ANSI-SQL twin unrolls the peel rounds (fixpoint rounds are
    idempotent, so unrolling MORE rounds than needed is safe).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u, v = F.col(src), F.col(dst)
    # lineage discipline: every round's frame references its parent ~4x
    # (anti-join left side + twice through the degree union), so a
    # persist-only loop grows the LOGICAL PLAN 4^rounds-fold — observed
    # as a 2 GB plan string and a 24-core analysis hang at ~10 rounds
    # (the Spark-side sibling of the DuckDB closure-CTE re-expansion
    # note in CLAUDE.md). localCheckpoint(eager=True) each round
    # materializes AND truncates the plan, keeping every round O(1);
    # superseded checkpoint RDDs are reclaimed by the ContextCleaner.
    e = (
        edges.where(u.isNotNull() & v.isNotNull() & (u != v))
        .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        bad = deg.where(F.col("deg") < k).select("node")
        if bad.isEmpty():
            return deg.select("node")
        e = (
            e.join(bad.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(bad.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"kcore: not converged after {max_iter} rounds; raise max_iter"
    )


def sssp(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    directed: bool = True,
    max_iter: int = 60,
) -> DataFrame:
    """Single-source shortest paths by synchronous Bellman-Ford
    relaxation — (node, dist) for every node reachable from ``source``,
    exact BIGINT distances.

    Weights must be NON-NEGATIVE integers (negative raises: with the
    synchronous relaxation a negative cycle would silently converge to
    wrong distances within max_iter); ``weight_col`` None means unit
    weights (hop counts). Each round relaxes every edge once:
    dist'[v] = min(dist[v], min over (u,v) of dist[u] + w) — one
    dist-to-edges equi-join on the source key + one min groupBy, state
    localCheckpoint-ed (the kcore lineage discipline). Converges in
    <= longest-shortest-path-hops rounds; ``max_iter`` exhaustion
    RAISES rather than returning partial distances. ``directed=False``
    mirrors every edge up front.

    An ANSI-SQL twin unrolls the rounds (fixpoint rounds are
    idempotent, over-unrolling is safe). Overflow: dist <= hops *
    max_w; ANSI raises on the add, and a guard raises when
    max_w * max_iter approaches 2^62 up front.
    """
    if max_iter < 1:
        raise ValueError("sssp: max_iter must be >= 1")
    u, v = F.col(src), F.col(dst)
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    w_ok = F.when(w >= 0, w).otherwise(
        F.raise_error(F.lit("sssp: negative edge weight")).cast("long")
    )
    e = edges.where(u.isNotNull() & v.isNotNull()).select(
        u.alias("eu"), v.alias("ev"), w_ok.alias("w")
    )
    if not directed:
        e = e.unionAll(
            e.select(
                F.col("ev").alias("eu"), F.col("eu").alias("ev"), "w"
            )
        )
    e = e.localCheckpoint(eager=True)
    spark = edges.sparkSession
    # seed from the literal: the source is at distance 0 even with no
    # out-edges (or an empty graph — the loop then converges round 1)
    seed = spark.range(1).select(
        F.lit(source).alias("node"), F.lit(0).cast("long").alias("dist")
    )
    maxw = e.agg(F.max("w")).collect()[0][0]
    if maxw is not None and float(maxw) * max_iter >= float(2**62):
        raise ValueError("sssp: max weight * max_iter would overflow BIGINT")
    dist = seed.localCheckpoint(eager=True)
    for _ in range(max_iter):
        relaxed = (
            dist.join(e, dist["node"] == e["eu"])
            .select(F.col("ev").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
            .unionAll(dist.select("node", "dist"))
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        improved = relaxed.join(
            dist.withColumnRenamed("dist", "_old"), "node", "left"
        ).where(
            F.col("_old").isNull() | (F.col("dist") < F.col("_old"))
        )
        if improved.isEmpty():
            return relaxed
        dist = relaxed
    raise RuntimeError(
        f"sssp: not converged after {max_iter} rounds; raise max_iter"
    )
