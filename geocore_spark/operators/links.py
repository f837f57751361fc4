"""Web link graph: href extraction, host edges, distributed PageRank.

Curation pipelines use the link graph as a quality prior (domain-level
trust propagates along links — the Common-Crawl ranking / harmonic-
centrality idea). The reference has no web-graph analogue; this is part
of the webtext operator set the brief asks for.

Scale shape: extraction is a JVM regexp over the html column (no
Python); the edge list aggregates once on (src_host, dst_host); PageRank
is the classic synchronous power iteration — each step is one join
(ranks x edges, both keyed on the host) + one groupBy, with the previous
iteration's ranks persisted and released. Nothing driver-side except the
dangling-mass scalar per iteration (a 1-row aggregate, collected —
unavoidable and O(1)). At 10^12 pages the host graph is ~10^8 rows:
executor-sized, and every step is key-partitioned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import urls

# (?i) — real HTML mixes <A HREF=...>; (?s) lets anchor text cross
# newlines. _HREF requires tag context (<...href=) so 'href=' appearing
# in page TEXT (code samples) is not extracted as a link.
_HREF = r'(?is)<[^>]*?href\s*=\s*["\']([^"\']+)["\']'
_A_TAG = r'(?is)<a\s[^>]*?href\s*=\s*["\']([^"\']+)["\'][^>]*>(.*?)</a>'


def _href_host(href: Column) -> Column:
    """Host of an href ONLY when the href is absolute (scheme:// or
    protocol-relative //host); NULL otherwise. urls.url_host alone is
    wrong here: on scheme-less input it falls back to the first path
    segment, so mailto:/javascript:/relative hrefs would fabricate fake
    hosts, while //cdn.example.com/x (a real cross-host link) would
    yield ''."""
    return F.when(
        href.rlike(r"\A[A-Za-z][A-Za-z0-9+.\-]*://"), urls.url_host(href)
    ).when(
        href.rlike(r"\A//[^/]"),
        urls.url_host(F.concat(F.lit("https:"), href)),
    )


def anchor_texts(html: Column) -> Column:
    """array<struct<href,anchor>> of (link target, anchor text) pairs.

    Two passes of the same JVM regexp (group 1 = href, group 2 = inner
    text, non-greedy so adjacent tags don't merge), zipped positionally —
    still zero Python. Anchor text is the classic free supervision signal
    for a page (query-document training pairs, alt titles)."""
    s = html.cast("string")
    return F.arrays_zip(
        F.regexp_extract_all(s, F.lit(_A_TAG), 1).alias("href"),
        F.regexp_extract_all(s, F.lit(_A_TAG), 2).alias("anchor"),
    )


def anchor_corpus(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(dst_host, anchor, n_refs) — anchor-text aggregation per target.

    The anchor-text corpus builder: every page contributes the text it
    uses to describe its link targets; aggregation is one shuffle keyed
    by (dst_host, anchor). Empty/whitespace anchors and non-absolute
    (relative / mailto: / javascript:) targets are dropped; nested markup
    inside the anchor (<a href=x><b>T</b></a>) is stripped to its text."""
    pairs = pages.select(
        F.explode(anchor_texts(F.col(html_col))).alias("a")
    ).select(
        _href_host(F.col("a.href")).alias("dst_host"),
        F.trim(F.regexp_replace(F.col("a.anchor"), r"(?s)<[^>]*>", "")).alias(
            "anchor"
        ),
    )
    return (
        pairs.filter(
            F.col("dst_host").isNotNull()
            & (F.col("dst_host") != "")
            & (F.col("anchor") != "")
        )
        .groupBy("dst_host", "anchor")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )


def extract_links(html: Column) -> Column:
    """array<string> of href attribute values (JVM regexp, no Python).

    Accepts string or binary html (binary is decoded as UTF-8).
    """
    s = html.cast("string")
    return F.regexp_extract_all(s, F.lit(_HREF), 1)


def host_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, n_links) aggregated host-level edge list.

    Non-absolute hrefs (relative paths, mailto:, javascript:) and
    self-links are dropped; protocol-relative //host links count — the
    graph models cross-host endorsement, the signal quality priors care
    about.
    """
    src = urls.url_host(F.col(url_col)).alias("src_host")
    e = (
        pages.select(src, F.explode(extract_links(F.col(html_col))).alias("href"))
        .select("src_host", _href_host(F.col("href")).alias("dst_host"))
        .filter(
            F.col("dst_host").isNotNull()
            & (F.col("dst_host") != "")
            & (F.col("dst_host") != F.col("src_host"))
        )
    )
    return e.groupBy("src_host", "dst_host").agg(F.count(F.lit(1)).alias("n_links"))


def _edge_shares(edges: DataFrame, weighted: bool) -> DataFrame:
    """(src_host, dst_host, __share) with shares summing to 1 per src —
    the frame every PageRank iteration joins against, UNPERSISTED (the
    caller persists).

    Hash-co-partitions the edges by src_host ONCE, up front. Everything
    downstream — the out-degree groupBy, the share join, and above all
    the per-iteration ranks⋈edges join — requires exactly this
    distribution, so Catalyst plans no further exchange over the edge
    set: the repartition exchange is reused (ReusedExchange) inside the
    setup query, and each iteration shuffles only the |hosts|-row rank
    vector to meet the cached side. Without this the persisted frame is
    UNPARTITIONED and every iteration re-shuffles all |edges| rows —
    the shuffle I/O floor that capped core-scaling at 100M edges
    (BENCH/BASELINE.md graph leg). sortWithinPartitions before the
    persist makes the cache carry src_host ordering, so the iteration's
    sort-merge join does zero work on the big side beyond the cache scan
    (only the small shuffled ranks side sorts). Pinned by
    tests/test_plan_shapes.py::test_pagerank_iteration_reuses_edge_cache.
    """
    w = F.col("n_links").cast("double") if weighted else F.lit(1.0)
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    e0 = edges.repartition(n_part, "src_host")
    out = e0.groupBy("src_host").agg(F.sum(w).alias("__out"))
    return (
        e0.join(out, "src_host")
        .select(
            "src_host",
            "dst_host",
            (w / F.col("__out")).alias("__share"),
        )
        .sortWithinPartitions("src_host")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    weighted: bool = True,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Synchronous (optionally personalized) PageRank -> (host, rank).

    Ranks sum to 1 (dangling mass redistributed along the teleport
    vector each step — without this, graphs with sinks leak mass and
    ranks are not comparable across corpora). ``weighted=True`` splits a
    host's vote by link counts; False gives every distinct out-neighbor
    equal share.

    ``seeds`` (a 1-column ``host`` frame, broadcast-small) switches the
    teleport vector from uniform to uniform-over-seeds — TrustRank
    (Gyöngyi et al., VLDB'04): trust flows out of a curated whitelist
    and decays with link distance, so low-rank hosts under a seeded run
    are the spam-demotion prior. Seed hosts absent from the graph are
    ignored; raises if none remain.

    Iteration state is ``localCheckpoint``-ed (lineage truncated each
    step — mandatory for iterative plans, see the inline note). The
    tradeoff: checkpointed partitions are not replayable, so losing an
    executor mid-run fails the job and it restarts from the edge list —
    the standard Spark iterative-graph posture (GraphX/GraphFrames do
    the same); iterations are cheap relative to re-running the corpus
    scan that produced the edges.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    ew = _edge_shares(edges, weighted).persist()
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select("dst_host"))
        .distinct()
        .persist()
    )
    n = nodes.count()  # O(1) scalar, reused every iteration
    if n == 0:
        ew.unpersist()
        nodes.unpersist()
        return nodes.select("host", F.lit(0.0).alias("rank"))
    # teleport vector p: uniform, or uniform over the seed whitelist
    if seeds is None:
        pnodes = nodes.select("host", F.lit(1.0 / n).alias("__p"))
    else:
        s = seeds.select("host").distinct()
        flagged = nodes.join(
            F.broadcast(s.withColumn("__seed", F.lit(1))), "host", "left"
        ).persist()
        n_seed = flagged.filter(F.col("__seed").isNotNull()).count()
        if n_seed == 0:
            flagged.unpersist()
            ew.unpersist()
            nodes.unpersist()
            raise ValueError("no seed host appears in the edge list")
        pnodes = flagged.select(
            "host",
            F.when(F.col("__seed").isNotNull(), F.lit(1.0 / n_seed))
            .otherwise(F.lit(0.0))
            .alias("__p"),
        )
    pnodes = pnodes.persist()
    pnodes.count()
    if seeds is not None:
        flagged.unpersist()
    # localCheckpoint (not persist) for the ITERATED state: each step's
    # plan references the previous state twice, so without lineage
    # truncation the logical tree doubles per iteration and plan
    # rendering alone goes exponential (measured: a 15-iteration run
    # spent >60 s of driver CPU inside explainString before any task
    # ran). Checkpointing makes every iteration's plan O(1). Data lives
    # in executor storage (memory+disk); superseded iterations are
    # released by the ContextCleaner when their frame goes out of scope.
    ranks = pnodes.select("host", F.col("__p").alias("rank")).localCheckpoint(
        eager=True
    )
    try:
        for _ in range(iters):
            contribs = (
                ranks.join(ew, ranks["host"] == ew["src_host"])
                .groupBy("dst_host")
                .agg(F.sum(F.col("rank") * F.col("__share")).alias("__c"))
                .persist()
            )
            # Dangling mass without touching the edges again: ranks sum
            # to 1 every step and each host WITH out-links passes its
            # whole rank on (its shares sum to 1), so the mass sitting on
            # sinks is 1 - sum(contributions). The alternative — an
            # anti-join against the out-degree table — reshuffles the
            # full |edges| groupBy every iteration.
            live = contribs.agg(
                F.coalesce(F.sum("__c"), F.lit(0.0))
            ).collect()[0][0]
            dangling = max(0.0, 1.0 - live)
            ranks = (
                pnodes.join(
                    contribs, pnodes["host"] == contribs["dst_host"], "left"
                )
                .select(
                    "host",
                    (
                        F.lit(1.0 - damping) * F.col("__p")
                        + F.lit(damping * dangling) * F.col("__p")
                        + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)  # materializes + cuts lineage
            )
            contribs.unpersist()
        return ranks
    finally:
        ew.unpersist()
        nodes.unpersist()
        pnodes.unpersist()


def neighborhood_stats(
    edges: DataFrame, max_dist: int = 4, lgk: int = 12, transpose: bool = True
) -> DataFrame:
    """HyperBall (Boldi & Vigna, 2013): per-host reachable-set size and
    harmonic centrality, estimated with mergeable HLL sketches.

    The algorithm behind the Common Crawl host ranking: ball(v, r+1) =
    {v} ∪ ⋃ ball(w, r) over out-neighbors w, with each ball held as a
    fixed-size HLL sketch instead of a set. One iteration is one join
    (sketches × edges on the *dst* host) plus one `hll_union_agg` groupBy
    on the src host — all JVM-side via Spark 4's native DataSketches
    functions, no Python in the loop. Per-host state is ~2^lgk bytes
    regardless of graph size, so 10^8 hosts ≈ 400 GB cluster-wide at the
    default lgk — executor-sized, key-partitioned, never driver-side.

    Returns ``(host, reachable_est, harmonic_centrality)`` where
    harmonic_centrality(v) = Σ_r (|ball(v,r)| − |ball(v,r−1)|) / r for
    r = 1..max_dist (truncated harmonic centrality; at small
    cardinalities the HLL operates exactly, pinned vs BFS in tests).

    ``transpose=True`` (default) grows balls along *incoming* links, so
    d(u, v) is the distance from u to v and the result is the classic
    centrality ranking ("how easily is v reached") — what Common Crawl
    ranks hosts by. ``transpose=False`` measures outgoing reach instead
    ("how much can v reach"), the crawl-seed-selection view.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    if transpose:
        edges = edges.select(
            F.col("dst_host").alias("src_host"),
            F.col("src_host").alias("dst_host"),
        )
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select("dst_host"))
        .distinct()
    )
    e = edges.select("src_host", "dst_host").persist()
    # ball(v, 0) = {v}: a one-element sketch per host
    # localCheckpoint, not persist: each round references the previous
    # state TWICE (ball growth + est/harmonic join), so an untruncated
    # lineage doubles per round and driver-side plan handling goes
    # exponential (see the same note in pagerank).
    state = (
        nodes.groupBy("host")
        .agg(F.hll_sketch_agg(F.col("host"), F.lit(lgk)).alias("ball"))
        .withColumn("est", F.hll_sketch_estimate("ball"))
        .withColumn("harmonic", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    try:
        for r in range(1, max_dist + 1):
            grown = (
                e.join(state, e["dst_host"] == state["host"])
                .select(F.col("src_host").alias("host"), "ball")
                .unionByName(state.select("host", "ball"))
                .groupBy("host")
                .agg(F.hll_union_agg("ball").alias("ball"))
            )
            state = (
                grown.withColumn("new_est", F.hll_sketch_estimate("ball"))
                .join(state.select("host", "est", "harmonic"), "host")
                .select(
                    "host",
                    "ball",
                    F.col("new_est").alias("est"),
                    (
                        F.col("harmonic")
                        + (F.col("new_est") - F.col("est")) / F.lit(float(r))
                    ).alias("harmonic"),
                )
                .localCheckpoint(eager=True)  # materializes + cuts lineage
            )
        return state.select(
            "host",
            F.col("est").cast("bigint").alias("reachable_est"),
            F.round("harmonic", 6).alias("harmonic_centrality"),
        )
    finally:
        e.unpersist()


def _edge_weights_int(edges: DataFrame, weighted: bool) -> DataFrame:
    """(src_host, dst_host, w, out) in BIGINT for the exact PageRank —
    same co-partition/sort discipline as _edge_shares (one up-front
    exchange on src_host, reused by every iteration), UNPERSISTED (the
    caller persists)."""
    w = F.col("n_links").cast("long") if weighted else F.lit(1).cast("long")
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    e0 = edges.repartition(n_part, "src_host")
    out = e0.groupBy("src_host").agg(F.sum(w).alias("out"))
    return (
        e0.join(out, "src_host")
        .select("src_host", "dst_host", w.alias("w"), "out")
        .sortWithinPartitions("src_host")
    )


def pagerank_exact(
    edges: DataFrame,
    iters: int = 3,
    damp_num: int = 85,
    damp_den: int = 100,
    mass: int = 1_000_000_000_000,
    weighted: bool = True,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """PageRank in exact BIGINT micro-units -> (host, rank_micro).

    Same power iteration as :func:`pagerank`, reformulated so every step
    is integer arithmetic: a total mass of ``mass`` units is spread
    uniformly (``mass div N`` per host), each host passes
    ``(rank * w) div out`` units along each out-edge, and the residue —
    sink mass plus integer-division dust — is redistributed uniformly
    each step (``D div N``). Update rule per host::

        r' = ((damp_den - damp_num) * u0
              + damp_num * (D div N + S)) div damp_den

    with ``u0 = mass div N``, ``S`` = summed in-edge contributions and
    ``D`` = total mass minus total contributions. Integer sums commute
    exactly, so the result is independent of partitioning AND bit-exactly
    reproducible by any engine with 64-bit integer division — the ANSI-SQL
    oracle replays it with unrolled iterations (floor vs truncating
    ``div`` agree because every operand is non-negative). The double
    variant stays the production operator (no per-step div bias); this is
    the verification-grade twin, and the values agree to ~1/mass
    relative (pinned in tests).

    ``seeds`` (a 1-column ``host`` frame) switches the teleport vector to
    uniform-over-seeds — the exact twin of TrustRank (see
    :func:`pagerank`): seed hosts carry ``mass div n_seed`` teleport
    units and receive the residual as ``D div n_seed``; non-seeds get 0
    from both terms, so the arithmetic stays overflow-safe (no
    ``D * p`` product ever forms). Seed hosts absent from the graph are
    ignored; raises if none remain.

    Overflow bound: ``rank * w`` <= ``mass * max(n_links)`` must stay
    below 2^63 — at the default mass, per-edge link counts up to ~9e6.
    Plan shape matches :func:`pagerank`: edges co-partitioned once,
    iterations shuffle only the rank vector, state localCheckpoint-ed.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if not 0 < damp_num < damp_den:
        raise ValueError("need 0 < damp_num < damp_den")
    ew = _edge_weights_int(edges, weighted).persist()
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select("dst_host"))
        .distinct()
        .persist()
    )
    try:
        n = nodes.count()
        if n == 0:
            return nodes.select(
                "host", F.lit(0).cast("long").alias("rank_micro")
            )
        # teleport vector: (p0, sflag) per host + the residual divisor.
        # Uniform = every host is a "seed" of the full set, so ONE loop
        # serves both modes with identical arithmetic.
        if seeds is None:
            n_div = n
            pnodes = nodes.select(
                "host",
                F.lit(mass // n).cast("long").alias("p0"),
                F.lit(1).cast("long").alias("sflag"),
            ).persist()
        else:
            s = seeds.select("host").distinct()
            flagged = nodes.join(
                F.broadcast(s.withColumn("__seed", F.lit(1))), "host", "left"
            ).persist()
            n_div = flagged.filter(F.col("__seed").isNotNull()).count()
            if n_div == 0:
                flagged.unpersist()
                raise ValueError("no seed host appears in the edge list")
            sflag = F.when(F.col("__seed").isNotNull(), 1).otherwise(0)
            pnodes = flagged.select(
                "host",
                (sflag * F.lit(mass // n_div)).cast("long").alias("p0"),
                sflag.cast("long").alias("sflag"),
            ).persist()
            pnodes.count()
            flagged.unpersist()
        ranks = pnodes.select("host", F.col("p0").alias("r")).localCheckpoint(
            eager=True
        )
        for _ in range(iters):
            contribs = (
                ranks.join(ew, ranks["host"] == ew["src_host"])
                .groupBy("dst_host")
                .agg(F.sum(F.expr("(r * w) div out")).alias("s"))
                .persist()
            )
            live = contribs.agg(
                F.coalesce(F.sum("s"), F.lit(0).cast("long"))
            ).collect()[0][0]
            total = ranks.agg(F.sum("r")).collect()[0][0]
            dshare = (total - live) // n_div
            ranks = (
                pnodes.join(
                    contribs, pnodes["host"] == contribs["dst_host"], "left"
                )
                .select(
                    "host",
                    F.expr(
                        f"CAST(({damp_den - damp_num} * p0 + {damp_num} * "
                        f"(sflag * {dshare} + coalesce(s, CAST(0 AS BIGINT)"
                        f"))) div {damp_den} AS BIGINT)"
                    ).alias("r"),
                )
                .localCheckpoint(eager=True)
            )
            contribs.unpersist()
        return ranks.select("host", F.col("r").alias("rank_micro"))
    finally:
        ew.unpersist()
        nodes.unpersist()
        try:
            pnodes.unpersist()
        except NameError:
            pass


def hits_exact(
    edges: DataFrame,
    iters: int = 3,
    mass: int = 1_000_000_000_000,
    weighted: bool = True,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg, JACM'99 — public paper) in
    exact integer units -> (host, auth_micro, hub_micro).

    Power iteration with L1 normalization, reformulated so every step
    is deterministic integer arithmetic: hubs start uniform
    (``mass div N``); an authority step sums weighted hub scores over
    in-edges; the raw vector is rescaled back to total ``mass`` as
    ``(raw * mass) div total`` — the product runs in DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB twin), and can NEVER overflow there: raw
    is a BIGINT (< 2^63 ~ 9.2e18, ANSI raises upstream otherwise), so
    raw * mass < 9.2e30 << 1e38. Hub step mirrors with out-edges.
    Integer sums commute, so results are partitioning-independent and
    bit-exactly replayable by an unrolled ANSI-SQL twin.

    L1 (sum) normalization replaces the textbook L2 — same fixpoint
    direction, and it keeps the arithmetic rational; the per-step
    ``div`` dust (< 1 unit per node) is the verification-grade
    trade-off, exactly like :func:`pagerank_exact` vs :func:`pagerank`.

    Plan shape: edges filtered and co-partitioned ONCE on src_host
    (HITS never needs the out-degree, so this skips
    ``_edge_weights_int``'s aggregation+join entirely); each iteration
    shuffles only the (host, score) vectors; vector lineage
    localCheckpoint-ed. Nodes with no in-edges get authority 0; no
    out-edges, hub 0. NULL endpoints/weights are dropped like every
    other key column; a NEGATIVE weight raises (like sssp's guard) —
    the div/floor parity the SQL twin rests on assumes every operand
    is non-negative, and a negative total would silently diverge
    (Spark truncates toward zero, DuckDB's replay floors). A graph
    left with no usable edges raises (a silent None total would
    otherwise reach the SQL literal).
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    w = F.col("n_links").cast("long") if weighted else F.lit(1).cast("long")
    w_ok = F.when(w >= 0, w).otherwise(
        F.raise_error(
            F.lit("hits_exact: negative edge weight")
        ).cast("long")
    )
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    filtered = edges.where(
        F.col("src_host").isNotNull()
        & F.col("dst_host").isNotNull()
        & w.isNotNull()
    )
    ew = (
        filtered.repartition(n_part, "src_host")
        .select("src_host", "dst_host", w_ok.alias("w"))
        .sortWithinPartitions("src_host")
        .persist()
    )
    nodes = (
        filtered.select(F.col("src_host").alias("host"))
        .union(filtered.select("dst_host"))
        .distinct()
        .persist()
    )
    pending: list = []
    try:
        n = nodes.count()
        if n == 0:
            return nodes.select(
                "host",
                F.lit(0).cast("long").alias("auth_micro"),
                F.lit(0).cast("long").alias("hub_micro"),
            )
        h = nodes.select(
            "host", F.lit(mass // n).cast("long").alias("v")
        ).localCheckpoint(eager=True)
        a = None
        for _ in range(iters):
            araw = (
                h.join(ew, h["host"] == ew["src_host"])
                .groupBy(F.col("dst_host").alias("host"))
                .agg(F.sum(F.col("v") * F.col("w")).alias("raw"))
                .persist()
            )
            pending.append(araw)
            a_tot = araw.agg(F.sum("raw")).collect()[0][0]
            if not a_tot:  # None (no rows) or 0: nothing to normalize
                raise ValueError(
                    "hits_exact: no usable edge contributions "
                    "(empty graph after null filtering, or all-zero weights)"
                )
            a = araw.select(
                "host",
                F.expr(
                    f"CAST((CAST(raw AS DECIMAL(38,0)) * {mass}) "
                    f"div {a_tot} AS BIGINT)"
                ).alias("v"),
            ).localCheckpoint(eager=True)
            pending.pop().unpersist()
            hraw = (
                a.join(ew, a["host"] == ew["dst_host"])
                .groupBy(F.col("src_host").alias("host"))
                .agg(F.sum(F.col("v") * F.col("w")).alias("raw"))
                .persist()
            )
            pending.append(hraw)
            h_tot = hraw.agg(F.sum("raw")).collect()[0][0]
            if not h_tot:
                raise ValueError(
                    "hits_exact: hub step lost all mass "
                    "(authority scores all rounded to zero)"
                )
            h = hraw.select(
                "host",
                F.expr(
                    f"CAST((CAST(raw AS DECIMAL(38,0)) * {mass}) "
                    f"div {h_tot} AS BIGINT)"
                ).alias("v"),
            ).localCheckpoint(eager=True)
            pending.pop().unpersist()
        return (
            nodes.join(
                a.withColumnRenamed("v", "auth_micro"), "host", "left"
            )
            .join(h.withColumnRenamed("v", "hub_micro"), "host", "left")
            .select(
                "host",
                F.coalesce(F.col("auth_micro"), F.lit(0))
                .cast("long")
                .alias("auth_micro"),
                F.coalesce(F.col("hub_micro"), F.lit(0))
                .cast("long")
                .alias("hub_micro"),
            )
        )
    finally:
        for f in pending:  # a raise mid-iteration left these cached
            f.unpersist()
        ew.unpersist()
        nodes.unpersist()


def assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity of an undirected graph: the Pearson
    correlation of endpoint degrees over edges (Newman, PRL'02 —
    public paper), each undirected edge counted in BOTH orientations
    (the standard symmetrization).

    Built on :func:`metrics.grouped_corr`'s exact-BIGINT moment
    machinery, so the DOUBLE correlation is bit-exactly replayable by
    an ANSI-SQL twin. Output: EXACTLY one row (n_endpoints,
    assortativity) — n_endpoints = 2 * |edges|; assortativity NULL on
    degree-regular graphs (zero variance) AND on graphs with no valid
    edges (where n_endpoints is 0, not a missing row). Self-loops,
    nulls, and parallel edges dropped.

    The canonical edge frame is localCheckpoint-ed: it feeds the degree
    union twice and the join once, and the dedup shuffle would
    otherwise re-run wherever ReusedExchange misses (the kcore
    materialize-the-reused-frame discipline).
    """
    from geocore_spark.operators import metrics

    u, v = F.col(src), F.col(dst)
    e = (
        edges.where(u.isNotNull() & v.isNotNull() & (u != v))
        .select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(
        deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b"
    )
    both = ed.select(
        F.col("da").alias("x"), F.col("db").alias("y")
    ).unionAll(ed.select(F.col("db").alias("x"), F.col("da").alias("y")))
    out = metrics.grouped_corr(
        both.withColumn("g", F.lit(1)), "g", "x", "y"
    )
    # LEFT-join from a literal one-row frame: an empty graph yields
    # (0, NULL) instead of zero rows, honoring the one-row contract
    anchor = edges.sparkSession.range(1).select(F.lit(1).alias("g"))
    return anchor.join(out, "g", "left").select(
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_endpoints"),
        F.col("corr").alias("assortativity"),
    )
