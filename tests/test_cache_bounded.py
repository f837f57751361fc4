"""Repeated-invocation cache boundedness (VERDICT r3 item #7).

Every operator family that persists or checkpoints internally must leave
a long-lived session's storage BOUNDED: N invocations may not accumulate
N input-sized frames. The discipline comes in three flavors, all pinned
here by calling each family 20 times and asserting the persistent-RDD
count settles back to ~baseline:

- finally-released persists (links.pagerank/hits, components, the
  snapshots pruned-read stats frame): released before return, growth 0;
- the applicationId-keyed bounded registry (metrics.exact_ntile and the
  rfm handoff): at most one live internal frame set per context;
- localCheckpoint state (iterative graph ops): EXCLUDED from the hard
  count. Superseded checkpoints are unreferenced garbage the
  ContextCleaner reaps on JVM GC (measured: 27 live frames right after
  20 hits_exact calls, 0 after 12 System.gc rounds) — reclaimable by
  design, evictable-to-disk meanwhile, and the reap latency is GC-
  nondeterministic, so a count assertion on them pins the garbage
  collector, not the operator. The documented posture (pagerank/motifs
  docstrings) is exactly GraphX's.

setjoin/fuzzyjoin are included as no-persist regressions: their
exchange reuse comes from shared lineage, not caching, so any future
persist added there without a release would fail this file first.
"""

from __future__ import annotations

import gc
import time

from pyspark.sql import functions as F

from geocore_spark.operators import components, fuzzyjoin, links, motifs
from geocore_spark.operators import product_analytics as pa
from geocore_spark.operators import setjoin

N_CALLS = 20
# at most the registry's ONE live internal frame set — rfm's is three
# frames (the r/f/m ranged handoff), the largest legitimate residue
SLACK = 3


def _persisted(spark) -> int:
    """Count live persisted RDDs EXCLUDING localCheckpoint frames —
    the leak class this file guards is an unreleased .persist()/.cache()
    (CacheManager entries nobody will ever free); checkpoint frames are
    ContextCleaner-managed garbage, excluded per the module docstring."""
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return sum(
        1 for k in m.keys() if "localCheckpoint" not in m[k].toString()
    )


def _settled(spark, base: int, limit: int, timeout_s: float = 30.0) -> int:
    """GC and poll until the persistent-RDD count settles within
    ``base + limit`` or the timeout passes; return the final growth."""
    deadline = time.time() + timeout_s
    while True:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        grown = _persisted(spark) - base
        if grown <= limit or time.time() > deadline:
            return grown
        time.sleep(1.0)


def _edges(spark, n=60):
    return spark.createDataFrame(
        [(f"h{i}", f"h{(i * 7 + 3) % n}", 1) for i in range(3 * n)],
        "src_host string, dst_host string, n_links long",
    )


def _quiesce(spark) -> int:
    """Settle to a stable baseline: GC until the persistent-RDD count
    stops shrinking (a PREVIOUS family's checkpoints being reaped
    mid-measurement would otherwise contaminate the delta both ways)."""
    prev = _persisted(spark)
    for _ in range(10):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        cur = _persisted(spark)
        if cur >= prev:
            return cur
        prev = cur
    return prev


def _run_family(spark, fn, label):
    base = _quiesce(spark)
    for _ in range(N_CALLS):
        fn()
    grown = _settled(spark, base, SLACK)
    assert grown <= SLACK, (
        f"{label}: {N_CALLS} calls grew persistent (non-checkpoint) "
        f"storage by {grown} frames (> {SLACK}) — an internal persist "
        "leaks (no finally-release / bounded-registry discipline)"
    )


def test_pagerank_calls_bounded(spark):
    e = _edges(spark)
    _run_family(
        spark, lambda: links.pagerank(e, iters=2).count(), "pagerank"
    )


def test_hits_calls_bounded(spark):
    e = _edges(spark)
    _run_family(
        spark, lambda: links.hits_exact(e, iters=2).count(), "hits_exact"
    )


def test_triangles_components_bounded(spark):
    e = spark.createDataFrame(
        [(i, (i * 5 + 1) % 40) for i in range(120)], "src long, dst long"
    )
    _run_family(
        spark, lambda: motifs.triangles(e, "src", "dst").count(), "triangles"
    )
    _run_family(
        spark,
        lambda: components.connected_components(
            e.select(F.col("src").cast("string").alias("a"),
                     F.col("dst").cast("string").alias("b")),
            "a", "b",
        ).count(),
        "connected_components",
    )


def test_setjoin_fuzzy_no_persist(spark):
    tok = spark.createDataFrame(
        [(i, f"t{(i * 3 + j) % 25}") for i in range(30) for j in range(6)],
        "doc_id long, token string",
    )
    _run_family(
        spark,
        lambda: setjoin.set_similarity_join(tok).count(),
        "set_similarity_join",
    )
    s = spark.createDataFrame(
        [(i, f"abcde{i % 7}") for i in range(40)], "id long, s string"
    )
    _run_family(
        spark, lambda: fuzzyjoin.fuzzy_pairs(s).count(), "fuzzy_pairs"
    )


def test_rfm_registry_handoff_bounded(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i % 40, t0 + dt.timedelta(hours=i), (i * 13) % 500)
            for i in range(400)
        ],
        "cust long, ts timestamp, amt long",
    )
    ref = int(dt.datetime(2024, 3, 1).timestamp() * 1_000_000)
    _run_family(
        spark,
        lambda: pa.rfm(df, "cust", "ts", "amt", ref).count(),
        "rfm",
    )


def test_snapshot_pruned_read_bounded(spark, tmp_path):
    from geocore_spark.sources import snapshots as snap

    root = str(tmp_path / "t")
    snap.create_table(
        spark,
        root,
        spark.range(2000).withColumn("v", F.col("id") * 3).repartition(4),
    )
    stats = snap.snapshot_file_stats(spark, root, ["id"])

    def call():
        df, _ = snap.read_snapshot_pruned(
            spark, root, stats, {"id": (100, 400)}
        )
        df.count()

    _run_family(spark, call, "read_snapshot_pruned")
