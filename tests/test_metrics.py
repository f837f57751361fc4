"""operators.metrics: distributed exact ntile / percent_rank.

Value tests pin SQL-identical semantics against the in-engine window
functions on multi-partition inputs (including the uneven-bucket rule and
the q=0 fewer-rows-than-buckets edge); plan tests pin the scale property
the module exists for — no single-task global sort (VERDICT r2 item #2).
"""

import contextlib
import io

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as em
from geocore_spark.operators import metrics


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def scored(spark):
    # 1003 rows (not divisible by 10 -> uneven buckets), shuffled values,
    # spread over several input partitions
    return (
        spark.range(0, 1003, 1, 7)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 48271) % 10007).alias("v"),
        )
        .persist()
    )


def test_global_rank_matches_row_number(spark, scored):
    order = [F.asc("v"), F.asc("k")]
    got, total = metrics.with_global_rank(scored, order, rn_col="rn")
    assert total == 1003
    w = Window.orderBy(*order)
    want = scored.withColumn("rn", F.row_number().over(w))
    assert got.orderBy("rn").collect() == want.orderBy("rn").collect()


@pytest.mark.parametrize("n", [1, 3, 10, 1003, 5000])
def test_exact_ntile_matches_window_ntile(spark, scored, n):
    order = [F.desc("v"), F.asc("k")]
    got = metrics.exact_ntile(scored, order, n, col="b")
    want = scored.withColumn("b", F.ntile(n).over(Window.orderBy(*order)))
    assert got.orderBy("k").collect() == want.orderBy("k").collect()


def test_exact_percent_rank_matches_window(spark, scored):
    order = [F.asc("v"), F.asc("k")]
    got = metrics.exact_percent_rank(scored, order, col="pr")
    want = scored.withColumn(
        "pr", F.percent_rank().over(Window.orderBy(*order))
    )
    assert got.orderBy("k").collect() == want.orderBy("k").collect()


def test_percent_rank_single_row(spark):
    one = spark.createDataFrame([(1, 5)], ["k", "v"])
    rows = metrics.exact_percent_rank(one, [F.asc("v"), F.asc("k")]).collect()
    assert rows[0]["pct_rank"] == 0.0


def test_empty_input(spark):
    empty = spark.createDataFrame([], "k long, v long")
    assert metrics.exact_ntile(empty, [F.asc("v"), F.asc("k")], 10).count() == 0


def test_internal_persist_bounded_without_cache_hook(spark, scored):
    # callers that pass no cache hook (the three entry metric queries)
    # must not accumulate one persisted input-sized frame per call: the
    # module releases its previous internally-owned frame on each new
    # call, so N invocations leave at most ONE live internal persist
    base = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(3):
        metrics.exact_ntile(scored, [F.asc("v"), F.asc("k")], 5).count()
    grown = spark.sparkContext._jsc.getPersistentRDDs().size() - base
    assert grown <= 1, f"internal persists accumulated: +{grown}"


def test_cache_hook_releases(spark, scored):
    cache = {}
    df = metrics.exact_ntile(
        scored, [F.asc("v"), F.asc("k")], 10, cache=cache
    )
    df.count()
    assert "ranged" in cache and cache["ranged"].storageLevel.useMemory
    cache["ranged"].unpersist()
    assert not cache["ranged"].storageLevel.useMemory


# --- plan shape: the whole point of the module -------------------------


def test_metric_plans_have_no_global_window(spark, sf_dir):
    """decile_stats/lift_ks: ntile never appears as a window function;
    the sort is range-partitioned (parallel), and the only global window
    left operates on the 10-row bucket table. semi_flag: percent_rank
    never appears."""
    for q in (em.q_decile_stats, em.q_lift_ks):
        p = _formatted(q(spark, sf_dir))
        assert "ntile(" not in p
        assert "rangepartitioning" in p
    p = _formatted(em.q_semi_flag(spark, sf_dir))
    assert "percent_rank(" not in p
    assert "rangepartitioning" in p


def test_full_data_sort_is_parallel(spark, scored):
    """The pre-aggregation stage sorts in >1 partition: the exact_ntile
    output (full-data grain) must not pass through Exchange
    SinglePartition anywhere."""
    df = metrics.exact_ntile(scored, [F.asc("v"), F.asc("k")], 10)
    p = _formatted(df)
    assert "SinglePartition" not in p
    assert "rangepartitioning" in p
