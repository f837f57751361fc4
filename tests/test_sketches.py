"""Sketch-aggregate accuracy + mergeability (operators/sketches.py).

The contracts that matter at scale: (1) estimates land inside the
published error bounds, (2) merging per-shard sketches gives the same
estimate as sketching the whole corpus (the re-aggregation property the
sketch-table design depends on), (3) everything stays JVM-side.
"""

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def ids(spark):
    # 50k rows, 25k distinct ids, split across 4 shards
    return spark.range(50_000).select(
        (F.col("id") % 25_000).alias("key"), (F.col("id") % 4).alias("shard")
    )


def test_hll_estimate_within_bounds(ids):
    est = sk.estimate_distinct(sk.sketch_distinct(ids, "key")).collect()[0]
    assert abs(est.n_distinct - 25_000) / 25_000 < 0.05  # rse ~1.6% at lgk=12


def test_hll_merge_equals_global(ids):
    per_shard = sk.sketch_distinct(ids, "key", by=["shard"])
    assert per_shard.count() == 4
    merged = sk.estimate_distinct(sk.merge_distinct(per_shard)).collect()[0]
    direct = sk.estimate_distinct(sk.sketch_distinct(ids, "key")).collect()[0]
    assert merged.n_distinct == direct.n_distinct  # deterministic, no RNG


def test_kll_quantiles_and_merge(spark):
    vals = spark.range(100_000).select(
        F.col("id").cast("double").alias("v"), (F.col("id") % 8).alias("shard")
    )
    direct = sk.quantile_estimates(
        sk.sketch_quantiles(vals, "v"), [0.5, 0.99]
    ).collect()[0]
    assert abs(direct.q_0_5 - 50_000) < 3_000  # ~1.65% rank error at k=200
    assert abs(direct.q_0_99 - 99_000) < 3_000
    merged = sk.quantile_estimates(
        sk.merge_quantiles(sk.sketch_quantiles(vals, "v", by=["shard"])),
        [0.5],
    ).collect()[0]
    assert abs(merged.q_0_5 - 50_000) < 3_000


def test_overlap_inclusion_exclusion(spark):
    a = spark.range(0, 20_000).select(F.col("id").alias("k"))
    b = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    row = sk.overlap_distinct(a, b, "k").collect()[0]
    assert abs(row.n_a - 20_000) / 20_000 < 0.05
    assert abs(row.n_union - 30_000) / 30_000 < 0.05
    assert abs(row.n_intersection - 10_000) / 10_000 < 0.15  # 3 estimates compound


def test_overlap_empty_side_returns_zeros_not_nulls(spark):
    # hll_sketch_agg over zero rows yields an EMPTY sketch (estimate 0),
    # not NULL — pin it so downstream ratio arithmetic never null-poisons
    a = spark.range(0).select(F.col("id").cast("string").alias("k"))
    b = spark.range(100).select(F.col("id").cast("string").alias("k"))
    row = sk.overlap_distinct(a, b, "k").collect()[0]
    assert (row.n_a, row.n_union, row.n_intersection) == (0, 100, 0)
    both = sk.overlap_distinct(a, a, "k").collect()[0]
    assert tuple(both) == (0, 0, 0, 0)


def test_plan_stays_jvm_side(ids):
    plan = (
        sk.estimate_distinct(sk.sketch_distinct(ids, "key", by=["shard"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
