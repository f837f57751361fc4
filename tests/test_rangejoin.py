"""Range joins: result == naive theta-join on random data (incl. negative
values and bucket-boundary landings), dedup guarantee of the overlap
join's proof-bucket rule, explode guard, plan shape (no nested-loop)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geocore_spark.operators import rangejoin as rj


def _points(spark, n=400, seed=3):
    rng = random.Random(seed)
    rows = [Row(pid=i, x=rng.uniform(-50, 50)) for i in range(n)]
    rows += [Row(pid=n, x=8.0), Row(pid=n + 1, x=-8.0), Row(pid=n + 2, x=None)]
    return spark.createDataFrame(rows)


def _intervals(spark, n=60, seed=4):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        lo = rng.uniform(-55, 50)
        rows.append(Row(iid=i, lo=lo, hi=lo + rng.uniform(0, 9)))
    rows += [
        Row(iid=n, lo=8.0, hi=16.0),      # bucket-boundary endpoints
        Row(iid=n + 1, lo=-16.0, hi=-8.0),
        Row(iid=n + 2, lo=5.0, hi=4.0),   # inverted: matches nothing
        Row(iid=n + 3, lo=None, hi=3.0),  # null bound: matches nothing
    ]
    return spark.createDataFrame(rows)


def test_point_in_interval_matches_naive(spark):
    pts, ivs = _points(spark), _intervals(spark)
    got = {
        (r["pid"], r["iid"])
        for r in rj.point_in_interval_join(
            pts, ivs, "x", "lo", "hi", bucket_width=8.0
        ).select("pid", "iid").collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")))
        .select("pid", "iid")
        .collect()
    }
    assert got == naive and len(naive) > 50


@pytest.mark.parametrize("width", [0.5, 3.0, 64.0])
def test_point_in_interval_width_invariant(spark, width):
    pts, ivs = _points(spark, n=150), _intervals(spark, n=30)
    got = rj.point_in_interval_join(pts, ivs, "x", bucket_width=width)
    naive = pts.crossJoin(ivs).filter(
        (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
    )
    assert got.count() == naive.count()


def test_interval_overlap_matches_naive_and_dedupes(spark):
    a = _intervals(spark, n=50, seed=7)
    b = (
        _intervals(spark, n=40, seed=8)
        .select(F.col("iid").alias("jid"), F.col("lo").alias("lo2"), F.col("hi").alias("hi2"))
    )
    out = rj.interval_overlap_join(
        a, b, ("lo", "hi"), ("lo2", "hi2"), bucket_width=2.0
    ).select("iid", "jid")
    rows = [(r["iid"], r["jid"]) for r in out.collect()]
    naive = {
        (r["iid"], r["jid"])
        for r in a.filter(F.col("lo") <= F.col("hi"))  # inverted = empty set
        .crossJoin(b.filter(F.col("lo2") <= F.col("hi2")))
        .filter((F.col("lo") <= F.col("hi2")) & (F.col("lo2") <= F.col("hi")))
        .select("iid", "jid")
        .collect()
    }
    assert set(rows) == naive and len(naive) > 20
    assert len(rows) == len(set(rows)), "proof-bucket rule emitted a dup"


def test_nan_points_and_bounds_match_nothing(spark):
    """NaN casts to bucket 0 and makes interval spans NEGATIVE (sequence
    would count DOWN into garbage buckets) — excluded like NULL."""
    nan = float("nan")
    pts = spark.createDataFrame(
        [Row(pid=1, x=5.0), Row(pid=2, x=nan)]
    )
    ivs = spark.createDataFrame(
        [Row(iid=1, lo=0.0, hi=10.0),
         Row(iid=2, lo=0.0, hi=nan),   # negative bucket span if unguarded
         Row(iid=3, lo=nan, hi=10.0)]
    )
    got = {
        (r["pid"], r["iid"])
        for r in rj.point_in_interval_join(
            pts, ivs, "x", bucket_width=4.0
        ).select("pid", "iid").collect()
    }
    assert got == {(1, 1)}
    out = rj.interval_overlap_join(
        ivs, ivs.select(F.col("iid").alias("jid"), F.col("lo").alias("lo2"),
                        F.col("hi").alias("hi2")),
        bucket_width=4.0,
    ).select("iid", "jid").collect()
    assert {(r["iid"], r["jid"]) for r in out} == {(1, 1)}


def test_explode_guard_raises(spark):
    pts = spark.createDataFrame([Row(pid=1, x=5.0)])
    wide = spark.createDataFrame([Row(iid=1, lo=0.0, hi=1e9)])
    with pytest.raises(Exception, match="buckets"):
        rj.point_in_interval_join(
            pts, wide, "x", bucket_width=1.0, max_buckets=100
        ).collect()
    with pytest.raises(ValueError):
        rj.point_in_interval_join(pts, wide, "x", bucket_width=0.0)


def test_plan_is_equi_join_not_nested_loop(spark):
    pts, ivs = _points(spark), _intervals(spark)
    plan = (
        rj.point_in_interval_join(pts, ivs, "x", bucket_width=8.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
