"""Tile pyramid: shift-derivation == per-level re-quantization (the
exactness claim), null handling, value sums, single-shuffle plan."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geocore_spark.functions import tiling as tl
from geocore_spark.operators import pyramid


def _pts(spark, n=2000, seed=13):
    rng = random.Random(seed)
    rows = [
        Row(id=i, lat=rng.uniform(-90, 90), lon=rng.uniform(-180, 180),
            value=i % 7)
        for i in range(n)
    ]
    # boundary probes: the clamp paths must match the per-level quantizer
    rows += [
        Row(id=n, lat=90.0, lon=180.0, value=1),
        Row(id=n + 1, lat=-90.0, lon=-180.0, value=1),
        Row(id=n + 2, lat=0.0, lon=0.0, value=1),
    ]
    return spark.createDataFrame(rows)


def test_pyramid_levels_match_direct_quantization(spark):
    df = _pts(spark)
    out = pyramid.tile_pyramid(df, 4, 9)
    got = {(r["cell"], r["res"]): r["n_points"] for r in out.collect()}
    for res in range(4, 10):
        direct = {
            r["cell"]: r["n"]
            for r in df.groupBy(
                tl.latlng_to_cell(F.col("lat"), F.col("lon"), res).alias("cell")
            ).agg(F.count("*").alias("n")).collect()
        }
        level = {c: n for (c, rr), n in got.items() if rr == res}
        assert level == direct, f"res {res}"


def test_pyramid_null_nan_dropped_and_value_sum(spark):
    df = spark.createDataFrame(
        [Row(id=1, lat=10.0, lon=20.0, value=5),
         Row(id=2, lat=10.0, lon=20.0, value=7),
         Row(id=3, lat=None, lon=20.0, value=100),
         Row(id=4, lat=float("nan"), lon=20.0, value=100)]
    )
    out = pyramid.tile_pyramid(df, 3, 5, value="value").collect()
    assert {r["res"] for r in out} == {3, 4, 5}
    for r in out:
        assert r["n_points"] == 2 and r["sum_value"] == 12


def test_pyramid_validation():
    with pytest.raises(ValueError):
        pyramid.tile_pyramid(None, 5, 4)
    with pytest.raises(ValueError):
        pyramid.tile_pyramid(None, -1, 4)


def test_pyramid_single_shuffle_plan(spark):
    df = _pts(spark, n=200)
    plan = pyramid.tile_pyramid(df, 5, 9)._jdf.queryExecution().executedPlan().toString()
    # one hash-agg exchange for the whole ladder — the point of the operator
    assert plan.count("Exchange") == 1, plan
