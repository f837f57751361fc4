"""resample_fill: exact interpolation, grid shape, guard, Python oracle."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import temporal


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_interpolates_interior_gaps_exactly(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(3), 4.0), ("a", _ts(5), 3.0)]
    out = temporal.resample_fill(_df(spark, rows), "k", "ts", "v").orderBy("bucket")
    got = [(r["bucket"] % 100000, r["value_micro"], r["observed"]) for r in out.collect()]
    b0 = got[0][0]
    assert [g[1] for g in got] == [
        1_000_000,  # observed
        2_000_000,  # 1 + (4-1)*1/3
        3_000_000,  # 1 + (4-1)*2/3
        4_000_000,  # observed
        3_500_000,  # 4 + (3-4)*1/2
        3_000_000,  # observed
    ]
    assert [g[2] for g in got] == [True, False, False, True, False, True]
    assert [g[0] - b0 for g in got] == list(range(6))


def test_negative_slope_truncation_matches_duckdb_semantics(spark):
    # delta = -1_000_000 over gap 3: bucket 1 -> -333333 (trunc toward 0)
    rows = [("a", _ts(0), 1.0), ("a", _ts(3), 0.0)]
    out = temporal.resample_fill(_df(spark, rows), "k", "ts", "v").orderBy("bucket")
    vals = [r["value_micro"] for r in out.collect()]
    import duckdb

    expect = duckdb.sql(
        "SELECT 1000000 + ((0 - 1000000) * 1) // 3, 1000000 + ((0 - 1000000) * 2) // 3"
    ).fetchone()
    assert vals == [1_000_000, expect[0], expect[1], 0]


def test_multi_observation_buckets_take_half_up_mean(spark):
    rows = [("a", _ts(0, 5), 1.0), ("a", _ts(0, 40), 2.0), ("a", _ts(1), 7.0)]
    out = temporal.resample_fill(_df(spark, rows), "k", "ts", "v").orderBy("bucket")
    vals = [r["value_micro"] for r in out.collect()]
    assert vals == [1_500_000, 7_000_000]


def test_entities_independent_and_nulls_dropped(spark):
    rows = [
        ("a", _ts(0), 1.0),
        ("a", _ts(2), 3.0),
        ("b", _ts(10), 5.0),
        ("b", None, 9.0),
        (None, _ts(1), 9.0),
        ("c", _ts(4), None),
    ]
    out = temporal.resample_fill(_df(spark, rows), "k", "ts", "v")
    rows_out = out.collect()
    assert len(rows_out) == 4  # a:3 buckets, b:1
    base = min(r["bucket"] for r in rows_out if r["k"] == "a")
    got = {(r["k"], r["bucket"] - base): r["value_micro"] for r in rows_out}
    assert got[("a", 1)] == 2_000_000


def test_span_guard_raises(spark):
    rows = [("a", _ts(0), 1.0), ("a", dt.datetime(2025, 1, 1), 2.0)]
    df = _df(spark, rows)
    out = temporal.resample_fill(df, "k", "ts", "v", max_buckets_per_entity=100)
    with pytest.raises(Exception):
        out.count()


def test_invalid_step_raises(spark):
    with pytest.raises(ValueError):
        temporal.resample_fill(_df(spark, [("a", _ts(0), 1.0)]), "k", "ts", "v", 0)
