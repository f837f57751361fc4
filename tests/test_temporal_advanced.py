"""Sessionization + as-of join semantics."""

import datetime

from pyspark.sql import functions as F

from geocore_spark.operators import temporal


def _ts(m):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(45)),  # 35-min gap -> new
        (4, 1, _ts(50)), (5, 2, _ts(0)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r["event_id"]: r["session_no"]
        for r in temporal.sessionize(df, "user_id", "ts", 30.0, "event_id").collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_sessionize_exact_gap_is_same_session(spark):
    rows = [(1, 1, _ts(0)), (2, 1, _ts(30))]  # exactly 30 min: NOT a break
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r["session_no"]
           for r in temporal.sessionize(df, "user_id", "ts", 30.0, "event_id").collect()}
    assert out == {1: 0, 2: 0}


def test_asof_join_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 1, _ts(15)), (3, 1, _ts(2)), (4, 2, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(10), 20.0), (2, _ts(6), 9.0)],
        "user_id long, ts timestamp, v double",
    )
    out = {
        r["event_id"]: r["v_asof"]
        for r in temporal.asof_join(left, right, "user_id", "ts", ["v"]).collect()
    }
    assert out[1] == 10.0   # ts=5: latest right at 0
    assert out[2] == 20.0   # ts=15: latest right at 10
    assert out[3] == 10.0   # ts=2: right at 0
    assert out[4] is None   # user 2: right row is AFTER the event


def test_asof_join_inclusive_tie(spark):
    left = spark.createDataFrame([(1, 1, _ts(10))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(10), 7.0)], "user_id long, ts timestamp, v double")
    out = temporal.asof_join(left, right, "user_id", "ts", ["v"]).first()
    assert out["v_asof"] == 7.0  # equal timestamps match (>= semantics)


def test_sessionize_fractional_subminute_gap(spark):
    # gap_minutes=0.025 = 1.5 s; int-second truncation would make it 1 s
    # and split the 1.2 s pair below into two sessions
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, base),
        (2, 1, base + datetime.timedelta(seconds=1.2)),  # within 1.5 s
        (3, 1, base + datetime.timedelta(seconds=4.0)),  # 2.8 s gap -> break
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: r["session_no"]
           for r in temporal.sessionize(df, "user_id", "ts", 0.025, "event_id").collect()}
    assert out == {1: 0, 2: 0, 3: 1}


def test_asof_join_no_chimera_rows_and_null_values_carried(spark):
    # the latest right row's legitimate NULL must be RETURNED, not
    # backfilled per-column from an older row (which would fabricate a
    # (a=5, b=2) combination that exists in no right row)
    left = spark.createDataFrame(
        [(1, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 1.0, 2.0), (1, _ts(5), 5.0, None)],
        "user_id long, ts timestamp, a double, b double",
    )
    row = temporal.asof_join(left, right, "user_id", "ts", ["a", "b"]).first()
    assert row["a_asof"] == 5.0 and row["b_asof"] is None


def test_asof_join_equal_ts_tiebreak_deterministic(spark):
    # two right rows at the same (entity, ts): the greatest value tuple
    # wins, every run
    left = spark.createDataFrame([(1, 1, _ts(5))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 3.0), (1, _ts(5), 9.0)], "user_id long, ts timestamp, v double"
    )
    for _ in range(3):
        row = temporal.asof_join(left, right, "user_id", "ts", ["v"]).first()
        assert row["v_asof"] == 9.0


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.createDataFrame(
        [(i, 1, _ts(i)) for i in range(20)], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame([(1, _ts(5), 1.0)], "user_id long, ts timestamp, v double")
    out = temporal.asof_join(left, right, "user_id", "ts", ["v"])
    assert out.count() == 20
    assert out.filter(F.col("v_asof").isNull()).count() == 5  # events 0-4


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    left = pd.DataFrame(
        {
            "event_id": np.arange(400, dtype=np.int64),
            "user_id": rng.integers(0, 8, 400),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, 400), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": rng.integers(0, 8, 60),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, 60), unit="s"),
            "v": np.round(rng.uniform(0, 100, 60), 3),
        }
    ).drop_duplicates(["user_id", "ts"])
    want_df = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",
    )
    want = {int(r.event_id): (None if pd.isna(r.v) else float(r.v)) for r in want_df.itertuples()}
    out = temporal.asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), "user_id", "ts", ["v"]
    )
    got = {r["event_id"]: r["v_asof"] for r in out.collect()}
    assert got == want
