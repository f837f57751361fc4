"""geometric_smooth and grouped_histogram vs hand arithmetic."""

import pytest

from geocore_spark.operators import metrics, temporal


def _smooth(spark, xs, window):
    rows = [(1, i, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g long, o long, tb long, x long")
    out = temporal.geometric_smooth(df, "g", "o", "tb", "x", window=window)
    return [
        r["smooth_micro"] for r in out.orderBy("o").collect()
    ]


def test_geometric_smooth_hand_case(spark):
    # W=2, weights (2, 1): row1 = x exactly; row2 = (2*8 + 4)/3
    got = _smooth(spark, [4, 8], window=2)
    assert got == [4_000_000, 1_000_000 * 20 // 3]


def test_geometric_smooth_full_window(spark):
    # W=3, weights (4,2,1): row3 = (4*c + 2*b + a)/7
    a, b, c = 7, 21, 35
    got = _smooth(spark, [a, b, c], window=3)
    assert got[2] == 1_000_000 * (4 * c + 2 * b + a) // 7
    # row2 renormalizes over (4, 2) only
    assert got[1] == 1_000_000 * (4 * b + 2 * a) // 6


def test_geometric_smooth_single_row_and_window1(spark):
    assert _smooth(spark, [13], window=8) == [13_000_000]
    # window=1: identity scaled to micro
    assert _smooth(spark, [3, 9], window=1) == [3_000_000, 9_000_000]


def test_geometric_smooth_validation_and_overflow(spark):
    df = spark.createDataFrame([(1, 1, 1, 1)], "g long, o long, tb long, x long")
    with pytest.raises(ValueError):
        temporal.geometric_smooth(df, "g", "o", "tb", "x", window=0)
    with pytest.raises(ValueError):
        temporal.geometric_smooth(df, "g", "o", "tb", "x", window=33)
    big = spark.createDataFrame(
        [(1, 1, 1, 10**13)], "g long, o long, tb long, x long"
    )
    with pytest.raises(Exception, match="overflow"):
        temporal.geometric_smooth(big, "g", "o", "tb", "x", window=8).collect()


def test_geometric_smooth_guard_is_input_side(spark):
    # ADVICE r3: the guard must inspect the INPUT value (non-wrapping),
    # not the already-formed weighted sum. Exactly at the bound raises;
    # one below passes — window=8 bound is (2^62 div 1e6) >> 8.
    bound = (2**62 // 1_000_000) >> 8
    at = spark.createDataFrame(
        [(1, 1, 1, bound)], "g long, o long, tb long, x long"
    )
    with pytest.raises(Exception, match="too large"):
        temporal.geometric_smooth(at, "g", "o", "tb", "x", window=8).collect()
    below = spark.createDataFrame(
        [(1, 1, 1, bound - 1)], "g long, o long, tb long, x long"
    )
    got = temporal.geometric_smooth(
        below, "g", "o", "tb", "x", window=8
    ).collect()
    assert got[0]["smooth_micro"] == 1_000_000 * (bound - 1)


def test_grouped_histogram_hand_case(spark):
    df = spark.createDataFrame([(1, x) for x in range(10)], "g long, v long")
    got = {
        r["bin"]: (r["n"], r["grp_min"], r["grp_max"])
        for r in metrics.grouped_histogram(df, "g", "v", nbins=2).collect()
    }
    assert got == {0: (5, 0, 9), 1: (5, 0, 9)}


def test_grouped_histogram_degenerate_group(spark):
    df = spark.createDataFrame([(1, 7)] * 3, "g long, v long")
    rows = metrics.grouped_histogram(df, "g", "v", nbins=10).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 3


def test_grouped_histogram_max_lands_in_last_bin(spark):
    df = spark.createDataFrame(
        [(1, 0), (1, 100)], "g long, v long"
    )
    got = {r["bin"]: r["n"] for r in
           metrics.grouped_histogram(df, "g", "v", nbins=4).collect()}
    assert got == {0: 1, 3: 1}


def test_grouped_histogram_nan_and_validation(spark):
    nan = spark.createDataFrame([(1, float("nan"))], "g long, v double")
    with pytest.raises(Exception, match="NaN"):
        metrics.grouped_histogram(nan, "g", "v").collect()
    df = spark.createDataFrame([(1, 1)], "g long, v long")
    with pytest.raises(ValueError):
        metrics.grouped_histogram(df, "g", "v", nbins=0)


# ------------------------------------------------------------ column_profile


def test_column_profile_hand_case(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("a", 3)], "s string, v int"
    )
    got = {
        r["col_name"]: (r["n_rows"], r["n_null"], r["n_distinct"],
                        r["min_str"], r["max_str"])
        for r in metrics.column_profile(df, ["s", "v"]).collect()
    }
    assert got == {
        "s": (3, 0, 2, "a", "b"),
        "v": (3, 1, 2, "1", "3"),
    }


def test_column_profile_validation(spark):
    df = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError, match="non-empty"):
        metrics.column_profile(df, [])
    with pytest.raises(ValueError, match="unknown"):
        metrics.column_profile(df, ["nope"])


def test_histogram_and_smooth_collision_guards(spark):
    df = spark.createDataFrame([(1, 2)], "bin long, v long")
    with pytest.raises(ValueError, match="collides"):
        metrics.grouped_histogram(df, "bin", "v")
    df2 = spark.createDataFrame([(1, 1, 1, 1)], "x long, o long, tb long, v long")
    with pytest.raises(ValueError, match="collide"):
        temporal.geometric_smooth(df2, "x", "o", "tb", "v")


# ---------------------------------------------------------- time_weighted_avg


def _twa(spark, rows, **kw):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    data = [(k, t0 + dt.timedelta(microseconds=us), v) for k, us, v in rows]
    df = spark.createDataFrame(data, "k long, ts timestamp, v long")
    return {
        r["k"]: (r["n"], r["total_dur_us"], r["twa_micro"])
        for r in temporal.time_weighted_avg(df, "k", "ts", "v", **kw).collect()
    }


_EPOCH_2024 = 1704067200000000  # 2024-01-01T00:00:00Z in epoch micros


def test_twa_hand_case_with_range_end(spark):
    rows = [(1, 0, 10), (1, 10, 20), (1, 30, 0)]
    got = _twa(spark, rows, range_end_us=_EPOCH_2024 + 40)
    # durs 10,20,10 -> wsum 500, tot 40 -> 12.5
    assert got == {1: (3, 40, 12_500_000)}


def test_twa_default_end_drops_last_reading(spark):
    rows = [(1, 0, 10), (1, 10, 20), (1, 30, 0)]
    got = _twa(spark, rows)
    # durs 10,20,0 -> wsum 500, tot 30
    assert got == {1: (3, 30, 1_000_000 * 500 // 30)}


def test_twa_single_reading_null(spark):
    got = _twa(spark, [(1, 5, 99)])
    assert got == {1: (1, 0, None)}


def test_twa_duplicate_ts_raises(spark):
    with pytest.raises(Exception, match="duplicate timestamp"):
        _twa(spark, [(1, 5, 1), (1, 5, 2)])


def test_twa_overflow_guard(spark):
    rows = [(1, 0, 2**40), (1, 2**40, 0)]
    with pytest.raises(Exception, match="overflow"):
        _twa(spark, rows)


# --------------------------------------------------------------------- ohlc


def test_ohlc_hand_case(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [  # one key, one hour bucket: open=5, close=2, high=9, low=1
        (1, t0 + dt.timedelta(minutes=1), 1, 5),
        (1, t0 + dt.timedelta(minutes=2), 2, 9),
        (1, t0 + dt.timedelta(minutes=3), 3, 1),
        (1, t0 + dt.timedelta(minutes=4), 4, 2),
        # next hour: single reading
        (1, t0 + dt.timedelta(minutes=61), 5, 7),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, tb long, v long")
    got = {
        r["bucket"]: (r["open"], r["high"], r["low"], r["close"],
                      r["n"], r["volume"])
        for r in temporal.ohlc(df, "k", "ts", "tb", "v").collect()
    }
    buckets = sorted(got)
    assert got[buckets[0]] == (5, 9, 1, 2, 4, 17)
    assert got[buckets[1]] == (7, 7, 7, 7, 1, 7)


def test_ohlc_tiebreak_decides_open_close(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 2, 100), (1, t0, 1, 200)]  # same ts: tb orders
    df = spark.createDataFrame(rows, "k long, ts timestamp, tb long, v long")
    r = temporal.ohlc(df, "k", "ts", "tb", "v").collect()[0]
    assert (r["open"], r["close"]) == (200, 100)


def test_ohlc_validation(spark):
    df = spark.createDataFrame([], "k long, ts timestamp, tb long, v long")
    with pytest.raises(ValueError):
        temporal.ohlc(df, "k", "ts", "tb", "v", bucket_us=0)


# --------------------------------------------------- review regressions (2)


def test_twa_midseries_range_end_clamps(spark):
    # range end at t=5 inside the series: only the first reading's
    # [0,5) slice carries weight -> twa == first value exactly
    rows = [(1, 0, 0), (1, 10, 100), (1, 20, 0)]
    got = _twa(spark, rows, range_end_us=_EPOCH_2024 + 5)
    assert got == {1: (3, 5, 0)}


def test_twa_small_tot_large_value_guard(spark):
    # tot=1, v=2^45: passes the W and split bounds, must trip the
    # quotient bound instead of overflowing 1e6*(W div T)
    rows = [(1, 0, 2**45), (1, 1, 0)]
    with pytest.raises(Exception, match="overflow"):
        _twa(spark, rows, range_end_us=_EPOCH_2024 + 1)


def test_twa_key_collision_raises(spark):
    df = spark.createDataFrame([(1, _EPOCH_2024, 1)], "n long, ts long, v long")
    with pytest.raises(ValueError, match="collides"):
        temporal.time_weighted_avg(
            df.selectExpr("n", "timestamp_micros(ts) as ts", "v"),
            "n", "ts", "v",
        )


def test_ohlc_fractional_value_raises(spark):
    import datetime as dt
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, 1.5)],
        "k long, ts timestamp, tb long, v double",
    )
    with pytest.raises(Exception, match="non-integer"):
        temporal.ohlc(df, "k", "ts", "tb", "v").collect()


def test_ohlc_pre_epoch_raises_and_key_collision(spark):
    import datetime as dt
    df = spark.createDataFrame(
        [(1, dt.datetime(1969, 12, 31, 23, 30), 1, 5)],
        "k long, ts timestamp, tb long, v long",
    )
    with pytest.raises(Exception, match="pre-epoch"):
        temporal.ohlc(df, "k", "ts", "tb", "v").collect()
    df2 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1, 5)],
        "open long, ts timestamp, tb long, v long",
    )
    with pytest.raises(ValueError, match="collides"):
        temporal.ohlc(df2, "open", "ts", "tb", "v")
