"""product_analytics (cohort/attribution/paths/drawdown) and the
metrics stat additions (outliers/ab_test/concentration/gini) against
hand-computable closed forms and boundary cases."""

import datetime as dt

import pytest

from geocore_spark.operators import metrics, product_analytics as pa

_T0 = dt.datetime(2024, 1, 1)


def _ts(days, seconds=0):
    return _T0 + dt.timedelta(days=days, seconds=seconds)


# ---------------------------------------------------------------- cohort


def test_cohort_retention_hand_case(spark):
    rows = [
        # u1: first day 0, active days 0,1,2 (two events day 0: collapse)
        (1, _ts(0)), (1, _ts(0, 60)), (1, _ts(1)), (1, _ts(2)),
        # u2: first day 0, active days 0,2
        (2, _ts(0)), (2, _ts(2)),
        # u3: first day 1, never again
        (3, _ts(1)),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp")
    got = {
        (r["cohort_period"] - 19723, r["period_offset"]): (
            r["n_active"], r["cohort_size"], r["retention_micro"]
        )
        for r in pa.cohort_retention(df, "u", "ts").collect()
    }
    # 19723 = epoch-day of 2024-01-01 (anchors cohorts at 0/1)
    assert got == {
        (0, 0): (2, 2, 1_000_000),
        (0, 1): (1, 2, 500_000),
        (0, 2): (2, 2, 1_000_000),
        (1, 0): (1, 1, 1_000_000),
    }


def test_cohort_retention_validates_period(spark):
    df = spark.createDataFrame([(1, _ts(0))], "u long, ts timestamp")
    with pytest.raises(ValueError):
        pa.cohort_retention(df, "u", "ts", period_us=0)


# ----------------------------------------------------------- attribution


def _attr(spark, touches, convs, lookback_us=10_000_000):
    t = spark.createDataFrame(touches, "u long, ts timestamp, ch string, tid long")
    c = spark.createDataFrame(convs, "u long, ts timestamp, cid long")
    out = pa.attribution(
        t, c, user_col="u", ts_col="ts", channel_col="ch",
        conv_id_col="cid", touch_id_col="tid", lookback_us=lookback_us,
    )
    return {r["channel"]: (r["n_touchpoints"], r["last_touch_convs"],
                           r["linear_micro"]) for r in out.collect()}


def test_attribution_linear_and_last_touch(spark):
    touches = [
        (1, _ts(0, 90), "A", 1),
        (1, _ts(0, 95), "B", 2),
    ]
    convs = [(1, _ts(0, 100), 10)]
    got = _attr(spark, touches, convs)
    assert got == {"A": (1, 0, 500_000), "B": (1, 1, 500_000)}


def test_attribution_window_edges(spark):
    touches = [
        (1, _ts(0, 100), "A", 1),   # == conv ts: excluded (strict <)
        (1, _ts(0, 89), "B", 2),    # 11 s before, lookback 10 s: out
        (1, _ts(0, 90), "C", 3),    # exactly at the lookback edge: in
    ]
    convs = [(1, _ts(0, 100), 10), (2, _ts(0, 50), 11)]  # conv 11: no touches
    got = _attr(spark, touches, convs)
    assert got == {"C": (1, 1, 1_000_000)}


def test_attribution_tie_breaks_on_touch_id(spark):
    touches = [
        (1, _ts(0, 95), "A", 5),
        (1, _ts(0, 95), "B", 7),  # same ts, higher id -> last touch
    ]
    convs = [(1, _ts(0, 100), 10)]
    got = _attr(spark, touches, convs)
    assert got["B"][1] == 1 and got["A"][1] == 0


def test_attribution_validates_lookback(spark):
    t = spark.createDataFrame([], "u long, ts timestamp, ch string, tid long")
    c = spark.createDataFrame([], "u long, ts timestamp, cid long")
    with pytest.raises(ValueError):
        pa.attribution(t, c, "u", "ts", "ch", "cid", "tid", lookback_us=0)


# ------------------------------------------------------------ user_paths


def test_user_paths_truncates_and_counts(spark):
    rows = [
        (1, _ts(0, 1), 1, "view"), (1, _ts(0, 2), 2, "click"),
        (1, _ts(0, 3), 3, "buy"), (1, _ts(0, 4), 4, "view"),  # step 4 cut
        (2, _ts(0, 1), 5, "view"), (2, _ts(0, 2), 6, "click"),
        (2, _ts(0, 3), 7, "buy"),
        (3, _ts(0, 9), 8, "view"),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, i long, s string")
    out = pa.user_paths(df, "u", "ts", "i", "s", max_steps=3)
    got = {r["path"]: (r["n_users"], r["path_len"]) for r in out.collect()}
    assert got == {"view>click>buy": (2, 3), "view": (1, 1)}


def test_user_paths_separator_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1, "a>b")], "u long, ts timestamp, i long, s string"
    )
    with pytest.raises(Exception, match="separator"):
        pa.user_paths(df, "u", "ts", "i", "s").collect()


def test_user_paths_min_count(spark):
    rows = [(1, _ts(0), 1, "a"), (2, _ts(0), 2, "a"), (3, _ts(0), 3, "b")]
    df = spark.createDataFrame(rows, "u long, ts timestamp, i long, s string")
    out = pa.user_paths(df, "u", "ts", "i", "s", min_count=2)
    assert [r["path"] for r in out.collect()] == ["a"]


# ---------------------------------------------------------- max_drawdown


def test_max_drawdown_hand_series(spark):
    xs = [10, -5, -10, 20, -3]  # cum 10,5,-5,15,12 peak 10,10,10,15,15
    rows = [(1, _ts(0, i), i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g long, ts timestamp, i long, x long")
    r = pa.max_drawdown(df, "g", "ts", "i", "x").collect()[0]
    assert (r["n"], r["total"], r["max_drawdown"]) == (5, 12, 15)


def test_max_drawdown_monotone_is_zero(spark):
    rows = [(1, _ts(0, i), i, 5) for i in range(4)]
    df = spark.createDataFrame(rows, "g long, ts timestamp, i long, x long")
    assert pa.max_drawdown(df, "g", "ts", "i", "x").collect()[0][
        "max_drawdown"
    ] == 0


# ------------------------------------------------------- grouped_outliers


def test_grouped_outliers_exact_boundary(spark):
    # [0,0,0,0,100]: x=100 sits EXACTLY at 2 sigma -> strict > flags
    # nothing at k=2, flags it at k=199/100
    rows = [(1, i, x) for i, x in enumerate([0, 0, 0, 0, 100])]
    df = spark.createDataFrame(rows, "g long, i long, x long")
    at2 = metrics.grouped_outliers(df, "g", "x", k_num=2, k_den=1)
    assert at2.where("is_outlier").count() == 0
    under = metrics.grouped_outliers(df, "g", "x", k_num=199, k_den=100)
    flagged = under.where("is_outlier").collect()
    assert [(r["i"], r["x"]) for r in flagged] == [(4, 100)]


def test_grouped_outliers_single_row_group_and_validation(spark):
    df = spark.createDataFrame([(1, 1, 5)], "g long, i long, x long")
    assert (
        metrics.grouped_outliers(df, "g", "x").where("is_outlier").count()
        == 0
    )
    with pytest.raises(ValueError):
        metrics.grouped_outliers(df, "g", "x", k_num=0)


# ----------------------------------------------------------------- ab_test


def test_ab_test_exact_z(spark):
    # pa=1, pb=0, p=.5, se=sqrt(.25*(.5+.5))=.5, z=2 — all dyadic: exact
    rows = [
        ("e", "A", 1), ("e", "A", 1), ("e", "B", 0), ("e", "B", 0),
    ]
    df = spark.createDataFrame(rows, "g string, v string, y int")
    r = metrics.ab_test(df, "g", "v", "A", "B", "y").collect()[0]
    assert (r["n_a"], r["s_a"], r["n_b"], r["s_b"]) == (2, 2, 2, 0)
    assert r["z"] == 2.0


def test_ab_test_degenerate_and_empty_arm_null(spark):
    allwin = spark.createDataFrame(
        [("e", "A", 1), ("e", "B", 1)], "g string, v string, y int"
    )
    assert metrics.ab_test(allwin, "g", "v", "A", "B", "y").collect()[0][
        "z"
    ] is None
    onearm = spark.createDataFrame(
        [("e", "A", 1), ("e", "A", 0)], "g string, v string, y int"
    )
    assert metrics.ab_test(onearm, "g", "v", "A", "B", "y").collect()[0][
        "z"
    ] is None


def test_ab_test_rejects_soft_labels(spark):
    df = spark.createDataFrame(
        [("e", "A", 0.7), ("e", "B", 0.0)], "g string, v string, y double"
    )
    with pytest.raises(Exception, match="0/1"):
        metrics.ab_test(df, "g", "v", "A", "B", "y").collect()


def test_ab_test_ignores_other_variants(spark):
    rows = [("e", "A", 1), ("e", "B", 0), ("e", "C", 1), ("e", "C", 1)]
    df = spark.createDataFrame(rows, "g string, v string, y int")
    r = metrics.ab_test(df, "g", "v", "A", "B", "y").collect()[0]
    assert (r["n_a"], r["n_b"]) == (1, 1)


# ------------------------------------------------------------ concentration


def test_concentration_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "g long, i string"
    )
    r = metrics.concentration(df, "g", "i").collect()[0]
    assert (r["n"], r["n_items"], r["top_share_micro"]) == (3, 2, 666_666)
    assert r["hhi"] == 5.0 / 9.0


def test_concentration_monopoly(spark):
    df = spark.createDataFrame([(1, "a")] * 4, "g long, i string")
    r = metrics.concentration(df, "g", "i").collect()[0]
    assert (r["top_share_micro"], r["hhi"], r["n_items"]) == (1_000_000, 1.0, 1)


# ------------------------------------------------------------------- gini


def test_gini_equal_values_zero(spark):
    df = spark.createDataFrame([(1, 7)] * 5, "g long, v long")
    assert metrics.gini_coefficient(df, "g", "v").collect()[0][
        "gini_micro"
    ] == 0


def test_gini_perfect_inequality(spark):
    # [0,0,0,10]: G = (2*40 - 5*10) / (4*10) = 0.75... no: six=4*10=40,
    # num=80-50=30, den=40 -> 750000
    df = spark.createDataFrame(
        [(1, 0), (1, 0), (1, 0), (1, 10)], "g long, v long"
    )
    assert metrics.gini_coefficient(df, "g", "v").collect()[0][
        "gini_micro"
    ] == 750_000


def test_gini_python_oracle(spark):
    import random

    rng = random.Random(20260821)
    vals = [rng.randrange(100) for _ in range(40)]
    df = spark.createDataFrame([(1, v) for v in vals], "g long, v long")
    got = metrics.gini_coefficient(df, "g", "v").collect()[0]["gini_micro"]
    xs = sorted(vals)
    n, sx = len(xs), sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    want = (1_000_000 * (2 * six - (n + 1) * sx)) // (n * sx)
    assert got == want


def test_gini_negative_raises_and_zero_total_null(spark):
    neg = spark.createDataFrame([(1, -1), (1, 2)], "g long, v long")
    with pytest.raises(Exception, match="negative"):
        metrics.gini_coefficient(neg, "g", "v").collect()
    zero = spark.createDataFrame([(1, 0), (1, 0)], "g long, v long")
    assert metrics.gini_coefficient(zero, "g", "v").collect()[0][
        "gini_micro"
    ] is None


# ------------------------------------------------------- review regressions


def test_attribution_null_conv_id_filtered(spark):
    # NULL cids previously merged every null-cid conversion into ONE
    # window partition (inflated k, single last_touch)
    touches = [(1, _ts(0, 95), "A", 1)]
    convs = [(1, _ts(0, 100), None), (1, _ts(0, 100), 10)]
    got = _attr(spark, touches, convs)
    assert got == {"A": (1, 1, 1_000_000)}


def test_max_drawdown_overflow_guard_raises(spark):
    big = 2**61  # n * max|x| * 2 = 3 * 2^62 > 2^62 -> guard trips
    rows = [(1, _ts(0, i), i, big) for i in range(3)]
    df = spark.createDataFrame(rows, "g long, ts timestamp, i long, x long")
    with pytest.raises(Exception, match="overflow"):
        pa.max_drawdown(df, "g", "ts", "i", "x").collect()


def test_grouped_outliers_collision_raises_and_odd_names_work(spark):
    df = spark.createDataFrame([(1, 2, 3)], "g long, x long, n long")
    with pytest.raises(ValueError, match="collide"):
        metrics.grouped_outliers(df, "g", "x")
    # a df whose columns shadow the OLD internal names must still work
    odd = spark.createDataFrame(
        [(1, i, x, 7) for i, x in enumerate([0, 0, 0, 0, 100])],
        "g long, i long, x long, _sx long",
    )
    out = metrics.grouped_outliers(odd, "g", "x", k_num=199, k_den=100)
    assert out.where("is_outlier").count() == 1


def test_gini_nan_raises(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, float("nan"))], "g long, v double"
    )
    with pytest.raises(Exception, match="NaN"):
        metrics.gini_coefficient(df, "g", "v").collect()


# ---------------------------------------------------------------------- rfm


def test_rfm_hand_case(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    # 3 customers: c1 recent+rich+frequent, c2 middle, c3 stale+poor
    rows = [
        (1, t0 + dt.timedelta(days=9), 100),
        (1, t0 + dt.timedelta(days=8), 100),
        (1, t0 + dt.timedelta(days=7), 100),
        (2, t0 + dt.timedelta(days=5), 50),
        (2, t0 + dt.timedelta(days=4), 50),
        (3, t0, 10),
    ]
    df = spark.createDataFrame(rows, "c long, ts timestamp, a long")
    ref = 1704067200000000 + 10 * 86_400_000_000  # day 10
    got = {
        r["c"]: (r["recency_us"], r["frequency"], r["monetary"],
                 r["r_score"], r["f_score"], r["m_score"])
        for r in pa.rfm(
            df, "c", "ts", "a", ref_ts_us=ref, n_tiles=3
        ).collect()
    }
    day = 86_400_000_000
    assert got[1] == (1 * day, 3, 300, 1, 1, 1)
    assert got[2] == (5 * day, 2, 100, 2, 2, 2)
    assert got[3] == (10 * day, 1, 10, 3, 3, 3)


def test_rfm_validation(spark):
    df = spark.createDataFrame([(1, _ts(0), 1)], "c long, ts timestamp, a long")
    with pytest.raises(ValueError):
        pa.rfm(df, "c", "ts", "a", ref_ts_us=0, n_tiles=0)


def test_rfm_customer_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 1)], "frequency long, ts timestamp, a long"
    )
    with pytest.raises(ValueError, match="collides"):
        pa.rfm(df, "frequency", "ts", "a", ref_ts_us=1, n_tiles=2)
