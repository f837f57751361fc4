"""grouped_corr / interval_coverage / funnel: Python-oracle agreement."""

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import metrics, rangejoin, temporal


# --------------------------------------------------------------- corr


def _corr(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    a, b = n * sxx - sx * sx, n * syy - sy * sy
    if a <= 0 or b <= 0:
        return None
    return (n * sxy - sx * sy) / (math.sqrt(a) * math.sqrt(b))


def test_corr_matches_python_and_handles_constants(spark):
    rng = random.Random(20260820)
    data = []
    series = {}
    for g in range(3):
        xs = [rng.randrange(-50, 50) for _ in range(150)]
        ys = [x * 2 + rng.randrange(-30, 30) for x in xs]
        series[g] = (xs, ys)
        data += [(g, x, y) for x, y in zip(xs, ys)]
    data += [(9, 5, 1), (9, 5, 2)]  # constant x -> NULL corr
    df = spark.createDataFrame(data, "g int, x long, y long")
    out = {r["g"]: r["corr"] for r in metrics.grouped_corr(df, "g", "x", "y").collect()}
    for g in range(3):
        assert out[g] == _corr(*series[g])  # bit-exact, not approx
    assert out[9] is None


def test_corr_perfect_and_overflow_guard(spark):
    df = spark.createDataFrame(
        [(0, i, 3 * i + 7) for i in range(10)], "g int, x long, y long"
    )
    out = metrics.grouped_corr(df, "g", "x", "y").collect()
    assert out[0]["corr"] == 1.0
    big = spark.createDataFrame(
        [(0, 2**31, 2**31), (0, 2**31 + 1, 2**31 + 5)], "g int, x long, y long"
    )
    with pytest.raises(Exception):
        metrics.grouped_corr(big, "g", "x", "y").collect()
    # Sxx overflows even though every |x*y| product is tiny: the guard
    # must bound on max(|x|,|y|)^2, not |x|*|y|
    lopsided = spark.createDataFrame(
        [(0, 2**33, 1), (0, 2**33 + 1, 0)], "g int, x long, y long"
    )
    with pytest.raises(Exception):
        metrics.grouped_corr(lopsided, "g", "x", "y").collect()


# ----------------------------------------------------------- coverage


def _cov(ivs):
    ivs = sorted((lo, hi) for lo, hi in ivs if lo <= hi)
    islands = []
    for lo, hi in ivs:
        if islands and lo <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], hi)
        else:
            islands.append([lo, hi])
    return len(ivs), len(islands), sum(h - l for l, h in islands)


def test_coverage_merges_touching_and_nested(spark):
    rows = [("a", 0, 2), ("a", 2, 4), ("a", 10, 20), ("a", 12, 15), ("a", 30, 30)]
    out = rangejoin.interval_coverage(
        spark.createDataFrame(rows, "k string, lo long, hi long"), "k", "lo", "hi"
    ).collect()
    r = out[0]
    assert (r["n_intervals"], r["n_islands"], r["covered"]) == (5, 3, 14)


def test_coverage_random_matches_python(spark):
    rng = random.Random(7)
    rows = []
    per_key = {}
    for k in range(5):
        ivs = []
        for _ in range(80):
            lo = rng.randrange(0, 500)
            hi = lo + rng.randrange(0, 30)
            ivs.append((lo, hi))
        per_key[str(k)] = ivs
        rows += [(str(k), lo, hi) for lo, hi in ivs]
    out = rangejoin.interval_coverage(
        spark.createDataFrame(rows, "k string, lo long, hi long"), "k", "lo", "hi"
    )
    got = {
        r["k"]: (r["n_intervals"], r["n_islands"], r["covered"]) for r in out.collect()
    }
    assert got == {k: _cov(v) for k, v in per_key.items()}


def test_coverage_drops_inverted_null_and_nan(spark):
    rows = [
        ("a", 0.0, 5.0),
        ("a", 9.0, 3.0),  # inverted -> empty set
        ("a", None, 8.0),
        ("a", float("nan"), 8.0),
        (None, 0.0, 1.0),
    ]
    out = rangejoin.interval_coverage(
        spark.createDataFrame(rows, "k string, lo double, hi double"), "k", "lo", "hi"
    ).collect()
    assert len(out) == 1
    assert (out[0]["n_intervals"], out[0]["covered"]) == (1, 5.0)


# -------------------------------------------------------------- funnel


def _mk_events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (e, base + dt.timedelta(minutes=m), t) for e, m, t in rows
    ]
    return spark.createDataFrame(data, "e string, ts timestamp, tp string")


def test_funnel_strict_ordering_and_greedy_earliest(spark):
    rows = [
        ("u1", 0, "view"), ("u1", 5, "click"), ("u1", 9, "buy"),
        # u2: click BEFORE view must not count; second click after view does
        ("u2", 0, "click"), ("u2", 3, "view"), ("u2", 8, "click"),
        # u3: view only
        ("u3", 1, "view"),
        # u4: never viewed -> absent
        ("u4", 1, "click"), ("u4", 2, "buy"),
    ]
    out = {
        r["e"]: (r["t1"], r["t2"], r["t3"], r["steps_completed"])
        for r in temporal.funnel(
            _mk_events(spark, rows), "e", "ts", "tp", ["view", "click", "buy"]
        ).collect()
    }
    assert set(out) == {"u1", "u2", "u3"}
    assert out["u1"][3] == 3
    assert out["u2"][3] == 2 and out["u2"][2] is None
    assert out["u3"][3] == 1 and out["u3"][1] is None
    # greedy earliest: u1 t2 is minute 5 (epoch MICROSECONDS)
    assert out["u1"][1] - out["u1"][0] == 300 * 1_000_000


def test_funnel_same_timestamp_not_counted(spark):
    rows = [("u", 0, "view"), ("u", 0, "click")]
    out = temporal.funnel(
        _mk_events(spark, rows), "e", "ts", "tp", ["view", "click"]
    ).collect()
    assert out[0]["steps_completed"] == 1 and out[0]["t2"] is None


def test_funnel_sub_second_steps_chain(spark):
    # events 200ms apart inside ONE second: second-truncated matching
    # (the reviewed bug) made these unable to chain
    base = dt.datetime(2024, 1, 1, 10, 0, 0, 200_000)
    rows = [
        ("u", base, "view"),
        ("u", base + dt.timedelta(microseconds=700_000), "click"),
    ]
    df = spark.createDataFrame(rows, "e string, ts timestamp, tp string")
    out = temporal.funnel(df, "e", "ts", "tp", ["view", "click"]).collect()
    assert out[0]["steps_completed"] == 2
    assert out[0]["t2"] - out[0]["t1"] == 700_000


def test_funnel_single_step_raises(spark):
    with pytest.raises(ValueError):
        temporal.funnel(_mk_events(spark, []), "e", "ts", "tp", ["view"])


def test_ols_matches_python_exactly(spark):
    rng = random.Random(99)
    data = []
    series = {}
    for g in range(3):
        xs = [rng.randrange(-40, 40) for _ in range(120)]
        ys = [5 * x - 17 + rng.randrange(-10, 10) for x in xs]
        series[g] = (xs, ys)
        data += [(g, x, y) for x, y in zip(xs, ys)]
    data += [(9, 3, 1), (9, 3, 2)]  # zero-variance x
    df = spark.createDataFrame(data, "g int, x long, y long")
    out = {r["g"]: (r["slope"], r["intercept"]) for r in
           metrics.grouped_ols(df, "g", "x", "y").collect()}
    for g in range(3):
        xs, ys = series[g]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        a = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / a
        intercept = (sy - slope * sx) / n
        assert out[g] == (slope, intercept)  # bit-exact
    assert out[9] == (None, None)


def test_ols_exact_line_recovered(spark):
    df = spark.createDataFrame(
        [(0, i, 3 * i + 7) for i in range(20)], "g int, x long, y long"
    )
    r = metrics.grouped_ols(df, "g", "x", "y").collect()[0]
    assert r["slope"] == 3.0 and r["intercept"] == 7.0
