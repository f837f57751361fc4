"""grouped_auc: sklearn-free exact oracle (brute pair counting), ties,
degenerate groups, label validation."""

import random

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import metrics


def _brute_auc_micro(pairs):
    """pairs: list of (label, score). Returns micro AUC via pair counts."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    if not pos or not neg:
        return None
    num2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                num2 += 2
            elif p == n:
                num2 += 1
    return (num2 * 1_000_000) // (2 * len(pos) * len(neg))


def _df(spark, rows):
    return spark.createDataFrame(rows, "g int, y int, s long")


def test_perfect_and_inverted_separation(spark):
    rows = [(0, 1, 10), (0, 1, 9), (0, 0, 1), (0, 0, 2),
            (1, 0, 10), (1, 0, 9), (1, 1, 1), (1, 1, 2)]
    out = {r["g"]: r["auc_micro"] for r in
           metrics.grouped_auc(_df(spark, rows), "g", "y", "s").collect()}
    assert out == {0: 1_000_000, 1: 0}


def test_all_ties_is_half(spark):
    rows = [(0, 1, 5), (0, 0, 5), (0, 1, 5), (0, 0, 5)]
    out = metrics.grouped_auc(_df(spark, rows), "g", "y", "s").collect()
    assert out[0]["auc_micro"] == 500_000
    assert (out[0]["pos"], out[0]["neg"]) == (2, 2)


def test_degenerate_groups_null_auc(spark):
    rows = [(0, 1, 5), (0, 1, 7), (1, 0, 3)]
    out = {r["g"]: r["auc_micro"] for r in
           metrics.grouped_auc(_df(spark, rows), "g", "y", "s").collect()}
    assert out == {0: None, 1: None}


def test_random_matches_brute_force_with_heavy_ties(spark):
    rng = random.Random(20260820)
    rows = [
        (g, rng.randrange(2), rng.randrange(8))  # 8 score levels -> many ties
        for g in range(3)
        for _ in range(200)
    ]
    expected = {
        g: _brute_auc_micro([(y, s) for gg, y, s in rows if gg == g])
        for g in range(3)
    }
    out = {r["g"]: r["auc_micro"] for r in
           metrics.grouped_auc(_df(spark, rows), "g", "y", "s").collect()}
    assert out == expected


def test_boolean_labels_accepted(spark):
    df = spark.createDataFrame(
        [(0, True, 9), (0, False, 1)], "g int, y boolean, s long"
    )
    out = metrics.grouped_auc(df, "g", "y", "s").collect()
    assert out[0]["auc_micro"] == 1_000_000


def test_bad_label_raises(spark):
    df = _df(spark, [(0, 2, 5), (0, 0, 1)])
    with pytest.raises(Exception):
        metrics.grouped_auc(df, "g", "y", "s").collect()


def test_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [(0, 1, 9), (0, 0, 1), (None, 1, 5), (0, None, 5), (0, 1, None)],
        "g int, y int, s long",
    )
    out = metrics.grouped_auc(df, "g", "y", "s").collect()
    assert len(out) == 1 and out[0]["auc_micro"] == 1_000_000
    assert (out[0]["pos"], out[0]["neg"]) == (1, 1)


def test_soft_labels_raise_not_truncate(spark):
    # 0.7 truncates to 0 under cast('long') — an after-cast isin(0,1)
    # check would pass it and corrupt the rank sum
    df = spark.createDataFrame(
        [(0, 0.7, 5), (0, 1.0, 9), (0, 0.0, 1)], "g int, y double, s long"
    )
    with pytest.raises(Exception):
        metrics.grouped_auc(df, "g", "y", "s").collect()
    clean = spark.createDataFrame(
        [(0, 1.0, 9), (0, 0.0, 1)], "g int, y double, s long"
    )
    assert metrics.grouped_auc(clean, "g", "y", "s").collect()[0]["auc_micro"] == 1_000_000
