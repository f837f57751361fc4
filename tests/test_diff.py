"""Snapshot diff operator."""

from pyspark.sql import functions as F

from geocore_spark.operators import diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("n", None)],
        "url string, fp int",
    )
    new = spark.createDataFrame(
        [("a", 1), ("b", 9), ("d", 4), ("n", None)],
        "url string, fp int",
    )
    got = {r["url"]: r["status"] for r in diff.snapshot_diff(old, new).collect()}
    assert got == {
        "a": "unchanged",
        "b": "changed",
        "c": "removed",
        "d": "added",
        "n": "unchanged",  # null-safe equality: present both sides, both null
    }


def test_diff_counts(spark):
    old = spark.createDataFrame([("a", 1), ("b", 2)], "url string, fp int")
    new = spark.createDataFrame([("a", 1), ("c", 3)], "url string, fp int")
    got = {
        r["status"]: r["n"]
        for r in diff.diff_counts(diff.snapshot_diff(old, new)).collect()
    }
    assert got == {"unchanged": 1, "removed": 1, "added": 1}
