"""Snapshot diff: classify rows between two corpus snapshots.

An incremental crawl (or any periodically rebuilt table) needs the delta
between snapshot T and T+1: which keys appeared, vanished, or changed
content. One full-outer join on the key, a fingerprint comparison for
"changed" — shuffle-bounded on the key, no driver paths. The reference's
nearest analogue is its cache-vs-rebuild choice (train.py:144-180); this
is the operator form.

At 100 TB both sides are cell/bucket-partitioned tables; co-bucketing on
the key makes this a storage-partitioned join with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    fingerprint: str = "fp",
) -> DataFrame:
    """(key, status, old_fp, new_fp) with status in
    added | removed | changed | unchanged.

    ``fingerprint`` is any comparable content column (use
    functions.text.fingerprint64 for text bodies). Null fingerprints
    compare as distinct from everything except another null (SQL
    null-safe equality).
    """
    o = old.select(
        F.col(key).alias("k"),
        F.col(fingerprint).alias("old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key).alias("k"),
        F.col(fingerprint).alias("new_fp"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, "k", "full_outer")
    # presence flags, not fingerprint nullness: a present row may carry a
    # null fingerprint and must still classify via null-safe comparison
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        F.col("k").alias(key), status.alias("status"), "old_fp", "new_fp"
    )


def diff_counts(diff: DataFrame) -> DataFrame:
    """Per-status row counts — the monitoring summary of a crawl delta."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))
