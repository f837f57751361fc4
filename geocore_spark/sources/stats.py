"""File-stats manifest + stats-pruned parquet scan.

Table formats win at 100 TB because the planner consults a MANIFEST —
per-file min/max column stats — instead of opening 800k parquet
footers to decide what to read. Raw-parquet Spark pushes predicates
into each file's footer, but it still has to list and open every file;
on an object store that is 800k GET-range requests before the first
byte of data. This module is the manifest for a raw-parquet lake:

- :func:`file_stats` builds the per-file stats table with ONE
  distributed scan of the requested columns (cheap: column-pruned,
  no shuffle beyond the per-file aggregate), to be persisted next to
  the table and refreshed by whatever writes it (compaction included).
- :func:`pruned_parquet` consults the stats table driver-side (one row
  per file — the same bounded metadata any manifest holds), keeps the
  files whose [min, max] intersect the requested ranges, and returns a
  reader over ONLY those files plus a report of what was skipped.

Pairs with functions/layout (Z-ordering is what makes per-file ranges
TIGHT) and operators/compact (which preserves them). Pruning is sound,
never exact: a kept file may still hold no matching rows (the range
intersects, the rows don't), so the caller applies the real predicate
on the pruned frame — correctness never depends on the stats, only
I/O volume does. NULL handling is conservative: a file whose stats row
has NULL min/max for a pruning column (all-null or missing column) is
always kept.

Reference analogue: the warehouse's metadata pruning the reference
gets implicitly from Snowflake micro-partitions (woodgilber/GeoCore
modeling/datasets/base.py CTAS tables); this is the same capability
owned by the engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PruneReport:
    files_total: int
    files_read: int
    rows_possible: int  # sum of n_rows over kept files (scan upper bound)


def decode_file_url(s: str) -> str:
    """Decode a ``_metadata.file_path`` / ``input_file_name`` URI into the
    true filesystem path (Hadoop ``Path.toString`` rendering). Spark
    URI-escapes special characters (``t t`` -> ``t%20t``) in those
    columns; comparing or opening the escaped string breaks on any path
    holding a space/%/# — unquote() inverts the escaping exactly (a
    literal ``%`` arrives double-escaped as ``%25``)."""
    return unquote(s)


def file_stats(
    spark: SparkSession, path: str | list[str], cols: list[str]
) -> DataFrame:
    """Per-file stats table: ``(file, n_rows, min_<c>, max_<c>, nnull_<c>
    per col)`` — one distributed column-pruned scan, one tiny aggregate
    keyed by file name. Persist it next to the table (parquet/JSON) and
    rebuild after writes; at 100 TB the stats table is ~one row per
    file, i.e. ~800k rows — itself a small DataFrame. ``path`` may be a
    directory or an explicit file list (e.g. a snapshot manifest's live
    files — sources/snapshots.snapshot_file_stats)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    paths = [path] if isinstance(path, str) else list(path)
    # key by _metadata.file_path (not input_file_name: that renders
    # file:/// where Hadoop/_metadata render file:/ — one table, two
    # spellings); driver-side consumers decode_file_url() at collect time
    df = spark.read.parquet(*paths).select(
        F.col("_metadata.file_path").alias("__file"), *cols
    )
    float_cols = {
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString() in ("double", "float")
    }
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        v = F.col(c)
        if c in float_cols:
            # NaN sorts ABOVE every double in Spark, so min/max over a
            # file holding one NaN become NaN and every range comparison
            # against them is false — the file would be WRONGLY pruned
            # despite holding matching finite rows. Exclude NaN from the
            # extrema and count it like NULL (prune_files keeps files
            # whose stats are NULL/unknown, so an all-NaN file survives).
            v = F.when(~F.isnan(v), v)
        aggs += [
            F.min(v).alias(f"min_{c}"),
            F.max(v).alias(f"max_{c}"),
            F.sum(v.isNull().cast("long")).alias(f"nnull_{c}"),
        ]
    return df.groupBy(F.col("__file").alias("file")).agg(*aggs)


def prune_files(
    stats: DataFrame, ranges: dict[str, tuple], report: bool = True
) -> tuple[list[str], PruneReport]:
    """Files whose per-column [min, max] intersects EVERY requested
    ``col -> (lo, hi)`` range (closed; pass None for an open bound).
    Conservative on NULL stats (file kept). Driver-side result is the
    kept file list — bounded by the file count, like any manifest."""
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        col_ok = F.lit(True)
        if hi is not None:
            col_ok = col_ok & (F.col(f"min_{c}") <= F.lit(hi))
        if lo is not None:
            col_ok = col_ok & (F.col(f"max_{c}") >= F.lit(lo))
        # NULL min/max (all-null file) -> condition NULL -> keep via coalesce
        cond = cond & F.coalesce(col_ok, F.lit(True))
    rows = stats.select("file", "n_rows", cond.alias("__keep")).collect()
    kept = [decode_file_url(r["file"]) for r in rows if r["__keep"]]
    rep = PruneReport(
        files_total=len(rows),
        files_read=len(kept),
        rows_possible=sum(r["n_rows"] for r in rows if r["__keep"]),
    )
    return kept, rep


def pruned_parquet(
    spark: SparkSession,
    path: str,
    stats: DataFrame,
    ranges: dict[str, tuple],
) -> tuple[DataFrame, PruneReport]:
    """Reader over only the files the stats can't exclude. The caller
    still applies the actual predicate — pruning bounds I/O, the filter
    owns correctness. An all-pruned result returns an empty frame with
    the table's schema (one footer read for the schema, no data)."""
    kept, rep = prune_files(stats, ranges)
    if not kept:
        schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], schema), rep
    return spark.read.parquet(*kept), rep
