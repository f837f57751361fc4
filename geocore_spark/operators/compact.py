"""Parquet table compaction — the small-files maintenance operator.

Every incrementally-built table (streaming sinks, per-batch appends, the
checkpoint stage dirs) accretes small files; at 100 TB the symptom is a
scan whose task count is the FILE count, each task reading kilobytes —
scheduler overhead dominates and parquet footer reads swamp the data
bytes. The standard fix (Delta/Iceberg ``OPTIMIZE``, public technique)
is periodic compaction: rewrite many small files into few right-sized
ones, preserving the table's clustering so min/max pruning keeps
working. The reference materializes layers as warehouse tables and
leaves file hygiene to Snowflake (woodgilber/GeoCore
modeling/datasets/base.py:74-76 CTAS); on a raw-parquet lake the engine
has to own it.

Two modes, matching the two real maintenance regimes:

- :func:`compact_table` — full rewrite to ``ceil(bytes / target)``
  files. Use for small-to-medium tables or when the clustering itself
  changed (e.g. first-time Z-ordering). One shuffle of the whole table.
- :func:`compact_small_files` — selective: only files under
  ``min_file_bytes`` are rewritten, bin-packed into ~``target_bytes``
  groups; large files are NOT touched or re-read. This is the 100 TB
  shape — cost scales with the small-file debt, not the table size.
  Groups are formed over curve/cluster order (per-file min of
  ``order_col``, one tiny Spark job over just the small files) so a
  Z-ordered table keeps compact per-file footprints after the merge.

Driver-side state is one entry per FILE (path, size — bounded metadata,
the same thing any table format's manifest holds), never rows. All
filesystem access goes through the Hadoop FileSystem API so the same
code runs on file://, hdfs:// and s3a:// (directory rename is atomic on
HDFS/local and non-atomic on object stores — production object-store
deployments should point ``out_path`` at a fresh location and swap via
their catalog instead of in-place).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_before: int
    bytes_after: int
    files_rewritten: int  # inputs actually read+rewritten (selective mode)


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) per data file under a parquet directory — markers
    (_SUCCESS), hidden files and subdir manifests excluded, exactly the
    files Spark's parquet reader would scan."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        raise FileNotFoundError(path)
    out: list[tuple[str, int]] = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def _swap_into(spark: SparkSession, tmp: str, dest: str) -> None:
    """Replace ``dest`` with ``tmp`` (delete + rename; atomic on
    HDFS/local FS, two operations on object stores — see module note)."""
    fs, dest_p, jvm = _fs(spark, dest)
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(dest_p):
        fs.delete(dest_p, True)
    if not fs.rename(tmp_p, dest_p):
        raise IOError(f"rename {tmp} -> {dest} failed")


def compact_table(
    spark: SparkSession,
    path: str,
    target_bytes: int = 256 * 1024 * 1024,
    z_col: str | None = None,
    out_path: str | None = None,
) -> CompactionStats:
    """Rewrite a parquet directory into ``ceil(total/target)`` files.

    ``z_col``: a clustering column (e.g. the ``zval`` written by
    functions/layout.zorder_layout) — the rewrite range-partitions and
    sorts on it so every output file still covers one compact curve
    window and min/max pruning survives compaction. Without it the
    rewrite is a plain round-robin repartition (right-sizes files but
    intentionally claims nothing about clustering).

    ``out_path=None`` swaps in place; on object stores pass a fresh
    ``out_path`` and swap via your catalog (module note).
    """
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    files = list_data_files(spark, path)
    bytes_before = sum(b for _, b in files)
    n_out = max(1, math.ceil(bytes_before / target_bytes))
    df = spark.read.parquet(path)
    if z_col is not None:
        out = df.repartitionByRange(n_out, F.col(z_col)).sortWithinPartitions(z_col)
    else:
        out = df.repartition(n_out)
    dest = out_path or path
    tmp = dest.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    _swap_into(spark, tmp, dest)
    after = list_data_files(spark, dest)
    return CompactionStats(
        files_before=len(files),
        files_after=len(after),
        bytes_before=bytes_before,
        bytes_after=sum(b for _, b in after),
        files_rewritten=len(files),
    )


def _pack_adjacent(
    sized: list[tuple[str, int]], target_bytes: int
) -> list[list[str]]:
    """Greedy adjacent grouping (input already in merge order): cut a new
    group when adding the next file would exceed the target. Singleton
    groups are dropped — rewriting one small file alone buys nothing."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f, b in sized:
        if cur and cur_bytes + b > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += b
    if cur:
        groups.append(cur)
    return [g for g in groups if len(g) > 1]


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_bytes: int = 256 * 1024 * 1024,
    min_file_bytes: int | None = None,
    order_col: str | None = None,
) -> CompactionStats:
    """Merge only the files under ``min_file_bytes`` (default
    ``target_bytes // 2``), leaving right-sized files untouched and
    unread — cost scales with the small-file debt, not the table.

    ``order_col``: cluster/curve column — small files are merged with
    their curve NEIGHBORS (ordered by per-file min, computed by one tiny
    Spark aggregate over just the small files) and each merged file is
    sorted on it, so compaction never undoes a Z-order layout. Without
    it, files merge in listing order (append order for most writers).

    Safety: merged replacements are written to a temp dir and MOVED into
    the table before the originals are deleted — a crash in between
    leaves duplicate rows (visible, recoverable by exact dedup on the
    table key) rather than lost rows; the temp dir itself is invisible
    to readers. The final state is byte-count-identical to a full
    rewrite of the touched files.
    """
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    min_bytes = target_bytes // 2 if min_file_bytes is None else min_file_bytes
    files = list_data_files(spark, path)
    bytes_before = sum(b for _, b in files)
    small = [(f, b) for f, b in files if b < min_bytes]
    if len(small) < 2:
        return CompactionStats(len(files), len(files), bytes_before, bytes_before, 0)

    if order_col is not None:
        # merge order = curve order: per-file min of the cluster column,
        # one aggregate over only the small files (bounded: |small| rows)
        mins = (
            spark.read.parquet(*[f for f, _ in small])
            .groupBy(F.input_file_name().alias("__f"))
            .agg(F.min(order_col).alias("__m"))
            .collect()
        )
        key = {r["__f"]: r["__m"] for r in mins}
        # input_file_name URL-encodes some chars; match on basename
        by_name = {f.rsplit("/", 1)[-1]: (f, b) for f, b in small}
        ordered = []
        for f_enc in sorted(key, key=lambda f: (key[f] is None, key[f], f)):
            name = f_enc.rsplit("/", 1)[-1]
            if name in by_name:
                ordered.append(by_name.pop(name))
        ordered.extend(sorted(by_name.values()))  # files the probe missed
        small = ordered

    groups = _pack_adjacent(small, target_bytes)
    if not groups:
        return CompactionStats(len(files), len(files), bytes_before, bytes_before, 0)

    fs, _, jvm = _fs(spark, path)
    tmp_root = path.rstrip("/") + "__compact_tmp"
    tmp_root_p = jvm.org.apache.hadoop.fs.Path(tmp_root)
    if fs.exists(tmp_root_p):
        fs.delete(tmp_root_p, True)

    # group rewrites are independent single-task jobs — submit them
    # concurrently (Spark schedules parallel jobs fine) instead of a
    # serial driver loop whose wall-clock would be sum-of-groups
    def _write_group(gi: int) -> None:
        # coalesce BEFORE the sort: sorting first and coalescing after
        # concatenates the per-split sorted runs, which is NOT sorted
        df = spark.read.parquet(*groups[gi]).coalesce(1)
        if order_col is not None:
            df = df.sortWithinPartitions(order_col)
        df.write.mode("overwrite").parquet(f"{tmp_root}/g{gi}")

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(groups))) as ex:
        list(ex.map(_write_group, range(len(groups))))

    # metadata phase (serial, cheap): move merged files into the table
    rewritten: list[str] = []
    for gi, group in enumerate(groups):
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(f"{tmp_root}/g{gi}")):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                dest = jvm.org.apache.hadoop.fs.Path(
                    f"{path.rstrip('/')}/compacted-{gi}-{name}"
                )
                if not fs.rename(st.getPath(), dest):
                    raise IOError(f"rename into table failed for group {gi}")
        rewritten.extend(group)
    # originals last: new data is live before old data disappears
    for f in rewritten:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    fs.delete(tmp_root_p, True)
    after = list_data_files(spark, path)
    return CompactionStats(
        files_before=len(files),
        files_after=len(after),
        bytes_before=bytes_before,
        bytes_after=sum(b for _, b in after),
        files_rewritten=len(rewritten),
    )
