"""Keyed upsert on a raw-parquet table — rewrite only the hit files.

The incremental-corpus primitive: a recrawl batch replaces pages by url,
a feature refresh replaces cells by id. Table formats do this with MERGE
+ file skipping; on raw parquet the naive route rewrites the whole
table. This operator does the manifest move instead:

1. per-file [min, max] of the key column (reuse a persisted
   sources/stats manifest, or build one — the cold path scans the key
   column once);
2. victim files are picked by a DISTRIBUTED probe
   (sources/stats.probe_victim_files): the manifest-bounded ranges are
   captured inside a mapInPandas kernel that searchsorts each key
   partition in place — only hit file NAMES reach the driver, so the
   batch may be any size (a 10^9-url recrawl probes without a
   driver-side key collect);
3. hit files are read, matching-key rows dropped (left-anti), the
   updates unioned in, and replacements written + moved in before the
   originals are deleted (the compact.py crash contract: a crash
   between the two leaves visible duplicates, never lost rows);
4. keys that land in NO file append as a brand-new file; untouched
   files are never read or written.

Cost scales with the hit-file volume, not the table. A key-clustered
layout (sorted/bucketed by key — functions/layout for 2-D,
io.write_bucketed for hash) keeps per-file key ranges tight so a batch
hits few files; on an unclustered table every file's range may span the
key space and the upsert degrades to a full rewrite — that is a layout
problem, and the returned stats make it visible (files_rewritten).

Reference analogue: the reference re-CTASes layers wholesale
(woodgilber/GeoCore modeling/datasets/base.py:74-76); this is the
incremental form its warehouse gave it for free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class UpsertStats:
    files_total: int
    files_rewritten: int
    rows_updated: int    # existing rows replaced (key matched)
    rows_inserted: int   # new keys appended


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def upsert_by_key(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str,
    order_col: str | None = None,
    key_stats: DataFrame | None = None,
    key_blooms: DataFrame | None = None,
) -> UpsertStats:
    """Replace-or-insert ``updates`` rows into the parquet table at
    ``path`` by ``key_col``. Updates must carry the table's schema and
    UNIQUE, non-null keys (checked — duplicate keys in one batch have no
    defined winner, reject loudly instead of picking one silently).
    ``order_col``: re-sort rewritten files on this column (pass the
    table's cluster key, e.g. ``zval``, to keep layout through upserts).
    ``key_stats``: a persisted ``sources.stats.file_stats(path,
    [key_col])`` manifest; omitted = built now with one key-column scan.
    ``key_blooms``: a persisted ``sources.stats.file_blooms(path,
    [key_col])`` sidecar — victim files are additionally Bloom-probed
    (distributed; bitmaps broadcast, keys never collected), which is
    what prunes a point-key batch on a HASH layout where every file's
    [min, max] range covers the key space. The two compose: ranges
    first, blooms over the survivors.
    """
    from geocore_spark.sources import stats as st

    ktype = dict(
        (f.name, f.dataType.typeName())
        for f in spark.read.parquet(path).schema.fields
    ).get(key_col)
    if ktype in ("float", "double"):
        # same trap as snapshots.merge_into: NaN joins as equal but is
        # excluded from file range extrema, so a NaN-keyed row's file
        # would never be picked as a victim and the stale row survives
        raise ValueError(
            f"upsert_by_key on a {ktype} key column is unsound under "
            "stats pruning (NaN victim files would be missed) — use an "
            "integral/string key"
        )
    chk = updates.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(key_col).alias("nn"),
        F.count_distinct(key_col).alias("d"),
    ).first()
    if chk["n"] == 0:
        return UpsertStats(len(_list_files(spark, path)), 0, 0, 0)
    if chk["nn"] != chk["n"] or chk["d"] != chk["n"]:
        raise ValueError(
            f"updates must have unique non-null {key_col}: "
            f"{chk['n']} rows, {chk['nn']} non-null, {chk['d']} distinct"
        )

    if key_stats is None:
        key_stats = st.file_stats(spark, path, [key_col])
    files_total = key_stats.count()
    hitset = st.probe_victim_files(
        updates.select(key_col), key_col, key_stats
    )
    if key_blooms is not None and hitset:
        hitset &= st.probe_victim_files_bloom(
            updates.select(key_col), key_col, key_blooms, candidates=hitset
        )
    hit = sorted(hitset)

    fs, _, jvm = _fs(spark, path)
    tmp_root = path.rstrip("/") + "__upsert_tmp"
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp_root)
    if fs.exists(tmp_p):
        fs.delete(tmp_p, True)

    upd = updates.select(*spark.read.parquet(path).columns)
    rows_updated = 0
    if hit:
        existing = spark.read.parquet(*hit)
        rows_updated = (
            existing.join(upd.select(key_col), key_col, "semi").count()
        )
        merged = existing.join(upd.select(key_col), key_col, "anti").unionByName(
            upd
        )
    else:
        merged = upd
    rows_inserted = chk["n"] - rows_updated
    n_out = max(1, len(hit))
    out = merged.repartition(n_out) if order_col is None else (
        merged.repartitionByRange(n_out, F.col(order_col)).sortWithinPartitions(
            order_col
        )
    )
    out.write.mode("overwrite").parquet(tmp_root)

    # move replacements in, then delete originals (duplicates-not-loss)
    for stf in fs.listStatus(tmp_p):
        name = stf.getPath().getName()
        if stf.isFile() and not name.startswith(("_", ".")):
            dest = jvm.org.apache.hadoop.fs.Path(
                f"{path.rstrip('/')}/upserted-{name}"
            )
            if not fs.rename(stf.getPath(), dest):
                raise IOError(f"rename into table failed: {name}")
    for f in hit:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    fs.delete(tmp_p, True)
    return UpsertStats(
        files_total=files_total,
        files_rewritten=len(hit),
        rows_updated=rows_updated,
        rows_inserted=rows_inserted,
    )


def _list_files(spark: SparkSession, path: str):
    fs, p, _ = _fs(spark, path)
    return [
        s.getPath().toString()
        for s in fs.listStatus(p)
        if s.isFile() and not s.getPath().getName().startswith(("_", "."))
    ]
