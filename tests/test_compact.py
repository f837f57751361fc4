"""Compaction: row preservation, file-count math, selective small-file
merge, and the clustering-preservation claim (measured on written
parquet, same methodology as test_layout)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geocore_spark.functions import layout
from geocore_spark.operators import compact


def _points(spark, n, seed=5):
    rng = random.Random(seed)
    return spark.createDataFrame(
        [Row(id=i, lat=rng.uniform(-60, 60), lon=rng.uniform(-180, 180))
         for i in range(n)]
    )


def _file_count(spark, path):
    return len(compact.list_data_files(spark, path))


def test_compact_table_full_rewrite(spark, tmp_path):
    path = str(tmp_path / "t")
    _points(spark, 5000).repartition(40).write.parquet(path)
    assert _file_count(spark, path) == 40
    before_ids = {r["id"] for r in spark.read.parquet(path).collect()}

    files = compact.list_data_files(spark, path)
    total = sum(b for _, b in files)
    stats = compact.compact_table(spark, path, target_bytes=total // 3 + 1)
    assert stats.files_before == 40
    assert stats.files_after <= 4  # ceil(total/(total/3+1)) = 3 (+_SUCCESS excl.)
    assert stats.files_rewritten == 40
    back = spark.read.parquet(path)
    assert {r["id"] for r in back.collect()} == before_ids


def test_compact_table_empty_and_validation(spark, tmp_path):
    path = str(tmp_path / "e")
    _points(spark, 10).write.parquet(path)
    with pytest.raises(ValueError):
        compact.compact_table(spark, path, target_bytes=0)
    with pytest.raises(FileNotFoundError):
        compact.list_data_files(spark, str(tmp_path / "missing"))


def test_compact_table_out_path_leaves_source(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _points(spark, 2000).repartition(16).write.parquet(src)
    stats = compact.compact_table(
        spark, src, target_bytes=1 << 30, out_path=dst
    )
    assert stats.files_after == 1
    assert _file_count(spark, src) == 16  # source untouched
    assert spark.read.parquet(dst).count() == 2000


def test_compact_small_files_selective(spark, tmp_path):
    path = str(tmp_path / "s")
    # 2 big files + 30 tiny ones appended
    _points(spark, 20000, seed=1).repartition(2).write.parquet(path)
    _points(spark, 600, seed=2).withColumn("id", F.col("id") + 1_000_000) \
        .repartition(30).write.mode("append").parquet(path)
    files = compact.list_data_files(spark, path)
    sizes = sorted(b for _, b in files)
    big_cutoff = sizes[-2]  # the two big files stay above the threshold
    stats = compact.compact_small_files(
        spark, path, target_bytes=1 << 30, min_file_bytes=big_cutoff
    )
    assert stats.files_rewritten == 30
    # 2 untouched big files + 1 merged replacement
    assert stats.files_after == 3
    back = spark.read.parquet(path)
    assert back.count() == 20600
    assert back.select("id").distinct().count() == 20600


def test_compact_small_files_noop_cases(spark, tmp_path):
    path = str(tmp_path / "n")
    _points(spark, 1000).repartition(2).write.parquet(path)
    # every file above the threshold -> untouched
    stats = compact.compact_small_files(spark, path, min_file_bytes=1)
    assert stats.files_rewritten == 0
    assert stats.files_after == stats.files_before == 2


def _per_file_bbox_areas(spark, path):
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg((F.max("lat") - F.min("lat")).alias("dlat"),
             (F.max("lon") - F.min("lon")).alias("dlon"))
        .collect()
    )
    return [r["dlat"] * r["dlon"] for r in per_file]


def test_compact_preserves_zorder_locality(spark, tmp_path):
    """Merging curve-adjacent small files (order_col) must keep per-file
    lat/lon footprints compact; merging in listing order must not be
    assumed to. THE reason order_col exists."""
    path = str(tmp_path / "z")
    df = _points(spark, 40000, seed=3)
    layout.zorder_layout(df, res=13, n_files=32).write.parquet(path)
    areas_before = _per_file_bbox_areas(spark, path)
    mean_before = sum(areas_before) / len(areas_before)

    files = compact.list_data_files(spark, path)
    total = sum(b for _, b in files)
    # force every file under the threshold; merge ~4 neighbors per group
    stats = compact.compact_small_files(
        spark, path,
        target_bytes=total // 8 + 1,
        min_file_bytes=total,  # everything is "small"
        order_col="zval",
    )
    assert stats.files_after < stats.files_before
    back = spark.read.parquet(path)
    assert back.count() == 40000
    areas_after = _per_file_bbox_areas(spark, path)
    mean_after = sum(areas_after) / len(areas_after)
    # merged neighbor files cover the union of adjacent curve windows:
    # footprint grows by ~the merge factor (32 -> ~10 files, ~3.2x), NOT
    # to the whole space (randomly grouped z-windows would union to most
    # of the globe). The bound is RELATIVE because the absolute areas
    # drift run-to-run: repartitionByRange samples with a seed derived
    # from the RDD id, so file boundaries depend on how many RDDs the
    # shared session created before this test (observed mean_after
    # 9.4k-11.3k for identical code — an absolute threshold at 10.8k
    # flaked). Ratio observed 2.4-3.2x; 4.5x is the claim with slack.
    merge_factor = stats.files_before / stats.files_after
    assert mean_after < 4.5 * mean_before, (mean_after, mean_before)
    assert mean_after < 1.5 * merge_factor * mean_before, (
        mean_after, mean_before, merge_factor)
    # and z-order within each merged file survives: file rows sorted on zval
    import numpy as np
    import pyarrow.parquet as pq

    for f, _b in compact.list_data_files(spark, path):
        local = f.removeprefix("file:")
        zv = pq.read_table(local, columns=["zval"])["zval"].to_numpy()
        assert (np.diff(zv) >= 0).all(), f
    _ = mean_before  # informational; before-files are strictly smaller
