"""Stats-pruned scans: correctness (pruned+filter == full filter, always),
and the MEASURED pruning claim on a Z-ordered table (most files skipped
for a box predicate; hash-scattered baseline skips ~none)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geocore_spark.functions import layout
from geocore_spark.sources import stats as st


def _pts(spark, n=20000, seed=9):
    rng = random.Random(seed)
    return spark.createDataFrame(
        [Row(id=i, lat=rng.uniform(-60, 60), lon=rng.uniform(-180, 180))
         for i in range(n)]
    )


BOX = {"lat": (10.0, 30.0), "lon": (20.0, 40.0)}


def _box_filter(df):
    return df.filter(
        F.col("lat").between(10.0, 30.0) & F.col("lon").between(20.0, 40.0)
    )


def test_pruned_scan_equals_full_filter_zordered(spark, tmp_path):
    path = str(tmp_path / "z")
    layout.zorder_layout(_pts(spark), res=13, n_files=16).write.parquet(path)
    stats = st.file_stats(spark, path, ["lat", "lon"])
    pruned, rep = st.pruned_parquet(spark, path, stats, BOX)
    got = {r["id"] for r in _box_filter(pruned).collect()}
    want = {r["id"] for r in _box_filter(spark.read.parquet(path)).collect()}
    assert got == want and len(want) > 50
    # the measured claim: a z-ordered table skips most files for a box
    assert rep.files_total == 16
    assert rep.files_read < 8, rep
    assert rep.rows_possible < 20000


def test_pruning_is_sound_on_hash_layout(spark, tmp_path):
    """Hash-scattered files each span ~everything — pruning keeps ~all
    files (no false exclusion ever; little gain without layout)."""
    path = str(tmp_path / "u")
    _pts(spark).repartition(16).write.parquet(path)
    stats = st.file_stats(spark, path, ["lat", "lon"])
    pruned, rep = st.pruned_parquet(spark, path, stats, BOX)
    got = {r["id"] for r in _box_filter(pruned).collect()}
    want = {r["id"] for r in _box_filter(spark.read.parquet(path)).collect()}
    assert got == want
    assert rep.files_read == rep.files_total == 16


def test_prune_open_bounds_nulls_and_empty(spark, tmp_path):
    path = str(tmp_path / "n")
    rows = [Row(id=1, lat=5.0, lon=5.0), Row(id=2, lat=None, lon=None)]
    spark.createDataFrame(rows).repartition(1).write.parquet(path)
    stats = st.file_stats(spark, path, ["lat"])
    # open upper bound
    kept, rep = st.prune_files(stats, {"lat": (0.0, None)})
    assert rep.files_read == 1
    # all-pruned -> empty frame, schema intact, zero rows
    pruned, rep2 = st.pruned_parquet(spark, path, stats, {"lat": (90.0, 95.0)})
    assert rep2.files_read == 0 and pruned.count() == 0
    assert set(pruned.columns) == {"id", "lat", "lon"}
    with pytest.raises(ValueError):
        st.file_stats(spark, path, [])


def test_nan_rows_do_not_poison_file_stats(spark, tmp_path):
    """Spark sorts NaN above every double, so an unguarded max() over a
    file with one NaN row is NaN and every range test against it is
    false — the file would be WRONGLY pruned despite matching finite
    rows. NaN is excluded from the extrema (it can never satisfy a
    range predicate itself)."""
    path = str(tmp_path / "nan")
    spark.createDataFrame(
        [(1, 15.0), (2, float("nan")), (3, 20.0)], "id long, lat double"
    ).repartition(1).write.parquet(path)
    stats = st.file_stats(spark, path, ["lat"])
    row = stats.collect()[0]
    assert row["min_lat"] == 15.0 and row["max_lat"] == 20.0
    kept, rep = st.prune_files(stats, {"lat": (10.0, 30.0)})
    assert rep.files_read == 1  # the regression: unguarded stats read 0


def test_all_null_stats_file_is_kept(spark, tmp_path):
    path = str(tmp_path / "an")
    spark.createDataFrame(
        [(1, None), (2, None)], "id long, lat double"
    ).repartition(1).write.parquet(path)
    stats = st.file_stats(spark, path, ["lat"])
    kept, rep = st.prune_files(stats, {"lat": (0.0, 1.0)})
    assert rep.files_read == 1  # conservative: never exclude on NULL stats
