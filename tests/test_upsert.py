"""Keyed upsert: final state == logical merge, only hit files rewritten
on a key-sorted table, new keys append, duplicate-key batches rejected,
layout preserved through the rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geocore_spark.operators import compact, upsert
from geocore_spark.sources import stats as st


def _table(spark, path, n=4000, n_files=8):
    df = spark.createDataFrame(
        [Row(k=i, v=f"old-{i}") for i in range(n)]
    )
    # key-sorted layout: contiguous key ranges per file (tight manifests)
    df.repartitionByRange(n_files, F.col("k")).sortWithinPartitions("k") \
        .write.parquet(path)


def test_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path)
    updates = spark.createDataFrame(
        # 3 keys inside one file's range + 2 brand-new keys
        [Row(k=10, v="new-10"), Row(k=11, v="new-11"), Row(k=12, v="new-12"),
         Row(k=99990, v="ins-a"), Row(k=99991, v="ins-b")]
    )
    stats = upsert.upsert_by_key(spark, path, updates, "k", order_col="k")
    assert stats.rows_updated == 3 and stats.rows_inserted == 2
    # key-sorted table: the 3 updated keys live in ONE file; only it
    # (plus nothing else) is rewritten
    assert stats.files_rewritten == 1
    assert stats.files_total == 8
    back = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert len(back) == 4002
    assert back[10] == "new-10" and back[12] == "new-12"
    assert back[13] == "old-13"
    assert back[99990] == "ins-a" and back[99991] == "ins-b"


def test_upsert_with_persisted_manifest(spark, tmp_path):
    path = str(tmp_path / "m")
    _table(spark, path, n=2000, n_files=4)
    manifest = st.file_stats(spark, path, ["k"])
    updates = spark.createDataFrame([Row(k=1500, v="x")])
    stats = upsert.upsert_by_key(
        spark, path, updates, "k", key_stats=manifest
    )
    assert stats.files_rewritten == 1 and stats.rows_updated == 1
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert back.filter(F.col("k") == 1500).first()["v"] == "x"


def test_upsert_rejects_bad_batches(spark, tmp_path):
    path = str(tmp_path / "b")
    _table(spark, path, n=100, n_files=2)
    dup = spark.createDataFrame([Row(k=1, v="a"), Row(k=1, v="b")])
    with pytest.raises(ValueError, match="unique"):
        upsert.upsert_by_key(spark, path, dup, "k")
    withnull = spark.createDataFrame(
        [(None, "a")], "k bigint, v string"
    )
    with pytest.raises(ValueError, match="unique"):
        upsert.upsert_by_key(spark, path, withnull, "k")
    empty = spark.createDataFrame([], "k bigint, v string")
    stats = upsert.upsert_by_key(spark, path, empty, "k")
    assert stats.files_rewritten == 0 and stats.files_total == 2


def test_upsert_preserves_sort_and_composes_with_compact(spark, tmp_path):
    path = str(tmp_path / "c")
    _table(spark, path, n=3000, n_files=6)
    updates = spark.createDataFrame(
        [Row(k=i, v=f"n-{i}") for i in range(500, 560)]
    )
    upsert.upsert_by_key(spark, path, updates, "k", order_col="k")
    # rewritten files stay k-sorted (layout survives the upsert)
    import numpy as np
    import pyarrow.parquet as pq

    for f, _ in compact.list_data_files(spark, path):
        ks = pq.read_table(f.removeprefix("file:"), columns=["k"])["k"].to_numpy()
        assert (np.diff(ks) >= 0).all(), f
    # and the table still compacts cleanly afterwards
    cs = compact.compact_small_files(
        spark, path, target_bytes=1 << 30, min_file_bytes=1 << 30,
        order_col="k",
    )
    assert cs.files_after == 1
    assert spark.read.parquet(path).count() == 3000


def test_upsert_bloom_narrows_hash_layout(spark, tmp_path):
    """On a hash layout every file's key range spans the table, so the
    range manifest alone rewrites all files; the Bloom sidecar narrows
    the rewrite to the files actually holding the batch keys, with an
    identical final state."""
    path = str(tmp_path / "h")
    spark.createDataFrame(
        [Row(k=i, v=f"old-{i}") for i in range(4000)]
    ).repartition(8, "k").write.parquet(path)
    truth = {
        st.decode_file_url(r["f"])
        for r in spark.read.parquet(path)
        .filter(F.col("k").isin([7, 1234]))
        .select(F.col("_metadata.file_path").alias("f"))
        .distinct()
        .collect()
    }
    blooms = st.file_blooms(spark, path, ["k"]).cache()
    blooms.count()
    updates = spark.createDataFrame(
        [Row(k=7, v="new-7"), Row(k=1234, v="new-1234"), Row(k=9999, v="ins")]
    )
    s = upsert.upsert_by_key(spark, path, updates, "k", key_blooms=blooms)
    blooms.unpersist()
    assert s.files_total == 8
    assert len(truth) <= s.files_rewritten <= len(truth) + 1, (s, truth)
    assert (s.rows_updated, s.rows_inserted) == (2, 1)
    got = spark.read.parquet(path)
    assert got.count() == 4001
    assert sorted(
        tuple(r) for r in got.filter(F.col("k").isin([7, 1234, 9999])).collect()
    ) == [(7, "new-7"), (1234, "new-1234"), (9999, "ins")]


def test_upsert_refuses_float_keys(spark, tmp_path):
    path = str(tmp_path / "f")
    spark.createDataFrame(
        [Row(k=float(i), v=i) for i in range(10)]
    ).write.parquet(path)
    updates = spark.createDataFrame([Row(k=1.0, v=99)])
    with pytest.raises(ValueError, match="unsound"):
        upsert.upsert_by_key(spark, path, updates, "k")
