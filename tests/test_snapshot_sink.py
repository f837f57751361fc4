"""Exactly-once streaming append into a snapshot table
(streaming/snapshot_sink.py + sources/snapshots.py txn tokens).

Pins the at-least-once -> exactly-once contract: a re-delivered batch id
(foreachBatch's retry mode after a crash between sink write and
checkpoint commit) must not duplicate rows, across restarts, and the
token must survive unrelated delete/rewrite commits in between.
"""

import os

import pytest
from pyspark.sql import functions as F

from geocore_spark.sources import snapshots as snap
from geocore_spark.streaming.snapshot_sink import snapshot_append_sink


@pytest.fixture()
def paths(tmp_path):
    return {
        "landing": str(tmp_path / "landing"),
        "table": str(tmp_path / "table"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _land(spark, landing, lo, hi, name):
    (
        spark.range(lo, hi)
        .withColumn("v", F.col("id") * 10)
        .coalesce(1)
        .write.mode("append")
        .parquet(landing)
    )
    # file-source streams discover files by listing; append mode keeps
    # earlier batches' files in place
    assert any(f.endswith(".parquet") for f in os.listdir(landing)), name


def _drain(spark, paths):
    stream = spark.readStream.schema("id long, v long").parquet(paths["landing"])
    q = (
        stream.writeStream.foreachBatch(
            snapshot_append_sink(paths["table"], app_id="t-ingest")
        )
        .option("checkpointLocation", paths["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "drain timed out"


def test_stream_lands_then_restart_appends_only_new(spark, paths):
    _land(spark, paths["landing"], 0, 100, "b0")
    _drain(spark, paths)
    got = snap.read_snapshot(spark, paths["table"])
    assert got.count() == 100
    # restart the same checkpoint after more files land: only the delta
    _land(spark, paths["landing"], 100, 150, "b1")
    _drain(spark, paths)
    got = snap.read_snapshot(spark, paths["table"])
    assert got.count() == 150
    assert got.select("id").distinct().count() == 150  # no duplicates
    # an idle restart (no new files) commits nothing
    v = snap.latest_version(spark, paths["table"])
    _drain(spark, paths)
    assert snap.latest_version(spark, paths["table"]) == v


def test_redelivered_batch_is_noop(spark, paths):
    """Simulate the crash-between-sink-and-checkpoint retry: invoke the
    foreachBatch callable again with an already-committed batch id."""
    sink = snapshot_append_sink(paths["table"], app_id="t-ingest")
    b0 = spark.range(0, 80).withColumn("v", F.col("id") * 10)
    sink(b0, 0)
    assert snap.read_snapshot(spark, paths["table"]).count() == 80
    v = snap.latest_version(spark, paths["table"])
    sink(b0, 0)  # re-delivery (same app, same batch)
    assert snap.read_snapshot(spark, paths["table"]).count() == 80
    assert snap.latest_version(spark, paths["table"]) == v
    # batch 0 re-delivered even after LATER batches committed
    sink(spark.range(80, 90).withColumn("v", F.col("id") * 10), 1)
    sink(b0, 0)
    assert snap.read_snapshot(spark, paths["table"]).count() == 90


def test_token_survives_delete_and_rewrite(spark, paths):
    """Unrelated maintenance commits (delete, rewrite) must carry the txn
    map forward — dropping it would let a late retry double-append."""
    sink = snapshot_append_sink(paths["table"], app_id="t-ingest")
    b0 = spark.range(0, 60).withColumn("v", F.col("id") * 10)
    sink(b0, 0)
    snap.delete_where(spark, paths["table"], "id % 2 = 1")
    snap.rewrite_files(spark, paths["table"], n_files=1)
    n = snap.read_snapshot(spark, paths["table"]).count()
    assert n == 30
    sink(b0, 0)  # late retry after maintenance
    assert snap.read_snapshot(spark, paths["table"]).count() == n
    # ...and rollback keeps the LATEST tokens (processed-once stands)
    snap.rollback(spark, paths["table"], 1)
    sink(b0, 0)
    assert snap.read_snapshot(spark, paths["table"]).count() == 60


def test_two_apps_interleave(spark, paths):
    a = snapshot_append_sink(paths["table"], app_id="app-a")
    b = snapshot_append_sink(paths["table"], app_id="app-b")
    a(spark.range(0, 10).withColumn("v", F.col("id")), 0)
    b(spark.range(100, 110).withColumn("v", F.col("id")), 0)  # same batch id
    a(spark.range(10, 20).withColumn("v", F.col("id")), 1)
    b(spark.range(100, 110).withColumn("v", F.col("id")), 0)  # retry b/0
    got = snap.read_snapshot(spark, paths["table"])
    assert got.count() == 30
    m = snap.load_manifest(spark, paths["table"])
    assert m["txns"] == {"app-a": 1, "app-b": 0}


def test_reserved_column_error_surfaces(spark, paths):
    """The create-race fallback must not mask a validation error: a
    stream schema using a reserved name fails loudly at batch 0, not as
    a confusing NoSuchVersion from the fallback append."""
    sink = snapshot_append_sink(paths["table"], app_id="t-ingest")
    bad = spark.range(3).withColumn("_gc_pos", F.col("id"))
    with pytest.raises(ValueError, match="reserved"):
        sink(bad, 0)


def test_skip_cleans_staged_files(spark, paths):
    """A skipped re-delivery must not leak orphan data files (the
    append-side pre-check avoids staging; the rebase-time skip deletes)."""
    sink = snapshot_append_sink(paths["table"], app_id="t-ingest")
    b0 = spark.range(0, 40).withColumn("v", F.col("id"))
    sink(b0, 0)
    sink(b0, 0)
    m = snap.load_manifest(spark, paths["table"])
    on_disk = {p for p, _, _ in snap._list_dir(spark, paths["table"] + "/data")}
    assert on_disk == set(m["data_files"])
