"""The snapshot change feed as a native streaming source
(streaming/snapshot_source.py, Spark 4 Python Data Source API).

Pinned physics:

- a drained stream over the full history equals the batch
  read_changes() multiset — inserts, merge delete+insert pairs, MoR
  delete rows, compaction/evolve commits invisible;
- offsets are commit versions in the query checkpoint: a RESTART
  replays nothing and picks up exactly the commits landed since;
- overwrite commits in range fail the stream loudly (read_changes'
  refusal, streamed);
- the reserved column names stay in sync with sources/snapshots.py.
"""

import os

import pytest
from pyspark.sql import functions as F

from geocore_spark.sources import snapshots as snap
from geocore_spark.streaming import snapshot_source as src


@pytest.fixture()
def paths(tmp_path):
    return {
        "table": str(tmp_path / "t"),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
    }


def _drain(spark, paths):
    src.register(spark)
    ch = (
        spark.readStream.format("snapshot_changes")
        .option("path", paths["table"])
        .load()
    )
    q = (
        ch.writeStream.format("parquet")
        .option("path", paths["out"])
        .option("checkpointLocation", paths["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "drain timed out"


def _multiset(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_feed_and_resumes(spark, paths):
    root = paths["table"]
    base = spark.range(0, 60).withColumn("v", F.col("id") * 3)
    snap.create_table(spark, root, base.repartition(2))
    snap.append(spark, root, spark.range(60, 90).withColumn("v", F.col("id") * 3))
    snap.delete_where(spark, root, "id % 10 = 1")
    snap.merge_into(
        spark, root,
        spark.range(85, 100).withColumn("v", F.col("id") * 7), ["id"],
    )
    snap.compact_snapshot(spark, root, small_bytes=1 << 30, target_bytes=2 << 30)

    _drain(spark, paths)
    got = spark.read.parquet(paths["out"])
    want = snap.read_changes(spark, root, 0)
    assert sorted(got.columns) == sorted(want.columns)
    assert _multiset(got.select(*sorted(got.columns))) == _multiset(
        want.select(*sorted(got.columns))
    )

    # restart with the same checkpoint: only the commits landed since
    n_before = got.count()
    snap.append(spark, root, spark.range(200, 220).withColumn("v", F.lit(0).cast("long")))
    snap.delete_where(spark, root, "id >= 210")
    v_mid = snap.latest_version(spark, root)
    _drain(spark, paths)
    got2 = spark.read.parquet(paths["out"])
    assert got2.count() == n_before + 20 + 10  # inserts + deleted rows, no replay
    want2 = snap.read_changes(spark, root, 0, v_mid)
    assert _multiset(got2.select(*sorted(got2.columns))) == _multiset(
        want2.select(*sorted(got2.columns))
    )

    # idle restart: nothing new, nothing duplicated
    _drain(spark, paths)
    assert spark.read.parquet(paths["out"]).count() == got2.count()


def test_stream_fails_loudly_on_overwrite(spark, paths):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    root = paths["table"]
    snap.create_table(spark, root, spark.range(0, 20).withColumn("v", F.lit(1).cast("long")))
    _drain(spark, paths)
    snap.overwrite(spark, root, spark.range(0, 5).withColumn("v", F.lit(2).cast("long")))
    with pytest.raises(StreamingQueryException, match="not row-incremental"):
        _drain(spark, paths)


def test_starting_version_skips_history(spark, paths):
    root = paths["table"]
    snap.create_table(spark, root, spark.range(0, 50).withColumn("v", F.lit(1).cast("long")))
    v1 = snap.latest_version(spark, root)
    snap.append(spark, root, spark.range(50, 70).withColumn("v", F.lit(2).cast("long")))
    src.register(spark)
    ch = (
        spark.readStream.format("snapshot_changes")
        .option("path", root)
        .option("startingVersion", v1)
        .load()
    )
    q = (
        ch.writeStream.format("parquet")
        .option("path", paths["out"])
        .option("checkpointLocation", paths["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = spark.read.parquet(paths["out"])
    assert got.count() == 20 and got.agg(F.min("id")).first()[0] == 50


def test_reserved_names_match():
    assert src._DV_FILE == snap._DV_FILE
    assert src._DV_POS == snap._DV_POS
    assert src._CDC_TYPE == snap._CDC_TYPE
    assert src._CDC_VERSION == snap._CDC_VERSION
