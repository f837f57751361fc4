"""Stateful streaming dedup: exactly-once url emission across batches."""

from geocore_spark.sources import pages as pg
from geocore_spark.streaming.ingest import PAGES_SCHEMA
from geocore_spark.streaming.stateful import streaming_url_dedup


def test_streaming_dedup_across_batches(spark, tmp_path):
    landing = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    # batch 1: pages 0..499; includes url duplicates WITHIN the batch
    b1 = pg.pages(spark, 500).drop("lat_true", "lon_true")
    b1.unionByName(b1.limit(100)).write.parquet(landing + "/b1")

    def drain():
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(landing + "/b*")
        q = (
            streaming_url_dedup(stream.select("url", "warc_ts"))
            .writeStream.format("parquet")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out)

    got1 = drain()
    assert got1.count() == 500  # in-batch dups suppressed
    assert got1.select("url").distinct().count() == 500

    # batch 2 arrives: overlap (0..499 again) + new urls 500..699;
    # the query RESTARTS from the checkpoint — state must survive
    pg.pages(spark, 700).drop("lat_true", "lon_true").write.parquet(landing + "/b2")
    got2 = drain()
    assert got2.count() == 700  # 500 old + 200 genuinely new, no re-emits
    assert got2.select("url").distinct().count() == 700
