"""Streaming ingest: incremental drain equals the batch answer."""

from pyspark.sql import functions as F

from geocore_spark.sources import pages as pg
from geocore_spark.streaming import tile_stream, windowed_cell_counts
from geocore_spark.streaming.ingest import PAGES_SCHEMA


def test_stream_drain_matches_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out_ckpt = str(tmp_path / "ckpt")
    batch = pg.pages(spark, 2000).drop("lat_true", "lon_true")
    batch.write.parquet(landing)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(landing)
    assert stream.isStreaming
    counts = windowed_cell_counts(tile_stream(stream), window="1 hour")
    q = (
        counts.writeStream.format("memory")
        .queryName("cell_counts")
        .outputMode("append")
        .option("checkpointLocation", out_ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("select sum(n_pages) as n from cell_counts").first()["n"]
    # append mode emits exactly the windows whose END <= max_event_time -
    # watermark (2h default); later windows stay open as state.
    max_ts = batch.agg(F.max("warc_ts")).first()[0]
    want_df = windowed_cell_counts(tile_stream(batch), window="1 hour")
    emitted = want_df.filter(
        F.col("window_start") + F.expr("INTERVAL 1 HOUR")
        <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
    )
    want = emitted.agg(F.sum("n_pages").alias("n")).first()["n"]
    assert got == want
    assert got > 0


def test_tile_stream_is_incremental_projection(spark):
    # stateless: usable in append mode without aggregation state
    batch = pg.pages(spark, 100).drop("lat_true", "lon_true")
    tiled = tile_stream(batch)
    assert {"cell", "lat", "lon"} <= set(tiled.columns)
    assert tiled.count() == 100
