"""Streaming tiling ingest: pages stream -> cells -> windowed rollups.

Usage shape (file, Kafka, or rate source — anything readStream yields):

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(landing_dir)
    tiled = tile_stream(stream)
    counts = windowed_cell_counts(tiled, window="10 minutes",
                                  watermark="30 minutes")
    counts.writeStream.outputMode("append").trigger(availableNow=True) \
          .option("checkpointLocation", ckpt).start(out_dir)

``availableNow`` gives the batch-incremental pattern: each run drains the
backlog exactly once and commits offsets to the checkpoint — the streaming
twin of plans/checkpoint.py's stage resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import text as tx
from geocore_spark.functions import tiling as tl

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def tile_stream(pages: DataFrame, res: int = tl.DEFAULT_RES) -> DataFrame:
    """Geotag + tile a (streaming or batch) pages DataFrame.

    Identical expressions to the batch path — no UDF, fully incremental
    (stateless projection), so it runs in any output mode.
    """
    hs = F.decode("html", "UTF-8")
    return (
        pages.withColumn("g", tx.geo_latlon(hs))
        .withColumn("lat", F.col("g.lat"))
        .withColumn("lon", F.col("g.lon"))
        .drop("g")
        .filter(F.col("lat").isNotNull())
        .withColumn("cell", tl.latlng_to_cell(F.col("lat"), F.col("lon"), res))
    )


def windowed_cell_counts(
    tiled: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Event-time windowed per-cell page counts with late-data bound.

    The watermark bounds state: cells stop accumulating once the window
    closes ``watermark`` behind the max observed event time — the knob
    that keeps state finite on an unbounded crawl stream.
    """
    return (
        tiled.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "cell")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            "cell",
            "n_pages",
        )
    )


def session_cell_rollup(
    tiled: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "cell",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-key session windows (events < ``gap`` apart merge) — crawl
    burst detection per cell/host.

    Uses Spark's native ``session_window`` — the state-store-backed
    merging-window operator — so the same expression runs batch AND
    streaming; a closed session emits once the watermark passes its end.
    The batch form is the oracle: an availableNow drain must equal it
    (pinned in tests; the batch twin of temporal.sessionize's
    gaps-and-islands form).
    """
    return (
        tiled.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), key)
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key,
            "n_pages",
        )
    )
