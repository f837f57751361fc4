"""Deterministic Common-Crawl-style pages table (the engine's point table).

BASELINE.json ``input_hint`` fixes the input shape:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
This generator plays the role of the reference's AIS parquet load
(/root/reference/data_pipeline.py:32): it synthesizes that exact schema
*distributively* — ``spark.range(n)`` plus pure Column expressions, no
driver-side materialization, no Python UDF — so the same code scales from
sf-test rows to billions (generation is embarrassingly parallel and
Catalyst-codegen'd).

Every value is a deterministic integer function of ``id``:
- coordinates come from modular arithmetic, with 30%% of rows concentrated
  into 3 dense "mega-cell" clusters (skew fixture, north rule) and the rest
  spread over mid-latitudes;
- ``html`` embeds the coordinates in a ``<meta name="geo.position">`` tag
  (the public geotagging convention) plus body text;
- ``text`` is the golden extractor output — the byte-identity invariant
  (input_hint) is testable because extract(html) must equal it exactly.

The oracle reproduces derived columns via the SQL builders in oracle.py
(``derived_lat_sql`` and friends); the generator itself is Spark-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Cluster centers: (lat, lon) of three mega-cells (dense urban tiles).
CLUSTERS = [(40.71, -74.00), (51.51, -0.13), (35.68, 139.69)]
LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", None]


def _lat_expr(id_col):
    """Deterministic latitude. Range ~[-59.99, 60)."""
    background = (((id_col * 37 + 11) % 12000) / 100.0) - 60.0
    jitter = ((id_col * 7919) % 1000) / 100000.0  # 0..0.01 deg inside a cluster
    out = background
    for k, (clat, _clon) in enumerate(CLUSTERS):
        out = F.when((id_col % 10) == k, F.lit(clat) + jitter).otherwise(out)
    return out


def _lon_expr(id_col):
    background = (((id_col * 91 + 17) % 36000) / 100.0) - 180.0
    jitter = ((id_col * 104729) % 1000) / 100000.0
    out = background
    for k, (_clat, clon) in enumerate(CLUSTERS):
        out = F.when((id_col % 10) == k, F.lit(clon) + jitter).otherwise(out)
    return out


# NOTE: there are deliberately NO lat_sql/lon_sql twins here. The oracle
# derives coordinates via oracle.derived_lat_sql (which has no cluster
# branches); an earlier unused pair rendered bare decimal literals
# ('40.71 + ...') that DuckDB would parse as exact DECIMAL while Spark
# computes doubles — the CLAUDE.md bare-literal trap — so they were
# removed rather than left as a wrong-if-ever-used attraction.

def pages(spark: SparkSession, n: int = 10_000, partitions: int | None = None) -> DataFrame:
    """Build the pages DataFrame. Lazy; nothing touches the driver."""
    df = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    id_col = F.col("id")
    lat = _lat_expr(id_col)
    lon = _lon_expr(id_col)
    body = F.format_string(
        "Crawl snapshot %d geothermal survey block %d.", id_col, (id_col * 13) % 997
    )
    title = F.format_string("Page %d", id_col)
    html = F.format_string(
        '<html><head><meta name="geo.position" content="%s;%s"/>'
        "<title>%s</title></head><body><p>%s</p></body></html>",
        F.format_string("%.5f", lat),
        F.format_string("%.5f", lon),
        title,
        body,
    )
    # Golden text: what the frozen extractor must produce, byte-identical.
    text = F.concat(title, F.lit("\n"), body)
    return df.select(
        F.format_string("https://host%d.example/p/%d", id_col % 97, id_col).alias("url"),
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_interval(secs=(id_col * 137) % (86400 * 7))
        ).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(lang) for lang in LANGS]), (id_col % 10 + 1).cast("int")
        ).alias("lang"),
        lat.alias("lat_true"),
        lon.alias("lon_true"),
    )
