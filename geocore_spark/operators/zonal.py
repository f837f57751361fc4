"""Raster<->vector zonal sampling and zonal statistics (G10).

The reference consumes rasters pre-sampled onto H3 cells upstream
(/root/reference/modeling/datasets/features.py:23,35,59 — "This is a raster
we sample onto h3 directly"). This module makes that a first-class
operator: sample a raster grid at point/centroid locations, then aggregate
per cell (zonal stats).

Two physical strategies:
- ``sample_points_join``: raster as a broadcast (row, col, value) table,
  points compute their grid coordinates arithmetically and broadcast-join —
  the general path for arbitrary raster contents;
- analytic fast path via :func:`geocore_spark.sources.raster.sample_expr`
  when the raster has a closed form (test fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import tiling as tl
from geocore_spark.sources import raster as rst


def sample_points_join(
    points: DataFrame, raster: DataFrame, lat: str = "lat", lon: str = "lon"
) -> DataFrame:
    """Nearest-cell raster sample via broadcast equi-join on (row, col)."""
    pts = points.withColumn(
        "__row", F.floor((F.col(lat) - F.lit(rst.LAT0)) / F.lit(rst.DLAT)).cast("long")
    ).withColumn(
        "__col", F.floor((F.col(lon) - F.lit(rst.LON0)) / F.lit(rst.DLON)).cast("long")
    )
    r = raster.select(
        F.col("row").alias("__row"), F.col("col").alias("__col"), "value"
    )
    return pts.join(F.broadcast(r), ["__row", "__col"], "left").drop("__row", "__col")


def zonal_stats(
    points: DataFrame,
    value_col: str = "value",
    res: int = tl.DEFAULT_RES,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Per-cell min/max/avg/count of a sampled value — the zonal-stats
    groupBy (SURVEY §2 G10). Partial aggregation (map-side combine) comes
    free from Catalyst's hash aggregate."""
    return (
        points.withColumn("cell", tl.latlng_to_cell(F.col(lat), F.col(lon), res))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
            F.round(F.min(value_col), 6).alias("min_value"),
            F.round(F.max(value_col), 6).alias("max_value"),
        )
    )


def cell_centroid_samples(cells: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Sample the raster at each cell's centroid — the exact "raster onto
    cell table" ingestion shape the reference's feature layers assume."""
    c = cells.withColumn("__ctr", tl.cell_to_latlng(F.col(cell_col)))
    return c.withColumn(
        "value", rst.sample_expr(F.col("__ctr.lat"), F.col("__ctr.lon"))
    ).drop("__ctr")
