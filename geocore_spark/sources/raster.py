"""Analytic raster fixture for raster<->vector zonal sampling.

The reference's rasters arrive "sampled onto h3 directly"
(/root/reference/modeling/datasets/features.py:23,35,59) — the sampling
itself happened upstream in SQL. Here the raster is a deterministic
analytic surface value(row, col) = sin(row/7) * cos(col/11) + row*1e-4 on a
regular lat/lon grid, so any sampled centroid is checkable in closed form
(FIXTURES.md §6) and the oracle can reproduce it in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Affine transform constants shared by Spark, SQL oracle, and tests.
LAT0, LON0 = -60.0, -180.0
DLAT, DLON = 0.5, 0.5
NROWS, NCOLS = 240, 720  # covers lat [-60, 60), lon [-180, 180)


def value_expr(row: Column, col: Column) -> Column:
    return F.round(
        F.sin(row.cast("double") / 7.0) * F.cos(col.cast("double") / 11.0)
        + row.cast("double") * 1e-4,
        8,
    )


def value_sql(row: str, col: str) -> str:
    return (
        f"round(sin(CAST({row} AS DOUBLE) / 7.0) * cos(CAST({col} AS DOUBLE) / 11.0)"
        f" + CAST({row} AS DOUBLE) * 1e-4, 8)"
    )


def raster_table(spark: SparkSession) -> DataFrame:
    """Materialize the grid as a (row, col, value) table — broadcastable
    (172k rows) — for the join-based sampling variant."""
    return (
        spark.range(NROWS * NCOLS)
        .select(
            (F.col("id") / NCOLS).cast("long").alias("row"),
            (F.col("id") % NCOLS).alias("col"),
        )
        .withColumn("value", value_expr(F.col("row"), F.col("col")))
    )


def sample_expr(lat: Column, lon: Column) -> Column:
    """Nearest-cell raster sample at a point — pure Column arithmetic.

    Because the surface is analytic, sampling needs no join at all: the
    (row, col) lookup collapses into the value expression. This is the
    degenerate-fast path; :func:`raster_table` + join is the general path
    for real rasters.
    """
    row = F.floor((lat - F.lit(LAT0)) / F.lit(DLAT)).cast("long")
    col = F.floor((lon - F.lit(LON0)) / F.lit(DLON)).cast("long")
    return value_expr(row, col)


def sample_sql(lat: str, lon: str) -> str:
    row = f"CAST(floor((({lat}) - ({LAT0})) / {DLAT}) AS BIGINT)"
    col = f"CAST(floor((({lon}) - ({LON0})) / {DLON}) AS BIGINT)"
    return value_sql(row, col)
