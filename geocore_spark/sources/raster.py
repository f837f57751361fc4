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


# rounded at 6 decimals, not 8: Java Math.sin/cos (Spark) and C libm
# (DuckDB oracle) can disagree by 1 ulp, and a value within ~1e-16 of a
# rounding boundary then flips the last digit on one engine only — the
# same flake class CLAUDE.md documents for pow in temperature_weights.
# 6 decimals matches the repo's round(…, ≤6) oracle guidance and cuts
# the boundary-hit probability 100x.
def value_expr(row: Column, col: Column) -> Column:
    return F.round(
        F.sin(row.cast("double") / 7.0) * F.cos(col.cast("double") / 11.0)
        + row.cast("double") * 1e-4,
        6,
    )


def value_sql(row: str, col: str) -> str:
    return (
        f"round(sin(CAST({row} AS DOUBLE) / 7.0) * cos(CAST({col} AS DOUBLE) / 11.0)"
        f" + CAST({row} AS DOUBLE) * 1e-4, 6)"
    )


def grid_row(lat: Column) -> Column:
    """Raster row of a latitude — THE affine transform, shared by the
    analytic fast path and the join path so they can never diverge.

    NULL for NaN input: Spark's floor(double)->LONG sends NaN to 0, so
    an unguarded transform would map a garbage coordinate onto corner
    cell (0, 0) and fabricate a sample — the same trap class CLAUDE.md
    records for latlng_to_cell. NULL propagates through floor already.
    """
    return F.when(
        ~F.isnan(lat.cast("double")),
        F.floor((lat - F.lit(LAT0)) / F.lit(DLAT)).cast("long"),
    )


def grid_col(lon: Column) -> Column:
    return F.when(
        ~F.isnan(lon.cast("double")),
        F.floor((lon - F.lit(LON0)) / F.lit(DLON)).cast("long"),
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

    NULL outside the raster's coverage ([-60, 60) lat, [-180, 180) lon) —
    the same answer the join path gives for an unmatched (row, col). An
    unguarded analytic expression would happily EXTRAPOLATE the surface
    for polar points, silently fabricating features the general path
    would report as missing.
    """
    row, col = grid_row(lat), grid_col(lon)
    in_bounds = (
        (row >= 0) & (row < F.lit(NROWS)) & (col >= 0) & (col < F.lit(NCOLS))
    )
    return F.when(in_bounds, value_expr(row, col))


def sample_sql(lat: str, lon: str) -> str:
    # NaN short-circuits FIRST: DuckDB's CAST(floor(NaN) AS BIGINT)
    # errors outright (vs Spark's silent 0), so the bounds test must
    # never see a NaN coordinate. CASE evaluates lazily, so ordering
    # the isnan arm first suppresses the cast.
    row = f"CAST(floor((({lat}) - ({LAT0})) / {DLAT}) AS BIGINT)"
    col = f"CAST(floor((({lon}) - ({LON0})) / {DLON}) AS BIGINT)"
    return (
        f"(CASE WHEN isnan(CAST({lat} AS DOUBLE)) OR isnan(CAST({lon} AS DOUBLE))"
        f" THEN NULL"
        f" WHEN {row} >= 0 AND {row} < {NROWS}"
        f" AND {col} >= 0 AND {col} < {NCOLS}"
        f" THEN {value_sql(row, col)} END)"
    )
