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
    points: DataFrame,
    raster: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    out_col: str = "value",
) -> DataFrame:
    """Nearest-cell raster sample via broadcast equi-join on (row, col).

    Grid coordinates come from raster.grid_row/grid_col — the ONE affine
    transform the analytic fast path also uses, so the two strategies
    cannot drift. The sampled value lands in ``out_col``; a name already
    present on ``points`` is an error (a silent duplicate 'value' column
    would make the natural follow-up zonal_stats ambiguous-reference)."""
    if out_col in points.columns:
        raise ValueError(
            f"sample_points_join: points already has a column {out_col!r}; "
            "pass out_col= to name the sampled value"
        )
    pts = points.withColumn("__row", rst.grid_row(F.col(lat))).withColumn(
        "__col", rst.grid_col(F.col(lon))
    )
    r = raster.select(
        F.col("row").alias("__row"),
        F.col("col").alias("__col"),
        F.col("value").alias(out_col),
    )
    return pts.join(F.broadcast(r), ["__row", "__col"], "left").drop("__row", "__col")


def zonal_stats(
    points: DataFrame,
    value_col: str = "value",
    res: int = tl.DEFAULT_RES,
    lat: str = "lat",
    lon: str = "lon",
    exact_micro_units: bool = False,
) -> DataFrame:
    """Per-cell min/max/avg/count of a sampled value — the zonal-stats
    groupBy (SURVEY §2 G10). Partial aggregation (map-side combine) comes
    free from Catalyst's hash aggregate.

    ``exact_micro_units=True`` computes the mean in exact BIGINT
    micro-units (requires ``value_col`` quantized at 1e-6, which every
    raster fixture value is): double AVG partial-aggregation order
    differs between engines and can land on a round(.,6) boundary — the
    group_transform drift class from CLAUDE.md. Sign is handled via
    abs + reapply because Spark's ``div`` truncates toward zero while
    DuckDB's ``//`` floors; on non-negative operands they agree."""
    grouped = points.withColumn(
        "cell", tl.latlng_to_cell(F.col(lat), F.col(lon), res)
    ).groupBy("cell")
    if not exact_micro_units:
        return grouped.agg(
            F.count("*").alias("n"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
            F.round(F.min(value_col), 6).alias("min_value"),
            F.round(F.max(value_col), 6).alias("max_value"),
        )
    base = grouped.agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col(value_col) * 1e6).cast("long")).alias("__s6"),
        F.count(value_col).alias("__c"),
        F.round(F.min(value_col), 6).alias("min_value"),
        F.round(F.max(value_col), 6).alias("max_value"),
    )
    sign = F.when(F.col("__s6") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    half_away = F.expr("(2 * abs(__s6) + __c) div (2 * __c)")
    avg = F.when(
        F.col("__c") > 0, (sign * half_away).cast("double") / F.lit(1e6)
    )
    return base.select(
        "cell", "n", avg.alias("avg_value"), "min_value", "max_value"
    )


def cell_centroid_samples(cells: DataFrame, cell_col: str = "cell") -> DataFrame:
    """Sample the raster at each cell's centroid — the exact "raster onto
    cell table" ingestion shape the reference's feature layers assume."""
    c = cells.withColumn("__ctr", tl.cell_to_latlng(F.col(cell_col)))
    return c.withColumn(
        "value", rst.sample_expr(F.col("__ctr.lat"), F.col("__ctr.lon"))
    ).drop("__ctr")
