"""Temporal operators: tumbling-window aggregation + time-bucket equi-join.

The reference's only temporal machinery is the fishing pipeline's
per-vessel 1-hour resample computing ``change_in_speed = max - min``
(/root/reference/data_pipeline.py:47-58) and the floor-hour equi-join back
onto the point rows (data_pipeline.py:59-60). Both become native batch
DataFrame ops — ``F.window`` gives the tumbling bucket; empty windows never
materialize (matching the reference's dropna of empty resample bins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_range_agg(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window: str = "1 hour",
) -> DataFrame:
    """Per-entity tumbling-window max-min of ``value_col`` (A5).

    Output: (entity, window_start, change) — the ``change_in_speed``
    analogue. Map-side partial agg; one shuffle on (entity, window).
    """
    return (
        df.groupBy(entity_col, F.window(ts_col, window).alias("w"))
        .agg(
            (F.max(value_col) - F.min(value_col)).alias("change"),
            F.count("*").alias("n_obs"),
        )
        .select(
            entity_col,
            F.col("w.start").alias("window_start"),
            F.round("change", 6).alias("change"),
            "n_obs",
        )
    )


def hour_bucket_join(
    df: DataFrame,
    agg: DataFrame,
    entity_col: str,
    ts_col: str,
    window_start_col: str = "window_start",
) -> DataFrame:
    """Join point rows to their hourly aggregate (J6): floor the row
    timestamp to the hour and equi-join on (entity, hour) — exactly the
    reference's ``merging_hour``/``rounded_hours`` merge."""
    floored = df.withColumn("__hour", F.date_trunc("hour", F.col(ts_col)))
    a = agg.withColumnRenamed(window_start_col, "__hour")
    return floored.join(a, [entity_col, "__hour"], "left").withColumnRenamed(
        "__hour", "bucket_hour"
    )
