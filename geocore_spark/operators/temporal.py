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


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same entity exceeds ``gap_minutes``.

    Classic lag + cumulative-sum-of-breaks composition (no UDF, one
    shuffle on the entity). Output adds ``session_id`` =
    ``<entity>#<n>`` with n counting the entity's sessions from 0.
    Pass ``tiebreak_col`` (a unique id) when timestamps can repeat, so
    the window order — and therefore the session numbering — is total.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(entity_col).orderBy(*order)
    # interval arithmetic, not epoch seconds: timestamp differences are
    # timezone-free, so the result is identical under any session tz
    # (epoch casts of NTZ would shift with the caller's session timezone)
    prev = F.lag(F.col(ts_col)).over(w)
    # microsecond interval, not int(seconds): truncation would silently
    # turn a sub-minute fractional gap (gap_minutes=0.025 -> 1.5 s) into
    # 1 s — or 0 s below 1/60, making every positive gap a session break
    gap = F.expr(f"INTERVAL {int(round(gap_minutes * 60 * 1_000_000))} MICROSECONDS")
    is_break = F.when(prev.isNull() | (F.col(ts_col) - prev > gap), 1).otherwise(0)
    return df.withColumn("__brk", is_break).withColumn(
        "session_no",
        F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    ).withColumn(
        "session_id", F.concat_ws("#", F.col(entity_col), F.col("session_no"))
    ).drop("__brk")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    entity_col: str,
    ts_col: str,
    value_cols: list[str],
    right_ts_col: str | None = None,
) -> DataFrame:
    """As-of join: attach the latest ``right`` row with ts <= left.ts per
    entity (the generalized form of the reference's floor-hour bucket
    join, SURVEY §2 J6 note).

    Spark has no native ASOF JOIN; this is the union + ordered-window
    backfill composition: tag sides, union on (entity, ts), carry the
    last-seen right ROW forward with ``last(ignorenulls)`` over an
    entity-ordered window, keep left rows. One shuffle on the entity —
    no range explosion, exact semantics (right rows at the same ts sort
    before left rows, so ties are inclusive).

    The backfill carries ONE struct of all value columns, never the
    columns independently: per-column last(ignorenulls) would mix fields
    from different right rows whenever a right value is legitimately
    NULL (a chimera row no engine's ASOF produces) and would skip that
    NULL instead of returning it. Right rows tied on (entity, ts) are
    ordered by the value struct, so the winner is deterministic (the
    greatest value tuple — matching the oracle's max-per-ts reading).
    """
    from pyspark.sql import Window

    rts = right_ts_col or ts_col
    rt = right.select(
        F.col(entity_col),
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rrow"),
    )
    lt = left.select(
        F.col(entity_col),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rt.schema["__rrow"].dataType).alias("__rrow"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    rt = rt.withColumn("__lrow", F.lit(None).cast(lt.schema["__lrow"].dataType))
    unioned = lt.unionByName(rt)
    w = (
        Window.partitionBy(entity_col)
        .orderBy(
            F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__rrow").asc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        entity_col,
        "__is_left",
        "__lrow",
        F.last("__rrow", ignorenulls=True).over(w).alias("__rrow"),
    ).filter(F.col("__is_left") == 1)
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__rrow.{c}").alias(f"{c}_asof") for c in value_cols]
    return filled.select(*out_cols)


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
