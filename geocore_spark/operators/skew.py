"""Skew machinery: salted two-phase aggregation + adaptive cell splitting.

North-rule requirement with no reference equivalent (the reference pushed
skew to Snowflake). Mega-cells — dense urban tiles holding orders of
magnitude more pages than the median cell — make a naive
``groupBy(cell)`` shuffle place one giant partition on one task.

Two complementary strategies:

1. **Salted two-phase aggregation** (algebraic aggs): shuffle key becomes
   (cell, salt) with salt = pmod(xxhash64(row-key), n); partial aggregates
   per salted key, then a second tiny shuffle re-combines per cell. The
   result is bit-identical to the naive plan for decomposable aggregates
   (count/sum/min/max; avg as sum/count).

2. **Adaptive cell splitting** (holistic work, e.g. per-cell pandas UDFs):
   cells whose count exceeds a threshold are re-encoded at finer
   resolution via ``cell_to_children``-style re-indexing, processed, then
   re-parented with ``cell_to_parent`` — SURVEY §4.2.

AQE's skew-join splitting handles *join* skew automatically
(``spark.sql.adaptive.skewJoin.enabled`` set in the session factory);
these helpers cover aggregation skew, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import tiling as tl


def salted_agg(
    df: DataFrame,
    key_col: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation, result identical to df.groupBy(key).

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max, avg}. Phase 1 groups on (key, salt); phase 2
    merges partials per key. avg is decomposed into sum+count so the merge
    is exact.
    """
    salt = F.pmod(
        F.xxhash64(salt_source if salt_source is not None else F.monotonically_increasing_id()),
        F.lit(n_salts),
    )
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count("*").alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{out}"))
            final_exprs.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )
        else:
            raise ValueError(f"unsupported agg fn: {fn}")
    phase1 = df.withColumn("__salt", salt).groupBy(key_col, "__salt").agg(*partial_exprs)
    return phase1.groupBy(key_col).agg(*final_exprs)


def find_mega_cells(
    df: DataFrame, cell_col: str = "cell", threshold: int = 100_000
) -> DataFrame:
    """Cells whose row count exceeds ``threshold`` (the split candidates)."""
    return (
        df.groupBy(cell_col).count().filter(F.col("count") > threshold).select(cell_col)
    )


def split_mega_cells(
    df: DataFrame,
    mega: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    cell_col: str = "cell",
    delta_res: int = 2,
) -> DataFrame:
    """Re-key rows in mega-cells to children cells at res + delta_res.

    Adds ``work_cell``: the finer child for mega-cell rows, the original
    cell otherwise. Downstream per-cell work groups on ``work_cell``;
    results re-parent with :func:`tl.cell_to_parent` to the original key.
    The mega set is tiny -> broadcast flag join, no extra shuffle.
    """
    flagged = df.join(
        F.broadcast(mega.withColumn("__mega", F.lit(True))), cell_col, "left"
    )
    res_of = tl.cell_resolution(F.col(cell_col))
    # arithmetic re-encode at finer res from raw coordinates
    finer = tl.latlng_to_cell(F.col(lat), F.col(lon), tl.DEFAULT_RES + delta_res)
    return flagged.withColumn(
        "work_cell",
        F.when(F.col("__mega").isNotNull() & (res_of == tl.DEFAULT_RES), finer).otherwise(
            F.col(cell_col)
        ),
    ).drop("__mega")


def reparent(df: DataFrame, work_cell: str = "work_cell", res: int = tl.DEFAULT_RES) -> Column:
    """Column mapping work_cell back to its original-resolution parent."""
    r = tl.cell_resolution(F.col(work_cell))
    return F.when(r > res, tl.cell_to_parent(F.col(work_cell), res)).otherwise(
        F.col(work_cell)
    )
