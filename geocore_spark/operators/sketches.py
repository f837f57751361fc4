"""Mergeable sketch aggregates: HLL distinct counts, KLL quantiles, overlap.

At 100 TB, exact ``count_distinct`` is a full shuffle of every distinct
key and exact ``percentile`` is a sort — both become the job. The
industrial pattern is a *sketch table*: each ingest shard (day, dump,
source) aggregates its rows into a fixed-size mergeable sketch, the
sketch table is tiny and persisted, and any rollup (per-source, per-week,
whole-corpus) is a re-aggregation of sketches, never of rows. Spark 4
ships Apache DataSketches natively (`hll_sketch_agg`, `kll_sketch_agg_*`)
so the whole layer stays JVM-side inside whole-stage codegen — no UDFs.

Used for corpus bookkeeping the rest of the engine needs cheaply:
distinct-URL counts per crawl dump, token-length distributions per
source, and dump-overlap estimates (how much of dump B did dedup against
dump A already remove?) via inclusion-exclusion on HLL unions.

Accuracy contract (pinned by tests/test_sketches.py): HLL relative
standard error ~ 1.04 / sqrt(2^lgk) — 1.6% at the default lgk=12 with
4 KB sketches; KLL k=200 rank error ~1.65%. Determinism differs by
sketch: HLL is hash-based and reproduces exactly for a given input
multiset (merge order included), while KLL uses internal sampling —
measured on this build, repeated identical runs move a median estimate
by ~0.3% — so treat KLL outputs as rank-error-bounded, not repeatable.
Neither is SQL-oracle-expressible; the driver query is rows-only (and
emits only the HLL-backed column), with correctness pinned by property
tests instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12


def sketch_distinct(
    df: DataFrame,
    key: str,
    by: Sequence[str] = (),
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``key`` values.

    Output: ``(*by, sketch: binary)``. Persist this per ingest shard; it
    is ~2^lgk bytes per group regardless of row count.
    """
    agg = F.hll_sketch_agg(F.col(key), F.lit(lgk)).alias("sketch")
    return df.groupBy(*by).agg(agg)


def merge_distinct(
    df: DataFrame, by: Sequence[str] = (), sketch_col: str = "sketch"
) -> DataFrame:
    """Union sketches up to a coarser grain (e.g. per-day -> per-source).

    Sketch-in, sketch-out: the result can be merged again or estimated.
    """
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    return df.groupBy(*by).agg(agg)


def estimate_distinct(
    df: DataFrame, sketch_col: str = "sketch", out_col: str = "n_distinct"
) -> DataFrame:
    return df.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col)).cast("bigint")
    )


def sketch_quantiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: int = 200,
) -> DataFrame:
    """Per-group mergeable KLL sketch of a double-valued column."""
    agg = F.kll_sketch_agg_double(
        F.col(value_col).cast("double"), F.lit(k)
    ).alias("qsketch")
    return df.groupBy(*by).agg(agg)


def merge_quantiles(
    df: DataFrame, by: Sequence[str] = (), sketch_col: str = "qsketch"
) -> DataFrame:
    agg = F.kll_merge_agg_double(F.col(sketch_col)).alias(sketch_col)
    return df.groupBy(*by).agg(agg)


def quantile_estimates(
    df: DataFrame,
    probs: Sequence[float],
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Add one ``q_<prob>`` column per requested quantile."""
    cols: list[Column] = [
        F.kll_sketch_get_quantile_double(F.col(sketch_col), F.lit(float(p)))
        .alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return df.select("*", *cols).drop(sketch_col)


def overlap_distinct(
    a: DataFrame, b: DataFrame, key: str, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """One-row estimate of |A|, |B|, |A u B|, |A n B| over distinct keys.

    Inclusion-exclusion on HLL unions — the cheap answer to "how much of
    dump B is already in dump A" without joining the dumps. Intersection
    error compounds (three estimates), so treat it as a planning signal,
    not bookkeeping truth; the exact answer is a join you run on the
    slice the sketch says is worth it.
    """
    sa = sketch_distinct(a, key, lgk=lgk).select(F.col("sketch").alias("sa"))
    sb = sketch_distinct(b, key, lgk=lgk).select(F.col("sketch").alias("sb"))
    est = F.hll_sketch_estimate
    return (
        sa.crossJoin(sb)  # 1 row x 1 row
        .select(
            est("sa").cast("bigint").alias("n_a"),
            est("sb").cast("bigint").alias("n_b"),
            est(F.hll_union("sa", "sb")).cast("bigint").alias("n_union"),
        )
        .select(
            "n_a",
            "n_b",
            "n_union",
            F.greatest(
                F.col("n_a") + F.col("n_b") - F.col("n_union"), F.lit(0)
            ).alias("n_intersection"),
        )
    )
