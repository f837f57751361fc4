"""Bucketed range joins: point-in-interval and interval-overlap, no
cartesian product.

Spark compiles a bare ``p.x BETWEEN i.lo AND i.hi`` join to
BroadcastNestedLoopJoin (right side small) or a cartesian — both
scale-killers when neither side broadcasts. The public fix (the "range
join optimization" of Databricks/Photon and the bucketing literature)
is to discretize the join dimension into fixed-width buckets: a point
belongs to exactly one bucket, an interval explodes to every bucket it
overlaps, the join becomes a plain shuffled EQUI-join on the bucket id,
and the original predicate re-applies as an exact post-filter. Shuffle
volume = points + intervals x (span/width + 1); correctness never
depends on float rounding because floor(x / w) is monotone — a point
inside [lo, hi] always lands in one of the interval's buckets.

The join dimension must be numeric (cast timestamps to epoch seconds —
``F.unix_timestamp``/``.cast("long")`` — upstream; floor-division does
not apply to TIMESTAMP columns directly). This is the numeric sibling
of the cell-bucketed spatial joins (operators/spatial_join.py — same decompose-to-equi-join shape
the engine uses everywhere; reference analogue: the un-keyed
ST_DWITHIN theta-join at woodgilber/GeoCore modeling/datasets/
build.py:170-176, which this pattern replaces).

Skew note: the bucket key inherits the data's distribution — a value
hot-spot maps to a hot bucket exactly like a mega-cell, and the same
remedies apply (AQE skew-join is on by default in the session factory;
narrow the width or salt the bucket for pathological cases).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ceiling on buckets one interval may explode to (span/width + 1); a
#: mis-sized width on wide intervals would silently multiply the data
#: 10^6-fold — fail loudly instead, at plan execution (lazy, data-driven)
DEFAULT_MAX_BUCKETS = 4096


def _bucket(x: Column, width: float) -> Column:
    return F.floor(x / F.lit(float(width))).cast("long")


def _finite(x: Column) -> Column:
    """NULL and NaN are excluded from both sides — NaN would otherwise be
    poisonous twice over: it casts to bucket 0 (non-ANSI NaN->long), and
    as an interval bound it makes the bucket span NEGATIVE, which
    ``sequence`` expands DOWNWARD into garbage buckets. Spark's own
    comparison rule (NaN sorts above everything) would make [lo, NaN]
    match every point >= lo, but only in whatever buckets the broken
    sequence happened to emit — exclusion is the only consistent
    contract."""
    return x.isNotNull() & ~F.isnan(x.cast("double"))


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    max_buckets: int = DEFAULT_MAX_BUCKETS,
) -> DataFrame:
    """INNER join: every (point, interval) pair with
    ``lo <= point <= hi`` — all columns of both inputs pass through
    (disambiguate duplicate names upstream). NULL and NaN points/bounds
    match nothing (see ``_finite``). Pick ``bucket_width`` ~ the
    typical interval span: one bucket per point, ~2 per interval.

    Each point lives in exactly ONE bucket and an interval covers each
    of its buckets once, so no pair can appear twice — no dedup pass,
    unlike the overlap join below.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    lo, hi = F.col(lo_col), F.col(hi_col)
    n_buckets = _bucket(hi, bucket_width) - _bucket(lo, bucket_width) + 1
    guard = F.when(
        (hi >= lo) & (n_buckets > max_buckets),
        F.raise_error(
            F.lit(
                f"point_in_interval_join: an interval spans > {max_buckets} "
                f"buckets at width {bucket_width} — widen bucket_width or "
                "raise max_buckets"
            )
        ).cast("long"),
    ).otherwise(n_buckets)
    iv = intervals.filter(_finite(lo) & _finite(hi) & (lo <= hi)).withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(lo, bucket_width),
                _bucket(lo, bucket_width) + guard - 1,
            )
        ),
    )
    pt = points.filter(_finite(F.col(point_col))).withColumn(
        "__b", _bucket(F.col(point_col), bucket_width)
    )
    out = pt.join(iv, "__b").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return out.drop("__b")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_cols: tuple[str, str] = ("lo", "hi"),
    right_cols: tuple[str, str] = ("lo2", "hi2"),
    bucket_width: float = 1.0,
    max_buckets: int = DEFAULT_MAX_BUCKETS,
) -> DataFrame:
    """INNER join of two interval tables on overlap
    (``l.lo <= r.hi AND r.lo <= l.hi`` — closed intervals).

    An inverted interval (``lo > hi``) denotes the EMPTY set and matches
    nothing — note the raw SQL predicate above would happily pair one
    with intervals spanning it, so a theta-join oracle must add
    ``lo <= hi`` on both sides to agree with this operator.

    Both sides explode to their bucket ranges; a pair co-occurring in
    several buckets is emitted ONCE via the standard proof-bucket rule:
    keep the pair only in the bucket containing ``max(l.lo, r.lo)``
    (which every overlapping pair shares and is unique) — pure filter,
    no distinct shuffle.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be > 0")
    llo, lhi = left_cols
    rlo, rhi = right_cols

    def _explode(df: DataFrame, lo_c: str, hi_c: str, side: str) -> DataFrame:
        lo, hi = F.col(lo_c), F.col(hi_c)
        n = _bucket(hi, bucket_width) - _bucket(lo, bucket_width) + 1
        guard = F.when(
            (hi >= lo) & (n > max_buckets),
            F.raise_error(
                F.lit(
                    f"interval_overlap_join: a {side} interval spans > "
                    f"{max_buckets} buckets at width {bucket_width}"
                )
            ).cast("long"),
        ).otherwise(n)
        return df.filter(_finite(lo) & _finite(hi) & (lo <= hi)).withColumn(
            "__b",
            F.explode(
                F.sequence(_bucket(lo, bucket_width), _bucket(lo, bucket_width) + guard - 1)
            ),
        )

    lb = _explode(left, llo, lhi, "left")
    rb = _explode(right, rlo, rhi, "right")
    joined = lb.join(rb, "__b").filter(
        (F.col(llo) <= F.col(rhi)) & (F.col(rlo) <= F.col(lhi))
    )
    proof = _bucket(F.greatest(F.col(llo), F.col(rlo)), bucket_width)
    return joined.filter(F.col("__b") == proof).drop("__b")


def interval_coverage(
    intervals: DataFrame,
    key_col: str,
    lo_col: str,
    hi_col: str,
) -> DataFrame:
    """Per-key merged-interval statistics: union the key's intervals,
    count the disjoint islands, and measure the total covered length.

    The classic sweep, expressed as key-partitioned windows (never a
    global sort): order by (lo, hi); a row starts a new island when its
    lo exceeds the running max hi of every earlier row; the island id is
    the running sum of start flags; islands then collapse to
    [min lo, max hi]. Touching intervals ([0,2],[2,4]) merge — length is
    continuous measure. The per-key aggregate is tie-order invariant
    (tied (lo,hi) rows produce identical flags), so an ANSI-SQL twin
    matches bit-exactly on integer bounds. Inverted intervals (lo > hi)
    denote the empty set — dropped, like NULLs and NaN bounds (the same
    conventions as the range joins above).

    Output: (key, n_intervals, n_islands, covered).
    """
    from pyspark.sql import Window

    lo, hi = F.col(lo_col), F.col(hi_col)
    ok = (
        F.col(key_col).isNotNull()
        & lo.isNotNull()
        & hi.isNotNull()
        & (lo <= hi)
    )
    for c in (lo_col, hi_col):
        if dict(intervals.dtypes)[c] in ("double", "float"):
            ok = ok & ~F.isnan(F.col(c))
    base = intervals.where(ok).select(
        F.col(key_col).alias("_k"), lo.alias("_lo"), hi.alias("_hi")
    )
    w_prev = (
        Window.partitionBy("_k")
        .orderBy(F.col("_lo").asc(), F.col("_hi").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("_k")
        .orderBy(F.col("_lo").asc(), F.col("_hi").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = base.withColumn(
        "_new",
        F.when(
            F.max("_hi").over(w_prev).isNull()
            | (F.col("_lo") > F.max("_hi").over(w_prev)),
            1,
        ).otherwise(0),
    ).withColumn("_isl", F.sum("_new").over(w_run))
    islands = flagged.groupBy("_k", "_isl").agg(
        F.min("_lo").alias("_ilo"),
        F.max("_hi").alias("_ihi"),
        F.count(F.lit(1)).alias("_n"),
    )
    return islands.groupBy("_k").agg(
        F.sum("_n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("_ihi") - F.col("_ilo")).alias("covered"),
    ).select(
        F.col("_k").alias(key_col), "n_intervals", "n_islands", "covered"
    )
