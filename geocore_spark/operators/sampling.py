"""Deterministic corpus sampling and mixing: stratified per-source rates
and reproducible train/eval splits.

Training-data pipelines never sample with RNG state — a corpus must be
re-buildable bit-identically from config. Membership here is a pure
function of (id, salt): a Knuth multiplicative hash mapped into 10^6
buckets, keep iff bucket < rate * 10^6. Re-running, adding executors, or
reordering input cannot change the sample. The same arithmetic runs in any
SQL engine (the DuckDB oracle replays it exactly), which also makes the
sampling decision auditable outside Spark.

Overflow discipline: ids are folded mod 2^31 BEFORE the multiply so the
product stays under 2^63 — Java long wrap-around vs DuckDB's overflow
error would otherwise diverge on huge ids.

Scale: narrow map + filter, no shuffle, fully pushdown-friendly (the
bucket expression is a deterministic Column, so a rate filter prunes at
the scan when the id is a partition/file-stat column). The reference's
split machinery is the spatial buffer/BlockCV path
(/root/reference/modeling/datasets/build.py:164-177) — covered by
operators/blockcv.py; this module is its corpus-frequency counterpart
for the webtext surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761  # 2^32 * golden ratio conjugate, the classic multiplier
_BUCKETS = 1_000_000


def hash_bucket(id_col: Column, salt: int = 0) -> Column:
    """Deterministic bucket in [0, 10^6) for an INTEGRAL id column:
    ((id mod 2^31) + salt) mod 2^31, * K mod 2^31, scaled into 10^6.
    Pure integer Column arithmetic — identical in Spark and ANSI SQL.
    A null id yields a null bucket (callers define the policy; see
    stratified_sample). The id is folded BEFORE the salt addition:
    ``id + salt`` first would overflow for ids near 2^63 (wrapping in
    Spark, erroring in the DuckDB twin — the exact divergence the fold
    exists to prevent); for non-overflowing inputs the two orders are
    congruent mod 2^31, so bucket values are unchanged."""
    s = salt % (1 << 31)
    folded = F.pmod(F.pmod(id_col.cast("long"), F.lit(1 << 31)) + F.lit(s), F.lit(1 << 31))
    return F.pmod(folded * F.lit(_KNUTH), F.lit(1 << 31)) % F.lit(_BUCKETS)


def hash_bucket_any(id_col: Column, salt: int = 0) -> Column:
    """Bucket for NON-integral ids (string urls, binary digests):
    xxhash64-based — deterministic within Spark but NOT replayable in
    other SQL engines (use integral ids when the sampling decision must
    be auditable outside Spark). Null-safe like :func:`hash_bucket`."""
    return F.when(
        id_col.isNull(), F.lit(None).cast("long")
    ).otherwise(F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(_BUCKETS)))


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"}

_LOG = __import__("logging").getLogger(__name__)


def _bucket_for(df: DataFrame, id_col: str, salt: int) -> Column:
    """Integral ids -> SQL-replayable arithmetic bucket; anything else ->
    xxhash64 with a LOUD log line, because the fallback changes sample
    membership and loses outside-Spark replayability — callers who need
    the audit property must key on an integral id. Column lookup is
    case-insensitive (Spark resolves columns case-insensitively; a plain
    dict lookup would silently misroute 'DOC_ID')."""
    dtypes = {name.lower(): dt for name, dt in df.dtypes}
    dtype = dtypes.get(id_col.lower(), "")
    if dtype in _INTEGRAL_TYPES:
        return hash_bucket(F.col(id_col), salt)
    _LOG.warning(
        "sampling: id column %r has type %r — falling back to the xxhash64 "
        "bucket (deterministic within Spark, NOT replayable by the SQL "
        "twin; membership differs from the integral-arithmetic bucket)",
        id_col,
        dtype,
    )
    return hash_bucket_any(F.col(id_col), salt)


def hash_bucket_sql(id_expr: str, salt: int = 0) -> str:
    """The oracle twin of :func:`hash_bucket` (same arithmetic, ANSI SQL;
    id folded before the salt addition, see hash_bucket)."""
    s = salt % (1 << 31)
    folded = f"((({id_expr}) % 2147483648 + 2147483648) % 2147483648 + {s}) % 2147483648"
    return f"((({folded}) * {_KNUTH}) % 2147483648) % {_BUCKETS}"


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Keep each row iff its hash bucket clears the per-stratum rate —
    the corpus-mixing primitive (e.g. downweight crawl dumps, keep all of
    a curated source). Rates are fractions in [0, 1]. Integral ids use
    the SQL-replayable arithmetic bucket; other id types fall back to
    xxhash64 (Spark-deterministic only). Rows with a NULL id are DROPPED
    from every sample — a null cannot hash stably, and silently keeping
    it would make the sample depend on the rate path taken."""
    rate: Column = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    threshold = F.round(rate * _BUCKETS, 0).cast("long")
    return df.filter(_bucket_for(df, id_col, salt) < threshold)


def train_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: int = 104729,
) -> DataFrame:
    """Deterministic training-order shuffle: add ``(shard, pos)`` giving
    every row a stable pseudo-random position inside a balanced shard.

    The step between packing and writing training shards: examples must
    reach the trainer in an order uncorrelated with corpus order, yet
    bit-reproducible from config — no RNG state, no ``ORDER BY rand()``.
    The shuffle key is the Knuth-hash bucket of (id, salt): shard =
    key mod n_shards (uniform, so shards balance), pos = row_number
    within the shard ordered by (key, id) — the id tie-break keeps the
    order total when buckets collide (10^6 buckets). Adding or removing
    documents permutes positions but never moves a row across shards.

    Scale shape: one exchange keyed on shard + one in-partition sort
    (exactly the ``repartition(shard).sortWithinPartitions`` write
    pattern); at 10^9 docs with n_shards in the thousands each sort is
    executor-sized. Same arithmetic replays in ANSI SQL (driver oracle).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from pyspark.sql import Window

    # _bucket_for, not hash_bucket directly: a STRING id cast to long is
    # NULL for every row (ANSI off), which made __key NULL everywhere —
    # one NULL shard, pos ordered by raw id, i.e. no shuffle at all and
    # no warning. The router falls back to xxhash64 loudly instead.
    key = _bucket_for(df, id_col, salt)
    out = df.withColumn("__key", key).withColumn(
        "shard", F.col("__key") % F.lit(n_shards)
    )
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return out.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("__key")


def deterministic_split(
    df: DataFrame,
    eval_fraction: float = 0.1,
    id_col: str = "doc_id",
    salt: int = 7919,
) -> DataFrame:
    """Add a ``split`` column ('train' | 'eval') from an independent salt,
    so the split is stable under re-sampling and corpus growth (a doc's
    split never changes when other docs are added or removed). A NULL id
    is labeled 'train' explicitly — never silently 'eval'."""
    cut = int(round(eval_fraction * _BUCKETS))
    return df.withColumn(
        "split",
        F.when(_bucket_for(df, id_col, salt) < cut, "eval").otherwise("train"),
    )


def temperature_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.7,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-based mixing weights per corpus slice: w_s proportional
    to n_s^alpha — the multilingual/multi-source rebalancing recipe
    (XLM-R, Conneau et al. 2020, arXiv:1911.02116; alpha < 1 upsamples
    small slices, alpha = 1 is proportional, alpha -> 0 is uniform).

    Returns ``(group_col, n_rows, weight)`` with weight rounded to 6
    decimals; with ``budget`` also ``planned`` = round(weight * budget),
    the per-slice document allocation to feed
    :func:`stratified_sample` (rate_s = planned / n_rows).

    One group-sized aggregate + a 1-row total broadcast — the output is
    slice-cardinality-sized (tiny), so this is a planning query, not a
    data pass: the expensive part stays in the sampler it parameterizes.

    Oracle-parity caveat: ``pow`` is 1-ulp libm-dependent across engines
    (Java Math.pow vs DuckDB's std::pow); the micro-snap removes
    partial-agg drift but a value landing within 1 ulp of a .5 snap
    boundary (~1e-6 probability per slice) could still flip p by 1
    between engines. Accepted flake class — same policy as keeping
    exp() out of classify's exact output.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"))
    # n^alpha snapped to integer micro-units BEFORE the total: summing the
    # raw doubles would make `weight` depend on partial-agg order (the
    # operators.lm trick, same micro constant class); fits BIGINT up to
    # n ~ 1e17 at alpha=0.7. For alpha > 1 the micro-snap can exceed
    # BIGINT and (ANSI off) silently wrap — guard at runtime with ~2%
    # headroom below 2^63 so corruption becomes a loud error instead.
    powed = counts.withColumn(
        "__praw",
        F.pow(F.col("n_rows").cast("double"), F.lit(alpha))
        * F.lit(1_000_000.0),
    ).withColumn(
        "__p",
        F.when(
            F.col("__praw") >= F.lit(9.0e18),
            F.raise_error(
                F.concat(
                    F.lit(
                        "temperature_weights: n_rows^alpha * 1e6 exceeds "
                        "BIGINT micro-snap range for slice n_rows="
                    ),
                    F.col("n_rows").cast("string"),
                    F.lit(f" at alpha={alpha}; lower alpha (recipe domain is (0, 1])"),
                )
            ).cast("bigint"),
        ).otherwise(F.round(F.col("__praw")).cast("bigint")),
    ).drop("__praw")
    # the total can overflow even when every slice fits — check it on a
    # parallel double sum (2% headroom dwarfs double rounding error)
    tot = powed.agg(
        F.sum("__p").alias("__t"),
        F.sum(F.col("__p").cast("double")).alias("__tchk"),
    ).select(
        F.when(
            F.col("__tchk") >= F.lit(9.0e18),
            F.raise_error(
                F.lit(
                    "temperature_weights: sum of micro-snapped weights "
                    "exceeds BIGINT range; lower alpha or pre-aggregate "
                    "slices"
                )
            ).cast("bigint"),
        ).otherwise(F.col("__t")).alias("__t")
    )
    out = (
        powed.crossJoin(F.broadcast(tot))
        .withColumn(
            "weight",
            F.round(
                F.col("__p").cast("double") / F.col("__t").cast("double"), 6
            ),
        )
        .drop("__p", "__t")
    )
    if budget is not None:
        out = out.withColumn(
            "planned",
            F.round(F.col("weight") * F.lit(float(budget)), 0).cast("bigint"),
        )
    return out


def unimax_allocation(
    df: DataFrame,
    group_col: str = "source",
    budget: int = 0,
    max_epochs: int = 4,
    size_col: str | None = None,
) -> DataFrame:
    """UniMax budget allocation per corpus slice (Chung et al. 2023,
    arXiv:2304.09151): distribute ``budget`` units (docs, or
    ``size_col`` units such as chars/tokens) as uniformly as possible
    across slices, capping every slice at ``max_epochs`` repeats of its
    own size. The published remedy for temperature sampling's failure
    mode — small slices over-repeated into memorization — and its
    complement here (:func:`temperature_weights` is the XLM-R recipe).

    Closed form over slices sorted ascending by size: a slice is capped
    (gets ``max_epochs * n``) iff even the uniform share of the budget
    remaining after all smaller slices took their cap still exceeds its
    cap; by monotonicity the capped slices are a prefix, so the test is
    a prefix-capped running AND. Uncapped slices split the leftover
    evenly; the integer remainder goes one unit each to the smallest
    uncapped slices (fully deterministic, no RNG anywhere).

    Output: ``(group_col, n_units, alloc, epochs_milli)`` — ``alloc`` in
    budget units, ``epochs_milli = round_half_up(1000 * alloc / n_units)``
    exact in integer milli-epochs (the decimal-division / libm class of
    oracle drift never appears). Pure Column windows over the
    slice-cardinality table — like :func:`temperature_weights` this is a
    PLANNING query (tiny input, one task is correct), never a data pass.
    Arithmetic is ANSI-SQL-replayable; the DuckDB twin runs the same
    expressions.

    Bounds (loud, not silent): products are guarded so BIGINT never
    wraps — budget up to ~4.5e15 units and ``max_epochs * n * n_slices``
    up to ~9e18 (raise_error on the offending row otherwise).
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget must be >= 0")
    if budget > 4_500_000_000_000_000:
        raise ValueError(
            "budget exceeds the exact milli-epoch arithmetic bound (4.5e15); "
            "allocate in coarser units (e.g. thousands of tokens)"
        )
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    unit = (
        F.count(F.lit(1)) if size_col is None else F.sum(F.col(size_col))
    )
    counts = df.groupBy(group_col).agg(
        F.coalesce(unit.cast("long"), F.lit(0)).alias("n_units")
    )
    N = F.lit(int(max_epochs))
    order = [F.col("n_units").asc(), F.col(group_col).asc_nulls_first()]
    w_run = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = (
        counts.withColumn("__i", F.row_number().over(Window.orderBy(*order)))
        .withColumn("__L", F.count(F.lit(1)).over(w_all))
        .withColumn("__S", F.sum("n_units").over(w_run))
    )
    # overflow guard BEFORE the cap product: N * n * remaining_slices
    guarded = staged.withColumn(
        "n_units",
        F.when(
            F.col("n_units")
            > F.lit(9_000_000_000_000_000_000) / N / F.col("__L"),
            F.raise_error(
                F.concat(
                    F.lit("unimax_allocation: slice size overflows the cap "
                          "product for slice "),
                    F.col(group_col).cast("string"),
                )
            ).cast("long"),
        ).otherwise(F.col("n_units")),
    )
    # capped iff N*n*(L-i+1) <= budget - N*(S - n), AND every smaller
    # slice is capped (running AND via cumulative min over the prefix)
    flagged = guarded.withColumn(
        "__capped_raw",
        F.when(
            N * F.col("n_units") * (F.col("__L") - F.col("__i") + 1)
            <= F.lit(int(budget)) - N * (F.col("__S") - F.col("n_units")),
            1,
        ).otherwise(0),
    ).withColumn("__capped", F.min("__capped_raw").over(w_run))
    totals = (
        flagged.withColumn("__K", F.sum("__capped").over(w_all))
        .withColumn(
            "__SK",
            F.coalesce(
                F.sum(F.when(F.col("__capped") == 1, F.col("n_units"))).over(
                    w_all
                ),
                F.lit(0),
            ),
        )
        .withColumn("__M", F.col("__L") - F.col("__K"))
        .withColumn("__Rbal", F.lit(int(budget)) - N * F.col("__SK"))
    )
    # greatest(__M, 1): when every slice is capped the otherwise-branch is
    # never taken, but ANSI mode must not see a div-by-zero expression
    out = totals.withColumn(
        "alloc",
        F.when(F.col("__capped") == 1, N * F.col("n_units")).otherwise(
            F.expr("__Rbal div greatest(__M, 1)")
            + F.when(
                (F.col("__i") - F.col("__K"))
                <= F.expr("__Rbal % greatest(__M, 1)"),
                1,
            ).otherwise(0)
        ).cast("long"),
    ).withColumn(
        # capped slices: exactly max_epochs (no product — N*n can be large
        # enough that 2000*alloc would wrap); uncapped: alloc <= budget
        # <= 4.5e15, so the half-up milli product stays in BIGINT
        "epochs_milli",
        F.when(F.col("n_units") <= 0, F.lit(0))  # 0-size slice: alloc 0
        .when(F.col("__capped") == 1, F.lit(1000 * int(max_epochs)))
        .otherwise(F.expr("(2000 * alloc + n_units) div (2 * n_units)"))
        .cast("long"),
    )
    return out.select(group_col, "n_units", "alloc", "epochs_milli")
