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


def resample_fill(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
    max_buckets_per_entity: int = 10_000_000,
) -> DataFrame:
    """Per-entity regular time grid with exact linear interpolation —
    the gap-filling resample the reference's pandas ``.resample()``
    implies but Spark lacks natively.

    Buckets are ``unix_seconds div step`` (session timezone must be
    pinned — geocore_spark.session pins UTC — or NTZ timestamps would
    shift buckets). Observed buckets carry the exact round-half-up mean
    of their values in BIGINT micro-units (``(2*s + c) div (2*c)``);
    missing interior buckets are linearly interpolated between the
    nearest observed neighbors with *truncating* integer division —
    Spark ``div`` and DuckDB ``//`` truncate identically even on
    negative deltas, so an ANSI-SQL twin replays the fill bit-exactly.

    Scale shape: one (entity, bucket) groupBy, one per-entity min/max
    agg, a ``sequence`` explode bounded by ``max_buckets_per_entity``
    (a runaway span raises instead of materializing an unbounded grid),
    one (entity, bucket) left join, and two entity-partitioned ordered
    windows. No global sort, no UDF, no collect.

    Output: (entity, bucket, value_micro, observed) for every bucket in
    each entity's [min, max] observed span.
    """
    from pyspark.sql import Window

    if step_seconds <= 0:
        raise ValueError("step_seconds must be positive")
    v6 = F.round(F.col(value_col) * F.lit(1000000.0)).cast("long")
    obs = (
        df.where(
            F.col(entity_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(entity_col).alias("entity"),
            F.expr(f"unix_timestamp(`{ts_col}`) div {step_seconds}").alias("bucket"),
            v6.alias("_v6"),
        )
        .groupBy("entity", "bucket")
        .agg(
            F.expr(
                "CAST((2 * sum(_v6) + count(_v6)) div (2 * count(_v6)) AS LONG)"
            ).alias("_obs_v")
        )
    )
    spans = obs.groupBy("entity").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    # the guard lives INSIDE sequence's upper bound: a free-standing
    # assert_true column would be pruned away by the optimizer the
    # moment nothing selects it (verified), silently disabling the check
    hi_checked = F.when(
        F.col("_hi") - F.col("_lo") < F.lit(max_buckets_per_entity), F.col("_hi")
    ).otherwise(
        F.raise_error(
            F.lit(
                "resample span exceeds "
                f"max_buckets_per_entity={max_buckets_per_entity}"
            )
        ).cast("long")
    )
    grid = spans.select(
        "entity", F.explode(F.sequence(F.col("_lo"), hi_checked)).alias("bucket")
    )
    joined = grid.join(obs, ["entity", "bucket"], "left")
    wp = (
        Window.partitionBy("entity")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("entity")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_b = F.when(F.col("_obs_v").isNotNull(), F.col("bucket"))
    filled = (
        joined.withColumn("_pb", F.last(known_b, ignorenulls=True).over(wp))
        .withColumn("_pv", F.last("_obs_v", ignorenulls=True).over(wp))
        .withColumn("_nb", F.first(known_b, ignorenulls=True).over(wn))
        .withColumn("_nv", F.first("_obs_v", ignorenulls=True).over(wn))
    )
    interp = F.expr("_pv + ((_nv - _pv) * (bucket - _pb)) div (_nb - _pb)")
    return filled.select(
        F.col("entity").alias(entity_col),
        "bucket",
        F.when(F.col("_obs_v").isNotNull(), F.col("_obs_v"))
        .otherwise(interp)
        .cast("long")
        .alias("value_micro"),
        F.col("_obs_v").isNotNull().alias("observed"),
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


def funnel(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Earliest strictly-ordered completion of a step sequence per
    entity — the product-analytics funnel (view -> click -> purchase).

    Greedy-earliest semantics: t1 = the entity's earliest step-1 event;
    t_i = the earliest step-i event strictly after t_{i-1}. Greedy is
    optimal here — taking the earliest feasible timestamp at each step
    never forecloses a later completion — so this IS the minimal
    completion, and each stage is one entity-keyed min-aggregate + one
    equi-join (k-1 joins total for k steps, no window over raw events,
    no UDF). Entities that never performed step 1 are absent; later
    steps are NULL once the chain breaks.

    Matching runs at full MICROSECOND precision (``unix_micros``) and
    the t_i columns are returned as epoch microseconds — truncating to
    seconds before the strict ``t_i > t_{i-1}`` comparison would make
    step events inside the same second unable to chain, silently
    dropping genuinely completed sub-second funnels (clickstream data
    has plenty). Integer epochs also keep cross-engine comparison
    rendering-free (DuckDB twin: ``epoch_us``). ``steps_completed``
    counts the non-null prefix.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    base = df.where(
        F.col(entity_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(entity_col).alias("_e"),
        F.expr(f"unix_micros(cast(`{ts_col}` as timestamp))").alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    cur = (
        base.where(F.col("_tp") == steps[0])
        .groupBy("_e")
        .agg(F.min("_ts").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            base.where(F.col("_tp") == step)
            .join(cur.select("_e", F.col(f"t{i-1}")), "_e")
            .where(F.col("_ts") > F.col(f"t{i-1}"))
            .groupBy("_e")
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "_e", "left")
    ts_cols = [f"t{i}" for i in range(1, len(steps) + 1)]
    completed = sum(
        (F.col(c).isNotNull().cast("int") for c in ts_cols), F.lit(0)
    )
    return cur.select(
        F.col("_e").alias(entity_col),
        *ts_cols,
        completed.cast("int").alias("steps_completed"),
    )


def changepoint(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    value_col: str,
) -> DataFrame:
    """Exact single-changepoint detection per group: the CUSUM-style
    mean-shift statistic, all-integer.

    Values must be integer-valued (quantize upstream; a double NaN
    raises under ANSI and silently becomes 0 without it).
    For the (order, tiebreak)-ordered integer series x_1..x_n with
    prefix sums S_i, the statistic at split i is |n*S_i - i*S_n| —
    n^2 times the classic |mean(prefix) - mean(all)| * i weighting, so
    the argmax is the same split and everything stays BIGINT-exact.
    Output per group: (group, n, total, cusum, break_i) where
    ``break_i`` is the 1-based prefix length maximizing the statistic
    (smallest such i on ties — deterministic) and NULL when the
    statistic is identically zero (perfectly linear/constant mass:
    no break exists).

    Overflow: |n*S_i| <= n^2 * max|x|; bounded AFTER the aggregation
    with non-wrapping aggregates (count, max(abs)) in double, raising
    instead of wrapping (and ANSI mode raises on the way there too).

    Scale shape: one group-partitioned ordered window (prefix sum +
    row number in one sort; the full-frame sum/count ride the same
    partitioning), one group agg for the max, one co-partitioned join
    + min-agg for the tie-broken argmax. The windowed frame is
    computed twice (max pass + argmax pass) — persist upstream if the
    input scan is expensive.
    """
    from pyspark.sql import Window

    base = df.where(
        F.col(group_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(tiebreak_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(order_col).alias("_o"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).cast("long").alias("_x"),
    )
    w_seq = Window.partitionBy("_g").orderBy(F.col("_o").asc(), F.col("_tb").asc())
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("_g")
    scored = base.select(
        "_g",
        F.row_number().over(w_seq).alias("_i"),
        F.sum("_x").over(w_cum).alias("_si"),
        F.sum("_x").over(w_all).alias("_sn"),
        F.count(F.lit(1)).over(w_all).alias("_n"),
        F.max(F.abs(F.col("_x"))).over(w_all).alias("_mx"),
    )
    ok = F.when(
        F.col("_n").cast("double")
        * F.col("_n").cast("double")
        * F.greatest(F.col("_mx"), F.lit(1)).cast("double")
        * F.lit(2.0)
        < F.lit(float(2**62)),
        F.lit(1),
    ).otherwise(
        F.raise_error(
            F.lit("changepoint: n^2 * max|x| would overflow BIGINT")
        ).cast("int")
    )
    # ok FIRST: And short-circuits (the _guarded_moments rationale)
    stat = F.when(
        ok == 1, F.abs(F.col("_n") * F.col("_si") - F.col("_i") * F.col("_sn"))
    )
    st = scored.select(
        "_g", "_i", "_n", "_sn", stat.alias("_stat")
    )
    ag = st.groupBy("_g").agg(
        F.max("_stat").alias("cusum"),
        F.max("_n").alias("n"),
        F.max("_sn").alias("total"),
    )
    pos = (
        st.join(ag.select("_g", "cusum"), "_g")
        .where(F.col("_stat") == F.col("cusum"))
        .groupBy("_g")
        .agg(F.min("_i").alias("break_i"))
    )
    return ag.join(pos, "_g").select(
        F.col("_g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("long").alias("total"),
        F.col("cusum").cast("long").alias("cusum"),
        F.when(F.col("cusum") > 0, F.col("break_i")).cast("long").alias(
            "break_i"
        ),
    )


def geometric_smooth(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    value_col: str,
    window: int = 8,
) -> DataFrame:
    """EWMA-style exponential smoothing made exact: a finite-window
    geometric weighting with dyadic weights.

    Classic EWMA (s_t = a*x_t + (1-a)*s_{t-1}) is an infinite
    recurrence whose floats drift across engines; truncating it at
    ``window`` lags with weights 2^(W-1-j) for lag j (halving, like
    alpha = 1/2) keeps the SAME smoothing character while every
    quantity stays an integer: smooth_micro = (1e6 * sum_j w_j *
    x_{t-j}) div (sum_j w_j over the lags that exist), computed from W
    lag() columns in ONE group-partitioned ordered window (one
    Exchange + one Sort — lag columns share the window spec). Early
    rows (< W history) renormalize over the weights actually present,
    exactly like pandas ewm(adjust=True).

    Values must be integer-valued (quantize upstream). Negative
    values are fine, with one replay caveat: the micro division
    truncates toward ZERO (Spark ``div`` == DuckDB ``//``, measured —
    CLAUDE.md resample note), so a Python ``//`` replay (which FLOORS)
    diverges by one unit on negative weighted sums; replay with
    truncating division. Overflow:
    |weighted sum| <= (2^W - 1) * max|x| and the 1e6 micro scale
    needs another factor; a per-row guard on the INPUT raises when
    x is outside (-(B), B) for B = (2^62 div 1e6) >> W — a two-sided
    comparison on ONE value (no abs(): with ANSI off even
    abs(Long.MIN_VALUE) wraps negative and would slip past an
    `abs(x) < B` check) that bounds the sum before it is ever formed,
    matching the max/count guard discipline of the sibling operators
    (max_drawdown, changepoint, gini). A post-sum check would be
    wrap-proof only under ANSI mode. W is capped at 32 (the
    weights themselves stay far from 2^63).

    Output: input keys + (x, smooth_micro) per row.
    """
    from pyspark.sql import Window

    if not 1 <= window <= 32:
        raise ValueError("geometric_smooth: window must be in [1, 32]")
    clash = [
        c
        for c in (group_col, order_col, tiebreak_col)
        if c in ("x", "smooth_micro")
    ]
    if clash:
        raise ValueError(
            f"geometric_smooth: key column(s) {clash} collide with the "
            "output columns (x, smooth_micro)"
        )
    # Input-side overflow guard (non-wrapping: inspects ONE value, not
    # a sum that could already have wrapped with ANSI off): the lag
    # weights total 2^W - 1, so |x| < (2^62 div 1e6) >> W bounds
    # |weighted sum| < 2^62 div 1e6 by construction.
    x_bound = (2**62 // 1_000_000) >> window
    x_raw = F.col(value_col).cast("long")
    # Spelled without abs(): with ANSI off, abs(Long.MIN_VALUE) wraps
    # to a NEGATIVE value and would pass an `abs(x) < bound` check.
    # The two-sided comparison is strictly wrap-proof for every long.
    x_guarded = F.when(
        (x_raw > F.lit(-x_bound)) & (x_raw < F.lit(x_bound)), x_raw
    ).otherwise(
        F.raise_error(
            F.lit(
                "geometric_smooth: |value| too large — the weighted "
                "sum would overflow BIGINT at this window"
            )
        ).cast("long")
    )
    base = df.where(
        F.col(group_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(tiebreak_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.col(order_col).alias("_o"),
        F.col(tiebreak_col).alias("_tb"),
        x_guarded.alias("_x"),
    )
    w = Window.partitionBy("_g").orderBy(
        F.col("_o").asc(), F.col("_tb").asc()
    )
    num = None
    den = None
    for j in range(window):
        weight = 1 << (window - 1 - j)
        lagged = F.col("_x") if j == 0 else F.lag("_x", j).over(w)
        term = F.when(
            lagged.isNotNull(), lagged * F.lit(weight)
        ).otherwise(F.lit(0))
        have = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = have if den is None else den + have
    # num is bounded by the input guard above: |num| <= (2^W - 1) *
    # max|x| < 2^62 div 1e6, so 1e6 * num stays inside BIGINT.
    scored = base.withColumn("__gs_num", num).withColumn(
        "__gs_den", den
    )
    # den >= the current row's weight 2^(W-1): never zero
    return scored.select(
        F.col("_g").alias(group_col),
        F.col("_o").alias(order_col),
        F.col("_tb").alias(tiebreak_col),
        F.col("_x").alias("x"),
        F.expr(
            "CAST((1000000 * __gs_num) div __gs_den AS BIGINT)"
        ).alias("smooth_micro"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    range_end_us: int | None = None,
) -> DataFrame:
    """Time-weighted average of a step function per key — the TSDB
    staple (a reading holds until the next one): each observation is
    weighted by how long it was current.

    For the ts-ordered readings of a key, duration_i = ts_{i+1} - ts_i
    in microseconds, CLAMPED to ``range_end_us``: a range end inside
    the series cuts every duration at the boundary (readings past it
    get zero weight), not just the last reading's. Default range end:
    the key's own last timestamp, i.e. the last reading gets zero
    weight — pass an explicit range end for the usual dashboard
    semantics. Key columns may not be named after an output column
    (raises).
    twa_micro = (1e6 * sum(value * dur)) div sum(dur), computed via
    the exact split identity ``1e6*(W div T) + (1e6*(W mod T)) div T``
    (truncating division distributes over the exact multiple, and the
    remainder carries the dividend's sign in both Spark and DuckDB) —
    the naive 1e6*W product overflows BIGINT for month-scale
    microsecond durations (W ~ max|v| * T ~ 4900 * 2.6e12 already
    costs 52 bits). Keys whose total duration is zero (single reading
    and no range end past it) return NULL.

    Timestamps must be unique per key (a duplicate would make lead()
    order engine-dependent); duplicate-ts rows raise via a window
    count guard rather than silently picking one. Values must be
    integer-valued (quantize upstream).

    Overflow honesty: |W| <= max|v| * T, and the split needs
    1e6 * T < 2^63 (T under ~106 days of microseconds); both checked
    AFTER aggregation with non-wrapping aggregates in double, raising
    instead of wrapping.

    Scale shape: one key-partitioned ordered window (lead + the
    duplicate guard count ride the same sort), one key agg.
    """
    from pyspark.sql import Window

    if key_col in ("n", "total_dur_us", "twa_micro"):
        raise ValueError(
            f"time_weighted_avg: key column {key_col!r} collides with an "
            "output column"
        )
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.expr(f"unix_micros(cast(`{ts_col}` as timestamp))").alias("_t"),
        F.col(value_col).cast("long").alias("_v"),
    )
    w = Window.partitionBy("_k").orderBy(F.col("_t").asc())
    wdup = Window.partitionBy("_k", "_t")
    stepped = base.select(
        "_k",
        "_t",
        "_v",
        F.lead("_t").over(w).alias("_nt"),
        F.count(F.lit(1)).over(wdup).alias("_dupn"),
    )
    dup_ok = F.when(F.col("_dupn") == 1, F.lit(1)).otherwise(
        F.raise_error(
            F.lit("time_weighted_avg: duplicate timestamp within a key")
        ).cast("int")
    )
    if range_end_us is None:
        end = F.max("_t").over(Window.partitionBy("_k"))
    else:
        end = F.lit(int(range_end_us))
    # dup_ok FIRST: And/when short-circuits (the _guarded_moments rule)
    # clamp EVERY duration at the range end (least), not just the last
    # reading's — a mid-series range end must cut weight at the boundary
    dur = F.when(
        dup_ok == 1,
        F.greatest(
            F.least(F.coalesce(F.col("_nt"), end), end) - F.col("_t"),
            F.lit(0),
        ),
    )
    ag = stepped.withColumn("_dur", dur).groupBy(
        F.col("_k").alias(key_col)
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dur").alias("_tot"),
        F.sum(F.col("_v") * F.col("_dur")).alias("_wsum"),
        F.max(F.abs(F.col("_v"))).alias("_mv"),
    )
    wsum_bound = (
        F.greatest(F.col("_mv"), F.lit(1)).cast("double")
        * F.greatest(F.col("_tot"), F.lit(1)).cast("double")
        * F.lit(2.0)
    )
    split_bound = F.col("_tot").cast("double") * F.lit(1.0e6)
    # third bound: 1e6 * (W div T) <= 1e6 * max|v| — small T with large
    # values passes the other two and still overflows the quotient term
    quot_bound = (
        F.greatest(F.col("_mv"), F.lit(1)).cast("double") * F.lit(2.0e6)
    )
    ok = F.when(
        (wsum_bound < F.lit(float(2**62)))
        & (split_bound < F.lit(float(2**62)))
        & (quot_bound < F.lit(float(2**62))),
        F.lit(1),
    ).otherwise(
        F.raise_error(
            F.lit("time_weighted_avg: weighted sum would overflow BIGINT")
        ).cast("int")
    )
    twa = F.when(
        (ok == 1) & (F.col("_tot") > 0),
        F.expr(
            "1000000 * (_wsum div _tot)"
            " + (1000000 * (_wsum % _tot)) div _tot"
        ),
    ).cast("long")
    return ag.select(
        key_col,
        F.col("_n").cast("long").alias("n"),
        F.col("_tot").cast("long").alias("total_dur_us"),
        twa.alias("twa_micro"),
    )


def ohlc(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """OHLC/candlestick rollup: per (key, time bucket) the opening,
    highest, lowest and closing value plus count and volume — the
    finance/monitoring rollup every TSDB ships.

    Buckets are exact integer epoch-microsecond division (truncating
    toward zero — identical in Spark div and DuckDB //, which is why
    PRE-EPOCH timestamps raise: truncation would merge the
    (-bucket, 0) and [0, bucket) buckets); open/close are the
    first/last reading under the (ts, tiebreak) total order, picked
    via row_number == 1 / row_number == partition count — ONE ordered
    window per partition (the descending pick would cost a second
    sort). Values must be INTEGER-valued (fractional values raise —
    quantize upstream; a silent long cast would truncate candlesticks
    wrong); volume is their exact BIGINT sum. Key columns may not be
    named after an output column (raises).

    Scale shape: one (key, bucket)-partitioned sort carrying
    row_number + the partition count + min/max/sum; one filter. No
    join, no global sort.
    """
    from pyspark.sql import Window

    if bucket_us <= 0:
        raise ValueError("ohlc: bucket_us must be > 0")
    reserved = ("bucket", "open", "high", "low", "close", "n", "volume")
    clash = [c for c in (key_col,) if c in reserved]
    if clash:
        raise ValueError(
            f"ohlc: key column {clash} collides with an output column"
        )
    t_us = F.expr(f"unix_micros(cast(`{ts_col}` as timestamp))")
    t_ok = F.when(t_us >= 0, t_us).otherwise(
        F.raise_error(
            F.lit("ohlc: pre-epoch timestamp (truncating bucket division "
                  "would misalign buckets)")
        ).cast("long")
    )
    v_ok = F.when(
        F.col(value_col) == F.col(value_col).cast("long"),
        F.col(value_col).cast("long"),
    ).otherwise(
        F.raise_error(
            F.lit("ohlc: non-integer value (quantize upstream)")
        ).cast("long")
    )
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(tiebreak_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("_k"),
        F.expr(
            f"unix_micros(cast(`{ts_col}` as timestamp)) div {int(bucket_us)}"
        ).alias("_b"),
        t_ok.alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        v_ok.alias("_v"),
    )
    w = Window.partitionBy("_k", "_b").orderBy(
        F.col("_t").asc(), F.col("_tb").asc()
    )
    wall = Window.partitionBy("_k", "_b")
    stepped = base.select(
        "_k",
        "_b",
        "_v",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wall).alias("_n"),
    )
    return stepped.groupBy(
        F.col("_k").alias(key_col), F.col("_b").alias("bucket")
    ).agg(
        F.max(F.when(F.col("_rn") == 1, F.col("_v"))).cast("long").alias(
            "open"
        ),
        F.max("_v").cast("long").alias("high"),
        F.min("_v").cast("long").alias("low"),
        F.max(F.when(F.col("_rn") == F.col("_n"), F.col("_v")))
        .cast("long")
        .alias("close"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_v").cast("long").alias("volume"),
    )
