"""Co-occurrence analytics: item-pair counts + lift, and Markov
transition matrices over per-entity event sequences.

The "users who did X also did Y" primitive (co-citation on link graphs,
query-term affinity, product pairs) and its sequential sibling (what
follows what). Both are pure DataFrame aggregation with exact integer
counts; ratios are assembled from BIGINT counts with IEEE
correctly-rounded double ops only, so SQL twins match bit-exactly (the
metrics.grouped_corr trick).

Scale shape — the classic hazard is the per-entity pair explosion: an
entity with k items emits k*(k-1)/2 pairs, so one 10^5-item power user
generates 5*10^9 rows. ``max_items_per_entity`` bounds it: entities over
the cap are DROPPED (loudly countable via the returned frame's absence —
the deterministic choice; sampling inside an entity would make results
irreproducible). Pairs shuffle on the (a, b) key; transitions shuffle on
the entity then the (src, dst) key. No cartesian, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["co_occurrence", "transition_counts"]


def co_occurrence(
    df: DataFrame,
    entity_col: str,
    item_col: str,
    max_items_per_entity: int = 10_000,
    min_pair_count: int = 1,
) -> DataFrame:
    """Distinct-item pair counts across entities, with support and lift.

    Output: (item_a, item_b, pair_n, n_a, n_b, lift) with item_a <
    item_b; ``pair_n`` = entities holding both items, ``n_a``/``n_b`` =
    entities holding each, ``lift`` = pair_n * N / (n_a * n_b) as a
    bit-reproducible double (N = entities that survived the cap).
    Duplicate (entity, item) rows collapse first, so multiplicity never
    inflates counts.
    """
    if max_items_per_entity < 2:
        raise ValueError("max_items_per_entity must be >= 2")
    base = (
        df.where(F.col(entity_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(entity_col).alias("_e"), F.col(item_col).alias("_i"))
        .distinct()
    )
    sizes = base.groupBy("_e").agg(F.count(F.lit(1)).alias("_k"))
    kept = base.join(
        sizes.where(F.col("_k") <= max_items_per_entity).select("_e"), "_e"
    )
    n_total = kept.select("_e").distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    item_n = kept.groupBy("_i").agg(F.count(F.lit(1)).alias("_in"))
    a = kept.select(F.col("_e"), F.col("_i").alias("item_a"))
    b = kept.select(F.col("_e"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_e")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
    )
    if min_pair_count > 1:
        pairs = pairs.where(F.col("pair_n") >= min_pair_count)
    na = item_n.select(F.col("_i").alias("item_a"), F.col("_in").alias("n_a"))
    nb = item_n.select(F.col("_i").alias("item_b"), F.col("_in").alias("n_b"))
    out = (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .crossJoin(F.broadcast(n_total))  # 1-row scalar, the mean-impute pattern
    )
    lift = (
        F.col("pair_n").cast("double") * F.col("_n").cast("double")
    ) / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    return out.select(
        "item_a",
        "item_b",
        F.col("pair_n").cast("long").alias("pair_n"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        lift.alias("lift"),
    )


def transition_counts(
    df: DataFrame,
    entity_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """First-order Markov transition counts over each entity's
    ``order_col``-ordered state sequence.

    Output: (src, dst, n, out_n, p_micro) — n = observed src->dst
    steps, out_n = all steps leaving src, p_micro = floor(1e6 * n /
    out_n) in exact BIGINT arithmetic. ``order_col`` must be a total
    order per entity (include a tiebreak upstream if it is not —
    otherwise tied rows make the sequence, and thus the counts,
    engine-dependent). One entity-partitioned lag window + two
    aggregates; no global sort.
    """
    base = df.where(
        F.col(entity_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(state_col).isNotNull()
    ).select(
        F.col(entity_col).alias("_e"),
        F.col(order_col).alias("_o"),
        F.col(state_col).alias("_s"),
    )
    w = Window.partitionBy("_e").orderBy(F.col("_o").asc())
    steps = base.withColumn("_prev", F.lag("_s").over(w)).where(
        F.col("_prev").isNotNull()
    )
    trans = steps.groupBy(
        F.col("_prev").alias("src"), F.col("_s").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    outn = trans.groupBy("src").agg(F.sum("n").alias("out_n"))
    # micro-scale overflow guard (house discipline, cf. geometric_smooth
    # / time_weighted_avg): with ANSI off, n * 1e6 wraps silently once a
    # single (src, dst) count passes 2^63/1e6 ~ 9.2e12 — raise instead
    n_bound = (2**63 - 1) // 1_000_000
    n_guarded = F.when(F.col("n") < F.lit(n_bound), F.col("n")).otherwise(
        F.raise_error(
            F.lit(
                "transition_counts: a (src, dst) count is too large — "
                "p_micro would overflow BIGINT"
            )
        ).cast("long")
    )
    return (
        trans.join(outn, "src")
        .select(
            "src",
            "dst",
            F.col("n").cast("long").alias("n"),
            F.col("out_n").cast("long").alias("out_n"),
            (n_guarded * F.lit(1_000_000))
            .cast("long")
            .alias("_nm"),
        )
        .select(
            "src",
            "dst",
            "n",
            "out_n",
            F.expr("_nm div out_n").cast("long").alias("p_micro"),
        )
    )
