"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin).

The dedup family (``operators/dedup.py``) already has MinHash+LSH — an
*approximate* Jaccard join. This operator is the *exact* counterpart:
all pairs of sets with Jaccard >= t, found without an all-pairs compare,
using the prefix-filtering principle of Bayardo, Ma & Srikant, "Scaling
Up All Pairs Similarity Search" (WWW'07) and Xiao et al.'s PPJoin
(WWW'08) — public papers. The reference has no set-similarity surface
at all; this extends the webtext dedup axis.

Principle: impose a global total order on tokens — rarest first, ties
by token value. For Jaccard >= num/den, a set x only needs to expose its
first ``|x| - ceil(t*|x|) + 1`` tokens (its *prefix*): any qualifying
pair must share its globally-smallest common token inside BOTH prefixes
(if all common tokens sat in x's suffix, the suffix holds at most
``ceil(t*|x|) - 1`` tokens, but the pair needs ``>= ceil(t*max(|x|,|y|))``
common tokens — contradiction; symmetrically for y). Candidates are
therefore a self-equi-join of prefix rows on the token, and the
rare-first order means frequent tokens — the join-skew hazard — almost
never appear in a prefix.

Scale shape: one token-frequency groupBy, one per-doc window
(partitioned by doc id, never global), one token-keyed prefix
self-join, then verification as two id-keyed equi-joins + a pair
groupBy. Everything is a hash shuffle on bounded keys; no cartesian,
no driver collect, all-integer threshold math (no float drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["set_similarity_join", "candidate_pairs"]


def _prepare(tok: DataFrame, id_col: str, token_col: str):
    """Distinct non-null (id, token) rows plus per-set sizes."""
    t = (
        tok.where(F.col(id_col).isNotNull() & F.col(token_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(token_col).alias("_tok"))
        .distinct()
    )
    sizes = t.groupBy("_id").agg(F.count(F.lit(1)).alias("_s"))
    return t, sizes


def _prefix_rows(
    t: DataFrame, sizes: DataFrame, num: int, den: int
) -> DataFrame:
    """Per-set prefix under the global (frequency asc, token asc) order.

    Prefix length p = s - ceil(num*s/den) + 1, all integer
    (ceil(a/b) = (a + b - 1) div b for positive operands).
    """
    freq = t.groupBy("_tok").agg(F.count(F.lit(1)).alias("_f"))
    ranked = (
        t.join(freq, "_tok")
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("_id").orderBy(F.col("_f").asc(), F.col("_tok").asc())
            ),
        )
        .join(sizes, "_id")
    )
    # integer ceil spelled with div so no double rounding can creep in
    p = (
        F.col("_s")
        - F.expr(f"({num} * _s + {den - 1}) div {den}")
        + F.lit(1)
    )
    return ranked.where(F.col("_r") <= p).select("_id", "_tok", "_s")


def _candidates_from(pref: DataFrame, threshold_num: int, threshold_den: int):
    a = pref.select(
        F.col("_id").alias("id_a"), F.col("_tok").alias("_tok"), F.col("_s").alias("_sa")
    )
    b = pref.select(
        F.col("_id").alias("id_b"), F.col("_tok").alias("_tok"), F.col("_s").alias("_sb")
    )
    # length filter: J >= t needs den*min(sa,sb) >= num*max(sa,sb)
    return (
        a.join(b, "_tok")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.lit(threshold_den) * F.least("_sa", "_sb")
                >= F.lit(threshold_num) * F.greatest("_sa", "_sb")
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )


def candidate_pairs(
    tok: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "token",
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Prefix-filter candidate pairs (id_a < id_b) — a superset of the
    qualifying pairs, exposed for selectivity tests and staging."""
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must satisfy 0 < num/den <= 1")
    t, sizes = _prepare(tok, id_col, token_col)
    pref = _prefix_rows(t, sizes, threshold_num, threshold_den)
    return _candidates_from(pref, threshold_num, threshold_den)


def set_similarity_join(
    tok: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "token",
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """All pairs of sets with Jaccard >= threshold_num/threshold_den.

    Input: one row per (set id, member token); duplicates and nulls are
    dropped. Output: (id_a, id_b, inter, union, jaccard_micro) with
    id_a < id_b and jaccard_micro = floor(1e6 * |a∩b| / |a∪b|) — all
    integer arithmetic, so an ANSI-SQL twin reproduces it bit-exactly.
    """
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must satisfy 0 < num/den <= 1")
    t, sizes = _prepare(tok, id_col, token_col)
    # candidates share t/sizes lineage with verification, so the
    # distinct/size exchanges canonicalize equal and Spark reuses them
    pref = _prefix_rows(t, sizes, threshold_num, threshold_den)
    cand = _candidates_from(pref, threshold_num, threshold_den)
    ta = t.select(F.col("_id").alias("id_a"), "_tok")
    tb = t.select(F.col("_id").alias("id_b"), "_tok")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "_tok"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("union", (F.col("_sa") + F.col("_sb") - F.col("inter")))
        .where(
            F.lit(threshold_den) * F.col("inter")
            >= F.lit(threshold_num) * F.col("union")
        )
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("inter").cast("long").alias("inter"),
        F.col("union").cast("long").alias("union"),
        F.expr("(inter * 1000000) div `union`").cast("long").alias("jaccard_micro"),
    )
