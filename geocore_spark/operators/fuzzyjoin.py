"""Edit-distance fuzzy self-join via q-gram blocking.

All pairs of strings within Levenshtein distance ``d``, found without an
all-pairs compare — the record-linkage primitive (near-identical titles,
URL variants, OCR noise) the dedup family lacks: MinHash/SimHash answer
set/bag similarity, ``setjoin`` answers exact Jaccard; this answers
*sequence* similarity.

Candidate rule (Gravano et al., "Approximate String Joins in a
Database", VLDB 2001 — public): one edit operation destroys at most
``q`` of a string's positional q-grams, so strings within distance d
share at least ``max(|a|,|b|) - q + 1 - d*q`` q-grams. When
``max(|a|,|b|) >= q*(d+1)`` that bound is >= 1 — a shared gram is
guaranteed, and the pair surfaces in a gram-keyed equi-join. Pairs where
BOTH strings are shorter than ``q*(d+1)`` fall to a length-bucketed
short path (bucket = len div (d+1); qualifying pairs differ by <= d in
length, so their buckets differ by <= 1) — and a long/short pair across
the q*(d+1) boundary with length gap > d is impossible at distance d
(ed >= |len difference|), so the two paths are exhaustive
(property-tested against brute force). Both strings of a gram-covered
pair do have grams: min >= max - d >= q(d+1) - d >= q for q >= 2.

Verification is exact ``levenshtein`` — the same DP definition in Spark
and DuckDB, so an ANSI-SQL twin replays distances bit-exactly.

Scale shape: gram explode (bounded by total characters), one gram-keyed
self-join, one tiny short-set bucket join, id-keyed string re-attach,
and the levenshtein filter. No cartesian. Skew note: stop-gram keys
("the", "ing") concentrate the gram join exactly like frequent tokens
in a prefix join — raise ``q`` to thin them (cost: a larger short set),
or pre-drop ubiquitous grams only if you accept losing completeness for
pairs whose every shared gram is ubiquitous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["fuzzy_pairs"]


def fuzzy_pairs(
    df: DataFrame,
    id_col: str = "id",
    str_col: str = "s",
    max_dist: int = 1,
    q: int = 3,
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(s_a, s_b) <= max_dist.

    Output: (id_a, id_b, dist). Null ids/strings dropped; duplicate
    strings under distinct ids are legitimate pairs (dist 0).
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2 (q=1 breaks the short-pair cover)")
    d = max_dist
    base = (
        df.where(F.col(id_col).isNotNull() & F.col(str_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.col(str_col).alias("_s"))
        .withColumn("_len", F.length("_s"))
    )

    # --- gram path: covers every qualifying pair with max(len) >= q(d+1)
    grams = base.where(F.col("_len") >= q).select(
        "_id",
        "_len",
        F.explode(
            F.expr(f"transform(sequence(1, _len - {q - 1}), i -> substring(_s, i, {q}))")
        ).alias("_g"),
    ).distinct()
    ga = grams.select(
        F.col("_id").alias("id_a"), F.col("_len").alias("_la"), "_g"
    )
    gb = grams.select(
        F.col("_id").alias("id_b"), F.col("_len").alias("_lb"), "_g"
    )
    cand_gram = (
        ga.join(gb, "_g")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= d)
        )
        .select("id_a", "id_b")
    )

    # --- short path: both strings shorter than q(d+1)
    short = base.where(F.col("_len") < q * (d + 1)).withColumn(
        "_b", F.expr(f"_len div {d + 1}")
    )
    sa = short.select(
        F.col("_id").alias("id_a"), F.col("_len").alias("_la"), F.col("_b")
    )
    # join bucket b with buckets {b, b+1}: |len diff| <= d implies bucket
    # diff <= 1, and the one-sided +1 with id_a<id_b dedup keeps each
    # cross-bucket pair once (same-bucket pairs come from the b=b arm)
    sb = short.select(
        F.col("_id").alias("id_b"),
        F.col("_len").alias("_lb"),
        F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_b"),
    )
    cand_short = (
        sa.join(sb, "_b")
        .where(
            (F.col("id_a") != F.col("id_b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= d)
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
    )
    cand = cand_gram.unionAll(cand_short).distinct()

    # --- exact verification
    lhs = base.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"))
    rhs = base.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"))
    return (
        cand.join(lhs, "id_a")
        .join(rhs, "id_b")
        .withColumn("dist", F.levenshtein("_sa", "_sb").cast("int"))
        .where(F.col("dist") <= d)
        .select("id_a", "id_b", "dist")
    )
