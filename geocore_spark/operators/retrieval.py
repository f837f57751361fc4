"""Ranked retrieval over the corpus: BM25 top-k scoring.

The targeted-selection primitive of a training-data pipeline — "give me
the documents most about X" drives topic-targeted subset mining,
eval-adjacent data auditing, and relevance-weighted mixing. This is the
query-side complement of :mod:`geocore_spark.operators.terms` (the
inverted index is the precomputed form; this scores on the fly).

Okapi BM25 (Robertson & Zaragoza 2009, public formula):

    score(q, d) = sum over t in q of
        idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b*|d|/avgdl))
    idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Everything is DataFrame aggregation — one explode with the query-term
filter applied BEFORE the aggregate (Catalyst pushes the ``IN`` list into
the projection so non-query terms never reach the shuffle), a
(doc, term) -> tf hash aggregate, a query-term-sized df aggregate
broadcast back, and a corpus-stats 1-row aggregate cross-joined in (the
mean-impute scalar pattern — no driver collect).

Float parity: per-(doc, term) contributions are snapped to integer
micro-points (``CAST(round(score * 1e6) AS BIGINT)``) and summed as
BIGINTs, the :mod:`operators.lm` trick — the per-term double expression
is deterministic on both engines, and integer summation is
order-independent, so Spark's partial-agg order can never drift a hash
comparison.

At 100 TB: the exploded stream is filtered to query terms before the
(doc, term) shuffle — the shuffle volume is bounded by matches, not
corpus tokens; the df side is |q| rows (broadcast); the doc-length join
keys on the doc id (AQE broadcasts the tf side when the match set is
small); top-k compiles to TakeOrderedAndProject, never a full sort.

Beyond-reference capability (training-data pipeline set); the reference
has no text retrieval — its nearest analogue is the feature-assembly
joins (woodgilber/GeoCore modeling/datasets/build.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import cleaning

# the one micro-unit constant of the integer-accumulation trick —
# shared with operators.lm so the snap precision can never desync
from geocore_spark.operators.lm import MICRO  # noqa: E402


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag-of-words query.

    Returns ``(id_col, n_query_terms, score)`` — ``n_query_terms`` counts
    the distinct query terms matched, ``score`` is the BM25 sum rounded
    to 6 decimals. Ties broken by ``id_col`` ascending. Documents
    matching no query term are absent (their score is exactly 0).

    ``N`` counts every input document and ``avgdl`` averages token counts
    over all of them, including empty and null-text ones (length 0) —
    the standard corpus-wide statistics, not match-conditioned ones.
    Query-term MULTIPLICITY is ignored (each distinct term contributes
    once — the ``IN``-filter formulation has set semantics by
    construction; this dedupe just makes that explicit).

    Plan note: the corpus is scanned + tokenized THREE times — the stats
    aggregate, the match explode, and the doc-length join side (dl is
    referenced under two different partitionings, so Catalyst plans
    independent scans for each) — capacity-plan for 3x the tokenize cost
    per query, or persist the token frame across a query batch.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # normalize query terms through the SAME rules as cleaning.tokens
    # (lowercase, whitespace split, empties dropped): a term with
    # embedded/trailing whitespace ('new york', 'York ') can never equal
    # a corpus token, so it would silently contribute zero matches.
    # Java's \\s is ASCII-only — split on the ASCII class, not
    # Python's Unicode str.split(), per the classify train/apply skew.
    import re

    terms = sorted(
        {
            w
            for t in query_terms
            if t is not None
            for w in re.split(r"[ \t\n\r\f\x0b]+", t.lower())
            if w
        }
    )
    if not terms:
        raise ValueError("query_terms contain no usable tokens")

    toks = docs.select(
        F.col(id_col).alias("__id"),
        cleaning.tokens(F.col(text_col)).alias("__w"),
    )
    # explicit 0 for null token arrays: size(NULL) is NULL under ANSI
    # (harmlessly skipped by the sums) but -1 with ansi off — which
    # would silently DEFLATE sum_dl and shift every score in the corpus
    dl = toks.select(
        "__id",
        F.when(F.col("__w").isNull(), F.lit(0)).otherwise(F.size("__w")).alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    matches = toks.select(
        "__id", F.explode("__w").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = matches.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("doc_freq").cast("double") + F.lit(0.5))
        / (F.col("doc_freq").cast("double") + F.lit(0.5))
    )
    denom = F.col("tf").cast("double") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    contrib = idf * F.col("tf").cast("double") * F.lit(k1 + 1.0) / denom

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "__id")
        .crossJoin(F.broadcast(stats))
        .select(
            "__id",
            F.round(contrib * F.lit(MICRO)).cast("bigint").alias("s_micro"),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_query_terms"),
            F.round(F.sum("s_micro").cast("double") / F.lit(MICRO), 6).alias(
                "score"
            ),
        )
        .orderBy(F.desc("score"), F.asc("__id"))
        .limit(k)
        .select(F.col("__id").alias(id_col), "n_query_terms", "score")
    )
