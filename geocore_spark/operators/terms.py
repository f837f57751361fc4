"""Corpus term statistics: per-document tf-idf top terms.

The keyword-extraction primitive of a curation pipeline — salient-term
summaries per document feed topic bucketing, source diagnostics, and
cheap relevance filters. Built entirely from DataFrame aggregations so
Catalyst sees the whole plan:

1. explode the canonical token array (functions/cleaning.tokens — the one
   tokenizer every text operator shares),
2. hash-aggregate (doc, term) -> tf   [one shuffle, map-side partial],
3. hash-aggregate term -> doc-frequency over the tf rows (already
   distinct per (doc, term), so a plain count — no count-distinct pass),
4. corpus size N as a 1-row aggregate broadcast-cross-joined in (the
   mean-impute scalar pattern, never a driver-side collect),
5. tf * ln(N/df), rounded to 6 decimals, then row_number <= k per doc —
   rank AFTER rounding with a term tie-break, so Spark and any SQL oracle
   agree on ties at the boundary (the float-rank parity rule from
   CLAUDE.md); the descending-rank window compiles to WindowGroupLimit,
   not a full per-doc sort.

At 100 TB: two shuffles keyed on (doc, term) and term, both partial-agg
collapsed; the term->df side is vocabulary-sized (Zipf: far smaller than
the corpus) and the final join back to tf rows shuffles on term once more
— or broadcasts when the vocabulary fits, which AQE decides at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geocore_spark.functions import cleaning


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by tf-idf.

    tf = term count within the document; idf = ln(N / df_t) where df_t is
    the number of distinct documents containing the term and N counts every
    input document (including token-less ones). Rows with a NULL id are
    DROPPED up front: they would inflate doc_freq (forming a groupBy(null)
    tf group) while being invisible to N, allowing df_t > N and NEGATIVE
    idf. Returns ``(id_col, term, tf, doc_freq, tfidf)`` with tfidf
    rounded to 6 decimals and ties broken by term ascending.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    df = df.filter(F.col(id_col).isNotNull())
    terms = df.select(
        F.col(id_col).alias("__id"),
        F.explode(cleaning.tokens(F.col(text_col))).alias("term"),
    )
    tf = terms.groupBy("__id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    # count, not count_distinct: after the null drop N == row count for
    # any sane corpus (unique ids), without an extra distinct aggregate;
    # matches bm25_topk's N semantics
    n = df.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "__id",
            "term",
            "tf",
            "doc_freq",
            F.round(
                F.col("tf")
                * F.log(F.col("__n_docs").cast("double") / F.col("doc_freq")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("__id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(F.col("__id").alias(id_col), "term", "tf", "doc_freq", "tfidf")
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Term -> sorted posting list over the corpus — the retrieval-side
    sibling of tf-idf (decontamination lookups, keyword routing, cheap
    boolean search over a curated dump).

    One explode + one hash aggregate per term: ``tf`` (total occurrences),
    ``doc_freq`` (distinct documents), ``postings`` (sorted distinct doc
    ids). ``min_df`` prunes hapax terms — at web scale the df=1 tail is
    most of the vocabulary and rarely worth indexing.

    Scale shape: a single shuffle keyed on term with map-side partial
    aggregation; posting arrays are bounded by document frequency, so the
    only skew risk is stop-word-like terms — cap those upstream via
    ``min_df``'s mirror (a max_df filter) or a stop list before indexing
    100 TB. collect_set keeps the whole list per term in executor memory,
    which is the standard posting-list contract (segment-sized terms).
    """
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    # NULL ids count into tf but vanish from count_distinct/collect_set,
    # which would emit (tf=1, doc_freq=0, postings=[]) rows whose tf
    # disagrees with their own posting list — drop them up front, the
    # same guard tfidf_top_terms applies.
    terms = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        F.explode(cleaning.tokens(F.col(text_col))).alias("term"),
    )
    out = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("__id").alias("doc_freq"),
        F.sort_array(F.collect_set("__id")).alias("postings"),
    )
    if min_df > 1:
        out = out.filter(F.col("doc_freq") >= min_df)
    return out
