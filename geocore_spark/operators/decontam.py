"""Benchmark decontamination: flag corpus documents that share word n-grams
with a held-out evaluation set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM §7 style):
any training document containing an n-gram that also appears in a benchmark
is contaminated and must be dropped or audited. The reference has no
analogue (its labels are curated tables, /root/reference/modeling/datasets/
build.py:217-285); this is part of the beyond-reference LLM-pipeline surface.

Shape at 100 TB:
- The benchmark side is SMALL by definition (eval sets are MBs). Its
  distinct n-gram set is broadcast — the corpus side is one scan, one
  explode, one broadcast-hash semi-join, then one aggregation keyed by
  doc_id. No corpus-vs-corpus shuffle ever happens.
- Explode factor is ~tokens-per-doc; the join keeps only matching grams, so
  the aggregated state is |contaminated docs|, not |grams|.
- ``hashed=True`` joins on ``xxhash64(gram)`` instead of the gram string —
  8-byte keys instead of ~50-byte strings in the broadcast table and the
  exchange. Same result set (collision odds ~2^-64 per pair); pinned equal
  in tests. The string mode exists because the DuckDB oracle cannot replay
  Spark's xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions.cleaning import tokens, word_ngrams


def _gram_rows(
    df: DataFrame, id_col: str | None, text_col: str, n: int, hashed: bool
) -> DataFrame:
    """Gram stream of a frame; ``id_col=None`` emits grams only (the
    benchmark side needs no id — and must not be forced to carry one)."""
    ids = [F.col(id_col)] if id_col else []
    # null text yields no grams (matches the SQL twin, where a NULL split
    # drops the row) — without this, word_ngrams over a null array emits
    # one '' gram and null docs cross-match each other
    staged = df.filter(F.col(text_col).isNotNull()).select(
        *ids, tokens(F.col(text_col)).alias("_toks")
    )
    grams = staged.select(*ids, F.explode(word_ngrams(F.col("_toks"), n)).alias("gram"))
    if hashed:
        grams = grams.withColumn("gram", F.xxhash64("gram"))
    return grams


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    hashed: bool = False,
) -> DataFrame:
    """Contaminated docs: ``(doc_id, overlap_ngrams)`` for every document of
    ``docs`` sharing >= 1 word ``n``-gram with any ``benchmark`` row.

    ``overlap_ngrams`` counts DISTINCT offending grams per document (a gram
    appearing 10 times in one doc counts once — the audit-relevant number).
    Clean documents are absent from the result; left-join downstream to flag
    a whole corpus. Tokenization: lowercase, whitespace split, empties
    dropped — identical to the dedup operators so contamination and dedup
    agree on what a "word" is.
    """
    bench_grams = _gram_rows(
        benchmark, None, bench_text_col or text_col, n, hashed
    ).distinct()
    # Join FIRST, dedupe inside the aggregation: the broadcast semi-join
    # discards non-matching grams map-side, so the only shuffle is the
    # per-doc agg over MATCHED grams. (A per-doc dropDuplicates before the
    # join would shuffle the entire exploded gram stream — |corpus grams|,
    # not |matches| — exactly the state this module promises to avoid.)
    doc_grams = _gram_rows(docs, id_col, text_col, n, hashed)
    hits = doc_grams.join(F.broadcast(bench_grams), "gram")
    return hits.groupBy(id_col).agg(
        F.count_distinct("gram").cast("long").alias("overlap_ngrams")
    )
