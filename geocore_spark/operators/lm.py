"""In-engine n-gram language-model quality scoring (CCNet-style).

The standard web-corpus curation move (CCNet, Wenzek et al. 2020) is to
train a small LM on a trusted slice of the corpus and rank every document
by its perplexity under that LM — low-perplexity documents read like the
trusted slice, high-perplexity ones are boilerplate/gibberish. The
reference stack filters features by quality thresholds before assembly
(/root/reference/modeling/datasets/build.py:245-258 mask semantics); this
module is the corpus-scale analogue for text.

Everything is declarative DataFrame ops — no UDFs, no driver-side model
object. The "model" IS a DataFrame of bigram counts, so training is one
map-side-combined groupBy over the trusted slice and scoring is two
equi-joins (bigram hash join on (w1, w2), unigram join on w1) that AQE is
free to broadcast when the vocabulary fits. At 100 TB the bigram table
shuffles on its own key once at train time and the scoring join shuffles
the corpus bigrams once — there is no per-document Python and no
all-pairs stage anywhere.

Numeric contract (oracle parity, see CLAUDE.md decimal traps): per-bigram
log-probs are snapped to integer micro-nats, ``CAST(round(ln(p) * 1e6) AS
BIGINT)``, summed exactly as BIGINT, and converted back to a double only
in the final rounded division. Doubles never accumulate, so Spark's
partial-agg ordering cannot drift from a serial oracle.

Smoothing is add-one over the observed start-word vocabulary:
``p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)`` where ``c(w1)`` counts
bigram *starts* (so the denominator is consistent with the numerator's
event space) and ``V = |distinct w1|``. Unseen words fall through the
LEFT joins to ``1 / V`` — no special-casing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import cleaning as cl

MICRO = 1_000_000.0


def doc_bigrams(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, w1, w2) per adjacent token pair, canonical tokenizer
    (functions/cleaning.tokens). Documents with < 2 tokens (incl. null
    text) produce no rows. ``keep_cols`` are carried through untouched.

    The explode is ``sequence(1, size-1)`` + 1-based ``element_at`` —
    guarded by the size >= 2 filter because Spark's ``sequence(1, 0)``
    counts *down* ([1, 0]) instead of returning empty.
    """
    toks = docs.select(
        id_col, *keep_cols, cl.tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") >= 2)
    i = F.col("__i")
    return toks.select(
        id_col,
        *keep_cols,
        F.explode(F.sequence(F.lit(1), F.size("__toks") - 1)).alias("__i"),
        F.col("__toks").alias("__t"),
    ).select(
        id_col,
        *keep_cols,
        F.element_at("__t", i).alias("w1"),
        F.element_at("__t", i + 1).alias("w2"),
    )


def train_bigram_lm(train_docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Bigram + start-unigram count tables over the trusted slice.

    Returns ``(bigram_counts(w1, w2, c12), unigram_counts(w1, c1))`` —
    plain DataFrames; persist them if scoring several corpora.
    """
    bg = doc_bigrams(train_docs, text_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return c12, c1


def score_docs(docs: DataFrame, c12: DataFrame, c1: DataFrame,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document cross-entropy under the bigram LM.

    Output: ``(id_col, n_bigrams, xent)`` — xent is mean negative log-prob
    in nats, rounded to 6 decimals (lower = more like the training slice;
    perplexity = exp(xent)). Only documents with >= 2 tokens appear.
    """
    # empty model -> every denominator (c1 + V) is 0: with ANSI on the
    # stage aborts with an opaque DIVIDE_BY_ZERO mid-pipeline; raise a
    # diagnosable error at the source instead (lazy, the
    # temperature_weights raise_error idiom)
    vocab = c1.agg(F.count(F.lit(1)).alias("__raw_v")).select(
        F.when(
            F.col("__raw_v") > 0, F.col("__raw_v")
        ).otherwise(
            F.raise_error(
                F.lit(
                    "score_docs: empty language model — the training slice "
                    "produced no bigrams (every training doc has < 2 tokens)"
                )
            ).cast("long")
        ).alias("__v")
    )
    bg = doc_bigrams(docs, text_col, id_col)
    lp = (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("__v")).cast(
                        "double"
                    )
                )
                * F.lit(MICRO)
            )
            .cast("bigint")
            .alias("lp_micro"),
        )
    )
    n = F.count(F.lit(1))
    return lp.groupBy(id_col).agg(
        n.alias("n_bigrams"),
        F.round(
            -(F.sum("lp_micro").cast("double") / n) / F.lit(MICRO), 6
        ).alias("xent"),
    )
