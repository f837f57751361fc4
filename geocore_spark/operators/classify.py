"""Linear text-classifier scoring: fastText-style quality/topic model
apply over the corpus.

The workhorse of web-corpus curation (CCNet, fastText lid.176, the
GPT-3/LLaMA "quality classifier" filters): a linear model over
bag-of-words features, trained offline on a small labeled set, applied
at corpus scale. This module implements the APPLY side — the part that
has to run over 100 TB — as pure DataFrame algebra; training a linear
model on a bounded labeled sample is a driver-side scikit-style step by
design (same division of labor as the reference's modeling split,
woodgilber/GeoCore modeling/train.py: the warehouse assembles features
at scale, the model fits on the extracted frame).

Score: ``logit(d) = bias + sum_t count(t, d) * w(t)`` over the model's
vocabulary, ``label = logit > 0`` (binary) — the fastText linear layer
with explicit-vocabulary features instead of hashed buckets, so the
computation is exactly replayable in ANSI SQL.

Float parity: weights are snapped to integer micro-units
(``round(w * 1e6)``) once, per-doc accumulation is
``SUM(count * w_micro)`` over BIGINTs — order-independent, the
:mod:`operators.lm` trick — so Spark's partial-agg order can never
drift a value-hash comparison. The double ``logit`` is derived from the
integer at the end (one deterministic division).

At 100 TB: ONE corpus scan — the token stream is left-joined to the
broadcast vocabulary and a single per-doc hash aggregate computes both
the token count and the weighted sum; out-of-vocabulary tokens carry a
null weight that the partial agg collapses map-side, so the only
shuffle is one row per doc. (An inner join + re-join-to-base variant
reads the text column twice and adds a sort-merge join — strictly
worse; verified via .explain.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import cleaning
from geocore_spark.operators.lm import MICRO


def classifier_score(
    docs: DataFrame,
    vocab_weights: list[tuple[str, float]],
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under an explicit-vocabulary linear model.

    ``vocab_weights``: ``[(term, weight), ...]`` — the trained model
    (typically 10^3-10^5 terms; broadcast). Terms must be distinct and
    already in the canonical token form (:func:`cleaning.tokens`:
    lowercase, whitespace-delimited).

    Returns one row per input document:
    ``(id_col, n_tokens, logit_micro BIGINT, logit DOUBLE, label INT)``
    where ``logit_micro = round(bias*1e6) + sum count*round(w*1e6)``,
    ``logit = logit_micro / 1e6`` and ``label = 1 iff logit_micro > 0``.
    Null/empty text scores ``bias`` alone (0 tokens, like an empty doc).
    """
    if not vocab_weights:
        raise ValueError("vocab_weights must be non-empty")
    terms = [t for t, _ in vocab_weights]
    if len(set(terms)) != len(terms):
        raise ValueError("vocab_weights terms must be distinct")
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(t, int(round(w * MICRO))) for t, w in vocab_weights],
        ["__term", "__w_micro"],
    )
    bias_micro = int(round(bias * MICRO))

    # explode_outer keeps empty/null docs as one null-term row, so every
    # input doc survives to the aggregate (n_tokens = count of non-null
    # terms = 0 for them); OOV terms get a null weight from the left
    # join, which sum() skips and the map-side partial agg collapses
    exploded = docs.select(
        F.col(id_col),
        F.explode_outer(cleaning.tokens(F.col(text_col))).alias("__term"),
    )
    return (
        exploded.join(F.broadcast(wdf), "__term", "left")
        .groupBy(id_col)
        .agg(
            F.count("__term").cast("int").alias("n_tokens"),
            F.sum("__w_micro").alias("__dot_micro"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            (
                F.coalesce(F.col("__dot_micro"), F.lit(0)).cast("bigint")
                + F.lit(bias_micro)
            ).alias("logit_micro"),
        )
        .withColumn(
            "logit", F.round(F.col("logit_micro") / F.lit(MICRO), 6)
        )
        .withColumn(
            "label", (F.col("logit_micro") > 0).cast("int")
        )
    )


def probability(logit) -> Column:
    """Sigmoid of a logit column — the calibrated-probability view.
    Kept OUT of :func:`classifier_score`'s exact output on purpose:
    ``exp()`` is libm-dependent across engines, so oracle-checked
    pipelines should threshold on ``logit_micro`` and only materialize
    probabilities at the consumption edge."""
    c = F.col(logit) if isinstance(logit, str) else logit
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-c))


def fit_linear(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    vocab_size: int = 500,
    max_samples: int = 10_000,
    l2: float = 1e-3,
    epochs: int = 200,
    lr: float = 0.5,
) -> tuple[list[tuple[str, float]], float]:
    """Fit the linear model :func:`classifier_score` applies: logistic
    regression over bag-of-words counts, trained on a BOUNDED labeled
    sample — the CCNet/fastText division of labor (the labeled set is
    small by definition: wiki-vs-crawl, human quality labels), so the
    fit is a deterministic driver-side numpy step while featurization
    and scoring stay distributed.

    Distributed: vocabulary selection = top ``vocab_size`` terms by
    document frequency over the sample (explode -> distinct-doc agg ->
    top-k, ties broken by term so the vocab is deterministic).
    Driver-side: full-batch gradient descent with L2 (no stochastic
    order-dependence — same data -> same model, bit-for-bit).

    Returns ``(vocab_weights, bias)`` ready for :func:`classifier_score`.
    ``labeled`` needs ``label_col`` in {0, 1}; rows beyond
    ``max_samples`` are ignored (deterministically: ordered by a
    fingerprint of the text, not storage order).
    """
    import numpy as np

    # the sample carries the CANONICAL token arrays computed by Spark
    # (cleaning.tokens), never a driver-side re-tokenization — Java's
    # \s+ is ASCII-only while Python's str.split() eats all Unicode
    # whitespace, and any disagreement here is train/apply feature skew
    sample = (
        labeled.select(
            F.col(text_col).alias("__text"),
            cleaning.tokens(F.col(text_col)).alias("__toks"),
            F.col(label_col).cast("double").alias("__y"),
        )
        .orderBy(F.xxhash64("__text"), "__text")
        .limit(max_samples)
    ).persist()

    vocab_rows = (
        sample.select(
            F.xxhash64("__text").alias("__doc"),
            F.explode("__toks").alias("__term"),
        )
        .groupBy("__term")
        .agg(F.countDistinct("__doc").alias("__df"))
        .orderBy(F.desc("__df"), "__term")
        .limit(vocab_size)
        .collect()
    )
    vocab = [r["__term"] for r in vocab_rows]
    if not vocab:
        raise ValueError("no tokens in the labeled sample")
    index = {t: i for i, t in enumerate(vocab)}

    pdf = sample.select("__toks", "__y").toPandas()
    sample.unpersist()
    n, v = len(pdf), len(vocab)
    X = np.zeros((n, v), dtype=np.float64)
    for row_i, toks in enumerate(pdf["__toks"]):
        if toks is None:
            continue
        for tok in toks:
            j = index.get(tok)
            if j is not None:
                X[row_i, j] += 1.0
    y = pdf["__y"].to_numpy(dtype=np.float64)

    w = np.zeros(v)
    b = 0.0
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - y
        w -= lr * ((X.T @ g) / n + l2 * w)
        b -= lr * float(g.mean())
    return list(zip(vocab, w.tolist())), b
