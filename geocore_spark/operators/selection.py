"""Data selection via importance resampling (DSIR-style unigram weights).

Given a small TARGET corpus (the distribution you want more of — e.g. a
high-quality domain slice) and a huge RAW corpus, score every raw
document by how much more likely its tokens are under the target's
unigram language model than under the raw corpus's own — the published
DSIR recipe (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169) with add-one-smoothed unigram
features:

    logw(d) = sum over tokens w of  ln p_target(w) - ln p_raw(w)
    p_X(w)  = (count_X(w) + 1) / (total_X + |V|)

with a shared vocabulary V = distinct tokens of raw UNION target, so
both models smooth over the same event space. High logw = looks like the
target; select the top fraction (or Gumbel-resample) for training.

Spark shape: two vocabulary-sized count aggregates (Zipf: tiny next to
the corpus), LEFT-joined onto the raw token stream — AQE broadcasts them
when they fit — then one per-document micro-nat sum. The RAW corpus is
scanned + tokenized twice (once for the count aggregate, once for the
scoring join — the branches feed different partitionings, so Catalyst
plans independent scans); the doc-keyed shuffle happens once. The
target corpus is likewise read twice but is small by construction.
Capacity-plan for 2x the raw tokenize cost, or persist the token stream
when the corpus fits your cache tier.

Float parity (the :mod:`operators.lm` trick): per-token log-ratios snap
to integer micro-nats, ``CAST(round((ln(pt) - ln(pr)) * 1e6) AS
BIGINT)``, and sum as BIGINTs — order-independent, so partial-agg order
can never drift a value-hash comparison against a SQL oracle.

Beyond-reference capability (training-data pipeline set); the reference
(woodgilber/GeoCore) has no corpus-selection surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the one micro-unit constant of the integer-accumulation trick —
# shared with operators.lm so the snap precision can never desync
from geocore_spark.operators.lm import MICRO  # noqa: E402


def _token_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from geocore_spark.functions import cleaning

    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(cleaning.tokens(F.col(text_col))).alias("w"),
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-raw-document DSIR log importance weight.

    Returns ``(id_col, n_tokens, logw)`` for every raw document with at
    least one token; ``logw`` is the summed log-ratio in nats rounded to
    6 decimals. Higher = more target-like.
    """
    rtok = _token_stream(raw, text_col, id_col)
    ttok = _token_stream(target, text_col, id_col)

    rcnt = rtok.groupBy("w").agg(F.count(F.lit(1)).alias("cr"))
    tcnt = ttok.groupBy("w").agg(F.count(F.lit(1)).alias("ct"))
    # shared smoothing constants: |V| over the union vocabulary plus the
    # two corpus token totals, folded into one broadcastable 1-row frame
    vocab = (
        rcnt.select("w")
        .unionByName(tcnt.select("w"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
    )
    def _positive(name: str, side: str) -> Column:
        # a token-less corpus makes the SUM NULL -> every logw NULL:
        # exact select then returns ARBITRARY docs with null weights and
        # threshold mode dies inside the KLL sketch with an opaque
        # buffer error — raise a diagnosable error at the source (NULL
        # > 0 is NULL, so the otherwise branch fires for NULL and 0)
        return (
            F.when(F.col(name) > 0, F.col(name))
            .otherwise(
                F.raise_error(
                    F.lit(f"dsir_logweights: {side} corpus has no tokens")
                ).cast("long")
            )
            .alias(name)
        )

    totals = (
        rcnt.agg(F.sum("cr").alias("nr"))
        .crossJoin(tcnt.agg(F.sum("ct").alias("nt")))
        .crossJoin(vocab)
        .select(_positive("nr", "raw"), _positive("nt", "target"), "v")
    )

    pt = (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("nt") + F.col("v")
    ).cast("double")
    pr = (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1)).cast("double") / (
        F.col("nr") + F.col("v")
    ).cast("double")

    lp = (
        rtok.join(tcnt, "w", "left")
        .join(rcnt, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__id",
            F.round((F.log(pt) - F.log(pr)) * F.lit(MICRO))
            .cast("bigint")
            .alias("lw_micro"),
        )
    )
    return lp.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("lw_micro").cast("double") / F.lit(MICRO), 6).alias(
            "logw"
        ),
    ).select(F.col("__id").alias(id_col), "n_tokens", "logw")


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    frac: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "threshold",
) -> DataFrame:
    """Keep the most target-like ``frac`` of raw documents by DSIR
    log-weight (the paper's Gumbel-noise variant trades determinism for
    diversity; the hard cut is the reproducible default).

    ``mode="threshold"`` (default, the 100 TB shape): estimate the
    (1-frac) quantile of ``logw`` with a mergeable KLL sketch and keep
    everything at or above it — one extra aggregate, NO global sort, no
    driver-sized limit. The cut count is approximate within the sketch's
    rank-error bound (~0.6% at k=200), PLUS ties: every document sharing
    the threshold logw is kept inclusively, so a duplicate-heavy corpus
    whose mass piles on one weight can overshoot ``frac`` by the size of
    that tie group (dedup before select if that matters). At small N the
    sketch stores every value and the cut itself is exact.

    ``mode="exact"``: exact top-``ceil(frac*N)`` rows via a global
    TakeOrderedAndProject (ties by id asc) — bit-reproducible, but the
    limit materializes frac*N rows through the driver-side take, so use
    it only when that count is bounded (evals, tests, small corpora).
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError("frac must be in (0, 1]")
    if mode not in ("threshold", "exact"):
        raise ValueError("mode must be 'threshold' or 'exact'")
    w = dsir_logweights(raw, target, text_col, id_col)
    if mode == "exact":
        import math

        # frac applies to the SCORED population (w) in both modes: the
        # threshold mode's quantile is over w, so counting `raw` here
        # would make the two modes disagree wholesale whenever token-less
        # docs exist (ceil(frac*raw) of a smaller scored set is a larger
        # effective fraction) — and it cost an extra full raw scan.
        n = w.count()
        # ceil per the contract, with an epsilon guard so exact decimal
        # fractions don't gain a row to float noise (0.3*10 -> 3, not 4)
        # or lose one to truncation (0.29*100 -> 29, not 28)
        keep = max(1, math.ceil(n * frac - 1e-9))
        return w.orderBy(F.desc("logw"), F.asc(id_col)).limit(keep)
    from geocore_spark.operators import sketches as sk

    p = round(1.0 - frac, 9)
    qcol = f"q_{str(p).replace('.', '_')}"
    thr = sk.quantile_estimates(
        sk.sketch_quantiles(w, "logw"), [p]
    ).select(F.col(qcol).alias("__thr"))
    return (
        w.crossJoin(F.broadcast(thr))
        .filter(F.col("logw") >= F.col("__thr"))
        .drop("__thr")
    )
