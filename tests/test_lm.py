"""Bigram-LM quality scoring (operators/lm.py) — semantics pinned by hand.

Model contract under test: add-one smoothing over the start-word
vocabulary, p(w2|w1) = (c12 + 1) / (c1 + V), unseen words fall through
LEFT joins to 1/V, per-bigram log-probs snap to integer micro-nats
before the (exact, BIGINT) per-document sum.
"""

import math

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import lm


def _xent(pairs, c12, c1, v):
    micro = [round(math.log((c12.get(p, 0) + 1) / (c1.get(p[0], 0) + v)) * 1e6)
             for p in pairs]
    return round(-(sum(micro) / len(micro)) / 1e6, 6)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the cat sat", "en"),
        (2, "the dog sat on the cat", "en"),
        (3, "zorp blix quux zorp", "xx"),   # fully OOV vs the en LM
        (4, "the cat", "xx"),               # seen words, scored not trained
        (5, "single", "en"),                # < 2 tokens: no bigrams
        (6, None, "en"),                    # null text: no bigrams
        (7, "", "en"),                      # empty text: no bigrams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_bigram_explode_and_edges(corpus):
    bg = lm.doc_bigrams(corpus).collect()
    ids = {r.doc_id for r in bg}
    assert ids == {0, 1, 2, 3, 4}  # 5,6,7 produce no bigrams
    d1 = sorted((r.w1, r.w2) for r in bg if r.doc_id == 1)
    assert d1 == [("cat", "sat"), ("the", "cat")]


def test_train_counts(corpus):
    c12, c1 = lm.train_bigram_lm(corpus.filter(F.col("lang") == "en"))
    c12d = {(r.w1, r.w2): r.c12 for r in c12.collect()}
    c1d = {r.w1: r.c1 for r in c1.collect()}
    # "the cat" appears in docs 0 and 1 (doc 2 has "the cat" too: "on the cat")
    assert c12d[("the", "cat")] == 3
    assert c12d[("sat", "on")] == 2
    assert c1d["the"] == 5  # five bigram starts with w1="the" across docs 0,1,2
    assert "mat" not in c1d  # sentence-final word never starts a bigram


def test_scores_match_hand_computation(corpus):
    c12, c1 = lm.train_bigram_lm(corpus.filter(F.col("lang") == "en"))
    scored = {r.doc_id: r for r in lm.score_docs(corpus, c12, c1).collect()}
    c12d = {(r.w1, r.w2): r.c12 for r in c12.collect()}
    c1d = {r.w1: r.c1 for r in c1.collect()}
    v = len(c1d)

    assert set(scored) == {0, 1, 2, 3, 4}
    # doc 1 in-model: bigrams (the,cat), (cat,sat)
    assert scored[1].n_bigrams == 2
    assert scored[1].xent == pytest.approx(
        _xent([("the", "cat"), ("cat", "sat")], c12d, c1d, v), abs=1e-9
    )
    # doc 3 fully OOV: every bigram gets 1/V -> xent == ln(V) exactly
    assert scored[3].xent == pytest.approx(
        round(round(math.log(1 / v) * 1e6) / -1e6, 6), abs=1e-9
    )
    # trusted-slice docs score better (lower xent) than the OOV doc
    assert scored[0].xent < scored[3].xent


def test_keep_cols_passthrough(corpus):
    bg = lm.doc_bigrams(corpus, keep_cols=("lang",))
    assert bg.columns == ["doc_id", "lang", "w1", "w2"]
    assert bg.filter(F.col("lang") == "xx").count() > 0


def test_no_cartesian_in_plan(corpus):
    c12, c1 = lm.train_bigram_lm(corpus.filter(F.col("lang") == "en"))
    plan = lm.score_docs(corpus, c12, c1)._jdf.queryExecution().executedPlan().toString()
    # the only product is the broadcast of the 1-row vocab scalar
    assert plan.count("CartesianProduct") == 0


def test_lm_separates_gibberish_on_fixture(spark, sf_dir):
    """Filter efficacy on the real documents fixture. Fully-OOV text
    scores exactly ln(V) — on a tiny-vocab corpus that sits INSIDE the
    real-doc range, so the discriminative probe is maximal transition
    surprise: a frequent context word followed by a never-seen word costs
    ln(c1 + V) per transition, which must rank strictly worse than every
    in-domain document."""
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    en = docs.select("doc_id", "text", "lang").filter(F.col("lang") == "en")
    c12, c1 = lm.train_bigram_lm(en)
    w_max = c1.orderBy(F.desc("c1")).first().w1

    gib = spark.createDataFrame(
        [(10_000 + i, f"{w_max} zzqx{i} " * 15, "xx") for i in range(5)],
        "doc_id long, text string, lang string",
    )
    corpus = docs.select("doc_id", "text", "lang").unionByName(gib)
    scored = lm.score_docs(corpus, c12, c1).collect()
    gib_x = [r.xent for r in scored if r.doc_id >= 10_000]
    real_x = [r.xent for r in scored if r.doc_id < 10_000]
    assert min(gib_x) > max(real_x)


def test_empty_model_raises_diagnosable_error(spark):
    # every training doc < 2 tokens -> no bigrams -> V=0: unguarded,
    # scoring died with an opaque ANSI DIVIDE_BY_ZERO mid-pipeline
    import pytest as _pytest

    short = spark.createDataFrame([(1, "one"), (2, "x")], "doc_id long, text string")
    docs = spark.createDataFrame([(3, "some longer text here")], "doc_id long, text string")
    c12, c1 = lm.train_bigram_lm(short)
    with _pytest.raises(Exception, match="empty language model"):
        lm.score_docs(docs, c12, c1).collect()
