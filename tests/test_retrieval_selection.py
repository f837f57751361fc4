"""BM25 retrieval, DSIR selection, and SemDeDup cluster-bounded dedup."""

import math

import pytest

from pyspark.sql import functions as F

from geocore_spark.operators import retrieval, selection, similarity


def _bm25_truth(docs, query, k1=1.2, b=0.75):
    """Reference BM25 in plain Python (public Robertson/Zaragoza formula)."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, t in toks.items():
        s = 0.0
        matched = 0
        for q in query:
            tf = t.count(q)
            if tf == 0:
                continue
            matched += 1
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            contrib = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            s += round(contrib * 1e6) / 1e6
        if matched:
            out[i] = (matched, round(s, 6))
    return out


DOCS = [
    (1, "spark shuffle join shuffle spark"),
    (2, "join the big table join join"),
    (3, "rare unicorn appears once here"),
    (4, "spark spark spark spark spark spark spark spark"),
    (5, "nothing relevant at all whatsoever"),
]


def test_bm25_matches_reference_formula(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_query_terms"], r["score"])
        for r in retrieval.bm25_topk(df, ["spark", "join", "unicorn"], k=10).collect()
    }
    assert got == _bm25_truth(DOCS, ["spark", "join", "unicorn"])


def test_bm25_rare_term_outranks_common(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    top = retrieval.bm25_topk(df, ["unicorn"], k=3).collect()
    assert [r["doc_id"] for r in top] == [3]  # only the matching doc appears


def test_bm25_topk_limit_and_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    assert retrieval.bm25_topk(df, ["spark"], k=1).count() == 1
    with pytest.raises(ValueError):
        retrieval.bm25_topk(df, [], k=5)
    with pytest.raises(ValueError):
        retrieval.bm25_topk(df, ["spark"], k=0)


def _dsir_truth(raw, target):
    rtok = [(i, w) for i, t in raw for w in t.lower().split()]
    ttok = [w for _, t in target for w in t.lower().split()]
    rcnt, tcnt = {}, {}
    for _, w in rtok:
        rcnt[w] = rcnt.get(w, 0) + 1
    for w in ttok:
        tcnt[w] = tcnt.get(w, 0) + 1
    v = len(set(rcnt) | set(tcnt))
    nr, nt = len(rtok), len(ttok)
    out = {}
    for i, t in raw:
        s, n = 0, 0
        for w in t.lower().split():
            pt = (tcnt.get(w, 0) + 1) / (nt + v)
            pr = (rcnt.get(w, 0) + 1) / (nr + v)
            s += round((math.log(pt) - math.log(pr)) * 1e6)
            n += 1
        if n:
            out[i] = (n, round(s / 1e6, 6))
    return out


RAW = [
    (1, "code code compiler tokens"),
    (2, "weather rain sunny rain"),
    (3, "code compiler parse tree code"),
    (4, "rain rain rain rain"),
]
TARGET = [(100, "code compiler parse code code compiler")]


def test_bm25_duplicate_query_terms_are_set_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "spark runs fast"), (2, "spark spark spark"), (3, "slow job")],
        "doc_id long, text string",
    )
    once = {(r["doc_id"], r["score"]) for r in retrieval.bm25_topk(docs, ["spark"]).collect()}
    twice = {(r["doc_id"], r["score"]) for r in retrieval.bm25_topk(docs, ["spark", "SPARK"]).collect()}
    assert once == twice  # multiplicity explicitly ignored (documented)


def test_bm25_null_text_counts_as_length_zero(spark):
    docs = spark.createDataFrame(
        [(1, "spark fast"), (2, None), (3, "spark")], "doc_id long, text string"
    )
    out = retrieval.bm25_topk(docs, ["spark"]).collect()
    assert {r["doc_id"] for r in out} == {1, 3}  # null-text doc just never matches


def test_dsir_empty_target_raises_loudly(spark):
    raw = spark.createDataFrame([(1, "a b c"), (2, "d e")], "doc_id long, text string")
    empty = spark.createDataFrame([(9, "   ")], "doc_id long, text string")
    with pytest.raises(Exception, match="target corpus has no tokens"):
        selection.dsir_logweights(raw, empty).collect()
    with pytest.raises(Exception, match="target corpus has no tokens"):
        selection.dsir_select(raw, empty, 0.5, mode="exact").collect()


def test_dsir_matches_reference_formula(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["logw"])
        for r in selection.dsir_logweights(raw, tgt).collect()
    }
    assert got == _dsir_truth(RAW, TARGET)


def test_dsir_target_like_docs_rank_first(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    picked = selection.dsir_select(raw, tgt, frac=0.5, mode="exact").collect()
    assert sorted(r["doc_id"] for r in picked) == [1, 3]  # the code-y docs
    assert all(r["logw"] > 0 for r in picked)
    with pytest.raises(ValueError):
        selection.dsir_select(raw, tgt, frac=0.0)
    with pytest.raises(ValueError):
        selection.dsir_select(raw, tgt, frac=0.5, mode="bogus")


def test_dsir_threshold_mode_matches_exact_at_small_n(spark):
    """The KLL sketch stores every value at small N, so the threshold cut
    keeps a superset of the exact top-frac that still excludes the
    bottom; the code-y docs always survive, the off-domain ones never
    outrank them."""
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    picked = {
        r["doc_id"]
        for r in selection.dsir_select(raw, tgt, frac=0.5).collect()
    }
    assert {1, 3} <= picked  # exact winners survive the threshold cut
    assert 4 not in picked  # pure rain never makes the cut
    # threshold mode never shrinks below the exact cut's floor
    assert len(picked) >= 2


def _vec(seed, dim=8):
    import random

    rng = random.Random(seed)
    return [rng.uniform(-1, 1) for _ in range(dim)]


def test_semdedup_flags_planted_duplicates(spark):
    base = [(i, _vec(i)) for i in range(1, 21)]
    dups = [(100 + i, [x + 0.001 for x in v]) for i, v in base[:5]]
    df = spark.createDataFrame(base + dups, ["vec_id", "embedding"])
    out = similarity.semdedup(df, n_clusters=4, threshold=0.999).collect()
    flags = {r["vec_id"]: r["is_dup"] for r in out}
    assert len(flags) == 25
    # every planted copy has its original (lower id) available; it is a dup
    # iff the two landed in the same cluster — with near-identical vectors
    # they always do (cosine to every centroid differs by < 1e-3)
    for i in range(1, 6):
        assert flags[100 + i] == 1
        assert flags[i] == 0  # originals are the keepers (lowest id wins)
    assert sum(flags.values()) == 5  # nothing else is within 0.999


def test_semdedup_within_cluster_agrees_with_exact(spark):
    base = [(i, _vec(i)) for i in range(1, 21)]
    dups = [(100 + i, [x + 0.001 for x in v]) for i, v in base[:5]]
    df = spark.createDataFrame(base + dups, ["vec_id", "embedding"])
    one_cluster = similarity.semdedup(df, n_clusters=1, threshold=0.999)
    exact = similarity.near_dup_pairs_exact(df, threshold=0.999)
    dup_ids = {r["vec_id"] for r in one_cluster.collect() if r["is_dup"]}
    exact_dups = {r["id_b"] for r in exact.collect()}
    assert dup_ids == exact_dups  # C=1 degenerates to the exact operator


def test_semdedup_cluster_count_bounded(spark):
    base = [(i, _vec(i)) for i in range(1, 31)]
    df = spark.createDataFrame(base, ["vec_id", "embedding"])
    out = similarity.semdedup(df, n_clusters=5, threshold=0.999)
    assert out.select("cluster_id").distinct().count() <= 5
    assert out.agg(F.sum("is_dup")).collect()[0][0] == 0  # random vecs: no dups
    with pytest.raises(ValueError):
        similarity.semdedup(df, n_clusters=0)


def test_semantic_decontam_flags_planted_leakage(spark):
    corpus = [(i, _vec(i)) for i in range(1, 31)]
    evalset = [(500 + i, [x + 0.0005 for x in v]) for i, v in corpus[:4]]
    c = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    e = spark.createDataFrame(evalset, ["vec_id", "embedding"])
    out = similarity.semantic_decontam(c, e, threshold=0.999).collect()
    assert len(out) == 30  # one row per corpus item, always
    flags = {r["vec_id"]: (r["contaminated"], r["closest_eval_id"]) for r in out}
    for i in range(1, 5):
        assert flags[i] == (1, 500 + i)  # each source doc flags its leak
    assert sum(f for f, _ in flags.values()) == 4
    assert all(r["max_cos"] <= 1.0 for r in out)


def test_cross_source_overlap_counts_distinct_shared_texts(spark):
    from geocore_spark.operators import dedup as dd

    rows = [
        ("a", "shared one"),
        ("a", "shared one"),      # intra-source dup: counts once
        ("a", "only in a"),
        ("b", "shared one"),
        ("b", "shared two"),
        ("c", "shared two"),
        ("c", "only in c"),
    ]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in dd.cross_source_overlap(df).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 1}  # no (a,c), dups deduped


def test_temperature_weights_rebalance(spark):
    from geocore_spark.operators import sampling as smp

    rows = [("big", i) for i in range(900)] + [("small", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["source", "doc_id"])
    out = {
        r["source"]: r
        for r in smp.temperature_weights(
            df, alpha=0.7, budget=1000
        ).collect()
    }
    w_big, w_small = out["big"]["weight"], out["small"]["weight"]
    assert abs(w_big + w_small - 1.0) < 2e-6
    # alpha=0.7 upsamples the small slice above its 10% natural share
    assert 0.10 < w_small < 0.5
    # planned allocation follows the weights at the stated budget
    assert out["small"]["planned"] == round(w_small * 1000)
    # alpha=1 is proportional
    prop = {
        r["source"]: r["weight"]
        for r in smp.temperature_weights(df, alpha=1.0).collect()
    }
    assert abs(prop["big"] - 0.9) < 2e-6 and abs(prop["small"] - 0.1) < 2e-6
    import pytest as _pt

    with _pt.raises(ValueError):
        smp.temperature_weights(df, alpha=0.0)
