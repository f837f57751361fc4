"""Prefix-filter set-similarity join: brute-force agreement + filter
completeness + selectivity."""

import random
from fractions import Fraction

from pyspark.sql import functions as F

from geocore_spark.operators import setjoin


def _tok_df(spark, sets):
    rows = [(i, t) for i, toks in sets.items() for t in toks]
    return spark.createDataFrame(rows, "doc_id long, token long")


def _brute(sets, num, den):
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = set(sets[a]), set(sets[b])
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa | sb)
            if Fraction(inter, union) >= Fraction(num, den):
                out[(a, b)] = (inter, union, inter * 1_000_000 // union)
    return out


def _run(spark, sets, num, den):
    df = setjoin.set_similarity_join(
        _tok_df(spark, sets), threshold_num=num, threshold_den=den
    )
    return {
        (r["id_a"], r["id_b"]): (r["inter"], r["union"], r["jaccard_micro"])
        for r in df.collect()
    }


def test_identical_sets_jaccard_one(spark):
    sets = {0: [1, 2, 3], 1: [1, 2, 3], 2: [9, 10, 11, 12]}
    out = _run(spark, sets, 9, 10)
    assert out == {(0, 1): (3, 3, 1_000_000)}


def test_threshold_boundary_is_inclusive(spark):
    # J = 2/4 = exactly 1/2
    sets = {0: [1, 2, 3], 1: [2, 3, 4]}
    assert (0, 1) in _run(spark, sets, 1, 2)
    assert _run(spark, sets, 51, 100) == {}


def test_duplicate_tokens_and_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 1), (1, 2), (1, None), (None, 7)],
        "doc_id long, token long",
    )
    out = setjoin.set_similarity_join(df, threshold_num=1, threshold_den=2)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["jaccard_micro"] == 1_000_000


def test_random_sets_match_brute_force_across_thresholds(spark):
    rng = random.Random(20260820)
    sets = {
        i: [rng.randrange(60) for _ in range(rng.randrange(1, 25))]
        for i in range(40)
    }
    for num, den in [(1, 4), (3, 10), (1, 2), (4, 5)]:
        assert _run(spark, sets, num, den) == _brute(sets, num, den), (num, den)


def test_prefix_candidates_complete_and_selective(spark):
    rng = random.Random(7)
    # sparse sets over a large universe: candidates << all pairs
    sets = {i: rng.sample(range(5000), 12) for i in range(60)}
    # plant a near-dup pair
    sets[58] = sets[59][:10] + [9001, 9002]
    df = _tok_df(spark, sets)
    cand = {
        (r["id_a"], r["id_b"])
        for r in setjoin.candidate_pairs(df, threshold_num=1, threshold_den=2).collect()
    }
    truth = _brute(sets, 1, 2)
    assert set(truth) <= cand  # completeness (prefix-filter theorem)
    assert len(cand) < 60 * 59 // 2 / 4  # selectivity on sparse data
    assert (58, 59) in truth


def test_invalid_threshold_raises(spark):
    df = _tok_df(spark, {0: [1]})
    for num, den in [(0, 1), (3, 2), (-1, 4)]:
        try:
            setjoin.set_similarity_join(df, threshold_num=num, threshold_den=den)
            assert False, "expected ValueError"
        except ValueError:
            pass
