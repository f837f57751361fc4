"""fuzzy_pairs: brute-force completeness across the short/gram boundary."""

import random
import string

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import fuzzyjoin


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(strs, d):
    out = {}
    ids = sorted(strs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            dist = _lev(strs[a], strs[b])
            if dist <= d:
                out[(a, b)] = dist
    return out


def _run(spark, strs, d, q=3):
    df = spark.createDataFrame(list(strs.items()), "id long, s string")
    out = fuzzyjoin.fuzzy_pairs(df, max_dist=d, q=q)
    return {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}


def test_exact_duplicates_and_one_edit(spark):
    strs = {0: "banana", 1: "banana", 2: "banane", 3: "bandana", 4: "xyzzy"}
    got = _run(spark, strs, 1)
    assert got == {(0, 1): 0, (0, 2): 1, (1, 2): 1, (0, 3): 1, (1, 3): 1}


def test_short_and_long_strings_random_vs_brute(spark):
    rng = random.Random(20260820)
    alpha = "abc"  # tiny alphabet -> dense near-matches
    strs = {}
    for i in range(120):
        # mix of lengths straddling q*(d+1)=9 for q=3, d=2
        n = rng.choice([0, 1, 2, 3, 5, 7, 8, 9, 10, 14, 20])
        strs[i] = "".join(rng.choice(alpha) for _ in range(n))
    for d in (0, 1, 2):
        assert _run(spark, strs, d) == _brute(strs, d), d


def test_boundary_distance_inclusive(spark):
    strs = {0: "abcdefghij", 1: "abcdefghXY"}  # dist exactly 2
    assert _run(spark, strs, 2) == {(0, 1): 2}
    assert _run(spark, strs, 1) == {}


def test_empty_and_null_handling(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "a"), (2, None), (None, "b"), (3, "ab")],
        "id long, s string",
    )
    out = {(r["id_a"], r["id_b"]): r["dist"]
           for r in fuzzyjoin.fuzzy_pairs(df, max_dist=1).collect()}
    assert out == {(0, 1): 1, (1, 3): 1}


def test_larger_q_same_answer(spark):
    rng = random.Random(7)
    words = ["".join(rng.choice(string.ascii_lowercase) for _ in range(12))
             for _ in range(40)]
    strs = {i: w for i, w in enumerate(words)}
    strs[100] = words[0][:11] + "z"  # planted near-dup
    assert _run(spark, strs, 1, q=2) == _run(spark, strs, 1, q=4) == _brute(strs, 1)


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(0, "x")], "id long, s string")
    with pytest.raises(ValueError):
        fuzzyjoin.fuzzy_pairs(df, max_dist=-1)
    with pytest.raises(ValueError):
        fuzzyjoin.fuzzy_pairs(df, q=1)
