"""kcore vs a Python peeling oracle."""

import collections
import random

import pytest

from geocore_spark.operators import components


def _peel(pairs, k):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        bad = [n for n, s in adj.items() if len(s) < k]
        for n in bad:
            changed = True
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n for n, s in adj.items() if s}


def _run(spark, pairs, k):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return {r["node"] for r in components.kcore(df, k).collect()}


def test_clique_plus_tail(spark):
    # K5 clique (degree 4) with a pendant path: 4-core = the clique only
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(4, 10), (10, 11), (11, 12)]
    assert _run(spark, pairs, 4) == {0, 1, 2, 3, 4}
    assert _run(spark, pairs, 5) == set()
    assert _run(spark, pairs, 1) == set(range(5)) | {10, 11, 12}


def test_cascade_peel(spark):
    # a chain hanging off a triangle: k=2 peels the chain node by node
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5)]
    assert _run(spark, pairs, 2) == {0, 1, 2}


def test_random_matches_python_peel(spark):
    rng = random.Random(20260820)
    pairs = [(rng.randrange(60), rng.randrange(60)) for _ in range(350)]
    for k in (2, 5, 8, 11):
        assert _run(spark, pairs, k) == _peel(pairs, k), k


def test_dupes_selfloops_and_validation(spark):
    pairs = [(0, 1), (1, 0), (0, 0), (1, 2), (2, 0)]
    assert _run(spark, pairs, 2) == {0, 1, 2}
    sdf = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        components.kcore(sdf, 0)
