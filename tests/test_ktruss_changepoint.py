"""ktruss vs closed forms + a Python peel oracle; changepoint vs hand
prefix-sum arithmetic."""

import collections
import itertools
import random

import pytest

from geocore_spark.operators import motifs, temporal


# ------------------------------------------------------------------ ktruss


def _truss_oracle(pairs, k):
    """Python peel: recount per-edge triangle support, drop < k-2."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        supp = collections.Counter()
        for a, b in edges:
            for c in adj[a] & adj[b]:
                supp[(a, b)] += 1
        keep = {e for e in edges if supp[e] >= k - 2}
        if keep == edges:
            return edges
        edges = keep


def _run(spark, pairs, k):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return {(r["a"], r["b"]) for r in motifs.ktruss(df, k).collect()}


def test_ktruss_clique_closed_form(spark):
    k5 = list(itertools.combinations(range(5), 2))
    assert _run(spark, k5, 5) == set(k5)  # K5 is a 5-truss
    assert _run(spark, k5, 6) == set()


def test_ktruss_shared_edge_cascade(spark):
    # two triangles sharing edge (1,2): k=4 peels everything in cascade
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (1, 3)]
    assert _run(spark, pairs, 3) == {(0, 1), (1, 2), (0, 2), (2, 3), (1, 3)}
    assert _run(spark, pairs, 4) == set()


def test_ktruss_k4_plus_pendant_triangle(spark):
    k4 = list(itertools.combinations(range(4), 2))
    pendant = [(3, 10), (3, 11), (10, 11)]
    assert _run(spark, k4 + pendant, 4) == set(k4)


def test_ktruss_k2_is_dedup_graph_and_validation(spark):
    pairs = [(0, 1), (1, 0), (0, 0), (2, 3)]
    assert _run(spark, pairs, 2) == {(0, 1), (2, 3)}
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        motifs.ktruss(df, 1)


def test_ktruss_random_matches_python_peel(spark):
    rng = random.Random(20260821)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(300)]
    for k in (3, 4, 5):
        assert _run(spark, pairs, k) == _truss_oracle(pairs, k), k


# -------------------------------------------------------------- changepoint


def _cp(spark, xs):
    rows = [(1, i, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g long, o long, tb long, x long")
    r = temporal.changepoint(df, "g", "o", "tb", "x").collect()[0]
    return r["n"], r["total"], r["cusum"], r["break_i"]


def test_changepoint_step_series(spark):
    # [0,0,0,10,10]: stat_i = |5*S_i - i*20| = 20,40,60,30,0 -> i=3
    assert _cp(spark, [0, 0, 0, 10, 10]) == (5, 20, 60, 3)


def test_changepoint_constant_series_null(spark):
    n, total, cusum, break_i = _cp(spark, [5, 5, 5, 5])
    assert (cusum, break_i) == (0, None)


def test_changepoint_tie_takes_smallest_i(spark):
    # [0,5,10]: stats 15,15,0 -> tie, min i = 1
    assert _cp(spark, [0, 5, 10]) == (3, 15, 15, 1)


def test_changepoint_respects_order_and_tiebreak(spark):
    # same data, rows delivered out of order; (o, tb) restores it
    rows = [(1, 3, 0, 10), (1, 0, 0, 0), (1, 4, 0, 10),
            (1, 1, 0, 0), (1, 2, 0, 0)]
    df = spark.createDataFrame(rows, "g long, o long, tb long, x long")
    r = temporal.changepoint(df, "g", "o", "tb", "x").collect()[0]
    assert (r["cusum"], r["break_i"]) == (60, 3)


def test_changepoint_overflow_guard_raises(spark):
    big = 2**58  # n=3: 2 * n^2 * m = 9 * 2^59 > 2^62 -> guard trips
    df = spark.createDataFrame(
        [(1, i, i, big) for i in range(3)], "g long, o long, tb long, x long"
    )
    with pytest.raises(Exception, match="overflow"):
        temporal.changepoint(df, "g", "o", "tb", "x").collect()


def test_ktruss_fixpoint_first_round(spark):
    # K5 at k=5 is already a fixpoint: result equals the canonical input
    import itertools
    k5 = list(itertools.combinations(range(5), 2))
    assert _run(spark, k5, 5) == set(k5)


# ---------------------------------------------------- clustering_coefficient


def _cc(spark, pairs):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    return {
        r["node"]: (r["deg"], r["n_triangles"], r["cc_micro"])
        for r in motifs.clustering_coefficient(df).collect()
    }


def test_clustering_k4_is_one(spark):
    import itertools
    got = _cc(spark, itertools.combinations(range(4), 2))
    for n in range(4):
        assert got[n] == (3, 3, 1_000_000)


def test_clustering_star_and_leaf(spark):
    got = _cc(spark, [(0, 1), (0, 2), (0, 3)])
    assert got[0] == (3, 0, 0)
    assert got[1] == (1, 0, None)  # degree-1: undefined


def test_clustering_triangle_with_pendant(spark):
    got = _cc(spark, [(0, 1), (1, 2), (2, 0), (0, 9)])
    assert got[0] == (3, 1, 2_000_000 // 6)
    assert got[1] == (2, 1, 1_000_000)


def test_clustering_matches_python(spark):
    import collections
    import random
    rng = random.Random(42)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(150)]
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    got = _cc(spark, pairs)
    for n, nbrs in adj.items():
        d = len(nbrs)
        t = sum(1 for x in nbrs for y in nbrs if x < y and y in adj[x])
        want = (2_000_000 * t) // (d * (d - 1)) if d >= 2 else None
        assert got[n] == (d, t, want), n
