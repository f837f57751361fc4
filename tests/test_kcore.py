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


# ----------------------------------------------------------------- sssp


def _sssp_oracle(edge_list, source, directed):
    import heapq
    adj = {}
    for a, b, w in edge_list:
        adj.setdefault(a, []).append((b, w))
        if not directed:
            adj.setdefault(b, []).append((a, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, n = heapq.heappop(pq)
        if d > dist.get(n, float("inf")):
            continue
        for m, w in adj.get(n, []):
            nd = d + w
            if nd < dist.get(m, float("inf")):
                dist[m] = nd
                heapq.heappush(pq, (nd, m))
    return dist


def _run_sssp(spark, edge_list, source, directed=True):
    df = spark.createDataFrame(
        [(int(a), int(b), int(w)) for a, b, w in edge_list],
        "src long, dst long, w long",
    )
    out = components.sssp(
        df, source, weight_col="w", directed=directed
    )
    return {r["node"]: r["dist"] for r in out.collect()}


def test_sssp_hand_case(spark):
    edges = [(0, 1, 4), (0, 2, 1), (2, 1, 2), (1, 3, 1), (2, 3, 9)]
    got = _run_sssp(spark, edges, 0)
    assert got == {0: 0, 1: 3, 2: 1, 3: 4}  # 0->2->1->3


def test_sssp_unreachable_absent_and_isolated_source(spark):
    edges = [(0, 1, 1), (5, 6, 1)]
    got = _run_sssp(spark, edges, 0)
    assert got == {0: 0, 1: 1}
    got2 = _run_sssp(spark, edges, 99)  # source not in graph
    assert got2 == {99: 0}


def test_sssp_undirected_and_unit_weights(spark):
    df = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = components.sssp(df, 2, directed=False)
    assert {r["node"]: r["dist"] for r in out.collect()} == {2: 0, 1: 1, 0: 2}


def test_sssp_random_matches_dijkstra(spark):
    import random
    rng = random.Random(20260821)
    edges = [
        (rng.randrange(30), rng.randrange(30), rng.randrange(1, 10))
        for _ in range(120)
    ]
    edges = [(a, b, w) for a, b, w in edges if a != b]
    for directed in (True, False):
        assert _run_sssp(spark, edges, 0, directed) == _sssp_oracle(
            edges, 0, directed
        ), directed


def test_sssp_negative_weight_raises(spark):
    df = spark.createDataFrame([(0, 1, -1)], "src long, dst long, w long")
    with pytest.raises(Exception, match="negative"):
        components.sssp(df, 0, weight_col="w").collect()
