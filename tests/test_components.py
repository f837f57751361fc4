"""Connected components vs a driver-side union-find reference."""

import numpy as np
import pytest

from geocore_spark.operators import components


def _union_find(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_components_simple_chain(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in components.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(17)
    edges = set()
    while len(edges) < 120:
        a, b = sorted(rng.integers(0, 150, 2).tolist())
        if a != b:
            edges.add((int(a), int(b)))
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in components.connected_components(pairs).collect()}
    nodes = sorted({n for e in edges for n in e})
    want = _union_find(sorted(edges), nodes)
    assert got == want


def test_dedup_clusters_assigns_keepers(spark):
    df = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 5), (5, 7), (2, 3)], "id_a long, id_b long")
    out = {r["doc_id"]: r["keeper_id"] for r in components.dedup_clusters(df, pairs).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 2, 4: 4, 5: 1, 6: 6, 7: 1}


def test_dedup_clusters_survives_user_component_column(spark):
    # curation metadata may legitimately carry a column named 'component'
    df = spark.createDataFrame(
        [(i, f"c{i}") for i in range(4)], "doc_id long, component string"
    )
    pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    rows = components.dedup_clusters(df, pairs).collect()
    got = {r["doc_id"]: (r["keeper_id"], r["component"]) for r in rows}
    assert got == {0: (0, "c0"), 1: (1, "c1"), 2: (2, "c2"), 3: (1, "c3")}


def test_nonconvergence_raises_loudly(spark):
    # max_iter too small for the diameter must not silently return split
    # clusters (duplicates would survive dedup undetected)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        components.connected_components(chain, max_iter=1)
