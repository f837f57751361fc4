"""Triangle counting: known graphs + randomized brute-force agreement."""

import itertools
import random

from pyspark.sql import functions as F

from geocore_spark.operators import motifs


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _brute_per_node(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_k4_every_node_in_three_triangles(spark):
    pairs = list(itertools.combinations(range(4), 2))
    out = {
        r["node"]: r["n_triangles"]
        for r in motifs.triangle_count(_df(spark, pairs)).collect()
    }
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_free_graph_is_empty(spark):
    # a 6-cycle has no triangles
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    assert motifs.triangle_count(_df(spark, pairs)).count() == 0


def test_duplicate_reversed_and_self_edges_ignored(spark):
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 2), (0, 1)]
    out = {
        r["node"]: r["n_triangles"]
        for r in motifs.triangle_count(_df(spark, pairs)).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1}


def test_null_endpoints_dropped(spark):
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (None, 3), (3, None)], "src long, dst long"
    )
    out = {r["node"]: r["n_triangles"] for r in motifs.triangle_count(df).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_random_graph_matches_brute_force(spark):
    rng = random.Random(20260820)
    n = 30
    pairs = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(220)
    ]
    expected = _brute_per_node(pairs)
    out = {
        r["node"]: r["n_triangles"]
        for r in motifs.triangle_count(_df(spark, pairs)).collect()
    }
    assert out == expected
    # triangles() enumerates each exactly once: total = 3 * #triangles
    total = motifs.triangles(_df(spark, pairs)).count()
    assert total * 3 == sum(expected.values())


def test_each_triangle_enumerated_once_no_dupes(spark):
    pairs = list(itertools.combinations(range(6), 2))  # K6: C(6,3)=20
    tri = motifs.triangles(_df(spark, pairs))
    rows = [tuple(sorted((r["ta"], r["tb"], r["tc"]))) for r in tri.collect()]
    assert len(rows) == 20
    assert len(set(rows)) == 20
