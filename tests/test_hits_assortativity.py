"""hits_exact vs an exact Python integer replay; assortativity vs the
same moment arithmetic in Python floats (identical IEEE op order)."""

import collections
import math
import random

import pytest

from geocore_spark.operators import links

MASS = 1_000_000_000_000


def _hits_python(edge_list, iters, mass=MASS):
    """Exact replay: same init, same weighted sums, same floor-div L1
    rescale, same a-then-h order."""
    nodes = sorted({u for u, _, _ in edge_list} | {v for _, v, _ in edge_list})
    h = {x: mass // len(nodes) for x in nodes}
    a = {}
    for _ in range(iters):
        araw = collections.defaultdict(int)
        for u, v, w in edge_list:
            if u in h:
                araw[v] += h[u] * w
        tot = sum(araw.values())
        a = {x: (r * mass) // tot for x, r in araw.items()}
        hraw = collections.defaultdict(int)
        for u, v, w in edge_list:
            if v in a:
                hraw[u] += a[v] * w
        tot = sum(hraw.values())
        h = {x: (r * mass) // tot for x, r in hraw.items()}
    return {x: (a.get(x, 0), h.get(x, 0)) for x in nodes}


def _run_hits(spark, edge_list, iters=3):
    df = spark.createDataFrame(
        edge_list, "src_host string, dst_host string, n_links long"
    )
    return {
        r["host"]: (r["auth_micro"], r["hub_micro"])
        for r in links.hits_exact(df, iters=iters).collect()
    }


def test_hits_star_graph(spark):
    # leaves point at the hub center: center = top authority, zero hub;
    # leaves = equal hubs, zero authority
    edges = [(f"leaf{i}", "center", 1) for i in range(4)]
    got = _run_hits(spark, edges)
    assert got["center"][0] == MASS and got["center"][1] == 0
    for i in range(4):
        assert got[f"leaf{i}"][0] == 0
        assert got[f"leaf{i}"][1] == MASS // 4


def test_hits_matches_python_replay(spark):
    rng = random.Random(20260821)
    edges = list(
        {
            (f"h{rng.randrange(12)}", f"h{rng.randrange(12)}")
            for _ in range(60)
        }
    )
    edges = [
        (u, v, 1 + (int(u[1:]) * 7 + int(v[1:])) % 3)
        for u, v in edges
        if u != v
    ]
    for iters in (1, 3):
        assert _run_hits(spark, edges, iters) == _hits_python(edges, iters), iters


def test_hits_validates_iters(spark):
    df = spark.createDataFrame(
        [("a", "b", 1)], "src_host string, dst_host string, n_links long"
    )
    with pytest.raises(ValueError):
        links.hits_exact(df, iters=0)


def _assort_python(pairs):
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    va, vb = n * sxx - sx * sx, n * syy - sy * sy
    if va <= 0 or vb <= 0:
        return n, None
    # same IEEE op order as grouped_corr: num / (sqrt(a) * sqrt(b))
    return n, float(n * sxy - sx * sy) / (
        math.sqrt(float(va)) * math.sqrt(float(vb))
    )


def test_assortativity_matches_python_moments(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )
    r = links.assortativity(df).collect()[0]
    n, want = _assort_python(pairs)
    assert r["n_endpoints"] == n
    assert r["assortativity"] == want  # bit-exact: same integer moments


def test_assortativity_regular_graph_null(spark):
    # a 4-cycle: every degree 2 -> zero variance -> NULL
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    r = links.assortativity(df).collect()[0]
    assert r["assortativity"] is None and r["n_endpoints"] == 8


# ------------------------------------------------------- review regressions


def test_hits_null_weight_edges_dropped_and_all_null_raises(spark):
    # a NULL-weight edge must be dropped like a NULL endpoint, not
    # silently contribute nothing while counted in the node set
    edges = [("a", "b", 1), ("c", "b", None)]
    df = spark.createDataFrame(
        edges, "src_host string, dst_host string, n_links long"
    )
    got = {r["host"]: (r["auth_micro"], r["hub_micro"])
           for r in links.hits_exact(df, iters=1).collect()}
    assert set(got) == {"a", "b"}  # c filtered out entirely
    assert got["b"][0] == MASS
    # every weight NULL -> graph empties out entirely -> empty output
    allnull = spark.createDataFrame(
        [("a", "b", None)], "src_host string, dst_host string, n_links long"
    )
    assert links.hits_exact(allnull, iters=1).count() == 0
    # nodes exist but all weights ZERO -> nothing to normalize -> raise
    zeros = spark.createDataFrame(
        [("a", "b", 0)], "src_host string, dst_host string, n_links long"
    )
    with pytest.raises(ValueError, match="no usable edge"):
        links.hits_exact(zeros, iters=1)


def test_hits_negative_weight_raises(spark):
    # ADVICE r3: the div/floor parity the SQL twin rests on assumes
    # non-negative operands — a negative n_links must raise (like
    # sssp's w_ok guard), never flow into a silently-divergent total.
    df = spark.createDataFrame(
        [("a", "b", 2), ("c", "b", -1)],
        "src_host string, dst_host string, n_links long",
    )
    with pytest.raises(Exception, match="negative edge weight"):
        links.hits_exact(df, iters=1).collect()


def test_assortativity_empty_graph_single_row(spark):
    df = spark.createDataFrame([(1, 1)], "src long, dst long")  # self-loop only
    r = links.assortativity(df).collect()
    assert len(r) == 1
    assert r[0]["n_endpoints"] == 0 and r[0]["assortativity"] is None
