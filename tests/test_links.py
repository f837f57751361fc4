"""Link graph + PageRank (operators/links.py) vs a numpy power iteration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import links


def test_extract_links_and_host_edges(spark):
    html = (
        '<a href="https://b.com/x">b</a> <a href=\'https://c.com/\'>c</a>'
        ' <a href="/relative">rel</a> <a href="https://a.com/self">self</a>'
    )
    pages = spark.createDataFrame(
        [("https://a.com/p1", html), ("https://b.com/p1", '<a href="https://c.com/y">c</a>')],
        "url string, html string",
    )
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in links.host_edges(pages).collect()
    }
    # relative + self links dropped; binary html also accepted
    assert got == {("a.com", "b.com"): 1, ("a.com", "c.com"): 1, ("b.com", "c.com"): 1}
    binpages = pages.select("url", F.encode("html", "UTF-8").alias("html"))
    assert {
        (r.src_host, r.dst_host) for r in links.host_edges(binpages).collect()
    } == set(got)


def test_host_edges_href_validation(spark):
    # scheme-less hrefs must NOT fabricate hosts (url_host's first-path-
    # segment fallback); protocol-relative //host IS a real cross-host
    # link; uppercase tags/attrs and newlines inside the tag still match
    html = (
        '<a href="mailto:bob@x.com">m</a> <a href="javascript:void(0)">j</a>'
        ' <a href="docs/page.html">rel</a> <a href="//cdn.b.com/a.js">cdn</a>'
        ' <A\n HREF="https://up.com/x">up</A>'
    )
    pages = spark.createDataFrame(
        [("https://a.com/p", html)], "url string, html string"
    )
    got = {(r.src_host, r.dst_host) for r in links.host_edges(pages).collect()}
    assert got == {("a.com", "cdn.b.com"), ("a.com", "up.com")}


def test_anchor_corpus_strips_nested_markup_and_crosses_newlines(spark):
    html = '<a href="https://b.com/x"><b>Read\nthis</b></a>'
    pages = spark.createDataFrame([(html,)], "html string")
    rows = links.anchor_corpus(pages).collect()
    assert [(r.dst_host, r.anchor, r.n_refs) for r in rows] == [
        ("b.com", "Read\nthis", 1)
    ]


def test_anchor_corpus(spark):
    html = (
        '<a href="https://b.com/x">Read this</a>'
        '<a class="z" href=\'https://b.com/y\'>Read this</a>'
        '<a href="https://c.com/">  </a>'  # whitespace anchor dropped
        '<a href="/rel">relative dropped</a>'
    )
    pages = spark.createDataFrame(
        [("https://a.com/1", html), ("https://d.com/1", html)],
        "url string, html string",
    )
    got = {
        (r.dst_host, r.anchor): r.n_refs
        for r in links.anchor_corpus(pages).collect()
    }
    assert got == {("b.com", "Read this"): 4}


def _bfs_stats(edge_list, max_dist):
    """Exact truncated reachability + harmonic centrality over INCOMING
    links (the transpose=True default)."""
    hosts = sorted({h for e in edge_list for h in e})
    radj = {h: set() for h in hosts}  # v -> {u : u links to v}
    for s, t in edge_list:
        radj[t].add(s)
    out = {}
    for v in hosts:
        ball, frontier, harmonic = {v}, {v}, 0.0
        for r in range(1, max_dist + 1):
            frontier = {u for w in frontier for u in radj[w]} - ball
            harmonic += len(frontier) / r
            ball |= frontier
        out[v] = (len(ball), harmonic)
    return out


def test_neighborhood_stats_matches_bfs(spark):
    # chain a->b->c->d plus a hub e->{b,c}: distinct distances, a sink
    raw = [("a", "b"), ("b", "c"), ("c", "d"), ("e", "b"), ("e", "c")]
    edges = spark.createDataFrame(
        [(s, t, 1) for s, t in raw], "src_host string, dst_host string, n_links long"
    )
    got = {
        r.host: (r.reachable_est, r.harmonic_centrality)
        for r in links.neighborhood_stats(edges, max_dist=3).collect()
    }
    ref = _bfs_stats(raw, max_dist=3)
    assert set(got) == set(ref)
    for h, (n, harm) in ref.items():
        # tiny cardinalities: HLL sparse mode is exact
        assert got[h][0] == n, h
        assert got[h][1] == pytest.approx(harm, abs=1e-6), h


def test_neighborhood_stats_outgoing(spark):
    raw = [("a", "b"), ("b", "c")]
    edges = spark.createDataFrame(
        [(s, t, 1) for s, t in raw], "src_host string, dst_host string, n_links long"
    )
    got = {
        r.host: r.reachable_est
        for r in links.neighborhood_stats(
            edges, max_dist=2, transpose=False
        ).collect()
    }
    assert got == {"a": 3, "b": 2, "c": 1}


def _np_pagerank(edge_list, iters, d=0.85, seeds=None):
    hosts = sorted({h for e in edge_list for h in e[:2]})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    W = np.zeros((n, n))
    for s, t, w in edge_list:
        W[idx[t], idx[s]] += w
    outsum = W.sum(axis=0)
    if seeds is None:
        p = np.full(n, 1.0 / n)
    else:
        p = np.zeros(n)
        hit = [idx[h] for h in seeds if h in idx]
        p[hit] = 1.0 / len(hit)
    r = p.copy()
    for _ in range(iters):
        share = np.divide(W, outsum, out=np.zeros_like(W), where=outsum > 0)
        dangling = r[outsum == 0].sum()
        r = (1 - d) * p + d * (share @ r) + d * dangling * p
    return {h: r[idx[h]] for h in hosts}


@pytest.mark.parametrize("weighted", [True, False])
def test_pagerank_matches_numpy(spark, weighted):
    # cycle + a hub + a dangling sink, with a weighted multi-edge
    raw = [
        ("a", "b", 3), ("b", "c", 1), ("c", "a", 1),
        ("a", "d", 1), ("b", "d", 1),  # d is dangling
    ]
    edges = spark.createDataFrame(raw, "src_host string, dst_host string, n_links long")
    got = {
        r.host: r.rank
        for r in links.pagerank(edges, iters=12, weighted=weighted).collect()
    }
    ref = _np_pagerank(
        [(s, t, (w if weighted else 1)) for s, t, w in raw], iters=12
    )
    assert set(got) == set(ref)
    for h in ref:
        assert got[h] == pytest.approx(ref[h], abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_trustrank_matches_numpy_and_biases_to_seeds(spark):
    # honest cycle a<->b<->c plus a spam pocket d->e, e->d linking into c
    raw = [
        ("a", "b", 1), ("b", "c", 1), ("c", "a", 1),
        ("d", "e", 1), ("e", "d", 1), ("d", "c", 1),
    ]
    edges = spark.createDataFrame(raw, "src_host string, dst_host string, n_links long")
    seeds = spark.createDataFrame([("a",), ("zzz-not-in-graph",)], "host string")
    got = {
        r.host: r.rank
        for r in links.pagerank(edges, iters=15, seeds=seeds).collect()
    }
    ref = _np_pagerank(raw, iters=15, seeds=["a"])
    for h in ref:
        assert got[h] == pytest.approx(ref[h], abs=1e-9), h
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # trust decays with distance from the whitelist: the spam pocket,
    # unreachable from the seed, holds (near-)zero trust
    assert got["d"] < 1e-9 and got["e"] < 1e-9
    assert got["a"] > got["d"]
    with pytest.raises(ValueError):
        links.pagerank(
            edges,
            iters=2,
            seeds=spark.createDataFrame([("nope",)], "host string"),
        )


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame(
        [], "src_host string, dst_host string, n_links long"
    )
    out = links.pagerank(edges, iters=3)
    assert out.columns == ["host", "rank"] and out.count() == 0


def test_pagerank_uniform_on_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)],
        "src_host string, dst_host string, n_links long",
    )
    got = [r.rank for r in links.pagerank(edges, iters=5).collect()]
    assert all(r == pytest.approx(1 / 3, abs=1e-12) for r in got)


def test_pagerank_exact_matches_integer_reference(spark):
    """pagerank_exact must equal a pure-python replay of the documented
    integer formula bit-for-bit, and track the double variant to ~1/mass."""
    from geocore_spark.operators import links

    E = [("a", "b", 2), ("a", "c", 1), ("b", "c", 3), ("c", "a", 1), ("d", "a", 5)]
    edges = spark.createDataFrame(E, "src_host string, dst_host string, n_links long")
    got = {r.host: r.rank_micro for r in links.pagerank_exact(edges, iters=3).collect()}

    MASS, DN, DD = 10**12, 85, 100
    nodes = sorted({s for s, _, _ in E} | {d for _, d, _ in E})
    n = len(nodes)
    u0 = MASS // n
    base = (DD - DN) * u0
    out: dict[str, int] = {}
    for s, _, w in E:
        out[s] = out.get(s, 0) + w
    r = {v: u0 for v in nodes}
    for _ in range(3):
        S = {v: 0 for v in nodes}
        for s, d, w in E:
            S[d] += (r[s] * w) // out[s]
        dsh = (sum(r.values()) - sum(S.values())) // n
        r = {v: (base + DN * (dsh + S[v])) // DD for v in nodes}
    assert got == r

    pr = {x.host: x.rank for x in links.pagerank(edges, iters=3).collect()}
    for v in nodes:
        assert abs(got[v] / MASS - pr[v]) < 1e-6, (v, got[v] / MASS, pr[v])


def test_pagerank_exact_empty_and_validation(spark):
    from geocore_spark.operators import links

    empty = spark.createDataFrame(
        [], "src_host string, dst_host string, n_links long"
    )
    assert links.pagerank_exact(empty).count() == 0
    import pytest as _pt

    edges = spark.createDataFrame(
        [("a", "b", 1)], "src_host string, dst_host string, n_links long"
    )
    with _pt.raises(ValueError):
        links.pagerank_exact(edges, iters=0)
    with _pt.raises(ValueError):
        links.pagerank_exact(edges, damp_num=100)


def test_pagerank_exact_seeded_matches_double_trustrank(spark):
    """Seeded pagerank_exact tracks the double TrustRank and keeps all
    teleport + residual mass on the whitelist (non-seed sinks decay)."""
    from geocore_spark.operators import links

    E = [("a", "b", 1), ("b", "c", 2), ("c", "a", 1), ("c", "d", 1), ("d", "b", 3)]
    edges = spark.createDataFrame(E, "src_host string, dst_host string, n_links long")
    seeds = spark.createDataFrame([("a",), ("b",)], "host string")
    got = {
        r.host: r.rank_micro
        for r in links.pagerank_exact(edges, iters=4, seeds=seeds).collect()
    }
    ref = {
        r.host: r.rank
        for r in links.pagerank(edges, iters=4, seeds=seeds).collect()
    }
    assert set(got) == set(ref)
    for h in ref:
        assert abs(got[h] / 1e12 - ref[h]) < 1e-6, (h, got[h] / 1e12, ref[h])
    import pytest as _pt

    with _pt.raises(ValueError):
        links.pagerank_exact(
            edges, seeds=spark.createDataFrame([("zz",)], "host string")
        )


def test_pagerank_exact_random_graphs_match_reference(spark):
    """Three seeded random digraphs (with sinks, multi-edges collapsed,
    weights 1..5): Spark must equal the pure-python integer replay on
    every node — the partitioning-independence claim, not just one
    fixture."""
    import random

    from geocore_spark.operators import links

    MASS, DN, DD = 10**12, 85, 100
    for seed in (3, 11, 42):
        rng = random.Random(seed)
        n_nodes = rng.randint(6, 14)
        names = [f"n{i}" for i in range(n_nodes)]
        pairs = {
            (rng.choice(names), rng.choice(names))
            for _ in range(rng.randint(8, 30))
        }
        E = [(a, b, rng.randint(1, 5)) for a, b in pairs if a != b]
        if not E:
            continue
        edges = spark.createDataFrame(
            E, "src_host string, dst_host string, n_links long"
        )
        got = {
            r.host: r.rank_micro
            for r in links.pagerank_exact(edges, iters=3).collect()
        }
        nodes = sorted({s for s, _, _ in E} | {d for _, d, _ in E})
        n = len(nodes)
        u0 = MASS // n
        base = (DD - DN) * u0
        out: dict[str, int] = {}
        for s, _, w in E:
            out[s] = out.get(s, 0) + w
        r = {v: u0 for v in nodes}
        for _ in range(3):
            S = {v: 0 for v in nodes}
            for s, d, w in E:
                S[d] += (r[s] * w) // out[s]
            dsh = (sum(r.values()) - sum(S.values())) // n
            r = {v: (base + DN * (dsh + S[v])) // DD for v in nodes}
        assert got == r, f"seed {seed}"
