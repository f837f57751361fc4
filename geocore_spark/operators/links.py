"""Web link graph: href extraction, host edges, distributed PageRank.

Curation pipelines use the link graph as a quality prior (domain-level
trust propagates along links — the Common-Crawl ranking / harmonic-
centrality idea). The reference has no web-graph analogue; this is part
of the webtext operator set the brief asks for.

Scale shape: extraction is a JVM regexp over the html column (no
Python); the edge list aggregates once on (src_host, dst_host); PageRank
is the classic synchronous power iteration — each step is one join
(ranks x edges, both keyed on the host) + one groupBy, with the previous
iteration's ranks persisted and released. Nothing driver-side except the
dangling-mass scalar per iteration (a 1-row aggregate, collected —
unavoidable and O(1)). At 10^12 pages the host graph is ~10^8 rows:
executor-sized, and every step is key-partitioned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geocore_spark.functions import urls

_HREF = r'href\s*=\s*["\']([^"\']+)["\']'


def extract_links(html: Column) -> Column:
    """array<string> of href attribute values (JVM regexp, no Python).

    Accepts string or binary html (binary is decoded as UTF-8).
    """
    s = html.cast("string")
    return F.regexp_extract_all(s, F.lit(_HREF), 1)


def host_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_host, dst_host, n_links) aggregated host-level edge list.

    Relative hrefs (no host) and self-links are dropped — the graph
    models cross-host endorsement, the signal quality priors care about.
    """
    src = urls.url_host(F.col(url_col)).alias("src_host")
    e = (
        pages.select(src, F.explode(extract_links(F.col(html_col))).alias("href"))
        .select("src_host", urls.url_host(F.col("href")).alias("dst_host"))
        .filter(
            F.col("dst_host").isNotNull()
            & (F.col("dst_host") != "")
            & (F.col("dst_host") != F.col("src_host"))
        )
    )
    return e.groupBy("src_host", "dst_host").agg(F.count(F.lit(1)).alias("n_links"))


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    weighted: bool = True,
) -> DataFrame:
    """Synchronous PageRank over a host edge list -> (host, rank).

    Ranks sum to 1 (dangling mass redistributed uniformly each step —
    without this, graphs with sinks leak mass and ranks are not
    comparable across corpora). ``weighted=True`` splits a host's vote
    by link counts; False gives every distinct out-neighbor equal share.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    w = F.col("n_links").cast("double") if weighted else F.lit(1.0)
    out = edges.groupBy("src_host").agg(F.sum(w).alias("__out"))
    # edge weight = share of src's vote; precomputed once and persisted
    ew = (
        edges.join(out, "src_host")
        .select(
            "src_host",
            "dst_host",
            (w / F.col("__out")).alias("__share"),
        )
        .persist()
    )
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select("dst_host"))
        .distinct()
        .persist()
    )
    n = nodes.count()  # O(1) scalar, reused every iteration
    if n == 0:
        ew.unpersist()
        nodes.unpersist()
        return nodes.select("host", F.lit(0.0).alias("rank"))
    ranks = nodes.select("host", F.lit(1.0 / n).alias("rank")).persist()
    try:
        for _ in range(iters):
            contribs = (
                ranks.join(ew, ranks["host"] == ew["src_host"])
                .groupBy("dst_host")
                .agg(F.sum(F.col("rank") * F.col("__share")).alias("__c"))
            )
            # mass sitting on hosts with no out-links, redistributed
            dangling = (
                ranks.join(out, ranks["host"] == out["src_host"], "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )
            base = (1.0 - damping) / n + damping * dangling / n
            new_ranks = (
                nodes.join(contribs, nodes["host"] == contribs["dst_host"], "left")
                .select(
                    "host",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0))
                    ).alias("rank"),
                )
                .persist()
            )
            new_ranks.count()  # materialize before releasing the parent
            ranks.unpersist()
            ranks = new_ranks
        return ranks
    finally:
        ew.unpersist()
        nodes.unpersist()
