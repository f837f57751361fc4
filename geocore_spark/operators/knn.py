"""Cell-bucketed k-nearest-neighbor join (k=10 per the north rule).

The reference's neighbor search is a driver-side ``np.argsort`` over a full
O(B^2) distance matrix (/root/reference/modeling/cross_validators/block.py:
76-119). That shape dies at scale; here kNN is a candidate-generation +
window-top-k plan:

  1. index query and corpus points to cells (pure Column arithmetic);
  2. corpus explodes to a k-ring cover sized so any query's k neighbors
     are inside the ring with high probability (ring radius from a density
     estimate, or caller-fixed);
  3. equi-join on cell, exact haversine, ``row_number() <= k`` per query.

Rows whose ring under-delivered (< k candidates) are detected and re-run
with a wider ring — the iterative expansion of SURVEY §4.3 — so results
are exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geocore_spark.functions import tiling as tl
from geocore_spark.functions.geodesy import haversine_km


def knn_candidates(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    k_ring: int,
    res: int,
    lat: str = "lat",
    lon: str = "lon",
) -> DataFrame:
    """Candidate pairs within ``k_ring`` cells, with exact distance."""
    q = queries.withColumn("__qcell", tl.latlng_to_cell(F.col(lat), F.col(lon), res))
    c = corpus.select(
        F.col(corpus_id).alias("__nid"),
        F.col(lat).alias("__nlat"),
        F.col(lon).alias("__nlon"),
    ).withColumn(
        "__ccover",
        F.explode(
            tl.grid_disk(tl.latlng_to_cell(F.col("__nlat"), F.col("__nlon"), res), k_ring)
        ),
    )
    pairs = q.join(c, q["__qcell"] == c["__ccover"], "inner")
    return pairs.withColumn(
        "dist_km",
        haversine_km(F.col(lat), F.col(lon), F.col("__nlat"), F.col("__nlon")),
    ).drop("__qcell", "__ccover")


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "id",
    corpus_id: str = "id",
    lat: str = "lat",
    lon: str = "lon",
    res: int = 9,
    k_ring: int = 1,
    max_expansions: int = 3,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact k nearest corpus points per query point.

    Returns query columns + ``neighbor_id``, ``dist_km``, ``rank``.
    Exactness guard: a query's top-k is provably correct once its k-th
    candidate distance <= the ring's guaranteed-covered radius; queries
    failing that re-join with a doubled ring (up to ``max_expansions``).
    Ties broken by neighbor id for determinism (matches the SQL oracle).
    """
    remaining = queries
    results = []
    ring = k_ring
    for _ in range(max_expansions):
        cand = knn_candidates(remaining, corpus, query_id, corpus_id, ring, res, lat, lon)
        if exclude_self:
            cand = cand.filter(F.col(query_id) != F.col("__nid"))
        w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col("__nid").asc())
        topk = cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
        # guaranteed radius: ring count * min cell dimension at this res
        edge_km = tl.edge_deg(res) * 111.195
        safe_km = ring * edge_km * 0.45  # conservative: cos(66 deg) lon shrink
        counts = topk.groupBy(query_id).agg(
            F.count("*").alias("__n"), F.max("dist_km").alias("__maxd")
        )
        done_ids = counts.filter(
            (F.col("__n") >= k) & (F.col("__maxd") <= safe_km)
        ).select(query_id)
        results.append(
            topk.join(F.broadcast(done_ids), query_id, "inner").select(
                F.col(query_id), F.col("__nid").alias("neighbor_id"), "dist_km", "rank"
            )
        )
        remaining = remaining.join(done_ids, query_id, "left_anti")
        ring *= 2
        if not remaining.take(1):
            remaining = None
            break
    if remaining is not None and remaining.take(1):
        # final pass: brute-force the stragglers (few rows) via cross join
        c = corpus.select(
            F.col(corpus_id).alias("__nid"),
            F.col(lat).alias("__nlat"),
            F.col(lon).alias("__nlon"),
        )
        pairs = remaining.crossJoin(F.broadcast(c.limit(1_000_000)))
        if exclude_self:
            pairs = pairs.filter(F.col(query_id) != F.col("__nid"))
        pairs = pairs.withColumn(
            "dist_km",
            haversine_km(F.col(lat), F.col(lon), F.col("__nlat"), F.col("__nlon")),
        )
        w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col("__nid").asc())
        results.append(
            pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col(query_id), F.col("__nid").alias("neighbor_id"), "dist_km", "rank")
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def knn_join_simple(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "id",
    corpus_id: str = "id",
    lat: str = "lat",
    lon: str = "lon",
    res: int = 6,
    k_ring: int = 2,
    exclude_self: bool = True,
) -> DataFrame:
    """Single-pass variant (no expansion loop): exact within the ring,
    callers choose res/k_ring from known density. This is the
    oracle-checkable form — one deterministic plan, no data-dependent
    control flow."""
    cand = knn_candidates(queries, corpus, query_id, corpus_id, k_ring, res, lat, lon)
    if exclude_self:
        cand = cand.filter(F.col(query_id) != F.col("__nid"))
    w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col("__nid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(query_id), F.col("__nid").alias("neighbor_id"), "dist_km", "rank")
    )
