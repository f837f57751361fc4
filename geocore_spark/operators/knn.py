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

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geocore_spark.functions import tiling as tl
from geocore_spark.functions.geodesy import haversine_km

_LOG = logging.getLogger(__name__)

# per-round persisted top-k frames, keyed by applicationId (the bounded
# registry pattern of operators/metrics.py): each knn_join call releases
# the previous call's frames, so repeated gate/bench runs in one context
# never accumulate input-sized caches
_LIVE: dict[str, list] = {}


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
    candidate distance <= the ring's guaranteed-covered radius AT THE
    QUERY'S LATITUDE — the covered radius shrinks with cos(lat) because
    longitude cells narrow (a blanket factor like the old 0.45 is WRONG
    above ~63 deg: cos(66) = 0.407 < 0.45, so polar queries converged
    with unverified neighbors). Queries failing the guard re-join with a
    doubled ring (up to ``max_expansions``); whatever still remains goes
    to the exact brute-force fallback, so high latitudes stay exact, just
    via the slower path. Ties broken by neighbor id for determinism
    (matches the SQL oracle).
    """
    app = queries.sparkSession.sparkContext.applicationId
    for kk in list(_LIVE):
        if kk != app:  # stopped contexts: their JVM cache died with them
            _LIVE.pop(kk)
    for old in _LIVE.setdefault(app, []):
        old.unpersist()
    _LIVE[app] = []
    remaining = queries
    results = []
    ring = k_ring
    for _ in range(max_expansions):
        cand = knn_candidates(remaining, corpus, query_id, corpus_id, ring, res, lat, lon)
        if exclude_self:
            cand = cand.filter(F.col(query_id) != F.col("__nid"))
        w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col("__nid").asc())
        # persisted: referenced by counts, the results join AND (via
        # done_ids) the next round's anti-join — unpersisted, round i
        # re-executes every previous round's candidate join; released
        # on the next knn_join call in this context (bounded registry)
        topk = cand.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        ).persist()
        _LIVE[app].append(topk)
        # guaranteed covered radius at this query's latitude: ring *
        # edge, shrunk by cos of the worst-case |lat| inside the disk
        edge_deg = tl.edge_deg(res)
        edge_km = edge_deg * 111.195
        worst_lat = F.least(F.abs(F.col("__qlat")) + F.lit(ring * edge_deg), F.lit(90.0))
        safe_km = F.lit(ring * edge_km) * F.cos(F.radians(worst_lat))
        counts = topk.groupBy(query_id).agg(
            F.count("*").alias("__n"),
            F.max("dist_km").alias("__maxd"),
            F.max(F.abs(F.col(lat))).alias("__qlat"),
        )
        done_ids = counts.filter(
            (F.col("__n") >= k) & (F.col("__maxd") <= safe_km)
        ).select(query_id)
        # no broadcast hint: done_ids scales with |queries| (most
        # converge round 1) — a forced broadcast is a driver OOM at
        # scale; AQE picks the strategy from actual sizes
        results.append(
            topk.join(done_ids, query_id, "inner").select(
                F.col(query_id), F.col("__nid").alias("neighbor_id"), "dist_km", "rank"
            )
        )
        remaining = remaining.join(done_ids, query_id, "left_anti")
        ring *= 2
        if not remaining.take(1):
            remaining = None
            break
    if remaining is not None and remaining.take(1):
        results.append(
            _brute_force_stragglers(
                remaining, corpus, k, query_id, corpus_id, lat, lon, exclude_self
            )
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def _brute_force_stragglers(
    remaining: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str,
    corpus_id: str,
    lat: str,
    lon: str,
    exclude_self: bool,
    max_stragglers: int = 100_000,
) -> DataFrame:
    """Exact distributed fallback for queries whose ring expansion exhausted
    ``max_expansions`` — correct for ANY corpus size (the round-1 version
    silently capped the corpus at 1M rows; VERDICT.md "What's wrong" #2).

    Shape: collect the straggler coordinates (few by construction; hard-bounded
    by ``max_stragglers`` with a loud error, never a silent cap), broadcast
    them into a per-corpus-partition numpy prune (mapInPandas). The prune
    ACCUMULATES a running top-(k+4) per straggler across every Arrow batch
    of the partition and emits once at iterator end — the candidate count
    is therefore truly bounded by partitions * |S| * (k+4), independent of
    Arrow batch size. Candidates carry their corpus coordinates out of the
    prune, so the tail is: join the (tiny, broadcast) straggler coords,
    re-rank with the SAME Column haversine as the main path (bit-identical
    distances), window top-k. The corpus is never re-joined and nothing
    unbounded is broadcast or collected. The k+4 pad absorbs <=1e-12
    numpy-vs-codegen drift at the cut so no true top-k member is evicted.
    """
    import numpy as np
    import pandas as pd

    strag = remaining.select(query_id, lat, lon).collect()
    n_s = len(strag)
    if n_s > max_stragglers:
        raise ValueError(
            f"knn_join: {n_s} straggler queries exceed max_stragglers="
            f"{max_stragglers}; raise max_expansions, k_ring, or coarsen res "
            "so ring expansion converges instead of brute-forcing."
        )
    _LOG.warning(
        "knn_join: ring expansion exhausted for %d queries; engaging "
        "distributed brute-force fallback over the full corpus", n_s,
    )
    q_ids = np.array([r[0] for r in strag])
    q_lat = np.radians(np.array([r[1] for r in strag], dtype="float64"))
    q_lon = np.radians(np.array([r[2] for r in strag], dtype="float64"))
    keep = k + 4

    c = corpus.select(
        F.col(corpus_id).alias("__nid"),
        F.col(lat).alias("__nlat"),
        F.col(lon).alias("__nlon"),
    )

    def _prune(batches):
        # running top-keep per straggler, merged across EVERY batch of this
        # partition — emitted once at the end, so the per-partition output
        # is |S| * keep rows regardless of Arrow batch size
        best_d = np.full((n_s, keep), np.inf)
        best_n = np.empty((n_s, keep), dtype=object)
        best_lat = np.full((n_s, keep), np.nan)
        best_lon = np.full((n_s, keep), np.nan)
        for pdf in batches:
            if not len(pdf):
                continue
            c_lat = np.radians(pdf["__nlat"].to_numpy(dtype="float64"))
            c_lon = np.radians(pdf["__nlon"].to_numpy(dtype="float64"))
            nid = pdf["__nid"].to_numpy()
            raw_lat = pdf["__nlat"].to_numpy(dtype="float64")
            raw_lon = pdf["__nlon"].to_numpy(dtype="float64")
            # chunk the straggler axis so the distance matrix stays small
            for s0 in range(0, n_s, 256):
                sl = slice(s0, min(s0 + 256, n_s))
                dlat = q_lat[sl, None] - c_lat[None, :]
                dlon = q_lon[sl, None] - c_lon[None, :]
                a = (
                    np.sin(dlat / 2) ** 2
                    + np.cos(q_lat[sl, None]) * np.cos(c_lat[None, :]) * np.sin(dlon / 2) ** 2
                )
                d = 2.0 * 6371.0088 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))
                kk = min(keep, d.shape[1])
                top = np.argpartition(d, kk - 1, axis=1)[:, :kk]
                # merge batch winners into the running buffer
                cand_d = np.concatenate([best_d[sl], np.take_along_axis(d, top, 1)], axis=1)
                cand_n = np.concatenate([best_n[sl], nid[top]], axis=1)
                cand_la = np.concatenate([best_lat[sl], raw_lat[top]], axis=1)
                cand_lo = np.concatenate([best_lon[sl], raw_lon[top]], axis=1)
                sel = np.argpartition(cand_d, keep - 1, axis=1)[:, :keep]
                best_d[sl] = np.take_along_axis(cand_d, sel, 1)
                best_n[sl] = np.take_along_axis(cand_n, sel, 1)
                best_lat[sl] = np.take_along_axis(cand_la, sel, 1)
                best_lon[sl] = np.take_along_axis(cand_lo, sel, 1)
        mask = np.isfinite(best_d)
        if mask.any():
            qi, ki = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "__qid": q_ids[qi],
                    "__nid": best_n[qi, ki],
                    "__nlat": best_lat[qi, ki],
                    "__nlon": best_lon[qi, ki],
                }
            )

    qid_type = remaining.schema[query_id].dataType.simpleString()
    nid_type = corpus.schema[corpus_id].dataType.simpleString()
    cands = c.mapInPandas(
        _prune, f"__qid {qid_type}, __nid {nid_type}, __nlat double, __nlon double"
    )
    # candidates carry their corpus coords; only the straggler coords (tiny)
    # are broadcast, then the exact Column haversine re-ranks — bit-identical
    # distances to the ring path, no corpus re-join, nothing unbounded moves.
    pairs = cands.join(
        F.broadcast(
            remaining.select(
                F.col(query_id), F.col(lat).alias("__qlat"), F.col(lon).alias("__qlon")
            )
        ),
        cands["__qid"] == F.col(query_id),
        "inner",
    ).withColumn(
        "dist_km",
        haversine_km(F.col("__qlat"), F.col("__qlon"), F.col("__nlat"), F.col("__nlon")),
    )
    if exclude_self:
        pairs = pairs.filter(F.col(query_id) != F.col("__nid"))
    w = Window.partitionBy(query_id).orderBy(F.col("dist_km").asc(), F.col("__nid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(query_id), F.col("__nid").alias("neighbor_id"), "dist_km", "rank")
    )


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
