"""Connected components over near-duplicate pair graphs.

Dedup pipelines emit *pairs* (MinHash/SimHash/cosine); deduplication
needs *clusters* (every transitively-connected doc under one canonical
id). This is the alternating large-star / small-star iteration from
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14)
expressed in DataFrame ops — each round is two self-joins + aggregations,
state is one (node, label) table, and convergence is checked with a
single count. For duplicate graphs (small diameter) it converges in a
handful of rounds; no driver-side graph ever materializes.

Simplified here to the classic "hash-to-min" label propagation: each
round every node adopts the min label in its neighborhood (including via
reverse edges); rounds double the reach, so O(log diameter) iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id reachable. Deterministic, partitioning-independent."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        # propagate: every node adopts min(own label, neighbors' labels)
        neigh = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("src", "node")
        )
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        # localCheckpoint truncates lineage — without it each round's plan
        # embeds every previous round and Catalyst planning time explodes
        # exponentially (the standard iterative-algorithm failure mode).
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
        # label shortcut (pointer jumping): relabel via the label's label,
        # which doubles convergence speed on chains
        lab2 = labels.select(
            F.col("node").alias("label"), F.col("label").alias("label2")
        )
        labels = (
            labels.join(lab2, "label", "left")
            .select(
                "node", F.least(F.col("label"), F.coalesce("label2", "label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels.withColumnRenamed("label", "component")


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full dedup resolution: every row keeps ``keeper_id`` = the min id
    of its near-duplicate cluster (itself when unpaired)."""
    comp = connected_components(pairs, id_a, id_b)
    return (
        df.join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .withColumn("keeper_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )
