"""Exactly-once streaming sink into a snapshot table.

Structured Streaming's file sink is append-only parquet with its own
sidecar log; writing into a snapshot table (sources/snapshots.py)
through ``foreachBatch`` instead gets atomic visibility, MoR deletes,
compaction and time travel on the streamed data — IF the batch write is
idempotent, because foreachBatch is only at-least-once: after a sink
write that succeeds but a checkpoint commit that doesn't (crash between
the two), the restarted query re-delivers the same batch id.

The idempotence comes from the snapshot log's transaction tokens (the
public Delta ``txnAppId``/``txnVersion`` technique): every commit
records the highest batch id committed per producer app, the append
re-checks the token on every optimistic-commit attempt, and a
re-delivered batch becomes a no-op instead of duplicate rows. Combined
with the commit protocol's atomic manifest rename, the pipeline is
exactly-once end to end: offsets tracked by the checkpoint, visibility
by the manifest, retries absorbed by the token.

Usage::

    sink = snapshot_append_sink("/lake/events_table", app_id="ingest-1")
    (stream.writeStream.foreachBatch(sink)
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())

``app_id`` must be stable across restarts of the same logical pipeline
(it scopes the batch-id sequence); two different pipelines appending to
one table use two app_ids and interleave safely.

Scale: each micro-batch is one append commit — O(batch) data written,
one manifest rename; table maintenance (compaction of small per-batch
files) is the existing rewrite_files/expire_snapshots path, safe to run
between batches because commits are atomic and rewrite conflicts fail
loudly rather than corrupt.

Reference analogue: the reference's warehouse gets streaming ingest +
snapshot isolation from Snowpipe/Snowflake (woodgilber/GeoCore
modeling/datasets/base.py warehouse tables); here the engine owns both.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def snapshot_append_sink(root: str, app_id: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch callable appending each micro-batch to the snapshot
    table at ``root`` exactly once (idempotent under batch re-delivery).
    The first batch creates the table with the stream's schema."""
    if not app_id:
        raise ValueError("app_id must be a non-empty, restart-stable string")

    def write_batch(df: DataFrame, batch_id: int) -> None:
        from geocore_spark.sources import snapshots as snap

        spark = df.sparkSession
        if snap.latest_version(spark, root) is None:
            try:
                snap.create_table(spark, root, df, txn=(app_id, batch_id))
                return
            except ValueError:
                # lost the create race to a concurrent writer -> append;
                # any OTHER ValueError (e.g. reserved column names) must
                # surface, not be masked into a confusing NoSuchVersion
                if snap.latest_version(spark, root) is None:
                    raise
        snap.append(spark, root, df, txn=(app_id, batch_id))

    return write_batch


def snapshot_merge_sink(
    root: str,
    keys: list[str],
    app_id: str,
    order_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch callable that MERGEs each micro-batch into the
    snapshot table at ``root`` exactly once — the CDC-apply / streaming-
    upsert sink: a stream of keyed records (recrawled pages by url,
    refreshed features by id, change events by primary key) lands as
    merge-on-read upserts (sources/snapshots.merge_into), so the table
    always holds the LATEST row per key, with zero file rewrites per
    batch and atomic per-batch visibility.

    ``order_col``: a CDC batch may carry several versions of one key;
    when given, only the row with the highest ``order_col`` per key
    survives (ties broken arbitrarily — use a total order per key, e.g.
    an LSN or event timestamp, for deterministic replay). Without it, a
    duplicate-keyed batch raises (merge_into's uniqueness gate).

    Exactly-once: same txn-token mechanism as :func:`snapshot_append_sink`
    — a re-delivered batch id is a committed-token no-op. merge_into is
    non-rebaseable, so a TRULY concurrent writer on the same table makes
    the batch fail loudly and the stream retry; one logical pipeline per
    table (plus maintenance between batches) is the supported shape.

    The first batch creates the table (after the per-key dedupe)."""
    if not app_id:
        raise ValueError("app_id must be a non-empty, restart-stable string")
    if not keys:
        raise ValueError("keys must be non-empty")

    def write_batch(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from geocore_spark.sources import snapshots as snap

        spark = df.sparkSession
        if order_col is not None:
            w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
            df = (
                df.withColumn("_gc_rn", F.row_number().over(w))
                .filter(F.col("_gc_rn") == 1)
                .drop("_gc_rn")
            )
        if snap.latest_version(spark, root) is None:
            try:
                snap.create_table(spark, root, df, txn=(app_id, batch_id))
                return
            except ValueError:
                if snap.latest_version(spark, root) is None:
                    raise
        snap.merge_into(spark, root, df, keys, txn=(app_id, batch_id))

    return write_batch
