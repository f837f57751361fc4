"""Incremental view maintenance: keep a per-key rollup of a snapshot
table fresh in O(changed bytes), never a source rescan.

The 100 TB problem: a corpus table takes appends/deletes continuously;
every downstream consumer wants "per-host doc counts", "per-source token
sums" — and recomputing GROUP BY over 100 TB per refresh is the cost
disaster incremental consumption exists to avoid. COUNT and SUM are
self-maintainable aggregates (Gupta & Mumick, "Maintenance of
Materialized Views", IEEE Data Eng. Bull. 1995): an insert contributes
+1/+x, a delete -1/-x, so the refresh is

    read_changes(source, last_applied, latest)   # delta files only
      -> signed per-key aggregation                # one small shuffle
      -> outer-merge into the rollup               # O(|rollup|)
      -> one atomic commit on the rollup table

Exactly-once across crashes and re-runs comes from the snapshot log's
txn tokens (the same mechanism streaming/snapshot_sink.py uses): the
rollup table's manifest records the highest SOURCE version applied
under this view's app-id, the commit is skipped if that version was
already applied, and the next refresh resumes from the recorded
version. A crash between computing the merge and committing it
re-reads the same delta — idempotent by construction.

MIN/MAX are deliberately absent: they are NOT self-maintainable under
deletes (losing the current minimum requires rescanning the group) —
callers needing them rebuild with ``full_refresh=True`` or keep a
sketch (operators/sketches.py) and accept approximation.

Cost model at scale: refresh reads only files committed since the last
refresh plus the delete vectors' named files; the merge is bounded by
the ROLLUP's cardinality (keys), not the source's row count; the write
is one overwrite commit of the rollup. A rollup whose key cardinality
approaches the source row count is not a rollup — use the source.

Source-range refusals (an overwrite/rollback commit in the source
range, or an expired manifest) surface as a loud error unless
``full_refresh_on_gap=True``, which falls back to one full GROUP BY of
the CURRENT source snapshot — correct at any time because COUNT/SUM
over the visible rows is exactly what the increments maintain.

No reference analogue: the reference re-CREATEs its warehouse tables
wholesale per run (woodgilber/GeoCore modeling/datasets/base.py CTAS);
this is the engine-owned incremental alternative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geocore_spark.sources import snapshots as snap

_N_ROWS = "n_rows"


def _signed_rollup(ch: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    aggs = [F.sum(sign).cast("long").alias(_N_ROWS)]
    for out, src in sums.items():
        aggs.append(
            F.sum(sign.cast("long") * F.col(src).cast("long")).alias(out)
        )
    return ch.groupBy(*keys).agg(*aggs)


def _full_rollup(cur: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias(_N_ROWS)]
    for out, src in sums.items():
        aggs.append(F.sum(F.col(src).cast("long")).alias(out))
    return cur.groupBy(*keys).agg(*aggs)


def refresh_rollup(
    spark: SparkSession,
    source_root: str,
    rollup_root: str,
    keys: list[str],
    sums: dict[str, str] | None = None,
    view_id: str | None = None,
    full_refresh_on_gap: bool = False,
) -> dict:
    """Bring the rollup table at ``rollup_root`` up to the source's
    latest version. Maintains ``n_rows`` (count) plus one BIGINT sum per
    ``sums`` entry (``out_col -> source_col`` — integer-typed source
    columns only: integer micro-units keep the increments exact and
    order-independent, the engine's standard oracle-parity move; for
    doubles, scale to units upstream). Keys with count 0 disappear.

    Returns ``{"applied_from": v, "applied_to": v', "mode":
    "incremental" | "full" | "noop"}``. ``view_id`` scopes the
    exactly-once token (default derived from keys+sums); two different
    rollups of one source use two ids and never interfere.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    sums = dict(sums or {})
    bad = {_N_ROWS} & (set(sums) | set(keys))
    if bad:
        raise ValueError(f"{sorted(bad)} collides with the maintained count column")
    app = view_id or ("ivm:" + ",".join(keys) + ";" + ",".join(sorted(sums)))
    src_latest = snap.latest_version(spark, source_root)
    if src_latest is None:
        raise snap.NoSuchVersion(f"no committed snapshot at {source_root}")

    # ONE manifest load supplies both the applied-version token and the
    # version whose content we merge into: reading the token from one
    # manifest and the content from a later one (a concurrent refresh of
    # this view committing in between) would re-apply changes that
    # content already contains — double-counting them
    rollup_version = snap.latest_version(spark, rollup_root)
    exists = rollup_version is not None
    last = 0
    if exists:
        last = (
            snap.load_manifest(spark, rollup_root, rollup_version)
            .get("txns", {})
            .get(app, 0)
        )
        if last == 0:
            # merging "all changes since v0" into a table with existing
            # content would double-count it — this root is either another
            # view's rollup or wasn't built by refresh_rollup
            raise ValueError(
                f"{rollup_root} exists but has no applied-version token for "
                f"view {app!r} — wrong rollup table or different view_id; "
                "use a fresh rollup_root"
            )
    if last == src_latest:
        return {"applied_from": last, "applied_to": last, "mode": "noop"}
    if last > src_latest:
        raise ValueError(
            f"rollup is ahead of the source (applied v{last}, source at "
            f"v{src_latest}) — the source log was truncated or replaced; "
            "rebuild with a fresh rollup_root"
        )

    mode = "incremental"
    try:
        ch = snap.read_changes(spark, source_root, last, src_latest)
        delta = _signed_rollup(ch, keys, sums)
        if exists:
            cur = snap.read_snapshot(spark, rollup_root, rollup_version)
            cols = [_N_ROWS, *sums]
            merged = cur.join(delta, on=keys, how="full_outer").select(
                *keys,
                *[
                    (
                        F.coalesce(cur[c], F.lit(0)) + F.coalesce(delta[c], F.lit(0))
                    ).alias(c)
                    for c in cols
                ],
            )
        else:
            merged = delta
        out = merged.filter(F.col(_N_ROWS) != 0)
    except (ValueError, snap.NoSuchVersion):
        if not full_refresh_on_gap:
            raise
        # overwrite/rollback in range, or expired manifests: recompute
        # from the CURRENT snapshot — exactly the state the increments
        # would have maintained
        mode = "full"
        out = _full_rollup(
            snap.read_snapshot(spark, source_root, src_latest), keys, sums
        )

    txn = (app, src_latest)
    if not exists:
        try:
            snap.create_table(spark, rollup_root, out, txn=txn)
        except ValueError:
            # lost the create race to a concurrent refresh of this view:
            # fall through to the token-guarded overwrite (a no-op if
            # that refresh already applied this source version)
            if snap.latest_version(spark, rollup_root) is None:
                raise
            snap.overwrite(spark, rollup_root, out, txn=txn)
    else:
        snap.overwrite(spark, rollup_root, out, txn=txn)
    return {"applied_from": last, "applied_to": src_latest, "mode": mode}
