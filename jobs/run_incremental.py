"""Incremental corpus maintenance as a spark-submit job — the lakehouse
lifecycle the snapshot layer exists for, end to end:

    zip -r engine.zip geocore_spark
    spark-submit --py-files engine.zip jobs/run_incremental.py \
        --root /tmp/geocore_lake --days 7 --urls-per-day 20000

Each simulated crawl day lands ONE merge-on-read commit and maintains a
materialized rollup incrementally:

  per day d:
    1. ingest   : merge_into the day's batch (new urls + recrawls of
                  older urls with refreshed token counts) keyed by url —
                  matched rows tombstoned via positional vectors, batch
                  appended, ZERO files rewritten, one atomic commit
    2. rollup   : ivm.refresh_rollup keeps the per-host (n_rows,
                  sum_tokens) table current from the CHANGE FEED —
                  O(changed bytes), never a corpus rescan
    3. compact  : every --compact-every days, bin-pack the small per-day
                  files (delete vectors applied during the rewrite)
  at the end:
    4. erase    : (optional, --erase-host H) keyed right-to-erasure —
                  every url of host H tombstoned in ONE delete_by_key
                  commit through the Bloom-pruned victim scan (a fresh
                  per-url sidecar, so only files actually holding the
                  host's urls are scanned), then the rollup refreshed
                  from the change feed (the erased host's count reaches
                  0 and the row disappears)
    5. expire   : drop all but --keep-last versions + unreferenced files

Resume story: the whole loop is IDEMPOTENT, not checkpointed — each
day's merge carries txn token ("ingest", day), so a crashed or repeated
run re-issues every day and the already-committed ones skip at the
manifest (the rollup's own token does the same for refreshes). Re-running
the finished job commits nothing. Contrast jobs/run_pipeline.py /
run_curation.py, which resume via stage snapshots (plans/checkpoint.py):
here the TABLE is the checkpoint.

Why this is the 100 TB shape: per day the work is O(day's batch) —
victim semi-join + batch write + vector broadcast at read, rollup
refresh reads only the day's files, compaction touches only small
files. Nothing in the loop ever rescans or rewrites the corpus; the
alternative (daily full rebuild, the reference's CTAS-per-run pattern,
woodgilber/GeoCore modeling/datasets/base.py:74-76) is O(corpus) a day.

The final JSON line reports versions/rows/rollup checks; the
--verify flag recomputes the expected final state from scratch (replay
all batches, keep the last crawl per url) and fails loudly on any
mismatch — the job doubles as its own integration oracle.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def day_batch(spark: SparkSession, day: int, n_new: int) -> DataFrame:
    """Deterministic synthetic crawl for day ``d``: ``n_new`` brand-new
    urls plus a recrawl of every older url whose id % 5 == d % 5 (token
    counts move with the day — content changed)."""
    new = spark.range(day * n_new, (day + 1) * n_new)
    recrawl = spark.range(0, day * n_new).filter(F.col("id") % 5 == day % 5)
    ids = new.unionByName(recrawl)
    return ids.select(
        F.concat(
            F.lit("https://h"),
            (F.col("id") % 97).cast("string"),
            F.lit(".example/p"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 97).cast("string")).alias("host"),
        ((F.col("id") * 31 + day * 17) % 1000 + 1).cast("long").alias("n_tokens"),
        F.lit(day).cast("long").alias("crawl_day"),
    )


def expected_final(spark: SparkSession, days: int, n_new: int) -> DataFrame:
    """From-scratch replay oracle: union every day's batch, keep the last
    crawl per url (crawl_day is strictly increasing per url, so max-day
    row wins — exactly what the daily merges maintain)."""
    from pyspark.sql import Window

    all_days = day_batch(spark, 0, n_new)
    for d in range(1, days):
        all_days = all_days.unionByName(day_batch(spark, d, n_new))
    w = Window.partitionBy("url").orderBy(F.col("crawl_day").desc())
    return (
        all_days.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def main(argv: list[str] | None = None) -> None:
    from geocore_spark.operators import ivm
    from geocore_spark.session import get_spark
    from geocore_spark.sources import snapshots as snap

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="lake root dir (table + rollup)")
    ap.add_argument("--days", type=int, default=7)
    ap.add_argument("--urls-per-day", type=int, default=20_000)
    ap.add_argument("--compact-every", type=int, default=3)
    ap.add_argument(
        "--small-mb", type=int, default=64,
        help="compaction small-file threshold (MiB)",
    )
    ap.add_argument(
        "--keep-last", type=int, default=3,
        help="versions retained by the final expire",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--erase-host", default=None,
        help="after the loop, erase every url of this host via "
        "delete_by_key (Bloom-pruned victim scan); idempotent — a "
        "re-run finds no matching urls and commits nothing",
    )
    ap.add_argument(
        "--verify", action="store_true",
        help="recompute the expected final state from scratch and fail "
        "loudly on any row mismatch (integration-oracle mode)",
    )
    args = ap.parse_args(argv)
    if args.days < 1 or args.urls_per_day < 1:
        raise SystemExit("--days and --urls-per-day must be >= 1")

    spark = get_spark("geocore-incremental", master=args.master)
    t0 = time.time()
    table = args.root.rstrip("/") + "/corpus"
    rollup = args.root.rstrip("/") + "/rollup_host"
    days_merged = 0
    days_skipped = 0
    compactions = 0

    for day in range(args.days):
        batch = day_batch(spark, day, args.urls_per_day)
        if snap.latest_version(spark, table) is None:
            m = snap.create_table(spark, table, batch, txn=("ingest", day))
            stats = {"rows_written": m["rows_changed"], "rows_tombstoned": 0}
        else:
            m, stats = snap.merge_into(
                spark, table, batch, ["url"], txn=("ingest", day)
            )
        if m is None:
            days_skipped += 1
            print(f"[day {day}] already committed — skipped", flush=True)
        else:
            days_merged += 1
            print(
                f"[day {day}] v{m['version']} written={stats['rows_written']} "
                f"tombstoned={stats['rows_tombstoned']}",
                flush=True,
            )
        r = ivm.refresh_rollup(
            spark, table, rollup, ["host"], {"sum_tokens": "n_tokens"},
            view_id="host-rollup",
        )
        print(f"[day {day}] rollup {r['mode']} -> v{r['applied_to']}", flush=True)
        if (day + 1) % args.compact_every == 0:
            rep = snap.compact_snapshot(
                spark, table, small_bytes=args.small_mb << 20
            )
            if rep["files_compacted"]:
                compactions += 1
                print(
                    f"[day {day}] compacted {rep['files_compacted']} -> "
                    f"{rep['files_written']} files (v{rep['version']})",
                    flush=True,
                )

    erasure = None
    if args.erase_host is not None:
        keys = (
            snap.read_snapshot(spark, table)
            .filter(F.col("host") == args.erase_host)
            .select("url")
        )
        blooms = snap.snapshot_file_blooms(spark, table, ["url"])
        m, st = snap.delete_by_key(
            spark, table, keys, "url", key_blooms=blooms
        )
        erasure = dict(st, host=args.erase_host)
        print(
            f"[erase] host={args.erase_host} rows={st['rows_deleted']} "
            f"scanned {st['files_scanned']}/{st['files_total']} files",
            flush=True,
        )
        if m is not None:
            r = ivm.refresh_rollup(
                spark, table, rollup, ["host"], {"sum_tokens": "n_tokens"},
                view_id="host-rollup",
            )
            print(f"[erase] rollup {r['mode']} -> v{r['applied_to']}", flush=True)

    expired = snap.expire_snapshots(spark, table, keep_last=args.keep_last)
    final = snap.read_snapshot(spark, table)
    n_rows = final.count()
    n_hosts = snap.read_snapshot(spark, rollup).count()

    verified = None
    if args.verify:
        expect = expected_final(spark, args.days, args.urls_per_day)
        if args.erase_host is not None:
            expect = expect.filter(F.col("host") != args.erase_host)
        mism = (
            final.select("url", "n_tokens", "crawl_day")
            .exceptAll(expect.select("url", "n_tokens", "crawl_day"))
            .unionAll(
                expect.select("url", "n_tokens", "crawl_day").exceptAll(
                    final.select("url", "n_tokens", "crawl_day")
                )
            )
            .count()
        )
        roll_mism = (
            snap.read_snapshot(spark, rollup)
            .exceptAll(
                final.groupBy("host").agg(
                    F.count(F.lit(1)).cast("long").alias("n_rows"),
                    F.sum("n_tokens").cast("long").alias("sum_tokens"),
                )
            )
            .count()
        )
        verified = {"table_mismatches": mism, "rollup_mismatches": roll_mism}
        if mism or roll_mism:
            print(json.dumps({"verify_failed": verified}), flush=True)
            raise SystemExit("incremental state diverged from the replay oracle")

    summary = {
        "days": args.days,
        "days_merged": days_merged,
        "days_skipped": days_skipped,
        "compactions": compactions,
        "table_version": snap.latest_version(spark, table),
        "rows": n_rows,
        "hosts": n_hosts,
        "erasure": erasure,
        "expired": expired,
        "verified": verified,
        "seconds": round(time.time() - t0, 2),
    }
    print(json.dumps(summary), flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
