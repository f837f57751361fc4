"""e2e smoke for jobs/run_incremental.py: the lakehouse lifecycle — daily
merge-on-read ingest, incremental rollup maintenance, periodic
compaction, expiry — with the job's own replay oracle (--verify) on.

Pins the resume contract that distinguishes this job from the
checkpointed ones: the TABLE is the checkpoint — a full re-run merges
nothing (txn tokens skip every day), and extending --days continues
exactly where the log left off. Subprocess because the job owns its
SparkSession."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(root, days):
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_DRIVER_MEM="4g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_incremental.py"),
         "--root", root, "--days", str(days), "--urls-per-day", "300",
         "--compact-every", "2", "--verify"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def test_incremental_lifecycle_rerun_and_extend(tmp_path):
    root = str(tmp_path / "lake")

    first = _run(root, 4)
    assert first["days_merged"] == 4 and first["days_skipped"] == 0
    assert first["rows"] == 4 * 300  # every url's LAST crawl, once
    assert first["hosts"] == 97
    assert first["compactions"] >= 1
    assert first["verified"] == {"table_mismatches": 0, "rollup_mismatches": 0}
    assert first["expired"]["removed_manifests"] > 0

    # full re-run: the table IS the checkpoint — nothing merges again,
    # content identical, oracle still clean
    again = _run(root, 4)
    assert again["days_merged"] == 0 and again["days_skipped"] == 4
    assert again["rows"] == 4 * 300
    assert again["verified"] == {"table_mismatches": 0, "rollup_mismatches": 0}

    # extension: days 0-3 skip at the manifest, 4-5 land incrementally
    more = _run(root, 6)
    assert more["days_merged"] == 2 and more["days_skipped"] == 4
    assert more["rows"] == 6 * 300
    assert more["verified"] == {"table_mismatches": 0, "rollup_mismatches": 0}


def test_incremental_erasure_stage(tmp_path):
    """--erase-host: one delete_by_key commit removes every url of the
    host through the Bloom-pruned victim scan, the rollup row
    disappears, the replay oracle (--verify, which excludes the host)
    stays green, and a re-run with the same flag erases nothing more."""
    root = str(tmp_path / "lake")
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_DRIVER_MEM="4g")

    def run():
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "jobs", "run_incremental.py"),
             "--root", root, "--days", "3", "--urls-per-day", "300",
             "--compact-every", "2", "--erase-host", "h13", "--verify"],
            capture_output=True, text=True, env=env, timeout=900,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        return json.loads(lines[-1])

    first = run()
    er = first["erasure"]
    assert er["host"] == "h13" and er["rows_deleted"] > 0
    assert er["files_scanned"] <= er["files_total"]
    assert first["hosts"] == 96  # h13's rollup row disappeared
    assert first["verified"] == {
        "table_mismatches": 0, "rollup_mismatches": 0
    }
    # idempotent: the re-run finds no h13 urls left, commits nothing
    second = run()
    assert second["erasure"]["rows_deleted"] == 0
    assert second["days_merged"] == 0
    assert second["rows"] == first["rows"]
