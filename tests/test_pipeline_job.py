"""e2e smoke for jobs/run_pipeline.py --zorder: the layout leaf stages
publish a clustered snapshot + manifest, the sample box-prune skips
files, and --resume reproduces the identical prune report without
recomputing. Subprocess because the job owns its SparkSession."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(ckpt, extra):
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="4",
               SPARK_GRAFT_DRIVER_MEM="4g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_pipeline.py"),
         "--pages", "3000", "--checkpoint-root", ckpt, *extra],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    stages = [ln for ln in out.stdout.splitlines() if ln.startswith("[stage")]
    return json.loads(lines[-1]), stages


def test_pipeline_zorder_leg_and_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    first, _ = _run(ckpt, ["--zorder", "--publish-snapshot"])
    prune = first["layout_prune"]
    # the NYC mega-cell box must exclude most curve-segment files
    assert prune["files_read"] < prune["files_total"], prune
    assert prune["files_total"] >= 8

    # snapshot files are z-sorted (the property compaction must preserve)
    layout_dir = os.path.join(ckpt, "layout")
    parts = [f for f in os.listdir(layout_dir)
             if f.endswith(".parquet") and not f.startswith(("_", "."))]
    assert parts
    for f in parts:
        zv = pq.read_table(os.path.join(layout_dir, f), columns=["zval"])[
            "zval"
        ].to_numpy()
        assert (np.diff(zv) >= 0).all(), f

    # snapshot publish: v1 committed, manifest lists real live files
    assert first["published_version"] == 1
    pub = os.path.join(ckpt, "published", "features")
    m1 = json.load(open(os.path.join(pub, "_log", "v00000001.json")))
    assert m1["operation"] == "create" and m1["data_files"]
    v1 = pq.read_table([p.removeprefix("file:") for p in m1["data_files"]])

    second, stages = _run(ckpt, ["--zorder", "--resume", "--publish-snapshot"])
    assert second["layout_prune"] == prune
    assert stages and all(
        "resumed=True" in s for s in stages if not s.startswith("[stage publish")
    )
    # re-publish on resume = one new atomic VERSION, identical content
    # (same resumed features snapshot), v1 still readable (time travel)
    assert second["published_version"] == 2
    m2 = json.load(open(os.path.join(pub, "_log", "v00000002.json")))
    assert m2["operation"] == "overwrite"
    assert set(m2["data_files"]).isdisjoint(m1["data_files"])
    v2 = pq.read_table([p.removeprefix("file:") for p in m2["data_files"]])
    assert sorted(
        tuple(r.items()) for r in v1.to_pylist()
    ) == sorted(tuple(r.items()) for r in v2.to_pylist())


def test_pipeline_resume_with_changed_params_rebuilds(tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    _run(ckpt, [])
    # same params resume: everything reuses
    _, stages = _run(ckpt, ["--resume"])
    assert all("resumed=True" in s for s in stages)
    # changed --res on --resume: pre-fix, tile/pip snapshots keyed at the
    # OLD resolution were silently reused against new-res covers
    _, stages = _run(ckpt, ["--resume", "--res", "11"])
    by_name = {s.split()[1].rstrip("]"): s for s in stages}
    assert "resumed=True" in by_name["ingest"]   # upstream of divergence
    assert "resumed=True" in by_name["geotag"]
    assert "resumed=False" in by_name["tile"]    # divergent stage onward
    assert "resumed=False" in by_name["pip"]
    assert "resumed=False" in by_name["curate"]
