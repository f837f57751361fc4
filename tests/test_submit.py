"""Prove the documented spark-submit --py-files deployment actually works.

Copies the job file OUT of the repo and strips PYTHONPATH, so the only
way ``geocore_spark`` can resolve is from engine.zip via --py-files —
exactly how a multi-executor cluster would receive the code. Also pins
that session.get_spark defers to spark-submit's --master instead of
hijacking it with local[N] (the PYSPARK_GATEWAY_PORT guard).
"""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_runs_pipeline(tmp_path):
    from tools.make_submit_zip import build

    zip_path = build(str(tmp_path / "engine.zip"))
    job = tmp_path / "run_pipeline.py"
    shutil.copy(os.path.join(REPO, "jobs", "run_pipeline.py"), job)
    ckpt = tmp_path / "ckpt"

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(job),
            "--pages", "2000",
            "--checkpoint-root", str(ckpt),
        ],
        env=env,
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    metrics = json.load(open(ckpt / "metrics.json"))
    stages = {m["stage"] for m in metrics["stages"]}
    assert {"ingest", "geotag", "tile", "pip", "features", "curate"} <= stages
    # the submit-provided master must have survived get_spark (local[2],
    # not the local[32] default the env var fallback would have forced)
    assert "local[32]" not in proc.stderr