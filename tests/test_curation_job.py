"""e2e smoke for jobs/run_curation.py: fresh run then --resume, invariant
counts, all-stages-skipped on resume. Subprocess because the job owns its
SparkSession lifecycle (main() stops it)."""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(ckpt, extra, expect_rc=0):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_curation.py"),
         "--docs", "1500", "--checkpoint-root", ckpt, *extra],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == expect_rc, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    stages = [ln for ln in out.stdout.splitlines() if ln.startswith("[stage")]
    return (json.loads(lines[-1]) if lines else None), stages


def test_curation_job_end_to_end_and_resume(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    first, _ = _run(ckpt, [])
    assert first["docs_in"] == 1500
    # each funnel stage can only shrink the doc set
    assert (
        first["docs_in"]
        >= first["docs_after_dedup"]
        >= first["docs_after_decontam"]
        >= first["docs_mixed"]
        > 0
    )
    assert first["chunks"] >= first["docs_mixed"]  # >=1 chunk per doc
    assert first["packs"] > 0
    assert 0.5 <= first["pack_utilization"] <= 1.0
    assert os.path.exists(first["metrics"])

    second, stages = _run(ckpt, ["--resume"])
    # resume must reproduce the exact same numbers without recomputing
    assert {k: v for k, v in second.items() if k not in ("seconds",)} == {
        k: v for k, v in first.items() if k not in ("seconds",)
    }
    assert stages and all("resumed=True" in s for s in stages)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_lm_filter_stage_optional(tmp_path):
    """--lm-filter-quantile adds the lmfilter stage and actually drops the
    high-xent tail; default runs keep the pinned 7-stage shape."""
    import json
    import subprocess
    import sys
    import os

    root = str(tmp_path / "ckpt")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "run_curation.py"),
            "--docs", "3000",
            "--checkpoint-root", root,
            "--lm-filter-quantile", "0.9",
        ],
        env={**os.environ, "PYTHONPATH": REPO, "SPARK_GRAFT_CPUS": "4"},
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    man = json.load(open(os.path.join(root, "_manifest.json")))
    stages = man["stages"]
    assert "lmfilter" in stages
    kept, before = stages["lmfilter"]["rows"], stages["decontam"]["rows"]
    assert kept < before                     # the tail was dropped
    assert kept >= int(before * 0.85)        # ~quantile-sized cut, not a purge


def test_dsir_stage_optional(tmp_path):
    """--dsir-frac adds the dsir stage; output = seed slice + top fraction
    of the rest, strictly smaller than the decontam output but never
    empty."""
    ckpt = str(tmp_path / "ckpt_dsir")
    summary, stages = _run(ckpt, ["--dsir-frac", "0.5"])
    assert any("[stage dsir]" in s for s in stages)
    assert 0 < summary["docs_mixed"] <= summary["docs_after_decontam"]
    dsir_rows = next(
        int(s.split("rows=")[1].split()[0]) for s in stages if "stage dsir" in s
    )
    decon_rows = next(
        int(s.split("rows=")[1].split()[0])
        for s in stages
        if "stage decontam" in s
    )
    assert 0 < dsir_rows < decon_rows


def test_classifier_filter_stage_optional(tmp_path):
    """--classifier-filter adds the clsfilter stage: a quality-
    bootstrapped linear gate that keeps a non-empty strict subset."""
    ckpt = str(tmp_path / "ckpt_cls")
    summary, stages = _run(ckpt, ["--classifier-filter"])
    assert any("[stage clsfilter]" in s for s in stages)
    cls_rows = next(
        int(s.split("rows=")[1].split()[0])
        for s in stages
        if "stage clsfilter" in s
    )
    decon_rows = next(
        int(s.split("rows=")[1].split()[0])
        for s in stages
        if "stage decontam" in s
    )
    assert 0 < cls_rows < decon_rows
    assert 0 < summary["docs_mixed"] <= cls_rows


def test_span_scrub_stage_optional(tmp_path):
    """--span-scrub-w adds the spanscrub stage: doc count unchanged vs
    dedup, but shared spans were cut (summary still self-consistent)."""
    ckpt = str(tmp_path / "ckpt_span")
    summary, stages = _run(ckpt, ["--span-scrub-w", "6"])
    rows = {
        s.split("]")[0].split()[-1]: int(s.split("rows=")[1].split()[0])
        for s in stages
    }
    assert rows["spanscrub"] == rows["dedup"]  # scrub never drops docs
    assert 0 < summary["docs_mixed"] <= rows["spanscrub"]
    assert summary["packs"] > 0


def test_all_optional_stages_compose(tmp_path):
    """All four optional stages in one run: each appears, the funnel
    stays monotone through the drop stages, spanscrub conserves docs."""
    ckpt = str(tmp_path / "ckpt_all")
    summary, stages = _run(
        ckpt,
        ["--span-scrub-w", "6", "--lm-filter-quantile", "0.9",
         "--dsir-frac", "0.5", "--classifier-filter"],
    )
    rows = {
        s.split("]")[0].split()[-1]: int(s.split("rows=")[1].split()[0])
        for s in stages
    }
    for st in ("spanscrub", "lmfilter", "dsir", "clsfilter"):
        assert st in rows, stages
    assert rows["spanscrub"] == rows["dedup"]
    assert (
        rows["decontam"]
        >= rows["lmfilter"]
        >= rows["dsir"]
        >= rows["clsfilter"]
        > 0
    )
    assert 0 < summary["docs_mixed"] <= rows["clsfilter"]
    assert summary["packs"] > 0


def test_resume_with_new_stage_invalidates_downstream(tmp_path):
    """Enabling an optional stage on --resume must rebuild everything
    downstream of it — resuming pre-change snapshots would silently
    ignore the newly requested stage."""
    ckpt = str(tmp_path / "ckpt_cascade")
    _run(ckpt, [])  # plain 7-stage run
    summary, stages = _run(ckpt, ["--resume", "--span-scrub-w", "6"])
    resumed = {
        s.split("]")[0].split()[-1]: "resumed=True" in s for s in stages
    }
    # stages upstream of the new one resume; the new stage and everything
    # after it rebuild
    assert resumed["corpus"] and resumed["scrub"] and resumed["dedup"]
    assert not resumed["spanscrub"]
    for st in ("decontam", "mix", "chunks", "pack"):
        assert not resumed[st], stages
    assert summary["packs"] > 0


def _resumed_map(stages):
    return {s.split("]")[0].split()[-1]: "resumed=True" in s for s in stages}


def test_resume_with_reparameterized_stage_invalidates(tmp_path):
    """Changing an optional stage's PARAMETER on --resume must rebuild that
    stage and everything downstream — stage identity is (name, params) in
    the manifest chain, not name alone (ADVICE r2 #1)."""
    ckpt = str(tmp_path / "ckpt_reparam")
    _run(ckpt, ["--span-scrub-w", "6"])
    summary, stages = _run(ckpt, ["--resume", "--span-scrub-w", "8"])
    resumed = _resumed_map(stages)
    assert resumed["corpus"] and resumed["scrub"] and resumed["dedup"]
    for st in ("spanscrub", "decontam", "mix", "chunks", "pack"):
        assert not resumed[st], stages
    assert summary["packs"] > 0


def test_resume_with_disabled_stage_invalidates(tmp_path):
    """Disabling a previously-enabled optional stage on --resume must
    rebuild everything downstream of its old position — resuming those
    snapshots would silently keep the disabled stage's effect. The final
    summary must equal a from-scratch run without the stage."""
    ckpt = str(tmp_path / "ckpt_disable")
    _run(ckpt, ["--span-scrub-w", "6"])
    resumed_summary, stages = _run(ckpt, ["--resume"])
    resumed = _resumed_map(stages)
    assert "spanscrub" not in resumed
    assert resumed["corpus"] and resumed["scrub"] and resumed["dedup"]
    for st in ("decontam", "mix", "chunks", "pack"):
        assert not resumed[st], stages

    fresh_ckpt = str(tmp_path / "ckpt_fresh")
    fresh_summary, _ = _run(fresh_ckpt, [])
    drop = ("seconds", "metrics")
    assert {k: v for k, v in resumed_summary.items() if k not in drop} == {
        k: v for k, v in fresh_summary.items() if k not in drop
    }


def test_crash_then_resume_with_added_stage_matches_scratch(tmp_path):
    """Fault injection (VERDICT r2 item #6): crash right after the dedup
    stage commits, then --resume with a newly-enabled optional stage.
    Committed upstream stages resume; the new stage and all downstream
    rebuild; the final summary equals a from-scratch run with the same
    chain."""
    ckpt = str(tmp_path / "ckpt_crash")
    summary, stages = _run(ckpt, ["--fail-after", "dedup"], expect_rc=3)
    assert summary is None  # crashed before the summary line
    assert [s.split("]")[0].split()[-1] for s in stages] == [
        "corpus", "scrub", "dedup",
    ]

    resumed_summary, stages = _run(
        ckpt, ["--resume", "--span-scrub-w", "6"]
    )
    resumed = _resumed_map(stages)
    assert resumed["corpus"] and resumed["scrub"] and resumed["dedup"]
    for st in ("spanscrub", "decontam", "mix", "chunks", "pack"):
        assert not resumed[st], stages

    fresh_ckpt = str(tmp_path / "ckpt_crash_fresh")
    fresh_summary, _ = _run(fresh_ckpt, ["--span-scrub-w", "6"])
    drop = ("seconds", "metrics")
    assert {k: v for k, v in resumed_summary.items() if k not in drop} == {
        k: v for k, v in fresh_summary.items() if k not in drop
    }
