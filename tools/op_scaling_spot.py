"""Pinned 2-vs-8-core scaling spot checks for the retrieval / selection /
semantic-dedup operator family (the session's additions — the established
legs in scaling_bench.py cover flagship/text/curation/graph).

Same methodology as tools/scaling_bench.py: each level runs in a FRESH
subprocess whose whole tree (JVM + Python workers) is `taskset`-pinned to
exactly N cores, one warm pass (JIT/codegen/Arrow spin-up) then best-of-2
timed passes. 2->8 is the predictive pair on this box (8->32 saturates
the single memory bus — see CLAUDE.md).

Inputs are materialized once under /tmp and reused across levels, SIZED
so a 2-core pass lands at ~1-2 min (measured: the cosine ops run on
interpreted higher-order-function lambdas — CLAUDE.md — so embedding
inputs must stay ~20k rows; the token ops tokenize the corpus 3-7x per
pass, so 200k docs is the 2-core sweet spot):
  - 200k generator documents (~16M tokens) for BM25, 100k for DSIR
    (its plan scans the corpus 7x)
  - 20k deterministic 64-dim embeddings for SemDeDup / decontam

Appends one JSON line per run to BENCH/op_spots.jsonl and prints the
markdown rows for SCALE.md's spot-check table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = "/tmp/geocore_spot_docs200k.parquet"
VECS = "/tmp/geocore_spot_vecs20k.parquet"
MEDIA = "/tmp/geocore_spot_media20k.parquet"
PTS = "/tmp/geocore_spot_pts10m.parquet"
SNAP = "/tmp/geocore_spot_snap10m/t"


def _pinned(cpus: int) -> list[str]:
    return ["taskset", "-c", f"0-{cpus - 1}"]


_MATERIALIZE = f"""
import os
import numpy as np, pandas as pd
from geocore_spark.session import get_spark
from geocore_spark.sources import documents as docsrc
spark = get_spark("spot-mat", master="local[8]", shuffle_partitions=8)
if not os.path.exists("{DOCS}"):
    docsrc.documents(spark, 200_000).write.parquet("{DOCS}")
if not os.path.exists("{VECS}"):
    rng = np.random.default_rng(17)
    m = rng.standard_normal((20_000, 64)).astype(np.float32)
    pdf = pd.DataFrame(
        {{"vec_id": np.arange(20_000, dtype=np.int64), "embedding": list(map(list, m))}}
    )
    spark.createDataFrame(pdf).repartition(16).write.parquet("{VECS}")
if not os.path.exists("{MEDIA}"):
    from geocore_spark.operators import multimodal as mm
    ids = spark.range(20_000).withColumnRenamed("id", "doc_id")
    mm.synth_encoded_media(ids, kind="image").repartition(16).write.parquet("{MEDIA}")
if not os.path.exists("{PTS}"):
    from pyspark.sql import functions as F
    from geocore_spark.sources.pages import _lat_expr, _lon_expr
    pts = spark.range(0, 10_000_000, 1, 32).select(
        F.col("id"),
        _lat_expr(F.col("id")).alias("lat"),
        _lon_expr(F.col("id")).alias("lon"),
    )
    pts.write.parquet("{PTS}")
if not os.path.exists("{SNAP}"):
    from pyspark.sql import functions as F
    from geocore_spark.sources import snapshots as snap
    snap.create_table(spark, "{SNAP}", spark.read.parquet("{PTS}"))
    # 10% tombstoned: a deliberately heavy delete-vector load (1M
    # positions, ~ the broadcast ceiling a sane table would carry
    # before rewrite_files materializes)
    snap.delete_where(spark, "{SNAP}", F.col("id") % 10 == 3)
print("materialized")
"""

_OPS = {
    "bm25": f"""
d = spark.read.parquet("{DOCS}")
from geocore_spark.operators import retrieval
def pipe():
    return retrieval.bm25_topk(
        d, ["vector", "hash", "stream", "dup"], k=100
    ).collect()
""",
    "dsir": f"""
d = spark.read.parquet("{DOCS}")
from pyspark.sql import functions as F
from geocore_spark.operators import selection
d = d.filter(F.col("doc_id") < 100_000)
raw = d.filter(F.col("doc_id") % 50 != 0)
tgt = d.filter(F.col("doc_id") % 50 == 0)
def pipe():
    w = selection.dsir_logweights(raw, tgt)
    return w.agg(F.count(F.lit(1)), F.sum("n_tokens"), F.sum("logw")).collect()
""",
    "semdedup": f"""
e = spark.read.parquet("{VECS}")
from pyspark.sql import functions as F
from geocore_spark.operators import similarity
def pipe():
    out = similarity.semdedup(e, n_clusters=141, threshold=0.97)
    return out.agg(F.count(F.lit(1)), F.sum("is_dup")).collect()
""",
    "decontam_emb": f"""
e = spark.read.parquet("{VECS}")
from pyspark.sql import functions as F
from geocore_spark.operators import similarity
ev = e.filter(F.col("vec_id") % 100 == 0).select(
    (F.col("vec_id") + 1_000_000).alias("vec_id"),
    F.transform("embedding", lambda x: x + F.lit(0.005)).alias("embedding"),
)
def pipe():
    out = similarity.semantic_decontam(e, ev, threshold=0.99)
    return out.agg(F.count(F.lit(1)), F.sum("contaminated")).collect()
""",
    "classifier": f"""
d = spark.read.parquet("{DOCS}")
from pyspark.sql import functions as F
from geocore_spark.operators import classify
VOCAB = [
    (w, (0.7 if i % 2 else -0.9) + i * 1e-4)
    for i, w in enumerate(
        ["vector", "hash", "stream", "dup", "table",
         "row", "scan", "fast", "slow", "data"]
    )
]
def pipe():
    s = classify.classifier_score(d, VOCAB, bias=-0.05)
    return s.agg(
        F.count(F.lit(1)), F.sum("logit_micro"), F.sum("label")
    ).collect()
""",
    "dup_spans": f"""
d = spark.read.parquet("{DOCS}")
from pyspark.sql import functions as F
from geocore_spark.operators import dedup
def pipe():
    out = dedup.duplicate_spans(d, w=8, hash_key=True)
    return out.agg(
        F.count(F.lit(1)), F.sum("dup_windows"), F.max("max_run")
    ).collect()
""",
    # exact_ntile over 100M synthetic rows — evidences that the
    # range-partitioned global rank (operators/metrics.py, VERDICT r2
    # item #2) actually parallelizes where the old Window.orderBy plan
    # was a one-task sort at any core count. All JVM, no Python workers.
    "ntile": """
from pyspark.sql import functions as F
from geocore_spark.operators import metrics
d = spark.range(100_000_000).select(
    F.col("id"),
    (F.sin(F.col("id").cast("double")) * 1e6).alias("score"),
)
def pipe():
    out = metrics.exact_ntile(
        d, [F.col("score"), F.col("id")], 10, cache=(c := {})
    )
    r = out.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
    ).collect()
    c["ranged"].unpersist()
    return r
""",
    # distributed-BPE training input (functions/bpe.word_freq_table):
    # Arrow-batched pretokenizer -> explode -> one hash aggregate ->
    # distributed top-k; only the bounded word-freq summary reaches the
    # driver. The merge loop itself is a fixed-cost artifact build
    # (corpus-size-independent) and is excluded from the timing.
    "bpe_freq": f"""
d = spark.read.parquet("{DOCS}")
from geocore_spark.functions import bpe
def pipe():
    return len(bpe.word_freq_table(d, top_k=30_000))
""",
    # winnowing fingerprints (functions/text.winnow_udf, oracle-backed via
    # winnow_exact): per-doc numpy rolling-hash kernel in an Arrow batch —
    # embarrassingly parallel, ceiling = the Python worker pool.
    "winnow": f"""
d = spark.read.parquet("{DOCS}")
from pyspark.sql import functions as F
from geocore_spark.functions import text as tx
def pipe():
    fp = d.select("doc_id", F.explode(tx.winnow_udf()(F.col("text"))).alias("fp"))
    return fp.agg(F.count(F.lit(1)), F.expr("bit_xor(fp)")).collect()
""",
    # Z-order layout write (functions/layout.zorder_layout): narrow Morton
    # projection + repartitionByRange + in-partition sort + parquet write —
    # all JVM; the range shuffle + zstd encode dominate. Times the full
    # clustering write a table pays once per (re)layout.
    "zorder": f"""
from geocore_spark.functions import layout
d = spark.read.parquet("{PTS}")
OUT = "/tmp/geocore_spot_zorder_out.parquet"
def pipe():
    layout.zorder_layout(d, res=19, n_files=64).write.mode(
        "overwrite"
    ).parquet(OUT)
    return 1
""",
    # merge-on-read snapshot scan (sources/snapshots.read_snapshot): full
    # 10M-row scan with a 1M-position delete-vector broadcast anti-join —
    # the steady-state read cost of a delete-heavy table between
    # compactions. All JVM (scan + BHJ), no Python workers; the paired
    # "plain" leg below isolates the MoR overhead vs the same scan with
    # no vectors (time travel to v1).
    "mor_read": f"""
from pyspark.sql import functions as F
from geocore_spark.sources import snapshots as snap
def pipe():
    out = snap.read_snapshot(spark, "{SNAP}")
    return out.agg(
        F.count(F.lit(1)), F.sum("id"), F.avg(F.col("lat") + F.col("lon"))
    ).collect()
""",
    "mor_read_plain": f"""
from pyspark.sql import functions as F
from geocore_spark.sources import snapshots as snap
def pipe():
    out = snap.read_snapshot(spark, "{SNAP}", version=1)  # no vectors
    return out.agg(
        F.count(F.lit(1)), F.sum("id"), F.avg(F.col("lat") + F.col("lon"))
    ).collect()
""",
    # snapshot MERGE (sources/snapshots.merge_into): a ~1.4M-key upsert
    # batch into a private copy of the 10M-row table — victim semi-join
    # (AQE broadcast of the batch keys), vector staging, batch write, one
    # commit; zero target files rewritten. Repeated pipe() calls re-merge
    # the same keys (tombstone the previous iteration's rows), so timed
    # runs measure the steady-state re-merge, identically at every level.
    "merge": f"""
import shutil
from pyspark.sql import functions as F
from geocore_spark.sources import snapshots as snap
BASE = "/tmp/geocore_spot_merge"
ROOT = BASE + "/t"
shutil.rmtree(BASE, ignore_errors=True)
shutil.copytree("{os.path.dirname(SNAP)}", BASE)
batch = spark.range(0, 10_000_000, 7).select(
    F.col("id"),
    ((F.col("id") % 181).cast("double") - 90.0).alias("lat"),
    ((F.col("id") % 361).cast("double") - 180.0).alias("lon"),
)
def pipe():
    m, stats = snap.merge_into(spark, ROOT, batch, ["id"])
    assert stats["rows_tombstoned"] > 1_000_000, stats
    return stats
""",
    # MERGE through the r4 DISTRIBUTED victim probe (stats build + the
    # mapInPandas searchsorted kernel + merge): stats are rebuilt each
    # pipe() because the previous commit's new files would make them
    # stale — so this measures the full pruned-merge path an operator
    # actually runs. Batch keys span every file, so pruning keeps all
    # files; the timing isolates the probe machinery, not I/O skipped.
    "merge_probe": f"""
import shutil
from pyspark.sql import functions as F
from geocore_spark.sources import snapshots as snap
BASE = "/tmp/geocore_spot_mergep"
ROOT = BASE + "/t"
shutil.rmtree(BASE, ignore_errors=True)
shutil.copytree("{os.path.dirname(SNAP)}", BASE)
batch = spark.range(0, 10_000_000, 7).select(
    F.col("id"),
    ((F.col("id") % 181).cast("double") - 90.0).alias("lat"),
    ((F.col("id") % 361).cast("double") - 180.0).alias("lon"),
)
def pipe():
    ks = snap.snapshot_file_stats(spark, ROOT, ["id"])
    m, stats = snap.merge_into(spark, ROOT, batch, ["id"], key_stats=ks)
    assert stats["rows_tombstoned"] > 1_000_000, stats
    return stats
""",
    # MERGE through BOTH manifests (r5: range stats + Bloom sidecar,
    # the probe_victim_files_bloom path): sidecars are rebuilt each
    # pipe() like the stats above (one hashing scan + per-file bitmap
    # build), then the distributed bitmap-broadcast kernel probes the
    # staged keys. The wide batch spans every file, so nothing is
    # pruned — the timing isolates the full bloom machinery (build +
    # broadcast + kernel) on top of merge_probe, not I/O skipped.
    "merge_bloom": f"""
import shutil
from pyspark.sql import functions as F
from geocore_spark.sources import snapshots as snap
BASE = "/tmp/geocore_spot_mergeb"
ROOT = BASE + "/t"
shutil.rmtree(BASE, ignore_errors=True)
shutil.copytree("{os.path.dirname(SNAP)}", BASE)
batch = spark.range(0, 10_000_000, 7).select(
    F.col("id"),
    ((F.col("id") % 181).cast("double") - 90.0).alias("lat"),
    ((F.col("id") % 361).cast("double") - 180.0).alias("lon"),
)
def pipe():
    ks = snap.snapshot_file_stats(spark, ROOT, ["id"])
    kb = snap.snapshot_file_blooms(spark, ROOT, ["id"])
    m, stats = snap.merge_into(
        spark, ROOT, batch, ["id"], key_stats=ks, key_blooms=kb
    )
    assert stats["rows_tombstoned"] > 1_000_000, stats
    return stats
""",
    # last-touch + linear attribution (operators/product_analytics.py):
    # 40M touches x 4M conversions over 2M users — the windowed
    # touch-conversion range join + per-conversion window. All JVM.
    "attribution": """
from pyspark.sql import functions as F
from geocore_spark.operators import product_analytics as pa
_day = 86_400_000_000
t = spark.range(0, 40_000_000, 1, 32).select(
    (F.col("id") % 2_000_000).alias("u"),
    F.timestamp_micros(F.pmod(F.xxhash64("id"), F.lit(30 * _day))).alias("ts"),
    F.concat(F.lit("c"), (F.col("id") % 5).cast("string")).alias("ch"),
    F.col("id").alias("tid"),
)
c = spark.range(0, 4_000_000, 1, 32).select(
    (F.col("id") % 2_000_000).alias("u"),
    F.timestamp_micros(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(30 * _day))).alias("ts"),
    F.col("id").alias("cid"),
)
def pipe():
    out = pa.attribution(t, c, "u", "ts", "ch", "cid", "tid", 48 * 3600 * 1_000_000)
    return out.agg(F.count(F.lit(1)), F.sum("linear_micro")).collect()
""",
    "gini": """
from pyspark.sql import functions as F
from geocore_spark.operators import metrics
d = spark.range(0, 50_000_000, 1, 32).select(
    (F.col("id") % 1000).alias("g"),
    F.pmod(F.xxhash64("id"), F.lit(100)).alias("v"),
)
def pipe():
    out = metrics.gini_coefficient(d, "g", "v")
    return out.agg(F.count(F.lit(1)), F.sum("gini_micro")).collect()
""",
    # degree-oriented triangle counting (operators/motifs.py) over a
    # 10M-edge random graph on 1M nodes — all JVM: distinct + degree
    # joins + the wedge self-join (the O(sqrt(m)) out-degree bound
    # keeps it ~45M rows) + the closing equi-join; ceiling = shuffles.
    "triangles": """
from pyspark.sql import functions as F
from geocore_spark.operators import motifs
e = spark.range(10_000_000).select(
    (F.col("id") % 1_000_000).alias("src"),
    F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("dst"),
)
def pipe():
    out = motifs.triangle_count(e)
    return out.agg(F.count(F.lit(1)), F.sum("n_triangles")).collect()
""",
    # prefix-filter exact set-similarity join (operators/setjoin.py):
    # 50k 40-token sets over a 200k universe + 500 planted near-dup pairs.
    # All JVM: freq agg, per-doc window, token-keyed prefix join, id-keyed
    # verification joins + pair groupBy. The planted pairs are the only
    # survivors (random 40-of-200k sets never reach J >= 1/2).
    "setjoin": """
from pyspark.sql import functions as F
from geocore_spark.operators import setjoin
tok = spark.range(2_000_000).select(
    (F.col("id") % 50_000).alias("doc_id"),
    F.pmod(F.xxhash64("id"), F.lit(200_000)).alias("token"),
)
dup = tok.where(F.col("doc_id") < 500).select(
    (F.col("doc_id") + 50_000).alias("doc_id"), "token"
)
tok = tok.unionAll(dup)
def pipe():
    out = setjoin.set_similarity_join(tok, threshold_num=1, threshold_den=2)
    return out.agg(F.count(F.lit(1)), F.sum("inter")).collect()
""",
    # real-codec media path over 20k mixed BMP/PNG/JPEG/GIF/fake payloads
    # (operators/multimodal.py + jpegcodec + gifcodec) — per-row Python
    # decode in Arrow-batched mapInPandas, embarrassingly parallel: the
    # scaling ceiling is the Python worker pool, not any shuffle.
    "media": f"""
from pyspark.sql import functions as F
from geocore_spark.operators import multimodal as mm
d = spark.read.parquet("{MEDIA}")
def pipe():
    out = mm.image_features(d)
    return out.agg(
        F.count(F.lit(1)), F.expr("bit_xor(phash)"), F.avg("mean_luma")
    ).collect()
""",
}


def _run(op: str, cpus: int) -> float:
    # shuffle_partitions = max(cpus*2, 8) varies with the level (8 at 2
    # cores, 16 at 8) — a known two-variables-at-once caveat vs the
    # main legs' fixed-32 discipline, KEPT because every recorded
    # op_spots entry was measured under this scheme and the SCALE.md
    # rows cite specific runs; changing it would silently fork the
    # methodology mid-history. New leg families should fix partitions
    # across levels like scaling_bench's graph/analytics legs do.
    code = f"""
import json, time
from geocore_spark.session import get_spark
spark = get_spark("spot-{op}", master="local[{cpus}]", shuffle_partitions={max(cpus * 2, 8)})
{_OPS[op]}
pipe()  # warm: JIT, codegen, Python workers, parquet footer cache
ts = []
for _ in range(2):
    t0 = time.time(); pipe(); ts.append(time.time() - t0)
print(json.dumps({{"t": min(ts)}}))
"""
    out = subprocess.run(
        _pinned(cpus) + [sys.executable, "-c", code],
        env=dict(os.environ, PYTHONPATH=REPO),
        capture_output=True,
        text=True,
        timeout=2400,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["t"]


def _steal_ticks() -> int:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0
    except OSError:
        return 0


# ops that synthesize their own input via spark.range need no fixture
_SELF_CONTAINED = {"ntile", "gini", "attribution", "triangles", "setjoin"}


def main() -> None:
    ops = sys.argv[1:] or list(_OPS)
    bad = [op for op in ops if op not in _OPS]
    if bad:
        raise SystemExit(f"unknown op(s): {bad}; known: {sorted(_OPS)}")
    if any(op not in _SELF_CONTAINED for op in ops):
        subprocess.run(
            [sys.executable, "-c", _MATERIALIZE],
            env=dict(os.environ, PYTHONPATH=REPO),
            check=True,
            capture_output=True,
            text=True,
        )
    # input descriptor recorded per op so entries at different input
    # sizes can never be cross-paired (the mixed-input trap the main
    # bench guards with curation_docs/graph_edges)
    inputs = {
        "bm25": "200k docs",
        "dsir": "100k docs",
        "semdedup": "20k x 64d",
        "decontam_emb": "20k x 64d",
        "classifier": "200k docs",
        "dup_spans": "200k docs w=8",
        "ntile": "100M rows",
        "bpe_freq": "200k docs top_k=30k",
        "winnow": "200k docs k=8 w=4",
        "media": "20k payloads",
        "zorder": "10M pts res=19 64 files",
        "mor_read": "10M rows 10pct deleted",
        "merge": "10M-row table, 1.4M-key batch",
        "merge_probe": "10M-row table, 1.4M-key batch, stats+probe",
        "merge_bloom": "10M-row table, 1.4M-key batch, stats+blooms",
        "mor_read_plain": "10M rows v1 no vectors",
        "triangles": "10M edges 1M nodes",
        "setjoin": "50k x 40-token sets t=1/2",
        "attribution": "40M touches 4M convs 2M users",
        "gini": "50M rows 1000 groups",
    }
    entry = {"ts": time.time(), "pinned": True, "ops": {}}
    failed: dict[str, str] = {}
    print("| operator | t(2) s | t(8) s | eff(2->8) | steal t/s |")
    print("|---|---|---|---|---|")
    for op in ops:
        # per-op steal watch (r4 review: two contaminated spot runs had
        # to be hand-deleted — make the CLAUDE.md idle-box policy
        # mechanical, like scaling_bench's self-flagging legs), and a
        # per-op failure boundary so one late failure can't discard
        # hours of completed measurements
        t0, s0 = time.time(), _steal_ticks()
        try:
            t2 = _run(op, 2)
            t8 = _run(op, 8)
        except Exception as e:  # noqa: BLE001 — record and continue
            failed[op] = str(e)[:200]
            print(f"| {op} | FAILED | — | — | — | {failed[op]}", flush=True)
            continue
        steal_tps = (_steal_ticks() - s0) / max(time.time() - t0, 1e-6)
        eff = t2 / (4 * t8)
        entry["ops"][op] = {
            "2": round(t2, 2),
            "8": round(t8, 2),
            "input": inputs.get(op, "?"),
            "steal_tps": round(steal_tps, 1),
            "noisy": steal_tps > 50.0,
        }
        flag = " NOISY" if steal_tps > 50.0 else ""
        print(
            f"| {op} | {t2:.2f} | {t8:.2f} | {eff:.2f} |"
            f" {steal_tps:.1f}{flag} |",
            flush=True,
        )
    if failed:
        entry["failed"] = failed
    if entry["ops"] or failed:
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "op_spots.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
    if any(o.get("noisy") for o in entry["ops"].values()):
        print(
            "[steal] one or more ops saw hypervisor steal > 50 ticks/s — "
            "those rows are contaminated; rerun them in a quiet window "
            "before citing them in SCALE.md",
            flush=True,
        )


if __name__ == "__main__":
    main()
