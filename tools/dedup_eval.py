"""Near-dup detector quality: precision/recall vs exact ground truth.

The dedup operators are approximations (banded MinHash LSH, SimHash
pigeonhole blocking); this harness measures what they trade away.
Ground truth = exact character-5-shingle Jaccard over ALL pairs of the
sf corpus (computed driver-side in numpy — the corpus is small; the
operators under test are the distributed ones).

Writes EVAL.md and prints one JSON line per detector config.

Usage: python tools/dedup_eval.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from geocore_spark.functions import hashing as hsh
from geocore_spark.operators import dedup
from geocore_spark.session import get_spark


def exact_pairs(texts: dict[int, str], threshold: float) -> set[tuple[int, int]]:
    """All id pairs with exact shingle-Jaccard >= threshold."""
    sets = {i: set(hsh.shingle_ids(t or "", 5).tolist()) for i, t in texts.items()}
    ids = sorted(sets)
    out = set()
    for a, b in itertools.combinations(ids, 2):
        sa, sb = sets[a], sets[b]
        union = len(sa | sb)
        if union and len(sa & sb) / union >= threshold:
            out.add((a, b))
    return out


def prf(got: set, truth: set) -> dict:
    tp = len(got & truth)
    prec = tp / len(got) if got else 1.0
    rec = tp / len(truth) if truth else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {
        "predicted": len(got),
        "truth": len(truth),
        "tp": tp,
        "precision": round(prec, 4),
        "recall": round(rec, 4),
        "f1": round(f1, 4),
    }


def mutate(texts: dict[int, str], seed: int = 7) -> dict[int, str]:
    """Add graded near-dup variants: for each of the first 150 docs, one
    mutant with a word-replacement rate drawn from [0.02, 0.6] — this
    populates the borderline Jaccard band the raw corpus lacks, which is
    where detectors actually differ."""
    rng = np.random.default_rng(seed)
    out = dict(texts)
    base_ids = sorted(texts)[:150]
    next_id = max(texts) + 1
    for i in base_ids:
        words = (texts[i] or "").split()
        if len(words) < 10:
            continue
        rate = rng.uniform(0.02, 0.6)
        w = list(words)
        for j in range(len(w)):
            if rng.random() < rate:
                w[j] = f"mut{rng.integers(1e6)}"
        out[next_id] = " ".join(w)
        next_id += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    spark = get_spark("dedup-eval", master="local[8]", shuffle_partitions=8)
    raw = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    texts = mutate({r["doc_id"]: r["text"] for r in raw.collect()})
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    truth = exact_pairs(texts, args.threshold)

    results = []

    for bands in (8, 16, 32):
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(
                docs, n_perm=64, bands=bands, threshold=args.threshold
            ).collect()
        }
        row = {"detector": f"minhash_lsh b={bands} r={64 // bands}", **prf(got, truth)}
        results.append(row)
        print(json.dumps(row))

    # exact-verify mode: candidates from the loosest banding (b=32, r=2 ->
    # high recall), thresholded on TRUE shingle Jaccard -> precision 1.0 by
    # construction (any residual FP would be a kernel bug).
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, n_perm=64, bands=32, threshold=args.threshold, verify="exact"
        ).collect()
    }
    row = {"detector": "minhash_lsh b=32 r=2 verify=exact", **prf(got, truth)}
    results.append(row)
    print(json.dumps(row))

    # chain pairing: linear per-bucket cost; pair-level recall drops by
    # design (only successor links are emitted) — cluster membership is
    # what it preserves, so also report cluster agreement vs all-pairs.
    got_chain = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, n_perm=64, bands=32, threshold=args.threshold,
            verify="exact", pairing="chain",
        ).collect()
    }
    row = {"detector": "minhash_lsh b=32 r=2 exact pairing=chain", **prf(got_chain, truth)}
    results.append(row)
    print(json.dumps(row))

    # cluster-level agreement: chain mode exists for cluster collapse, so
    # measure what fraction of docs land in the same duplicate cluster
    # (keeper id) under chain pairs vs all-pairs — the operative metric,
    # pair recall understates it.
    from geocore_spark.operators import components

    def _keepers(pair_set):
        pairs_df = spark.createDataFrame(
            [(a, b) for a, b in pair_set] or [(None, None)], "id_a long, id_b long"
        ).dropna()
        return {
            r["doc_id"]: r["keeper_id"]
            for r in components.dedup_clusters(docs, pairs_df).collect()
        }

    k_all, k_chain = _keepers(got), _keepers(got_chain)
    agree = sum(k_all[d] == k_chain[d] for d in k_all) / len(k_all)
    cluster_row = {"metric": "chain-vs-all cluster agreement", "value": round(agree, 4)}
    print(json.dumps(cluster_row))

    for maxh in (3, 7):
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_near_dups(docs, max_hamming=maxh).collect()
        }
        row = {"detector": f"simhash h<={maxh}", **prf(got, truth)}
        results.append(row)
        print(json.dumps(row))

    # --- ANN recall@k vs exact brute force -------------------------------
    from geocore_spark.operators import similarity

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    queries = emb.limit(50)
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(queries, emb, k=10).collect()
    }
    ann_rows = []

    def recall(pairs):
        return round(len(pairs & exact) / len(exact), 4)

    got = {
        (r["vec_id"], r["neighbor_id"])
        for r in similarity.lsh_topk(
            queries, emb, dim=64, k=10, n_planes=4, n_tables=8
        ).collect()
    }
    ann_rows.append({"detector": "lsh_topk planes=4 tables=8", "recall@10": recall(got)})
    for n_probe in (2, 4, 8):
        got = {
            (r["vec_id"], r["neighbor_id"])
            for r in similarity.ivf_topk(
                queries, emb, k=10, n_lists=16, n_probe=n_probe
            ).collect()
        }
        ann_rows.append(
            {"detector": f"ivf_topk lists=16 probe={n_probe}", "recall@10": recall(got)}
        )
    for row in ann_rows:
        print(json.dumps(row))

    # --- embedding near-dup pairs: hyperplane-LSH blocks vs exact truth --
    # The raw fixture has no natural near-dups (max cosine < 0.9), so
    # plant one +0.01-shifted twin per vector (cos ~0.997) — same scheme
    # as the embedding_dedup driver query.
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    both = emb.select("vec_id", "embedding").unionByName(shifted).persist()
    truth_nd = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs_exact(both, threshold=0.99).collect()
    }
    nd_rows = []
    for n_tables in (4, 8):
        got = {
            (r["id_a"], r["id_b"])
            for r in similarity.near_dup_cosine(
                both, threshold=0.99, dim=64, n_planes=10, n_tables=n_tables
            ).collect()
        }
        row = {
            "detector": f"near_dup_cosine planes=10 tables={n_tables}",
            **prf(got, truth_nd),
        }
        nd_rows.append(row)
        print(json.dumps(row))

    # --- SemDeDup: cluster-bounded dedup vs the same exact pair truth --
    # recall = flagged dup ids / true dup ids (ids appearing as id_b in a
    # true pair); precision is 1.0 by construction (within-cluster pairs
    # use the identical exact-cosine predicate). The second number is the
    # work bound: sum of n_c*(n_c-1)/2 within-cluster comparisons as a
    # fraction of the exact N*(N-1)/2 — the quantity that makes the
    # operator runnable where brute force is not.
    truth_dups = {b for _, b in truth_nd}
    n_both = both.count()
    exact_cmp = n_both * (n_both - 1) / 2
    sd_rows = []
    for n_clusters in (1, 8, 32):
        out = similarity.semdedup(
            both, n_clusters=n_clusters, threshold=0.99
        ).persist()
        flagged = {r["vec_id"] for r in out.collect() if r["is_dup"]}
        sizes = [
            r["n"]
            for r in out.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        out.unpersist()
        cmp_frac = sum(n * (n - 1) / 2 for n in sizes) / exact_cmp
        row = {
            "detector": f"semdedup C={n_clusters}",
            "flagged": len(flagged),
            "recall": round(len(flagged & truth_dups) / len(truth_dups), 4),
            "cmp_frac": round(cmp_frac, 4),
        }
        sd_rows.append(row)
        print(json.dumps(row))
    both.unpersist()

    with open(os.path.join(REPO, "EVAL.md"), "w") as f:
        f.write(
            "# EVAL — near-dup detector quality vs exact ground truth\n\n"
            f"Corpus: `{args.sf_dir}/documents.parquet` plus graded mutants "
            f"(word-replacement rate 0.02-0.6; {len(texts)} docs total). "
            f"Ground truth: exact char-5-shingle Jaccard >= {args.threshold} "
            f"over all pairs ({len(truth)} positive pairs).\n"
            "Regenerate with `python tools/dedup_eval.py`.\n\n"
            "| detector | predicted | tp | precision | recall | f1 |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in results:
            f.write(
                f"| {r['detector']} | {r['predicted']} | {r['tp']} "
                f"| {r['precision']} | {r['recall']} | {r['f1']} |\n"
            )
        f.write(
            "\nReading: banded LSH recall rises with more bands (lower\n"
            "collision threshold ~ (1/b)^(1/r)) at some precision cost —\n"
            "precision stays high here because candidates are verified by\n"
            "signature-estimated Jaccard before emission. SimHash with a\n"
            "small Hamming budget is a high-precision/lower-recall detector\n"
            "for the same threshold; widening the budget trades back.\n"
            "pairing=chain trades PAIR recall for O(m)-per-bucket cost; the\n"
            "operative number is CLUSTER agreement with all-pairs mode —\n"
            f"{cluster_row['value']:.4f} of docs keep the same duplicate-\n"
            "cluster keeper under chain pairs on this corpus (exact-dup\n"
            "chains always collapse identically; thresholded links can\n"
            "split a borderline cluster). Use chain for dedup collapse,\n"
            "'all' for pair enumeration.\n"
        )
        f.write(
            "\n## ANN recall@10 vs exact cosine top-10 "
            f"(50 queries, {emb.count()} corpus vectors)\n\n"
            "| detector | recall@10 |\n|---|---|\n"
        )
        for r in ann_rows:
            f.write(f"| {r['detector']} | {r['recall@10']} |\n")
        f.write(
            "\nThe fixture embeddings are near-random (top cosine ~0.23-0.5),\n"
            "the hardest regime for ANN; recall rises monotonically with\n"
            "n_probe and reaches 1.0 at probe == lists (exact by\n"
            "construction). Chance recall at k=10/500 is 2%.\n"
        )
        f.write(
            "\n## Embedding near-dup pairs: LSH blocks vs exact pair truth\n\n"
            f"Corpus: fixture vectors plus one planted +0.01-shifted twin each\n"
            f"(cos ~0.997; {len(truth_nd)} true pairs at threshold 0.99).\n"
            "Truth: `near_dup_pairs_exact` (brute-force, the embedding_dedup\n"
            "driver oracle).\n\n"
            "| detector | predicted | tp | precision | recall | f1 |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in nd_rows:
            f.write(
                f"| {r['detector']} | {r['predicted']} | {r['tp']} "
                f"| {r['precision']} | {r['recall']} | {r['f1']} |\n"
            )
        f.write(
            "\nPrecision is 1.0 by construction (every LSH candidate is\n"
            "verified with the exact cosine before emission); tables trade\n"
            "recall for candidate volume.\n"
        )
        f.write(
            "\n## SemDeDup: cluster-bounded dedup vs the same exact truth\n\n"
            "Same planted corpus; flagged = ids marked is_dup. cmp_frac =\n"
            "within-cluster pair comparisons / exact all-pairs comparisons\n"
            "(the work bound that makes the operator runnable at scale).\n"
            "Precision is 1.0 by construction (within-cluster pairs use\n"
            "the identical exact-cosine predicate).\n\n"
            "| detector | flagged | recall | cmp_frac |\n|---|---|---|---|\n"
        )
        for r in sd_rows:
            f.write(
                f"| {r['detector']} | {r['flagged']} | {r['recall']} "
                f"| {r['cmp_frac']} |\n"
            )
        f.write(
            "\nC=1 degenerates to the exact operator (recall 1.0 at full\n"
            "cost). As C grows the comparison bound collapses ~linearly\n"
            "while recall decays slowly: a twin whose original sits near a\n"
            "cluster boundary can be assigned to the neighboring centroid\n"
            "and the pair is never compared — the published SemDeDup\n"
            "trade. Raise C only as far as the largest-cluster work bound\n"
            "requires; recover boundary pairs with a second pass under a\n"
            "different centroid set (the multi-table trick) if the last\n"
            "few points of recall matter.\n"
        )
    print("wrote EVAL.md")
    spark.stop()


if __name__ == "__main__":
    main()
