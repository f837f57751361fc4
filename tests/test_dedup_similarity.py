"""Dedup + similarity operators on the driver's documents/embeddings tables."""

import numpy as np
from pyspark.sql import functions as F

from geocore_spark.functions import hashing as hsh
from geocore_spark.operators import dedup, similarity


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different text about spark engines"),
        (4, "THE QUICK  BROWN fox jumps over the lazy dog"),  # dup after norm
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(spark):
    out = dedup.exact_dedup(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 2, 3]


def test_duplicate_groups(spark):
    g = dedup.duplicate_groups_exact(_docs(spark)).collect()
    assert len(g) == 1
    assert g[0]["group_size"] == 3 and g[0]["keeper_id"] == 0


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog and runs away fast"
    b = "the quick brown fox jumps over the lazy cat and runs away fast"
    sa = set(hsh.shingle_ids(a).tolist())
    sb = set(hsh.shingle_ids(b).tolist())
    true_j = len(sa & sb) / len(sa | sb)
    siga = hsh.minhash_signature(a, 64)
    sigb = hsh.minhash_signature(b, 64)
    est = (siga == sigb).mean()
    assert abs(est - true_j) < 0.2
    assert (hsh.minhash_signature(a, 64) == siga).all()  # deterministic


def test_batch_kernels_match_per_doc_reference():
    """minhash_batch/simhash_batch (the UDF fast path) must be value-
    identical to the per-doc reference kernels on edge cases + unicode."""
    corpus = [
        "",
        "a",
        "ab",
        "    ",
        "\t\n",
        "x" * 3,
        "the quick brown fox jumps over the lazy dog",
        "THE QUICK  BROWN fox jumps over the lazy dog",
        "Ünïcode 日本語 mixed œ text",
        "word " * 500,
        "many distinct tokens " + " ".join(str(i) for i in range(300)),
    ]
    mb = hsh.minhash_batch(corpus, 64, 5)
    sb = hsh.simhash_batch(corpus, 4)
    for j, t in enumerate(corpus):
        assert np.array_equal(mb[j], hsh.minhash_signature(t, 64, 5)), j
        assert sb[j] == hsh.simhash64(t, 4), j


def test_minhash_lsh_pairs_finds_dups(spark):
    pairs = dedup.minhash_lsh_pairs(_docs(spark), threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dups always collide
    assert (0, 4) in got
    assert all(a < b for a, b in got)


def test_simhash_near_dups(spark):
    out = dedup.simhash_near_dups(_docs(spark), max_hamming=3)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert got[(0, 1)] == 0
    assert got[(0, 4)] == 0  # normalization makes them identical
    assert (0, 3) not in got


def test_ngram_jaccard_pairs(spark):
    out = dedup.ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.4)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert got[(0, 1)] == 1.0
    assert 0.4 <= got[(0, 2)] < 1.0


def test_ngram_default_lsh_block_finds_cross_length_neardups(spark):
    """VERDICT r1 #7: the default block must find near-dup pairs that a
    length-band block would split. Doc 11 = doc 10 plus a long appended
    run, pushing it across the log2 length-band boundary; the old
    length-band default missed the pair, the LSH default finds it."""
    base = "the quick brown fox jumps over the lazy dog and keeps running " * 4
    rows = [(10, base), (11, base + " zzzz" * 40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    band = F.floor(F.log2(F.greatest(F.length("text"), F.lit(1)) + 1) * 2)
    bands = [r["b"] for r in docs.select(band.alias("b")).collect()]
    assert bands[0] != bands[1], "fixture must straddle a length band"
    # old-style explicit length-band block: pair invisible
    banded = dedup.ngram_jaccard_pairs(
        docs.withColumn("band", band), n=3, threshold=0.3, block_col="band"
    )
    assert banded.count() == 0
    # new default (MinHash-LSH candidates + exact verify): pair found
    out = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert (10, 11) in got
    assert got[(10, 11)] >= 0.3


def test_minhash_verify_exact_matches_true_jaccard(spark):
    """verify='exact' emits the TRUE shingle Jaccard per candidate pair and
    thresholds on it — precision 1.0 by construction."""
    out = dedup.minhash_lsh_pairs(
        _docs(spark), bands=32, threshold=0.5, verify="exact"
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert got[(0, 1)] == 1.0 and got[(0, 4)] == 1.0  # dups: true J = 1
    for (a, b), j in got.items():
        ta = dict((r["doc_id"], r["text"]) for r in _docs(spark).collect())
        sa = set(hsh.shingle_ids(ta[a]).tolist())
        sb = set(hsh.shingle_ids(ta[b]).tolist())
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(j - true_j) < 1e-6
        assert true_j >= 0.5  # no false positives survive exact verify


def test_substring_dup_pairs_finds_shared_spans(spark):
    """Docs sharing a verbatim span inside otherwise-different text are
    paired, even though whole-doc similarity is low; unrelated docs are
    not paired."""
    span = "the licensed material is provided as is without warranty of any kind either express or implied"
    rows = [
        (0, "alpha " * 30 + span + " omega " * 30),
        (1, "number " + " ".join(str(i * 7) for i in range(60)) + " " + span),
        (2, "completely unrelated content about geodesic tiling " * 5),
        (3, "more unrelated prose concerning parquet readers " * 5),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.substring_dup_pairs(docs, min_shared=3)
    got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in out.collect()}
    assert (0, 1) in got and got[(0, 1)] >= 3
    assert all(p == (0, 1) for p in got), got
    # whole-doc MinHash at 0.5 must NOT consider them near-dups (that is
    # the gap this operator fills)
    md = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    assert (0, 1) not in {(r["id_a"], r["id_b"]) for r in md.collect()}


def test_substring_dup_pairs_caps_ubiquitous_fingerprints(spark):
    """A span present in EVERY doc is boilerplate: with df_cap below the
    corpus size its fingerprints are dropped and no pairs emerge from it."""
    boiler = "standard footer text appearing on every single page of the site"
    rows = [(i, f"unique body {i} " * 10 + boiler) for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.substring_dup_pairs(docs, min_shared=2, df_cap=3)
    assert capped.count() == 0
    uncapped = dedup.substring_dup_pairs(docs, min_shared=2, df_cap=1000)
    assert uncapped.count() == 15  # all C(6,2) pairs share the footer


def test_hamming_column(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hsh.hamming64(F.col("a"), F.col("b")).alias("h")).first()["h"] == 2


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    out = similarity.brute_force_topk(queries, emb, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["vec_id"], []).append((r["rank"], r["neighbor_id"]))
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(M, axis=1)
    sims = (M @ M.T) / np.outer(norms, norms)
    for qi in range(5):
        s = np.round(sims[qi], 6)
        s[qi] = -np.inf
        order = np.lexsort((ids, -s))[:5]
        want = [int(ids[j]) for j in order]
        have = [nid for _, nid in sorted(got[int(ids[qi])])]
        assert have == want, qi


def test_null_embeddings_dropped_not_fatal(spark, sf_dir):
    # one NULL embedding used to np.stack-crash every kernel path; and
    # exclude_self=False must keep a corpus row whose id collides with a
    # query id in a DIFFERENT table
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(200)
    )
    dirty = emb.unionByName(
        spark.createDataFrame([(99_999, None)], emb.schema)
    )
    q = emb.filter(F.col("vec_id") < 3)
    for fn in (
        lambda: similarity.lsh_topk(q, dirty, dim=64, k=3, n_planes=4, n_tables=2),
        lambda: similarity.ivf_topk(q, dirty, k=3, n_lists=4, n_probe=2),
        lambda: similarity.brute_force_topk(q, dirty, k=3),
        lambda: similarity.near_dup_cosine(dirty, threshold=0.99, n_planes=4, n_tables=2),
    ):
        fn().collect()  # must not raise
    # distinct-table search: self-id exclusion off keeps the true match
    out = similarity.brute_force_topk(q, emb, k=1, exclude_self=False).collect()
    assert all(r["neighbor_id"] == r["vec_id"] and r["cos_sim"] == 1.0 for r in out)


def test_ivf_smaller_corpus_than_lists(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(10)
    # n_lists > corpus rows: codebook clamps instead of IndexError
    out = similarity.ivf_topk(emb, emb, k=3, n_lists=16, n_probe=16)
    assert out.count() > 0
    import pytest as _pytest

    empty = emb.filter(F.lit(False))
    with _pytest.raises(ValueError, match="no non-null"):
        similarity.ivf_topk(emb, empty, k=3)


def test_semantic_decontam_empty_evalset_and_string_ids(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    empty = emb.filter(F.lit(False))
    out = similarity.semantic_decontam(emb, empty).collect()
    assert len(out) == 50
    assert all(r["contaminated"] == 0 and r["max_cos"] is None for r in out)
    # string ids: the tie-break must stay deterministic (negating a
    # string id implicit-casts to NULL — the old max_by key lost order)
    s = emb.withColumn("vec_id", F.concat(F.lit("v"), F.col("vec_id")))
    dup_evals = s.limit(3).unionByName(
        s.limit(3).withColumn("vec_id", F.concat(F.col("vec_id"), F.lit("_copy")))
    )
    runs = [
        {(r["vec_id"], r["closest_eval_id"]) for r in
         similarity.semantic_decontam(s, dup_evals, threshold=0.99).collect()}
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    # every duplicated-eval tie resolves to the ASCENDING id ('vX' < 'vX_copy')
    closest = dict(runs[0])
    assert all(not c.endswith("_copy") for c in closest.values() if c is not None)


def test_lsh_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(queries, emb, k=5)
    approx = similarity.lsh_topk(queries, emb, dim=64, k=5, n_planes=4, n_tables=8)
    e = {(r["vec_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["vec_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # fixture embeddings are near-random (top-5 cosine ~0.23-0.48), so even
    # 4-plane x 8-table LSH collision prob is ~0.6; chance recall is 1%.
    assert recall >= 0.4, recall


def test_ivf_topk_recall_improves_with_probes(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["vec_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(queries, emb, k=5).collect()
    }
    r_lo = similarity.ivf_topk(queries, emb, k=5, n_lists=8, n_probe=2)
    r_hi = similarity.ivf_topk(queries, emb, k=5, n_lists=8, n_probe=8)
    lo = {(r["vec_id"], r["neighbor_id"]) for r in r_lo.collect()}
    hi = {(r["vec_id"], r["neighbor_id"]) for r in r_hi.collect()}
    # n_probe == n_lists degenerates to exact brute force
    assert hi == exact
    assert len(lo & exact) / len(exact) >= 0.4


def test_ivf_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, similarity.ivf_topk(queries, emb, k=3).collect()))
    b = sorted(map(tuple, similarity.ivf_topk(queries, emb, k=3).collect()))
    assert a == b


def test_ivf_index_persist_and_probe(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, idx, n_lists=8)
    # layout: lists partitioned by list_id on disk
    import os

    parts = [d for d in os.listdir(idx + "/lists") if d.startswith("list_id=")]
    assert len(parts) >= 2

    queries = emb.filter(F.col("vec_id") < 10)
    out = similarity.ivf_index_topk(queries, idx, k=5, n_probe=8)  # probe all
    # probing every list == exact brute force
    exact = similarity.brute_force_topk(queries, emb, k=5)
    key = lambda r: (r["vec_id"], r["rank"], r["neighbor_id"])
    assert sorted(map(key, out.collect())) == sorted(map(key, exact.collect()))

    # partial probe: partition filter must reach the scan (pruned read)
    one = emb.filter(F.col("vec_id") == 0)
    probed = similarity.ivf_index_topk(one, idx, k=5, n_probe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*list_id", plan)
    assert m, plan[:2000]
    assert probed.count() > 0


def test_minhash_chain_pairing_linear_and_same_clusters(spark):
    """A viral bucket (many identical docs) must cost O(m) pairs in chain
    mode while producing the SAME duplicate clusters as all-pairs mode."""
    from geocore_spark.operators import components, dedup

    viral = [(i, "the same viral boilerplate page body repeated everywhere") for i in range(40)]
    distinct = [(100 + i, f"unique document number {i} with its own words entirely") for i in range(10)]
    docs = spark.createDataFrame(viral + distinct, ["doc_id", "text"])

    all_pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9).persist()
    chain_pairs = dedup.minhash_lsh_pairs(docs, threshold=0.9, pairing="chain").persist()

    n_all, n_chain = all_pairs.count(), chain_pairs.count()
    assert n_all == 40 * 39 // 2          # the clique
    assert n_chain == 39                  # the chain
    # identical clusters either way
    ca = sorted(map(tuple, components.dedup_clusters(docs, all_pairs).select("doc_id", "keeper_id").collect()))
    cc = sorted(map(tuple, components.dedup_clusters(docs, chain_pairs).select("doc_id", "keeper_id").collect()))
    assert ca == cc
    # chain estimates are true signature estimates (identical docs -> 1.0)
    assert all(r["est_jaccard"] == 1.0 for r in chain_pairs.collect())
    all_pairs.unpersist(); chain_pairs.unpersist()


def test_minhash_pairing_validation(spark):
    from geocore_spark.operators import dedup

    docs = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    try:
        dedup.minhash_lsh_pairs(docs, pairing="bogus").collect()
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_lsh_index_incremental_matches_inmemory(spark, tmp_path):
    """Persisted-index query must find exactly the new-vs-corpus pairs the
    in-memory join finds on the union — without re-signing the corpus."""
    from geocore_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i} about spark shuffles and joins plus topic {i % 5}")
         for i in range(60)],
        ["doc_id", "text"],
    )
    # new batch: 10 exact near-dups of corpus docs + 5 fresh docs
    new = spark.createDataFrame(
        [(1000 + i, f"corpus document number {i} about spark shuffles and joins plus topic {i % 5}")
         for i in range(10)]
        + [(2000 + i, f"entirely fresh content {i} nothing shared here at all") for i in range(5)],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "lsh_idx")
    dedup.build_lsh_index(corpus, path, bands=32)

    got = {
        (r["new_id"], r["corpus_id"])
        for r in dedup.query_lsh_index(new, path, threshold=0.9).collect()
    }
    want = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]))
        for r in dedup.minhash_lsh_pairs(
            corpus.unionByName(new), n_perm=64, bands=32, threshold=0.9
        ).collect()
        if (r["id_a"] >= 1000) != (r["id_b"] >= 1000)  # cross pairs only
    }
    assert got == {(n, c) for (n, c) in want}
    assert all(n >= 1000 and c < 1000 for n, c in got)
    assert len(got) >= 10  # every planted dup found


def test_lsh_index_params_travel_with_data(spark, tmp_path):
    from geocore_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(i, f"doc {i} words words words {i}") for i in range(10)], ["doc_id", "text"]
    )
    path = str(tmp_path / "idx2")
    dedup.build_lsh_index(corpus, path, n_perm=32, bands=8, shingle_k=4)
    # manifest is written THROUGH Spark (travels with the data on any fs)
    [p] = spark.read.parquet(f"{path}/params").collect()
    assert (p["n_perm"], p["bands"], p["shingle_k"], p["id_col"]) == (32, 8, 4, "doc_id")
    # band rows carry only 8-byte hashes, never the signature
    assert set(spark.read.parquet(f"{path}/bands").columns) == {"corpus_id", "band", "bhash"}
    # query re-bands with STORED params: identical docs must collide
    new = spark.createDataFrame([(100, "doc 3 words words words 3")], ["doc_id", "text"])
    out = dedup.query_lsh_index(new, path, threshold=0.9).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in out} == {(100, 3)}


def test_fingerprint_index_incremental_exact(spark, tmp_path):
    from geocore_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(30)], ["doc_id", "text"]
    )
    path = str(tmp_path / "fp_idx")
    dedup.build_fingerprint_index(corpus, path)
    new = spark.createDataFrame(
        [(100, "doc body 7"),          # exact dup (same normalized text)
         (101, "DOC   body 7"),        # dup after normalization (case/ws)
         (102, "genuinely new body")],
        ["doc_id", "text"],
    )
    kept = dedup.filter_new_against_fingerprint_index(new, path)
    assert {r["doc_id"] for r in kept.collect()} == {102}


def test_lsh_index_query_plan_shape(spark, tmp_path):
    """The index query must broadcast the (small) new-batch band rows and
    never sort-merge the corpus band table, and the signature joins must
    only move candidate rows."""
    from geocore_spark.operators import dedup

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i} alpha beta gamma {i % 7}") for i in range(50)],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "idx_plan")
    dedup.build_lsh_index(corpus, path)
    new = spark.createDataFrame([(900, "corpus doc 3 alpha beta gamma 3")], ["doc_id", "text"])
    plan = (
        dedup.query_lsh_index(new, path, threshold=0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_int8_quantization_roundtrip_and_recall(spark, sf_dir):
    """Quantized cosine must preserve neighbor structure: top-10 by
    int8-approximate similarity recalls >= 0.9 of the exact top-10 on the
    fixture embeddings, and reconstruction stays within the 1/254
    per-component quantization bound."""
    import os

    from pyspark.sql import functions as F

    from geocore_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = sim.quantize_embeddings(emb)

    # reconstruction error bound: |v - s*round(v/s)| <= s/2 = amax/254
    err = q.select(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                sim.dequantize(F.col("q_vec"), F.col("q_scale")),
                lambda a, b: F.abs(a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        (F.col("q_scale") / 2 + 1e-9).alias("bound"),
    )
    assert err.filter(F.col("max_err") > F.col("bound")).count() == 0

    # zero-vector edge
    zed = sim.quantize_embeddings(
        spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>")
    ).collect()[0]
    assert zed.q_scale == 0.0 and list(zed.q_vec) == [0, 0, 0]

    # neighbor recall: exact vs quantized scores over a 20-query slice
    queries = emb.limit(20)
    exact = sim.brute_force_topk(queries, emb, k=10)
    qq = q.select(F.col("vec_id").alias("qid2"), F.col("q_vec").alias("qa"), F.col("q_scale").alias("sa"))
    qc = q.select(F.col("vec_id").alias("nid2"), F.col("q_vec").alias("qb"), F.col("q_scale").alias("sb"))
    from pyspark.sql import Window

    pairs = (
        sim.quantize_embeddings(queries).select(
            F.col("vec_id").alias("qid"), F.col("q_vec").alias("qa"), F.col("q_scale").alias("sa")
        )
        .crossJoin(F.broadcast(qc))
        .filter(F.col("qid") != F.col("nid2"))
        .select(
            "qid",
            F.col("nid2").alias("nid"),
            sim.quantized_dot(F.col("qa"), F.col("sa"), F.col("qb"), F.col("sb")).alias("qdot"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qdot"), F.asc("nid"))
    approx = pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 10)
    truth = {(r.vec_id, r.neighbor_id) for r in exact.collect()}
    got = {(r.qid, r.nid) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, recall
