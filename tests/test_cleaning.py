"""Cleaning kernels (PII scrub, chunking, n-grams) + decontamination +
exact embedding near-dup pairs."""

import pyspark.sql.functions as F
import pytest

from geocore_spark.functions import cleaning
from geocore_spark.operators import decontam, similarity


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "reach me at jane.doe+x@example.co.uk or on +1 (555) 123-4567 today"),
        (2, "server 10.0.254.3 answered; backup at 192.168.1.1 did not"),
        (3, "no pii here, just words and the number 42"),
        (4, "a@b.io then 8.8.8.8 then 555 867 5309 x"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_scrub_pii_redacts_all_three_classes(pii_df):
    out = {
        r["doc_id"]: r["clean"]
        for r in pii_df.select(
            "doc_id", cleaning.scrub_pii(F.col("text")).alias("clean")
        ).collect()
    }
    assert out[1] == "reach me at <EMAIL> or on <PHONE> today"
    assert out[2] == "server <IP> answered; backup at <IP> did not"
    assert out[3] == "no pii here, just words and the number 42"
    assert out[4] == "<EMAIL> then <IP> then <PHONE> x"
    assert out[5] == ""


def test_pii_counts_match_redactions(pii_df):
    rows = pii_df.select(
        "doc_id", cleaning.pii_counts(F.col("text")).alias("c")
    ).collect()
    got = {r["doc_id"]: (r["c"]["emails"], r["c"]["ips"], r["c"]["phones"]) for r in rows}
    assert got == {1: (1, 0, 1), 2: (0, 2, 0), 3: (0, 0, 0), 4: (1, 1, 1), 5: (0, 0, 0)}


def test_ip_host_mailbox_still_masked(spark):
    # "root@10.1.2.3" has no alphabetic TLD -> not an email by the grammar;
    # the IP rule masks the sensitive part instead (documented contract)
    df = spark.createDataFrame([("mail root@10.1.2.3 now",)], ["text"])
    [r] = df.select(cleaning.scrub_pii(F.col("text")).alias("c")).collect()
    assert r["c"] == "mail root@<IP> now"


def test_chunk_spans_overlap_and_remainder(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], ["doc_id", "text"])
    staged = df.select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("toks")
    )
    out = (
        staged.select(
            "doc_id",
            F.explode(cleaning.chunk_spans(F.col("toks"), size=4, stride=3)).alias("ch"),
        )
        .select("doc_id", "ch.start", "ch.chunk")
        .orderBy("start")
        .collect()
    )
    assert [(r["start"], r["chunk"]) for r in out] == [
        (1, "a b c d"),
        (4, "d e f g"),
        (7, "g"),
    ]


def test_chunk_spans_empty_text(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    staged = df.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
    out = staged.select(
        F.explode(cleaning.chunk_spans(F.col("toks"), 4, 3)).alias("ch")
    ).collect()
    assert len(out) == 1 and out[0]["ch"]["chunk"] == ""


def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], ["text"])
    toks = F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda x: x != "")
    staged = df.select(toks.alias("t"))
    out = staged.select(cleaning.word_ngrams(F.col("t"), 3).alias("g")).collect()
    assert out[0]["g"] == ["a b c", "b c d"]
    assert out[1]["g"] == []
    assert out[2]["g"] == []


@pytest.fixture(scope="module")
def contam_dfs(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # contains "the quick brown fox jumps" and the shifted gram
            (1, "I saw the quick brown fox jumps over everything"),
            (2, "totally unrelated text about spark partitions and shuffles"),
            # repeats one offending gram twice -> still counted once
            (3, "quick brown fox jumps over x quick brown fox jumps over y"),
        ],
        ["doc_id", "text"],
    )
    return docs, bench


def test_decontaminate_counts_distinct_grams(contam_dfs):
    docs, bench = contam_dfs
    out = {
        r["doc_id"]: r["overlap_ngrams"]
        for r in decontam.decontaminate(docs, bench, n=5).collect()
    }
    # doc 1: "the quick brown fox jumps" + "quick brown fox jumps over"
    assert out == {1: 2, 3: 1}


def test_decontaminate_hashed_equals_string_mode(contam_dfs):
    docs, bench = contam_dfs
    a = sorted(map(tuple, decontam.decontaminate(docs, bench, n=5).collect()))
    b = sorted(
        map(tuple, decontam.decontaminate(docs, bench, n=5, hashed=True).collect())
    )
    assert a == b


def test_decontaminate_broadcasts_benchmark(contam_dfs):
    docs, bench = contam_dfs
    plan = decontam.decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_near_dup_pairs_exact_plants(spark):
    base = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [2.0, 0.0, 0.0, 0.0]),  # same direction as 1 -> cos 1.0
            (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
            (4, [1.0, 1.0, 0.0, 0.0]),  # cos 0.707107 with 1/2
        ],
        ["vec_id", "embedding"],
    )
    out = similarity.near_dup_pairs_exact(base, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["cos_sim"]) for r in out] == [(1, 2, 1.0)]
    # lower threshold picks up the 45-degree pairs
    out2 = sorted(
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs_exact(base, threshold=0.7).collect()
    )
    assert out2 == [(1, 2), (1, 4), (2, 4), (3, 4)]


def test_near_dup_lsh_recall_against_exact(spark, sf_dir):
    # planted duplicates: deterministic +0.01 shift of each vector
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(60)
    shifted = emb.select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    both = emb.select("vec_id", "embedding").unionByName(shifted).persist()
    truth = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs_exact(both, threshold=0.99).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_cosine(
            both, threshold=0.99, dim=64, n_planes=10, n_tables=8
        ).collect()
    }
    both.unpersist()
    assert truth, "planted duplicates must exist"
    assert got <= truth or not truth  # LSH verifies exactly -> no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9
