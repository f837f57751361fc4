"""Bloom filter + Bloom-prefiltered decontamination (operators/bloom.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import bloom, decontam


def test_params_sizing():
    m, k = bloom._params(10_000, 0.01)
    # textbook sizing: ~9.59 bits/element, k ~ 7 at 1% fpr
    assert 90_000 <= m <= 100_000 and k == 7
    assert m % 8 == 0
    with pytest.raises(ValueError):
        bloom._params(10, 1.5)


def test_build_and_probe_no_false_negatives(spark):
    hashes = spark.range(5000).select(F.xxhash64("id").alias("gram"))
    bf = bloom.build_bloom(hashes, capacity=5000, fpr=0.01)
    member = np.array([r.gram for r in hashes.collect()], dtype=np.int64)
    assert bloom.BloomFilter(bf.m_bits, bf.k, bf.bits).contains_np(member).all()
    # disjoint probes: fpr should be near the target (loose 5x bound)
    other = (
        spark.range(5000, 25000).select(F.xxhash64("id").alias("gram")).collect()
    )
    probes = np.array([r.gram for r in other], dtype=np.int64)
    rate = bf.contains_np(probes).mean()
    assert rate < 0.05


def test_bloom_udf_matches_local(spark):
    hashes = spark.range(1000).select(F.xxhash64("id").alias("gram"))
    bf = bloom.build_bloom(hashes, capacity=1000, fpr=0.01)
    contains = bloom.bloom_contains_udf(spark, bf)
    got = (
        spark.range(3000)
        .select("id", F.xxhash64("id").alias("h"))
        .select("id", contains(F.col("h")).alias("hit"))
        .collect()
    )
    local = bf.contains_np(
        np.array(
            [r.h for r in spark.range(3000).select(F.xxhash64("id").alias("h")).collect()],
            dtype=np.int64,
        )
    )
    assert [r.hit for r in sorted(got, key=lambda r: r.id)] == list(local)


@pytest.fixture(scope="module")
def corpus(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    docs = d.filter(F.col("doc_id") % 97 != 0)
    return docs, bench


def test_decontaminate_bloom_equals_exact(corpus):
    docs, bench = corpus
    exact = sorted(
        map(tuple, decontam.decontaminate(docs, bench, n=3).collect())
    )
    got = sorted(
        map(tuple, bloom.decontaminate_bloom(docs, bench, n=3).collect())
    )
    assert got == exact and len(exact) > 0


def test_decontaminate_bloom_unverified_superset(corpus):
    docs, bench = corpus
    exact = dict(
        map(tuple, decontam.decontaminate(docs, bench, n=3).collect())
    )
    loose = dict(
        map(
            tuple,
            bloom.decontaminate_bloom(docs, bench, n=3, verify=False).collect(),
        )
    )
    # no false negatives: every exact hit present with >= the exact count
    for doc_id, cnt in exact.items():
        assert loose.get(doc_id, 0) >= cnt


def test_decontaminate_bloom_empty_benchmark(spark, corpus):
    docs, _ = corpus
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = bloom.decontaminate_bloom(docs, empty, n=3)
    assert out.columns == ["doc_id", "overlap_ngrams"] and out.count() == 0
