"""JSONL connector: round-trip, pinned schema, corrupt-line tolerance."""

import gzip
import os

from pyspark.sql import functions as F

from geocore_spark.sources import jsonl


def test_roundtrip_gz(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = str(tmp_path / "dump")
    jsonl.write_jsonl(docs, out)
    assert any(f.endswith(".json.gz") for f in os.listdir(out))
    back = jsonl.read_jsonl(spark, out)
    assert back.schema == docs.select(*back.columns).schema
    assert back.count() == docs.count()
    # value-level: fingerprint of (doc_id, text) multiset survives
    fp = lambda d: d.agg(  # noqa: E731
        F.bit_xor(F.xxhash64("doc_id", "text")).alias("s")
    ).collect()[0].s
    assert fp(back) == fp(docs)


def test_corrupt_lines_survive(spark, tmp_path):
    p = tmp_path / "bad.jsonl.gz"
    lines = [
        b'{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}',
        b"{this is not json",
        b'{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}',
    ]
    with gzip.open(p, "wb") as f:
        f.write(b"\n".join(lines))

    clean = jsonl.read_jsonl(spark, str(p))
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]

    kept = jsonl.read_jsonl(spark, str(p), keep_corrupt=True).cache()
    try:
        assert kept.count() == 3
        bad = kept.filter(F.col(jsonl.CORRUPT_COL).isNotNull()).collect()
        assert len(bad) == 1 and bad[0].doc_id is None
    finally:
        kept.unpersist()


def test_keep_corrupt_does_not_mutate_schema(spark, tmp_path):
    import gzip

    from pyspark.sql import types as T

    p = tmp_path / "x.jsonl.gz"
    with gzip.open(p, "wb") as f:
        f.write(b'{"doc_id": 1, "text": "t", "lang": "en", "source": "s", "n_chars": 1}')
    before = len(jsonl.DOC_SCHEMA.fields)
    custom = T.StructType([T.StructField("doc_id", T.LongType())])
    jsonl.read_jsonl(spark, str(p), keep_corrupt=True)
    jsonl.read_jsonl(spark, str(p), schema=custom, keep_corrupt=True)
    assert len(jsonl.DOC_SCHEMA.fields) == before
    assert len(custom.fields) == 1
    # default read after a keep_corrupt call still has the pinned 5 columns
    assert jsonl.read_jsonl(spark, str(p)).columns == [
        "doc_id", "text", "lang", "source", "n_chars"
    ]
