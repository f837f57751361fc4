"""Deterministic distributed documents generator (webtext fixture at scale).

The driver's documents.parquet is small (5k rows at sf0.1) — right for
oracles, too small to measure the text pipeline. This generator builds an
arbitrarily large corpus with the same shape (doc_id, text, lang) as pure
Column expressions: ~``words_per_doc`` tokens drawn from a skewed vocab by
per-position hashing, with a deterministic near-dup structure (every 7th
doc reuses its predecessor's text seed) so dedup pipelines have real work.
No Python per row; generation parallelizes across ``partitions`` splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VOCAB = [
    "spark", "batch", "query", "column", "filter", "group", "window", "join",
    "shuffle", "scan", "sort", "hash", "agg", "cell", "tile", "page", "crawl",
    "text", "token", "dedup", "minhash", "band", "bucket", "vector", "index",
    "value", "order", "line", "part", "small", "big", "fast", "slow", "key",
    "geo", "lat", "lon", "zone", "host", "link", "fetch", "parse", "clean",
]
_LANGS = ["en", "de", "fr", "es", None]


def documents(
    spark: SparkSession,
    n: int,
    words_per_doc: int = 80,
    partitions: int = 64,
) -> DataFrame:
    """(doc_id, text, lang) — deterministic, near-dup-rich, fully Column."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    base = spark.range(0, n, 1, partitions).select(F.col("id").alias("doc_id"))
    # every 7th doc shares its predecessor's seed -> exact dup text
    seed = F.when(
        (F.col("doc_id") % 7 == 0) & (F.col("doc_id") > 0), F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_doc)),
        lambda i: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(seed * 1000 + i.cast("long")), F.lit(len(_VOCAB))) + 1)
            .cast("int"),
        ),
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (F.pmod(F.xxhash64(F.col("doc_id") + 99), F.lit(len(_LANGS))) + 1).cast("int"),
    )
    return base.select(
        "doc_id", F.array_join(words, " ").alias("text"), lang.alias("lang")
    )
