"""Repetition-quality text signals (Gopher-style)."""

from pyspark.sql import functions as F

from geocore_spark.functions import text as tx



def test_repetition_signals(spark):
    rows = [
        (1, "a a a a"),                 # all dup words; bigram 'a a' x3
        (2, "w x y z"),                 # no repetition
        (3, ""),                        # empty
        (4, "one"),                     # single token: no bigrams
        (5, "go go go stop go go go"),  # heavy top-bigram share
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    staged = df.select("doc_id", tx.words(F.col("text")).alias("toks")).select(
        "doc_id", "toks", tx.word_bigrams(F.col("toks")).alias("bg")
    )
    got = {
        r["doc_id"]: (r["d"], r["t"])
        for r in staged.select(
            "doc_id",
            F.round(tx.dup_word_ratio(F.col("toks")), 6).alias("d"),
            F.round(tx.top_bigram_share(F.col("bg")), 6).alias("t"),
        ).collect()
    }
    assert got[1] == (0.75, 1.0)
    assert got[2] == (0.0, 0.333333)  # 4 words -> 3 distinct bigrams -> 1/3
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)
    assert got[5] == (0.714286, 0.666667)  # 'go go' 4 of 6 bigrams


def test_compression_ratio_signal(spark):
    from geocore_spark.functions import text as tx

    rows = [
        (1, "spam " * 400),                      # highly repetitive
        (2, "".join(__import__("hashlib").sha256(str(i).encode()).hexdigest()
                    for i in range(40))),        # hash noise: ~4 bits/char
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.ratio for r in df.select(
        "id", tx.compression_ratio_udf()("text").alias("ratio")).collect()}
    assert out[1] < 0.05                 # boilerplate crushes
    assert out[2] > 0.5                  # noise barely compresses
    assert out[3] is None and out[4] is None
    # deterministic across invocations
    out2 = {r.id: r.ratio for r in df.select(
        "id", tx.compression_ratio_udf()("text").alias("ratio")).collect()}
    assert out == out2


def test_extract_text_null_html(spark):
    # a WARC record with no body must yield null text, not a stage abort
    df = spark.createDataFrame(
        [
            ("u1", b"<html><head><title>T</title></head><body><p>hi</p></body></html>"),
            ("u2", None),
        ],
        "url string, html binary",
    )
    got = {
        r["url"]: r["t"]
        for r in df.select(
            "url", tx.extract_text_udf()(F.col("html")).alias("t")
        ).collect()
    }
    assert got == {"u1": "T\nhi", "u2": None}


def test_quality_score_null_text_is_null_not_perfect(spark):
    from geocore_spark.functions import text as tx
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, "the and of is to " * 60)], "id long, text string"
    )
    out = {r["id"]: r["q"] for r in
           df.select("id", tx.quality_score(F.col("text")).alias("q")).collect()}
    # least() skips nulls: without the guard this was a perfect 1.0
    assert out[1] is None
    assert out[2] is not None and 0.0 <= out[2] <= 1.0
    # and a null-text doc must not pass a quality filter
    kept = df.filter(tx.quality_score(F.col("text")) >= 0.0).count()
    assert kept == 1
