"""Real BPE tokenizer (functions/bpe.py): deterministic merge learning,
greedy encoding, Arrow-batched counting."""

import pyspark.sql.functions as F

from geocore_spark.functions import bpe


CORPUS = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]


def test_learn_bpe_classic_corpus():
    # Sennrich et al. 2016 running example: 'es' (9) wins round one,
    # then 'es'+'t' (9), then 'est</w>' (9), then 'l'+'o' (7), 'lo'+'w' (7)
    merges = bpe.learn_bpe(CORPUS, n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_learn_bpe_deterministic_tie_break():
    # every pair has frequency 1 -> ties broken lexicographically, so the
    # merge list is a pure function of the corpus, not dict order
    m1 = bpe.learn_bpe(["ab cd"], n_merges=3)
    m2 = bpe.learn_bpe(["ab cd"], n_merges=3)
    assert m1 == m2 == [("a", "b"), ("ab", "</w>"), ("c", "d")]


def test_encode_word_applies_merges_greedily():
    merges = bpe.learn_bpe(CORPUS, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    # 'lowest' was never seen whole, but its pieces were: 'low' + 'est</w>'
    toks = bpe.encode_word("lowest", ranks)
    assert "".join(toks) == "lowest</w>"
    assert len(toks) < len("lowest") + 1  # actually merged something
    # unseen symbols stay as characters but still round-trip
    assert "".join(bpe.encode_word("zq", ranks)) == "zq</w>"


def test_encode_text_concatenates_word_encodings():
    merges = bpe.learn_bpe(CORPUS, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    toks = bpe.encode_text("low newest", ranks)
    assert toks == bpe.encode_word("low", ranks) + bpe.encode_word("newest", ranks)


def test_encode_udf_matches_driver_encoding(spark):
    merges = bpe.learn_bpe(CORPUS, n_merges=20)
    ranks = {m: i for i, m in enumerate(merges)}
    rows = [(1, "low newest"), (2, ""), (3, None), (4, "Wid-est 77")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    enc = bpe.bpe_encode_udf(merges)
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select("doc_id", enc(F.col("text")).alias("toks")).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == bpe.encode_text(text or "", ranks), doc_id


def test_distributed_training_matches_collect_texts_path(spark):
    # the 100-TB shape (Spark word-freq summary -> driver merge loop)
    # must learn EXACTLY the merges the collect-raw-texts path learns;
    # texts include Unicode whitespace (NBSP, NEL) and mixed case so a
    # JVM-regex segmentation skew would be caught here
    texts = [
        "low lower NEWEST newest widest",
        "café\xa0menu, café menu!",  # NBSP between words
        "line one\x85line two",  # NEL between words
        "",
        None,
        "widest newest newest 7 7 7 ...",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    expected = bpe.learn_bpe([t for t in texts if t], n_merges=25)
    got = bpe.learn_bpe_distributed(df, "text", n_merges=25)
    assert got == expected


def test_word_freq_table_top_k_deterministic(spark):
    df = spark.createDataFrame(
        [("b b b a a c",), ("a d d",)], ["text"]
    )
    full = bpe.word_freq_table(df)
    assert full == [("a", 3), ("b", 3), ("d", 2), ("c", 1)]
    # top_k cuts on (freq desc, word asc) — 'a' beats 'b' on the tie
    assert bpe.word_freq_table(df, top_k=2) == [("a", 3), ("b", 3)]
    assert bpe.word_freq_table(df, top_k=3) == [("a", 3), ("b", 3), ("d", 2)]


def test_learn_from_word_freqs_weights_frequencies():
    # 'es' dominates only through the freq column — raw pair counts tie
    merges = bpe.learn_bpe_from_word_freqs([("es", 9), ("xy", 1)], n_merges=1)
    assert merges == [("e", "s")]


def test_token_count_udf_matches_driver_encoding(spark):
    merges = bpe.learn_bpe(CORPUS, n_merges=20)
    ranks = {m: i for i, m in enumerate(merges)}
    rows = [
        (1, "low lower newest"),
        (2, "the widest low low"),
        (3, ""),
        (4, None),
        (5, "Mixed CASE Punct, here!"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    counter = bpe.bpe_token_count_udf(merges)
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", counter(F.col("text")).alias("n")).collect()
    }
    for doc_id, text in rows:
        expected = len(bpe.encode_text(text or "", ranks))
        assert got[doc_id] == expected, (doc_id, text)
    assert got[3] == 0 and got[4] == 0
