"""tf-idf top terms (operators/terms.py)."""

import pytest

from geocore_spark.operators import terms


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
        (4, ""),  # token-less doc: contributes to N, emits no rows
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_values_and_ranking(corpus):
    out = terms.tfidf_top_terms(corpus, k=2).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["doc_freq"], r["tfidf"]))
    # N=4; df: apple 1, banana 2, cherry 2, durian 1
    # idf: ln(4/1)=1.386294, ln(4/2)=0.693147
    assert got[1] == [("apple", 2, 1, 2.772589), ("banana", 1, 2, 0.693147)]
    # doc 2: banana and cherry tie at 0.693147 -> term-asc order
    assert got[2] == [("banana", 1, 2, 0.693147), ("cherry", 1, 2, 0.693147)]
    assert got[3] == [("cherry", 3, 2, 2.079442), ("durian", 1, 1, 1.386294)]
    assert 4 not in got


def test_tfidf_k_one_tie_break(corpus):
    out = terms.tfidf_top_terms(corpus, k=1).collect()
    got = {r["doc_id"]: r["term"] for r in out}
    assert got == {1: "apple", 2: "banana", 3: "cherry"}
    with pytest.raises(ValueError):
        terms.tfidf_top_terms(corpus, k=0)


def test_inverted_index_semantics(spark):
    rows = [
        (1, "a b a c"),
        (2, "b c"),
        (3, "c"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from geocore_spark.operators import terms as tm

    idx = {r.term: r for r in tm.inverted_index(df).collect()}
    assert idx["a"].tf == 2 and idx["a"].doc_freq == 1 and idx["a"].postings == [1]
    assert idx["c"].tf == 3 and idx["c"].postings == [1, 2, 3]
    # min_df prunes hapax terms
    pruned = {r.term for r in tm.inverted_index(df, min_df=2).collect()}
    assert pruned == {"b", "c"}
    import pytest

    with pytest.raises(ValueError):
        tm.inverted_index(df, min_df=0)


def test_null_id_rows_dropped_not_df_inflating(spark):
    # a null-id row's terms inflated doc_freq while being invisible to
    # N -> df > N -> NEGATIVE idf mis-ranking the term
    rows = [(1, "apple banana"), (2, "apple"), (None, "apple apple")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = terms.tfidf_top_terms(df, k=5).collect()
    assert all(r["doc_id"] is not None for r in out)
    apple = [r for r in out if r["term"] == "apple"]
    assert apple and all(r["doc_freq"] == 2 and r["tfidf"] >= 0.0 for r in apple)
