"""Regression pins for the ninth-session review findings (inverted-index
null ids, BM25 query normalization, DSIR mode agreement, checkpoint
unknown-provenance invalidation, streaming-dedup TTL validation)."""

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import retrieval, selection, terms


def test_inverted_index_drops_null_doc_ids(spark):
    df = spark.createDataFrame(
        [(1, "zebra apple"), (None, "zebra"), (2, "apple")],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in terms.inverted_index(df).collect()}
    # the null-id occurrence must not inflate tf past the posting list
    assert out["zebra"]["tf"] == 1
    assert out["zebra"]["doc_freq"] == 1 and out["zebra"]["postings"] == [1]
    assert out["apple"]["doc_freq"] == 2
    for r in out.values():
        assert r["doc_freq"] >= 1 and len(r["postings"]) == r["doc_freq"]


def test_bm25_normalizes_query_terms_like_corpus_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "new york city"), (2, "old boston town")], "doc_id long, text string"
    )
    # embedded + trailing whitespace and case: previously matched nothing
    hit = retrieval.bm25_topk(docs, ["New york ", "CITY"], k=5).collect()
    assert [r["doc_id"] for r in hit] == [1]
    assert hit[0]["n_query_terms"] == 3
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, ["   "], k=5)


def test_dsir_exact_frac_applies_to_scored_population(spark):
    # 4 scorable docs + 4 token-less docs: frac=0.5 must keep 2 (half of
    # the SCORED set), not ceil(0.5*8)=4 (the whole scored set)
    rows = [(i, f"common word{'x' * i}") for i in range(4)]
    rows += [(i + 10, None) for i in range(4)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame([(0, "common wordx")], "doc_id long, text string")
    kept = selection.dsir_select(raw, target, frac=0.5, mode="exact")
    assert kept.count() == 2


def test_checkpoint_unknown_provenance_invalidates_even_none_params(
    spark, tmp_path
):
    from geocore_spark.plans.checkpoint import StageCheckpoint

    root = str(tmp_path / "ckpt")
    cm = StageCheckpoint(spark, root)
    cm.run("scrub", lambda: spark.range(5))
    # simulate a pre-chain manifest: strip the recorded chain
    m = cm._manifest()
    m.pop("chain", None)
    cm._commit(m)
    # params=None must NOT match the synthesized unknown-provenance entry
    stale = cm.reconcile_chain([("scrub", None)])
    assert stale == ["scrub"]
    assert "scrub" not in cm.stages()


def test_streaming_dedup_ttl_validation():
    from geocore_spark.streaming import stateful

    with pytest.raises(ValueError):
        stateful.streaming_url_dedup(None, ttl_minutes=0)
    with pytest.raises(ValueError):
        stateful.streaming_url_dedup(None, ttl_minutes=-5)


def test_frontier_null_discovered_ts_does_not_poison_schedule(spark):
    import datetime as dt

    from geocore_spark.streaming import frontier

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("h.com", "https://h.com/a", 1.0, base),
        ("h.com", "https://h.com/b", 0.5, None),  # NaT = INT64_MIN hazard
        ("h.com", "https://h.com/c", 0.2, base),
    ]
    df = spark.createDataFrame(
        rows, "host string, url string, priority double, discovered_ts timestamp"
    )
    out = frontier.crawl_frontier(df, delay_seconds=5.0).orderBy("scheduled_ts")
    got = [(r["url"], r["scheduled_ts"]) for r in out.collect()]
    assert len(got) == 3
    # schedule is finite, 5s apart, and the dated rows anchor the chain
    times = [t for _, t in got]
    assert all(t.year == 2024 for t in times)
    deltas = {(b - a).total_seconds() for a, b in zip(times, times[1:])}
    assert deltas == {5.0}


def test_frontier_host_col_collision_raises(spark):
    from geocore_spark.streaming import frontier

    df = spark.createDataFrame(
        [("x", "y", "u", 1.0, None)],
        "host string, domain string, url string, priority double, "
        "discovered_ts timestamp",
    )
    with pytest.raises(ValueError):
        frontier.crawl_frontier(df, host_col="domain")


def test_robots_filter_normalizes_case_and_port(spark):
    from geocore_spark.functions import robots as rb

    urls = spark.createDataFrame(
        [
            (1, "https://example.com/private/x"),
            (2, "https://EXAMPLE.com:8080/private/y"),
            (3, "https://example.com/public"),
        ],
        "id long, url string",
    )
    cache = spark.createDataFrame(
        [("Example.com", "User-agent: *\nDisallow: /private")],
        "host string, robots_txt string",
    )
    kept = {r["id"] for r in rb.robots_filter(urls, cache).collect()}
    # pre-fix: the case/port mismatches joined nothing -> fail-open kept 1,2
    assert kept == {3}
