"""Deterministic sampling/mixing invariants: stability, stratified rates,
split independence from sampling, negative-id safety."""

import pyspark.sql.functions as F
import pytest

from geocore_spark.operators import sampling


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"src{i % 4}") for i in range(4000)]
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_rates_are_respected(corpus):
    out = sampling.stratified_sample(
        corpus, rates={"src0": 1.0, "src1": 0.5, "src2": 0.0}, default_rate=0.25
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["src0"] == 1000          # rate 1.0 keeps everything
    assert "src2" not in counts            # rate 0.0 keeps nothing
    assert 400 <= counts["src1"] <= 600    # ~0.5 of 1000
    assert 150 <= counts["src3"] <= 350    # default 0.25 of 1000


def test_membership_is_stable_under_corpus_changes(corpus):
    full = {
        r["doc_id"]
        for r in sampling.stratified_sample(corpus, {}, default_rate=0.5).collect()
    }
    half = {
        r["doc_id"]
        for r in sampling.stratified_sample(
            corpus.filter(F.col("doc_id") < 2000), {}, default_rate=0.5
        ).collect()
    }
    # removing rows never flips another row's membership
    assert half == {i for i in full if i < 2000}


def test_split_stable_and_disjoint_from_sampling_salt(corpus):
    out = sampling.deterministic_split(corpus, eval_fraction=0.1).persist()
    n_eval = out.filter(F.col("split") == "eval").count()
    assert 320 <= n_eval <= 480  # ~10% of 4000
    # split of a doc is unchanged when the corpus is subsampled first
    sub = sampling.deterministic_split(
        sampling.stratified_sample(corpus, {}, default_rate=0.5), eval_fraction=0.1
    )
    sub_splits = {r["doc_id"]: r["split"] for r in sub.collect()}
    full_splits = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(full_splits[i] == s for i, s in sub_splits.items())
    out.unpersist()


def test_negative_ids_safe(spark):
    df = spark.createDataFrame([(-5, "a"), (-(1 << 40), "a")], ["doc_id", "source"])
    rows = df.select(sampling.hash_bucket(F.col("doc_id")).alias("b")).collect()
    for r in rows:
        assert 0 <= r["b"] < 1_000_000


def test_bucket_matches_sql_twin(spark):
    import duckdb

    ids = [0, 1, 42, 999_983, 2**31 - 1, 2**31, 2**40]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", sampling.hash_bucket(F.col("doc_id"), salt=3).alias("b")
        ).collect()
    }
    expr = sampling.hash_bucket_sql("doc_id", salt=3)
    want = dict(
        duckdb.sql(
            f"SELECT doc_id, {expr} AS b FROM (SELECT unnest({ids}) AS doc_id)"
        ).fetchall()
    )
    assert got == want


def test_string_ids_supported(spark):
    rows = [(f"https://ex.org/{i}", "web") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = sampling.stratified_sample(df, {}, default_rate=0.5)
    n = kept.count()
    assert 800 <= n <= 1200
    # deterministic across invocations
    assert kept.count() == sampling.stratified_sample(df, {}, default_rate=0.5).count()
    split = sampling.deterministic_split(df, eval_fraction=0.1)
    n_eval = split.filter(F.col("split") == "eval").count()
    assert 120 <= n_eval <= 280


def test_null_ids_dropped_from_sample_and_train_in_split(spark):
    df = spark.createDataFrame(
        [(None, "a"), (1, "a"), (2, "a")], "doc_id long, source string"
    )
    kept = sampling.stratified_sample(df, {}, default_rate=1.0)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2}  # null dropped
    split = {r["doc_id"]: r["split"] for r in sampling.deterministic_split(df, 0.99).collect()}
    assert split[None] == "train"  # null never lands in eval


def test_train_shuffle_shards_balanced_and_positions_dense(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = sampling.train_shuffle(df, n_shards=8).persist()
    sizes = {r.shard: r.n for r in out.groupBy("shard").count().withColumnRenamed("count", "n").collect()}
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) / min(sizes.values()) < 1.2  # uniform-ish
    # positions are dense 1..n per shard
    per = out.groupBy("shard").agg(
        F.min("pos").alias("lo"), F.max("pos").alias("hi"), F.count("*").alias("n")
    )
    for r in per.collect():
        assert r.lo == 1 and r.hi == r.n
    out.unpersist()


def test_train_shuffle_string_ids_route_to_fallback(spark):
    # string doc_id cast to long is NULL (ANSI off) — direct hash_bucket
    # would put EVERY row in one NULL shard ordered by raw id (no
    # shuffle at all, silently); the xxhash64 fallback must kick in
    df = spark.createDataFrame(
        [(f"https://ex.org/{i}",) for i in range(4000)], ["doc_id"]
    )
    out = sampling.train_shuffle(df, n_shards=8)
    sizes = {r["shard"]: r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert None not in sizes
    assert set(sizes) == set(range(8))
    assert max(sizes.values()) / min(sizes.values()) < 1.5


def test_bucket_huge_ids_match_sql_twin(spark):
    import duckdb

    # ids near 2^63: salt addition BEFORE the fold overflowed (Spark
    # wrapped, the DuckDB twin errored) — folding first keeps both
    # engines in range and identical
    ids = [2**63 - 1, 2**63 - 12345, -(2**63) + 7]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", sampling.hash_bucket(F.col("doc_id"), salt=7919).alias("b")
        ).collect()
    }
    expr = sampling.hash_bucket_sql("doc_id", salt=7919)
    want = dict(
        duckdb.sql(
            f"SELECT doc_id, {expr} AS b FROM (SELECT unnest({ids}::BIGINT[]) AS doc_id)"
        ).fetchall()
    )
    assert got == want and all(v is not None for v in got.values())


def test_train_shuffle_deterministic_and_shard_stable(spark):
    df = spark.range(5_000).withColumnRenamed("id", "doc_id")
    a = sorted(map(tuple, sampling.train_shuffle(df, n_shards=4).collect()))
    b = sorted(
        map(tuple, sampling.train_shuffle(df.repartition(7), n_shards=4).collect())
    )
    assert a == b  # partitioning cannot change the result
    # dropping docs permutes positions but never moves a doc across shards
    shard_full = {r[0]: r[1] for r in a}
    smaller = sampling.train_shuffle(
        df.filter(F.col("doc_id") % 3 != 0), n_shards=4
    ).collect()
    for r in smaller:
        assert shard_full[r.doc_id] == r.shard
    # order is uncorrelated with corpus order: first rows of shard 0
    first = [r[0] for r in sorted(a, key=lambda t: (t[1], t[2]))[:10]]
    assert first != sorted(first)


# --- UniMax allocation ------------------------------------------------------

from geocore_spark.operators.sampling import unimax_allocation


def _unimax_ref(items, budget, n_epochs):
    """Driver-side reference walk of the UniMax closed form."""
    items = sorted(items, key=lambda kv: (kv[1], kv[0]))
    L = len(items)
    S = 0
    k = 0
    capped = []
    for i, (_g, n) in enumerate(items, 1):
        ri = budget - n_epochs * S
        if k == i - 1 and n_epochs * n * (L - i + 1) <= ri:
            k += 1
            S += n
            capped.append(True)
        else:
            capped.append(False)
    rbal = budget - n_epochs * S
    m_tot = L - k
    base, rem = divmod(rbal, m_tot) if m_tot else (0, 0)
    out = {}
    m = 0
    for (g, n), c in zip(items, capped):
        if c:
            out[g] = n_epochs * n
        else:
            m += 1
            out[g] = base + (1 if m <= rem else 0)
    return out


def test_unimax_matches_reference_walk(spark):
    rows = [(f"s{i}", 1) for i in range(8) for _ in range(3 + i * 2)]
    df = spark.createDataFrame(rows, "source string, one int")
    budget, N = 40, 2
    got = {
        r["source"]: (r["alloc"], r["epochs_milli"])
        for r in unimax_allocation(df, budget=budget, max_epochs=N).collect()
    }
    counts = {f"s{i}": 3 + i * 2 for i in range(8)}
    want = _unimax_ref(list(counts.items()), budget, N)
    assert {g: a for g, (a, _) in got.items()} == want
    # budget fully spent when any slice is uncapped
    assert sum(a for a, _ in got.values()) == budget
    for g, (a, em) in got.items():
        n = counts[g]
        assert a <= N * n
        assert em == (2000 * a + n) // (2 * n)
        assert em <= 1000 * N


def test_unimax_all_capped_and_size_col(spark):
    rows = [("a", 10), ("a", 10), ("b", 5)]
    df = spark.createDataFrame(rows, "source string, n_chars int")
    # budget far above 3 epochs of everything: all capped, leftover unspent
    out = {
        r["source"]: r
        for r in unimax_allocation(
            df, budget=1000, max_epochs=3, size_col="n_chars"
        ).collect()
    }
    assert out["a"]["n_units"] == 20 and out["a"]["alloc"] == 60
    assert out["b"]["n_units"] == 5 and out["b"]["alloc"] == 15
    assert out["a"]["epochs_milli"] == 3000 == out["b"]["epochs_milli"]


def test_unimax_validation(spark):
    df = spark.createDataFrame([("a", 1)], "source string, one int")
    import pytest as _pt

    with _pt.raises(ValueError):
        unimax_allocation(df, budget=-1)
    with _pt.raises(ValueError):
        unimax_allocation(df, budget=10, max_epochs=0)


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_given(
    _st.lists(_st.integers(0, 500), min_size=1, max_size=30),
    _st.integers(0, 5000),
    _st.integers(1, 6),
)
@_settings(max_examples=300, deadline=None)
def test_unimax_reference_invariants(sizes, budget, n_epochs):
    items = [(f"g{i:03d}", n) for i, n in enumerate(sizes)]
    out = _unimax_ref(items, budget, n_epochs)
    total = sum(n for _, n in items)
    spent = sum(out.values())
    if all(out[g] == n_epochs * n for g, n in items):
        assert spent == n_epochs * total <= max(budget, n_epochs * total)
    else:
        assert spent == budget  # any uncapped slice -> budget fully spent
    for g, n in items:
        if n > 0:
            assert out[g] <= n_epochs * n  # cap respected
        else:
            assert out[g] == 0
