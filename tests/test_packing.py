"""Sequence packing invariants: exactly-once assignment, budget respected,
determinism, FFD model equivalence, utilization sanity."""

import pyspark.sql.functions as F
import pytest

from geocore_spark.operators import packing


@pytest.fixture(scope="module")
def chunks(spark):
    # deterministic synthetic chunk table: token counts 5..96, a few
    # oversized rows (> budget 100) to exercise the singleton rule
    rows = []
    for doc in range(40):
        for start in range(1, 6):
            rows.append((doc, start, 5 + (doc * 37 + start * 13) % 92))
    rows += [(97, 1, 250), (98, 1, 101)]
    return spark.createDataFrame(rows, ["doc_id", "start", "n_tokens"])


BUDGET = 100


def test_exactly_once_and_budget(chunks):
    packed = packing.pack_sequences(chunks, budget=BUDGET, n_groups=8).persist()
    n_in = chunks.count()
    assert packed.count() == n_in
    assert packed.select("doc_id", "start").distinct().count() == n_in

    stats = packing.pack_stats(packed).collect()
    for r in stats:
        if r["pack_tokens"] > BUDGET:
            # only legal as a singleton oversized chunk
            assert r["n_chunks"] == 1
    # totals preserved
    assert sum(r["pack_tokens"] for r in stats) == (
        chunks.agg(F.sum("n_tokens")).collect()[0][0]
    )
    packed.unpersist()


def test_deterministic(chunks):
    a = sorted(map(tuple, packing.pack_sequences(chunks, BUDGET, n_groups=8).collect()))
    b = sorted(map(tuple, packing.pack_sequences(chunks, BUDGET, n_groups=8).collect()))
    assert a == b


def test_matches_local_ffd_model(chunks):
    # n_groups=1 -> the distributed result must equal the local FFD walk
    # over the (doc_id, start)-sorted chunk list
    packed = {
        (r["doc_id"], r["start"]): r["pack_id"]
        for r in packing.pack_sequences(chunks, BUDGET, n_groups=1).collect()
    }
    local = sorted(
        (r["doc_id"], r["start"], r["n_tokens"]) for r in chunks.collect()
    )
    model = packing._ffd_pack([c for _, _, c in local], BUDGET)
    for (doc, start, _), want in zip(local, model):
        assert packed[(doc, start)] == want


def test_ffd_kernel_edges():
    assert packing._ffd_pack([], 10) == []
    assert packing._ffd_pack([11], 10) == [0]  # oversized -> own pack
    assert packing._ffd_pack([6, 6, 6], 10) == [0, 1, 2]
    # decreasing order packs big-first: 7 with 3, 5 with 5
    assert packing._ffd_pack([5, 7, 3, 5], 10) == [1, 0, 0, 1]


def test_utilization_beats_naive_sequential(chunks):
    # FFD within groups should reach high utilization on this mix
    packed = packing.pack_sequences(
        chunks.filter(F.col("n_tokens") <= BUDGET), BUDGET, n_groups=4
    )
    stats = packing.pack_stats(packed).collect()
    total = sum(r["pack_tokens"] for r in stats)
    assert total / (len(stats) * BUDGET) >= 0.8


def test_budget_validation(chunks):
    with pytest.raises(ValueError):
        packing.pack_sequences(chunks, budget=0)


# --- hypothesis invariants on the pure-Python FFD kernel -------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(1, 50), max_size=60), st.integers(10, 60))
@settings(max_examples=300, deadline=None)
def test_ffd_kernel_invariants(counts, budget):
    pack_of = packing._ffd_pack(counts, budget)
    assert len(pack_of) == len(counts)          # every chunk assigned once
    loads = {}
    for c, p in zip(counts, pack_of):
        loads.setdefault(p, []).append(c)
    if loads:
        assert set(loads) == set(range(len(loads)))  # contiguous pack ids
    for members in loads.values():
        # budget respected unless a single oversized chunk owns the pack
        assert sum(members) <= budget or len(members) == 1
    # pack count never exceeds the trivial one-chunk-per-pack bound and
    # never beats the volume lower bound
    if counts and all(c <= budget for c in counts):
        import math
        assert math.ceil(sum(counts) / budget) <= len(loads) <= len(counts)


@given(st.lists(st.integers(1, 50), max_size=40), st.integers(10, 60))
@settings(max_examples=200, deadline=None)
def test_ffd_kernel_deterministic(counts, budget):
    assert packing._ffd_pack(counts, budget) == packing._ffd_pack(counts, budget)


def _naive_first_fit(counts, budget):
    # reference model: the plain O(n·packs) first-fit-decreasing walk the
    # segment-tree kernel must replicate assignment-for-assignment
    order = sorted(range(len(counts)), key=lambda i: (-counts[i], i))
    pack_of = [0] * len(counts)
    loads = []
    for i in order:
        c = counts[i]
        for p, load in enumerate(loads):
            if load + c <= budget:
                loads[p] = load + c
                pack_of[i] = p
                break
        else:
            loads.append(c)
            pack_of[i] = len(loads) - 1
    return pack_of


@given(st.lists(st.integers(0, 120), max_size=80), st.integers(1, 70))
@settings(max_examples=300, deadline=None)
def test_ffd_kernel_matches_naive_first_fit(counts, budget):
    # includes zeros and oversized chunks: zeros must join the leftmost
    # NON-overloaded pack, never an oversized singleton
    assert packing._ffd_pack(counts, budget) == _naive_first_fit(counts, budget)


def test_string_ids_round_trip(spark):
    # id columns must keep their type: a long cast would NULL string ids
    rows = [(f"doc-{i}", f"s{j}", 5 + (i * 7 + j) % 60) for i in range(20) for j in range(3)]
    chunks = spark.createDataFrame(rows, ["doc_id", "start", "n_tokens"])
    packed = packing.pack_sequences(chunks, budget=64, n_groups=4).collect()
    assert len(packed) == len(rows)
    assert {(r["doc_id"], r["start"]) for r in packed} == {(a, b) for a, b, _ in rows}
    assert all(r["doc_id"] is not None for r in packed)


def test_null_token_count_gets_own_pack(spark):
    rows = [(1, 1, 30), (1, 2, None), (2, 1, 30), (2, 2, None)]
    chunks = spark.createDataFrame(rows, "doc_id long, start long, n_tokens long")
    packed = packing.pack_sequences(chunks, budget=100, n_groups=1).collect()
    assert len(packed) == 4  # exactly-once even for null counts
    by_pack = {}
    for r in packed:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        if any(m["n_tokens"] is None for m in members):
            assert len(members) == 1  # null count -> singleton pack
