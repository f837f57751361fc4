"""co_occurrence + transition_counts vs Python oracles."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import cooccur


def test_cooccurrence_counts_and_lift(spark):
    rows = [
        ("u1", "x"), ("u1", "y"), ("u1", "x"),  # dup collapses
        ("u2", "x"), ("u2", "y"),
        ("u3", "x"), ("u3", "z"),
        ("u4", "q"),
    ]
    df = spark.createDataFrame(rows, "e string, i string")
    out = {(r["item_a"], r["item_b"]): r for r in
           cooccur.co_occurrence(df, "e", "i").collect()}
    assert out[("x", "y")]["pair_n"] == 2
    assert out[("x", "y")]["n_a"] == 3 and out[("x", "y")]["n_b"] == 2
    # N = 4 entities; lift = 2*4/(3*2)
    assert out[("x", "y")]["lift"] == 2 * 4 / (3 * 2)
    assert out[("x", "z")]["pair_n"] == 1


def test_cooccurrence_cap_drops_power_entities(spark):
    rows = [("big", str(i)) for i in range(20)] + [
        ("a", "1"), ("a", "2"), ("b", "1"), ("b", "2")
    ]
    df = spark.createDataFrame(rows, "e string, i string")
    out = {(r["item_a"], r["item_b"]): r["pair_n"] for r in
           cooccur.co_occurrence(df, "e", "i", max_items_per_entity=10).collect()}
    assert out == {("1", "2"): 2}  # big's 190 pairs gone
    with pytest.raises(ValueError):
        cooccur.co_occurrence(df, "e", "i", max_items_per_entity=1)


def test_cooccurrence_random_matches_brute(spark):
    rng = random.Random(42)
    ents = {f"u{i}": set(rng.sample("abcdefghij", rng.randrange(1, 6)))
            for i in range(30)}
    rows = [(e, i) for e, items in ents.items() for i in items]
    df = spark.createDataFrame(rows, "e string, i string")
    out = {(r["item_a"], r["item_b"]): (r["pair_n"], r["n_a"], r["n_b"])
           for r in cooccur.co_occurrence(df, "e", "i").collect()}
    items = sorted({i for s in ents.values() for i in s})
    expect = {}
    for a, b in itertools.combinations(items, 2):
        pn = sum(1 for s in ents.values() if a in s and b in s)
        if pn:
            na = sum(1 for s in ents.values() if a in s)
            nb = sum(1 for s in ents.values() if b in s)
            expect[(a, b)] = (pn, na, nb)
    assert out == expect


def test_transitions_counts_and_probabilities(spark):
    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "a"), ("u1", 4, "b"),
        ("u2", 1, "a"), ("u2", 2, "b"),
        ("u3", 5, "c"),  # single state: no steps
    ]
    df = spark.createDataFrame(rows, "e string, o long, s string")
    out = {(r["src"], r["dst"]): (r["n"], r["out_n"], r["p_micro"]) for r in
           cooccur.transition_counts(df, "e", "o", "s").collect()}
    assert out == {
        ("a", "b"): (3, 3, 1_000_000),
        ("b", "a"): (1, 1, 1_000_000),
    }


def test_transitions_mixed_branching(spark):
    rows = [("u", i, s) for i, s in enumerate("aabacab")]
    df = spark.createDataFrame(rows, "e string, o long, s string")
    out = {(r["src"], r["dst"]): (r["n"], r["p_micro"]) for r in
           cooccur.transition_counts(df, "e", "o", "s").collect()}
    # steps: a->a, a->b, b->a, a->c, c->a, a->b
    assert out[("a", "b")] == (2, 500_000)
    assert out[("a", "a")] == (1, 250_000)
    assert out[("a", "c")] == (1, 250_000)
    assert out[("b", "a")] == (1, 1_000_000)
    assert out[("c", "a")] == (1, 1_000_000)
