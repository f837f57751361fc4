"""Model-based randomized check of the snapshot op algebra.

A seeded random sequence of commits — append, delete_where, merge_into,
rewrite_files, compact_snapshot — runs against BOTH the real table and a
pure-Python model (a list of (id, v) rows plus the expected change-feed
ledger). After every commit and at the end:

- ``read_snapshot`` must equal the model multiset exactly;
- ``read_changes(0)`` must equal the ledger the model accumulated
  (append -> inserts; delete -> the removed rows; merge -> the matched
  old rows as deletes + the batch as inserts; rewrite/compact ->
  nothing).

Single-op semantics are pinned elsewhere; this exercises the
COMPOSITIONS a hand-written test never enumerates (delete vectors
crossing a later merge, merges tombstoning rows a rewrite materialized,
compaction mid-ledger, ...). Deterministic seeds, so a failure replays.
"""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from geocore_spark.sources import snapshots as snap

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("v", LongType())]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap_rows(spark, root):
    return sorted(
        (r["id"], r["v"]) for r in snap.read_snapshot(spark, root).collect()
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_random_commit_sequences_match_model(spark, root_factory, seed):
    root = root_factory(f"model{seed}")
    rng = random.Random(seed)
    next_id = 0

    def fresh_rows(n, vmul):
        nonlocal next_id
        rows = [(next_id + i, (next_id + i) * vmul) for i in range(n)]
        next_id += n
        return rows

    model = fresh_rows(40, 3)
    ledger = [("insert", i, v, 1) for i, v in model]
    snap.create_table(spark, root, _df(spark, model).repartition(2))
    version = 1

    for _ in range(10):
        op = rng.choice(["append", "delete", "merge", "merge", "rewrite", "compact"])
        if op == "append":
            batch = fresh_rows(rng.randint(1, 25), rng.randint(1, 9))
            snap.append(spark, root, _df(spark, batch))
            version += 1
            model += batch
            ledger += [("insert", i, v, version) for i, v in batch]
        elif op == "delete":
            mod = rng.randint(2, 7)
            res = rng.randrange(mod)
            m, n = snap.delete_where(spark, root, f"id % {mod} = {res}")
            victims = [(i, v) for i, v in model if i % mod == res]
            assert n == len(victims)
            if victims:
                version += 1
                assert m["version"] == version
                model = [(i, v) for i, v in model if i % mod != res]
                ledger += [("delete", i, v, version) for i, v in victims]
        elif op == "merge":
            # mix of recycled ids (possible matches) and brand-new ones
            lo = rng.randrange(max(next_id, 1))
            touched = list(range(lo, min(lo + rng.randint(1, 20), next_id)))
            vmul = rng.randint(10, 99)
            batch = [(i, i * vmul) for i in touched] + fresh_rows(
                rng.randint(0, 10), vmul
            )
            if not batch:
                continue
            m, stats = snap.merge_into(spark, root, _df(spark, batch), ["id"])
            version += 1
            bids = {i for i, _ in batch}
            matched = [(i, v) for i, v in model if i in bids]
            assert stats["rows_tombstoned"] == len(matched)
            assert stats["rows_written"] == len(batch)
            model = [(i, v) for i, v in model if i not in bids] + batch
            ledger += [("delete", i, v, version) for i, v in matched]
            ledger += [("insert", i, v, version) for i, v in batch]
        elif op == "rewrite":
            snap.rewrite_files(spark, root, n_files=rng.randint(1, 3))
            version += 1
        elif op == "compact":
            rep = snap.compact_snapshot(
                spark, root, small_bytes=1 << 30, target_bytes=2 << 30
            )
            if rep["files_compacted"]:
                version += 1
                assert rep["version"] == version

        assert snap.latest_version(spark, root) == version
        assert _snap_rows(spark, root) == sorted(model), f"state diverged after {op}"

    got = sorted(
        (r["_change_type"], r["id"], r["v"], r["_commit_version"])
        for r in snap.read_changes(spark, root, 0).collect()
    )
    assert got == sorted(ledger), "change feed diverged from the ledger"


@pytest.fixture()
def root_factory(tmp_path):
    def make(name):
        return str(tmp_path / name)

    return make
