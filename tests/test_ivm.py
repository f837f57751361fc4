"""Incremental view maintenance (operators/ivm.refresh_rollup):
count/sum rollups maintained from the snapshot change feed in
O(changed bytes), exactly-once via the rollup table's txn tokens.

Pinned here: incremental result == full recompute after every commit
pattern (append, delete, zero-count key removal); refresh idempotence;
the foreign-table double-count guard; gap fallback on overwrite."""

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import ivm
from geocore_spark.sources import snapshots as snap


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "roll")


def _src(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("grp", F.col("id") % 7)
        .withColumn("v", F.col("id") * 2)
    )


def _expect(spark, src_root):
    return (
        snap.read_snapshot(spark, src_root)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("v").cast("long")).alias("sum_v"),
        )
    )


def _same(a, b):
    ka = sorted(tuple(r) for r in a.collect())
    kb = sorted(tuple(r) for r in b.collect())
    assert ka == kb, (ka[:5], kb[:5])


def test_incremental_equals_full_recompute(spark, roots):
    src, roll = roots
    snap.create_table(spark, src, _src(spark, 0, 100).repartition(2))
    r1 = ivm.refresh_rollup(spark, src, roll, ["grp"], {"sum_v": "v"})
    assert r1 == {"applied_from": 0, "applied_to": 1, "mode": "incremental"}
    _same(snap.read_snapshot(spark, roll).select("grp", "n_rows", "sum_v"),
          _expect(spark, src))
    # append + delete, refresh applies only the delta
    snap.append(spark, src, _src(spark, 100, 160))
    snap.delete_where(spark, src, "id % 4 = 1")
    r2 = ivm.refresh_rollup(spark, src, roll, ["grp"], {"sum_v": "v"})
    assert r2 == {"applied_from": 1, "applied_to": 3, "mode": "incremental"}
    _same(snap.read_snapshot(spark, roll).select("grp", "n_rows", "sum_v"),
          _expect(spark, src))
    # idempotent: nothing new -> noop, rollup version unchanged
    v = snap.latest_version(spark, roll)
    assert ivm.refresh_rollup(spark, src, roll, ["grp"], {"sum_v": "v"})[
        "mode"
    ] == "noop"
    assert snap.latest_version(spark, roll) == v


def test_zero_count_keys_disappear(spark, roots):
    src, roll = roots
    snap.create_table(spark, src, _src(spark, 0, 70))  # grp 0..6, 10 each
    ivm.refresh_rollup(spark, src, roll, ["grp"])
    snap.delete_where(spark, src, "grp = 3")
    ivm.refresh_rollup(spark, src, roll, ["grp"])
    got = snap.read_snapshot(spark, roll)
    assert got.filter("grp = 3").count() == 0
    assert got.count() == 6
    # and it comes BACK when rows reappear
    snap.append(spark, src, _src(spark, 700, 710).filter("grp = 3"))  # id 703
    ivm.refresh_rollup(spark, src, roll, ["grp"])
    assert snap.read_snapshot(spark, roll).filter("grp = 3").count() == 1


def test_foreign_rollup_table_refused(spark, roots):
    src, roll = roots
    snap.create_table(spark, src, _src(spark, 0, 10))
    snap.create_table(spark, roll, spark.range(3))  # not built by ivm
    with pytest.raises(ValueError, match="no applied-version token"):
        ivm.refresh_rollup(spark, src, roll, ["grp"])


def test_two_views_independent_tokens(spark, roots):
    src, roll = roots
    snap.create_table(spark, src, _src(spark, 0, 50))
    ivm.refresh_rollup(spark, src, roll, ["grp"], view_id="a")
    snap.append(spark, src, _src(spark, 50, 60))
    # view "b" at a different root starts from scratch, applies all of it
    roll_b = roll + "_b"
    rb = ivm.refresh_rollup(spark, src, roll_b, ["grp"], view_id="b")
    assert rb["applied_from"] == 0 and rb["applied_to"] == 2
    _same(snap.read_snapshot(spark, roll_b).select("grp", "n_rows"),
          _expect(spark, src).select("grp", "n_rows"))


def test_gap_fallback_on_overwrite(spark, roots):
    src, roll = roots
    snap.create_table(spark, src, _src(spark, 0, 40))
    ivm.refresh_rollup(spark, src, roll, ["grp"], {"sum_v": "v"})
    snap.overwrite(spark, src, _src(spark, 1000, 1100))  # replace wholesale
    with pytest.raises(ValueError, match="overwrite"):
        ivm.refresh_rollup(spark, src, roll, ["grp"], {"sum_v": "v"})
    r = ivm.refresh_rollup(
        spark, src, roll, ["grp"], {"sum_v": "v"}, full_refresh_on_gap=True
    )
    assert r["mode"] == "full"
    _same(snap.read_snapshot(spark, roll).select("grp", "n_rows", "sum_v"),
          _expect(spark, src))
    # and incremental resumes after the full rebase
    snap.append(spark, src, _src(spark, 1100, 1120))
    r = ivm.refresh_rollup(spark, src, roll, ["grp"], {"sum_v": "v"})
    assert r["mode"] == "incremental"
    _same(snap.read_snapshot(spark, roll).select("grp", "n_rows", "sum_v"),
          _expect(spark, src))


def test_validation(spark, roots):
    src, roll = roots
    snap.create_table(spark, src, _src(spark, 0, 10))
    with pytest.raises(ValueError, match="keys must be non-empty"):
        ivm.refresh_rollup(spark, src, roll, [])
    with pytest.raises(ValueError, match="collides"):
        ivm.refresh_rollup(spark, src, roll, ["grp"], {"n_rows": "v"})


def test_concurrent_refresh_same_view_no_double_count(spark, roots, monkeypatch):
    # the applied-version token and the rollup content must come from the
    # SAME manifest: a concurrent refresh of this view committing between
    # the two reads would otherwise hand us content that already contains
    # part of our delta, and the merge would double-count it
    src, roll = roots
    snap.create_table(spark, src, _src(spark, 0, 40))  # src v1
    ivm.refresh_rollup(spark, src, roll, ["grp"], {"sum_v": "v"})  # token=1
    snap.append(spark, src, _src(spark, 40, 60))  # src v2
    snap.append(spark, src, _src(spark, 60, 80))  # src v3
    app = "ivm:grp;sum_v"  # the default view_id for these keys+sums

    orig = snap.read_changes
    state = {"raced": False}

    def racing(sp, rt, since, until=None):
        if not state["raced"]:
            state["raced"] = True
            # a concurrent refresh of the SAME view lands, applied to v2
            full2 = ivm._full_rollup(
                snap.read_snapshot(sp, src, 2), ["grp"], {"sum_v": "v"}
            )
            snap.overwrite(sp, roll, full2, txn=(app, 2))
        return orig(sp, rt, since, until)

    monkeypatch.setattr(snap, "read_changes", racing)
    r = ivm.refresh_rollup(spark, src, roll, ["grp"], {"sum_v": "v"})
    assert r["applied_to"] == 3
    _same(
        snap.read_snapshot(spark, roll).select("grp", "n_rows", "sum_v"),
        _expect(spark, src),
    )
