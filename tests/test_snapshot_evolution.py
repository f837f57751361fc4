"""Schema evolution + incremental change feed on the snapshot log
(sources/snapshots.add_columns / drop_columns / read_changes), plus the
stale-base concurrency guard on rewrite/rollback.

Load-bearing physics pinned here:

- evolution is METADATA-ONLY: the evolve commit lists the same data
  files; old rows come back NULL in added columns because every reader
  scans with the manifest's explicit schema (name-based reconciliation);
- once-used column names are burned (column_history) — re-adding one
  would resurrect values still physically present in live files;
- read_changes reads ONLY delta files (insert pieces) and vector-named
  files (delete pieces) — never the whole table;
- the rewrite/rollback race window between load_manifest and the commit
  loop is closed: a commit landing in between raises ConcurrentCommit
  instead of being silently clobbered.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField

from geocore_spark.sources import snapshots as snap


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "t")


def _mk(spark, root, n=100, parts=2):
    df = spark.range(0, n).withColumn("v", F.col("id") * 3)
    snap.create_table(spark, root, df.repartition(parts))
    return df


def _ids(df):
    return sorted(r["id"] for r in df.collect())


# ---------------------------------------------------------------------------
# schema evolution
# ---------------------------------------------------------------------------


def test_add_column_is_metadata_only_and_null_fills(spark, root):
    _mk(spark, root)
    m1 = snap.load_manifest(spark, root, 1)
    m2 = snap.add_columns(spark, root, [StructField("tag", StringType())])
    assert m2["operation"] == "evolve" and m2["version"] == 2
    assert m2["data_files"] == m1["data_files"]  # nothing rewritten
    got = snap.read_snapshot(spark, root)
    assert got.columns == ["id", "v", "tag"]
    assert got.filter(F.col("tag").isNull()).count() == 100  # old rows NULL
    # time travel to v1: pre-evolution schema
    assert snap.read_snapshot(spark, root, 1).columns == ["id", "v"]


def test_append_after_add_supplies_new_column(spark, root):
    _mk(spark, root)
    snap.add_columns(spark, root, [StructField("tag", StringType())])
    new = spark.range(100, 120).select(
        "id", (F.col("id") * 3).alias("v"), F.lit("late").alias("tag")
    )
    snap.append(spark, root, new)
    got = snap.read_snapshot(spark, root)
    assert got.count() == 120
    assert got.filter(F.col("tag") == "late").count() == 20
    # appends that LACK the evolved column are rejected (exact schema)
    with pytest.raises(ValueError, match="missing table columns"):
        snap.append(spark, root, spark.range(5).withColumn("v", F.col("id")))


def test_delete_and_rewrite_compose_with_evolution(spark, root):
    _mk(spark, root)
    snap.add_columns(spark, root, [StructField("tag", StringType())])
    snap.append(
        spark,
        root,
        spark.range(100, 150).select(
            "id", (F.col("id") * 3).alias("v"), F.lit("late").alias("tag")
        ),
    )
    # predicate on the evolved column: NULL rows (old) never match 'late'
    _, n = snap.delete_where(spark, root, F.col("tag") == "late")
    assert n == 50
    assert snap.read_snapshot(spark, root).count() == 100
    # rewrite materializes the evolved schema physically
    m = snap.rewrite_files(spark, root, n_files=1)
    import pyarrow.parquet as pq

    phys = pq.read_schema(m["data_files"][0].removeprefix("file:"))
    assert "tag" in phys.names
    assert snap.read_snapshot(spark, root).count() == 100


def test_add_column_validation(spark, root):
    _mk(spark, root)
    with pytest.raises(ValueError, match="must be nullable"):
        snap.add_columns(spark, root, [StructField("x", LongType(), False)])
    with pytest.raises(ValueError, match="reserved"):
        snap.add_columns(spark, root, [StructField("_gc_pos", LongType())])
    with pytest.raises(ValueError, match="already used"):
        snap.add_columns(spark, root, [StructField("v", DoubleType())])
    with pytest.raises(ValueError, match="duplicate"):
        snap.add_columns(
            spark, root, [StructField("a", LongType()), StructField("a", LongType())]
        )


def test_drop_then_readd_is_refused_forever(spark, root):
    """The name-based resurrection hazard: v1 files physically hold 'v';
    after drop, re-adding 'v' (ANY type) must be refused or old values
    would silently reappear / type-poison the scan."""
    _mk(spark, root)
    snap.drop_columns(spark, root, ["v"])
    got = snap.read_snapshot(spark, root)
    assert got.columns == ["id"]  # projected away, not rewritten
    assert snap.read_snapshot(spark, root, 1).columns == ["id", "v"]
    for t in (LongType(), StringType()):
        with pytest.raises(ValueError, match="already used"):
            snap.add_columns(spark, root, [StructField("v", t)])
    # case-insensitive: Spark resolution is case-insensitive by default
    with pytest.raises(ValueError, match="already used"):
        snap.add_columns(spark, root, [StructField("V", LongType())])
    # the burn survives unrelated commits
    snap.append(spark, root, spark.range(100, 110))
    with pytest.raises(ValueError, match="already used"):
        snap.add_columns(spark, root, [StructField("v", LongType())])


def test_drop_validation(spark, root):
    _mk(spark, root)
    with pytest.raises(ValueError, match="missing"):
        snap.drop_columns(spark, root, ["nope"])
    with pytest.raises(ValueError, match="every column"):
        snap.drop_columns(spark, root, ["id", "v"])


def test_pruned_read_respects_evolved_schema(spark, root):
    _mk(spark, root)
    snap.add_columns(spark, root, [StructField("tag", StringType())])
    stats = snap.snapshot_file_stats(spark, root, ["id"])
    df, rep = snap.read_snapshot_pruned(spark, root, stats, {"id": (0, 10)})
    assert df.columns == ["id", "v", "tag"]
    assert df.filter("id <= 10").count() == 11


# ---------------------------------------------------------------------------
# incremental change feed
# ---------------------------------------------------------------------------


def test_changes_append_delete_chain(spark, root):
    _mk(spark, root)  # v1: ids 0..99
    snap.append(spark, root, spark.range(100, 130).withColumn("v", F.col("id") * 3))
    snap.delete_where(spark, root, "id % 10 = 0")  # v3: 13 rows
    snap.rewrite_files(spark, root, n_files=1)  # v4: no logical change
    snap.append(spark, root, spark.range(130, 140).withColumn("v", F.col("id") * 3))

    ch = snap.read_changes(spark, root, since_version=1)
    assert ch.columns == ["id", "v", "_change_type", "_commit_version"]
    ins = ch.filter("_change_type = 'insert'")
    dels = ch.filter("_change_type = 'delete'")
    assert _ids(ins.filter("_commit_version = 2")) == list(range(100, 130))
    assert _ids(ins.filter("_commit_version = 5")) == list(range(130, 140))
    assert _ids(dels) == list(range(0, 130, 10))
    assert dels.select("_commit_version").distinct().collect()[0][0] == 3
    # from zero: the create itself is the first insert batch
    all_ch = snap.read_changes(spark, root, since_version=0)
    assert _ids(all_ch.filter("_commit_version = 1")) == list(range(100))
    # empty range
    assert snap.read_changes(spark, root, 2, 2).count() == 0
    assert snap.read_changes(spark, root, 3, 4).count() == 0  # rewrite only


def test_changes_insert_then_delete_inside_range(spark, root):
    """CDC semantics: a row appended AND deleted inside the range yields
    both events, in commit order."""
    _mk(spark, root, n=10)
    snap.append(spark, root, spark.range(10, 20).withColumn("v", F.col("id") * 3))
    snap.delete_where(spark, root, "id = 15")
    ch = snap.read_changes(spark, root, 1)
    fifteen = ch.filter("id = 15").orderBy("_commit_version").collect()
    assert [(r["_change_type"], r["_commit_version"]) for r in fifteen] == [
        ("insert", 2),
        ("delete", 3),
    ]


def test_changes_render_in_until_schema(spark, root):
    """Inserts committed before an evolution are rendered NULL-filled in
    the until version's schema."""
    _mk(spark, root, n=10)
    snap.add_columns(spark, root, [StructField("tag", StringType())])
    snap.append(
        spark,
        root,
        spark.range(10, 12).select(
            "id", (F.col("id") * 3).alias("v"), F.lit("t").alias("tag")
        ),
    )
    ch = snap.read_changes(spark, root, 0)
    assert ch.columns == ["id", "v", "tag", "_change_type", "_commit_version"]
    assert ch.filter("_commit_version = 1 AND tag IS NULL").count() == 10
    assert ch.filter("_commit_version = 3 AND tag = 't'").count() == 2


def test_changes_refuse_overwrite_and_expired(spark, root):
    df = _mk(spark, root, n=10)
    snap.overwrite(spark, root, df.withColumn("w", F.lit(1)))
    with pytest.raises(ValueError, match="overwrite"):
        snap.read_changes(spark, root, 1)
    snap.append(spark, root, spark.range(10, 12).select(
        "id", (F.col("id") * 3).alias("v"), F.lit(1).alias("w")
    ))
    # a range STARTING at the overwrite is fine — the diff base is v2
    assert snap.read_changes(spark, root, 2).count() == 2
    snap.append(spark, root, spark.range(12, 14).select(
        "id", (F.col("id") * 3).alias("v"), F.lit(1).alias("w")
    ))
    snap.expire_snapshots(spark, root, keep_last=1)
    with pytest.raises(snap.NoSuchVersion):
        snap.read_changes(spark, root, 2)
    with pytest.raises(ValueError, match="need 0 <="):
        snap.read_changes(spark, root, 5, 3)


# ---------------------------------------------------------------------------
# stale-base guard on non-rebaseable commits
# ---------------------------------------------------------------------------


def _race_once(monkeypatch, extra_commit):
    """Patch snap._commit to let one concurrent commit land first."""
    orig = snap._commit
    state = {"raced": False}

    def racing(sp, rt, build, rebase, retries=20):
        if not state["raced"]:
            state["raced"] = True
            extra_commit()
        return orig(sp, rt, build, rebase, retries)

    monkeypatch.setattr(snap, "_commit", racing)


def test_rewrite_loses_race_loudly(spark, root, monkeypatch):
    _mk(spark, root)
    late = spark.range(100, 120).withColumn("v", F.col("id") * 3)
    _race_once(monkeypatch, lambda: snap.append(spark, root, late))
    with pytest.raises(snap.ConcurrentCommit, match="advanced past"):
        snap.rewrite_files(spark, root, n_files=1)
    # the concurrent append survived — nothing clobbered
    assert snap.read_snapshot(spark, root).count() == 120


def test_rollback_loses_race_loudly(spark, root, monkeypatch):
    _mk(spark, root)
    snap.delete_where(spark, root, "id < 10")
    late = spark.range(100, 120).withColumn("v", F.col("id") * 3)
    _race_once(monkeypatch, lambda: snap.append(spark, root, late))
    with pytest.raises(snap.ConcurrentCommit, match="advanced past"):
        snap.rollback(spark, root, 1)
    assert snap.read_snapshot(spark, root).count() == 110


def test_append_loses_schema_race_loudly(spark, root, monkeypatch):
    # an append validated against the pre-evolve schema must NOT commit
    # under the post-evolve one: its staged files could type-poison every
    # multi-file read — the exact failure append's enforcement prevents
    _mk(spark, root)
    _race_once(
        monkeypatch,
        lambda: snap.add_columns(spark, root, [StructField("w", LongType())]),
    )
    late = spark.range(100, 120).withColumn("v", F.col("id") * 3)
    with pytest.raises(snap.ConcurrentCommit, match="schema .* changed"):
        snap.append(spark, root, late)
    # the evolve survived, the loser's staged files were cleaned up
    m = snap.load_manifest(spark, root)
    assert m["operation"] == "evolve"
    on_disk = {p for p, _, _ in snap._list_dir(spark, root + "/data")}
    assert on_disk == set(m["data_files"])
    # re-running against the NEW schema succeeds
    snap.append(spark, root, late.withColumn("w", F.lit(None).cast("long")))
    assert snap.read_snapshot(spark, root).count() == 120
