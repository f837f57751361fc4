"""BlockCV: block assignment, fold balance, split protocol."""

from pyspark.sql import functions as F

from geocore_spark.operators import blockcv
from geocore_spark.oracle import derived_lat, derived_lon


def _pts(spark, n=2000):
    return spark.range(n).select(
        F.col("id"),
        derived_lat(F.col("id")).alias("lat"),
        derived_lon(F.col("id")).alias("lon"),
    )


def test_blocks_group_nearby_points(spark):
    blocked = blockcv.with_blocks(_pts(spark), block_res=6)
    # same coordinates -> same block
    a = blocked.filter(F.col("id") == 5).first()["block"]
    again = blocked.filter(F.col("id") == 5).first()["block"]
    assert a == again
    assert blocked.select("block").distinct().count() > 10


def test_fold_parity_is_spatially_striped(spark):
    blocked = blockcv.with_blocks(_pts(spark), block_res=6)
    folds = blocked.select(
        "block", blockcv.fold_parity_expr(F.col("block"), 5).alias("fold")
    )
    assert folds.filter((F.col("fold") < 0) | (F.col("fold") >= 5)).count() == 0
    # all 5 folds populated
    assert folds.select("fold").distinct().count() == 5


def test_balanced_folds_respect_cap(spark):
    blocked = blockcv.with_blocks(_pts(spark, 3000), block_res=5)
    summaries = blockcv.block_summaries(blocked)
    assignment = blockcv.fold_balanced(summaries, n_folds=4)
    applied = blockcv.apply_folds(blocked, assignment)
    sizes = {
        r["fold"]: r["n"] for r in applied.groupBy("fold").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == {0, 1, 2, 3}
    total = sum(sizes.values())
    assert total == 3000
    # every block maps to exactly one fold (no leakage across folds)
    leak = applied.groupBy("block").agg(F.count_distinct("fold").alias("k")).filter(
        F.col("k") > 1
    )
    assert leak.count() == 0
    # balance: biggest fold within 2x of ideal (greedy with big blocks)
    assert max(sizes.values()) <= 2.0 * total / 4


def test_balanced_folds_deterministic(spark):
    blocked = blockcv.with_blocks(_pts(spark), block_res=5)
    s = blockcv.block_summaries(blocked)
    assert blockcv.fold_balanced(s, 3) == blockcv.fold_balanced(s, 3)


def test_fold_split_partitions(spark):
    blocked = blockcv.with_blocks(_pts(spark), block_res=6)
    df = blocked.withColumn("fold", blockcv.fold_parity_expr(F.col("block"), 3))
    train, val = blockcv.fold_split(df, 1)
    assert train.count() + val.count() == df.count()
    assert val.filter(F.col("fold") != 1).count() == 0
