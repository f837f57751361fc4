"""Feature/label assembly + temporal operators."""

import datetime

import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import assembly, temporal


def test_join_features_left_anchor(spark):
    a = spark.createDataFrame([("13:1:1", 1.0), ("13:2:2", 2.0)], "cell string, f_a double")
    b = spark.createDataFrame([("13:1:1", 10.0)], "cell string, f_b double")
    c = spark.createDataFrame([("13:9:9", 5.0)], "cell string, f_c double")
    out = assembly.join_features([a, b, c]).orderBy("cell").collect()
    assert len(out) == 2  # anchor rows preserved
    assert out[0]["f_b"] == 10.0 and out[1]["f_b"] is None
    assert all(r["f_c"] is None for r in out)


def test_join_features_rejects_duplicate_index(spark):
    a = spark.createDataFrame([("13:1:1", 1.0), ("13:1:1", 2.0)], "cell string, f double")
    with pytest.raises(assembly.BadTable, match="distinct"):
        assembly.join_features([a])


def test_join_features_rejects_mixed_resolution(spark):
    a = spark.createDataFrame([("13:1:1", 1.0)], "cell string, f_a double")
    b = spark.createDataFrame([("11:1:1", 1.0)], "cell string, f_b double")
    with pytest.raises(assembly.BadTable, match="resolution"):
        assembly.join_features([a, b])


def test_meta_leak_guard():
    with pytest.raises(assembly.BadTable, match="leak"):
        assembly.assert_no_meta_leak(["f_x", "weight"])
    assembly.assert_no_meta_leak(["f_x", "f_y"])  # no raise


def test_merge_labels_max_weight_wins(spark):
    s1 = spark.createDataFrame(
        [("13:1:1", 1, 0.5, "KNOWN"), ("13:2:2", 0, 0.9, "KNOWN")],
        "cell string, label int, weight double, type string",
    )
    s2 = spark.createDataFrame(
        [("13:1:1", 0, 0.8, "INFERRED"), ("13:3:3", 1, 0.1, "INFERRED")],
        "cell string, label int, weight double, type string",
    )
    out = {r["cell"]: r for r in assembly.merge_labels([s1, s2]).collect()}
    assert len(out) == 3
    assert out["13:1:1"]["label"] == 0 and out["13:1:1"]["weight"] == 0.8
    assert out["13:2:2"]["type"] == "KNOWN"


def test_merge_labels_contract(spark):
    bad = spark.createDataFrame([("13:1:1", 1)], "cell string, label int")
    with pytest.raises(assembly.BadTable, match="missing"):
        assembly.merge_labels([bad])


def test_flag_test_cells(spark):
    df = spark.createDataFrame([("13:1:1",), ("13:2:2",)], "cell string")
    test = spark.createDataFrame([("13:2:2",), ("13:2:2",)], "cell string")
    out = {r["cell"]: r["is_test"] for r in assembly.flag_test_cells(df, test).collect()}
    assert out == {"13:1:1": 0, "13:2:2": 1}


def test_split_train_application(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", None), ("c", 0)], "cell string, label int"
    )
    train, app = assembly.split_train_application(df)
    assert {r["cell"] for r in train.collect()} == {"a", "c"}
    assert {r["cell"] for r in app.collect()} == {"b"}


def test_mask_bad_train(spark):
    # two labeled points; one is 1 km from a test point -> label nulled
    df = spark.createDataFrame(
        [(40.0, -74.0, 1, 0), (45.0, -100.0, 1, 0), (40.001, -74.001, 1, 1)],
        "lat double, lon double, label int, is_test int",
    )
    test_pts = spark.createDataFrame([(40.001, -74.001)], "lat double, lon double")
    out = assembly.mask_bad_train(df, test_pts, buffer_km=5.0)
    rows = {(r["lat"], r["lon"]): r["label"] for r in out.collect()}
    assert rows[(40.0, -74.0)] is None  # masked: near test point, not test itself
    assert rows[(45.0, -100.0)] == 1  # far away: kept
    assert rows[(40.001, -74.001)] == 1  # the test row itself: kept


def _events(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for uid in (1, 2):
        for m in (0, 10, 50, 70, 200):
            rows.append((uid, base + datetime.timedelta(minutes=m), float(uid * 100 + m)))
    return spark.createDataFrame(rows, "user_id long, ts timestamp, speed double")


def test_windowed_range_agg(spark):
    out = temporal.windowed_range_agg(_events(spark), "user_id", "ts", "speed")
    got = {(r["user_id"], r["window_start"].minute + r["window_start"].hour * 60): r["change"]
           for r in out.collect()}
    # hour 0 has minutes 0,10,50 -> change 50; hour 1 has 70 -> 0; hour 3 has 200 -> 0
    assert got[(1, 0)] == 50.0 and got[(1, 60)] == 0.0 and got[(1, 180)] == 0.0
    assert len(got) == 6


def test_hour_bucket_join(spark):
    ev = _events(spark)
    agg = temporal.windowed_range_agg(ev, "user_id", "ts", "speed")
    joined = temporal.hour_bucket_join(ev, agg, "user_id", "ts")
    assert joined.count() == ev.count()
    assert joined.filter(F.col("change").isNull()).count() == 0
    row = joined.filter((F.col("user_id") == 1) & (F.col("speed") == 110.0)).first()
    assert row["change"] == 50.0
