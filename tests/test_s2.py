"""S2 implementation invariants + Spark UDF surface."""

import numpy as np
from pyspark.sql import functions as F

from geocore_spark.functions import s2


def test_face_cells_match_spec():
    # Level-0 cell id must be face<<61 | 1<<60 (public S2 id layout).
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ids = s2.cell_id(lat, lon, 0).view(np.uint64)
    faces = [0, 1, 2, 3, 4, 5]
    expected = [(f << 61) | (1 << 60) for f in faces]
    assert list(ids) == [np.uint64(e) for e in expected]


def test_roundtrip_center_within_cell():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-85, 85, 5000)
    lon = rng.uniform(-180, 180, 5000)
    ids = s2.cell_id(lat, lon, 12)
    clat, clon = s2.cell_center_latlng(ids.copy())
    # re-encoding the center must give the same cell
    ids2 = s2.cell_id(clat, clon, 12)
    assert (ids == ids2).all()
    assert np.abs(clat - lat).max() < 0.1  # level-12 cells are ~0.03-0.06 deg


def test_levels_and_parent_consistency():
    rng = np.random.default_rng(8)
    lat = rng.uniform(-85, 85, 2000)
    lon = rng.uniform(-180, 180, 2000)
    ids = s2.cell_id(lat, lon, 12)
    assert (s2.cell_level(ids) == 12).all()
    assert (s2.cell_parent(ids, 10) == s2.cell_id(lat, lon, 10)).all()
    leaf = s2.cell_id(lat, lon, 30)
    assert (s2.cell_parent(leaf, 12) == ids).all()


def test_nearby_points_share_cell_far_points_do_not():
    ids = s2.cell_id(
        np.array([40.0, 40.00001, 41.0]), np.array([-74.0, -74.00001, -75.0]), 12
    )
    assert ids[0] == ids[1]
    assert ids[0] != ids[2]


def test_udfs_null_and_nan_safe(spark):
    # one null in an Arrow batch turns the pandas series float64 —
    # int64 ids above 2^53 then ROUND to a different cell and nulls
    # become INT64_MIN garbage; the kernels must mask before converting
    big = int(s2.cell_id(np.array([0.001]), np.array([0.001]), 30)[0])
    assert big > 2**53  # the hazard is only real for fine-level ids
    df = spark.createDataFrame(
        [(0, 40.0, -74.0, big), (1, None, -74.0, None), (2, float("nan"), 1.0, big)],
        "id long, lat double, lon double, cell long",
    )
    enc = df.select("id", s2.s2_cell_udf(12)(F.col("lat"), F.col("lon")).alias("c")).collect()
    got = {r["id"]: r["c"] for r in enc}
    assert got[0] is not None and got[1] is None and got[2] is None
    lv = df.select("id", s2.s2_level_udf()(F.col("cell")).alias("l")).collect()
    lvm = {r["id"]: r["l"] for r in lv}
    assert lvm[0] == 30 and lvm[2] == 30  # valid ids in a null-bearing batch survive
    assert lvm[1] is None
    ctr = df.filter("id = 1").select(s2.s2_center_udf()(F.col("cell")).alias("p")).first()["p"]
    # Arrow maps the kernel's NaN to SQL NULL on the way out — either
    # way, no fabricated coordinate for a null id
    assert ctr["lat"] is None or ctr["lat"] != ctr["lat"]


def test_spark_udf_matches_numpy(spark):
    rng = np.random.default_rng(9)
    lat = rng.uniform(-85, 85, 300)
    lon = rng.uniform(-180, 180, 300)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lon)], "lat double, lon double"
    )
    got = np.array(
        [
            r[0]
            for r in df.select(
                s2.s2_cell_udf(12)(F.col("lat"), F.col("lon"))
            ).collect()
        ]
    )
    assert (got == s2.cell_id(lat, lon, 12)).all()
