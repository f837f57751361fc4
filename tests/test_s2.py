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
