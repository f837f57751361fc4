"""Contract-parity tests for the gated real-H3 backend (VERDICT r1 #6).

These run only when the ``h3`` package is importable — absent in this
sandbox, so they SKIP here — and pin the backend to the same index
contract tiling.py implements (encode / centroid / parent / disk), so the
backend works the day the library appears instead of rotting.
Reference usage: H3_LATLNG_TO_CELL_STRING(lat, lon, res)
(/root/reference/modeling/datasets/test_data.py:15, build.py:185-187).
"""

import pytest
from pyspark.sql import functions as F

from geocore_spark.functions import h3compat as hc

pytestmark = pytest.mark.skipif(
    not hc.HAS_H3, reason="h3 package not installed (contract tests are gated)"
)

POINTS = [
    (0, 40.7128, -74.0060),  # NYC
    (1, 51.5074, -0.1278),  # London
    (2, -33.8688, 151.2093),  # Sydney
    (3, 0.0, 0.0),
    (4, 89.9, 135.0),  # near-pole
    (5, 0.0, 179.95),  # antimeridian
]


@pytest.fixture()
def pts(spark):
    return spark.createDataFrame(POINTS, "id long, lat double, lon double")


def test_encode_matches_driver_h3(spark, pts):
    got = {
        r["id"]: r["cell"]
        for r in pts.select(
            "id", hc.latlng_to_cell_udf(7)(F.col("lat"), F.col("lon")).alias("cell")
        ).collect()
    }
    import h3

    for i, lat, lon in POINTS:
        assert got[i] == h3.latlng_to_cell(lat, lon, 7)


def test_centroid_reencodes_to_same_cell(spark, pts):
    """tiling.py contract: cell_to_latlng(cell) re-encodes to cell."""
    enc = hc.latlng_to_cell_udf(7)
    df = pts.withColumn("cell", enc(F.col("lat"), F.col("lon")))
    df = df.withColumn("c", hc.cell_to_latlng_udf()(F.col("cell")))
    df = df.withColumn("cell2", enc(F.col("c.lat"), F.col("c.lon")))
    for r in df.collect():
        assert r["cell"] == r["cell2"], r


def test_parent_contains_child_centroid(spark, pts):
    enc7 = hc.latlng_to_cell_udf(7)
    df = pts.withColumn("cell", enc7(F.col("lat"), F.col("lon")))
    df = df.withColumn("parent", hc.cell_to_parent_udf(5)(F.col("cell")))
    df = df.withColumn("parent_direct", hc.latlng_to_cell_udf(5)(F.col("lat"), F.col("lon")))
    for r in df.collect():
        assert r["parent"] == r["parent_direct"], r


def test_grid_disk_contains_self_and_neighbors(spark, pts):
    enc = hc.latlng_to_cell_udf(7)
    df = pts.withColumn("cell", enc(F.col("lat"), F.col("lon")))
    df = df.withColumn("disk", hc.grid_disk_udf(1)(F.col("cell")))
    for r in df.collect():
        assert r["cell"] in r["disk"]
        # hexagon: 7 cells; pentagon: 6 — both valid H3 topologies
        assert len(r["disk"]) in (6, 7), r


def test_polygon_cover_contains_interior_point():
    import h3

    ring = [(40.6, -74.2), (40.9, -74.2), (40.9, -73.7), (40.6, -73.7)]
    cells = hc.polygon_to_cells(ring, res=6)
    assert h3.latlng_to_cell(40.75, -74.0, 6) in cells
