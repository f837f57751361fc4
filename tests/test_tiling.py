"""Tiling grid: Column exprs vs numpy mirror, hierarchy, k-ring."""

import numpy as np
from pyspark.sql import functions as F

from geocore_spark.functions import tiling as tl


def test_numpy_mirror_matches_column_expr(spark):
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-180, 180, 500)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lat, lon)], "lat double, lon double"
    )
    got = [
        r[0]
        for r in df.select(
            tl.latlng_to_cell(F.col("lat"), F.col("lon"), 13)
        ).collect()
    ]
    want = list(tl.np_cell_strings(lat, lon, 13))
    assert got == want


def test_long_and_string_forms_agree(spark):
    df = spark.createDataFrame([(10.5, 20.25), (-45.0, 170.1)], "lat double, lon double")
    out = df.select(
        tl.latlng_to_cell(F.col("lat"), F.col("lon"), 13).alias("s"),
        tl.cell_long_to_string(
            tl.latlng_to_cell_long(F.col("lat"), F.col("lon"), 13)
        ).alias("from_long"),
    ).collect()
    for r in out:
        assert r["s"] == r["from_long"]


def test_centroid_within_cell(spark):
    df = spark.createDataFrame([(37.77, -122.42)], "lat double, lon double")
    row = df.select(
        tl.cell_to_latlng(tl.latlng_to_cell(F.col("lat"), F.col("lon"), 13)).alias("c")
    ).first()
    e = tl.edge_deg(13)
    assert abs(row["c"]["lat"] - 37.77) <= e
    assert abs(row["c"]["lon"] + 122.42) <= e


def test_parent_and_children_roundtrip(spark):
    df = spark.createDataFrame([(37.77, -122.42)], "lat double, lon double")
    cell = tl.latlng_to_cell(F.col("lat"), F.col("lon"), 13)
    row = df.select(
        cell.alias("cell"),
        tl.cell_to_parent(cell, 11).alias("parent"),
        tl.latlng_to_cell(F.col("lat"), F.col("lon"), 11).alias("direct11"),
        tl.cell_to_children(tl.cell_to_parent(cell, 11), 13).alias("children"),
    ).first()
    assert row["parent"] == row["direct11"]
    assert len(row["children"]) == 16
    assert row["cell"] in row["children"]


def test_null_and_nan_coords_encode_to_null(spark):
    # least/greatest skip nulls and floor(NaN) casts to 0 — unguarded,
    # every bad-coordinate row silently became the corner cell 'r:0:0'
    df = spark.createDataFrame(
        [(0, 40.0, -74.0), (1, None, -74.0), (2, 40.0, None),
         (3, float("nan"), 0.0), (4, 0.0, float("nan"))],
        "id long, lat double, lon double",
    )
    rows = df.select(
        "id",
        tl.latlng_to_cell(F.col("lat"), F.col("lon"), 13).alias("c"),
        tl.latlng_to_cell_long(F.col("lat"), F.col("lon"), 13).alias("cl"),
    ).collect()
    got = {r["id"]: (r["c"], r["cl"]) for r in rows}
    assert got[0][0] is not None and got[0][1] is not None
    for i in range(1, 5):
        assert got[i] == (None, None), i
    # finite out-of-range still clamps to the edge (deliberate)
    edge = spark.range(1).select(
        tl.latlng_to_cell(F.lit(90.0), F.lit(180.0), 13).alias("c")
    ).first()["c"]
    assert edge == f"13:{tl.ncols(13) - 1}:{tl.nrows(13) - 1}"


def test_haversine_antipodal_never_nan(spark):
    from geocore_spark.functions.geodesy import haversine_km

    # measured pair where the unclamped haversine term hit 1 + 4e-16
    df = spark.createDataFrame(
        [(58.391010399635434, 142.79058575182586,
          -58.39101049825921, -37.20941416787758)],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    d = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).first()["d"]
    assert d == d  # not NaN
    assert abs(d - 2 * 3.14159265 * 6371.0088 / 2) < 1.0  # ~half circumference


def test_cell_to_parent_guards(spark):
    df = spark.range(1).select(F.lit("13:100:200").alias("cell"))
    rows = df.select(
        tl.cell_to_parent(F.col("cell"), 11).alias("up"),
        tl.cell_to_parent(F.col("cell"), 13).alias("same"),
        tl.cell_to_parent(F.col("cell"), 15).alias("down"),
    ).first()
    assert rows["up"] == "11:25:50"
    assert rows["same"] == "13:100:200"  # already at parent_res: pass-through
    assert rows["down"] is None  # cannot coarsen upward; was DIVIDE_BY_ZERO


def test_bbox_to_cells_antimeridian_wraps(spark):
    cells = tl.bbox_to_cells(10.0, 11.0, 179.5, -179.5, res=9)
    assert cells  # previously silently empty
    xs = {int(c.split(":")[1]) for c in cells}
    assert max(xs) == tl.ncols(9) - 1 and min(xs) == 0  # both sides of the seam
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lat_min"):
        tl.bbox_to_cells(11.0, 10.0, 0.0, 1.0, res=9)


def test_grid_disk_counts_and_membership(spark):
    df = spark.createDataFrame([(37.77, -122.42)], "lat double, lon double")
    cell = tl.latlng_to_cell(F.col("lat"), F.col("lon"), 13)
    row = df.select(cell.alias("c"), tl.grid_disk(cell, 2).alias("disk")).first()
    assert len(row["disk"]) == 25
    assert row["c"] in row["disk"]
    assert len(set(row["disk"])) == 25


def test_grid_disk_wraps_longitude(spark):
    df = spark.createDataFrame([(0.0, 179.999)], "lat double, lon double")
    cell = tl.latlng_to_cell(F.col("lat"), F.col("lon"), 5)
    row = df.select(tl.grid_disk(cell, 1).alias("d")).first()
    assert len(row["d"]) == 9
    ixs = {int(c.split(":")[1]) for c in row["d"]}
    assert 0 in ixs  # wrapped across the antimeridian


def test_grid_disk_clamps_poles(spark):
    df = spark.createDataFrame([(89.99, 0.0)], "lat double, lon double")
    cell = tl.latlng_to_cell(F.col("lat"), F.col("lon"), 5)
    row = df.select(tl.grid_disk(cell, 1).alias("d")).first()
    assert len(row["d"]) == 6  # top row clipped


def test_rings_for_km():
    # res 13 cell is ~2.44 km N-S; 5 km needs >= 3 rings at lat 66
    assert tl.rings_for_km(5.0, 13) >= 2
    assert tl.rings_for_km(0.1, 13) == 1


def test_resolution_extraction(spark):
    df = spark.createDataFrame([(10.0, 10.0)], "lat double, lon double")
    row = df.select(
        tl.cell_resolution(tl.latlng_to_cell(F.col("lat"), F.col("lon"), 9)).alias("r")
    ).first()
    assert row["r"] == 9


def test_grid_disk_distinct_when_ring_wraps_whole_globe(spark):
    """At coarse res the lon wrap can alias two dx offsets to one column
    (2k+1 > ncol); the disk must still contain each cell once — duplicate
    cover cells would double-count join pairs (e.g. kNN top-k slots)."""
    df = spark.createDataFrame([(10.0, 20.0)], "lat double, lon double")
    cell = tl.latlng_to_cell(F.col("lat"), F.col("lon"), 2)  # ncol=8 < 2*4+1
    row = df.select(tl.grid_disk(cell, 4).alias("d")).first()
    assert len(row["d"]) == len(set(row["d"]))
    ixs = {int(c.split(":")[1]) for c in row["d"]}
    assert ixs == set(range(8))  # full wrap covers every column exactly once
