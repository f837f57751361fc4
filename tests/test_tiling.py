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
