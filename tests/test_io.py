"""IO helpers: vector layer roundtrip, materialize, catalog ops."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocore_spark.functions import h3compat
from geocore_spark.geometry import wkb as wkb_mod
from geocore_spark.sources import io as gio


def test_vector_layer_parquet_roundtrip(spark, tmp_path):
    ring = np.array([[0, 0], [1, 0], [1, 1]], float)
    df = spark.createDataFrame(
        [(0, bytearray(wkb_mod.encode_polygon([ring])), "fault")],
        "geom_id long, wkb binary, layer string",
    )
    path = str(tmp_path / "layer.parquet")
    gio.write_vector_layer(df, path)
    back = gio.read_vector_layer(spark, path)
    row = back.first()
    gtype, polys = wkb_mod.decode(bytes(row["wkb"]))
    assert gtype == "Polygon" and row["layer"] == "fault"


def test_read_shapefile_without_geopandas_raises(spark):
    if gio.HAS_GEOPANDAS:
        pytest.skip("geopandas present")
    with pytest.raises(ImportError, match="geopandas"):
        gio.read_vector_layer(spark, "/nonexistent/layer.shp")


def test_materialize_is_create_if_not_exists(spark, tmp_path):
    root = str(tmp_path)
    df1 = spark.range(10).select(F.col("id"))
    out1 = gio.materialize(df1, "t_mat", root)
    assert out1.count() == 10
    # second materialize with different data is IGNORED (IF NOT EXISTS)
    df2 = spark.range(99).select(F.col("id"))
    out2 = gio.materialize(df2, "t_mat", root)
    assert out2.count() == 10
    # view registered
    assert spark.sql("select count(*) n from t_mat").first()["n"] == 10
    assert gio.describe(out2) == [("id", "bigint")]
    gio.drop_table(spark, "t_mat", root)
    out3 = gio.materialize(df2, "t_mat", root)
    assert out3.count() == 99


def test_h3compat_gated():
    if h3compat.HAS_H3:
        pytest.skip("h3 present — gating not exercised")
    with pytest.raises(ImportError, match="h3"):
        h3compat.latlng_to_cell_udf(7)


def test_drop_table_drops_catalog_tables_too(spark):
    from pyspark.sql import functions as F

    df = spark.range(100).select(F.col("id").alias("cell"), F.col("id").alias("v"))
    gio.write_bucketed(df, "bk_drop_me", "cell", 4)
    assert gio.table_exists(spark, "bk_drop_me")
    # dropTempView returns False for a catalog table — drop_table must
    # fall through to DROP TABLE instead of silently no-opping
    gio.drop_table(spark, "bk_drop_me")
    assert not gio.table_exists(spark, "bk_drop_me")


def test_shapefile_style_directory_not_misrouted_to_parquet(spark, tmp_path):
    d = tmp_path / "layer"
    d.mkdir()
    (d / "layer.shp").write_bytes(b"\x00" * 8)
    (d / "layer.dbf").write_bytes(b"\x00" * 8)
    import pytest as _pytest

    # without geopandas this must hit the geopandas ImportError path,
    # NOT spark.read.parquet on a directory of .shp files
    if not gio.HAS_GEOPANDAS:
        with _pytest.raises(ImportError, match="geopandas"):
            gio.read_vector_layer(spark, str(d))
    else:
        with _pytest.raises(Exception):
            gio.read_vector_layer(spark, str(d))  # junk bytes, but routed to gpd


def test_bucketed_join_is_shuffle_free(spark):
    """Bucketed-by-cell tables must join with zero shuffle exchanges —
    the SCALE.md co-location claim, pinned on the physical plan."""
    import re

    from pyspark.sql import functions as F

    a = spark.range(0, 5000).select(
        F.col("id").alias("cell"), (F.col("id") * 2).alias("v1")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("cell"), (F.col("id") * 3).alias("v2")
    )
    gio.write_bucketed(a, "bk_a", "cell", 8)
    gio.write_bucketed(b, "bk_b", "cell", 8)
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        j = spark.table("bk_a").join(spark.table("bk_b"), "cell")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan[:1500]
        assert plan.count("Bucketed: true") == 2
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
