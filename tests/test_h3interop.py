"""Lib-free H3 string interop (VERDICT r2 item #5): parse/format,
resolution/base-cell extraction, structural validity (incl. the pentagon
deleted-K rule) and parent derivation via the PUBLISHED bit layout —
pinned on the spec's canonical example cell and hand-constructed edge
vectors; property-checked against the real ``h3`` library whenever it is
importable (self-activating, like tests/test_h3compat.py)."""

import pytest
from pyspark.sql import functions as F

from geocore_spark.functions import h3interop as hi

try:
    import h3 as _h3

    HAS_H3 = True
except ImportError:
    HAS_H3 = False

# the H3 docs' canonical example cell (SF, res 9) and its published
# parents — the res-8 and res-0 strings appear throughout the public docs
SF9 = "8928308280fffff"
SF9_INT = int(SF9, 16)  # 617700169958293503
SF8 = "8828308281fffff"
SF0 = "8029fffffffffff"


def _mk(mode=1, res=0, base=0, digits=(), high=0, mid=0):
    """Hand-build a cell index from the spec layout."""
    v = (high << 63) | (mode << 59) | (mid << 56) | (res << 52) | (base << 45)
    v |= (1 << (3 * (15 - res))) - 1 if res < 15 else 0  # unused digits = 7
    for d, dig in enumerate(digits, start=1):
        v &= ~(0x7 << (3 * (15 - d)))
        v |= dig << (3 * (15 - d))
    return v


def _one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("x")).collect()[0]["x"]


def test_parse_format_roundtrip(spark):
    assert _one(spark, hi.h3_parse(F.col("s")), s=SF9) == SF9_INT
    assert _one(spark, hi.h3_format(F.col("v")), v=SF9_INT) == SF9
    assert (
        _one(spark, hi.h3_format(hi.h3_parse(F.col("s"))), s=SF9.upper())
        == SF9
    )


def test_parse_rejects_garbage(spark):
    for bad in ("", "not-hex", "8928308280fffgg", "f" * 17, "0" * 16 + "1"):
        assert _one(spark, hi.h3_parse(F.col("s")), s=bad) is None


def test_parse_rejects_trailing_line_terminators(spark):
    # Java '$' matches BEFORE a final line terminator, so a '^...$'
    # rlike would silently accept cells read from files with their \n /
    # \r\n kept (F.trim strips only spaces) and conv would parse the
    # prefix — the validator must use absolute \A/\z anchors instead
    for bad in (SF9 + "\n", SF9 + "\r\n", SF9 + "\r", "\n" + SF9):
        assert _one(spark, hi.h3_parse(F.col("s")), s=bad) is None
    # plain surrounding spaces are still trimmed and accepted
    assert _one(spark, hi.h3_parse(F.col("s")), s=f"  {SF9} ") == SF9_INT


def test_resolution_and_base_cell(spark):
    assert _one(spark, hi.h3_resolution(F.col("v")), v=SF9_INT) == 9
    assert _one(spark, hi.h3_base_cell(F.col("v")), v=SF9_INT) == 20
    assert _one(spark, hi.h3_resolution(hi.h3_parse(F.col("s"))), s=SF0) == 0


def test_parent_published_vectors(spark):
    assert _one(spark, hi.h3_parent_str(F.col("s"), 8), s=SF9) == SF8
    assert _one(spark, hi.h3_parent_str(F.col("s"), 0), s=SF9) == SF0
    # parent at the cell's own resolution is the cell
    assert _one(spark, hi.h3_parent_str(F.col("s"), 9), s=SF9) == SF9
    # finer than the cell -> NULL
    assert _one(spark, hi.h3_parent_str(F.col("s"), 10), s=SF9) is None


def test_is_valid_structural(spark):
    valid = hi.h3_is_valid(F.col("v"))
    assert _one(spark, valid, v=SF9_INT) is True
    assert _one(spark, valid, v=_mk(res=0, base=4)) is True  # pentagon res0
    assert _one(spark, valid, v=_mk(mode=0, res=9, base=20)) is False
    assert _one(spark, valid, v=_mk(res=9, base=122)) is False
    assert _one(spark, valid, v=_mk(high=1, res=9, base=20)) is False
    assert _one(spark, valid, v=_mk(mid=3, res=9, base=20)) is False
    # digit 7 before res (digit3 = 7 at res 5)
    assert _one(spark, valid, v=_mk(res=5, base=20, digits=(1, 2, 7, 3, 4))) is False
    # digit != 7 after res (clear digit 10 on a res-9 cell)
    broken = SF9_INT & ~(0x7 << (3 * (15 - 10)))
    assert _one(spark, valid, v=broken) is False


def test_is_valid_pentagon_deleted_k(spark):
    valid = hi.h3_is_valid(F.col("v"))
    # pentagon base 4, first nonzero digit 1 -> deleted K subsequence
    assert _one(spark, valid, v=_mk(res=1, base=4, digits=(1,))) is False
    assert _one(spark, valid, v=_mk(res=2, base=4, digits=(0, 1))) is False
    assert _one(spark, valid, v=_mk(res=1, base=4, digits=(2,))) is True
    assert _one(spark, valid, v=_mk(res=2, base=4, digits=(2, 1))) is True
    # same digits on a hexagon base are fine
    assert _one(spark, valid, v=_mk(res=1, base=20, digits=(1,))) is True


def test_parent_sql_mirror_matches(spark):
    """The DuckDB-oracle SQL twin produces the same parent as the Column
    implementation when run through Spark SQL."""
    df = spark.createDataFrame([(SF9_INT,)], ["v"])
    got = df.selectExpr(f"{hi.parent_sql('v', 8)} AS p").collect()[0]["p"]
    want = df.select(hi.h3_parent(F.col("v"), 8).alias("p")).collect()[0]["p"]
    assert got == want == int(SF8, 16)


@pytest.mark.skipif(not HAS_H3, reason="h3 library not installed")
def test_against_real_h3_library(spark):
    cells = [_h3.latlng_to_cell(lat, lon, r)
             for lat, lon in [(37.77, -122.41), (51.5, -0.13), (-33.9, 151.2)]
             for r in (0, 5, 9, 15)]
    df = spark.createDataFrame([(c,) for c in cells], ["s"])
    out = df.select(
        "s",
        hi.h3_parse(F.col("s")).alias("v"),
        hi.h3_resolution(hi.h3_parse(F.col("s"))).alias("r"),
        hi.h3_is_valid(hi.h3_parse(F.col("s"))).alias("ok"),
        hi.h3_parent_str(F.col("s"), 0).alias("p0"),
    ).collect()
    for row in out:
        assert row["v"] == _h3.str_to_int(row["s"])
        assert row["r"] == _h3.get_resolution(row["s"])
        assert row["ok"] is True
        assert row["p0"] == _h3.cell_to_parent(row["s"], 0)
