"""plans/rewrite: ST_DWITHIN cartesian-plan -> cell-cover join rewrite."""

from pyspark.sql import functions as F

from geocore_spark.functions.geodesy import haversine_km
from geocore_spark.plans.rewrite import cartesian_free, rewrite_dwithin


def _sides(spark):
    rows = [
        (1, 40.71, -74.00),
        (2, 40.75, -73.99),
        (3, 51.51, -0.13),
        (4, 51.50, -0.12),
        (5, -33.87, 151.21),
        (6, 0.0, 179.99),  # antimeridian
        (7, 0.0, -179.99),
    ]
    a = spark.createDataFrame(rows, "aid long, alat double, alon double")
    b = spark.createDataFrame(
        [(i + 10, la, lo) for i, la, lo in rows], "bid long, blat double, blon double"
    )
    return a, b


def _dwithin(a, b, km):
    return a.crossJoin(b).filter(
        haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
        <= F.lit(km)
    )


def test_rewrite_matches_naive_and_kills_cartesian(spark):
    a, b = _sides(spark)
    naive = _dwithin(a, b, 50.0)
    rw = rewrite_dwithin(naive)
    assert rw is not naive
    assert not cartesian_free(naive)
    assert cartesian_free(rw)
    assert rw.columns == naive.columns
    assert naive.exceptAll(rw).count() == 0
    assert rw.exceptAll(naive).count() == 0
    # antimeridian pair (6, 17) must survive the cover join
    got = {(r["aid"], r["bid"]) for r in rw.collect()}
    assert (6, 17) in got and (7, 16) in got


def test_rewrite_preserves_extra_conjuncts(spark):
    a, b = _sides(spark)
    naive = a.crossJoin(b).filter(
        (
            haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
            <= F.lit(50.0)
        )
        & (F.col("aid") < F.lit(3))
    )
    rw = rewrite_dwithin(naive)
    assert rw is not naive and cartesian_free(rw)
    assert sorted(r["aid"] for r in rw.collect()) == sorted(
        r["aid"] for r in naive.collect()
    )


def test_rewrite_strict_lt_stays_strict(spark):
    """ADVICE fix: a strict '<' predicate must be re-applied strictly —
    a pair at exactly km distance is excluded by both plans."""
    a, b = _sides(spark)
    # exact boundary: measure the (1, 12) distance, use it as the km literal
    d = (
        a.filter(F.col("aid") == 1)
        .crossJoin(b.filter(F.col("bid") == 12))
        .select(
            haversine_km(
                F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon")
            ).alias("d")
        )
        .first()["d"]
    )
    naive = a.crossJoin(b).filter(
        haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
        < F.lit(d)
    )
    rw = rewrite_dwithin(naive)
    assert rw is not naive and cartesian_free(rw)
    got = {(r["aid"], r["bid"]) for r in rw.collect()}
    want = {(r["aid"], r["bid"]) for r in naive.collect()}
    assert got == want
    assert (1, 12) not in got  # the boundary pair stays out under '<'
    # sanity: '<=' at the same km DOES include it
    le = rewrite_dwithin(_dwithin(a, b, d))
    assert (1, 12) in {(r["aid"], r["bid"]) for r in le.collect()}


def test_rewrite_shared_column_names_returns_unchanged(spark):
    """ADVICE fix: duplicated output names across the join's sides must make
    the rule bail out (return df), not raise AnalysisException."""
    a, b = _sides(spark)
    b2 = b.withColumnRenamed("bid", "aid")  # now both sides output 'aid'
    naive = a.crossJoin(b2).filter(
        haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
        <= F.lit(50.0)
    )
    assert rewrite_dwithin(naive) is naive


def test_rewrite_bails_out_conservatively(spark):
    a, b = _sides(spark)
    # plain filter: no join underneath
    nm = a.filter(F.col("alat") > 0)
    assert rewrite_dwithin(nm) is nm
    # equi-join with its own condition
    nm2 = a.join(b, a["aid"] == b["bid"]).filter(F.col("alat") > 0)
    assert rewrite_dwithin(nm2) is nm2
    # non-haversine predicate over a cross join
    nm3 = a.crossJoin(b).filter(F.col("alat") + F.col("blat") < 10)
    assert rewrite_dwithin(nm3) is nm3
    # haversine compared the un-rewritable way (>=): keep original
    nm4 = a.crossJoin(b).filter(
        haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
        >= F.lit(50.0)
    )
    assert rewrite_dwithin(nm4) is nm4


def test_rewrite_preserves_digit_d_string_literals(spark):
    # the D-suffix strip must not touch quoted content: a blanket regex
    # turned tag = '3D' into tag = '3' — a silently wrong filter
    rows = [(1, 40.71, -74.00, "3D"), (2, 40.75, -73.99, "2D"), (3, 40.72, -74.01, "3D")]
    a = spark.createDataFrame(rows, "aid long, alat double, alon double, tag string")
    b = spark.createDataFrame(
        [(10, 40.71, -74.00), (11, 51.51, -0.13)], "bid long, blat double, blon double"
    )
    naive = a.crossJoin(b).filter(
        (
            haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
            <= F.lit(50.0)
        )
        & (F.col("tag") == "3D")
    )
    rw = rewrite_dwithin(naive)
    assert rw is not naive and cartesian_free(rw)
    expect = {(r["aid"], r["bid"]) for r in naive.collect()}
    got = {(r["aid"], r["bid"]) for r in rw.collect()}
    assert got == expect
    assert got == {(1, 10), (3, 10)}  # the 3D-tagged NYC rows only
