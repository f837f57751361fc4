"""Geodesic distance as pure Column expressions.

The reference computes great-circle distance with ``h3.point_dist``
(/root/reference/modeling/utils/distances.py:14,
/root/reference/modeling/cross_validators/block.py:83) — haversine on a
spherical earth. Here it is a native Column expression: whole-stage-codegen'd
JVM arithmetic, usable inside join conditions (distance theta-joins G7/J4)
without any UDF — which is what lets Catalyst/AQE plan the k-ring candidate
join + exact refine entirely on the fast path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean earth radius, same as h3.point_dist


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (G4). Pure Column expr — no UDF.

    The haversine term is clamped to 1.0: for near-antipodal pairs
    floating-point error pushes it to 1 + a few ulp and asin(sqrt(a))
    returns NaN — which poisons sums, silently drops pairs from
    <=-threshold joins, and sorts last in kNN. Measured live: the pair
    (58.3910104, 142.7905858) / (-58.3910105, -37.2094142) produced
    a = 1.0000000000000004 -> NaN before the clamp."""
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.sin(dlon) * F.sin(dlon)
    # clamp spelled a - greatest(a - 1, 0), NOT least(a, 1): least/greatest
    # SKIP nulls, so least(NULL, 1.0) = 1.0 would turn a NULL coordinate
    # into a fabricated 20015 km; here greatest(NULL-1, 0) = 0 and
    # NULL - 0 stays NULL. Exact: for a near 1, a - 1.0 is Sterbenz-exact,
    # so the clamped value is exactly 1.0 when a > 1 and exactly a otherwise.
    clamped = a - F.greatest(a - F.lit(1.0), F.lit(0.0))
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(clamped))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """ANSI-SQL twin of :func:`haversine_km` for the DuckDB oracle.

    Same operation ORDER as the Spark expression, including the
    antipodal clamp, with radians spelled ``x / 180.0 * pi()``: Java's
    Math.toRadians computes x/180*PI while DuckDB's radians() computes
    x*(PI/180), which differ by 1 ulp on ~27% of inputs (measured
    5372/20000 sampled longitudes) — spelled out, the twins agree except
    for the libm 1-ulp class on sin/cos/asin themselves, which rounded
    oracle outputs absorb."""

    def rad(x: str) -> str:
        return f"(({x}) / 180.0 * pi())"

    dlat = f"({rad(f'({lat2}) - ({lat1})')} / 2.0)"
    dlon = f"({rad(f'({lon2}) - ({lon1})')} / 2.0)"
    a = (
        f"(sin({dlat}) * sin({dlat}) + cos({rad(lat1)}) * cos({rad(lat2)})"
        f" * sin({dlon}) * sin({dlon}))"
    )
    return f"(2.0 * {EARTH_RADIUS_KM} * asin(sqrt(({a} - greatest(({a} - 1.0), 0.0)))))"
