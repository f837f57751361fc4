"""Geohash encode/decode as PURE Column expressions (no UDF).

The third cell index of the engine (equal-angle grid in
:mod:`functions.tiling`, S2 in :mod:`functions.s2`) — and the one that
interoperates verbatim with the outside world: geohash (Niemeyer 2008,
public spec; the Wikipedia test vectors pin the bit conventions) is what
ad-tech / OSM / Elasticsearch datasets ship, so a user joining external
geohash-keyed data needs these exact ids, not an analogue. The reference
keys on H3 strings (woodgilber/GeoCore modeling/datasets/build.py:185-187);
the real-H3 backend stays gated in functions/h3compat.py because the h3
wheel (and its base-cell tables) is not importable here — geohash has no
such tables, so it CAN be implemented from the spec and verified against
published vectors.

Construction (all codegen'd JVM arithmetic, zero Python):

  lonbits = ceil(5p/2), latbits = floor(5p/2)
  x = clamp(floor((lon + 180) / (360 / 2^lonbits)))     # same quantizer
  y = clamp(floor((lat +  90) / (180 / 2^latbits)))     # as tiling.py
  Z = interleave(x, y)      # MSB-first, longitude takes the first bit
  geohash = base32(Z)       # alphabet 0-9 b-z minus a,i,l,o

The interleave/base32 steps unroll to a fixed sum of shift-mask terms
(disjoint bits, so ``+`` == ``|``) — ~5p terms inside one whole-stage
codegen span. ``encode_sql`` emits the token-for-token DuckDB mirror so
the oracle compares bit-identical doubles and integers.

At 100 TB: narrow map, no shuffle, no UDF — same cost class as
tiling.latlng_to_cell; prefix truncation (substring) gives the coarse
grouping key, exactly like cell_to_parent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bits(precision: int) -> tuple[int, int]:
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in 1..12")
    total = 5 * precision
    lonbits = (total + 1) // 2
    return lonbits, total - lonbits


def _lon_positions(precision: int) -> list[int]:
    """Z bit positions (from LSB) holding longitude bits, LSB-of-x first."""
    total = 5 * precision
    # MSB-first the stream alternates lon,lat,lon,... — so from the LSB
    # end, lon bits sit at positions with parity (total-1) % 2 flipped
    return [total - 1 - k for k in range(0, total, 2)][::-1]


def _lat_positions(precision: int) -> list[int]:
    total = 5 * precision
    return [total - 1 - k for k in range(1, total, 2)][::-1]


def _quant(v: Column, offset: float, extent: float, bits: int) -> Column:
    """Exact boundary-consistent quantizer: which cell's [b(x), b(x+1))
    interval holds ``v``, where b(x) = -offset + x * extent/2^bits.

    The naive floor((v+offset)/e) suffers double rounding — a value one
    ULP below a cell boundary can land in the upper cell, diverging from
    the spec's interval-halving (whose midpoints are EXACT doubles:
    e = 45 * 2^(3-bits) has an exact product with any x < 2^bits here,
    and the sum with -offset stays on the same dyadic grid). So: floor
    quantize, then correct against the two exact neighboring boundaries
    — the drift is at most one cell, and at most one correction fires.
    Verified identical to interval-halving on 36k ULP-adjacent boundary
    probes + 20k random points at every precision (test_geohash.py).
    """
    n = 1 << bits
    e = extent / n
    x0 = F.floor((v + F.lit(offset)) / F.lit(e)).cast("long")
    up = F.when(
        v >= F.lit(-offset) + (x0 + F.lit(1)).cast("double") * F.lit(e),
        F.lit(1),
    ).otherwise(F.lit(0))
    down = F.when(
        v < F.lit(-offset) + x0.cast("double") * F.lit(e), F.lit(1)
    ).otherwise(F.lit(0))
    return F.least(F.greatest(x0 + up - down, F.lit(0)), F.lit(n - 1))


def encode(lat: Column, lon: Column, precision: int = 9) -> Column:
    """lat/lon -> geohash string of ``precision`` base32 characters."""
    lonbits, latbits = _bits(precision)
    x = _quant(lon, 180.0, 360.0, lonbits)
    y = _quant(lat, 90.0, 180.0, latbits)
    z = F.lit(0).cast("long")
    for i, pos in enumerate(_lon_positions(precision)):
        z = z + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << pos)
    for i, pos in enumerate(_lat_positions(precision)):
        z = z + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << pos)
    chars = [
        F.element_at(
            F.lit(list(ALPHABET)),
            (
                F.shiftright(z, 5 * (precision - 1 - g)).bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
        )
        for g in range(precision)
    ]
    return F.concat(*chars)


def decode(gh: Column, precision: int) -> Column:
    """geohash -> struct(lat, lon) of the CELL CENTROID (the canonical
    decode; re-encoding the centroid returns the same geohash).

    Staging rule: materialize this struct in its own projection (select /
    localCheckpoint) before feeding the fields into another unrolled
    expression like :func:`encode` — Catalyst inlines the full ~40-term
    decode tree into every consumer term otherwise, and Janino codegen
    time explodes (measured 170 s -> 8 s on a 200-row roundtrip).
    """
    lonbits, latbits = _bits(precision)
    z = F.lit(0).cast("long")
    for g in range(precision):
        val = (
            F.array_position(
                F.lit(list(ALPHABET)), F.substring(gh, g + 1, 1)
            )
            - F.lit(1)
        ).cast("long")
        z = z + val * F.lit(1 << (5 * (precision - 1 - g)))
    x = F.lit(0).cast("long")
    for i, pos in enumerate(_lon_positions(precision)):
        x = x + F.shiftright(z, pos).bitwiseAND(F.lit(1)) * F.lit(1 << i)
    y = F.lit(0).cast("long")
    for i, pos in enumerate(_lat_positions(precision)):
        y = y + F.shiftright(z, pos).bitwiseAND(F.lit(1)) * F.lit(1 << i)
    ex = 360.0 / (1 << lonbits)
    ey = 180.0 / (1 << latbits)
    lat = F.lit(-90.0) + (y.cast("double") + F.lit(0.5)) * F.lit(ey)
    lon = F.lit(-180.0) + (x.cast("double") + F.lit(0.5)) * F.lit(ex)
    return F.struct(lat.alias("lat"), lon.alias("lon"))


def decode_staged(
    df,
    gh: Column,
    precision: int,
    lat_col: str = "gh_lat",
    lon_col: str = "gh_lon",
):
    """Decode WITH the staging rule applied: returns ``df`` plus the
    centroid fields as plain materialized attributes (localCheckpoint),
    safe to feed into :func:`encode` or any other unrolled expression.

    This is the enforced form of the module's staging rule — composing
    ``encode(decode(...))`` in one projection inlines the ~40-term decode
    tree into every encode term and Janino codegen explodes (measured
    170 s -> 8 s on a 200-row roundtrip). The cut is pinned by a plan
    test (tests/test_geohash.py): downstream plans must reference the
    attributes, never the decode expression.
    """
    c = decode(gh, precision)
    return df.select(
        "*", c["lat"].alias(lat_col), c["lon"].alias(lon_col)
    ).localCheckpoint()


# ---------------------------------------------------------------------------
# DuckDB SQL mirror (oracle twin — token-for-token the same arithmetic)
# ---------------------------------------------------------------------------


def _quant_sql(v: str, offset: str, e: str, nmax: int) -> str:
    """SQL mirror of :func:`_quant` (same sub-expression shapes)."""
    x0 = (
        f"CAST(floor(({v} + CAST({offset} AS DOUBLE))"
        f" / CAST({e} AS DOUBLE)) AS BIGINT)"
    )
    up = (
        f"(CASE WHEN {v} >= CAST(-{offset} AS DOUBLE)"
        f" + CAST({x0} + 1 AS DOUBLE) * CAST({e} AS DOUBLE)"
        f" THEN 1 ELSE 0 END)"
    )
    down = (
        f"(CASE WHEN {v} < CAST(-{offset} AS DOUBLE)"
        f" + CAST({x0} AS DOUBLE) * CAST({e} AS DOUBLE)"
        f" THEN 1 ELSE 0 END)"
    )
    return f"least(greatest({x0} + {up} - {down}, 0), {nmax})"


def encode_sql(lat_expr: str, lon_expr: str, precision: int = 9) -> str:
    """DuckDB SQL expression computing the identical geohash string."""
    lonbits, latbits = _bits(precision)
    ex = repr(360.0 / (1 << lonbits))
    ey = repr(180.0 / (1 << latbits))
    x = _quant_sql(f"({lon_expr})", "180.0", ex, (1 << lonbits) - 1)
    y = _quant_sql(f"({lat_expr})", "90.0", ey, (1 << latbits) - 1)
    terms = [
        f"((({x} >> {i}) & 1) * {1 << pos})"
        for i, pos in enumerate(_lon_positions(precision))
    ] + [
        f"((({y} >> {i}) & 1) * {1 << pos})"
        for i, pos in enumerate(_lat_positions(precision))
    ]
    z = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{ALPHABET}', CAST((({z} >> {5 * (precision - 1 - g)})"
        f" & 31) + 1 AS INT), 1)"
        for g in range(precision)
    ]
    return "(" + " || ".join(chars) + ")"
