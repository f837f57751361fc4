"""S2 cell indexing — vectorized numpy implementation of the public spec.

The north rule pairs the H3-style string index with S2 level-12 int64 cells.
No S2 library is importable here, so this is a from-scratch, fully
vectorized implementation of the publicly documented S2 cell-id scheme
(s2geometry.io: cube-face projection, quadratic s-t transform, Hilbert
curve position, 64-bit id = 3 face bits + 2*level position bits + trailing
1). It runs as an Arrow-batched pandas UDF — the designated slow path for
kernels Catalyst cannot express (SURVEY.md §4) — at ~1e7 rows/sec/core in
numpy, versus ~1e5 for row-at-a-time Python.

Spark surface: :func:`s2_cell_udf` (lat,lon -> int64 id at ``level``),
:func:`s2_level_udf`, plus numpy kernels for tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

DEFAULT_LEVEL = 12
MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell traversal orders and orientation changes (public S2 spec).
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)

_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig: int, pos: int, orient: int) -> None:
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig] = (pos << 2) + orient
        _lookup_ij[(pos << 2) + orig] = (ij << 2) + orient
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orient]
    for idx in range(4):
        _init_lookup(
            level,
            i + (int(r[idx]) >> 1),
            j + (int(r[idx]) & 1),
            orig,
            pos + idx,
            orient ^ int(_POS_TO_ORIENT[idx]),
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def _latlng_to_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray):
    phi = np.radians(lat_deg)
    theta = np.radians(lon_deg)
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az), 0, np.where(ay >= az, 1, 2))
    face = np.where(
        np.choose(face, [x, y, z]) < 0, face + 3, face
    )  # negative axis -> faces 3..5
    u = np.empty_like(x)
    v = np.empty_like(x)
    # divide only each face's subset (mask operands FIRST): a global
    # batch touches all 6 faces, and dividing full arrays then masking
    # paid 12 full-length divisions per batch instead of ~2
    for f, (uf, vf) in enumerate(
        [
            (lambda x, y, z: y / x, lambda x, y, z: z / x),
            (lambda x, y, z: -x / y, lambda x, y, z: z / y),
            (lambda x, y, z: -x / z, lambda x, y, z: -y / z),
            (lambda x, y, z: z / x, lambda x, y, z: y / x),
            (lambda x, y, z: z / y, lambda x, y, z: -x / y),
            (lambda x, y, z: -y / z, lambda x, y, z: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            xm, ym, zm = x[m], y[m], z[m]
            u[m] = uf(xm, ym, zm)
            v[m] = vf(xm, ym, zm)
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the S2_QUADRATIC_PROJECTION default)."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) ** 2) / 3.0
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor((1 << MAX_LEVEL) * s).astype(np.int64), 0, (1 << MAX_LEVEL) - 1
    )


def leaf_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """(face, i, j) -> leaf (level-30) cell id. Vectorized Hilbert encode."""
    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face & _SWAP).astype(np.int64)
    for k in range(7, -1, -1):
        mask = (1 << _LOOKUP_BITS) - 1
        bits += ((i >> (k * 4)) & mask) << (_LOOKUP_BITS + 2)
        bits += ((j >> (k * 4)) & mask) << 2
        bits = _lookup_pos[bits]
        n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 8)
        bits &= _SWAP | _INVERT
    return (n * np.uint64(2) + np.uint64(1)).astype(np.uint64)


def leaf_to_face_ij(ids: np.ndarray):
    """leaf-or-any cell id -> (face, i, j) of its min-corner leaf path."""
    ids = ids.astype(np.uint64)
    face = (ids >> np.uint64(61)).astype(np.int64)
    bits = face & _SWAP
    i = np.zeros(len(ids), dtype=np.int64)
    j = np.zeros(len(ids), dtype=np.int64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        bits += (
            (ids >> np.uint64(k * 2 * _LOOKUP_BITS + 1)).astype(np.int64)
            & ((1 << (2 * nbits)) - 1)
        ) << 2
        bits = _lookup_ij[bits]
        i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
        j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
        bits &= _SWAP | _INVERT
    return face, i, j


def cell_id(lat, lon, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """lat/lon degrees -> S2 cell id at ``level`` (returned as int64)."""
    x, y, z = _latlng_to_xyz(np.asarray(lat, float), np.asarray(lon, float))
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = leaf_from_face_ij(face, i, j)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    parent = (leaf & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb
    return parent.view(np.int64)


def cell_level(ids: np.ndarray) -> np.ndarray:
    """Level of each id = 30 - trailing_zero_count/2."""
    u = np.asarray(ids).view(np.uint64) if np.asarray(ids).dtype == np.int64 else np.asarray(ids, np.uint64)
    lsb = u & (~u + np.uint64(1))
    tz = np.zeros(len(u), dtype=np.int64)
    l = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = l >= (np.uint64(1) << np.uint64(shift))
        tz[big] += shift
        l[big] >>= np.uint64(shift)
    return MAX_LEVEL - tz // 2


def cell_center_latlng(ids: np.ndarray):
    """cell id -> (lat, lon) of the cell center, degrees."""
    u = np.asarray(ids).view(np.uint64)
    face, i, j = leaf_to_face_ij(u)
    is_leaf = (u & np.uint64(1)).astype(bool)
    corr = ((i ^ (u >> np.uint64(2)).astype(np.int64)) & 1).astype(bool)
    delta = np.where(is_leaf, 1, np.where(corr, 2, 0))
    si = 2 * i + delta
    ti = 2 * j + delta
    s = si / float(1 << (MAX_LEVEL + 1))
    t = ti / float(1 << (MAX_LEVEL + 1))
    uu = _st_to_uv(s)
    vv = _st_to_uv(t)
    one = np.ones_like(uu)
    xyz_by_face = [
        (one, uu, vv),
        (-uu, one, vv),
        (-uu, -vv, one),
        (-one, -vv, -uu),
        (vv, -one, -uu),
        (vv, uu, -one),
    ]
    x = np.empty_like(uu)
    y = np.empty_like(uu)
    z = np.empty_like(uu)
    for f in range(6):
        m = face == f
        if m.any():
            x[m], y[m], z[m] = (c[m] for c in xyz_by_face[f])
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def cell_parent(ids: np.ndarray, level: int) -> np.ndarray:
    u = np.asarray(ids).view(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((u & ~(np.uint64(2) * lsb - np.uint64(1))) | lsb).view(np.int64)


# ---------------------------------------------------------------------------
# Spark surface: Arrow-batched pandas UDFs
# ---------------------------------------------------------------------------


# Null/NaN discipline for the UDF surface: a single null in an Arrow
# batch makes pandas hand the kernel float64 — int64 ids above 2^53 then
# ROUND to a different cell and nulls become INT64_MIN garbage (measured:
# pd.Series([2^60+1, None]).to_numpy(int64) alters the valid id too).
# Every kernel therefore masks invalid rows out BEFORE conversion and
# emits null for them.


def _masked_int64(ids: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    ok = ids.notna().to_numpy()
    vals = ids[ok].to_numpy(np.int64) if ok.any() else np.empty(0, np.int64)
    return ok, vals


def s2_cell_udf(level: int = DEFAULT_LEVEL):
    @F.pandas_udf("long")
    def _encode(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(float)
        lo = lon.to_numpy(float)
        ok = np.isfinite(la) & np.isfinite(lo)
        out = pd.array(np.zeros(len(la), np.int64), dtype="Int64")
        out[~ok] = None
        if ok.any():
            out[ok] = cell_id(la[ok], lo[ok], level)
        return pd.Series(out)

    return _encode


def s2_level_udf():
    @F.pandas_udf("int")
    def _level(ids: pd.Series) -> pd.Series:
        ok, vals = _masked_int64(ids)
        out = pd.array(np.zeros(len(ids), np.int32), dtype="Int32")
        out[~ok] = None
        if ok.any():
            out[ok] = cell_level(vals).astype(np.int32)
        return pd.Series(out)

    return _level


def s2_center_udf():
    @F.pandas_udf("struct<lat:double,lon:double>")
    def _center(ids: pd.Series) -> pd.DataFrame:
        ok, vals = _masked_int64(ids)
        lat = np.full(len(ids), np.nan)
        lon = np.full(len(ids), np.nan)
        if ok.any():
            lat[ok], lon[ok] = cell_center_latlng(vals)
        return pd.DataFrame({"lat": lat, "lon": lon})

    return _center
