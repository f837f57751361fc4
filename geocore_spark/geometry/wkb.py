"""Minimal WKB codec for Polygon / MultiPolygon / LineString.

The reference carries vector layers as shapely/geopandas geometries
(/root/reference/data_pipeline.py:33,44). Our engine stores geometry as WKB
``binary`` columns (SURVEY.md §1.4); since shapely is not importable in this
environment, this is a from-scratch codec for the OGC well-known-binary
format (public spec, ISO 19125) covering the geometry types the engine
needs. Vertex arrays come out as numpy ``(n, 2)`` float64 (lon, lat order,
matching WKB x=lon, y=lat for EPSG:4326).
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """Encode a polygon; ``rings[0]`` is the exterior, rest are holes.

    Each ring is an (n, 2) array of (lon, lat); closed automatically.
    Little-endian WKB.
    """
    out = [struct.pack("<BII", 1, _WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def encode_linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    return (
        struct.pack("<BII", 1, _WKB_LINESTRING, len(coords))
        + coords.astype("<f8").tobytes()
    )


def _read_ring(buf: memoryview, off: int, bo: str, dims: int = 2):
    """One ring of ``dims``-dimensional points; Z/M ordinates are read with
    the correct stride and dropped (the engine is 2D)."""
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    pts = np.frombuffer(
        buf, dtype=("<f8" if bo == "<" else ">f8"), count=dims * n, offset=off
    )
    ring = pts.reshape(n, dims)[:, :2].astype(np.float64)
    return ring, off + 8 * dims * n


def _parse_header(buf: memoryview, off: int) -> tuple[str, int, int, int]:
    """Parse one geometry header at ``off``: (byte order, base type, point
    dims, offset past the header). Handles both EWKB high-bit flags
    (PostGIS: 0x80000000 Z, 0x40000000 M, 0x20000000 embedded SRID) and
    ISO WKB type offsets (1000 Z, 2000 M, 3000 ZM). The previous
    ``gtype & 0xFF`` silently decoded EWKB-Z polygons as 2D — three
    doubles per point read as alternating lon/lat garbage — and misread
    the 4 SRID bytes as the ring count."""
    bo = "<" if buf[off] == 1 else ">"
    (raw,) = struct.unpack_from(bo + "I", buf, off + 1)
    off += 5
    dims = 2
    if raw & 0x80000000:
        dims += 1  # EWKB Z
    if raw & 0x40000000:
        dims += 1  # EWKB M
    if raw & 0x20000000:
        off += 4  # EWKB embedded SRID
    base = raw & 0x0FFFFFFF
    iso_kind, base = divmod(base, 1000)
    if iso_kind == 1 or iso_kind == 3:
        dims += 1  # ISO Z / ZM
    if iso_kind == 2 or iso_kind == 3:
        dims += 1  # ISO M / ZM
    if iso_kind > 3:
        raise ValueError(f"unsupported ISO WKB type offset {iso_kind * 1000}")
    return bo, base, dims, off


def decode(wkb: bytes) -> tuple[str, list[list[np.ndarray]]]:
    """Decode WKB -> (type_name, list of polygons, each a list of rings).

    LineStrings are returned as a single "polygon" with one open ring.
    EWKB/ISO Z and M ordinates are accepted and dropped; embedded SRIDs
    are skipped.
    """
    buf = memoryview(wkb)
    bo, gtype, dims, off = _parse_header(buf, 0)
    if gtype == _WKB_LINESTRING:
        ring, _ = _read_ring(buf, off, bo, dims)
        return "LineString", [[ring]]
    if gtype == _WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _read_ring(buf, off, bo, dims)
            rings.append(ring)
        return "Polygon", [rings]
    if gtype == _WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        polys = []
        for _ in range(npoly):
            sub_bo, sub_type, sub_dims, off = _parse_header(buf, off)
            if sub_type != _WKB_POLYGON:
                raise ValueError(
                    f"MultiPolygon member has WKB type {sub_type}, expected Polygon"
                )
            (nrings,) = struct.unpack_from(sub_bo + "I", buf, off)
            off += 4
            rings = []
            for _ in range(nrings):
                ring, off = _read_ring(buf, off, sub_bo, sub_dims)
                rings.append(ring)
            polys.append(rings)
        return "MultiPolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def polygon_bbox(wkb: bytes) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) over all rings."""
    _, polys = decode(wkb)
    allpts = np.vstack([r for rings in polys for r in rings])
    return (
        float(allpts[:, 0].min()),
        float(allpts[:, 1].min()),
        float(allpts[:, 0].max()),
        float(allpts[:, 1].max()),
    )
