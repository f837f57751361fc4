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


def _read_ring(buf: memoryview, off: int, bo: str):
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    pts = np.frombuffer(buf, dtype=("<f8" if bo == "<" else ">f8"), count=2 * n, offset=off)
    return pts.reshape(n, 2).astype(np.float64), off + 16 * n


def decode(wkb: bytes) -> tuple[str, list[list[np.ndarray]]]:
    """Decode WKB -> (type_name, list of polygons, each a list of rings).

    LineStrings are returned as a single "polygon" with one open ring.
    """
    buf = memoryview(wkb)
    byte_order = buf[0]
    bo = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", buf, 1)
    gtype &= 0xFF  # strip SRID/Z flags
    off = 5
    if gtype == _WKB_LINESTRING:
        ring, _ = _read_ring(buf, off, bo)
        return "LineString", [[ring]]
    if gtype == _WKB_POLYGON:
        (nrings,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            ring, off = _read_ring(buf, off, bo)
            rings.append(ring)
        return "Polygon", [rings]
    if gtype == _WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        polys = []
        for _ in range(npoly):
            sub_bo = "<" if buf[off] == 1 else ">"
            off += 5  # nested byte order + type
            (nrings,) = struct.unpack_from(sub_bo + "I", buf, off)
            off += 4
            rings = []
            for _ in range(nrings):
                ring, off = _read_ring(buf, off, sub_bo)
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
