"""WKB codec + vectorized PIP + segment distance."""

import numpy as np

from geocore_spark.geometry import pip, wkb


def square(lon0, lat0, size):
    return np.array(
        [
            [lon0, lat0],
            [lon0 + size, lat0],
            [lon0 + size, lat0 + size],
            [lon0, lat0 + size],
        ]
    )


def test_wkb_polygon_roundtrip():
    ring = square(10.0, 20.0, 5.0)
    b = wkb.encode_polygon([ring])
    gtype, polys = wkb.decode(b)
    assert gtype == "Polygon"
    assert len(polys) == 1 and len(polys[0]) == 1
    assert np.allclose(polys[0][0][:-1], ring)
    assert np.array_equal(polys[0][0][0], polys[0][0][-1])  # closed


def test_wkb_bbox():
    b = wkb.encode_polygon([square(-10, -5, 3)])
    assert wkb.polygon_bbox(b) == (-10.0, -5.0, -7.0, -2.0)


def test_pip_square_inside_outside():
    b = wkb.encode_polygon([square(0, 0, 10)])
    lon = np.array([5.0, 15.0, -1.0, 9.999, 5.0])
    lat = np.array([5.0, 5.0, 5.0, 9.999, 10.5])
    got = pip.points_in_wkb(lon, lat, b)
    assert list(got) == [True, False, False, True, False]


def test_pip_with_hole():
    outer = square(0, 0, 10)
    hole = square(4, 4, 2)
    b = wkb.encode_polygon([outer, hole])
    lon = np.array([5.0, 1.0])
    lat = np.array([5.0, 1.0])
    got = pip.points_in_wkb(lon, lat, b)
    assert list(got) == [False, True]  # center is inside the hole


def test_pip_concave():
    # L-shaped polygon
    ring = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]], float)
    b = wkb.encode_polygon([ring])
    lon = np.array([2.0, 8.0, 8.0])
    lat = np.array([8.0, 2.0, 8.0])
    got = pip.points_in_wkb(lon, lat, b)
    assert list(got) == [True, True, False]  # notch corner is outside


def test_pip_matches_halfplane_count_random():
    # convex quad: PIP should equal "inside all 4 half-planes"
    ring = np.array([[0, 0], [10, 2], [9, 9], [1, 8]], float)
    b = wkb.encode_polygon([ring])
    rng = np.random.default_rng(3)
    lon = rng.uniform(-2, 12, 4000)
    lat = rng.uniform(-2, 12, 4000)
    closed = np.vstack([ring, ring[:1]])
    inside = np.ones(len(lon), bool)
    for k in range(4):
        ax, ay = closed[k]
        bx, by = closed[k + 1]
        cross = (bx - ax) * (lat - ay) - (by - ay) * (lon - ax)
        inside &= cross > 0
    got = pip.points_in_wkb(lon, lat, b)
    # ignore points within epsilon of an edge (boundary convention differs)
    dist = pip.point_segment_dist_deg(lon, lat, closed[:-1], closed[1:])
    mask = dist > 1e-6
    assert (got[mask] == inside[mask]).all()


def test_segment_distance():
    a = np.array([[0.0, 0.0]])
    b = np.array([[10.0, 0.0]])
    lon = np.array([5.0, -3.0, 12.0])
    lat = np.array([4.0, 4.0, 0.0])
    d = pip.point_segment_dist_deg(lon, lat, a, b)
    assert np.allclose(d, [4.0, 5.0, 2.0])


def test_linestring_segments():
    ls = wkb.encode_linestring(np.array([[0, 0], [1, 1], [2, 0]], float))
    starts, ends = pip.wkb_segments([ls])
    assert len(starts) == 2 and len(ends) == 2


def _encode_variant(ring, raw_type, dims, srid=None, bo="<"):
    import struct

    out = [bytes([1 if bo == "<" else 0]), struct.pack(bo + "I", raw_type)]
    if srid is not None:
        out.append(struct.pack(bo + "I", srid))
    out.append(struct.pack(bo + "I", 1))
    out.append(struct.pack(bo + "I", len(ring)))
    for x, y in ring:
        out.append(struct.pack(bo + "d" * dims, *([x, y] + [9.0] * (dims - 2))))
    return b"".join(out)


def test_wkb_ewkb_iso_z_m_srid_variants():
    # EWKB high-bit Z/M/SRID flags and ISO 1000/2000/3000 offsets must all
    # decode to the same 2D ring — the old `gtype & 0xFF` read EWKB-Z
    # coordinates with a 2-double stride (garbage) and misparsed the SRID
    # bytes as the ring count
    import struct

    sq = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    variants = [
        _encode_variant(sq, 0x80000003, 3),                      # EWKB Z
        _encode_variant(sq, 0x80000003 | 0x20000000, 3, 4326),   # EWKB Z+SRID
        _encode_variant(sq, 0xC0000003, 4),                      # EWKB ZM
        _encode_variant(sq, 1003, 3),                            # ISO Z
        _encode_variant(sq, 2003, 3),                            # ISO M
        _encode_variant(sq, 3003, 4),                            # ISO ZM
        _encode_variant(sq, 1003, 3, bo=">"),                    # big-endian ISO Z
    ]
    for w in variants:
        t, polys = wkb.decode(w)
        assert t == "Polygon"
        assert np.allclose(polys[0][0], sq)
    # multipolygon whose member carries its own EWKB-Z header
    mp = struct.pack("<BII", 1, 6, 1) + variants[0]
    t, polys = wkb.decode(mp)
    assert t == "MultiPolygon" and np.allclose(polys[0][0], sq)


def test_pip_unclosed_ring_virtually_closed():
    sq = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)])
    lon = np.array([2.0, 5.0, -1.0])
    lat = np.array([2.0, 5.0, 2.0])
    closed = pip.points_in_ring(lon, lat, sq)
    unclosed = pip.points_in_ring(lon, lat, sq[:-1])
    assert (closed == unclosed).all()
    assert closed.tolist() == [True, False, False]
