"""Property-based invariants (hypothesis) over the numpy kernels.

Mirrors the reference's runtime data-quality gates (SURVEY.md §5): tile
alignment, hierarchy containment, PIP consistency, hash determinism.
Kernel-level (no Spark session) so hundreds of examples stay fast.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geocore_spark.functions import hashing as hsh
from geocore_spark.functions import s2
from geocore_spark.functions import tiling as tl
from geocore_spark.geometry import pip, wkb

lat_st = st.floats(min_value=-89.9, max_value=89.9, allow_nan=False)
lon_st = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
res_st = st.integers(min_value=1, max_value=15)


@given(lat_st, lon_st, res_st)
@settings(max_examples=200, deadline=None)
def test_geocell_centroid_reencodes_to_same_cell(lat, lon, res):
    ix, iy = tl.np_encode(np.array([lat]), np.array([lon]), res)
    clat, clon = tl.np_centroid(ix, iy, res)
    ix2, iy2 = tl.np_encode(clat, clon, res)
    assert ix2[0] == ix[0] and iy2[0] == iy[0]


@given(lat_st, lon_st, res_st)
@settings(max_examples=200, deadline=None)
def test_geocell_parent_nesting(lat, lon, res):
    if res < 2:
        return
    ix_f, iy_f = tl.np_encode(np.array([lat]), np.array([lon]), res)
    ix_c, iy_c = tl.np_encode(np.array([lat]), np.array([lon]), res - 1)
    assert ix_f[0] // 2 == ix_c[0]
    assert iy_f[0] // 2 == iy_c[0]


@given(lat_st, lon_st, st.integers(min_value=1, max_value=29))
@settings(max_examples=200, deadline=None)
def test_s2_parent_contains_child(lat, lon, level):
    child = s2.cell_id(np.array([lat]), np.array([lon]), level + 1)
    parent = s2.cell_id(np.array([lat]), np.array([lon]), level)
    assert s2.cell_parent(child, level)[0] == parent[0]
    assert s2.cell_level(child)[0] == level + 1


@given(
    st.lists(st.tuples(lon_st, lat_st), min_size=3, max_size=8, unique=True),
    lon_st,
    lat_st,
)
@settings(max_examples=200, deadline=None)
def test_pip_agrees_with_winding_complement(verts, px, py):
    """Reversing ring orientation never changes even-odd membership —
    except exactly on the boundary, where the half-open edge rule is
    orientation-dependent by design (shared edges must not double-count),
    so near-boundary points are excluded."""
    ring = np.array(verts, float)
    closed = np.vstack([ring, ring[:1]])
    d = pip.point_segment_dist_deg(
        np.array([px]), np.array([py]), closed[:-1], closed[1:]
    )[0]
    if d < 1e-9:
        return
    b_fwd = wkb.encode_polygon([ring])
    b_rev = wkb.encode_polygon([ring[::-1]])
    got_f = pip.points_in_wkb(np.array([px]), np.array([py]), b_fwd)[0]
    got_r = pip.points_in_wkb(np.array([px]), np.array([py]), b_rev)[0]
    assert got_f == got_r


@given(st.text(min_size=0, max_size=300))
@settings(max_examples=100, deadline=None)
def test_shingle_and_simhash_deterministic(text):
    a = hsh.shingle_ids(text)
    b = hsh.shingle_ids(text)
    assert np.array_equal(a, b)
    assert hsh.simhash64(text) == hsh.simhash64(text)


@given(st.text(min_size=10, max_size=200))
@settings(max_examples=50, deadline=None)
def test_minhash_identical_texts_identical_sigs(text):
    assert np.array_equal(hsh.minhash_signature(text), hsh.minhash_signature(text))
    # whitespace normalization invariance
    assert np.array_equal(
        hsh.minhash_signature("  " + text.replace(" ", "  ")),
        hsh.minhash_signature(text),
    ) or " " not in text  # only guaranteed when normalization applies


@given(st.integers(min_value=0, max_value=2**62), st.integers(min_value=0, max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_hamming_pigeonhole_blocking(a, b):
    """The SimHash 4-block scheme must catch every pair with distance <= 3."""
    dist = bin(a ^ b).count("1")
    blocks_equal = any(
        ((a >> (16 * i)) & 0xFFFF) == ((b >> (16 * i)) & 0xFFFF) for i in range(4)
    )
    if dist <= 3:
        assert blocks_equal


@given(lat_st, lon_st, lat_st, lon_st)
@settings(max_examples=200, deadline=None)
def test_haversine_symmetry_and_triangle_zero(lat1, lon1, lat2, lon2):
    import math

    def hav(a, b, c, d):
        dlat = math.radians(c - a) / 2
        dlon = math.radians(d - b) / 2
        x = (
            math.sin(dlat) ** 2
            + math.cos(math.radians(a)) * math.cos(math.radians(c)) * math.sin(dlon) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(min(x, 1.0)))

    assert abs(hav(lat1, lon1, lat2, lon2) - hav(lat2, lon2, lat1, lon1)) < 1e-9
    assert hav(lat1, lon1, lat1, lon1) == 0.0


@given(
    st.lists(st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=50)
)
@settings(max_examples=300, deadline=None)
def test_integer_micro_mean_is_round_half_up(v6s):
    """The group_transform oracle arithmetic: (2s + c) div (2c) equals
    round-half-up(s/c) for any positive micro-unit values — the
    order-independent mean both engines compute identically."""
    from decimal import ROUND_HALF_UP, Decimal

    s, c = sum(v6s), len(v6s)
    got = (2 * s + c) // (2 * c)
    want = int(
        (Decimal(s) / Decimal(c)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
    )
    assert got == want




# -- winnowing fingerprints (functions/text.py) -------------------------------

_wtext = st.text(
    alphabet=st.sampled_from("abcdefgh "), min_size=0, max_size=120
)


@given(_wtext)
@settings(max_examples=200, deadline=None)
def test_winnow_deterministic_and_whitespace_normalized(text):
    """Same fingerprints on repeat runs and under whitespace re-layout
    (the kernel normalizes runs of whitespace + case before hashing)."""
    from geocore_spark.functions.text import winnow_fingerprints

    a = winnow_fingerprints(text)
    assert a == winnow_fingerprints(text)
    relaid = "  " + text.replace(" ", "   ").upper() + " "
    assert winnow_fingerprints(relaid) == a
    assert a == sorted(set(a))  # sorted de-duplicated ints


@given(
    st.text(alphabet=st.sampled_from("abcdef"), min_size=0, max_size=40),
    st.text(alphabet=st.sampled_from("uvwxyz"), min_size=30, max_size=80),
    st.text(alphabet=st.sampled_from("abcdef"), min_size=0, max_size=40),
    st.text(alphabet=st.sampled_from("ghijkl"), min_size=0, max_size=40),
    st.text(alphabet=st.sampled_from("ghijkl"), min_size=0, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_winnow_shared_substring_guarantee(pre1, shared, post1, pre2, post2):
    """Schleimer et al.'s detection guarantee: two documents sharing a
    substring of length >= k + window - 1 share at least one fingerprint
    (all hash windows fully inside the shared run are identical)."""
    from geocore_spark.functions.text import winnow_fingerprints

    k, w = 8, 4
    assert len(shared) >= k + w - 1
    t1 = pre1 + shared + post1
    t2 = pre2 + shared + post2
    f1 = set(winnow_fingerprints(t1, k=k, window=w))
    f2 = set(winnow_fingerprints(t2, k=k, window=w))
    assert f1 & f2


# -- robots parser vs the stdlib oracle (functions/robots.py) -----------------

_seg = st.text(alphabet=st.sampled_from("abcxyz0189"), min_size=1, max_size=6)
_path = st.builds(
    lambda segs: "/" + "/".join(segs), st.lists(_seg, min_size=0, max_size=3)
)
_star_group = st.builds(
    lambda rules: ["User-agent: *"] + [f"Disallow: {p}" for p in rules],
    st.lists(_path, min_size=0, max_size=4),
)
_other_group = st.builds(
    lambda rules: ["User-agent: otherbot"] + [f"Disallow: {p}" for p in rules],
    st.lists(_path, min_size=0, max_size=3),
)


@given(
    st.booleans(),
    _star_group,
    _other_group,
    st.lists(_path, min_size=1, max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_robots_parser_matches_stdlib_on_documented_subset(
    star_first, star, other, probes
):
    """On the documented REP subset (one ``*`` group, plain-prefix
    Disallow rules, no wildcards/Allow), the parser's allow decision must
    equal ``urllib.robotparser`` — an independent oracle for group
    detection, comment/blank handling, and prefix semantics."""
    import urllib.robotparser

    from geocore_spark.functions.robots import parse_robots_text

    groups = [star, other] if star_first else [other, star]
    body = "\n\n".join("\n".join(g) for g in groups) + "\n# trailing comment\n"

    rp = urllib.robotparser.RobotFileParser()
    rp.parse(body.splitlines())
    rules = parse_robots_text(body)
    for p in probes:
        ours = not any(p.startswith(r) for r in rules)
        assert ours == rp.can_fetch("somecrawler", f"https://h.example{p}"), (
            p,
            rules,
            body,
        )
