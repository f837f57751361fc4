"""Unit tests for tools/verify_local's multiset comparator helpers.

The comparator is evidence infrastructure: a bug here silently green-lights
a wrong oracle (or red-flags a right one). Pins the r4-ADVICE fix — drift
that straddles the rounded-rendering sort boundary (9.999999995e-01 vs
1.000000001e+00) misaligns the zipped tolerance pass; the greedy re-match
fallback must still pass those rows, while genuinely different values must
still fail.
"""

from __future__ import annotations

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "_vl", "/root/repo/tools/verify_local.py"
)
_vl = importlib.util.module_from_spec(spec)
# verify_local imports __spark_entry__ at module load (cheap: no session)
sys.path.insert(0, "/root/repo")
spec.loader.exec_module(_vl)


def _compare_rowsets(srows, orows, cols):
    """Drive the post-collect half of _vl.compare on in-memory rows."""
    sms, _ = _vl._rows_to_multiset(srows, cols)
    oms, _ = _vl._rows_to_multiset(orows, cols)
    if sms == oms:
        return True, "exact"
    mism = [
        i
        for i, (a, b) in enumerate(zip(sms, oms))
        if not all(_vl._approx_equal(x, y) for x, y in zip(a, b))
    ]
    if not mism:
        return True, "approx"
    rem = [oms[i] for i in mism]
    for i in mism:
        a = sms[i]
        hit = next((j for j, b in enumerate(rem) if _vl._approx_equal(a, b)), None)
        if hit is None:
            return False, "values"
        rem.pop(hit)
    return True, "greedy"


def test_exact_match():
    rows = [(1, 2.5), (2, 3.5)]
    assert _compare_rowsets(rows, list(reversed(rows)), ["a", "b"]) == (
        True,
        "exact",
    )


def test_small_drift_same_order():
    s = [(1, 1.0), (2, 2.0)]
    o = [(1, 1.0 + 1e-12), (2, 2.0 - 1e-12)]
    ok, how = _compare_rowsets(s, o, ["a", "b"])
    assert ok and how in ("approx", "exact")


def test_boundary_straddle_greedy_rematch():
    """The ADVICE scenario: two float values tolerance-equal but rendering
    to different 9-sig-digit strings on either side of 1.0, so the sorted
    multisets interleave differently and the zipped pass misaligns."""
    lo, hi = 9.999999995e-01, 1.000000001e00
    assert abs(lo - hi) <= 1e-6 * max(1.0, lo, hi)
    assert f"{lo:.9e}" != f"{hi:.9e}"
    # spark renders (lo, X); oracle renders (hi, X') with X far from lo/hi
    s = [(lo,), (2.0,)]
    o = [(hi,), (2.0,)]
    ok, how = _compare_rowsets(s, o, ["v"])
    assert ok, "tolerance-equal multisets must pass"


def test_straddle_with_interleaving_rows():
    """Sort-order inversion across rows: spark sorts [0.9999…, 1.0000001]
    one way, oracle the other — every zipped pair mismatches but the
    multisets match greedily."""
    s = [(9.999999995e-01, "a"), (1.000000001e00, "b")]
    o = [(1.000000000e00, "a"), (9.999999999e-01, "b")]
    ok, _ = _compare_rowsets(s, o, ["v", "k"])
    assert ok


def test_genuine_mismatch_still_fails():
    s = [(1.0,), (2.0,)]
    o = [(1.0,), (2.5,)]
    ok, how = _compare_rowsets(s, o, ["v"])
    assert not ok and how == "values"


def test_greedy_does_not_double_match():
    """One oracle row cannot satisfy two spark rows: [1.0, 1.0] vs
    [1.0, 5.0] must fail even though each spark row approx-matches the
    single 1.0."""
    s = [(1.0,), (1.0 + 1e-10,)]
    o = [(1.0,), (5.0,)]
    ok, _ = _compare_rowsets(s, o, ["v"])
    assert not ok
