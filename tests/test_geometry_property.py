"""Property-based tests (hypothesis) for the geometry kernels —
invariants the table cases can't exhaust."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tegola_spark.functions import grid
from tegola_spark.operators import geometry as G
from tegola_spark.operators import mvt

# Coordinates on a 1e-6 grid within +-50: the kernels port the
# reference's float64 semantics VERBATIM, and hypothesis finds
# denormal-magnitude inputs (1e-313) where float cancellation breaks
# sign properties in the reference too (slope = dy/dx overflows, the
# shoelace sum cancels asymmetrically). Real inputs are tile-pixel or
# degree coordinates with ~1e-9 resolution, so the property domain is
# constrained to realistic magnitudes.
coord = st.integers(min_value=-50_000_000, max_value=50_000_000).map(
    lambda v: v / 1_000_000.0)
pt = st.tuples(coord, coord)


@settings(max_examples=200, deadline=None)
@given(st.lists(pt, min_size=2, max_size=12))
def test_clip_output_within_extent(points):
    ext = (0.0, 0.0, 10.0, 10.0)
    for part in G.clip_linestring(np.array(points), ext):
        assert (part[:, 0] >= ext[0] - 1e-9).all()
        assert (part[:, 0] <= ext[2] + 1e-9).all()
        assert (part[:, 1] >= ext[1] - 1e-9).all()
        assert (part[:, 1] <= ext[3] + 1e-9).all()
        assert len(part) >= 2


@settings(max_examples=200, deadline=None)
@given(st.lists(pt, min_size=2, max_size=12))
def test_clip_preserves_interior_points(points):
    """Every input point strictly inside the extent appears in the output."""
    ext = (0.0, 0.0, 10.0, 10.0)
    arr = np.array(points)
    parts = G.clip_linestring(arr, ext)
    got = {tuple(p) for part in parts for p in part}
    for p in points:
        if ext[0] < p[0] < ext[2] and ext[1] < p[1] < ext[3]:
            assert tuple(p) in got


@settings(max_examples=200, deadline=None)
@given(st.lists(pt, min_size=3, max_size=10), pt)
def test_pip_agrees_with_matplotlib_free_winding_count(ring_pts, test_pt):
    """PIP result is invariant under ring reversal (even-odd is
    orientation-free)."""
    ring = np.array(ring_pts)
    p = np.array([test_pt])
    a = G.points_in_rings(p, [ring])[0]
    b = G.points_in_rings(p, [ring[::-1]])[0]
    assert a == b


@settings(max_examples=100, deadline=None)
@given(st.lists(pt, min_size=4, max_size=14))
def test_dp_simplify_subset_and_endpoints(points):
    arr = np.array(points)
    out = G.dp_simplify(arr, 0.5)
    in_set = {tuple(p) for p in arr}
    assert all(tuple(p) in in_set for p in out)
    assert tuple(out[0]) == tuple(arr[0])
    assert tuple(out[-1]) == tuple(arr[-1])


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=-179.999, max_value=179.999),
       st.floats(min_value=-84.9, max_value=84.9),
       st.integers(min_value=0, max_value=16))
def test_tile_assignment_in_range_and_contains_point(lon, lat, z):
    x = int(grid.lon2num(lon, z))
    y = int(grid.lat2num(lat, z))
    n = 1 << z
    assert 0 <= x < n and 0 <= y < n
    # the point's continuous tile-unit coordinate lies within the
    # (nudge-tolerant) tile span
    wx = (180.0 + lon) / 360.0 * n
    assert x - 1e-5 <= wx <= x + 1 + 1e-5


@settings(max_examples=100, deadline=None)
@given(st.lists(pt, min_size=3, max_size=8))
def test_winding_reverse_negates(ring_pts):
    from hypothesis import assume

    ring = np.array(ring_pts)
    # antisymmetry is exact only above float-cancellation noise: the
    # reference translates by pts[0] before the shoelace sum
    # (winding.go:160-166), so forward/reverse use different anchors
    # and near-zero areas can disagree in the last ulp (same in Go)
    area2 = abs(mvt._xprod_sum(ring))
    scale = max(1.0, float(np.abs(ring).max()) ** 2)
    assume(area2 > 1e-9 * scale)
    w1 = mvt.winding(ring, True)
    w2 = mvt.winding(ring[::-1], True)
    assert w1 == -w2


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                min_size=1, max_size=8))
def test_zigzag_small_ints_roundtrip(vals):
    zz = mvt.zigzag(np.array(vals, dtype=np.int64))
    back = [(int(v) >> 1) ^ -(int(v) & 1) for v in zz]
    assert back == vals
