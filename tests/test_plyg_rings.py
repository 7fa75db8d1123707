"""Port of the reference's plyg ring-assembly test table
(maths/makevalid/plyg/ring_test.go:57-626 — TestBuildRingCol +
TestMerge2AdjecentRings, all 9 cases).

The reference asserts the internal RingCol structure (rings with
Inside/Outside labels + Y1s/Y2s edge descriptors) produced by
BuildRingCol / merge2AdjectRC. Our sweep shares the same column
triangulation unit (`_triangles_for_col` is an exact port of
plyg/ring.go:509-532) but assembles rings with a different stitcher
(leftmost-turn, makevalid.py module doc), so the port is SEMANTIC:
for each case we run the same column point lists + Pt2MaxY map +
hitmap through triangulation -> centroid labeling -> assembly, and
assert the resulting polygons cover EXACTLY the region of the case's
expected Inside-labeled rings (dense grid equivalence + exact net
area). Outside-labeled expected rings are the complementary cells of
the reference's partition and are represented by absence.

Merge cases run both column pairs and assemble the union — the
equivalent of merge2AdjectRC's zipper at the shared column — so a
stitch error at the shared x would show up as a coverage or area
mismatch.
"""

import numpy as np
import pytest

from tegola_spark.operators import geometry as G
from tegola_spark.operators import makevalid as MV

WORLD = np.array([[-100.0, -100.0], [100.0, -100.0],
                  [100.0, 100.0], [-100.0, 100.0]])
ALWAYS_INSIDE = ([WORLD], [True])          # hitmap.AllwaysInside
ALL_OUTSIDE = ([WORLD], [False])           # new(hitmap.M): all Outside


def _col_triangles(hm, col1, col2, pt2my):
    """BuildRingCol analog: triangulate one column pair, label each
    triangle centroid with the hitmap, keep Inside ones (the sweep's
    kept set — ring.go:168-172)."""
    tris = MV._triangles_for_col(pt2my, col1, col2)
    kept = []
    for (a, n1, b, n2) in tris:
        pts = list(col1[a:a + n1]) + list(col2[b:b + n2])
        if len(pts) != 3:
            continue
        c = ((pts[0][0] + pts[1][0] + pts[2][0]) / 3.0,
             (pts[0][1] + pts[1][1] + pts[2][1]) / 3.0)
        if hm.inside(np.array([c]))[0]:
            kept.append(pts)
    return kept


def _coverage(polys, pts):
    got = np.zeros(len(pts), dtype=bool)
    for p in polys:
        inside = G.points_in_rings(pts, [p[0]])
        for h in p[1:]:
            inside &= ~G.points_in_rings(pts, [h])
        got |= inside
    return got


def _expected_coverage(inside_rings, pts):
    want = np.zeros(len(pts), dtype=bool)
    for r in inside_rings:
        want |= G.points_in_rings(pts, [np.asarray(r, dtype=np.float64)])
    return want


def _shoelace(r):
    r = np.asarray(r, dtype=np.float64)
    return 0.5 * abs(float(np.dot(r[:, 0], np.roll(r[:, 1], -1))
                           - np.dot(np.roll(r[:, 0], -1), r[:, 1])))


def _net_area(polys):
    return (sum(G.ring_area_abs(p[0]) for p in polys)
            - sum(G.ring_area_abs(h) for p in polys for h in p[1:]))


def _check(hm_spec, col_pairs, pt2mys, inside_rings, bbox, n=73):
    hm = MV.HitMap(*hm_spec)
    kept = []
    for (c1, c2), m in zip(col_pairs, pt2mys):
        kept.extend(_col_triangles(hm, c1, c2, m))
    polys = MV._assemble(kept)
    want_area = sum(_shoelace(r) for r in inside_rings)
    assert _net_area(polys) == pytest.approx(want_area, abs=1e-9)
    # dense grid, offsets chosen OFF lattice lines and case diagonals
    xs = np.linspace(bbox[0] + 0.0137, bbox[1] - 0.0119, n)
    ys = np.linspace(bbox[2] + 0.0171, bbox[3] - 0.0153, n)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.column_stack([gx.ravel(), gy.ravel()])
    got = _coverage(polys, pts)
    want = _expected_coverage(inside_rings, pts)
    assert (got == want).all(), \
        f"coverage mismatch at {pts[got != want][:5]}"
    return polys


# --------------------------------------------------------------------------
# TestBuildRingCol (ring_test.go:57-218)
# --------------------------------------------------------------------------

def test_simple_rectangle():
    """Case 0: AllwaysInside unit column -> one Inside ring (the box)."""
    _check(ALWAYS_INSIDE,
           [([(0, 0), (0, 1)], [(1, 0), (1, 1)])], [{}],
           [[(0, 0), (1, 0), (1, 1), (0, 1)]], (0, 1, 0, 1))


def test_rectangle_constrained_rightward_line():
    """Case 1: same box, Pt2MaxY constraint at (0,0) forces the fan
    branch of getTriangles — ring output identical."""
    _check(ALWAYS_INSIDE,
           [([(0, 0), (0, 1)], [(1, 0), (1, 1)])], [{(0, 0): 100}],
           [[(0, 0), (1, 0), (1, 1), (0, 1)]], (0, 1, 0, 1))


def test_rectangle_constrained_rightward_line_1():
    """Case 2: shifted column x=1..2 with the same constraint."""
    _check(ALWAYS_INSIDE,
           [([(1, 0), (1, 1)], [(2, 0), (2, 1)])], [{(1, 0): 100}],
           [[(1, 0), (2, 0), (2, 1), (1, 1)]], (1, 2, 0, 1))


def test_empty_column_all_outside():
    """Case 3: empty hitmap labels everything Outside -> no rings."""
    hm = MV.HitMap(*ALL_OUTSIDE)
    col1 = [(0, 0), (0, 1), (0, 8), (0, 9)]
    col2 = [(1, 0), (1, 1), (1, 2), (1, 4), (1, 5), (1, 7), (1, 8), (1, 9)]
    my = {(0, 0): 0, (0, 1): 100, (0, 8): 800, (0, 9): 900}
    kept = _col_triangles(hm, col1, col2, my)
    assert kept == []
    assert MV._assemble(kept) == []


def test_number_eight_col0():
    """Case 4: the figure-8 hitmap's left column — inside region is the
    [0,1]x[1,8] strip (the expected Inside ring carries collinear
    hole-corner vertices on its right edge; geometrically identical)."""
    hm_rings = [
        [(0, 1), (4, 1), (4, 8), (0, 8)],
        [(1, 2), (3, 2), (3, 4), (1, 4)],
        [(1, 5), (3, 5), (3, 7), (1, 7)],
    ]
    _check((hm_rings, [True, False, False]),
           [([(0, 0), (0, 1), (0, 8), (0, 9)],
             [(1, 0), (1, 1), (1, 2), (1, 4), (1, 5), (1, 7), (1, 8), (1, 9)])],
           [{(0, 0): 0, (0, 1): 100, (0, 8): 800, (0, 9): 900}],
           [[(0, 1), (1, 1), (1, 2), (1, 4), (1, 5), (1, 7), (1, 8), (0, 8)]],
           (0, 1, 0, 9))


# --------------------------------------------------------------------------
# TestMerge2AdjecentRings (ring_test.go:220-626)
# --------------------------------------------------------------------------

def test_merge_simple_2_rectangles():
    """Merge case 0: two AllwaysInside unit columns zip into one ring."""
    polys = _check(
        ALWAYS_INSIDE,
        [([(0, 0), (0, 1)], [(1, 0), (1, 1)]),
         ([(1, 0), (1, 1)], [(2, 0), (2, 1)])],
        [{(0, 0): 100}, {(1, 0): 100}],
        [[(0, 0), (2, 0), (2, 1), (0, 1)]], (0, 2, 0, 1))
    # the shared column edge at x=1 must cancel: ONE polygon, no hole
    assert len(polys) == 1 and len(polys[0]) == 1
    assert not (polys[0][0][:, 0] == 1.0).all(axis=0).any() or \
        (polys[0][0][:, 0] != 1.0).any()


def test_merge_pacman_case8():
    """Merge case 1: two Inside triangles touching at the pinch (1,2) —
    the assembler must keep them as separate polygons."""
    tri1 = [(0, 1), (1, 1), (1, 2)]
    tri2 = [(0, 3), (1, 2), (2, 3)]
    polys = _check(
        ([tri1, tri2], [True, True]),
        [([(0, 0), (0, 1), (0, 3)], [(1, 0), (1, 1), (1, 2), (1, 3)]),
         ([(1, 0), (1, 1), (1, 2), (1, 3)], [(2, 0), (2, 3)])],
        [{(0, 1): 200}, {(1, 2): 300}],
        [tri1, tri2], (0, 2, 0, 3))
    assert len(polys) == 2


def test_merge_letter_e():
    """Merge case 2: the letter E — one Inside ring whose notches are
    the two Outside holes of the figure-8 hitmap."""
    hm_rings = [
        [(0, 1), (4, 1), (4, 8), (0, 8)],
        [(1, 2), (3, 2), (3, 4), (1, 4)],
        [(1, 5), (3, 5), (3, 7), (1, 7)],
    ]
    col_mid = [(1, 0), (1, 1), (1, 2), (1, 4), (1, 5), (1, 7), (1, 8), (1, 9)]
    _check(
        (hm_rings, [True, False, False]),
        [([(0, 0), (0, 1), (0, 8), (0, 9)], col_mid),
         (col_mid,
          [(3, 0), (3, 1), (3, 2), (3, 4), (3, 5), (3, 7), (3, 8), (3, 9)])],
        [{(0, 0): 0, (0, 1): 100, (0, 8): 800, (0, 9): 900},
         {(1, 0): 0, (1, 1): 100, (1, 2): 200, (1, 4): 400,
          (1, 5): 500, (1, 7): 700, (1, 8): 800, (1, 9): 900}],
        [[(0, 1), (3, 1), (3, 2), (1, 2), (1, 4), (3, 4), (3, 5),
          (1, 5), (1, 7), (3, 7), (3, 8), (0, 8)]],
        (0, 3, 0, 9), n=121)


def test_merge_letter_k():
    """Merge case 3: the letter K — Inside rect minus the Outside
    notch triangle {(1,2),(2,1),(2,3)} bitten out of the right edge."""
    _check(
        ([[(0, 0), (2, 0), (2, 4), (0, 4)], [(1, 2), (2, 1), (2, 3)]],
         [True, False]),
        [([(0, 0), (0, 4)], [(1, 0), (1, 2), (1, 4)]),
         ([(1, 0), (1, 2), (1, 4)], [(2, 0), (2, 1), (2, 3), (2, 4)])],
        [{(1, 2): 300}, {(1, 2): 300}],
        [[(0, 0), (2, 0), (2, 1), (1, 2), (2, 3), (2, 4), (0, 4)]],
        (0, 2, 0, 4), n=97)
