"""Port of the reference hitmap test table
(maths/hitmap/hitmap_test.go:13-199 — TestSegmentLinesContains +
TestNewFromPolygon/TestNewFromMultiPolygon).

Our HitMap/_RingEvents (operators/makevalid.py) is an exact port of
the segEvents leftward fixed-point ray cast, so the reference's
labeled point grids compare verbatim: the "Complicated shape (20x20)"
case pins all 400 inside/on-boundary/outside decisions of a 34-vertex
rectilinear-ish ring (boundary points count as contained).

The NewFrom* cases only assert no-crash on degenerate input (nil /
empty polygon / empty ring) — mirrored here against HitMap.
"""

import numpy as np

from tegola_spark.operators import makevalid as MV


def test_simple_square_contains():
    ring = np.array([[7, 1], [7, 6], [3, 6], [3, 1]], dtype=np.float64)
    hm = MV.HitMap([ring])
    pts = np.array([[3, 1], [7, 1], [7, 6], [3, 6], [4, 2], [5, 3],
                    [3, 0], [7, 0], [2, 6]], dtype=np.float64)
    want = np.array([True] * 6 + [False] * 3)
    got = hm.inside(pts)
    assert (got == want).all(), f"mismatch at {pts[got != want]}"


# the 34-vertex "Complicated shape" ring (hitmap_test.go:55-63)
COMPLICATED_RING = np.array([
    (2, 3), (4, 3), (4, 4), (6, 6), (9, 6), (8, 4), (6, 4),
    (4, 2), (10, 2), (10, 4), (12, 6), (16, 3), (16, 4),
    (18, 6), (18, 8), (16, 12), (14, 10), (16, 8), (16, 6),
    (12, 11), (10, 8), (10, 7), (8, 7), (8, 10), (6, 10),
    (6, 8), (4, 8), (4, 12), (18, 18), (8, 18), (2, 12),
    (2, 8), (4, 6), (2, 4),
], dtype=np.float64)

# expected containment per (x, y): row i is x=i+1, char j is y=j+1;
# '#' = contained (inside or on boundary), '.' = outside — transcribed
# from the cpt/ucpt grid at hitmap_test.go:64-126
COMPLICATED_GRID = [
    "....................",  # x=1
    "..##...#####........",  # x=2
    "..###.#######.......",  # x=3
    ".#############......",  # x=4
    ".##.####....###.....",  # x=5
    ".###.#####..####....",  # x=6
    ".###.#####...####...",  # x=7
    ".###.#####...#####..",  # x=8
    ".######.......####..",  # x=9
    ".#######......####..",  # x=10
    "....#####.....####..",  # x=11
    ".....######....###..",  # x=12
    ".....####......###..",  # x=13
    "....####.#......##..",  # x=14
    "...####.###.....##..",  # x=15
    "..##########.....#..",  # x=16
    "....######.......#..",  # x=17
    ".....###.........#..",  # x=18
    "....................",  # x=19
    "....................",  # x=20
]


def test_complicated_shape_20x20():
    hm = MV.HitMap([COMPLICATED_RING])
    pts = []
    want = []
    for xi, row in enumerate(COMPLICATED_GRID, start=1):
        assert len(row) == 20
        for yi, ch in enumerate(row, start=1):
            pts.append((float(xi), float(yi)))
            want.append(ch == "#")
    got = hm.inside(np.array(pts, dtype=np.float64))
    want = np.array(want)
    bad = np.nonzero(got != want)[0]
    assert len(bad) == 0, \
        f"mismatch at {[pts[i] for i in bad[:10]]} (of {len(bad)})"


def test_degenerate_construction_no_crash():
    """NewFromPolygon / NewFromMultiPolygon degenerate cases: nil,
    empty polygon, empty ring, single ring — construct + query without
    raising; empty hitmaps label everything Outside."""
    pt = np.array([[15.0, 15.0]])
    for rings in ([], [np.empty((0, 2))], [np.empty((0, 2)), np.empty((0, 2))]):
        hm = MV.HitMap(rings)
        assert hm.inside(pt)[0] == False  # noqa: E712
    hm = MV.HitMap([np.array([[10.0, 10], [20, 10], [20, 20], [10, 20]])])
    assert hm.inside(pt)[0] == True  # noqa: E712
