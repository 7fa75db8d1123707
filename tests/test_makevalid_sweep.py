"""G3 make-valid trapezoid sweep: coverage parity with the reference's
hitmap labeling, fixture case 0 vertex-exact, clip interaction."""

import numpy as np
import pytest

from tegola_spark.operators import geometry as G
from tegola_spark.operators import makevalid as MV


def _coverage(polys, pts):
    got = np.zeros(len(pts), dtype=bool)
    for p in polys:
        inside = G.points_in_rings(pts, [p[0]])
        for h in p[1:]:
            inside &= ~G.points_in_rings(pts, [h])
        got |= inside
    return got


def _grid(bbox, n=60):
    xs, ys = np.meshgrid(np.linspace(bbox[0], bbox[1], n),
                         np.linspace(bbox[2], bbox[3], n))
    return np.column_stack([xs.ravel(), ys.ravel()])


def test_fixture_case0_vertex_exact():
    """makevalid_test.go case 0: the sweep reproduces the reference's
    expected polygon VERTEX-FOR-VERTEX (up to ring rotation)."""
    r1 = np.array([[3.0, 1.0], [7.0, 1.0], [7.0, 6.0], [3.0, 6.0]])
    r2 = np.array([[4.0, 4.0], [4.0, 9.0], [5.0, 9.0], [5.0, 4.0]])
    polys = MV.make_valid([r1, r2])
    assert len(polys) == 1 and len(polys[0]) == 1
    got = {tuple(p) for p in polys[0][0]}
    want = {(3, 1), (7, 1), (7, 6), (5, 6), (5, 4), (4, 4), (4, 6), (3, 6)}
    assert got == want
    assert G.ring_area_abs(polys[0][0]) == pytest.approx(18.0)


def test_valid_square_identity():
    sq = np.array([[1.0, 1.0], [9.0, 1.0], [9.0, 9.0], [1.0, 9.0]])
    polys = MV.make_valid([sq])
    assert len(polys) == 1
    assert {tuple(p) for p in polys[0][0]} == {(1, 1), (9, 1), (9, 9), (1, 9)}


def test_square_with_hole():
    sq = np.array([[1.0, 1.0], [9.0, 1.0], [9.0, 9.0], [1.0, 9.0]])
    hole = np.array([[3.0, 3.0], [6.0, 3.0], [6.0, 6.0], [3.0, 6.0]])
    polys = MV.make_valid([sq, hole])
    net = sum(G.ring_area_abs(p[0]) for p in polys) \
        - sum(G.ring_area_abs(h) for p in polys for h in p[1:])
    assert net == pytest.approx(64.0 - 9.0)
    pts = _grid((1.05, 8.95, 1.05, 8.95))
    got = _coverage(polys, pts)
    want = MV.HitMap([sq, hole]).inside(pts)
    assert (got == want).all()


def test_bowtie_self_intersection():
    """Self-intersecting ring: even-odd coverage is reproduced (both
    lobes inside, area 8)."""
    bow = np.array([[0.0, 0.0], [4.0, 4.0], [4.0, 0.0], [0.0, 4.0]])
    polys = MV.make_valid([bow])
    area = sum(G.ring_area_abs(p[0]) for p in polys)
    assert area == pytest.approx(8.0)
    assert len(polys) == 2  # the pinch point splits the lobes
    # grid offsets chosen OFF the bowtie diagonals: a sample exactly on
    # an edge is boundary-inclusive against one representation and not
    # the other (float cross-product of different-but-collinear edges)
    pts = _grid((0.013, 3.987, 0.029, 3.971), n=53)
    assert (_coverage(polys, pts) == MV.HitMap([bow]).inside(pts)).all()


def test_clip_ext():
    sq = np.array([[1.0, 1.0], [9.0, 1.0], [9.0, 9.0], [1.0, 9.0]])
    polys = MV.make_valid([sq], clip_ext=(0, 0, 5, 5))
    assert len(polys) == 1
    assert {tuple(p) for p in polys[0][0]} == {(1, 1), (5, 1), (5, 5), (1, 5)}


def test_disjoint_multishell():
    a = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    b = np.array([[5.0, 5.0], [7.0, 5.0], [7.0, 7.0], [5.0, 7.0]])
    # ring list [a, b]: b is ring>0 => hole label; but b doesn't overlap
    # a, so hitmap coverage = a only (the reference behaves identically:
    # non-overlapping "holes" vanish)
    polys = MV.make_valid([a, b])
    area = sum(G.ring_area_abs(p[0]) for p in polys)
    assert area == pytest.approx(4.0)


def test_overlapping_rings_coverage_random_probe():
    rng = np.random.default_rng(3)
    r1 = np.array([[1.0, 1.0], [8.0, 1.0], [8.0, 6.0], [1.0, 6.0]])
    r2 = np.array([[4.0, 3.0], [9.0, 3.0], [9.0, 8.0], [4.0, 8.0]])
    polys = MV.make_valid([r1, r2])
    pts = rng.uniform(0.01, 9.99, size=(4000, 2))
    got = _coverage(polys, pts)
    want = MV.HitMap([r1, r2]).inside(pts)
    # allow only boundary-adjacent disagreement (none expected off-grid)
    assert (got == want).mean() > 0.999
