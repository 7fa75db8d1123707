"""Port of basic/maths/clean_test.go (TestCleanPolygon +
TestCleanMultiPolygon): ring grouping into OGC shells+holes under the
basic winding convention (shoelace >= 0 -> Clockwise shell)."""

import numpy as np
import pytest

from tegola_spark.operators import mvt

# basic.NewLine(4,2, 2,4, 2,6, 3,7, 5,8, 7,7, 8,5, 8,3, 6,2) — the
# "bad counter clockwise" ring of the reference table
BAD_CCW = np.array([(4, 2), (2, 4), (2, 6), (3, 7), (5, 8),
                    (7, 7), (8, 5), (8, 3), (6, 2)], dtype=np.float64)
SHELL = np.array([(1, 1), (9, 1), (9, 9), (1, 9)], dtype=np.float64)


def test_winding_convention():
    # the shell is "Clockwise" in the basic convention (sum >= 0)
    assert mvt.winding_of_pts(SHELL) == mvt.CLOCKWISE
    assert mvt.winding_of_pts(BAD_CCW) == mvt.COUNTER_CLOCKWISE
    # degenerate: empty/colinear-sum rings classify Clockwise (sum==0)
    assert mvt.winding_of_pts(np.empty((0, 2))) == mvt.CLOCKWISE


def test_clean_polygon_empty():
    polys, invalids = mvt.clean_polygon([])
    assert polys == [] and invalids == []


def test_clean_polygon_bad_first_line():
    polys, invalids = mvt.clean_polygon([BAD_CCW])
    assert polys == []
    assert len(invalids) == 1 and (invalids[0] == BAD_CCW).all()


def test_clean_polygon_bad_then_good():
    polys, invalids = mvt.clean_polygon([BAD_CCW, SHELL, BAD_CCW])
    assert len(polys) == 1
    assert len(polys[0]) == 2  # shell + hole
    assert (polys[0][0] == SHELL).all()
    assert (polys[0][1] == BAD_CCW).all()
    assert len(invalids) == 1


def test_clean_multipolygon_empty():
    assert mvt.clean_multipolygon([]) == []


def test_clean_multipolygon_broken_up():
    mp = mvt.clean_multipolygon([[SHELL], [BAD_CCW]])
    assert len(mp) == 1
    assert len(mp[0]) == 2
    assert (mp[0][0] == SHELL).all()
    assert (mp[0][1] == BAD_CCW).all()


def test_clean_multipolygon_orphan_first_errors():
    with pytest.raises(ValueError):
        mvt.clean_multipolygon([[BAD_CCW]])
