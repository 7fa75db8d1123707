"""Ported reference clip-region tables (maths/clip/region/region_test.go).

TestNewRegion (region_test.go:12-98): sentinel corner order + per-axis
down-or-right flags for both windings. TestRegion_UniqueIntersections
(region_test.go:100-313): the complete 19-case segment-vs-region
intersection table — point, inward flag and axis order must match; the
reference deliberately keeps duplicate/cancelling intersections (the
caller removes them), so the expected lists below include them verbatim.
"""

import pytest

from tegola_spark.operators.geometry import (
    region_intersections,
    region_sentinels,
)

RMIN = (0.0, 0.0)
RMAX = (100.0, 100.0)


def test_region_sentinels_clockwise():
    # region_test.go:13-41
    pts, dr = region_sentinels((0, 0), (10, 10), clockwise=True)
    assert pts == [(0, 10), (0, 0), (10, 0), (10, 10)]
    assert dr == [False, True, True, False]


def test_region_sentinels_counter_clockwise():
    # region_test.go:43-72
    pts, dr = region_sentinels((0, 0), (10, 10), clockwise=False)
    assert pts == [(0, 0), (0, 10), (10, 10), (10, 0)]
    assert dr == [True, True, False, False]


# (line, expected [(pt, inward), ...]) — region_test.go:107-298; the Go
# table's zero-value winding is Clockwise (maths/windingorder.go:11)
CASES = [
    # 0: both internal
    (((25, 25), (75, 75)), []),
    # 1: horizontal
    (((50, 50), (150, 50)), [((100, 50), False)]),
    # 2: horizontal inward
    (((150, 50), (50, 50)), [((100, 50), True)]),
    # 3: vertical
    (((50, 50), (50, 150)), [((50, 100), False)]),
    # 4: vertical inward
    (((50, 150), (50, 50)), [((50, 100), True)]),
    # 5: diagonal
    (((50, 50), (150, 150)), [((100, 100), False), ((100, 100), False)]),
    # 6: diagonal inward
    (((150, 150), (50, 50)), [((100, 100), True), ((100, 100), True)]),
    # 7: corner start
    (((0, 0), (50, 50)), [((0, 0), True), ((0, 0), True)]),
    # 8: vertical on border
    (((0, -50), (0, 150)), []),
    # 9: horizontal on border
    (((-50, 0), (150, 0)), []),
    # 10: vertical through
    (((50, -50), (50, 150)), [((50, 0), True), ((50, 100), False)]),
    # 11: vertical all outside
    (((-50, -50), (-50, 150)), []),
    # 12: horizontal through
    (((-50, 50), (150, 50)), [((0, 50), True), ((100, 50), False)]),
    # 13: horizontal all outside
    (((-50, -50), (150, -50)), []),
    # 14: diagonal through two axes
    (((-50, 75), (75, -50)), [((0, 25), True), ((25, 0), False)]),
    # 15: tangential diagonal at the corner
    (((-50, 50), (50, -50)), [((0, 0), True), ((0, 0), False)]),
    # 16: diagonal completely outside
    (((-50, 5), (10, -50)), []),
    # 17: diagonal corner-to-corner
    (((0, 100), (100, 0)),
     [((0, 100), True), ((100, 0), False),
      ((100, 0), False), ((0, 100), True)]),
    # 18: diagonal, fractional intersection
    (((-50, 50), (100, 0)),
     [((0, 33.333333333333336), True), ((100, 0), False),
      ((100, 0), False)]),
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_region_unique_intersections(case_idx):
    line, expected = CASES[case_idx]
    got = region_intersections(line, RMIN, RMAX, clockwise=True)
    assert len(got) == len(expected), \
        f"case {case_idx}: got {got} want {expected}"
    for i, (ept, einward) in enumerate(expected):
        gpt, ginward, _ = got[i]
        assert gpt[0] == ept[0] and gpt[1] == ept[1], \
            f"case {case_idx} pt {i}: got {gpt} want {ept}"
        assert ginward == einward, \
            f"case {case_idx} inward {i}: got {ginward} want {einward}"
