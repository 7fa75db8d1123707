"""Port of the reference clip-region AXIS tables
(maths/clip/region/axis_test.go:10-323 — TestAxis_Intersect, all 38
cases, and TestAxis_IsInward, all 13 cases) against the extracted
per-axis primitives region_axis_intersect / region_axis_is_inward
(the units region_intersections composes)."""

from tegola_spark.operators import geometry as G

RMIN, RMAX = (0, 0), (100, 100)
F = False
T = True
_ = None  # pt unchecked when doesIntersect is False

# (seg, [doesIntersect x4], [pt x4]) — axis order for the CW region:
# 0=left, 1=top(y=0), 2=right, 3=bottom(y=100) (axis.go winding chart)
INTERSECT_CASES = [
    (((0, 0), (50, 0)), [F, F, F, F], [_, _, _, _]),          # 0
    (((0, 0), (100, 0)), [F, F, F, F], [_, _, _, _]),         # 1
    (((0, 0), (150, 0)), [F, F, F, F], [_, _, _, _]),         # 2
    (((50, 0), (100, 0)), [F, F, F, F], [_, _, _, _]),        # 3
    (((50, 0), (150, 0)), [F, F, F, F], [_, _, _, _]),        # 4
    (((100, 0), (150, 0)), [F, F, F, F], [_, _, _, _]),       # 5
    (((0, 50), (50, 50)), [T, F, F, F], [(0, 50), _, _, _]),  # 6
    (((0, 50), (100, 50)), [T, F, T, F],
     [(0, 50), _, (100, 50), _]),                             # 7
    (((0, 50), (150, 50)), [T, F, T, F],
     [(0, 50), _, (100, 50), _]),                             # 8
    (((50, 50), (100, 50)), [F, F, T, F], [_, _, (100, 50), _]),   # 9
    (((50, 50), (150, 50)), [F, F, T, F], [_, _, (100, 50), _]),   # 10
    (((100, 50), (150, 50)), [F, F, T, F], [_, _, (100, 50), _]),  # 11
    (((0, 100), (50, 100)), [F, F, F, F], [_, _, _, _]),      # 12
    (((0, 100), (100, 100)), [F, F, F, F], [_, _, _, _]),     # 13
    (((0, 100), (150, 100)), [F, F, F, F], [_, _, _, _]),     # 14
    (((50, 100), (100, 100)), [F, F, F, F], [_, _, _, _]),    # 15
    (((100, 100), (150, 100)), [F, F, F, F], [_, _, _, _]),   # 16
    (((0, 0), (0, 50)), [F, F, F, F], [_, _, _, _]),          # 17
    (((0, 0), (0, 100)), [F, F, F, F], [_, _, _, _]),         # 18
    (((0, 0), (0, 150)), [F, F, F, F], [_, _, _, _]),         # 19
    (((0, 50), (0, 100)), [F, F, F, F], [_, _, _, _]),        # 20
    (((0, 100), (0, 150)), [F, F, F, F], [_, _, _, _]),       # 21
    (((0, 0), (0, 50)), [F, F, F, F], [_, _, _, _]),          # 22
    (((0, 0), (0, 100)), [F, F, F, F], [_, _, _, _]),         # 23
    (((0, 0), (0, 150)), [F, F, F, F], [_, _, _, _]),         # 24
    (((0, 50), (0, 100)), [F, F, F, F], [_, _, _, _]),        # 25
    (((0, 100), (0, 150)), [F, F, F, F], [_, _, _, _]),       # 26
    (((50, 0), (50, 50)), [F, T, F, F], [_, (50, 0), _, _]),  # 27
    (((50, 0), (50, 100)), [F, T, F, T],
     [_, (50, 0), _, (50, 100)]),                             # 28
    (((50, 0), (50, 150)), [F, T, F, T],
     [_, (50, 0), _, (50, 100)]),                             # 29
    (((50, 50), (50, 100)), [F, F, F, T], [_, _, _, (50, 100)]),   # 30
    (((50, 100), (50, 150)), [F, F, F, T], [_, _, _, (50, 100)]),  # 31
    (((0, 0), (50, 50)), [T, T, F, F], [(0, 0), (0, 0), _, _]),    # 32
    (((0, 0), (100, 100)), [T, T, T, T],
     [(0, 0), (0, 0), (100, 100), (100, 100)]),               # 33
    (((0, 0), (150, 150)), [T, T, T, T],
     [(0, 0), (0, 0), (100, 100), (100, 100)]),               # 34
    (((0, 100), (50, 50)), [T, F, F, T],
     [(0, 100), _, _, (0, 100)]),                             # 35
    (((0, 100), (100, 0)), [T, T, T, T],
     [(0, 100), (100, 0), (100, 0), (0, 100)]),               # 36
    (((0, 100), (150, -50)), [T, T, T, T],
     [(0, 100), (100, 0), (100, 0), (0, 100)]),               # 37
]


def test_axis_intersect_table():
    for ci, (seg, wants, pts) in enumerate(INTERSECT_CASES):
        for ax in range(4):
            pt, ok = G.region_axis_intersect(seg, RMIN, RMAX, ax,
                                             clockwise=True)
            assert ok == wants[ax], \
                f"case {ci} axis {ax}: got {ok} ({pt}) want {wants[ax]}"
            if wants[ax]:
                assert tuple(pt) == pts[ax], \
                    f"case {ci} axis {ax}: got {pt} want {pts[ax]}"


# (seg, [inward x4], [has_direction x4], clockwise) — has_direction is
# the inverse of the reference's ErrNoDirection
INWARD_CASES = [
    (((-50, 0), (50, 0)), [T, F, F, F], [T, F, T, F], True),   # 0
    (((0, 0), (50, 0)), [T, F, F, F], [T, F, T, F], True),     # 1
    (((0, 0), (100, 0)), [T, F, F, F], [T, F, T, F], True),    # 2
    (((0, 0), (150, 0)), [T, F, F, F], [T, F, T, F], True),    # 3
    (((50, 0), (-50, 0)), [F, F, T, F], [T, F, T, F], False),  # 4
    (((50, 0), (0, 0)), [F, F, T, F], [T, F, T, F], False),    # 5
    (((100, 0), (0, 0)), [F, F, T, F], [T, F, T, F], False),   # 6
    (((150, 0), (0, 0)), [F, F, T, F], [T, F, T, F], False),   # 7
    (((0, -50), (0, 0)), [F, T, F, F], [F, T, F, T], True),    # 8
    (((0, 0), (0, 50)), [F, T, F, F], [F, T, F, T], True),     # 9
    (((0, 0), (0, 100)), [F, T, F, F], [F, T, F, T], True),    # 10
    (((0, 0), (0, 150)), [F, T, F, F], [F, T, F, T], True),    # 11
    (((0, 150), (0, -50)), [F, T, F, F], [F, T, F, T], False), # 12
]


def test_axis_is_inward_table():
    for ci, (seg, inwards, dirs, cw) in enumerate(INWARD_CASES):
        for ax in range(4):
            inward, ok = G.region_axis_is_inward(seg, ax, clockwise=cw)
            assert ok == dirs[ax], \
                f"case {ci} axis {ax}: has_dir {ok} want {dirs[ax]}"
            assert inward == inwards[ax], \
                f"case {ci} axis {ax}: inward {inward} want {inwards[ax]}"
