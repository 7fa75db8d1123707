"""Ports of the reference's remaining plyg unit tables.

1. TestGetTrianglesForCol (maths/makevalid/plyg/gettriangle_test.go:12-131)
   — `_triangles_for_col` is an EXACT port of _getTrianglesForCol
   (plyg/ring.go:509-532), so the expected `tri{a, n1, b, n2}` slices
   compare tuple-for-tuple, including the Pt2Maxy fan branches.

2. TestBuilder (maths/makevalid/plyg/builder_test.go:13-167) — the
   reference feeds per-column triangle fans into its ring Builder and
   asserts the stitched ring's vertex sequence. Our `_assemble` plays
   that role; rings compare vertex-exact after canonicalization
   (rotate to the lexicographically smallest vertex, CCW) with
   exactly-collinear vertices dropped from BOTH sides — the reference
   keeps collinear column points (e.g. (0,1) on the x=0 edge of the
   "Large Triangle" case), our assembler removes them; the geometric
   boundary is identical.
"""

import numpy as np

from tegola_spark.operators import makevalid as MV


# --------------------------------------------------------------------------
# TestGetTrianglesForCol — exact tri-slice comparison
# --------------------------------------------------------------------------

GT_CASES = {
    "simple": {
        "col1": [(0, 0), (0, 1)],
        "col2": [(1, 0), (1, 1)],
        "tris": [(0, 2, 0, 1), (1, 1, 0, 2)],
    },
    "simplel1": {
        "col1": [(0, 1)],
        "col2": [(1, 0), (1, 1)],
        "tris": [(0, 1, 0, 2)],
    },
    "simpler1": {
        "col1": [(0, 0), (0, 1)],
        "col2": [(1, 1)],
        "tris": [(0, 2, 0, 1)],
    },
    "with_maxy1": {
        "pt2maxy": {(0, 1): 300},
        "col1": [(0, 1), (0, 2), (0, 3)],
        "col2": [(1, 1), (1, 2), (1, 3)],
        "tris": [(0, 1, 0, 2), (0, 1, 1, 2), (0, 2, 2, 1), (1, 2, 2, 1)],
    },
    "with_maxy": {
        "pt2maxy": {(0, 1): 300},
        "col1": [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4)],
        "col2": [(1, 0), (1, 1), (1, 2), (1, 3), (1, 4)],
        "tris": [(0, 2, 0, 1), (1, 1, 0, 2),
                 (1, 1, 1, 2), (1, 1, 2, 2), (1, 2, 3, 1), (2, 2, 3, 1),
                 (3, 2, 3, 1), (4, 1, 3, 2)],
    },
}


def test_get_triangles_for_col_table():
    for name, tc in GT_CASES.items():
        got = MV._triangles_for_col(tc.get("pt2maxy", {}),
                                    tc["col1"], tc["col2"])
        assert got == tc["tris"], f"{name}: {got} != {tc['tris']}"


# --------------------------------------------------------------------------
# TestBuilder — stitched-ring vertex equality
# --------------------------------------------------------------------------

def _tri_points(ipoints, x1=0.0, x2=1.0):
    tris = []
    for ys1, ys2 in ipoints:
        tris.append([(x1, float(y)) for y in ys1]
                    + [(x2, float(y)) for y in ys2])
    return tris


def _canon(ring):
    """Canonical CCW ring starting at the smallest vertex, collinear
    vertices removed (module docstring)."""
    arr = np.asarray(ring, dtype=np.float64)
    keep = []
    n = len(arr)
    for i in range(n):
        a, b, c = arr[i - 1], arr[i], arr[(i + 1) % n]
        cross = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        if abs(cross) > 1e-12:
            keep.append(tuple(arr[i]))
    arr = np.array(keep)
    area2 = float(np.dot(arr[:, 0], np.roll(arr[:, 1], -1))
                  - np.dot(np.roll(arr[:, 0], -1), arr[:, 1]))
    if area2 < 0:
        arr = arr[::-1]
    i0 = int(np.lexsort((arr[:, 1], arr[:, 0]))[0])
    return [tuple(p) for p in np.roll(arr, -i0, axis=0)]


BUILDER_CASES = [
    ("Simple Triangle.",
     [[(0, 1), (0,)]], [(0, 0), (1, 0), (0, 1)]),
    ("Simple Triangle two.",
     [[(0,), (0, 1)]], [(0, 0), (1, 0), (1, 1)]),
    ("Simple Square.",
     [[(0,), (0, 1)], [(0, 1), (1,)]],
     [(0, 0), (1, 0), (1, 1), (0, 1)]),
    ("Diag Rect.",
     [[(0, 1), (1,)], [(1,), (1, 2)]],
     [(0, 0), (1, 1), (1, 2), (0, 1)]),
    ("Diag Rect. 1",
     [[(1,), (0, 1)], [(1, 2), (1,)]],
     [(0, 1), (1, 0), (1, 1), (0, 2)]),
    ("Large Triangle.",
     [[(0, 1), (1,)], [(1, 2), (1,)]],
     [(0, 0), (1, 1), (0, 2), (0, 1)]),
    ("Large Triangle 1.",
     [[(1,), (0, 1)], [(1,), (1, 2)]],
     [(0, 1), (1, 0), (1, 1), (1, 2)]),
    ("Left Triangle and Rectangle",
     [[(0, 1), (1,)], [(1,), (1, 2)], [(1, 2), (2,)]],
     [(0, 0), (1, 1), (1, 2), (0, 2), (0, 1)]),
    ("Right Triangle and Rectangle",
     [[(1,), (0, 1)], [(1,), (1, 2)], [(1, 2), (2,)]],
     [(0, 1), (1, 0), (1, 1), (1, 2), (0, 2)]),
]


def test_builder_table():
    for desc, ipoints, want_ring in BUILDER_CASES:
        polys = MV._assemble(_tri_points(ipoints))
        assert len(polys) == 1 and len(polys[0]) == 1, \
            f"{desc}: expected one shell, got {polys}"
        got = _canon(polys[0][0])
        want = _canon(want_ring)
        assert got == want, f"{desc}: {got} != {want}"
