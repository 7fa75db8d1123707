"""Polygon make-valid via x-column trapezoid sweep (reference G3).

From-scratch implementation of the ALGORITHM SHAPE of tegola's
makevalid (maths/makevalid/main.go:157-311 + plyg ring assembly):

  1. hitmap labeling: ring 0 is Inside, later rings Outside, the LAST
     containing ring wins (maths/hitmap/hitmap.go:256-274, 276-340)
  2. split all ring segments at pairwise intersections, sweep the
     unique x-coordinates as columns (main.go:196-197)
  3. between vertically-consecutive segments in each column, label the
     trapezoid by the hitmap at its centroid; keep Inside trapezoids
  4. assemble the kept trapezoids into rings: non-vertical edges cancel
     exactly (shared segment, same column boundaries); vertical edges
     cancel by signed interval sweep per x; remaining directed edges
     stitch into loops; CCW loops are shells, CW are holes (y-up)

The output's COVERAGE (the set of contained points) matches the
reference; vertex order/decomposition may differ (the reference's own
tests compare full vertex lists, ours compare coverage + area —
SURVEY.md §7.4(2) records this as deliberate).

The reference parallelizes columns with NumCPU workers
(makevalid/main.go:19-23); here Spark task parallelism replaces that
(R8 in SURVEY.md §4) and the kernel stays single-threaded.
"""

from __future__ import annotations

import numpy as np

from . import geometry as G

_EPS = 1e-9
_QUANT = 1e7  # vertical-interval cancellation grid (1/_QUANT units)


class HitMap:
    """Ring 0 Inside, later rings Outside; last containing ring wins."""

    def __init__(self, rings):
        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]

    def inside(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
        label = np.zeros(len(pts), dtype=bool)  # default Outside
        decided = np.zeros(len(pts), dtype=bool)
        for i in range(len(self.rings) - 1, -1, -1):
            contains = G.points_in_rings(pts, [self.rings[i]])
            newly = contains & ~decided
            label[newly] = (i == 0)  # Inside only for ring 0
            decided |= contains
        return label


def _segments_of(rings):
    segs = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 2:
            continue
        closed = np.vstack([r, r[:1]]) if (r[0] != r[-1]).any() else r
        for i in range(len(closed) - 1):
            a, b = closed[i], closed[i + 1]
            if a[0] == b[0] and a[1] == b[1]:
                continue
            segs.append((tuple(a), tuple(b)))
    return segs


def _x_breaks(segs, clip_ext):
    xs = set()
    for a, b in segs:
        xs.add(a[0])
        xs.add(b[0])
    # pairwise intersection xs (segments only need splitting where they
    # cross INSIDE both spans)
    n = len(segs)
    for i in range(n):
        for j in range(i + 1, n):
            pt = G._intersect_infinite(segs[i], segs[j])
            if pt is None:
                continue
            if G._in_between(segs[i], pt) and G._in_between(segs[j], pt):
                xs.add(pt[0])
    if clip_ext is not None:
        xs.add(clip_ext[0])
        xs.add(clip_ext[2])
    return sorted(xs)


def _y_at(seg, x):
    (x0, y0), (x1, y1) = seg
    if x1 == x0:
        return min(y0, y1)
    t = (x - x0) / (x1 - x0)
    return y0 + t * (y1 - y0)


def make_valid(rings, clip_ext=None):
    """rings (ring0 shell, rest holes — possibly overlapping or
    self-intersecting) -> list of polygons [[shell, hole...], ...] whose
    coverage equals the hitmap labeling intersected with clip_ext."""
    rings = [np.asarray(r, dtype=np.float64) for r in rings if len(r) >= 3]
    if not rings:
        return []
    hm = HitMap(rings)
    segs = _segments_of(rings)
    if clip_ext is not None:
        # clip horizontal edges split columns where tops/bottoms cross them
        cminx, cminy, cmaxx, cmaxy = clip_ext
        segs_for_breaks = segs + [((cminx, cminy), (cmaxx, cminy)),
                                  ((cminx, cmaxy), (cmaxx, cmaxy))]
    else:
        segs_for_breaks = segs
    xs = _x_breaks(segs_for_breaks, clip_ext)
    if clip_ext is not None:
        xs = [x for x in xs if clip_ext[0] - _EPS <= x <= clip_ext[2] + _EPS]
    if len(xs) < 2:
        return []

    # collect inside trapezoids per column
    traps = []  # (x0, x1, yb0, yb1, yt0, yt1)
    all_spans = segs if clip_ext is None else segs_for_breaks
    for ci in range(len(xs) - 1):
        x0, x1 = xs[ci], xs[ci + 1]
        if x1 - x0 <= _EPS:
            continue
        xm = 0.5 * (x0 + x1)
        spanning = []
        for seg in all_spans:
            sx0, sx1 = sorted((seg[0][0], seg[1][0]))
            if sx0 <= x0 + _EPS and sx1 >= x1 - _EPS and sx1 - sx0 > _EPS:
                spanning.append(seg)
        if len(spanning) < 2:
            continue
        spanning.sort(key=lambda s: _y_at(s, xm))
        for si in range(len(spanning) - 1):
            lo, hi = spanning[si], spanning[si + 1]
            ym = 0.5 * (_y_at(lo, xm) + _y_at(hi, xm))
            if _y_at(hi, xm) - _y_at(lo, xm) <= _EPS:
                continue
            if clip_ext is not None and not (
                    clip_ext[1] - _EPS <= ym <= clip_ext[3] + _EPS):
                continue
            if not hm.inside(np.array([[xm, ym]]))[0]:
                continue
            traps.append((x0, x1, _y_at(lo, x0), _y_at(lo, x1),
                          _y_at(hi, x0), _y_at(hi, x1)))

    if not traps:
        return []

    # boundary edges: non-vertical edges cancel exactly via multiset;
    # vertical edges cancel via signed interval sweep per x
    from collections import defaultdict

    edge_count: dict = defaultdict(int)  # directed non-vertical edges
    vert: dict = defaultdict(list)       # x -> [(ylo, yhi, sign)]

    def q(v: float) -> int:
        return int(round(v * _QUANT))

    for (x0, x1, yb0, yb1, yt0, yt1) in traps:
        # CCW in y-up: bottom ->, right ^, top <-, left v
        edge_count[((q(x0), q(yb0)), (q(x1), q(yb1)))] += 1
        edge_count[((q(x1), q(yt1)), (q(x0), q(yt0)))] += 1
        vert[q(x1)].append((q(yb1), q(yt1), +1))   # right side, upward
        vert[q(x0)].append((q(yb0), q(yt0), -1))   # left side, downward

    edges = []  # directed ((x,y),(x,y)) in quantized ints
    for e, c in list(edge_count.items()):
        rev = (e[1], e[0])
        net = c - edge_count.get(rev, 0)
        if net > 0 and e[0] != e[1]:
            edges.extend([e] * net)
            edge_count[rev] = 0
            edge_count[e] = 0
    for x, intervals in vert.items():
        breaks = sorted({y for (a, b, _) in intervals for y in (a, b)})
        for bi in range(len(breaks) - 1):
            ylo, yhi = breaks[bi], breaks[bi + 1]
            if yhi <= ylo:
                continue
            net = sum(s for (a, b, s) in intervals if a <= ylo and b >= yhi)
            if net > 0:    # boundary going up (right side of interior)
                edges.append(((x, ylo), (x, yhi)))
            elif net < 0:  # going down
                edges.append(((x, yhi), (x, ylo)))

    # stitch directed edges into loops; at pinch points (several
    # outgoing edges) take the LEFTMOST turn relative to the incoming
    # direction — this separates touching lobes into distinct rings
    # instead of a figure-8 (the reference's ring assembly does the
    # equivalent in plyg/ring.go)
    import math as _math

    out_adj = defaultdict(list)
    for a, b in edges:
        out_adj[a].append(b)
    loops = []
    while any(out_adj.values()):
        start = next(k for k, v in out_adj.items() if v)
        loop = [start]
        prev = None
        cur = start
        for _ in range(len(edges) + 1):
            nxts = out_adj[cur]
            if not nxts:
                break
            if len(nxts) == 1 or prev is None:
                nxt = nxts.pop()
            else:
                din = _math.atan2(cur[1] - prev[1], cur[0] - prev[0])

                def turn(cand):
                    dout = _math.atan2(cand[1] - cur[1], cand[0] - cur[0])
                    # CCW turn angle in (0, 2pi]; smallest = leftmost
                    t = (dout - din - _math.pi) % (2 * _math.pi)
                    return t if t > 1e-12 else 2 * _math.pi

                nxt = max(nxts, key=turn)
                nxts.remove(nxt)
            loop.append(nxt)
            prev, cur = cur, nxt
            if cur == start:
                break
        if len(loop) > 3 and loop[0] == loop[-1]:
            loops.append(loop[:-1])

    # de-quantize, drop collinear points, orient
    polys = []
    holes = []
    for loop in loops:
        arr = np.array(loop, dtype=np.float64) / _QUANT
        # drop consecutive collinear vertices
        keep = []
        n = len(arr)
        for i in range(n):
            a, b, c = arr[i - 1], arr[i], arr[(i + 1) % n]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
            if abs(cross) > _EPS:
                keep.append(arr[i])
        if len(keep) < 3:
            continue
        ring = np.array(keep)
        area2 = float(np.dot(ring[:, 0], np.roll(ring[:, 1], -1))
                      - np.dot(np.roll(ring[:, 0], -1), ring[:, 1]))
        if area2 > 0:  # CCW in y-up = shell
            polys.append([ring])
        else:
            holes.append(ring)
    for h in holes:
        pt = h[0:1]
        for p in polys:
            if G.points_in_rings(pt, [p[0]])[0]:
                p.append(h)
                break
    return polys
