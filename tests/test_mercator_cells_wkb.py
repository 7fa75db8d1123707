"""Golden tests: ellipsoidal web-mercator (P8), cell index, WKB codec (E9)."""

import numpy as np
import pytest

from tegola_spark.functions import cells, grid, mercator, wkb


# -- mercator (maths/webmercator/main.go) -----------------------------------

def test_merc_origin_and_edge():
    assert mercator.lon_to_x(0.0) == 0.0
    assert mercator.lat_to_y(0.0) == pytest.approx(0.0, abs=1e-9)
    assert mercator.lon_to_x(180.0) == pytest.approx(20037508.342789244)


def test_merc_ellipsoidal_not_spherical():
    # frozen from the ported ellipsoidal formula; the spherical value
    # for lat 45 would be 5621521.48 — the ellipsoid differs by ~30 km,
    # which is exactly the trap SURVEY.md §7.4(6) warns about.
    assert mercator.lat_to_y(45.0) == pytest.approx(5591295.918489571, abs=1e-6)
    assert mercator.lat_to_y(-30.0) == pytest.approx(-3482189.0853635375, abs=1e-6)


def test_merc_clamp_895():
    # maths/webmercator/main.go:63: lat clamped to ±89.5 before projecting
    assert mercator.lat_to_y(89.9) == mercator.lat_to_y(89.5)
    assert mercator.lat_to_y(-89.9) == mercator.lat_to_y(-89.5)


def test_merc_roundtrip():
    lats = np.array([0.0, 45.0, -30.0, 85.05112, -85.05112, 12.345])
    lons = np.array([0.0, 179.0, -179.0, 90.0, -0.5, 13.4])
    x, y = mercator.project_points(lons, lats)
    lon2, lat2 = mercator.unproject_points(x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-7)
    np.testing.assert_allclose(lat2, lats, atol=1e-7)


# -- cells -------------------------------------------------------------------

def test_cell_pack_roundtrip():
    c = cells.cell_from_lonlat(13.4, 52.5, 12)
    res, x, y = cells.cell_decode(c)
    assert res == 12
    assert x == grid.lon2num(13.4, 12)
    assert y == grid.lat2num(52.5, 12)


def test_cell_parent_consistent_with_grid():
    c = cells.cell_from_lonlat(13.4, 52.5, 12)
    p = cells.cell_parent(c)
    res, x, y = cells.cell_decode(p)
    assert res == 11
    assert x == grid.lon2num(13.4, 11)
    assert y == grid.lat2num(52.5, 11)


def test_cell_ring_sizes_and_wrap():
    # interior ring k has 8k cells
    assert len(cells.cell_ring(5, 10, 10, 0)) == 1
    assert len(cells.cell_ring(5, 10, 10, 1)) == 8
    assert len(cells.cell_ring(5, 10, 10, 3)) == 24
    # x wraps at the antimeridian
    ring = cells.cell_ring(3, 0, 4, 1)
    xs = {cells.cell_decode(c)[1] for c in ring}
    assert 7 in xs  # x=-1 wrapped to 7
    # y clamps at the pole: no cells above row 0
    ring_top = cells.cell_ring(3, 4, 0, 1)
    assert all(cells.cell_decode(c)[2] >= 0 for c in ring_top)
    assert len(ring_top) == 5


def test_cell_disk():
    assert len(cells.cell_disk(5, 10, 10, 2)) == 25


def test_cover_bbox():
    cover = cells.cover_bbox(-10, -10, 10, 10, 3)
    res, xs, ys = zip(*(cells.cell_decode(c) for c in cover))
    assert set(res) == {3}
    assert min(xs) <= 3 and max(xs) >= 4  # straddles the meridian


# -- wkb ----------------------------------------------------------------------

GEOMS = [
    ("Point", np.array([1.5, -2.5])),
    ("MultiPoint", np.array([[0.0, 0.0], [3.0, 4.0]])),
    ("LineString", np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]])),
    ("MultiLineString", [np.array([[0.0, 0.0], [1.0, 1.0]]),
                         np.array([[5.0, 5.0], [6.0, 7.0], [8.0, 9.0]])]),
    ("Polygon", [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]),
                 np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]])]),
    ("MultiPolygon", [[np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]])],
                      [np.array([[10.0, 10.0], [14.0, 10.0], [14.0, 14.0], [10.0, 10.0]])]]),
]


@pytest.mark.parametrize("geom", GEOMS, ids=[g[0] for g in GEOMS])
def test_wkb_roundtrip(geom):
    out = wkb.decode(wkb.encode(geom))
    assert out[0] == geom[0]

    def flat(g):
        t, d = g
        if t == "Point":
            return [np.asarray(d).reshape(1, 2)]
        if t in ("MultiPoint", "LineString"):
            return [np.asarray(d)]
        if t in ("Polygon", "MultiLineString"):
            return [np.asarray(a) for a in d]
        return [np.asarray(r) for rings in d for r in rings]

    for a, b in zip(flat(geom), flat(out)):
        np.testing.assert_array_equal(a, b)


def test_wkb_known_point_bytes():
    # OGC example: little-endian point (1, 2)
    buf = wkb.encode(("Point", np.array([1.0, 2.0])))
    assert buf == bytes.fromhex(
        "0101000000000000000000f03f0000000000000040")


def test_wkb_big_endian_decode():
    buf = bytes.fromhex("00000000013ff00000000000004000000000000000")
    t, d = wkb.decode(buf)
    assert t == "Point"
    np.testing.assert_array_equal(d, [1.0, 2.0])


def test_bbox_and_map_coords():
    g = ("Polygon", [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 0.0]])])
    assert wkb.bbox(g) == (0.0, 0.0, 4.0, 4.0)
    g2 = wkb.map_coords(g, lambda a: a * 2.0)
    assert wkb.bbox(g2) == (0.0, 0.0, 8.0, 8.0)
