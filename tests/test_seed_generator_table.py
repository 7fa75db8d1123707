"""Port of the cache-seed tile generator table
(cmd/tegola/cmd/cache/seed_purge_generator_test.go:69-180,
TestGenerateTilesForBounds) against grid.tiles_for_bounds — the
enumeration the seed CLI fans out over."""

from tegola_spark.functions import grid

WORLD = (-180.0, -85.0511, 180.0, 85.0511)


def test_world_zoom0():
    assert grid.tiles_for_bounds(*WORLD, [0]) == [(0, 0, 0)]


def test_world_zoom1():
    got = sorted(grid.tiles_for_bounds(*WORLD, [1]))
    assert got == [(1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]


def test_inverted_bounds_eastern_half():
    """bounds given as (180, 90, 0, 0) — the generator normalizes and
    yields the eastern hemisphere at z1."""
    got = sorted(grid.tiles_for_bounds(180.0, 90.0, 0.0, 0.0, [1]))
    assert got == [(1, 1, 0), (1, 1, 1)]


def test_alps_bounds_z10_exact_window():
    """The issue-880 regression window (5.9,45.8)-(10.5,47.8) at z10:
    exactly x 528..541 x y 356..365 (140 tiles, matching the table
    verbatim)."""
    got = set(grid.tiles_for_bounds(5.9, 45.8, 10.5, 47.8, [10]))
    want = {(10, x, y) for x in range(528, 542) for y in range(356, 366)}
    assert got == want
