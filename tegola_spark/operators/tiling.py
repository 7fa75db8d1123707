"""Tile assignment + fan-out operators (reference T1-T5, J1, §2.5 buffer).

All assignment math is PURE COLUMN EXPRESSIONS (JVM-side, whole-stage
codegen) — no UDF in the hot path. The buffered-tile duplication
(SURVEY.md §2.5: a feature near an edge is emitted for every tile whose
buffered extent it intersects) is a 3x3 neighbor explode + filter,
exactly equivalent to the reference's per-tile bbox query with the
buffered extent (provider/provider.go:107-110; postgis util.go:152-179)
because the buffer (64px of a 4096px tile) is < 1 tile.

Membership is evaluated in SPHERICAL web-mercator tile units — the
projection the reference's bbox path uses (proj EPSG3857 with a=b,
slippy/tile_grid.go:122-130) — while feature geometry is later
reprojected ELLIPSOIDALLY for rendering (atlas/map.go:241-248). The
asymmetry is the reference's actual behavior.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import grid

BUFFER_FRAC = grid.DEFAULT_BUFFER / grid.DEFAULT_EXTENT  # 64/4096


def col_world_x(lon: Column, z: int) -> Column:
    """Continuous tile-unit x at zoom z (spherical; linear in lon)."""
    return (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << z))


def col_world_y(lat: Column, z: int) -> Column:
    """Continuous tile-unit y at zoom z (spherical mercator)."""
    phi = lat * F.lit(math.pi / 180.0)
    ymerc = F.log(F.tan(F.lit(math.pi / 4.0) + phi / F.lit(2.0)))
    return (F.lit(0.5) - ymerc / F.lit(2.0 * math.pi)) * F.lit(float(1 << z))


def assign_point_tiles(points: DataFrame, zooms, buffer_frac: float = BUFFER_FRAC) -> DataFrame:
    """Fan each point out to every (z, x, y) whose BUFFERED extent
    contains it. Adds columns z, x, y; one output row per membership."""
    n_z = {z: 1 << z for z in zooms}
    zdf = F.explode(F.array(*[F.lit(z) for z in zooms])).alias("z")
    out = points.select("*", zdf)
    # per-z world coords (piecewise since zoom is now a column)
    wx = None
    wy = None
    for z in zooms:
        cond = F.col("z") == z
        cx = col_world_x(F.col("lon"), z)
        cy = col_world_y(F.col("lat"), z)
        wx = F.when(cond, cx) if wx is None else wx.when(cond, cx)
        wy = F.when(cond, cy) if wy is None else wy.when(cond, cy)
    nmax = None
    for z in zooms:
        cond = F.col("z") == z
        nmax = F.when(cond, F.lit(n_z[z])) if nmax is None else nmax.when(cond, F.lit(n_z[z]))
    out = out.withColumn("_wx", wx).withColumn("_wy", wy).withColumn("_n", nmax)
    off = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    out = out.select("*", off.alias("_dx"))
    out = out.select("*", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("_dy"))
    x = (F.floor("_wx") + F.col("_dx")).cast("long")
    y = (F.floor("_wy") + F.col("_dy")).cast("long")
    b = F.lit(buffer_frac)
    keep = (
        (x >= 0) & (x < F.col("_n")) & (y >= 0) & (y < F.col("_n"))
        & (F.col("_wx") >= x.cast("double") - b)
        & (F.col("_wx") <= x.cast("double") + 1 + b)
        & (F.col("_wy") >= y.cast("double") - b)
        & (F.col("_wy") <= y.cast("double") + 1 + b)
    )
    return (
        out.withColumn("x", x).withColumn("y", y)
        .where(keep)
        .drop("_wx", "_wy", "_n", "_dx", "_dy")
    )


def assign_bbox_tiles(feats: DataFrame, zooms, buffer_frac: float = BUFFER_FRAC) -> DataFrame:
    """Fan bbox'd features (minx/miny/maxx/maxy in lon/lat) out to all
    tiles whose buffered extent intersects the bbox — the J2 bbox range
    join realized as sequence+explode (bounded: polygon layers are the
    small side). Adds z, x, y."""
    out = None
    for z in zooms:
        n = 1 << z
        x0 = F.floor(col_world_x(F.col("minx"), z) - F.lit(buffer_frac)).cast("long")
        x1 = F.floor(col_world_x(F.col("maxx"), z) + F.lit(buffer_frac)).cast("long")
        # y grows downward: maxy (north) -> smaller y
        y0 = F.floor(col_world_y(F.col("maxy"), z) - F.lit(buffer_frac)).cast("long")
        y1 = F.floor(col_world_y(F.col("miny"), z) + F.lit(buffer_frac)).cast("long")
        part = (
            feats.withColumn("z", F.lit(z))
            .withColumn("x", F.explode(F.sequence(
                F.greatest(x0, F.lit(0)), F.least(x1, F.lit(n - 1)))))
            .withColumn("y", F.explode(F.sequence(
                F.greatest(y0, F.lit(0)), F.least(y1, F.lit(n - 1)))))
        )
        out = part if out is None else out.unionByName(part)
    return out


def tile_list(spark, bounds, zooms) -> DataFrame:
    """T5: the driving tile work-list for (bounds, zooms) — the Spark
    form of the seed fan-out (cmd/tegola/cmd/cache/seed_purge.go:232-266)."""
    rows = grid.tiles_for_bounds(bounds[0], bounds[1], bounds[2], bounds[3], zooms)
    return spark.createDataFrame(rows, "z int, x long, y long")


def tile_list_from_file(spark, path: str, zooms=None,
                        explicit: bool = False) -> DataFrame:
    """S11 tile-list source: one z/x/y name per line, expanded across
    ``zooms`` unless ``explicit`` (the `tegola cache seed tile-list`
    input mode, cmd/tegola/cmd/cache/tile_list_generator.go).

    Only O(lines x zooms) SPANS touch the driver; the 4^dz descendant
    expansion runs distributively (sequence+explode with a rebalance
    between the x and y axes so one deep entry fans across the cluster),
    and distinct() reproduces the reference's dedup set."""
    with open(path) as f:
        entries = [ln for ln in (l.strip() for l in f) if ln]
    spans = grid.tile_spans_from_list(entries, zooms, explicit=explicit)
    sdf = spark.createDataFrame(
        spans, "z int, x0 long, x1 long, y0 long, y1 long")
    par = spark.sparkContext.defaultParallelism
    return (
        sdf.select("z", F.explode(F.sequence("x0", "x1")).alias("x"),
                   "y0", "y1")
        .repartition(par)  # spread each span's columns before the y fan
        .select("z", "x", F.explode(F.sequence("y0", "y1")).alias("y"))
        .distinct()
    )
