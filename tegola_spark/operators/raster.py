"""Raster <-> vector resampling over the cell grid (north-star
requirement; no tegola precedent — SURVEY.md §7.4(7), design per §7.2
step 7).

A "raster" here is the engine's native gridded form: a DataFrame of
(cell, value) at one resolution — the standard discrete-global-grid
representation (H3/S2 papers call these "cell rasters"). All operators
are pure column expressions except the per-cell geometry synthesis.

  * rasterize_points   points + value -> cell aggregate        (1 shuffle)
  * rasterize_polygons polygons -> covered cells whose center is inside
                       (cover explode + vectorized PIP residual)
  * resample           raster at res R -> coarser res R' (parent rollup,
                       map-side combine) or finer (children explode,
                       value divided or copied)
  * vectorize          raster -> polygon features (one bbox quad per
                       cell) usable as a spatial-join layer or MVT input
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..functions import cells, grid
from . import spatial_join as sj

_XY_MULT = 1 << cells.XY_SHIFT
_RES_MULT = 1 << cells.RES_SHIFT


def rasterize_points(points: DataFrame, res: int, value_col: str | None = None,
                     agg: str = "count") -> DataFrame:
    """points (lon, lat[, value]) -> (cell, value) at ``res``.

    agg: count | sum | avg | min | max (over value_col when given)."""
    with_cell = points.withColumn(
        "cell", cells.col_cell_from_lonlat(F.col("lon"), F.col("lat"), res))
    if agg == "count" or value_col is None:
        return with_cell.groupBy("cell").agg(F.count("*").cast("double").alias("value"))
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[agg]
    return with_cell.groupBy("cell").agg(fn(value_col).cast("double").alias("value"))


def rasterize_polygons(polys: DataFrame, res: int, value_col: str = "feature_id") -> DataFrame:
    """polygons (geom WKB + envelope cols) -> cells whose CENTER is
    inside the polygon, valued by value_col (last-writer-wins resolved
    by max). Center-point sampling is the standard rasterization rule."""
    cover = sj.polygon_cover(polys, res)
    # cell center in lon/lat (pure column exprs: inverse slippy)
    cx = F.shiftright("cell", cells.XY_SHIFT) % F.lit(_XY_MULT)
    cy = F.col("cell") % F.lit(_XY_MULT)
    n = float(1 << res)
    lon = (cx.cast("double") + 0.5) / F.lit(n) * 360.0 - 180.0
    # tile2lat of (y + 0.5): lat = atan(sinh(pi*(1 - 2*(y+0.5)/n))) in deg
    import math
    inner = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * (cy.cast("double") + 0.5) / F.lit(n))
    lat = F.atan((F.exp(inner) - F.exp(-inner)) / F.lit(2.0)) * F.lit(180.0 / math.pi)
    cand = cover.withColumn("lon", lon).withColumn("lat", lat)
    pip = sj.pip_filter_udf()
    hit = cand.where(pip(F.col("lon"), F.col("lat"), F.col("geom")))
    return hit.groupBy("cell").agg(F.max(value_col).cast("double").alias("value"))


def resample(raster: DataFrame, from_res: int, to_res: int,
             agg: str = "sum") -> DataFrame:
    """Change resolution. Coarser: parent rollup with map-side partial
    aggregation (sum/avg/min/max). Finer: each cell explodes to its
    4^dres children; 'sum' splits the value evenly, others copy."""
    if to_res == from_res:
        return raster
    if to_res < from_res:
        dres = from_res - to_res
        parent = cells.col_cell_parent(F.col("cell"), dres).alias("cell")
        fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[agg]
        return raster.select(parent, "value").groupBy("cell").agg(
            fn("value").alias("value"))
    dres = to_res - from_res
    k = 1 << dres
    cx = F.shiftright("cell", cells.XY_SHIFT) % F.lit(_XY_MULT)
    cy = F.col("cell") % F.lit(_XY_MULT)
    dx = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("dx")
    out = raster.select("cell", "value", dx)
    out = out.select("cell", "value", "dx",
                     F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("dy"))
    child = (
        F.lit(to_res).cast("long") * F.lit(_RES_MULT)
        + (F.shiftleft(cx, dres) + F.col("dx")) * F.lit(_XY_MULT)
        + (F.shiftleft(cy, dres) + F.col("dy"))
    )
    val = (F.col("value") / F.lit(float(k * k))) if agg == "sum" else F.col("value")
    return out.select(child.alias("cell"), val.alias("value"))


def vectorize(raster: DataFrame, min_value: float | None = None) -> DataFrame:
    """raster -> polygon features (cell bbox quads in lon/lat WKB),
    suitable as a spatial-join right side or MVT layer input."""
    from ..functions import wkb as wkbmod

    r = raster if min_value is None else raster.where(F.col("value") >= min_value)

    @F.pandas_udf(T.BinaryType())
    def cell_poly(cell: pd.Series) -> pd.Series:
        res, x, y = cells.cell_decode(cell.to_numpy())
        out = []
        for rr, xx, yy in zip(res, x, y):
            lon0 = float(grid.tile2lon(xx, rr))
            lon1 = float(grid.tile2lon(xx + 1, rr))
            lat0 = float(grid.tile2lat_slippy(yy + 1, rr))  # south
            lat1 = float(grid.tile2lat_slippy(yy, rr))      # north
            ring = np.array([[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1]])
            out.append(wkbmod.encode(("Polygon", [ring])))
        return pd.Series(out)

    cx = F.shiftright("cell", cells.XY_SHIFT) % F.lit(_XY_MULT)
    cy = F.col("cell") % F.lit(_XY_MULT)
    res_col = F.shiftright("cell", cells.RES_SHIFT)
    n = F.pow(F.lit(2.0), res_col.cast("double"))
    import math
    lon0 = cx.cast("double") / n * 360.0 - 180.0
    lon1 = (cx.cast("double") + 1) / n * 360.0 - 180.0
    inner0 = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * cy.cast("double") / n)
    inner1 = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * (cy.cast("double") + 1) / n)
    lat1c = F.atan((F.exp(inner0) - F.exp(-inner0)) / F.lit(2.0)) * F.lit(180.0 / math.pi)
    lat0c = F.atan((F.exp(inner1) - F.exp(-inner1)) / F.lit(2.0)) * F.lit(180.0 / math.pi)
    return r.select(
        F.col("cell").alias("feature_id"), "value",
        lon0.alias("minx"), lat0c.alias("miny"),
        lon1.alias("maxx"), lat1c.alias("maxy"),
        cell_poly("cell").alias("geom"),
    )
