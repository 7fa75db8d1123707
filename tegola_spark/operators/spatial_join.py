"""Distributed spatial operators: two-phase spatial join + cell-ring kNN.

Two-phase spatial join (reference J2/J3/J4, SURVEY.md §2.3):
tegola's scan-side bbox range join (`geom && !BBOX!`,
provider/postgis/util.go:152-179) + GPKG r-tree index join
(provider/gpkg/gpkg.go:108-118) + hitmap point-in-polygon
(maths/hitmap/hitmap.go:108-196) become, in Spark terms:

  phase 1 (prefilter): polygons -> cover cells (explode) ; points ->
      cell id; EQUI-join on the cell — broadcast when the polygon side
      is small (it replaces the r-tree), shuffled hash join + AQE skew
      split otherwise. This is the canonical range-join decomposition:
      the big side never shuffles when the dim side broadcasts.
  phase 2 (residual): exact point-in-polygon as an Arrow pandas UDF,
      vectorized per distinct polygon within each batch.

At 100 TB the only wide exchange is the (optional) final aggregation;
the join itself is map-side. Hot cells (continent-scale polygons over
dense page clusters) are handled by keeping covers coarse per layer
(bounded cover size) + AQE skew-join splitting on the shuffled path.

Cell-ring kNN (north-star requirement; no tegola precedent —
SURVEY.md §7.4(7)): exact k-nearest-neighbors in (lon, lat) euclidean
space over a UNIFORM degree grid (ring math on mercator cells is not
distance-uniform; a fixed-degree grid gives exact ring bounds).
Algorithm (all heavy work stays distributed; only per-query aggregates
reach the driver):

  A. candidate pass: points within chebyshev cell-disk r of each query
     (broadcast query-cell list, equi-join) -> per-query kth distance
     d_k; r doubles for under-filled queries.
  B. exactness pass: re-join with r_safe = ceil(sqrt(d_k))/s + 1 cells
     — every point that could beat the kth candidate is inside that
     disk — then window top-k (rank by (dist_sq, id)).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..functions import cells, wkb
from . import geometry as geo


# ---------------------------------------------------------------------------
# two-phase spatial join
# ---------------------------------------------------------------------------

def polygon_cover(polys: DataFrame, res: int) -> DataFrame:
    """Explode polygons to their bbox cover cells at ``res`` (the
    broadcastable 'index side'). Requires minx/miny/maxx/maxy columns
    (precomputed envelope, F3-style — provider/gpkg/util.go:30-35).

    Pure column expressions (round-6, guide §4.1): the pandas-UDF form
    put a python worker round-trip on the broadcast-build critical path
    of every spatial join; the sequence+explode twin emits the same
    inclusive tile-range cell set from the same nudged conversions
    (grid.col_lon2num/col_lat2num are the oracle-proven column twins of
    the python pair cells.cover_bbox uses)."""
    from ..functions import grid

    x0 = grid.col_lon2num(F.col("minx"), res)
    x1 = grid.col_lon2num(F.col("maxx"), res)
    ya = grid.col_lat2num(F.col("maxy"), res)  # larger lat -> smaller y
    yb = grid.col_lat2num(F.col("miny"), res)
    out = polys.withColumn(
        "_cx", F.explode(F.sequence(F.least(x0, x1), F.greatest(x0, x1))))
    out = out.withColumn(
        "_cy", F.explode(F.sequence(F.least(ya, yb), F.greatest(ya, yb))))
    cell = (F.lit(res).cast("long") * F.lit(cells._RES_MULT).cast("long")
            + F.col("_cx") * F.lit(cells._XY_MULT).cast("long")
            + F.col("_cy"))
    return out.withColumn("cell", cell).drop("_cx", "_cy")


def pip_filter_udf():
    """Residual predicate: exact PIP on WKB polygons, vectorized per
    distinct polygon inside each Arrow batch (J4)."""

    @F.pandas_udf(T.BooleanType())
    def pip(lon: pd.Series, lat: pd.Series, geom_wkb: pd.Series) -> pd.Series:
        out = np.zeros(len(lon), dtype=bool)
        pts = np.column_stack([lon.to_numpy(), lat.to_numpy()])
        # group rows by polygon so each polygon decodes once and tests
        # all its points in one vectorized call; factorize + stable
        # argsort builds the groups in C (no per-row Python on the join
        # path — the only remaining loop is per DISTINCT polygon)
        codes, uniques = pd.factorize(geom_wkb, use_na_sentinel=False)
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(1, len(uniques)))
        for b, idx in zip(uniques, np.split(order, bounds)):
            g = wkb.decode(bytes(b))
            out[idx] = geo.points_in_polygon(pts[idx], g)
        return pd.Series(out)

    return pip


def spatial_join(points: DataFrame, polys: DataFrame, res: int,
                 broadcast_polys: bool = True) -> DataFrame:
    """points (lon, lat, ...) x polys (feature_id, layer, geom WKB,
    minx..maxy) -> matched pairs. Inner join; a point can match many
    polygons (one row per match)."""
    cover = polygon_cover(polys, res)
    if broadcast_polys:
        cover = F.broadcast(cover)
    # NO scan spread here (round-6 A/B): the PIP residual's python work
    # is proportional to the CANDIDATE set, which the cell prefilter
    # usually makes small (nations: ~2% of points) — spreading the
    # points shuffled the whole input to parallelize a tiny stage, and
    # spreading the candidates shipped the joined polygon geom per row.
    # Both variants measured at or below the round-start plan, which is
    # kept; at volume the scan is already wide and the question is moot.
    pts = points.withColumn("cell", cells.col_cell_from_lonlat(F.col("lon"), F.col("lat"), res))
    cand = pts.join(cover, "cell", "inner")
    pip = pip_filter_udf()
    return cand.where(pip(F.col("lon"), F.col("lat"), F.col("geom"))).drop("cell")


# ---------------------------------------------------------------------------
# cell-ring kNN (uniform degree grid)
# ---------------------------------------------------------------------------

def _grid_cols(df: DataFrame, step_deg: float) -> DataFrame:
    return (
        df.withColumn("_cx", F.floor((F.col("lon") + 180.0) / F.lit(step_deg)).cast("long"))
          .withColumn("_cy", F.floor((F.col("lat") + 90.0) / F.lit(step_deg)).cast("long"))
    )


def _disk_cells(qx: int, qy: int, r: int):
    return [(qx + dx, qy + dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)]


def knn_cell_ring(points: DataFrame, queries, k: int, step_deg: float = 4.0,
                  id_col: str = "doc_id") -> DataFrame:
    """Exact kNN of each query against ``points`` (lon/lat) by squared
    euclidean degree distance; ties broken by ``id_col``.

    ``queries``: list of (query_id, qlon, qlat). Returns DataFrame
    (query_id, rank, <id_col>, dist_sq).
    """
    from ..sources.corpus import spread_scan

    spark = points.sparkSession
    points = spread_scan(points, "lon")  # core-wide distance passes
    pts = _grid_cols(points, step_deg).select(id_col, "lon", "lat", "_cx", "_cy")
    pts.cache()
    try:
        total = pts.count()  # also materializes the cache
        qinfo = {
            qid: (
                float(qlon), float(qlat),
                int(math.floor((qlon + 180.0) / step_deg)),
                int(math.floor((qlat + 90.0) / step_deg)),
            )
            for qid, qlon, qlat in queries
        }

        def run_pass(radii: dict) -> DataFrame:
            rows = []
            for qid, r in radii.items():
                qlon, qlat, cx, cy = qinfo[qid]
                for (gx, gy) in _disk_cells(cx, cy, r):
                    rows.append((qid, qlon, qlat, gx, gy))
            qdf = spark.createDataFrame(
                rows, "query_id long, qlon double, qlat double, _cx long, _cy long")
            cand = pts.join(F.broadcast(qdf), ["_cx", "_cy"], "inner")
            dlon = F.col("lon") - F.col("qlon")
            dlat = F.col("lat") - F.col("qlat")
            dist = (dlon * dlon + dlat * dlat).alias("dist_sq")
            w = Window.partitionBy("query_id").orderBy("dist_sq", id_col)
            return (
                cand.select("query_id", id_col, dist)
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k)
            )

        # pass A: grow radii until every query has k candidates
        radii = {qid: 1 for qid in qinfo}
        kth: dict = {}
        for _ in range(32):
            topk = run_pass(radii)
            counts = {
                row["query_id"]: (row["n"], row["dk"])
                for row in topk.groupBy("query_id")
                .agg(F.count("*").alias("n"), F.max("dist_sq").alias("dk"))
                .collect()
            }
            under = {qid for qid in qinfo
                     if counts.get(qid, (0, None))[0] < min(k, total)}
            if not under:
                kth = {qid: counts[qid][1] for qid in qinfo}
                break
            for qid in under:
                radii[qid] *= 2
        else:  # pragma: no cover
            raise RuntimeError("knn radius growth did not converge")

        # pass B: exact — every point within sqrt(d_k) is inside the disk
        safe = {
            qid: max(radii[qid], int(math.ceil(math.sqrt(kth[qid]) / step_deg)) + 1)
            for qid in qinfo
        }
        return run_pass(safe).select("query_id", "rank", id_col, "dist_sq")
    finally:
        pts.unpersist()


def knn_cell_ring_df(points: DataFrame, queries: DataFrame, k: int,
                     step_deg: float = 4.0, id_col: str = "doc_id",
                     broadcast_queries: bool = True,
                     max_rounds: int = 8) -> DataFrame:
    """Fully-distributed exact kNN for LARGE query sets: ``queries`` is
    a DataFrame (query_id, qlon, qlat) and per-query state (radius, kth
    distance) lives in DataFrame columns — never on the driver. The
    only driver-side values per round are two scalars (total count,
    number of under-filled queries).

    Plan per round: disk cells explode as column expressions
    (sequence(-r, r) x sequence(-r, r)), equi-join against the gridded
    point table (broadcast when the query side is small; shuffled hash
    join + AQE otherwise), window top-k. The initial radius comes from
    a global density estimate so typical inputs converge in one round;
    under-filled queries double their radius. The exactness pass grows
    each radius to ceil(sqrt(d_k))/step + 1 — every point that could
    beat the kth candidate lies inside that disk.

    At 100 TB: the point table is scanned once per round (bounded by
    ``max_rounds``, usually 2); no per-query driver loops, no O(|Q|*r^2)
    driver lists — the scale-killer in knn_cell_ring's contract-sized
    twin (reviewed round 1)."""
    spark = points.sparkSession
    pts = _grid_cols(points, step_deg).select(id_col, "lon", "lat", "_cx", "_cy")
    pts.cache()
    try:
        total = pts.count()
        k_eff = min(k, total)
        n_cells = pts.select("_cx", "_cy").distinct().count()
        density = total / max(n_cells, 1)
        # (2r+1)^2 cells * density >= k  =>  r0
        r0 = max(1, int(math.ceil((math.sqrt(k_eff / max(density, 1e-9)) - 1) / 2)))

        q = (
            queries.select("query_id", "qlon", "qlat")
            .withColumn("_qcx", F.floor((F.col("qlon") + 180.0) / F.lit(step_deg)).cast("long"))
            .withColumn("_qcy", F.floor((F.col("qlat") + 90.0) / F.lit(step_deg)).cast("long"))
            .withColumn("r", F.lit(r0))
        )

        def pass_topk(qdf: DataFrame) -> DataFrame:
            cand_cells = (
                qdf.withColumn("_dx", F.explode(F.sequence(-F.col("r"), F.col("r"))))
                .withColumn("_dy", F.explode(F.sequence(-F.col("r"), F.col("r"))))
                .select(
                    "query_id", "qlon", "qlat",
                    (F.col("_qcx") + F.col("_dx")).alias("_cx"),
                    (F.col("_qcy") + F.col("_dy")).alias("_cy"),
                )
            )
            if broadcast_queries:
                cand_cells = F.broadcast(cand_cells)
            cand = pts.join(cand_cells, ["_cx", "_cy"], "inner")
            dlon = F.col("lon") - F.col("qlon")
            dlat = F.col("lat") - F.col("qlat")
            dist = (dlon * dlon + dlat * dlat).alias("dist_sq")
            w = Window.partitionBy("query_id").orderBy("dist_sq", id_col)
            return (
                cand.select("query_id", id_col, dist)
                .withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= k_eff)
            )

        # per-round caches are |Q|-sized; the superseded round's cache is
        # unpersisted as soon as the new one materializes (the count()),
        # so at most ONE query-state cache is live at any time
        prev_cache = None
        for _ in range(max_rounds):
            stats = (
                pass_topk(q).groupBy("query_id")
                .agg(F.count("*").alias("_n"), F.max("dist_sq").alias("_dk"))
            )
            q = (
                q.drop("_n", "_dk")
                .join(stats, "query_id", "left")
                .withColumn("_n", F.coalesce(F.col("_n"), F.lit(0)))
            ).cache()
            n_under = q.where(F.col("_n") < k_eff).count()
            if prev_cache is not None:
                prev_cache.unpersist()
            prev_cache = q
            if n_under == 0:
                break
            q = q.withColumn(
                "r", F.when(F.col("_n") < k_eff, F.col("r") * 2).otherwise(F.col("r")))
        else:  # pragma: no cover
            raise RuntimeError("knn radius growth did not converge")

        # exactness pass: the kth-candidate distance bounds the true disk.
        # localCheckpoint (eager, |Q| rows) truncates the per-round join
        # lineage so the last round cache can be released NOW; the blocks
        # live exactly as long as the returned plan references them.
        q_safe = q.withColumn(
            "r",
            F.greatest(
                F.col("r"),
                (F.ceil(F.sqrt(F.col("_dk")) / F.lit(step_deg)) + 1).cast("long"),
            ),
        ).localCheckpoint()
        if prev_cache is not None:
            prev_cache.unpersist()
        return pass_topk(q_safe).select("query_id", "rank", id_col, "dist_sq")
    finally:
        pts.unpersist()


def knn_bruteforce(points: DataFrame, queries, k: int,
                   id_col: str = "doc_id") -> DataFrame:
    """Reference implementation: broadcast cross join + window top-k.
    O(|P| * |Q|) but fully distributed — the baseline the cell-ring
    variant is differentially tested against."""
    spark = points.sparkSession
    qdf = spark.createDataFrame(list(queries), "query_id long, qlon double, qlat double")
    cand = points.crossJoin(F.broadcast(qdf))
    dlon = F.col("lon") - F.col("qlon")
    dlat = F.col("lat") - F.col("qlat")
    dist = (dlon * dlon + dlat * dlat).alias("dist_sq")
    w = Window.partitionBy("query_id").orderBy("dist_sq", id_col)
    return (
        cand.select("query_id", id_col, dist)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "dist_sq")
    )
