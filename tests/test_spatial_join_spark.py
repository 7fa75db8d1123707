"""Two-phase spatial join + cell-ring kNN: correctness vs in-Spark
reference predicates (rect ranges / brute force)."""

import pytest
from pyspark.sql import functions as F

from tegola_spark.operators import spatial_join as sj
from tegola_spark.sources import corpus, layers


@pytest.fixture(scope="module")
def points(spark, sf_dir):
    df = (
        corpus.documents(spark, sf_dir)
        .select(
            "doc_id",
            corpus.col_lon(F.col("doc_id")).alias("lon"),
            corpus.col_lat(F.col("doc_id")).alias("lat"),
        )
    )
    df.cache()
    df.count()
    yield df
    df.unpersist()


def _expected_rect_join(points, polys):
    """Oracle: inclusive rect containment (PIP on a rectangle ring is
    boundary-inclusive)."""
    return points.alias("p").join(
        polys.alias("q"),
        (F.col("p.lon") >= F.col("q.minx")) & (F.col("p.lon") <= F.col("q.maxx"))
        & (F.col("p.lat") >= F.col("q.miny")) & (F.col("p.lat") <= F.col("q.maxy")),
        "inner",
    ).select("p.doc_id", "q.feature_id")


@pytest.mark.parametrize("layer_fn,res", [
    (layers.nation_layer, 6),
    (layers.region_layer, 2),
])
def test_spatial_join_matches_rect_oracle(spark, sf_dir, points, layer_fn, res):
    polys = layer_fn(spark, sf_dir)
    got = sj.spatial_join(points, polys, res=res).select("doc_id", "feature_id")
    want = _expected_rect_join(points, polys)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0  # non-trivial


def test_spatial_join_shuffled_path(spark, sf_dir, points):
    polys = layers.nation_layer(spark, sf_dir)
    got = sj.spatial_join(points, polys, res=6, broadcast_polys=False)
    want = _expected_rect_join(points, polys)
    assert got.select("doc_id", "feature_id").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("doc_id", "feature_id")).count() == 0


QUERIES = [(0, 12.5, 48.1), (1, -73.9, 40.7), (2, 139.7, 35.6),
           (3, -0.1, 51.5), (4, 151.2, -33.8)]


def test_knn_cell_ring_equals_bruteforce(points):
    got = sj.knn_cell_ring(points, QUERIES, k=7)
    want = sj.knn_bruteforce(points, QUERIES, k=7)
    g = {(r["query_id"], r["rank"]): (r["doc_id"], r["dist_sq"]) for r in got.collect()}
    w = {(r["query_id"], r["rank"]): (r["doc_id"], r["dist_sq"]) for r in want.collect()}
    assert g == w
    assert len(g) == 5 * 7


def test_knn_k_larger_than_population(spark):
    import pandas as pd

    small = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3], "lon": [0.0, 1.0, 2.0], "lat": [0.0, 0.0, 0.0]}))
    got = sj.knn_cell_ring(small, [(0, 0.0, 0.0)], k=10)
    assert got.count() == 3


def test_knn_cell_ring_df_matches_bruteforce(spark, points):
    """DataFrame-native kNN (queries as a DataFrame, no driver-side
    per-query state) must agree exactly with the brute-force baseline."""
    pts = points
    qlist = [(0, 12.5, 48.1), (1, -73.9, 40.7), (2, 139.7, 35.6),
             (3, -0.1, 51.5), (4, 151.2, -33.8), (5, 0.0, 0.0)]
    qdf = spark.createDataFrame(qlist, "query_id long, qlon double, qlat double")
    got = sj.knn_cell_ring_df(pts, qdf, k=4).orderBy("query_id", "rank").collect()
    want = sj.knn_bruteforce(pts, qlist, k=4).orderBy("query_id", "rank").collect()
    assert len(got) == len(want) == 6 * 4
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == \
               (w["query_id"], w["rank"], w["doc_id"])
        assert abs(g["dist_sq"] - w["dist_sq"]) == 0.0


def test_infer_geom_type_probe(spark, sf_dir):
    # S3 LIMIT-1 probe (inspectLayerGeomType analog)
    nat = layers.nation_layer(spark, sf_dir)
    assert layers.infer_geom_type(nat) == "Polygon"
    empty = nat.where("1 = 0")
    assert layers.infer_geom_type(empty) is None
