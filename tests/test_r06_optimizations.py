"""Round-6 optimization pins: each test locks an optimization's
equivalence claim (results byte-identical / set-identical to the path it
replaced), so a later change can't silently break the fast path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tegola_spark.functions import cells
from tegola_spark.operators import mvt, spatial_join as sj
from tegola_spark.plans import pipeline
from tegola_spark.sources import corpus


def _docs(spark, n=60):
    rows = [(i, f"doc text {i} " + "w" * (i % 7), "en", "src%d" % (i % 3),
             20 + i % 7) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int")


# ---------------------------------------------------------------------------
# spread_scan: values unchanged, no-op below threshold / when wide enough
# ---------------------------------------------------------------------------

def test_spread_scan_preserves_rows(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.spread_scan(df, "doc_id")
    a = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert a == b


def test_spread_scan_noop_below_threshold(spark):
    # in-memory frame: inputFiles() fails -> conservative no-op
    df = _docs(spark)
    out = corpus.spread_scan(df, "doc_id")
    assert out is df


# ---------------------------------------------------------------------------
# polygon_cover: SQL twin emits exactly cells.cover_bbox's cell set
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("res", [2, 4, 6])
def test_polygon_cover_matches_python_cover(spark, sf_dir, res):
    from tegola_spark.sources import layers

    polys = layers.nation_layer(spark, sf_dir).unionByName(
        layers.region_layer(spark, sf_dir))
    got = (sj.polygon_cover(polys, res)
           .select("feature_id", "layer", "cell").collect())
    got_set = {(r["layer"], r["feature_id"], r["cell"]) for r in got}
    want_set = set()
    for r in polys.select("feature_id", "layer", "minx", "miny",
                          "maxx", "maxy").collect():
        for c in cells.cover_bbox(r["minx"], r["miny"], r["maxx"],
                                  r["maxy"], res):
            want_set.add((r["layer"], r["feature_id"], c))
    assert got_set == want_set
    assert len(got) == len(got_set)  # no duplicate cover rows


# ---------------------------------------------------------------------------
# exact cap-skip: identity when the budget cannot bind, intact when it can
# ---------------------------------------------------------------------------

def _tile_bytes(tiles):
    return {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
            for r in tiles.collect()}


def test_cap_skip_identity_when_budget_cannot_bind(spark, sf_dir):
    docs = _docs(spark, 40)
    # 40 docs <= cap 100: the skip gate fires; output must equal no-cap
    _, capped = pipeline.build_tiles(
        spark, sf_dir, zooms=[0, 1], docs=docs, with_polygons=False,
        max_features_per_tile=100, n_docs=40)
    _, uncapped = pipeline.build_tiles(
        spark, sf_dir, zooms=[0, 1], docs=docs, with_polygons=False,
        max_features_per_tile=None, n_docs=40)
    assert _tile_bytes(capped) == _tile_bytes(uncapped)


def test_cap_still_binds_above_budget(spark, sf_dir):
    docs = _docs(spark, 40)
    # 40 docs > cap 5: the gate must NOT skip; z0 keeps exactly 5 features
    metrics, _ = pipeline.build_tiles(
        spark, sf_dir, zooms=[0], docs=docs, with_polygons=False,
        max_features_per_tile=5, n_docs=40)
    row = metrics.where((F.col("z") == 0)).select(
        "n_features", "n_dropped").collect()[0]
    assert row["n_features"] == 5
    assert row["n_dropped"] == 35


# ---------------------------------------------------------------------------
# size-aware hybrid emitter: big groups take the vectorized path and stay
# byte-identical to the scalar path
# ---------------------------------------------------------------------------

def test_vector_emit_size_gate():
    prev = mvt._VECTORIZE_POINT_BLOCK
    mvt._VECTORIZE_POINT_BLOCK = False
    try:
        assert not mvt.vector_emit(mvt._VECTOR_EMIT_MIN_ROWS - 1)
        assert mvt.vector_emit(mvt._VECTOR_EMIT_MIN_ROWS)
    finally:
        mvt._VECTORIZE_POINT_BLOCK = prev


def test_vector_emit_big_group_byte_identical():
    n = mvt._VECTOR_EMIT_MIN_ROWS + 100
    rng = np.random.default_rng(7)
    lon = rng.uniform(-170, 170, n)
    lat = rng.uniform(-80, 80, n)
    pdf = pd.DataFrame({
        "z": 0, "x": 0, "y": 0,
        "feature_id": np.arange(n, dtype=np.int64),
        "lon": lon, "lat": lat,
        "tag_url": [f"https://a.example.com/{i}" for i in range(n)],
        "tag_lang": ["en"] * n,
    })
    prev = mvt._VECTORIZE_POINT_BLOCK
    prev_off = mvt._VECTOR_EMIT_FORCED_OFF
    try:
        # hybrid: global switch off, size gate on -> vectorized for this group
        mvt._VECTORIZE_POINT_BLOCK = False
        mvt._VECTOR_EMIT_FORCED_OFF = False
        hybrid = pipeline.encode_bucket(pdf.copy(), const_layer="pages")
        # forced scalar reference
        mvt._VECTOR_EMIT_FORCED_OFF = True
        scalar = pipeline.encode_bucket(pdf.copy(), const_layer="pages")
    finally:
        mvt._VECTORIZE_POINT_BLOCK = prev
        mvt._VECTOR_EMIT_FORCED_OFF = prev_off
    assert bytes(hybrid["layer_bytes"].iloc[0]) == \
        bytes(scalar["layer_bytes"].iloc[0])
    assert int(hybrid["n_features"].iloc[0]) == \
        int(scalar["n_features"].iloc[0])
