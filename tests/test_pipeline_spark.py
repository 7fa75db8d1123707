"""End-to-end tile pipeline tests: fan-out, encode, assembly, decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tegola_spark.functions import grid
from tegola_spark.operators import mvt, tiling
from tegola_spark.plans import pipeline


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    metrics, tiles = pipeline.build_tiles(spark, sf_dir, zooms=[0, 1, 2])
    metrics.cache()
    tiles.cache()
    metrics.count()
    tiles.count()
    yield metrics, tiles
    metrics.unpersist()
    tiles.unpersist()


def test_z0_has_all_points(built, spark, sf_dir):
    metrics, _ = built
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    z0 = metrics.where("z = 0 AND layer = 'pages'").collect()
    assert len(z0) == 1
    assert z0[0]["n_features"] == n_docs
    assert z0[0]["n_dropped"] == 0


def test_buffered_duplication_at_z2(built, spark, sf_dir):
    metrics, _ = built
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    total = (
        metrics.where("z = 2 AND layer = 'pages'")
        .agg(F.sum("n_features")).first()[0]
    )
    # every point lands in >= 1 tile; edge points duplicate
    assert total >= n_docs
    assert total <= n_docs * 4  # a point fits at most 4 buffered tiles


def test_region_layer_zoom_pruned(built):
    metrics, _ = built
    # regions valid z0..6 -> present at z<=2 here
    assert metrics.where("layer = 'regions'").count() > 0
    # nations present too
    assert metrics.where("layer = 'nations'").count() > 0


def test_tile_assembly_and_decode(built):
    _, tiles = built
    row = tiles.where("z = 0").first()
    assert row is not None
    decoded = mvt.decode_tile(bytes(row["tile_bytes"]))
    assert "pages" in decoded
    assert "nations" in decoded
    assert "regions" in decoded
    pages = decoded["pages"]
    assert pages["version"] == 2
    assert pages["extent"] == 4096
    assert len(pages["features"]) == row["n_features"] - sum(
        len(decoded[l]["features"]) for l in ("nations", "regions"))
    # tag dictionary sane
    assert "url" in pages["keys"]
    ft = pages["features"][0]
    assert ft["type"] == mvt.GEOM_POINT


def test_z0_nations_geometry_roundtrip(built):
    """Decode the z0 nations layer and verify each polygon's pixel bbox
    matches the expected quantized rectangle (within truncation)."""
    _, tiles = built
    row = tiles.where("z = 0").first()
    decoded = mvt.decode_tile(bytes(row["tile_bytes"]))
    nations = decoded["nations"]
    assert len(nations["features"]) == 25
    ext = grid.tile_extent_3857(0, 0, 0)
    for ft in nations["features"]:
        ops = mvt.decode_geometry_commands(ft["geometry"])
        pts = [p for kind, ps in ops if ps for p in ps]
        arr = np.array(pts, dtype=float)
        # all within buffered pixel bounds
        assert arr[:, 0].min() >= -64 - 1 and arr[:, 0].max() <= 4160 + 1
        assert arr[:, 1].min() >= -64 - 1 and arr[:, 1].max() <= 4160 + 1
        # winding: first ring clockwise y-down
        ring = []
        for kind, ps in ops:
            if kind == "close":
                break
            ring.extend(ps)
        assert mvt.winding(np.array(ring, dtype=float), True) == mvt.CLOCKWISE


def test_metrics_lineage_columns(built):
    metrics, _ = built
    cols = set(metrics.columns)
    assert {"z", "x", "y", "layer", "n_features", "n_dropped",
            "bytes", "encode_ms"} <= cols
    assert metrics.where("bytes <= 0").count() == 0


def test_feature_cap(spark, sf_dir):
    metrics, _ = pipeline.build_tiles(spark, sf_dir, zooms=[0],
                                      max_features_per_tile=10,
                                      with_polygons=False)
    row = metrics.where("layer = 'pages'").first()
    assert row["n_features"] <= 10


def test_tile_list():
    df_rows = grid.tiles_for_bounds(-180, -85.0511, 180, 85.0511, [2])
    assert len(df_rows) == 16


def test_geometry_collection_flattens_and_empty_skips():
    """GeometryCollection features: empty -> skipped (atlas/map.go:232-236);
    non-empty -> flattened into one feature per member with shared tags
    (mvt.NewFeatures, mvt/feature.go:48-67)."""
    import pandas as pd
    from tegola_spark.functions import wkb

    ext = grid.tile_extent_3857(0, 0, 0)
    cx = (ext[0] + ext[2]) / 2
    coll = ("GeometryCollection", [
        ("Point", np.array([10.0, 10.0])),
        ("LineString", np.array([[0.0, 0.0], [40.0, 20.0], [80.0, 0.0]])),
    ])
    empty = ("GeometryCollection", [])
    pdf = pd.DataFrame({
        "z": [0, 0], "x": [0, 0], "y": [0, 0],
        "layer": ["l", "l"], "feature_id": [1, 2],
        "geom": [wkb.encode(coll), wkb.encode(empty)],
        "srid": [4326, 4326],
        "tag_kind": ["coll", "empty"],
    })
    out = pipeline.encode_bucket(pdf)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_features"] == 2       # the two flattened members
    assert row["n_dropped"] == 1        # the empty collection
    decoded = mvt.decode_tile(bytes(row["layer_bytes"]))["l"]
    types = sorted(f["type"] for f in decoded["features"])
    assert types == [mvt.GEOM_POINT, mvt.GEOM_LINESTRING]
    # both flattened features carry the same id and tags
    assert all(f["id"] == 1 for f in decoded["features"])


def test_feature_cap_enforced_and_metered(spark, sf_dir):
    """Pre-shuffle per-(tile, layer) cap: deterministic (rank by
    feature_id), capped rows never reach the encode, and the drop count
    rides into the n_dropped lineage column."""
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    metrics, _ = pipeline.build_tiles(spark, sf_dir, zooms=[0],
                                      max_features_per_tile=3,
                                      with_polygons=False)
    row = metrics.where("z = 0 AND layer = 'pages'").first()
    assert row["n_features"] == 3
    assert row["n_dropped"] == n_docs - 3
    # deterministic: the 3 kept are the lowest feature_ids
    from tegola_spark.operators import mvt as mvt_ops
    decoded = mvt_ops.decode_tile(bytes(row["layer_bytes"]))["pages"]
    ids = sorted(f["id"] for f in decoded["features"])
    assert ids == [0, 1, 2]


def test_feature_cap_auto_default_no_effect_at_test_scale(spark, sf_dir):
    """'auto' budgets (65536 at z<=4) leave small corpora untouched."""
    metrics, _ = pipeline.build_tiles(spark, sf_dir, zooms=[0],
                                      with_polygons=False)
    row = metrics.where("z = 0 AND layer = 'pages'").first()
    assert row["n_dropped"] == 0


def test_hierarchical_build_byte_identical(spark, sf_dir):
    """build_tiles_hierarchical (one anchor shuffle for deep point
    zooms) must produce byte-identical tiles to the per-zoom fan-out."""
    zooms = [0, 1, 2, 3, 4, 5]
    _, std = pipeline.build_tiles(spark, sf_dir, zooms=zooms)
    _, hier = pipeline.build_tiles_hierarchical(spark, sf_dir, zooms=zooms)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
         for r in std.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
         for r in hier.collect()}
    assert set(a) == set(b)
    diff = [k for k in a if a[k] != b[k]]
    assert diff == [], f"{len(diff)} tiles differ, e.g. {diff[:5]}"


def test_hierarchical_cap_enforced(spark, sf_dir):
    """The anchor kernel applies the same per-(tile, layer) budget as
    the standard path's window cap, with metered drops."""
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    metrics, _ = pipeline.build_tiles_hierarchical(
        spark, sf_dir, zooms=[4], anchor_z=4, with_polygons=False,
        max_features_per_tile=2)
    rows = metrics.where("layer = 'pages'").collect()
    assert all(r["n_features"] <= 2 for r in rows)
    total_kept = sum(r["n_features"] for r in rows)
    total_dropped = sum(r["n_dropped"] for r in rows)
    # every fanned-out membership is either kept or metered as dropped
    assert total_kept + total_dropped >= n_docs


def test_hierarchical_deep_only_zooms_byte_identical(spark, sf_dir):
    """zooms entirely above anchor_z (no low-zoom standard path for
    points; polygons still standard): still byte-identical."""
    zooms = [6, 7]
    _, std = pipeline.build_tiles(spark, sf_dir, zooms=zooms)
    _, hier = pipeline.build_tiles_hierarchical(spark, sf_dir, zooms=zooms,
                                                anchor_z=4)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"]) for r in std.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"]) for r in hier.collect()}
    assert set(a) == set(b)
    assert all(a[k] == b[k] for k in a)
