"""Sink write + anti-join resume semantics (R6 / checkpoint)."""

import os

import pytest

from tegola_spark.sources import sinks
from tegola_spark.streaming import checkpoint


def test_seed_and_resume(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sink")
    recs = checkpoint.seed_tiles(spark, sf_dir, out, zooms=[0, 1])
    assert recs
    done = sinks.existing_keys(spark, out)
    n1 = done.count()
    assert n1 == 5  # 1 + 4 world tiles

    # resume with a superset of zooms: only z2 is new work
    recs2 = checkpoint.seed_tiles(spark, sf_dir, out, zooms=[0, 1, 2], batch_zooms=3)
    done2 = sinks.existing_keys(spark, out)
    assert done2.count() == 5 + 16
    # no duplicates
    assert done2.distinct().count() == 21

    # second resume is a no-op
    recs3 = checkpoint.seed_tiles(spark, sf_dir, out, zooms=[0, 1, 2])
    assert recs3 == []

    # manifest recorded each write
    manifest = os.path.join(out, "manifest.jsonl")
    assert os.path.exists(manifest)
    assert len(open(manifest).readlines()) == len(recs) + len(recs2)


def test_remaining_work(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sink2")
    work = spark.createDataFrame(
        [(0, 0, 0), (1, 0, 0), (1, 1, 1)], "z int, x long, y long")
    # empty sink -> everything remains
    assert sinks.remaining_work(work, spark, out).count() == 3
    checkpoint.seed_tiles(spark, sf_dir, out, zooms=[0])
    rem = sinks.remaining_work(work, spark, out).collect()
    assert {(r["z"], r["x"], r["y"]) for r in rem} == {(1, 0, 0), (1, 1, 1)}


def test_manifest_counts_batch_not_whole_sink(spark, sf_dir, tmp_path):
    """write_tiles must count the batch being written, not rescan all
    historical output (a full sink read per batch at scale)."""
    import json
    out = str(tmp_path / "sink3")
    checkpoint.seed_tiles(spark, sf_dir, out, zooms=[0, 1])
    checkpoint.seed_tiles(spark, sf_dir, out, zooms=[0, 1, 2])
    recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert [r["n_tiles"] for r in recs] == [5, 16]     # per-batch counts
    assert recs[-1]["n_tiles_total"] == 21             # cumulative from manifest
    assert recs[0]["zooms"] == [0, 1] and recs[-1]["zooms"] == [2]


def test_iceberg_probe_and_legacy_manifest_fallback(spark, tmp_path):
    """The jar probe documents this sandbox's state (no Iceberg runtime
    among the shipped jars), and manifests written before n_tiles_total
    existed resume with their then-cumulative n_tiles (ADVICE r2)."""
    from tegola_spark.sources import sinks
    import json

    assert sinks.iceberg_available(spark) is False

    path = tmp_path / "sink"
    path.mkdir()
    with open(path / "manifest.jsonl", "w") as f:
        f.write(json.dumps({"ts": 0.0, "n_tiles": 7, "zooms": [0]}) + "\n")
    tiles = spark.createDataFrame(
        [(0, 0, 0, bytearray(b"x"))], "z int, x long, y long, tile_bytes binary")
    metrics = spark.createDataFrame(
        [(0, 0, 0, "l", 1)], "z int, x long, y long, layer string, n_features long")
    rec = sinks.write_tiles(tiles, metrics, str(path))
    assert rec["n_tiles_total"] == 7 + 1


def test_manifest_observed_bytes(spark, tmp_path):
    """write_tiles collects its manifest counters with observe() — by
    the write job itself — including total output bytes."""
    from tegola_spark.sources import sinks

    path = tmp_path / "sink"
    path.mkdir()
    tiles = spark.createDataFrame(
        [(0, 0, 0, bytearray(b"abc")), (1, 0, 1, bytearray(b"defgh"))],
        "z int, x long, y long, tile_bytes binary")
    metrics = spark.createDataFrame(
        [(0, 0, 0, "l", 1)], "z int, x long, y long, layer string, n_features long")
    rec = sinks.write_tiles(tiles, metrics, str(path))
    assert rec["n_tiles"] == 2
    assert rec["n_bytes"] == 8
    assert rec["zooms"] == [0, 1]
