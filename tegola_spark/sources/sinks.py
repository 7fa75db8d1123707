"""Tile sinks + resume (reference S9 cache backends, R6 read-through).

tegola's cache backends (file/S3/Redis/Azure/GCS —
cache/cache.go:18-22) store one blob per ``map/layer/z/x/y`` key; its
seed workers skip tiles already cached (R6,
cmd/tegola/cmd/cache/worker.go:50-77). The Spark-native form:

  * sink: a parquet table of (z, x, y, tile_bytes, lineage columns)
    written ``partitionBy("z")`` — z is the only low-cardinality
    partition key; (x, y) stay as sort-ordered data columns (a
    partition dir per tile would melt the filesystem at z>=10).
    On Iceberg the same layout is the partition spec ``(z, bucket(x))``
    plus snapshot metadata; this module keeps a JSON manifest as the
    snapshot stand-in since Iceberg jars aren't in this image.
  * resume: LEFT ANTI join of the tile work-list against the sink's
    existing (z, x, y) keys — the R6 skip-if-cached, in one shuffle-free
    broadcastable join when the done-list is small, shuffled otherwise.
  * lineage: the per-(z,x,y,layer) metrics table rides along in a
    ``_metrics`` subdirectory (north rule: per-partition lineage +
    metrics).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """Probe for the Iceberg Spark runtime on the JVM classpath. This
    sandbox ships 287 jars with no iceberg/delta/hudi artifact (verified
    round 3), so the parquet + JSON-manifest stand-in below stays the
    default; when a deployment provides the runtime jar this returns
    True and write_tiles should be swapped for a real Iceberg catalog
    (partition spec ``(z, bucket(x))``, snapshot-diff resume replacing
    the manifest anti-join)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def write_tiles(tiles: DataFrame, metrics: DataFrame, path: str,
                mode: str = "append") -> dict:
    """Write the tile table + metrics table + a manifest entry.

    Returns the manifest record (the Iceberg-snapshot stand-in). The
    manifest counts THIS batch via ``observe()``: the counters are
    collected by the SAME job that writes the files (zero extra passes,
    zero caching — previously this cached the batch and ran a separate
    aggregate), and cumulative totals come from summing manifest
    records — re-scanning the whole sink per batch is a full read of
    all historical output (reviewed round 1)."""
    from pyspark.sql import Observation

    exprs = [F.count(F.lit(1)).alias("n"), F.collect_set("z").alias("zs")]
    if "tile_bytes" in tiles.columns:
        exprs.append(F.coalesce(F.sum(F.length("tile_bytes")), F.lit(0))
                     .alias("n_bytes"))
    obs = Observation()
    (tiles.observe(obs, *exprs)
     .repartition("z")
     .sortWithinPartitions("x", "y")
     .write.mode(mode).partitionBy("z").parquet(os.path.join(path, "tiles")))
    batch = obs.get
    (metrics
     .write.mode(mode).partitionBy("z").parquet(os.path.join(path, "_metrics")))
    manifest = os.path.join(path, "manifest.jsonl")
    prev_total = 0
    if os.path.exists(manifest):
        with open(manifest) as f:
            for line in f:
                rec0 = json.loads(line)
                # manifests written before n_tiles_total existed carried a
                # then-cumulative n_tiles — fall back so resume keeps lineage
                prev_total = rec0.get("n_tiles_total",
                                      rec0.get("n_tiles", 0)) or prev_total
    if mode == "overwrite":
        prev_total = 0
    rec = {
        "ts": time.time(),
        "n_tiles": int(batch["n"]),
        "n_tiles_total": prev_total + int(batch["n"]),
        "zooms": sorted(int(z) for z in batch["zs"]),
    }
    if "n_bytes" in batch:
        rec["n_bytes"] = int(batch["n_bytes"])
    with open(manifest, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def existing_keys(spark: SparkSession, path: str) -> DataFrame | None:
    """(z, x, y) keys already in the sink, or None if the sink is empty."""
    tiles_path = os.path.join(path, "tiles")
    try:
        return spark.read.parquet(tiles_path).select("z", "x", "y")
    except Exception:
        return None


def remaining_work(work_list: DataFrame, spark: SparkSession, path: str,
                   broadcast_done: bool = True) -> DataFrame:
    """R6 resume: work-list rows whose (z, x, y) is NOT in the sink."""
    done = existing_keys(spark, path)
    if done is None:
        return work_list
    if broadcast_done:
        done = F.broadcast(done)
    return work_list.join(done, ["z", "x", "y"], "left_anti")


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   buckets: int, sort_keys: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Materialize a table bucketed (hash-clustered) on ``keys`` so
    later joins and aggregations on those keys are CO-LOCATED: both
    sides of an equi-join over equally-bucketed tables read matching
    buckets directly and the join plans with ZERO Exchange — the
    pre-shuffle strategy for dimension/fact joins that repeat across
    jobs (on Iceberg the same declaration is the ``bucket(N, key)``
    partition transform; this is its Spark-catalog face, tested
    shuffle-free in tests/test_bucketed_join.py).

    ``buckets`` should be sized so one bucket of the BIG table fits an
    executor's scan partition (e.g. 100 TB / 4096 buckets ≈ 24 GB of
    raw input per bucket, further split by row groups); both tables of
    a co-located pair must use the same (keys, buckets).
    """
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.saveAsTable(table)
