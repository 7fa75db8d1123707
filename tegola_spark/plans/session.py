"""SparkSession factory tuned for the engine.

Scale posture (100 TB / 1000 executors): every knob here is also valid
on a real cluster — AQE handles runtime coalescing + skew splitting,
Arrow batches bound UDF memory (the analog of tegola's per-tile GC
workaround, cmd/tegola/cmd/cache/worker.go:91-93 -> R11 in SURVEY.md §4),
and shuffle partitions default to cores locally but should be set
~2-3x total cores on a cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tegola_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode = one JVM; driver memory is the ONLY heap knob and
        # must scale with cores or local[32] GC-thrashes and scales
        # WORSE than local[8] (measured: 0.2 efficiency at 8g)
        .config("spark.driver.memory", os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", f"{max(16, min(96, cpus * 3))}g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
