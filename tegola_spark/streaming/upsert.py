"""Streaming last-wins upsert: the online twin of the batch CDX
snapshot collapse (``dedup.latest_snapshot``, oracle-green driver
entry ``latest_snapshot``).

A recrawl stream keeps re-fetching URLs; downstream consumers want one
CURRENT row per URL. The streaming aggregation keys on the URL and
keeps ``max_by`` over the (timestamp, capture-id) ordering key — the
identical winner rule the batch operator applies — emitting updated
winners per micro-batch in update mode.

State is one small struct per DISTINCT key, not per snapshot: the
streaming aggregate folds each arrival into the running max, so state
size tracks the URL universe. This op intentionally does NOT
watermark-expire its state: an upsert view must answer for every key
ever seen (that is its contract). When the key universe itself is
unbounded, bound it upstream (partition the stream by crawl shard, or
collapse per time-bucketed table like the hypertable rollup) — an
expiring "latest" view would silently resurrect stale rows, which is
worse than a visible state budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_latest_snapshot(snaps: DataFrame, key_col: str = "url",
                           ts_col: str = "ts_epoch",
                           tie_col: str = "doc_id") -> DataFrame:
    """Last-wins upsert per key: the batch ``latest_snapshot``
    aggregation, unchanged, so the same expression tree runs streaming
    (update mode) and batch — the twin-comparison property the other
    streaming ops keep."""
    win = F.max_by(
        F.struct(F.col(tie_col).alias("tie"), F.col(ts_col).alias("ts")),
        F.struct(F.col(ts_col), F.col(tie_col)))
    return (snaps.groupBy(key_col)
            .agg(win.alias("_top"), F.count("*").alias("n_snapshots"))
            .select(key_col,
                    F.col("_top.tie").alias(tie_col),
                    F.col("_top.ts").alias(ts_col),
                    "n_snapshots"))


def stream_upsert_files(spark, input_dir: str, checkpoint_dir: str,
                        query_name: str = "upsertsink",
                        max_files_per_trigger: int = 1):
    """Run the last-wins upsert over the snapshot files currently in
    ``input_dir`` (availableNow, one file per micro-batch so winners
    are observably revised across batches). Update-mode in-memory sink
    named ``query_name``; returns after awaitTermination."""
    schema = spark.read.parquet(input_dir).schema
    snaps = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", int(max_files_per_trigger))
             .parquet(input_dir))
    q = (stream_latest_snapshot(snaps)
         .writeStream.outputMode("update")
         .option("checkpointLocation", checkpoint_dir)
         .format("memory").queryName(query_name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return q
