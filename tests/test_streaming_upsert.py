"""Streaming last-wins upsert (streaming/upsert.py): winners revise
across micro-batches; final state matches the batch latest_snapshot."""

from pyspark.sql import functions as F

from tegola_spark.operators import dedup
from tegola_spark.streaming import upsert


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "url string, doc_id long, ts_epoch long") \
        .coalesce(1).write.mode("append").parquet(path)


def _fold(rows):
    """Final upsert state from update-mode emissions, order-free: every
    revision strictly grows (ts, doc_id, n_snapshots) — the winner key
    is the running max and n_snapshots is monotone — so the max
    emission per url IS the last one."""
    final = {}
    for r in rows:
        cur = (r["ts_epoch"], r["doc_id"], r["n_snapshots"])
        if r["url"] not in final or cur > final[r["url"]]:
            final[r["url"]] = cur
    return {u: (d, t, n) for u, (t, d, n) in final.items()}


def test_stream_upsert_revises_winners_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    # batch 1: u's winner is doc 1; batch 2 delivers a LATER capture
    _write(spark, src, [("u", 1, 100), ("v", 2, 50)])
    _write(spark, src, [("u", 3, 200)])

    upsert.stream_upsert_files(
        spark, src, str(tmp_path / "ckpt"), query_name="up1")
    # update-mode memory sink holds one row per (batch, key) emission;
    # the LAST emission per key is the current upsert value
    rows = spark.sql("SELECT * FROM up1").collect()
    assert len(rows) >= 2
    final = _fold(rows)
    assert final["u"] == (3, 200, 2)
    assert final["v"] == (2, 50, 1)


def test_stream_upsert_matches_batch_twin(spark, tmp_path):
    src = str(tmp_path / "in")
    waves = [[("a", 1, 10), ("b", 2, 20)],
             [("a", 3, 10)],          # ts tie -> higher doc_id wins
             [("b", 4, 5), ("c", 5, 1)]]  # older capture must NOT win
    for w in waves:
        _write(spark, src, w)

    upsert.stream_upsert_files(
        spark, src, str(tmp_path / "ckpt"), query_name="up2")
    rows = spark.sql("SELECT * FROM up2").collect()
    stream_final = _fold(rows)

    batch = dedup.latest_snapshot(
        spark.read.parquet(src), key_col="url", ts_col="ts_epoch")
    batch_final = {r["url"]: (r["doc_id"], r["ts_epoch"], r["n_snapshots"])
                   for r in batch.collect()}
    assert stream_final == batch_final
    assert batch_final["a"] == (3, 10, 2)
    assert batch_final["b"] == (2, 20, 2)
