"""Streaming exact dedup (streaming/dedup.py): first arrival wins,
duplicates inside the watermark horizon are dropped, state for old
keys is EVICTED so a far-later duplicate passes as new — the
documented, bounded-state difference from the batch twin.
"""

import datetime as dt
import os
import time

from tegola_spark.streaming import dedup as D


def _ts(h, m=0):
    return dt.datetime(2026, 3, 1, h, m, tzinfo=dt.timezone.utc)


def _write_wave(spark, path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_dedup_drops_in_horizon_evicts_after(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(docs_dir)

    # batch 0: two distinct docs
    _write_wave(spark, docs_dir, [(1, "hello world", _ts(10, 0)),
                                  (2, "other text", _ts(10, 5))])
    time.sleep(1.1)  # file source orders by modification time
    # batch 1: duplicate of doc 1 INSIDE the 30-min horizon -> dropped;
    # a fresh doc at 15:00 pushes the watermark to 14:30
    _write_wave(spark, docs_dir, [(3, "hello world", _ts(10, 10)),
                                  (4, "new text", _ts(15, 0))])
    time.sleep(1.1)
    # batch 2 (filler): runs with watermark 14:30 — state eviction
    # happens as part of a batch, so this batch is what actually
    # expires the "hello world" key (first-seen 10:00 + 30 min < 14:30)
    _write_wave(spark, docs_dir, [(9, "filler doc", _ts(15, 30))])
    time.sleep(1.1)
    # batch 3: the key's state is gone; this duplicate passes as new
    _write_wave(spark, docs_dir, [(5, "hello world", _ts(16, 0))])

    D.stream_dedup_files(spark, docs_dir, ckpt, query_name="dedupsink")
    got = sorted(r["doc_id"] for r in
                 spark.sql("SELECT * FROM dedupsink").collect())
    assert got == [1, 2, 4, 5, 9]  # 3 dropped; 5 re-admitted post-eviction

    # batch twin: global dedup keeps exactly one copy per text
    batch = D.stream_exact_dedup(spark.read.parquet(docs_dir))
    texts = sorted(r["text"] for r in batch.collect())
    assert texts == ["filler doc", "hello world", "new text", "other text"]


def test_stream_dedup_checkpoint_resume_no_duplicates(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(docs_dir)
    _write_wave(spark, docs_dir, [(1, "a text", _ts(9, 0)),
                                  (2, "a text", _ts(9, 1))])
    D.stream_dedup_files(spark, docs_dir, ckpt, out_dir=out)
    assert len(spark.read.parquet(out).collect()) == 1
    # re-run with the same checkpoint, no new files: nothing re-emitted
    D.stream_dedup_files(spark, docs_dir, ckpt, out_dir=out)
    assert len(spark.read.parquet(out).collect()) == 1
