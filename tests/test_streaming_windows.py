"""Watermark + late-data semantics (streaming/windows.py): a window is
emitted once the watermark passes its end; an event arriving past the
lateness bound for that window is dropped from the stream result but
counted by the batch twin."""

import datetime as dt
import os

from tegola_spark.streaming import windows as W


def _ts(h, m):
    return dt.datetime(2026, 3, 1, h, m, tzinfo=dt.timezone.utc)


def _write_wave(spark, path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, kind string, ts timestamp, value double")
    df.coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_event(spark, tmp_path):
    """Emission rule (observed + documented): a window is finalized at
    the END of the first micro-batch whose starting watermark exceeds
    the window end; rows for it arriving IN that batch still count.
    Truly-late = arriving a batch AFTER emission — those are dropped.
    Hence three waves: wave 2's timestamp finalizes the 10:00 window,
    wave 3 carries the late event."""
    import time

    ev_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ev_dir)

    # wave 1: three events in [10:00, 11:00) + one at 11:40 -> after
    # batch 0 the watermark (30 min bound) is 11:10
    _write_wave(spark, ev_dir, [
        (1, "view", _ts(10, 5), 1.0),
        (2, "view", _ts(10, 20), 2.0),
        (3, "click", _ts(10, 45), 4.0),
        (4, "view", _ts(11, 40), 8.0),
    ])
    time.sleep(1.1)  # file-source ordering is by modification time
    # wave 2: batch 1 starts with watermark 11:10 > 11:00 -> the 10:00
    # window is EMITTED at the end of this batch; watermark -> 12:10
    _write_wave(spark, ev_dir, [(6, "click", _ts(12, 40), 32.0)])
    time.sleep(1.1)
    # wave 3: the late view at 10:30 arrives AFTER its window was
    # finalized and evicted -> dropped (append mode never re-emits)
    _write_wave(spark, ev_dir, [(5, "view", _ts(10, 30), 16.0)])

    W.stream_event_windows(spark, ev_dir, ckpt, query_name="winsink")
    got = {(r["win_start"].hour, r["kind"]): (r["n_events"], r["value_sum"])
           for r in spark.sql("SELECT * FROM winsink").collect()}

    assert got[(10, "view")] == (2, 3.0)   # late event 5 NOT counted
    assert got[(10, "click")] == (1, 4.0)
    assert got[(11, "view")] == (1, 8.0)   # closed once watermark 12:10

    # the batch twin sees all data and counts the late event — the
    # documented difference between the two execution modes
    batch = {(r["win_start"].hour, r["kind"]): r["n_events"]
             for r in W.windowed_counts(spark.read.parquet(ev_dir)).collect()}
    assert batch[(10, "view")] == 3
    assert batch[(12, "click")] == 1


def test_resume_from_checkpoint_no_duplicates(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "win_out")
    os.makedirs(ev_dir)
    _write_wave(spark, ev_dir, [(1, "view", _ts(9, 30), 1.0),
                                (2, "view", _ts(11, 30), 2.0)])
    W.stream_event_windows(spark, ev_dir, ckpt, out_dir=out)
    rows1 = spark.read.parquet(out).collect()
    assert len(rows1) == 1  # the 09:00 window closed (watermark 11:00)
    assert rows1[0]["win_start"].hour == 9
    # re-invoke with the SAME checkpoint and no new files: the file
    # source recovers, reprocesses nothing, re-emits nothing
    W.stream_event_windows(spark, ev_dir, ckpt, out_dir=out)
    assert len(spark.read.parquet(out).collect()) == 1
