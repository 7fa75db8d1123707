"""Temporal as-of join — a join Spark's DataFrame API lacks natively.

tegola has no temporal joins at all (SURVEY §2.3 declares as-of /
interval joins absent from the reference); this is the engine-extra
formulation for event-stream attribution (each purchase matched to the
user's latest prior click, each metric sample to the most recent
config change, ...).

Scale plan — the reason this is NOT an equi-join + filter + window:
the naive plan materializes |left_per_key| x |right_per_key| rows per
key before picking one winner, which explodes on hot keys. Here both
inputs are unioned map-side (a union is free — no exchange) and the
match is a single running ``last(ignorenulls)`` window over
(key, ts, side), so the physical plan is ONE exchange on the key plus
one sort, with one struct of running state per partition. Right-side
payload rides a single struct column; left rows never duplicate.

Tie semantics (pinned so the DuckDB oracle can replay them): matches
are inclusive (right.ts <= left.ts); at equal right timestamps the row
with the greatest tie-break column wins; right rows sort BEFORE left
rows at the same timestamp, so a right event at exactly left.ts is
matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              ts_col: str = "ts", right_cols: tuple = ("event_id", "value"),
              tie_col: str = "event_id", tolerance_s: int | None = None,
              prefix: str = "r_") -> DataFrame:
    """Backward as-of join: left rows + the latest right row with
    ``right.ts <= left.ts`` per ``on`` key (LEFT semantics — unmatched
    left rows keep nulls). ``tolerance_s`` additionally requires
    ``right.ts >= left.ts - tolerance_s`` (matches outside the window
    revert to nulls, the row is kept). Output: every left column, then
    ``prefix + ts_col`` and ``prefix + c`` for each right payload col.
    """
    lcols = left.columns
    r_payload = F.struct(
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols])
    r_side = right.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"), F.col(tie_col).alias("_tie"),
        r_payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias("_l_" + c)
          for c in lcols])
    l_side = left.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"), F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(r_side.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias("_l_" + c) for c in lcols])
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                  F.col("_tie").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r_side.unionByName(l_side)
               .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
               .where(F.col("_side") == 1))
    if tolerance_s is not None:
        in_window = (F.col("_m._rts") >=
                     F.col("_ts") - F.expr(f"INTERVAL {int(tolerance_s)} SECOND"))
        matched = matched.withColumn(
            "_m", F.when(in_window, F.col("_m")))
    return matched.select(
        *[F.col("_l_" + c).alias(c) for c in lcols],
        F.col("_m._rts").alias(prefix + ts_col),
        *[F.col("_m." + c).alias(prefix + c) for c in right_cols])


def interval_join(points: DataFrame, intervals: DataFrame,
                  t_col: str = "ts", start_col: str = "t_start",
                  end_col: str = "t_end", bucket_s: int = 21600) -> DataFrame:
    """Non-equi point-in-interval range join (``start <= t < end``)
    without a key column — the join Spark cannot plan as anything but
    a nested loop on its own.

    Scale plan: quantize the time axis into ``bucket_s``-second cells
    (the 1-D analog of the spatial cover-cell join in
    spatial_join.py). Each interval explodes to the cells it touches
    (ceil(len/bucket_s)+1 rows); each point maps to exactly ONE cell,
    so the equi-join on the cell key produces every candidate pair at
    most once — no dedup pass — and the residual timestamp filter
    evaluates inside the join stage. Pick ``bucket_s`` near the median
    interval length: the explode factor stays ~2 and hot cells are
    bounded by time-locality, not corpus size. Truncation to epoch
    seconds is monotone, so a point inside [start, end) always lands
    in a cell the interval covers (cover is conservative; the residual
    is exact on full-precision timestamps).
    """
    pb = F.floor(F.unix_timestamp(t_col) / bucket_s).cast("long")
    sb = F.floor(F.unix_timestamp(start_col) / bucket_s).cast("long")
    eb = F.floor(F.unix_timestamp(end_col) / bucket_s).cast("long")
    p = points.withColumn("_cell", pb)
    iv = intervals.withColumn("_cell", F.explode(F.sequence(sb, eb)))
    return (p.join(iv, "_cell")
             .where((F.col(t_col) >= F.col(start_col)) &
                    (F.col(t_col) < F.col(end_col)))
             .drop("_cell"))


def time_rollup(ev: DataFrame, ts_col: str = "ts", value_col: str = "value",
                levels: tuple = (60, 3600, 86400)) -> DataFrame:
    """Hypertable-style hierarchical time rollup (continuous-aggregate
    cascade): the finest level aggregates raw events ONCE; every
    coarser level re-aggregates the previous level's partials
    (sum-of-sums, min-of-mins, max-of-maxes, count-of-counts), so raw
    data is scanned and shuffled exactly once and each cascade step's
    exchange carries only the previous level's bucket count — at 100
    TB the hour->day step moves 24x fewer rows than re-scanning raw.
    Bucket nesting is exact because each level divides the next
    (floor(floor(e/a)/(b/a)) == floor(e/b) for positive e).

    Returns all levels unioned, tagged by ``level_s``.
    """
    for a, b in zip(levels, levels[1:]):
        if b % a:
            raise ValueError(f"levels must nest: {b} % {a} != 0")
    ep = F.unix_timestamp(ts_col)
    cur = (ev.withColumn("bucket", F.floor(ep / levels[0]).cast("long"))
             .groupBy("bucket")
             .agg(F.count("*").alias("n_events"),
                  F.sum(value_col).alias("sum_value"),
                  F.min(value_col).alias("min_value"),
                  F.max(value_col).alias("max_value"))
             .withColumn("level_s", F.lit(levels[0]).cast("long")))
    out = cur
    for prev, nxt in zip(levels, levels[1:]):
        fac = nxt // prev
        cur = (cur.groupBy(
                    F.floor(F.col("bucket") / fac).cast("long").alias("bucket"))
                  .agg(F.sum("n_events").alias("n_events"),
                       F.sum("sum_value").alias("sum_value"),
                       F.min("min_value").alias("min_value"),
                       F.max("max_value").alias("max_value"))
                  .withColumn("level_s", F.lit(nxt).cast("long")))
        out = out.unionByName(cur)
    return out


def rolling_user_stats(ev: DataFrame, user_col: str = "user_id",
                       ts_col: str = "ts", value_col: str = "value",
                       id_col: str = "event_id",
                       window_s: int = 3600) -> DataFrame:
    """Trailing time-window aggregates per entity: at every event, the
    count and value-sum of that user's events in the preceding
    ``window_s`` seconds (inclusive) — the rate-limit / burst-feature
    window every abuse and engagement pipeline computes.

    Uses a RANGE frame over the epoch-seconds key, NOT a row frame:
    the frame is defined by time distance, so co-timestamped events
    are peers and the result is independent of within-partition row
    order (deterministic under any shuffle).  The value is integerized
    to micro-units (``floor(v * 1e6 + 0.5)``, the unigram_lm recipe)
    so the windowed sum is exact int64 in any accumulation order.

    One exchange on the user key; each partition then sorts locally
    and streams the frame with a sliding two-pointer — state is the
    open window, not the partition.  Hot-user skew is bounded by
    per-user event counts (AQE skew splitting cannot split a window
    partition, so a truly pathological key would need a two-level
    pre-aggregate by (user, coarse bucket) — not warranted here).
    """
    ep = F.unix_timestamp(F.col(ts_col)).cast("long")
    vm = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("long")
    base = ev.select(F.col(id_col), F.col(user_col),
                     ep.alias("ep"), vm.alias("vm"))
    w = (Window.partitionBy(user_col).orderBy("ep")
         .rangeBetween(-(window_s - 1), 0))
    return base.select(
        id_col, user_col, "ep",
        F.count("*").over(w).cast("long").alias("roll_n"),
        F.sum("vm").over(w).cast("long").alias("roll_sum_micro"))
