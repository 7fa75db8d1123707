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
