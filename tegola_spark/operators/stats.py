"""Exact order statistics and multi-dimensional OLAP rollups.

Engine extras next to the HLL sketch: exact per-group quantiles (the
deterministic counterpart to percentile_approx, whose GK sketch is not
reproducible across engines) and cube aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_quantiles(df: DataFrame, group_col: str, value_col: str,
                    qs: tuple = (0.5, 0.9, 0.99)) -> DataFrame:
    """Exact type-1 (lower) quantiles per group: the value at rank
    ceil(q * n) in ascending order. Returns (group, q, n, value).

    Plan: ONE exchange sorts each group (window row_number + count);
    the (group, q, target_rank) frame is groups x |qs| rows and
    broadcasts, so selection is map-side — the driver never sees more
    than the quantile rows. Equal values make row_number order among
    ties arbitrary, but the k-th ORDER STATISTIC is unique, so the
    output is deterministic regardless. At extreme scale a two-pass
    histogram select would avoid the full per-group sort; the window
    form is the exact, allocation-free baseline.
    """
    spark = df.sparkSession
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(
        group_col, F.col(value_col).alias("value"),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("n"))
    qf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    targets = (ranked.select(group_col, "n").distinct()
               .crossJoin(F.broadcast(qf))
               .withColumn("_rn", F.ceil(F.col("q") * F.col("n")).cast("int")))
    return (ranked.join(F.broadcast(targets.select(group_col, "q", "_rn")),
                        [group_col, "_rn"])
            .select(group_col, "q", "n", "value"))
