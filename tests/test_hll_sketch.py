"""Deterministic HLL sketch (operators/sketch.hll_distinct):
accuracy in both estimator regimes, partition invariance (register max
commutes, so the estimate cannot depend on the physical split), and
exact determinism across runs.
"""

import pytest
from pyspark.sql import functions as F

from tegola_spark.operators.sketch import hll_distinct


def _est(df, n_part):
    out = hll_distinct(df.repartition(n_part), "g", "v").collect()
    return {r["g"]: r["hll_est"] for r in out}


@pytest.mark.parametrize("n,rel_tol", [(150, 0.10), (10000, 0.10)])
def test_accuracy(spark, n, rel_tol):
    df = spark.range(n).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    est = _est(df, 8)[0]
    assert abs(est - n) / n < rel_tol


def test_partition_invariance_and_determinism(spark):
    df = spark.range(5000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v"))
    a, b, c = _est(df, 1), _est(df, 7), _est(df, 32)
    assert a == b == c


def test_duplicates_do_not_move_estimate(spark):
    base = spark.range(1000).select(F.lit(0).alias("g"),
                                    F.col("id").alias("v"))
    dup = base.union(base).union(base)
    assert _est(base, 4) == _est(dup, 4)


def test_small_range_uses_linear_counting(spark):
    # 10 distinct values: raw harmonic estimate would be biased high;
    # linear counting must bring it within one count of exact
    df = spark.range(10).select(F.lit(0).alias("g"), F.col("id").alias("v"))
    est = _est(df, 2)[0]
    assert abs(est - 10) < 1.0
