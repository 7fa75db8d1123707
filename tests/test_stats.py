"""Exact quantiles (operators/stats.exact_quantiles): rank arithmetic
and tie behavior."""

from pyspark.sql import functions as F

from tegola_spark.operators.stats import exact_quantiles


def _q(df, qs):
    out = exact_quantiles(df, "g", "v", qs=qs).collect()
    return {(r["g"], r["q"]): (r["n"], r["value"]) for r in out}


def test_known_ranks(spark):
    # g=0: values 1..10 -> p50 = ceil(0.5*10)=rank 5 -> 5.0
    df = spark.createDataFrame(
        [(0, float(i)) for i in range(1, 11)], "g long, v double")
    got = _q(df, (0.5, 0.9, 1.0))
    assert got[(0, 0.5)] == (10, 5.0)
    assert got[(0, 0.9)] == (10, 9.0)
    assert got[(0, 1.0)] == (10, 10.0)


def test_ties_give_unique_order_statistic(spark):
    # k-th order statistic is unique even when row_number among equal
    # values is arbitrary
    df = spark.createDataFrame(
        [(0, v) for v in [1.0, 2.0, 2.0, 2.0, 3.0]], "g long, v double")
    got = _q(df, (0.5,))
    assert got[(0, 0.5)] == (5, 2.0)


def test_singleton_group(spark):
    df = spark.createDataFrame([(0, 7.5)], "g long, v double")
    got = _q(df, (0.5, 0.99))
    assert got[(0, 0.5)] == (1, 7.5)
    assert got[(0, 0.99)] == (1, 7.5)


def test_multiple_groups_independent(spark):
    df = spark.createDataFrame(
        [(0, float(i)) for i in range(1, 5)] +
        [(1, float(i * 100)) for i in range(1, 5)], "g long, v double")
    got = _q(df, (0.5,))
    assert got[(0, 0.5)] == (4, 2.0)
    assert got[(1, 0.5)] == (4, 200.0)
