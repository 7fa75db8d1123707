"""Co-located (bucketed) joins: the pre-shuffle strategy for repeated
equi-joins at 100 TB — both tables hash-clustered on the join key at
write time, so the join itself needs NO Exchange (sources/sinks.py
write_bucketed)."""

import pytest
from pyspark.sql import functions as F

from tegola_spark.sources import corpus, sinks


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    docs = corpus.documents(spark, sf_dir)
    left = docs.select("doc_id", "lang", "n_chars")
    right = docs.select("doc_id", "source")
    sinks.write_bucketed(left, "t_bjoin_left", ["doc_id"], 8,
                         sort_keys=["doc_id"])
    sinks.write_bucketed(right, "t_bjoin_right", ["doc_id"], 8,
                         sort_keys=["doc_id"])
    yield "t_bjoin_left", "t_bjoin_right"
    spark.sql("DROP TABLE IF EXISTS t_bjoin_left")
    spark.sql("DROP TABLE IF EXISTS t_bjoin_right")


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    joined = (spark.table(lt).hint("merge")
              .join(spark.table(rt), "doc_id"))
    plan = _executed_plan(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # and it still computes the right thing
    assert joined.count() == spark.table(lt).count()


def test_unbucketed_twin_does_shuffle(spark, sf_dir):
    """Differential control: the same merge join over plain scans
    carries an Exchange on each side — the cost bucketing removes."""
    docs = corpus.documents(spark, sf_dir)
    joined = (docs.select("doc_id", "lang").hint("merge")
              .join(docs.select("doc_id", "source"), "doc_id"))
    assert "Exchange" in _executed_plan(joined)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    """Bucketing also pre-distributes GROUP BY on the bucket key."""
    lt, _ = bucketed_pair
    agg = spark.table(lt).groupBy("doc_id").agg(F.sum("n_chars"))
    assert "Exchange" not in _executed_plan(agg)


def test_bucketed_join_results_match_plain_join(spark, sf_dir, bucketed_pair):
    lt, rt = bucketed_pair
    got = sorted(spark.table(lt).join(spark.table(rt), "doc_id")
                 .select("doc_id", "lang", "source").collect())
    docs = corpus.documents(spark, sf_dir)
    want = sorted(docs.select("doc_id", "lang", "source").collect())
    assert got == want
