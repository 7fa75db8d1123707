"""Plan-shape guards for the round-5 late operators: the properties
that make them survive 100x data, pinned so a refactor can't silently
regress them (same style as the earlier plan audits in BENCH.md)."""

from pyspark.sql import functions as F

from tegola_spark.operators import graph, sampling, textstats
from tegola_spark.sources import corpus


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_link_graph_plan_is_one_join_one_agg(spark, sf_dir):
    docs = corpus.documents(spark, sf_dir)
    plan = _plan(graph.link_graph(docs, docs.count()))
    assert "CartesianProduct" not in plan
    # map-side partial aggregation on the (src, dst) weight rollup
    assert plan.count("HashAggregate") >= 2


def test_pagerank_iteration_frames_stay_node_sized(spark):
    """localCheckpoint truncates lineage: the returned frame's plan
    must NOT grow with the iteration count (the iterative-DataFrame
    trap this operator explicitly avoids)."""
    nodes = spark.createDataFrame([("a",), ("b",)], "domain string")
    edges = spark.createDataFrame([("a", "b", 1)],
                                  "src string, dst string, w long")
    p2 = _plan(graph.pagerank(nodes, edges, iters=2))
    p6 = _plan(graph.pagerank(nodes, edges, iters=6))
    assert abs(len(p6) - len(p2)) < 200  # both read a checkpoint scan
    assert "LocalTableScan" in p6 or "Scan ExistingRDD" in p6


def test_dsir_weight_table_broadcasts(spark, sf_dir):
    docs = corpus.documents(spark, sf_dir)
    plan = _plan(sampling.dsir_select(docs, k=10))
    # the bucket weight table (<= n_buckets rows) joins back broadcast;
    # the only nested-loop is the documented 1-row totals crossJoin
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # top-k is TakeOrdered, never a global sort
    assert "TakeOrderedAndProject" in plan


def test_bigram_lm_vocab_joins_broadcast(spark, sf_dir):
    docs = corpus.documents(spark, sf_dir)
    plan = _plan(textstats.bigram_lm_score(docs))
    assert plan.count("BroadcastHashJoin") >= 3  # c1 x2 faces + firsts
    assert "CartesianProduct" not in plan


def test_inverted_index_partial_aggregation(spark, sf_dir):
    docs = corpus.documents(spark, sf_dir)
    plan = _plan(textstats.inverted_index(docs))
    assert "CartesianProduct" not in plan
    # both aggs (tf, postings) carry map-side partials
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 4
