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


def test_incremental_dedup_shuffles_batch_only(spark, sf_dir):
    """Ingest-time dedup against a text_hash-bucketed fingerprint
    store: the store side joins WITHOUT an Exchange (the new batch is
    the only side that moves)."""
    from tegola_spark.operators import dedup as ddp

    docs = corpus.documents(spark, sf_dir)
    store_fp = docs.limit(200).select(
        F.md5(F.col("text").cast("binary")).alias("text_hash"),
        "doc_id")
    sinks.write_bucketed(store_fp, "t_fp_store", ["text_hash"], 8)
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at real scale the store is the 100 TB side and can never
        # broadcast; disable the toy-size broadcast so the test sees
        # the scale plan (sort-merge against the store's buckets)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        store = spark.table("t_fp_store")
        batch = docs.where(F.col("doc_id") >= 100)  # overlaps the store
        fresh, new_fp = ddp.incremental_dedup(batch, store)
        fresh.collect()  # finalize AQE before reading the plan
        plan = _executed_plan(fresh)
        # the store scan serves its buckets in place — bucketed read
        # honored, so the store side carries NO Exchange; the batch
        # side does move (hash to the store's 8 buckets)
        assert "Bucketed: true" in plan, plan
        assert "SelectedBucketsCount" in plan, plan
        assert "Exchange" in plan  # the batch side

        got = {r["doc_id"] for r in fresh.select("doc_id").collect()}
        stored = {r["doc_id"] for r in store_fp.collect()}
        # no fresh doc's hash may be in the store
        fresh_hashes = {r["text_hash"] for r in new_fp.collect()}
        store_hashes = {r["text_hash"] for r in store.collect()}
        assert not (fresh_hashes & store_hashes)
        assert got  # something genuinely new got through
        assert not (got & stored & set(range(100)))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql("DROP TABLE IF EXISTS t_fp_store")
