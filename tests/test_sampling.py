"""Deterministic stratified sampling (operators/sampling.py)."""

import hashlib

from pyspark.sql import functions as F

from tegola_spark.operators import sampling


def _py_bucket(salt: str, doc_id: int) -> int:
    h = hashlib.md5((salt + str(doc_id)).encode()).hexdigest()
    return int(h[:12], 16) % sampling.RESOLUTION


def test_bucket_matches_reference_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    got = {r["doc_id"]: r["b"] for r in df.select(
        "doc_id",
        sampling.sample_bucket_col(F.col("doc_id"), "mix-v1").alias("b")
    ).collect()}
    assert got == {i: _py_bucket("mix-v1", i) for i in range(200)}


def test_stratified_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(df, {"en": 0.5}, default_rate=0.0)
    kept = out.collect()
    # default stratum fully dropped; en kept iff bucket under threshold
    assert all(r["lang"] == "en" for r in kept)
    expect = {i for i, lang in rows
              if lang == "en" and _py_bucket("mix-v1", i) < 500000}
    assert {r["doc_id"] for r in kept} == expect
    # rerun is bit-identical (no RNG state)
    again = {r["doc_id"] for r in
             sampling.stratified_sample(df, {"en": 0.5},
                                        default_rate=0.0).collect()}
    assert again == expect


def test_split_independent_of_sample_salt(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = sampling.assign_split(df, holdout_rate=0.2).collect()
    hold = {r["doc_id"] for r in out if r["split"] == "holdout"}
    assert hold == {i for i in range(1000)
                    if _py_bucket("split-v1", i) < 200000}
    # different salt family => not the same subset as mix-v1 sampling
    mix = {i for i in range(1000) if _py_bucket("mix-v1", i) < 200000}
    assert hold != mix
