"""CMS heavy hitters, exact-k-per-stratum sampling, packed-sequence
materialization: semantic invariants beyond the oracle hash —
one-sided CMS error, partitioning independence (the property reservoir
sampling lacks), and byte-level sequence reconstruction.
"""

import hashlib

from pyspark.sql import functions as F

from tegola_spark.operators.packing import pack_sequences
from tegola_spark.operators.sampling import exact_k_per_stratum
from tegola_spark.operators.sketch import cms_heavy_hitters


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------------------ CMS


def test_cms_overestimates_never_under(spark):
    rows = [(i, f"top top top mid{i % 5} rare{i}") for i in range(300)]
    out = cms_heavy_hitters(_docs(spark, rows), k=50).collect()
    assert all(r["cms_est"] >= r["exact_n"] for r in out)
    # the dominant token surfaces at rank 1 with its exact count reachable
    assert out[0]["word"] == "top" and out[0]["exact_n"] == 900


def test_cms_partition_invariance(spark):
    rows = [(i, f"a{i % 13} b{i % 7} c") for i in range(200)]
    df = _docs(spark, rows)
    a = cms_heavy_hitters(df.repartition(1), k=10).collect()
    b = cms_heavy_hitters(df.repartition(16), k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cms_wide_sketch_is_exact_on_small_vocab(spark):
    # vocab << width*depth -> collisions unlikely across ALL 4 rows;
    # min over rows then equals the exact count for every token
    rows = [(i, f"x{i % 6} y{i % 3}") for i in range(120)]
    out = cms_heavy_hitters(_docs(spark, rows), k=9).collect()
    assert all(r["cms_est"] == r["exact_n"] for r in out)


# --------------------------------------------------------------- exact-k


def test_exact_k_counts_and_determinism(spark):
    rows = [(i, "g%d" % (i % 3)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = exact_k_per_stratum(df.repartition(2), k=10).collect()
    b = exact_k_per_stratum(df.repartition(31), k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per.setdefault(r["lang"], []).append(r["sample_rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per.values())


def test_exact_k_short_stratum_returns_all(spark):
    df = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny"), (3, "big"), (4, "big"), (5, "big")],
        "doc_id long, lang string")
    out = exact_k_per_stratum(df, k=4).collect()
    n = {}
    for r in out:
        n[r["lang"]] = n.get(r["lang"], 0) + 1
    assert n == {"tiny": 2, "big": 3}


def test_exact_k_is_a_hash_sample_not_head(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"),
                                  F.lit("g").alias("lang"))
    ids = sorted(r["doc_id"] for r in exact_k_per_stratum(df, k=20).collect())
    assert ids != list(range(20))


# --------------------------------------------------------------- packing


def test_pack_sequences_reconstructs_bytes(spark):
    rows = [(i, f"doc{i} body word word") for i in range(10)]
    df = _docs(spark, rows).withColumn(
        "n_tokens", F.lit(4).cast("long"))
    out = {r["bin_id"]: r for r in pack_sequences(df, budget=12).collect()}
    # 4 tokens/doc, budget 12 -> 3 docs per bin, key order
    texts = [r[1] for r in rows]
    for b, lo in enumerate(range(0, 10, 3)):
        chunk = "<|eod|>".join(texts[lo:lo + 3])
        assert out[b]["seq_md5"] == hashlib.md5(chunk.encode()).hexdigest()
        assert out[b]["n_docs"] == len(texts[lo:lo + 3])


def test_pack_sequences_partition_invariance_and_totals(spark):
    rows = [(i, " ".join(["w"] * (1 + i % 9))) for i in range(200)]
    df = _docs(spark, rows).withColumn(
        "n_tokens", F.size(F.split("text", " ")).cast("long"))
    a = pack_sequences(df.repartition(1), 64).collect()
    b = pack_sequences(df.repartition(23), 64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r["n_docs"] for r in a) == 200


# ------------------------------------------------------------ plan guards


def test_exact_k_plan_pushes_partial_topk(spark):
    df = spark.range(100).select(F.col("id").alias("doc_id"),
                                 (F.col("id") % 3).cast("string").alias("lang"))
    plan = exact_k_per_stratum(df, k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    # the map-side (Partial) group limit must exist: at most k rows per
    # stratum per partition cross the exchange
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_split_and_jl_are_map_only(spark):
    from tegola_spark.operators.projection import jl_project
    from tegola_spark.operators.sampling import split_and_shuffle

    ids = spark.range(50).select(F.col("id").alias("doc_id"))
    plan = split_and_shuffle(ids)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pure scan-stage expressions
    emb = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") + F.lit(float(j))).cast("float")
                  for j in range(8)]).alias("embedding"))
    plan = jl_project(emb, in_dim=8, out_dim=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
