"""Round-5 training-pipeline extras: unigram LM scoring, n-gram
novelty, deterministic split+shuffle, JL sign projection.

Each operator's oracle parity is swept by tools/check_oracle.py /
test_entry_contract; these tests pin the SEMANTIC invariants the hash
alone doesn't explain: partition invariance (integer-exact sums),
self-repetition vs cross-document duplication, split proportions, and
bit-identical projection vs a NumPy replay of the same matrix.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tegola_spark.operators.projection import jl_project, sign_matrix
from tegola_spark.operators.sampling import RESOLUTION, split_and_shuffle
from tegola_spark.operators.textstats import ngram_novelty, unigram_lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- unigram LM


def test_unigram_partition_invariance(spark):
    rows = [(i, f"w{i % 7} w{i % 3} common common tail{i % 11}")
            for i in range(200)]
    df = _docs(spark, rows)
    outs = [sorted(map(tuple, unigram_lm_score(df.repartition(p)).collect()))
            for p in (1, 5, 32)]
    assert outs[0] == outs[1] == outs[2]


def test_unigram_common_words_score_higher(spark):
    # doc 0 = all corpus-frequent words, doc 1 = all hapaxes
    rows = [(0, "the the the the"), (1, "zq1 zq2 zq3 zq4")]
    rows += [(10 + i, "the filler") for i in range(20)]
    out = {r["doc_id"]: r["avg_logprob_r6"]
           for r in unigram_lm_score(_docs(spark, rows)).collect()}
    assert out[0] > out[1]


def test_unigram_empty_doc_is_zero(spark):
    out = {r["doc_id"]: (r["n_tokens"], r["avg_logprob_r6"])
           for r in unigram_lm_score(
               _docs(spark, [(0, ""), (1, "a b")])).collect()}
    assert out[0] == (0, 0.0)
    assert out[1][0] == 2


# -------------------------------------------------------------- ngram novelty


def test_novelty_cross_document_duplication(spark):
    shared = "alpha beta gamma delta epsilon"
    rows = [(0, shared + " unique0 tail0a tail0b tail0c tail0d"),
            (1, shared + " unique1 tail1a tail1b tail1c tail1d"),
            (2, "wholly distinct words here nothing shared at all ok")]
    out = {r["doc_id"]: r for r in ngram_novelty(
        _docs(spark, rows), n=5).collect()}
    # the shared leading 5-gram is duplicated for docs 0 and 1
    assert out[0]["n_dup"] >= 1 and out[1]["n_dup"] >= 1
    assert out[2]["n_dup"] == 0
    assert 0.0 <= out[0]["dup_frac_r6"] <= 1.0


def test_novelty_self_repetition_does_not_count(spark):
    # one doc repeating its own phrase: distinct shingles -> df stays 1
    rows = [(0, "p q r s t p q r s t p q r s t"),
            (1, "completely different words in this other document here")]
    out = {r["doc_id"]: r["n_dup"]
           for r in ngram_novelty(_docs(spark, rows), n=5).collect()}
    assert out[0] == 0 and out[1] == 0


def test_novelty_short_doc_zero_shingles(spark):
    out = ngram_novelty(_docs(spark, [(0, "one two three four")]),
                        n=5).collect()[0]
    assert (out["n_shingles"], out["n_dup"], out["dup_frac_r6"]) == (0, 0, 0.0)


# ----------------------------------------------------------- split + shuffle


def test_split_proportions_and_determinism(spark):
    df = spark.range(20000).select(F.col("id").alias("doc_id"))
    a = split_and_shuffle(df.repartition(3)).collect()
    b = split_and_shuffle(df.repartition(17)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    frac = {s: sum(1 for r in a if r["split"] == s) / len(a)
            for s in ("train", "valid", "test")}
    assert abs(frac["train"] - 0.98) < 0.01
    assert abs(frac["valid"] - 0.01) < 0.005
    assert abs(frac["test"] - 0.01) < 0.005
    assert all(0 <= r["split_bucket"] < RESOLUTION for r in a)


def test_shuffle_key_is_uncorrelated_permutation(spark):
    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    out = split_and_shuffle(df).collect()
    keys = [r["shuffle_key"] for r in out]
    assert len(set(keys)) == len(keys)  # injective on this id range
    # order by shuffle_key is not order by id (a real permutation)
    by_key = [r["doc_id"] for r in sorted(out, key=lambda r: r["shuffle_key"])]
    assert by_key != sorted(by_key)


# -------------------------------------------------------------- JL projection


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    rows = [(i, [float(np.float32(v)) for v in rng.randn(64)])
            for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_jl_bit_identical_across_partitionings(emb):
    a = jl_project(emb.repartition(1), in_dim=64).collect()
    b = jl_project(emb.repartition(13), in_dim=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_jl_matches_numpy_matrix(emb):
    mat = np.array(sign_matrix(16, 64))
    pd_emb = emb.toPandas().sort_values("vec_id")
    want = np.stack(pd_emb["embedding"].map(
        lambda v: mat @ np.asarray(v, dtype=np.float64)))
    got = (jl_project(emb, in_dim=64).orderBy("vec_id").toPandas()
           .drop(columns=["vec_id"]).to_numpy())
    # numpy sums in a different order -> tolerance, not equality
    assert np.allclose(got, want, rtol=1e-9, atol=1e-9)


def test_jl_preserves_pairwise_distances(emb):
    # JL with 16 sign dims: scaled distances within a loose band
    pd_emb = emb.toPandas().sort_values("vec_id")
    x = np.stack(pd_emb["embedding"].map(np.asarray)).astype(np.float64)
    p = (jl_project(emb, in_dim=64).orderBy("vec_id").toPandas()
         .drop(columns=["vec_id"]).to_numpy()) / np.sqrt(16.0)
    rng = np.random.RandomState(3)
    idx = rng.choice(len(x), size=(60, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_x = np.linalg.norm(x[idx[:, 0]] - x[idx[:, 1]], axis=1)
    d_p = np.linalg.norm(p[idx[:, 0]] - p[idx[:, 1]], axis=1)
    ratio = d_p / d_x
    assert 0.4 < ratio.min() and ratio.max() < 1.8
    assert abs(float(np.median(ratio)) - 1.0) < 0.25


def test_sign_matrix_deterministic_and_balanced():
    m1, m2 = sign_matrix(16, 64), sign_matrix(16, 64)
    assert m1 == m2
    flat = [s for row in m1 for s in row]
    assert set(flat) == {1.0, -1.0}
    assert 0.35 < flat.count(1.0) / len(flat) < 0.65


# --------------------------------------------------------------- quality cut


def test_quality_cut_keeps_top_90pct(spark):
    from tegola_spark.operators.textstats import quality_cut
    rows = [(i, f"common common shared{i % 10} word{i % 4}")
            for i in range(100)]
    # low-probability docs with DISTINCT scores (varying hapax/common
    # mix), so the P10 threshold actually separates instead of tying
    rows += [(1000 + i,
              " ".join([f"h{i}x{j}" for j in range(4)] + ["common"] * i))
             for i in range(20)]
    out = quality_cut(_docs(spark, rows), q=0.1).collect()
    kept = {r["doc_id"] for r in out}
    n_total = 120
    assert len(kept) >= 0.85 * n_total  # >= P10 keeps ~90%
    # every kept score >= the (single, shared) threshold
    thr = {r["threshold_r6"] for r in out}
    assert len(thr) == 1
    t = thr.pop()
    assert all(r["avg_logprob_r6"] >= t for r in out)
    # the hapax docs are the low scorers: dropped set comes from them
    dropped = set(range(100)) | {1000 + i for i in range(20)}
    dropped -= kept
    assert dropped and all(d >= 1000 for d in dropped)
