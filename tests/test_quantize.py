"""SQ8 scalar quantization (operators/quantize.py)."""

import math

import numpy as np
from pyspark.sql import functions as F

from tegola_spark.operators import quantize


def _mk(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")


def test_quantize_reference(spark):
    vecs = [[1.0, -2.0, 0.5], [127.0, 0.0, -127.0], [0.0, 0.0, 0.0]]
    rows = {r["vec_id"]: r for r in quantize.sq8_quantize(_mk(spark, vecs)).collect()}
    # scale = max|v| / 127; codes = floor(v/scale + 0.5)
    assert rows[0]["scale"] == 2.0 / 127
    assert rows[0]["q8"] == [math.floor(x / (2.0 / 127) + 0.5) for x in vecs[0]]
    assert rows[1]["q8"] == [127, 0, -127]
    assert rows[2]["scale"] == 0.0 and rows[2]["q8"] == [0, 0, 0]
    assert max(abs(c) for r in rows.values() for c in r["q8"]) <= 127


def test_reconstruction_error_bound(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 16)).tolist()
    out = quantize.sq8_quantize(_mk(spark, vecs)).collect()
    for r in out:
        v = np.array(vecs[r["vec_id"]])
        recon = np.array(r["q8"], dtype=np.float64) * r["scale"]
        # SQ8 error bound: half a quantization step per dimension
        assert np.max(np.abs(v - recon)) <= r["scale"] / 2 + 1e-12


def test_sq8_topk_close_to_exact(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((80, 24)).tolist()
    df = _mk(spark, vecs)
    from tegola_spark.operators import similarity
    exact = similarity.brute_force_topk(df, [0, 1, 2], k=5)
    approx = quantize.sq8_topk(df, [0, 1, 2], k=5)
    ex = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in exact.collect()}
    ap = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in approx.collect()}
    # 8-bit quantization preserves the vast majority of the top-5
    overlap = sum(1 for k_ in ex if ex[k_] == ap[k_])
    assert overlap >= int(0.8 * len(ex)), (overlap, len(ex))
