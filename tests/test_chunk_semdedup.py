"""Round-5 engine extras: sliding token-window chunking and
SemDeDup-style semantic dedup (both also under the driver's DuckDB
oracle via __spark_entry__)."""

import pytest
from pyspark.sql import functions as F

from tegola_spark.operators.similarity import semantic_dedup
from tegola_spark.operators.textstats import chunk_documents


def _chunks(spark, texts, size, stride):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = (chunk_documents(df, size=size, stride=stride)
            .orderBy("doc_id", "chunk_id").collect())
    return rows


def test_chunk_short_doc_single_chunk(spark):
    rows = _chunks(spark, ["a b c"], size=8, stride=4)
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_chunks"], r["chunk_tokens"], r["chunk_text"]) == (1, 3, "a b c")


def test_chunk_windows_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    rows = _chunks(spark, [" ".join(words)], size=4, stride=2)
    # n_chunks = 1 + ceil((10-4)/2) = 4; starts 0,2,4,6
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w2 w3 w4 w5"
    assert rows[3]["chunk_text"] == "w6 w7 w8 w9"
    # consecutive chunks overlap by size - stride tokens
    for a, b in zip(rows, rows[1:]):
        assert a["chunk_text"].split()[2:] == b["chunk_text"].split()[:2]


def test_chunk_full_coverage_no_redundant_tail(spark):
    """Every token appears in some chunk; the last chunk start is the
    smallest multiple of stride covering the end (no chunk is a pure
    subset of its predecessor)."""
    for n in (1, 4, 5, 7, 8, 9, 16, 17):
        words = [f"t{i}" for i in range(n)]
        rows = _chunks(spark, [" ".join(words)], size=8, stride=5)
        covered = set()
        for r in rows:
            covered.update(r["chunk_text"].split())
        assert covered == set(words), n
        last = rows[-1]
        assert last["chunk_tokens"] >= 1
        if len(rows) > 1:
            # the previous chunk must NOT already reach the end
            prev_end = (len(rows) - 2) * 5 + 8
            assert prev_end < n, n


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    for size, stride in ((4, 5), (0, 1), (4, 0)):
        with pytest.raises(ValueError):
            chunk_documents(df, size=size, stride=stride)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")


def test_semantic_dedup_keeps_lowest_id(spark):
    # two exact-dup groups + one singleton, all in one cell-sized space
    vecs = [
        [1.0, 0.0, 0.0],      # 0: group A representative
        [1.0, 0.0, 0.0],      # 1: dup of 0
        [2.0, 0.0, 0.0],      # 2: dup of 0 (same direction -> cos 1)
        [0.0, 1.0, 0.0],      # 3: group B representative
        [0.0, 0.5, 0.0],      # 4: dup of 3
        [0.0, 0.0, 1.0],      # 5: orthogonal singleton
    ]
    out = {r["vec_id"]: r for r in
           semantic_dedup(_emb_df(spark, vecs), threshold=0.99,
                          n_centroids=1).collect()}
    assert out[0]["keep"] and out[0]["dup_of"] is None
    assert not out[1]["keep"] and out[1]["dup_of"] == 0
    assert not out[2]["keep"] and out[2]["dup_of"] == 0
    assert out[3]["keep"] and out[3]["dup_of"] is None
    assert not out[4]["keep"] and out[4]["dup_of"] == 3
    assert out[5]["keep"] and out[5]["dup_of"] is None
    # max_sim is populated for every non-lowest-id member of the cell
    assert out[0]["max_sim_r6"] is None
    assert out[1]["max_sim_r6"] == 1.0


def test_semantic_dedup_cell_assignment_and_in_cell_dups(spark):
    """Nearest-fixed-centroid assignment routes each vector to its
    cell, and dups are detected against lower-id members of that cell."""
    vecs = [
        [1.0, 0.0],    # centroid 0
        [0.0, 1.0],    # centroid 1
        [1.0, 0.1],    # cell 0, cos vs vec0 ~ 0.995
        [0.1, 1.0],    # cell 1, cos vs vec1 ~ 0.995
    ]
    out = {r["vec_id"]: r for r in
           semantic_dedup(_emb_df(spark, vecs), threshold=0.9,
                          n_centroids=2).collect()}
    assert out[2]["cell"] == 0 and out[3]["cell"] == 1
    assert out[2]["dup_of"] == 0 and out[3]["dup_of"] == 1


def test_semantic_dedup_plan_is_cell_equijoin(spark):
    """Scale guard: the pairwise pass must be an equi-join on the cell
    key (shuffle bounded by cells), never a cartesian product. (The
    one permitted nested loop is the broadcast against the
    model-sized centroid table inside the assignment step.)"""
    vecs = [[float(i == j) for j in range(4)] for i in range(8)]
    plan = semantic_dedup(_emb_df(spark, vecs), threshold=0.9,
                          n_centroids=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert any(("SortMergeJoin" in ln or "HashJoin" in ln)
               and "ncid" in ln for ln in plan.splitlines()), plan


def test_tfidf_topk_basic(spark):
    from tegola_spark.operators.textstats import tfidf_topk
    docs = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry"), (2, "cherry date")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_topk(docs, k=2).collect()}
    # 'apple' appears twice in doc 0 and nowhere else -> top keyword
    assert out[(0, 1)]["word"] == "apple" and out[(0, 1)]["tf"] == 2
    # every doc gets at most k ranked rows, ranks contiguous from 1
    by_doc = {}
    for (d, r) in out:
        by_doc.setdefault(d, []).append(r)
    for d, ranks in by_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # rarer word beats common word at equal tf: doc 1 'cherry' (df 2)
    # vs 'banana' (df 2) tie -> word asc breaks it deterministically
    assert out[(1, 1)]["word"] == "banana"


def test_tfidf_topk_pushes_rank_mapside(spark):
    """Scale guard: the per-doc top-k must run as a WindowGroupLimit
    (rank pushed below the exchange) so only ~k rows per doc shuffle."""
    from tegola_spark.operators.textstats import tfidf_topk
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(10)], "doc_id long, text string")
    plan = tfidf_topk(docs, k=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
