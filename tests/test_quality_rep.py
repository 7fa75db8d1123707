"""Repetition quality filter (operators/quality_rep.py) vs a direct
Python reference."""

from collections import Counter

from tegola_spark.operators import quality_rep


def _ref(text: str):
    w = text.strip().split()
    tri = [" ".join(w[i:i + 3]) for i in range(len(w) - 2)] if len(w) >= 3 else []
    bi = [" ".join(w[i:i + 2]) for i in range(len(w) - 1)] if len(w) >= 2 else []
    n_tri = len(tri)
    dup = round(1.0 - len(set(tri)) / n_tri, 6) if n_tri else 0.0
    top = max(Counter(bi).values()) if bi else 0
    topf = round(top / (n_tri + 1), 6)
    return (n_tri, dup, top, topf)


SAMPLES = [
    "the quick brown fox jumps over the lazy dog",
    "buy now " * 30,                       # pure spam: all dup trigrams
    "alpha beta gamma delta " * 10,        # cyclic repetition
    "one two",                             # no trigrams, one bigram
    "single",                              # no bigrams at all
    "a b c d e f g h i j k l m n o p",     # all distinct
]


def test_scores_match_python_reference(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in quality_rep.repetition_scores(df).collect()}
    for i, s in enumerate(SAMPLES):
        n_tri, dup, top, topf = _ref(s)
        r = rows[i]
        assert r["n_trigrams"] == n_tri, s
        assert r["dup_trigram_frac"] == dup, s
        assert r["top_bigram_count"] == top, s
        assert r["top_bigram_frac"] == topf, s


def test_gopher_cuts(spark):
    clean = " ".join(f"w{i}" for i in range(40))  # 40 distinct words
    df = spark.createDataFrame(
        [(0, "buy now " * 30), (1, clean),
         (2, "the quick brown fox jumps high")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["keep"]
            for r in quality_rep.repetition_scores(df).collect()}
    assert rows[0] is False   # spam: dup_trigram_frac ~ 1
    assert rows[1] is True    # long distinct doc passes both cuts
    # a 6-word doc has top_bigram_frac 1/5 = 0.2 > 0.18: the Gopher
    # cuts are meaningful only past the pipeline's length filters
    assert rows[2] is False
