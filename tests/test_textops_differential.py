"""Seeded randomized differential tests: unigram_lm_score and
ngram_novelty vs pure-Python references over messy random corpora
(multi-space runs, tabs, empty docs, repeated phrases). One Spark job
per operator; every doc compared row-by-row. Complements the DuckDB
oracle (a third independent implementation of the same contract).
"""

import decimal
import math
import random
import re
from collections import Counter


def _round_half_up(x, scale=6):
    # Spark round(double, n) = BigDecimal.valueOf(d) (shortest decimal
    # repr, same as Python's repr) then setScale(n, HALF_UP) — NOT
    # Python's banker's rounding
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(f"1e-{scale}"), rounding=decimal.ROUND_HALF_UP))

from tegola_spark.operators.textstats import ngram_novelty, unigram_lm_score

WORDS = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "the", "of"]
SEPS = [" ", "  ", "\t", " \t "]


def _corpus(seed, n=80):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if rng.random() < 0.05:
            rows.append((i, rng.choice(["", " ", "\t"])))
            continue
        k = rng.randint(1, 14)
        toks = [rng.choice(WORDS) for _ in range(k)]
        if rng.random() < 0.3:  # repeated cross-doc phrase
            toks = ["p1", "p2", "p3", "p4", "p5"] + toks
        text = toks[0] + "".join(rng.choice(SEPS) + t for t in toks[1:])
        rows.append((i, text))
    return rows


def _words_space_split(text):
    # Spark split(text, ' ') + filter '' — single-space regex, so a
    # tab stays GLUED to its neighbors (one token), exactly as Spark
    return [w for w in text.split(" ") if w != ""]


def _ws_tokens(text):
    # Spark split(trim(text), '\s+') — regex whitespace runs
    return re.split(r"\s+", text.strip())


def test_unigram_matches_python_reference(spark):
    rows = _corpus(seed=41)
    counts, total = Counter(), 0
    per_doc_words = {i: _words_space_split(t) for i, t in rows}
    for ws in per_doc_words.values():
        counts.update(ws)
        total += len(ws)
    lp = {w: math.floor(math.log(c / total) * 1e6 + 0.5)
          for w, c in counts.items()}
    want = {}
    for i, ws in per_doc_words.items():
        s = sum(lp[w] for w in ws)
        avg = _round_half_up(s / (len(ws) * 1e6)) if ws else 0.0
        want[i] = (len(ws), s if ws else 0, avg)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["lp_micro_sum"], r["avg_logprob_r6"])
           for r in unigram_lm_score(df).collect()}
    assert got == want


def test_novelty_matches_python_reference(spark):
    n = 5
    rows = _corpus(seed=97)
    shingles = {}
    for i, t in rows:
        toks = _ws_tokens(t)
        shingles[i] = list(dict.fromkeys(
            " ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)))
    dfreq = Counter(s for g in shingles.values() for s in g)
    want = {}
    for i, g in shingles.items():
        dup = sum(1 for s in g if dfreq[s] > 1)
        want[i] = (len(g), dup, _round_half_up(dup / max(len(g), 1)))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_shingles"], r["n_dup"], r["dup_frac_r6"])
           for r in ngram_novelty(df, n=n).collect()}
    assert got == want
