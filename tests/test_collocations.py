"""PMI collocation mining (operators/collocations.py)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from log_analysis_spark.operators.collocations import pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


CORPUS = [
    "new york is a big city and new york never sleeps",
    "machine learning and machine learning again said the machine",
    "the city is big and the city is loud",
    "york new is not a phrase anyone says",
    "",
    "one",
]


def _py_pmi(texts, min_count):
    """Independent replay: same tokenization, counts, fixed lift tree."""
    uni: Counter = Counter()
    bg: Counter = Counter()
    for t in texts:
        toks = [w for w in t.strip().split() if w]
        uni.update(toks)
        bg.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    b = sum(bg.values())
    out = {}
    for (w1, w2), c12 in bg.items():
        if c12 >= min_count:
            out[(w1, w2)] = (c12 / b) / ((uni[w1] / n) * (uni[w2] / n))
    return out


def test_pmi_matches_python_replay_bitwise(spark):
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["lift"])
        for r in pmi_collocations(_docs(spark, CORPUS), min_count=2, k=None).collect()
    }
    want = _py_pmi(CORPUS, 2)
    assert set(got) == set(want)
    for pair, lift in want.items():
        assert got[pair][1] == lift  # fixed IEEE tree -> bit-equal


def test_pmi_ranks_planted_phrases_over_chance_pairs(spark):
    rows = pmi_collocations(_docs(spark, CORPUS), min_count=2, k=5).collect()
    top2 = {(r["w1"], r["w2"]) for r in rows[:2]}
    # the two planted phrases out-lift every incidental pair
    assert top2 == {("new", "york"), ("machine", "learning")}
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_pmi_min_count_cut_and_degenerate_docs(spark):
    # min_count=3 drops everything except pairs occurring 3+ times;
    # empty and single-token docs contribute no bigrams and don't crash.
    rows = pmi_collocations(_docs(spark, CORPUS), min_count=3, k=None).collect()
    assert all(r["n_pair"] >= 3 for r in rows)
    assert pmi_collocations(_docs(spark, ["", "x"]), min_count=1, k=None).count() == 0


def test_pmi_k_limit_deterministic_tiebreak(spark):
    full = pmi_collocations(_docs(spark, CORPUS), min_count=1, k=None).collect()
    top = pmi_collocations(_docs(spark, CORPUS), min_count=1, k=4).collect()
    key = lambda r: (-r["lift"], r["w1"], r["w2"])  # noqa: E731
    assert [key(r) for r in top] == sorted([key(r) for r in full])[:4]
