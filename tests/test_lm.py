"""Stupid Backoff LM scoring (operators/lm.py)."""

from __future__ import annotations

from collections import Counter

from log_analysis_spark.operators.lm import (
    ALPHA,
    stupid_backoff_model,
    stupid_backoff_scores,
)

MODEL_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox runs over the green hill",
    "the lazy dog sleeps in the warm sun",
    "a quick brown fox is a happy fox",
]

SCORE_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),  # in-domain
    (2, "fox brown quick the dog lazy the over jumps"),  # shuffled
    (3, "zyx wvu tsr qpo"),  # pure OOV
    (4, "the quick brown"),  # short: pos 1/2/3 branches
    (5, "sun"),  # single token: unigram branch only
    (6, ""),  # no tokens: no output row
]


def _py_model(texts, min_count):
    uni: Counter = Counter()
    bi: Counter = Counter()
    tri: Counter = Counter()
    for t in texts:
        w = [x for x in t.strip().split() if x]
        uni.update(w)
        bi.update(zip(w, w[1:]))
        tri.update(zip(w, w[1:], w[2:]))
    tri = Counter({k: v for k, v in tri.items() if v >= min_count})
    return uni, bi, tri, sum(uni.values())


def _py_scores(docs, model):
    uni, bi, tri, n = model
    out = {}
    for doc_id, t in docs:
        w = [x for x in t.strip().split() if x]
        if not w:
            continue
        total = 0.0
        for i in range(len(w)):
            w3 = w[i]
            unig = uni.get(w3, 0) / n
            if i >= 2:
                w1, w2 = w[i - 2], w[i - 1]
                if (w1, w2, w3) in tri:
                    p = tri[(w1, w2, w3)] / bi[(w1, w2)]
                elif (w2, w3) in bi:
                    p = ALPHA * (bi[(w2, w3)] / uni[w2])
                else:
                    p = (ALPHA * ALPHA) * unig
            elif i == 1:
                w2 = w[0]
                if (w2, w3) in bi:
                    p = bi[(w2, w3)] / uni[w2]
                else:
                    p = ALPHA * unig
            else:
                p = unig
            total += p
        out[doc_id] = (len(w), total / len(w))
    return out


def _spark_scores(spark, min_count):
    model_df = spark.createDataFrame([(t,) for t in MODEL_TEXTS], "text string")
    docs_df = spark.createDataFrame(SCORE_DOCS, "doc_id long, text string")
    model = stupid_backoff_model(model_df, min_count=min_count)
    return {
        r["doc_id"]: (r["n_tokens"], r["sb_score"])
        for r in stupid_backoff_scores(docs_df, model).collect()
    }


def test_stupid_backoff_matches_python_replay_bitwise(spark):
    got = _spark_scores(spark, min_count=1)
    want = _py_scores(SCORE_DOCS, _py_model(MODEL_TEXTS, 1))
    assert set(got) == set(want)  # doc 6 (empty) absent from both
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]  # fixed IEEE tree -> bit-equal


def test_stupid_backoff_separates_fluent_from_shuffled_and_oov(spark):
    got = _spark_scores(spark, min_count=1)
    assert got[1][1] > got[2][1] > got[3][1]
    assert got[3][1] == 0.0  # every position pure-OOV backoff to 0
    # single in-model token: exact unigram ratio c("sun")/N
    uni, _, _, n = _py_model(MODEL_TEXTS, 1)
    assert got[5] == (1, uni["sun"] / n)


def test_stupid_backoff_min_count_prunes_to_backoff(spark):
    # "fox jumps over" occurs once in the model: at min_count=2 it is
    # pruned, so doc 1's score drops to the backoff value — and both
    # variants still match the python replay bit-for-bit.
    loose = _spark_scores(spark, min_count=1)
    pruned = _spark_scores(spark, min_count=2)
    assert pruned[1][1] < loose[1][1]
    want = _py_scores(SCORE_DOCS, _py_model(MODEL_TEXTS, 2))
    assert pruned[1][1] == want[1][1]
