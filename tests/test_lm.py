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

# ---- perplexity_buckets (CCNet head/middle/tail) ----


def _py_buckets(docs_with_lang, model, n_bins=1000):
    """Pure-python replay of perplexity_buckets' binning + tercile rule."""
    import math

    scores = _py_scores([(i, t) for i, t, _ in docs_with_lang], model)
    langs = {i: lg for i, _, lg in docs_with_lang}
    binned = {
        i: min(int(math.floor(s * float(n_bins))), n_bins - 1)
        for i, (_, s) in scores.items()
    }
    hist: dict = {}
    for i, b in binned.items():
        hist.setdefault(langs[i], Counter())[b] += 1
    bucket_of = {}
    for lg, h in hist.items():
        n = sum(h.values())
        cum = 0
        for b in sorted(h):
            cum += h[b]
            bucket_of[(lg, b)] = (
                "tail" if 3 * cum <= n else "middle" if 3 * cum <= 2 * n else "head"
            )
    return {
        i: (langs[i], scores[i][0], scores[i][1], bucket_of[(langs[i], binned[i])])
        for i in scores
    }


BUCKET_DOCS = [
    # nine en docs spanning fluent -> shuffled -> OOV so the en terciles
    # are non-degenerate; two de docs prove per-lang independence.
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the quick brown fox runs over the green hill", "en"),
    (3, "the lazy dog sleeps in the warm sun", "en"),
    (4, "a quick brown fox is a happy fox", "en"),
    (5, "fox brown quick the dog lazy the over jumps", "en"),
    (6, "hill green the over runs fox brown quick", "en"),
    (7, "zyx wvu tsr qpo", "en"),
    (8, "qqq www eee rrr", "en"),
    (9, "dog the sun warm", "en"),
    (10, "der schnelle braune fuchs", "de"),
    (11, "the quick brown fox", "de"),
]


def _spark_buckets(spark, n_bins=1000):
    from log_analysis_spark.operators.lm import perplexity_buckets

    model_df = spark.createDataFrame([(t,) for t in MODEL_TEXTS], "text string")
    docs_df = spark.createDataFrame(
        BUCKET_DOCS, "doc_id long, text string, lang string"
    )
    model = stupid_backoff_model(model_df, min_count=1)
    return {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["sb_score"], r["bucket"])
        for r in perplexity_buckets(docs_df, model, n_bins=n_bins).collect()
    }


def test_perplexity_buckets_match_python_replay(spark):
    got = _spark_buckets(spark)
    want = _py_buckets(BUCKET_DOCS, _py_model(MODEL_TEXTS, 1))
    assert got == want  # lang, n_tokens, bit-exact score, bucket


def test_perplexity_buckets_fluent_head_oov_tail(spark):
    got = _spark_buckets(spark)
    # in-model English prose lands in head, pure-OOV gibberish in tail
    assert got[1][3] == "head"
    assert got[7][3] == "tail" and got[8][3] == "tail"
    # terciles are PER LANGUAGE: de has its own split even though doc 11
    # would be head-fluent under the global en distribution
    en_buckets = {b for i, (lg, _, _, b) in got.items() if lg == "en"}
    assert en_buckets == {"head", "middle", "tail"}
    de = {i: v for i, v in got.items() if v[0] == "de"}
    assert len(de) == 2 and {v[3] for v in de.values()} <= {"head", "middle", "tail"}


def test_perplexity_buckets_tie_rule_same_bin_same_bucket(spark):
    # coarse binning (n_bins=1) forces every doc into bin 0: the
    # bin-granular tie rule must put ALL docs of a lang in ONE bucket
    # (cum == n -> head by the integer CASE).
    got = _spark_buckets(spark, n_bins=1)
    assert {v[3] for v in got.values()} == {"head"}
