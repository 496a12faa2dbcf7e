"""Linear-classifier tests (operators/classify.py): learns a planted
separable vocabulary, deterministic mode matches a serial NumPy-free
replay exactly, production mode agrees closely, inference flags."""

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.classify import (
    doc_feature_occurrences,
    linear_scores,
    score_expr,
    train_linear_classifier,
)

COOK = "simmer the garlic butter sauce then bake the bread dough slowly"
LEGAL = "the party hereby agrees that the aforementioned clause shall govern"


def _labeled(spark, n=40):
    rows = []
    for i in range(n):
        good = i % 2 == 0
        text = (COOK if good else LEGAL) + f" filler{i % 5}"
        rows.append((i, text, 1.0 if good else -1.0))
    return spark.createDataFrame(rows, "doc_id long, text string, y double")


def test_learns_planted_separation(spark):
    d = _labeled(spark)
    w = train_linear_classifier(
        d, "y", n_buckets=128, iters=8, lr=0.02, unpersist_handles=[]
    )
    scored = linear_scores(d, w, keep_cols=("y",)).collect()
    acc = sum((r["score"] >= 0) == (r["y"] > 0) for r in scored) / len(scored)
    assert acc >= 0.95, acc
    # held-out texts from the same vocabularies separate too
    held = spark.createDataFrame(
        [(100, "bake the dough in butter sauce"), (101, "the clause shall govern the party")],
        "doc_id long, text string",
    )
    hs = {r["doc_id"]: r["score"] for r in linear_scores(held, w).collect()}
    assert hs[100] > hs[101]


def _serial_train(rows, n_buckets, iters, lr, h):
    """Pure-Python replica of the deterministic contract: occurrence
    arrays (unigrams then bigrams then bias), id-sorted gradient folds,
    three-step weight updates."""
    feats = []
    for i, text, y in rows:
        toks = text.split()
        grams = toks + [" ".join(p) for p in zip(toks, toks[1:])]
        feats.append((i, [h(g) % n_buckets for g in grams] + [n_buckets], y))
    w = [0.0] * (n_buckets + 1)
    n = len(feats)
    for _ in range(iters):
        grad = {}
        for i, f, y in sorted(feats):
            s = 0.0
            for b in f:
                s = s + w[b]
            r = y - s
            for b in f:
                grad[b] = grad.get(b, 0.0) + r
        w = [w[b] + lr * (grad.get(b, 0.0) / n) for b in range(n_buckets + 1)]
    return w


def test_deterministic_mode_matches_serial_replay(spark):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    d = _labeled(spark, 20)
    w = train_linear_classifier(
        d, "y", n_buckets=64, iters=3, lr=0.03, hash_fn="md5",
        deterministic=True, unpersist_handles=[],
    )
    rows = [(r["doc_id"], r["text"], r["y"]) for r in d.collect()]
    w_ref = _serial_train(rows, 64, 3, 0.03, h60)
    assert w == pytest.approx(w_ref, abs=0.0, rel=0.0), "bit-exact contract"


def test_production_close_to_deterministic(spark):
    d = _labeled(spark, 20)
    kw = dict(n_buckets=64, iters=3, lr=0.03, hash_fn="md5", unpersist_handles=[])
    wd = train_linear_classifier(d, "y", deterministic=True, **kw)
    wp = train_linear_classifier(d, "y", deterministic=False, **kw)
    assert wp == pytest.approx(wd, rel=1e-9, abs=1e-12)


def test_bias_only_empty_doc(spark):
    d = spark.createDataFrame([(1, "", 1.0), (2, "x y", -1.0)], "doc_id long, text string, y double")
    f = doc_feature_occurrences(d, n_buckets=16).collect()
    by_id = {r["doc_id"]: list(r["f"]) for r in f}
    assert by_id[1] == [16]  # bias occurrence only
    w = [0.5] * 17
    s = d.sparkSession.createDataFrame([(1, [16])], "doc_id long, f array<long>")
    assert s.select(score_expr(F.col("f"), w).alias("s")).first()["s"] == 0.5


def test_calibration_bins_counts_and_clamping(spark):
    """Bin arithmetic by hand: scores at bin edges, below lo, above hi;
    n_pos counts only y == 1.0; min/max are exact per bin."""
    import pandas as pd
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.classify import calibration_bins

    rows = [
        (-1.5, 1.0),   # below lo -> clamps to bin 0
        (-1.0, -1.0),  # exactly lo -> bin 0
        (-0.01, 1.0),  # bin 4
        (0.0, 1.0),    # bin 5 (edge belongs to the upper bin)
        (0.39, -1.0),  # bin 6
        (1.0, 1.0),    # exactly hi -> clamps to bin 9
        (2.0, -1.0),   # above hi -> clamps to bin 9
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["score", "y"]))
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["min_score"], r["max_score"])
        for r in calibration_bins(df, "score", "y").collect()
    }
    assert got == {
        0: (2, 1, -1.5, -1.0),
        4: (1, 1, -0.01, -0.01),
        5: (1, 1, 0.0, 0.0),
        6: (1, 0, 0.39, 0.39),
        9: (2, 1, 1.0, 2.0),
    }
