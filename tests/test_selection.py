"""DSIR importance-resampling selection (operators/selection.py)."""

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.selection import (
    dsir_select,
    dsir_weights,
    hashed_feature_buckets,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # target distribution: cooking text; raw corpus: half cooking-like,
    # half legal-like documents
    target = spark.createDataFrame(
        [(i, "bake the bread with flour and salt") for i in range(20)],
        "doc_id long, text string",
    )
    raw_rows = [(i, "bake fresh bread with flour salt and water") for i in range(30)]
    raw_rows += [
        (100 + i, "the party of the first part hereby agrees to the terms")
        for i in range(30)
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    return raw, target


def test_weights_favor_target_like_docs(corpora):
    raw, target = corpora
    w = {r.doc_id: r.weight for r in dsir_weights(raw, target).collect()}
    cooking = w[0]
    legal = w[100]
    assert cooking > legal
    # likelihood ratios are multiplicative: the gap should be decisive,
    # not marginal
    assert cooking / legal > 10


def test_selection_rate_tracks_weight(corpora):
    raw, target = corpora
    sel = dsir_select(raw, target).collect()
    cooking_kept = sum(1 for r in sel if r.doc_id < 100 and r.selected)
    legal_kept = sum(1 for r in sel if r.doc_id >= 100 and r.selected)
    assert cooking_kept > legal_kept
    # max-weight docs are kept with probability ~1 (u < 1 always)
    by_id = {r.doc_id: r for r in sel}
    wmax = max(r.weight for r in sel)
    for r in sel:
        if r.weight == wmax:
            assert r.selected


def test_empty_doc_weight_one(spark):
    raw = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "some actual words here")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, "words")], "doc_id long, text string")
    rows = {r.doc_id: r for r in dsir_weights(raw, target).collect()}
    assert rows[1].n_feats == 0 and rows[1].weight == 1.0
    assert rows[2].n_feats == 0 and rows[2].weight == 1.0
    assert rows[3].n_feats == 7  # 4 unigrams + 3 bigrams


def test_feature_buckets_bounded(spark):
    df = spark.createDataFrame([("a b c d e f g h",)], "text string")
    from log_analysis_spark.functions.textstats import tokens

    toks_df = df.select(tokens(F.col("text")).alias("_toks")).repartition(2)
    out = toks_df.select(
        hashed_feature_buckets(F.col("_toks"), 16).alias("f")
    ).collect()[0]["f"]
    assert len(out) == 8 + 7
    assert all(0 <= b < 16 for b in out)
