"""Distributed BPE training (operators/bpe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_spark.operators.bpe import (
    END,
    bpe_segment,
    bpe_train,
    word_histogram,
)


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_histogram(spark):
    df = _corpus(spark, ["a b a", "b  a"])
    got = {r["w"]: r["cnt"] for r in word_histogram(df).collect()}
    assert got == {"a": 3, "b": 2}


def test_bpe_train_golden_sennrich_style(spark):
    """5x 'lower' + 2x 'low': 'lo' then 'low' merge first (weighted by
    word counts), matching a hand-run of the algorithm."""
    df = _corpus(spark, ["lower lower lower lower lower", "low low"])
    merges = bpe_train(df, n_merges=3)
    assert [(m[1], m[2], m[3]) for m in merges] == [
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "r", 5),
    ]
    assert [m[0] for m in merges] == [0, 1, 2]


def test_bpe_greedy_left_overlap(spark):
    """'aaaa': merge (a,a) counts 3 overlapping pairs; applying it
    greedy-left yields [aa, aa, </w>]. The next step ties (aa,aa) with
    (aa,</w>) at count 1 and the lexicographic tiebreak picks </w>
    ('<' < 'a') — the determinism contract, same in the oracle."""
    df = _corpus(spark, ["aaaa"])
    merges = bpe_train(df, n_merges=2)
    assert (merges[0][1], merges[0][2], merges[0][3]) == ("a", "a", 3)
    assert (merges[1][1], merges[1][2]) == ("aa", END)


def test_bpe_early_stop_on_exhausted_vocab(spark):
    # single 1-char word: one pair (x, </w>); after merging it the word
    # is ONE symbol — no pairs remain, training stops at 1 merge
    df = _corpus(spark, ["x"])
    merges = bpe_train(df, n_merges=5)
    assert len(merges) == 1
    assert (merges[0][1], merges[0][2]) == ("x", END)


def test_bpe_segment_applies_learned_merges(spark):
    df = _corpus(spark, ["lower lower lower lower lower", "low low"])
    merges = bpe_train(df, n_merges=3)
    out = (
        spark.createDataFrame([("lowest",)], "w string")
        .select(bpe_segment(F.col("w"), merges).alias("s"))
        .first()["s"]
    )
    # 'low' merged; 'est</w>' unseen -> stays character-level
    assert out == ["low", "e", "s", "t", END]
