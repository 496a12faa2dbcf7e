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


# --- byte-level (GPT-2-style) ------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from log_analysis_spark.operators.bpe import (
    bpe_decode_bytes,
    bpe_encode_bytes,
    bpe_train_bytes,
    pretokenize,
)


def test_pretokenize_gpt2_style(spark):
    """Contractions split, leading space rides with the token, letter/
    digit/punct classes separate, token concatenation covers the input."""
    text = "it's a test-case  42 über\tok"
    toks = (
        spark.range(1)
        .select(pretokenize(F.lit(text)).alias("t"))
        .first()["t"]
    )
    assert toks == ["it", "'s", " a", " test", "-", "case", "  ", "42", " über", "\t", "ok"]
    assert "".join(toks) == text  # total coverage -> round-trip possible


def test_bpe_bytes_train_golden(spark):
    """'aaaa' x3 docs: bytes are hex '61'; the top pair is (61, 61) with
    weight 9 (3 adjacent pairs per word occurrence... per histogram the
    word 'aaaa' has cnt 3 and 3 pairs -> n=9); merge 2 makes '6161'+'61'."""
    df = _corpus(spark, ["aaaa", "aaaa", "aaaa"])
    merges = bpe_train_bytes(df, n_merges=2)
    assert (merges[0][1], merges[0][2], merges[0][3]) == ("61", "61", 9)
    # greedy-left rewrote 'aaaa' -> [6161, 6161] in ONE pass, so the
    # step-2 top pair is the merged symbol with itself
    assert (merges[1][1], merges[1][2]) == ("6161", "6161")


def test_bpe_bytes_merges_never_cross_pretokens(spark):
    """' a a a' pre-tokenizes to [' a',' a',' a'] — the space-letter pair
    ('20','61') inside a pre-token merges; across pre-tokens there IS no
    adjacency, so the trained table never glues separate words."""
    df = _corpus(spark, [" a a a"])
    merges = bpe_train_bytes(df, n_merges=1)
    assert (merges[0][1], merges[0][2], merges[0][3]) == ("20", "61", 3)
    enc = (
        spark.range(1)
        .select(bpe_encode_bytes(F.lit(" a a a"), merges).alias("e"))
        .first()["e"]
    )
    assert enc == ["2061", "2061", "2061"]


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=st.lists(st.text(max_size=40), min_size=1, max_size=4))
def test_bpe_bytes_roundtrip_arbitrary_text(spark, texts):
    """decode(encode(x)) == x for ARBITRARY unicode input — the byte-level
    zero-OOV guarantee. Trained merges from the same corpus are applied so
    the property covers merged tokens, not just raw bytes."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train_bytes(df, n_merges=3)
    got = {
        r["doc_id"]: r["rt"]
        for r in df.select(
            "doc_id",
            bpe_decode_bytes(bpe_encode_bytes(F.col("text"), merges)).alias("rt"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == t, (i, t, got[i])
