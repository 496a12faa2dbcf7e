"""Repetition filters (Gopher rules) + char-bigram familiarity scoring."""

from __future__ import annotations

import pandas as pd
import pytest

from log_analysis_spark.operators import quality as Q


@pytest.fixture(scope="module")
def rep_docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    # 4 lines, "spam spam" twice -> dup lines; "spam spam"
                    # is also the dominant bigram
                    "spam spam\nspam spam\nreal line here\nanother real line",
                    # no repetition at all
                    "every word here is completely unique in this document",
                    # heavy 5-gram repetition: same 6-word phrase twice
                    "the cat sat on the mat again the cat sat on the mat",
                    "",  # empty: every fraction must be 0, no div-by-zero
                ],
            }
        )
    )


def test_repetition_stats_known_values(rep_docs):
    rows = {r["doc_id"]: r for r in Q.repetition_stats(rep_docs).collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == pytest.approx((4 - 3) / 4)  # one dup line
    # "spam spam" = 9 chars, twice; total line chars = 9+9+14+17 = 49
    assert r1["dup_line_char_frac"] == pytest.approx(18 / 49)
    # top bigram "spam spam" occurs 3x (incl. across the line boundary:
    # tokens ignore line structure) * 9 chars / 49 text chars... text
    # length includes the 3 newlines -> len = 52
    assert r1["top2gram_char_frac"] == pytest.approx(3 * 9 / 52)

    r2 = rows[2]
    assert r2["dup_line_frac"] == 0.0
    assert r2["dup_line_char_frac"] == 0.0
    assert r2["dup5gram_char_frac"] == 0.0
    # 9 distinct bigrams, each once: top = lexicographically smallest
    assert 0 < r2["top2gram_char_frac"] < 0.5

    r3 = rows[3]
    # "the cat sat on the" and 3 more 5-grams repeat (window slides over
    # the repeated phrase) -> strong dup-5-gram signal
    assert r3["dup5gram_char_frac"] > 0.5
    assert r3["n_lines"] == 1 and r3["dup_line_frac"] == 0.0

    r4 = rows[4]
    assert r4["n_lines"] == 1  # split('') -> ['']
    for c in ("dup_line_frac", "dup_line_char_frac",
              "top2gram_char_frac", "dup5gram_char_frac"):
        assert r4[c] == 0.0


def test_repetition_stats_tie_breaks_lexicographic(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["b a b a"]})
    )
    # bigrams: "b a" x2? tokens = b,a,b,a -> grams "b a","a b","b a":
    # "b a" count 2, "a b" count 1 -> top is "b a" by count alone
    r = Q.repetition_stats(df).collect()[0]
    assert r["top2gram_char_frac"] == pytest.approx(2 * 3 / 7)
    df2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["x y x"]})
    )
    # "x y" and "y x" both once -> tie -> lexicographically smallest "x y"
    r2 = Q.repetition_stats(df2).collect()[0]
    assert r2["top2gram_char_frac"] == pytest.approx(3 / 5)


@pytest.fixture(scope="module")
def lm_docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "lang": ["en", "en", "en", "en"],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the other brown dog jumps over the quick fox",
                    # spaceless gibberish: every letter-letter bigram is
                    # absent from fluent English text
                    "zqxjvqzxqqzzjxvxqjzzqxvjxqzjvq",
                    "a",  # < 2 normalized chars -> no bigrams
                ],
            }
        )
    )


def test_char_bigram_scores_separate_gibberish(lm_docs):
    """With a reference model (trained on the fluent docs — the CCNet
    usage), gibberish scores an order of magnitude below fluent text.
    Self-trained on a tiny corpus the separation shrinks (the gibberish
    contributes its own bigrams to the model) but the ordering holds."""
    # a reference corpus big enough that the add-one floor 1/(total+729)
    # sits well below common-bigram probabilities (a 4-doc corpus can't:
    # the unseen floor is then only ~3x below the fluent average)
    ref_corpus = lm_docs.sparkSession.createDataFrame(
        pd.DataFrame({
            "doc_id": [100],
            "lang": ["en"],
            "text": ["the quick brown fox jumps over the lazy dog and "
                     "every good sentence reads like plain english text " * 40],
        })
    )
    ref = Q.char_bigram_model(ref_corpus)
    rows = {
        r["doc_id"]: r for r in Q.char_bigram_scores(lm_docs, model=ref).collect()
    }
    assert rows[1]["familiarity"] > rows[3]["familiarity"] * 5
    assert rows[2]["familiarity"] > rows[3]["familiarity"] * 5
    assert rows[4]["n_bigrams"] == 0 and rows[4]["familiarity"] == 0.0
    assert rows[1]["n_bigrams"] == len("the quick brown fox jumps over the lazy dog") - 1

    self_rows = {r["doc_id"]: r for r in Q.char_bigram_scores(lm_docs).collect()}
    assert self_rows[3]["familiarity"] < self_rows[1]["familiarity"]
    assert self_rows[3]["familiarity"] < self_rows[2]["familiarity"]


def test_char_bigram_scores_deterministic(lm_docs):
    a = {r["doc_id"]: r["familiarity"] for r in Q.char_bigram_scores(lm_docs).collect()}
    b = {r["doc_id"]: r["familiarity"] for r in Q.char_bigram_scores(lm_docs).collect()}
    assert a == b  # bit-identical: ordered fold, not agg-order-dependent sum


def test_char_bigram_model_is_broadcastable_and_small(lm_docs, spark):
    m = Q.char_bigram_model(lm_docs)
    assert m.count() <= Q.CHAR_BIGRAM_VOCAB  # one lang
    # the scoring join must be a broadcast hash join, never a shuffle of
    # the big side on the model key
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        Q.char_bigram_scores(lm_docs).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# C4 line filter
# ---------------------------------------------------------------------------

def test_c4_line_filter_rules(spark):
    from log_analysis_spark.operators.quality import c4_line_filter

    doc = "\n".join(
        [
            "This is a proper sentence.",      # kept
            "no terminal punctuation here",    # dropped: no terminal punct
            "Tiny one.",                       # dropped: < 3 words
            "Please enable JavaScript to continue.",  # dropped: deny
            'He said "stop".',                 # kept (quote-terminal ok via .)
            "Is this a question?",             # kept
        ]
    )
    df = spark.createDataFrame([(1, doc), (2, "int main() { return 0; }")],
                               "doc_id long, text string")
    rows = {r.doc_id: r for r in c4_line_filter(df).collect()}
    r1 = rows[1]
    assert r1.n_lines == 6 and r1.n_kept == 3 and not r1.page_dropped
    assert r1.clean_text == (
        'This is a proper sentence.\nHe said "stop".\nIs this a question?'
    )
    r2 = rows[2]
    assert r2.page_dropped and r2.clean_text == ""


def test_c4_line_filter_zero_shuffle_plan(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.quality import c4_line_filter

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("A line here.").alias("text")
    )
    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_c4_line_filter_all_dropped_page(spark):
    from log_analysis_spark.operators.quality import c4_line_filter

    df = spark.createDataFrame([(1, "nothing survives here")], "doc_id long, text string")
    r = c4_line_filter(df).collect()[0]
    assert r.page_dropped and r.clean_text == "" and r.n_kept == 0


# --- boilerplate_blocks (jusText-style context smoothing) --------------------

def test_boilerplate_blocks_classes_and_smoothing(spark):
    from log_analysis_spark.operators.quality import boilerplate_blocks

    doc = "\n".join(
        [
            "the cat sat on the mat with a hat",   # GOOD (stopword-dense)
            "Go on",                               # SHORT next to GOOD -> kept
            "Home About Contact Products Pricing", # BAD (no stopwords)
            "Read more",                           # SHORT: neighbors BAD+SHORT -> dropped
            "Buy now",                             # SHORT: neighbors SHORT+BAD -> dropped
            "Download Windows Mac Linux Android iOS versions now",  # BAD
            "it was the best of times and the worst",  # GOOD
        ]
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = boilerplate_blocks(df).collect()[0]
    assert r.n_lines == 7
    # kept: line 1 (GOOD), line 2 (SHORT rescued by line 1), line 7 (GOOD).
    # Lines 4 and 5 prove smoothing is single-step: a SHORT chain between
    # two BADs does not bootstrap itself.
    assert r.n_content == 3
    assert r.content_text == (
        "the cat sat on the mat with a hat\nGo on\n"
        "it was the best of times and the worst"
    )


def test_boilerplate_blocks_short_not_transitive(spark):
    from log_analysis_spark.operators.quality import boilerplate_blocks

    # SHORT adjacent to a smoothed-SHORT (not base-GOOD) stays dropped:
    # the rule reads BASE classes, never final ones.
    doc = "\n".join(
        [
            "it was the best of times and the worst",  # GOOD
            "Chapter one",                             # SHORT -> rescued
            "Read more",                               # SHORT, neighbors SHORT+SHORT -> dropped
            "Buy now",                                 # SHORT, neighbors SHORT+BAD -> dropped
            "Home About Contact Products Pricing",     # BAD
        ]
    )
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = boilerplate_blocks(df).collect()[0]
    assert r.n_content == 2
    assert r.content_text == (
        "it was the best of times and the worst\nChapter one"
    )


def test_boilerplate_blocks_empty_and_all_bad(spark):
    from log_analysis_spark.operators.quality import boilerplate_blocks

    df = spark.createDataFrame(
        [(1, ""), (2, "Home About\nContact Products Pricing Careers Jobs")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in boilerplate_blocks(df).collect()}
    assert rows[1].n_lines == 1 and rows[1].n_content == 0
    assert rows[1].content_text == ""
    assert rows[2].n_content == 0 and rows[2].content_text == ""


def test_boilerplate_blocks_zero_shuffle_plan(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.quality import boilerplate_blocks

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("the cat sat on a mat\nOk then").alias("text")
    )
    plan = boilerplate_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
