"""Duplicated-span scrub: planted boilerplate, reassembly order, edges."""

from __future__ import annotations

import pandas as pd
import pytest

from log_analysis_spark.operators.dedup import duplicated_span_scrub, span_blocks


@pytest.fixture(scope="module")
def corpus(spark):
    # 2-word blocks; "click here" + "terms apply" are shared boilerplate,
    # everything else is unique per document.
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "click here alpha beta terms apply",
                    "click here gamma delta terms apply",
                    "wholly original text only",
                    "",  # tokenizes empty
                ],
            }
        )
    )


def test_blocks_partition_tokens(corpus):
    rows = span_blocks(corpus, "doc_id", "text", k=2, hash_fn="md5").collect()
    d1 = sorted(
        (r["_b"], r["_btxt"]) for r in rows if r["_id"] == 1
    )
    assert d1 == [(0, "click here"), (1, "alpha beta"), (2, "terms apply")]
    # ragged tail: doc 3 has 4 tokens -> 2 full blocks, none dropped
    assert sorted(r["_btxt"] for r in rows if r["_id"] == 3) == [
        "text only",
        "wholly original",
    ]
    assert not [r for r in rows if r["_id"] == 4]


def test_scrub_removes_cross_doc_spans_only(corpus):
    out = {
        r["doc_id"]: r
        for r in duplicated_span_scrub(
            corpus, "doc_id", "text", k=2, max_docs=1, hash_fn="md5"
        ).collect()
    }
    assert len(out) == 4  # every input doc survives as a row
    assert out[1]["n_spans"] == 3 and out[1]["dup_spans"] == 2
    assert out[1]["clean_text"] == "alpha beta"
    assert out[2]["clean_text"] == "gamma delta"
    # untouched doc reassembles byte-identically, in block order
    assert out[3]["dup_spans"] == 0
    assert out[3]["clean_text"] == "wholly original text only"
    assert out[4]["n_spans"] == 0 and out[4]["clean_text"] == ""


def test_within_doc_repeat_not_scrubbed(spark):
    # the same block twice INSIDE one doc is 1 distinct doc -> kept both times
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["go go go go"]})
    )
    out = duplicated_span_scrub(df, "doc_id", "text", k=2, hash_fn="md5").collect()[0]
    assert out["dup_spans"] == 0
    assert out["clean_text"] == "go go go go"


def test_max_docs_threshold(corpus):
    # max_docs=2 tolerates pair-wise boilerplate -> nothing removed
    out = duplicated_span_scrub(
        corpus, "doc_id", "text", k=2, max_docs=2, hash_fn="md5"
    ).collect()
    assert all(r["dup_spans"] == 0 for r in out)


def test_window_scrub_catches_unaligned_boilerplate(spark):
    """The same k-token boilerplate at DIFFERENT alignments: block-based
    span scrub misses it (different block boundaries), the sliding-window
    scrub removes it from both docs — and only it."""
    from log_analysis_spark.operators.dedup import (
        duplicated_span_scrub,
        duplicated_window_scrub,
    )

    boiler = "all rights reserved click here"
    d = spark.createDataFrame(
        [
            (1, f"intro words {boiler} tail one"),
            (2, f"shift {boiler} other ending words"),  # offset differs
            (3, "completely unrelated document text"),
        ],
        "doc_id long, text string",
    )
    blocks = {
        r["doc_id"]: r
        for r in duplicated_span_scrub(d, k=5, max_docs=1).collect()
    }
    assert all(r["dup_spans"] == 0 for r in blocks.values())  # alignment miss
    wins = {
        r["doc_id"]: r for r in duplicated_window_scrub(d, k=5, max_docs=1).collect()
    }
    assert wins[1]["dup_windows"] == 1 and wins[2]["dup_windows"] == 1
    assert wins[1]["clean_text"] == "intro words tail one"
    assert wins[2]["clean_text"] == "shift other ending words"
    assert wins[3]["dup_windows"] == 0
    assert wins[3]["clean_text"] == "completely unrelated document text"
    # n_windows = tokens - k + 1
    assert wins[1]["n_windows"] == 9 - 5 + 1


def test_window_scrub_short_and_empty_docs_pass_through(spark):
    from log_analysis_spark.operators.dedup import duplicated_window_scrub

    d = spark.createDataFrame(
        [(1, "too short"), (2, ""), (3, "a b c d e")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_window_scrub(d, k=5, max_docs=1).collect()}
    assert (out[1]["n_windows"], out[1]["clean_text"]) == (0, "too short")
    assert (out[2]["n_windows"], out[2]["clean_text"]) == (0, "")
    assert (out[3]["n_windows"], out[3]["clean_text"]) == (1, "a b c d e")


def test_window_scrub_within_doc_repeat_not_dup_at_maxdocs1(spark):
    """max_docs counts DISTINCT documents: a window repeated within one
    doc is not cross-document boilerplate."""
    from log_analysis_spark.operators.dedup import duplicated_window_scrub

    d = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "unrelated other words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_window_scrub(d, k=3, max_docs=1).collect()}
    assert out[1]["dup_windows"] == 0
    assert out[1]["clean_text"] == "x y z x y z"
