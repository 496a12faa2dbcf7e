"""Malformed-input robustness + property-based spec/parser agreement."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st


from log_analysis_spark.functions.parse import (
    EVENT_RE,
    TEXT_PATTERN,
    _binary_to_string_or_null,
    parse_conn_like,
    parse_http_like,
)
from log_analysis_spark.synth import gen_batch

import numpy as np


def _pages_df(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    return spark.createDataFrame(pdf)


def test_malformed_pages_yield_nulls_not_failures(spark):
    ts = pd.Timestamp("2024-07-02 10:00:00")
    rows = [
        # valid payload, invalid utf-8 OUTSIDE markers: must still extract
        ("u://a", ts, b"\xff\xfe<!--BEGIN_TEXT-->ok payload<!--END_TEXT-->\xff", "x", "en"),
        # invalid utf-8 INSIDE the payload: null, no task failure
        ("u://b", ts, b"<!--BEGIN_TEXT-->bad \xff\xfe bytes<!--END_TEXT-->", "x", "en"),
        # truncated: no END marker
        ("u://c", ts, b"<!--BEGIN_TEXT-->never closed...", "x", "en"),
        # empty payload between markers
        ("u://d", ts, b"<!--BEGIN_TEXT--><!--END_TEXT-->", "x", "en"),
        # no markers at all
        ("u://e", ts, b"<html>just html</html>", "x", "en"),
    ]
    out = {
        r["url"]: r["extracted_text"]
        for r in parse_http_like(_pages_df(spark, rows), byte_exact=True).collect()
    }
    assert out["u://a"] == "ok payload"
    assert out["u://b"] is None
    assert out["u://c"] is None
    assert out["u://d"] == ""
    assert out["u://e"] is None


def test_malformed_event_lines_dropped(spark):
    ts = pd.Timestamp("2024-07-02 10:00:00")
    text = (
        "EV type=conn src=1.1.1.1 dst=2.2.2.2 sport=1 dport=53 bytes=9 dur_ms=2\n"
        "EV type=conn src=1.1.1.1 dst=2.2.2.2 sport=NOTANUM dport=53 bytes=9 dur_ms=2\n"
        "EV type=conn src=1.1.1.1\n"
        "garbage line\n"
        "EV type=dns src=3.3.3.3 dst=4.4.4.4 sport=5 dport=53 bytes=6 dur_ms=7"
    )
    rows = [("u://x", ts, b"<x/>", text, "en")]
    got = parse_conn_like(_pages_df(spark, rows), vectorized=True).collect()
    assert len(got) == 2
    assert {r["record_type"] for r in got} == {"conn", "dns"}


def test_binary_to_string_or_null_unit():
    arr = pa.array([b"fine", b"\xff\xfe", None, b""], type=pa.binary())
    out = _binary_to_string_or_null(arr).to_pylist()
    assert out == ["fine", None, None, ""]


# --- property-based: synth spec and Arrow kernels agree on every id -------
@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=64))
def test_extract_text_matches_spec_for_any_ids(ids):
    """For ANY generated page, the RE2 kernel recovers the text column
    byte-for-byte from html (the north-rule byte-identity invariant),
    checked without Spark for speed."""
    pdf = gen_batch(np.asarray(sorted(set(ids)), dtype=np.int64))
    html = pa.array(list(pdf["html"]), type=pa.binary())
    m = pc.extract_regex(html, TEXT_PATTERN)
    extracted = pc.struct_field(m, "t").to_pylist()
    expected = [t.encode("utf-8") for t in pdf["text"]]
    assert extracted == expected


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10**7))
def test_event_parse_arrow_agrees_with_python_re(doc_id):
    """Arrow RE2 (executor kernel) and Python re (golden oracle) must agree
    on which event lines match — including synth's deliberately-malformed
    near-dup tail lines, which both must drop."""
    from log_analysis_spark.functions.parse import EVENT_PATTERN

    pdf = gen_batch(np.asarray([doc_id], dtype=np.int64))
    text = pdf["text"].iloc[0]
    lines = pa.array(text.split("\n"), type=pa.string())
    arrow_matches = int(pc.sum(pc.is_valid(pc.extract_regex(lines, EVENT_PATTERN))).as_py() or 0)
    assert arrow_matches == len(EVENT_RE.findall(text))
