"""Fuzz hardening for the final round-4 operators: the WARC parser must
round-trip ARBITRARY binary payloads byte-exactly and never crash on
garbage; the grouped prefix sum and the deterministic classifier must
match serial pure-Python replays on random inputs (not just the planted
fixtures)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from log_analysis_spark.sources.warc import (
    build_http_response_block,
    build_record,
    records_from_bytes,
)

_BYTES = st.binary(max_size=300)
_URL = st.from_regex(r"http://[a-z]{1,8}\.example/[a-zA-Z0-9/_-]{0,12}", fullmatch=True)


@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(payloads=st.lists(st.tuples(_URL, _BYTES, st.sampled_from([200, 301, 404])), min_size=1, max_size=5))
def test_warc_roundtrips_arbitrary_binary_payloads(payloads):
    """Any payload bytes — including ones containing WARC/HTTP framing
    sequences — come back byte-identical through Content-Length slicing."""
    stream = b"".join(
        build_record(
            "response",
            url,
            "2024-07-02T00:00:00Z",
            build_http_response_block(body, status),
            content_type="application/http; msgtype=response",
        )
        for url, body, status in payloads
    )
    recs = list(records_from_bytes(stream, "f"))
    assert len(recs) == len(payloads)
    for rec, (url, body, status) in zip(recs, payloads):
        assert rec["rec_type"] == "response"
        assert rec["url"] == url
        assert rec["http_status"] == status
        assert rec["payload"] == body


@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(junk=_BYTES, tail=st.integers(min_value=0, max_value=200))
def test_warc_never_crashes_on_garbage(junk, tail):
    """Garbage streams (and valid-prefix + truncated-tail streams) always
    terminate with at most one _malformed dead-letter, never raise."""
    recs = list(records_from_bytes(junk, "f"))
    assert sum(r["rec_type"] == "_malformed" for r in recs) <= 1
    good = build_record(
        "response",
        "http://a.example/x",
        "2024-07-02T00:00:00Z",
        build_http_response_block(b"ok"),
        content_type="application/http; msgtype=response",
    )
    cut = good + good[: min(tail, len(good) - 1)]
    recs2 = list(records_from_bytes(cut, "f"))
    assert recs2[0]["payload"] == b"ok"
    assert all(r["rec_type"] in ("response", "_malformed") for r in recs2)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
        min_size=1,
        max_size=30,
    ),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_grouped_prefix_sum_fuzz_vs_serial(spark, rows, nparts):
    from log_analysis_spark.operators.mixing import grouped_prefix_sum

    df = spark.createDataFrame(
        [(g, i, v) for i, (g, v) in enumerate(rows)], "g string, i long, v long"
    )
    got = grouped_prefix_sum(df, "g", "i", "v", num_partitions=nparts).collect()
    acc: dict[str, int] = {}
    want = {}
    for i, (g, v) in enumerate(rows):
        want[i] = acc.get(g, 0)
        acc[g] = acc.get(g, 0) + v
    assert {r["i"]: r["offset"] for r in got} == want


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    texts=st.lists(
        st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=122), max_size=30),
        min_size=2,
        max_size=8,
    )
)
def test_classifier_deterministic_fuzz_vs_serial(spark, texts):
    """Deterministic-mode training is bit-exact vs the pure-Python serial
    replica on random corpora (labels alternate)."""
    from log_analysis_spark.operators.classify import train_linear_classifier
    from tests.test_classify import _serial_train

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = [(i, t, 1.0 if i % 2 == 0 else -1.0) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y double")
    w = train_linear_classifier(
        df, "y", n_buckets=16, iters=2, lr=0.05, hash_fn="md5",
        deterministic=True, unpersist_handles=[],
    )
    assert w == pytest.approx(_serial_train(rows, 16, 2, 0.05, h60), abs=0.0, rel=0.0)
