"""Percent-encoding normalization (RFC 3986 §6.2.2): pinned cases plus a
hypothesis sweep against an independent regex-based Python reference
(the operator is a split+fold — different formulation, same spec)."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from log_analysis_spark.functions.parse import normalize_pct

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _ref(u: str) -> str:
    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return re.sub(r"%([0-9A-Fa-f]{2})", repl, u)


CASES = [
    ("http://a/%7eu", "http://a/~u"),  # unreserved decodes
    ("%41bc", "Abc"),
    ("a%2fb", "a%2Fb"),  # reserved stays encoded, hex uppercased
    ("a%e9x", "a%E9x"),  # non-ASCII octet stays encoded
    ("a%zzb", "a%zzb"),  # malformed passes through
    ("a%", "a%"),
    ("%", "%"),
    ("plain", "plain"),
    ("%41%42", "AB"),
    ("a%%41", "a%A"),  # first '%' malformed, second decodes
]


def _norm_all(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return {r.u: r.n for r in df.select("u", normalize_pct(F.col("u")).alias("n")).collect()}


def test_pinned_cases(spark):
    got = _norm_all(spark, [u for u, _ in CASES])
    assert [(u, got[u]) for u, _ in CASES] == CASES
    # the reference implementation agrees on every pinned case too
    assert all(_ref(u) == want for u, want in CASES)


def test_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "u string")
    assert df.select(normalize_pct(F.col("u"))).collect()[0][0] is None


_URLISH = st.text(alphabet="ab7E4 %fFzZ19./~-", max_size=16)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(urls=st.lists(_URLISH, min_size=1, max_size=8))
def test_matches_regex_reference(spark, urls):
    got = _norm_all(spark, list(set(urls)))
    for u, n in got.items():
        assert n == _ref(u), f"url={u!r}: spark={n!r} ref={_ref(u)!r}"


# --- tracking-parameter stripping (same URL-dedup family) ---

from log_analysis_spark.functions.parse import strip_tracking_params

STRIP_CASES = [
    ("http://a/p?utm_source=x&id=1", "http://a/p?id=1"),
    ("http://a/p?id=1&UTM_Medium=e", "http://a/p?id=1"),  # case-insensitive
    ("http://a/p?fbclid=abc", "http://a/p"),  # query emptied -> '?' dropped
    ("http://a/p?gclid", "http://a/p"),  # bare key, no '='
    ("http://a/p?id=1&x=utm_source", "http://a/p?id=1&x=utm_source"),  # VALUE not key
    ("http://a/p?utm=1", "http://a/p?utm=1"),  # 'utm' alone is not 'utm_*'
    ("http://a/p", "http://a/p"),  # no query untouched
    ("not a url", "not a url"),
]


def test_strip_tracking_params(spark):
    df = spark.createDataFrame([(u,) for u, _ in STRIP_CASES], "u string")
    got = {
        r.u: r.s
        for r in df.select(
            "u", strip_tracking_params(F.col("u")).alias("s")
        ).collect()
    }
    assert [(u, got[u]) for u, _ in STRIP_CASES] == STRIP_CASES
