"""RFC 3986 §5.2 reference resolution: the spec's OWN §5.4 test vectors
(every normal and abnormal example, strict variant), plus a hypothesis
sweep against urllib.parse.urljoin on scheme-less references (where the
strict/non-strict variants agree)."""

from __future__ import annotations

from urllib.parse import urljoin

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from log_analysis_spark.functions.parse import resolve_url

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 (normal) + §5.4.2 (abnormal), strict variant
VECTORS = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g?y/./x", "http://a/b/c/g?y/./x"),
    ("g?y/../x", "http://a/b/c/g?y/../x"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
    ("http:g", "http:g"),  # STRICT: scheme-ful stays verbatim
]


def _resolve_all(spark, base, hrefs):
    df = spark.createDataFrame([(base, h) for h in hrefs], "b string, h string")
    rows = df.select(
        "h", resolve_url(F.col("b"), F.col("h")).alias("r")
    ).collect()
    return {r.h: r.r for r in rows}


def test_rfc3986_section_5_4_vectors(spark):
    got = _resolve_all(spark, BASE, [h for h, _ in VECTORS])
    bad = [(h, got[h], want) for h, want in VECTORS if got[h] != want]
    assert not bad, f"mismatches: {bad}"


def test_null_propagation(spark):
    df = spark.createDataFrame([(None, "g"), (BASE, None)], "b string, h string")
    assert [r[0] for r in df.select(resolve_url(F.col("b"), F.col("h"))).collect()] == [
        None,
        None,
    ]


# ';' excluded: CPython's urljoin keeps RFC 1808's params special-casing
# (urljoin(BASE, ';') returns the base unchanged) where RFC 3986 treats
# ';' as an ordinary path segment — our ';x' §5.4 vector pins the
# RFC-3986 behavior, so the sweep must not re-assert the legacy one.
_HREF = st.text(alphabet="abg./?&=%-_~#", max_size=12)


import re


def _repr_quirk(h: str) -> bool:
    # urlunsplit DROPS the delimiter of a defined-but-empty query or
    # fragment ('g?' -> no '?', 'g#' -> no '#'); urljoin falls back to
    # the base for an EMPTY-authority network ref ('//', '///g'); and
    # CPython 3.11's urljoin COLLAPSES empty path segments ('a//b' ->
    # 'a/b') where RFC 3986 remove_dot_segments preserves them (so does
    # WHATWG). All urljoin-side deviations — skip those refs here.
    path = h.split("#", 1)[0].split("?", 1)[0]
    return (
        h.split("#", 1)[0].endswith("?")
        or h.endswith("#")
        or re.match(r"^//(?:[/?#]|$)", h) is not None
        or (not path.startswith("//") and "//" in path)
        or (path.startswith("//") and "//" in path[2:].split("/", 1)[-1])
    )


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(hrefs=st.lists(_HREF, min_size=1, max_size=8))
def test_matches_urljoin_on_schemeless_refs(spark, hrefs):
    keep = [h for h in set(hrefs) if not _repr_quirk(h)]
    if not keep:
        return
    got = _resolve_all(spark, BASE, keep)
    for h, r in got.items():
        assert r == urljoin(BASE, h), f"href={h!r}: spark={r!r} urljoin={urljoin(BASE, h)!r}"
