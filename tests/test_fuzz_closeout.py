"""Fuzz hardening for the closeout crawl operators: the sitemap parser
must recover ARBITRARY well-formed entry lists (random whitespace
padding, optional lastmod, entity-escaped URLs, urlset vs sitemapindex)
exactly as constructed, and redirect resolution must match a serial
pure-Python chain walker on random functional graphs (chains, trees
into chains, cycles, self-loops, over-cap chains)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from log_analysis_spark.operators.redirects import resolve_redirects
from log_analysis_spark.operators.sitemap import parse_sitemaps

_PATH = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)
_ENTRY = st.tuples(
    _PATH,
    st.one_of(st.none(), st.dates().map(lambda d: d.isoformat())),  # lastmod
    st.booleans(),  # whitespace padding around <loc>
    st.booleans(),  # append an entity-escaped query string
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.tuples(st.booleans(), st.lists(_ENTRY, max_size=4)), min_size=1, max_size=4
    )
)
def test_sitemap_parse_recovers_constructed_entries(spark, docs):
    rows, expected = [], []
    for i, (is_index, entries) in enumerate(docs):
        host = f"h{i}.example.net"
        tag, root = ("sitemap", "sitemapindex") if is_index else ("url", "urlset")
        body = [f"<{root}>"]
        for pos, (path, lastmod, pad, esc) in enumerate(entries):
            url = f"https://{host}/{path}" + ("?a=1&b=2" if esc else "")
            xml_url = url.replace("&", "&amp;")
            loc = f"\n  {xml_url}\n " if pad else xml_url
            lm = f"<lastmod> {lastmod} </lastmod>" if lastmod else ""
            body.append(f"<{tag}><loc>{loc}</loc>{lm}</{tag}>")
            expected.append((host, url, lastmod, is_index, pos))
        body.append(f"</{root}>")
        rows.append((host, "".join(body)))
    sdf = spark.createDataFrame(rows, "host string, sitemap_xml string")
    got = [
        (r.host, r.url, r.lastmod, r.from_index, r.entry_pos)
        for r in parse_sitemaps(sdf).collect()
    ]
    # multiset compare — lastmod may be None, so tuple sort would raise
    # TypeError (None < str) when two entries share host+path
    from collections import Counter

    assert Counter(got) == Counter(expected)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    edges=st.dictionaries(
        st.integers(min_value=0, max_value=11),
        st.integers(min_value=0, max_value=11),
        min_size=1,
        max_size=12,
    ),
    max_hops=st.integers(min_value=2, max_value=8),
)
def test_redirects_match_serial_walker(spark, edges, max_hops):
    def walk(u):
        cur, hops = u, 0
        while cur in edges and hops <= max_hops:
            cur, hops = edges[cur], hops + 1
        if cur in edges or hops > max_hops:  # still redirecting, or over cap
            return (None, None, True)
        return (f"n{cur}", hops, False)

    expected = {f"n{u}": walk(u) for u in edges}
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {"url": [f"n{u}" for u in edges], "redirect_to": [f"n{v}" for v in edges.values()]}
        )
    )
    got = {
        r.url: (r.final_url, r.n_hops, r.unresolved)
        for r in resolve_redirects(sdf, max_hops=max_hops).collect()
    }
    assert got == expected
