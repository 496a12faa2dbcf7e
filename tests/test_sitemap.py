"""Sitemap XML parsing semantics (sitemaps.org protocol)."""

from __future__ import annotations

import pytest

from log_analysis_spark.operators.sitemap import parse_sitemaps

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    "  <url>\n"
    "    <loc>\n      https://a.net/\n    </loc>\n"
    "    <lastmod>2024-07-01</lastmod>\n"
    "  </url>\n"
    "  <url><loc>https://a.net/p?x=1&amp;y=2</loc></url>\n"  # no lastmod
    "  <url><lastmod>2024-07-03</lastmod></url>\n"  # no loc -> dropped
    "  <url><loc>https://a.net/q&amp;amp;r</loc>"
    "<lastmod> 2024-07-04 </lastmod></url>\n"
    "</urlset>\n"
)

INDEX = (
    "<sitemapindex>"
    "<sitemap><loc>https://b.net/s1.xml</loc>"
    "<lastmod>2024-06-30</lastmod></sitemap>"
    "<sitemap><loc>https://b.net/s2.xml</loc></sitemap>"
    "</sitemapindex>"
)


@pytest.fixture()
def parsed(spark):
    df = spark.createDataFrame(
        [("a.net", URLSET), ("b.net", INDEX), ("c.net", "<urlset></urlset>")],
        "host string, sitemap_xml string",
    )
    return {
        tuple(r[:1]) + (r[4],): r
        for r in parse_sitemaps(df).orderBy("host", "entry_pos").collect()
    }


def test_urlset_entries(parsed):
    rows = [v for k, v in sorted(parsed.items()) if k[0] == "a.net"]
    assert [r.url for r in rows] == [
        "https://a.net/",  # whitespace-trimmed multi-line loc
        "https://a.net/p?x=1&y=2",  # entity-decoded
        "https://a.net/q&amp;r",  # single-level decode: &amp;amp; -> &amp;
    ]
    assert [r.lastmod for r in rows] == ["2024-07-01", None, "2024-07-04"]
    assert all(not r.from_index for r in rows)
    # the loc-less entry is dropped but later positions still count the
    # remaining entries in document order
    assert [r.entry_pos for r in rows] == [0, 1, 2]


def test_sitemapindex_entries(parsed):
    rows = [v for k, v in sorted(parsed.items()) if k[0] == "b.net"]
    assert [r.url for r in rows] == [
        "https://b.net/s1.xml",
        "https://b.net/s2.xml",
    ]
    assert [r.lastmod for r in rows] == ["2024-06-30", None]
    assert all(r.from_index for r in rows)
    # '</sitemapindex>' must NOT match the '</sitemap>' split alternative
    # (it would manufacture a phantom empty entry or eat the last one)


def test_empty_sitemap_yields_no_rows(parsed):
    assert not [v for k, v in parsed.items() if k[0] == "c.net"]
