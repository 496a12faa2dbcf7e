"""Sitemap XML parsing (sitemaps.org protocol).

The crawl-seeding step between robots.txt and the fetch frontier: robots
``Sitemap:`` lines (operators/robots.py ``sitemaps``) name sitemap
documents; THIS operator parses those documents' XML bodies into URL
rows. Two shapes per the protocol: ``<urlset>`` files whose ``<url>``
entries carry ``<loc>`` (required) and ``<lastmod>`` (optional), and
``<sitemapindex>`` files whose ``<sitemap>`` entries point at further
sitemap files (flagged ``from_index`` so a driver loop can fetch and
re-parse them).

Reference behavior mirrored: the reference pipeline has no sitemap stage
(crawl seeding is out of its Zeek scope); this extends the crawl-side
operator family (robots.py, frontier.py) that the north star's
Common-Crawl-style corpus needs.

Scale design: entirely native expressions — one ``split`` on the entry
close tags, a ``transform`` + ``filter`` over the resulting array, one
``posexplode``. Per-row state is O(sitemap bytes); nothing shuffles (the
explode is map-side), so parsing 10^8 sitemap documents is a single
scan-shaped stage.

Spec fidelity and caps:

- entry extraction is tag-driven (``</url>`` / ``</sitemap>`` block
  splits; ``</sitemapindex>`` does NOT match the ``</sitemap>``
  alternative — the regex requires the closing ``>``), so entry-local
  pairing of ``<loc>`` and ``<lastmod>`` is exact even when entries
  interleave presence/absence of ``lastmod``;
- values are whitespace-trimmed (the protocol explicitly allows
  ``<loc>`` content on its own line) and XML-entity-decoded
  (``&lt; &gt; &quot; &apos;`` first, ``&amp;`` last — single-level
  decode, so ``&amp;lt;`` becomes the literal ``&lt;``); URLs in
  sitemaps MUST be entity-escaped per the protocol;
- CDATA sections and namespaced tags (``<ns:loc>``) are out of contract
  (documented cap — both are vanishingly rare in real sitemaps and the
  protocol's own examples use plain tags);
- a body with no extractable entries yields zero rows (explode drops
  empty arrays), matching "empty sitemap allows nothing to be seeded".

Determinism/oracle: split / regexp_extract (char-class-only patterns) /
trim-by-regex / ordered entity replace chain / posexplode are all
replayed verbatim by DuckDB (``regexp_split_to_array`` /
``regexp_extract`` / ``regexp_replace(..., 'g')`` / ``replace`` /
``unnest`` + ``generate_subscripts``), so the gate query is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared regex literals (Java-regex/RE2 common subset; the oracle reuses
# them verbatim — NOTE the oracle's regexp_replace needs the 'g' flag,
# DuckDB defaults to first-match-only)
BLOCK_SPLIT_RX = "</url>|</sitemap>"
LOC_RX = "<loc>([^<]*)</loc>"
LASTMOD_RX = "<lastmod>([^<]*)</lastmod>"
WS_TRIM_RX = r"^[ \t\r\n]+|[ \t\r\n]+$"

# single-level XML entity decode; '&amp;' LAST so escaped entities decode
# to their literal text, not recursively
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")]


def _clean(c: Column) -> Column:
    c = F.regexp_replace(c, WS_TRIM_RX, "")
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def parse_sitemaps(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Parse sitemap XML bodies into one row per entry.

    Input: one row per sitemap document with ``host_col`` (carried
    through for frontier grouping) and ``xml_col`` (the raw XML text).

    Output: ``(host, url, lastmod, from_index, entry_pos)`` —
    ``lastmod`` is NULL when the entry has none, ``from_index`` is true
    when the document is a ``<sitemapindex>`` (so ``url`` names another
    sitemap to fetch, not a page), ``entry_pos`` is the 0-based document
    order of the entry.
    """
    xml = F.col(xml_col)
    entries = F.filter(
        F.transform(
            F.split(xml, BLOCK_SPLIT_RX),
            lambda p: F.struct(
                _clean(F.regexp_extract(p, LOC_RX, 1)).alias("url"),
                _clean(F.regexp_extract(p, LASTMOD_RX, 1)).alias("lastmod"),
            ),
        ),
        lambda e: e["url"] != "",
    )
    return df.select(
        F.col(host_col).alias("host"),
        (F.instr(xml, "<sitemapindex") > 0).alias("from_index"),
        F.posexplode(entries).alias("entry_pos", "_e"),
    ).select(
        "host",
        F.col("_e.url").alias("url"),
        F.nullif(F.col("_e.lastmod"), F.lit("")).alias("lastmod"),
        "from_index",
        F.col("entry_pos").cast("long").alias("entry_pos"),
    )
