"""Generic HTML -> text extraction (boilerplate strip, entity decode).

The pipeline's own pages carry sentinel markers (synth spec), so
``functions/parse.py`` extracts payload text positionally. Real crawl
html has no markers — the standard first content step of a C4/CCNet-style
corpus is a structural strip: drop non-content subtrees (script/style/
comments), convert block boundaries to line breaks, drop the remaining
tags, decode the few entities that survive into text, and normalize
whitespace. This module is that stage, built so the OUTPUT feeds the
line-oriented cleaners directly (``quality.c4_line_filter`` consumes the
``\\n``-separated lines this emits).

Execution: the whole transform is ONE chain of native ``regexp_replace``
/ ``replace`` calls — JVM whole-stage codegen, zero Python, zero shuffle;
at 10^12 pages it runs entirely map-side inside the scan projection.

Determinism/oracle: the step list below is the single source of truth —
:func:`html_to_text` folds it into a Column and
:func:`html_to_text_oracle` folds the IDENTICAL patterns into a DuckDB
expression. Every regex is written in the common subset of Java regex and
RE2 (inline ``(?is)`` flags, lazy quantifiers, character classes — no
backrefs, no lookaround), so both engines replay byte-for-byte.

Scope caps (documented, not silent):
- a real HTML5 parser this is not — tags are recognized lexically, so
  pathological markup (unclosed ``<script>``, ``>`` inside attribute
  values) degrades gracefully rather than exactly;
- entity decode covers the named set a text extractor meets in practice
  (lt/gt/quot/apos/#39/nbsp/amp — amp LAST, the correct single-pass
  unescape so ``&amp;lt;`` yields the literal ``&lt;``); numeric
  ``&#NNN;`` forms other than ``&#39;`` are left as-is (decoding them
  needs a compute-from-match replacement no regex engine's replace
  primitive has — a ``mapInPandas`` variant would be the escape hatch,
  deliberately not the default hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tags whose open/close marks a block boundary -> line break.
_BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|tr|td|th|table|thead|tbody|blockquote"
    "|pre|title|section|article|header|footer|nav|aside|form|hr|br"
)

# Ordered (kind, pattern, replacement) steps; kind "re" = regex (global),
# "lit" = literal substring replace. THE contract — both engines fold it.
HTML_TEXT_STEPS: list[tuple[str, str, str]] = [
    # non-content subtrees first (their text must never surface)
    ("re", r"(?is)<script\b[^<>]*>.*?</script>", " "),
    ("re", r"(?is)<style\b[^<>]*>.*?</style>", " "),
    ("re", r"(?s)<!--.*?-->", " "),
    # block-tag boundaries (open or close) -> newline
    ("re", r"(?is)</?(?:" + _BLOCK_TAGS + r")\b[^<>]*>", "\n"),
    # every remaining tag -> space (inline tags must not glue words);
    # [^<>] (not [^>]) so a stray text '<' never swallows the words up
    # to the next real tag — the graceful-degradation contract
    ("re", r"(?s)<[^<>]*>", " "),
    # entity decode — amp LAST (single-pass unescape semantics)
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&#39;", "'"),
    ("lit", "&apos;", "'"),
    ("lit", "&nbsp;", " "),
    ("lit", "&amp;", "&"),
    # whitespace: horizontal runs -> one space; strip spaces around
    # newlines; newline runs -> one; trim the ends
    ("re", r"[ \t\r\f\x0B]+", " "),
    ("re", r" ?\n ?", "\n"),
    ("re", r"\n+", "\n"),
    ("re", r"^\s+|\s+$", ""),
]


def html_to_text(col: Column) -> Column:
    """Page html -> cleaned text with ``\\n`` block separators.

    NULL html -> NULL; a page with no textual content -> ``''``. Pure
    codegen (one projection); compose with ``quality.c4_line_filter``
    (line rules) and ``normalize.clean_text`` (pre-hash canonicalization)
    downstream.
    """
    out = col
    for kind, pat, repl in HTML_TEXT_STEPS:
        if kind == "re":
            out = F.regexp_replace(out, pat, repl)
        else:
            out = F.replace(out, F.lit(pat), F.lit(repl))
    return out


def html_to_text_oracle(expr: str) -> str:
    """DuckDB replay of :func:`html_to_text` over SQL ``expr`` — the same
    step list, regexp_replace with the 'g' flag (inline ``(?is)`` flags
    ride in the pattern so the pattern bytes are identical)."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    out = expr
    for kind, pat, repl in HTML_TEXT_STEPS:
        if kind == "re":
            out = f"regexp_replace({out}, {q(pat)}, {q(repl)}, 'g')"
        else:
            out = f"replace({out}, {q(pat)}, {q(repl)})"
    return out


# in-page directives: the tag is matched FIRST (attributes in any order,
# single or double quotes), then the attribute is pulled from the match —
# two-step extraction, so `<link href=.. rel=canonical>` and
# `<link rel=canonical href=..>` both work.
_CANONICAL_TAG_RX = (
    r"""(?is)<link\s[^<>]*rel\s*=\s*["']?canonical["']?[^<>]*>"""
)
_HREF_RX = r"""(?is)href\s*=\s*["']([^"'<>]+)["']"""
_HREF_UNQ_RX = r"""(?is)href\s*=\s*([^\s"'<>`=]+)"""
_ROBOTS_TAG_RX = r"""(?is)<meta\s[^<>]*name\s*=\s*["']?robots["']?[^<>]*>"""
_BASE_TAG_RX = r"""(?is)<base\s[^<>]*>"""
_CONTENT_RX = r"""(?is)content\s*=\s*["']([^"'<>]*)["']"""
_CONTENT_UNQ_RX = r"""(?is)content\s*=\s*([^\s"'<>`=]+)"""


def _tag_attr(tag: Column, quoted_rx: str, unquoted_rx: str) -> Column:
    """Attribute value from an already-extracted tag string: quoted form
    first, else the HTML unquoted-attribute form (no whitespace/quote/
    angle/backtick/equals chars — the spec's unquoted value charset),
    so minified real-world markup like ``<link rel=canonical href=/x>``
    or ``<meta name=robots content=noindex>`` extracts too. Empty
    string when neither matches (callers nullif)."""
    quoted = F.regexp_extract(tag, quoted_rx, 1)
    return F.when(quoted != F.lit(""), quoted).otherwise(
        F.regexp_extract(tag, unquoted_rx, 1)
    )
_TITLE_RX = r"(?is)<title>\s*(.*?)\s*</title>"


def page_directives(html: Column) -> Column:
    """In-page curation directives as ONE struct column:

    - ``canonical_href``: the ``<link rel="canonical">`` target (raw —
      often RELATIVE; compose ``parse.resolve_url(url, ...)`` against
      the fetched URL), NULL when absent. First tag wins, matching
      browser behavior for duplicate canonicals.
    - ``noindex`` / ``nofollow``: booleans from the robots meta tag's
      content list (``<meta name="robots" content="noindex, follow">``);
      both false when the tag is absent (index/follow is the default).
    - ``title``: the first ``<title>`` body, whitespace-trimmed, NULL
      when absent.
    - ``base_href``: the ``<base href>`` target when present — per the
      HTML spec it REPLACES the document URL as the resolution base for
      every relative reference on the page (itself resolved against the
      fetched URL first): the effective base is
      ``resolve_url(url, coalesce(base_href, url))`` and relative
      canonicals/anchors resolve against THAT.

    rel=canonical is the publisher's OWN dedup vote — a curation
    pipeline that ignores it keeps every print-view/AMP/session-id
    variant the crawler fetched; noindex is the in-page counterpart of
    robots.txt exclusion (RFC 9309 covers fetching, the meta tag covers
    indexing/corpus inclusion). Lexical extraction per this module's
    documented cap; pure codegen, zero shuffle."""
    base_tag = F.regexp_extract(html, _BASE_TAG_RX, 0)
    base_href = _tag_attr(base_tag, _HREF_RX, _HREF_UNQ_RX)
    canon_tag = F.regexp_extract(html, _CANONICAL_TAG_RX, 0)
    canon = _tag_attr(canon_tag, _HREF_RX, _HREF_UNQ_RX)
    robots_tag = F.regexp_extract(html, _ROBOTS_TAG_RX, 0)
    content = F.lower(_tag_attr(robots_tag, _CONTENT_RX, _CONTENT_UNQ_RX))
    title = F.regexp_extract(html, _TITLE_RX, 1)
    return F.struct(
        F.nullif(canon, F.lit("")).alias("canonical_href"),
        content.rlike("(^|[ ,])noindex([ ,]|$)").alias("noindex"),
        content.rlike("(^|[ ,])nofollow([ ,]|$)").alias("nofollow"),
        F.nullif(title, F.lit("")).alias("title"),
        F.nullif(base_href, F.lit("")).alias("base_href"),
    )


# --- JSON-LD structured data --------------------------------------------------
# schema.org JSON-LD is the dominant on-page structured-data carrier
# (<script type="application/ld+json">{...}</script>); a curation
# pipeline uses it for page typing (Product/Article/Recipe routing),
# metadata enrichment, and boilerplate-free titles. Extraction is one
# codegen regexp_extract_all (RE2-compatible: case-insensitive,
# dotall, non-greedy body) + JVM-side get_json_object — no Python.
_JSONLD_RX = (
    r"""(?is)<script[^<>]*type\s*=\s*["']application/ld\+json["']"""
    r"""[^<>]*>(.*?)</script>"""
)


def jsonld_blocks(html: Column) -> Column:
    """``array<string>`` of raw JSON-LD payloads in document order —
    empty array when the page carries none."""
    return F.regexp_extract_all(html, F.lit(_JSONLD_RX), 1)


def jsonld_entities(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """One row per JSON-LD block: (id, pos, jtype, jname) — ``jtype`` /
    ``jname`` are the block's ``@type`` / ``name`` members, NULL when
    the member is absent OR the block is malformed JSON
    (``get_json_object`` nulls out rather than failing the task — a
    crawl ALWAYS contains broken JSON-LD). Pages with no block drop
    (inner posexplode: an entity relation, not a page inventory).
    ``@type`` arrays come back as their raw JSON text (documented cap —
    callers route on scalar types).

    Scale shape: pure projection + generate, zero shuffle; the regex
    runs once per page and the JSON parse once per block."""
    return df.select(
        F.col(id_col),
        F.posexplode(jsonld_blocks(F.col(html_col))).alias("pos", "_b"),
    ).select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        F.get_json_object(F.col("_b"), "$['@type']").alias("jtype"),
        F.get_json_object(F.col("_b"), "$['name']").alias("jname"),
    )


# --- table extraction (WDC Web Table Corpus-style) ---------------------------
_TABLE_RX = r"(?is)<table\b[^>]*>.*?</table>"
_TR_RX = r"(?is)<tr\b[^>]*>.*?</tr>"
_CELL_RX = r"(?is)<t[dh]\b[^>]*>.*?</t[dh]>"


def _cell_text(cell: Column) -> Column:
    """Cell payload: strip every tag (incl. the td/th wrapper), collapse
    whitespace, trim — the WDC corpus's own cell normalization."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(cell, r"<[^>]*>", ""), r"\s+", " "
        )
    )


def extract_tables(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """Relational ``<table>`` extraction: one row per table row —
    ``(id, table_idx, row_idx, cells: array<string>)`` — the shape the
    WDC Web Table Corpus mines from Common Crawl (Lehmberg et al.,
    "A Large Public Corpus of Web Tables", WWW 2016 — public paper).

    Three nested lazy-regex extractions (tables → tr → td/th), each in
    the Java-regex/RE2 common subset so the oracle replays them; cell
    text is tag-stripped + whitespace-collapsed. Pure generate/projection
    chain — zero shuffle, zero Python; pages without a well-formed table
    drop (inner explode: a table relation, not a page inventory).

    Documented caps (lexical, not an HTML5 parser — same contract as
    html_to_text): unclosed ``<table>``/``<tr>`` elements don't match and
    are skipped; a literal ``>`` inside a quoted attribute truncates that
    tag's match; colspan/rowspan are not expanded (cells surface
    positionally).
    """
    tables = F.regexp_extract_all(F.col(html_col), F.lit(_TABLE_RX), 0)
    t = df.select(
        F.col(id_col), F.posexplode(tables).alias("table_idx", "_tbl")
    )
    rows = F.regexp_extract_all(F.col("_tbl"), F.lit(_TR_RX), 0)
    r = t.select(
        id_col,
        F.col("table_idx").cast("long").alias("table_idx"),
        F.posexplode(rows).alias("row_idx", "_tr"),
    )
    cells = F.transform(
        F.regexp_extract_all(F.col("_tr"), F.lit(_CELL_RX), 0),
        _cell_text,
    )
    return r.select(
        id_col,
        "table_idx",
        F.col("row_idx").cast("long").alias("row_idx"),
        cells.alias("cells"),
    )
