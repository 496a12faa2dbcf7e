"""S4/S5 recast: vectorized field extraction over page html/text.

The reference parses per row, per line, re-splitting every line against every
field (/root/reference/src/zeek/zeek_log.rs:179-221, two full passes per file
at zeek_log.rs:157-160). Here extraction is either

- **native Column expressions** (JVM, whole-stage codegen) where regexps are
  expressible — the fast default for UTF-8-safe fields; or
- **Arrow-vectorized kernels** (``pyarrow.compute`` = C++ RE2 running over
  Arrow buffers) for byte-level fidelity over the ``html:binary`` column
  (the byte-identity invariant in BASELINE.json:input_hint) and for the
  multi-match grok event parse. The Python layer only orchestrates batches;
  per-row work is entirely C++ — "no per-row Python" as the north rule
  demands, and the Python-side CPU cost is near zero, which is what lets
  the pipeline scale with cores (a per-row Python loop would add ~1 busy
  Python core per JVM task thread).

Event extraction uses ``mapInArrow`` so the extract + explode happen in one
Arrow pass with zero pandas/pickle conversions of array<struct> payloads.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CONN_LIKE_SCHEMA

# sentinel markers shared with the synth spec (synth.py html template).
# RE2 syntax (pyarrow) and java.util.regex handle these identically.
TEXT_PATTERN = r"(?s)<!--BEGIN_TEXT-->(?P<t>.*?)<!--END_TEXT-->"
STATUS_PATTERN = r'<meta name="status" content="(?P<s>\d+)"/>'
EVENT_PATTERN = (
    r"^EV type=(?P<record_type>\w+) src=(?P<src>\S+) dst=(?P<dst>\S+) "
    r"sport=(?P<sport>\d+) dport=(?P<dport>\d+) bytes=(?P<bytes>\d+) "
    r"dur_ms=(?P<dur>\d+)$"
)
# Python-compiled twins for driver-side golden computation (tests/golden.py)
TEXT_RE_BYTES = re.compile(rb"<!--BEGIN_TEXT-->(.*?)<!--END_TEXT-->", re.DOTALL)
EVENT_RE = re.compile(EVENT_PATTERN.replace("(?s)", ""), re.MULTILINE)


def _as_arrow(series: pd.Series, want_binary: bool) -> pa.Array:
    arr = pa.Array.from_pandas(series)
    if want_binary and not pa.types.is_binary(arr.type) and not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.binary())
    return arr


# --- Arrow-vectorized extractors (byte-exact path) --------------------------
def _binary_to_string_or_null(payload: pa.Array) -> pa.Array:
    """binary -> string, nulling (not raising on) invalid-UTF-8 payloads.

    The fast path is one validated cast for the whole batch; only a batch
    that actually contains invalid UTF-8 pays the per-element fallback —
    corrupt pages are the rare exception in a CC-style corpus, and one bad
    row must not fail the task (the reference similarly never aborts a
    file on a bad line)."""
    try:
        return payload.cast(pa.string())
    except pa.ArrowInvalid:
        fixed = [
            None if b is None or not _valid_utf8(b) else b.decode("utf-8")
            for b in payload.to_pylist()
        ]
        return pa.array(fixed, type=pa.string())


def _valid_utf8(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


@F.pandas_udf(T.StringType())
def extract_text_udf(html: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Byte-exact payload extraction from html:binary.

    RE2 runs directly over the binary Arrow buffer (no decode before the
    match, so invalid-UTF-8 surroundings can't corrupt the slice); the
    matched bytes are then cast to string — invalid-UTF-8 payloads become
    NULL instead of failing the task. Zero Python per row on the fast path.
    """
    for batch in html:
        arr = _as_arrow(batch, want_binary=True)
        m = pc.extract_regex(arr, TEXT_PATTERN)
        out = _binary_to_string_or_null(pc.struct_field(m, "t"))
        yield out.to_pandas()


@F.pandas_udf(T.IntegerType())
def extract_status_udf(html: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in html:
        arr = _as_arrow(batch, want_binary=True)
        m = pc.extract_regex(arr, STATUS_PATTERN)
        out = pc.struct_field(m, "s").cast(pa.string()).cast(pa.int32())
        yield out.to_pandas()


def extract_events_arrow(pages: DataFrame) -> DataFrame:
    """Grok parse of event lines -> typed conn-like rows via ``mapInArrow``.

    One Arrow pass per batch: split text into lines (C++), flatten with
    parent indices, RE2-extract the 7 fields, keep matching lines, and
    gather the parent row's (url, ts_bucket, lang) by index — extract and
    explode fused, no array<struct> ever materialized, no pandas objects.
    Replaces the reference's per-line split+zip (zeek_log.rs:179-188).
    """
    src = pages.select(
        "url",
        F.date_trunc("hour", F.col("warc_ts")).alias("ts_bucket"),
        "lang",
        "text",
    )

    def _batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in it:
            text = rb.column(rb.schema.get_field_index("text"))
            lines = pc.split_pattern(text, "\n")
            flat = pc.list_flatten(lines)
            parents = pc.list_parent_indices(lines)
            m = pc.extract_regex(flat, EVENT_PATTERN)
            sel = pc.indices_nonzero(pc.is_valid(m))
            m2 = m.take(sel)
            rows = parents.take(sel)

            def col(name: str) -> pa.Array:
                return rb.column(rb.schema.get_field_index(name)).take(rows)

            def grp(name: str) -> pa.Array:
                return pc.struct_field(m2, name)

            yield pa.RecordBatch.from_arrays(
                [
                    col("url"),
                    grp("record_type").cast(pa.string()),
                    grp("src").cast(pa.string()),
                    grp("dst").cast(pa.string()),
                    grp("sport").cast(pa.string()).cast(pa.int32()),
                    grp("dport").cast(pa.string()).cast(pa.int32()),
                    grp("bytes").cast(pa.string()).cast(pa.int64()),
                    grp("dur").cast(pa.string()).cast(pa.int64()),
                    col("ts_bucket"),
                    col("lang"),
                ],
                names=[
                    "url", "record_type", "id_orig_h", "id_resp_h", "orig_p",
                    "resp_p", "bytes", "duration_ms", "ts_bucket", "lang",
                ],
            )

    return src.mapInArrow(_batches, schema=CONN_LIKE_SCHEMA)


# --- native variants (JVM codegen; used where byte fidelity permits) --------
def extract_text_native(html: Column) -> Column:
    """Native regexp over the UTF-8 decode of html. Stays in codegen."""
    return F.nullif(
        F.regexp_extract(
            F.decode(html, "UTF-8"), r"(?s)<!--BEGIN_TEXT-->(.*?)<!--END_TEXT-->", 1
        ),
        F.lit(""),
    )


def extract_status_native(html: Column) -> Column:
    return F.nullif(
        F.regexp_extract(
            F.decode(html, "UTF-8"), r'<meta name="status" content="(\d+)"/>', 1
        ),
        F.lit(""),
    ).cast("int")


def host_of(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def path_of(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


# --- record builders ---------------------------------------------------------
def parse_http_like(pages: DataFrame, byte_exact: bool = True) -> DataFrame:
    """pages -> http_like typed records (FIXTURES.md §3).

    ``byte_exact=True`` routes ALL html-derived extraction through Arrow
    RE2 kernels on raw bytes (a page with invalid UTF-8 outside the
    extracted fields parses fine; JVM ``decode`` would throw).
    ``False`` uses the pure-JVM path — same result for valid-UTF-8
    corpora, no Python process at all (measured in bench).
    """
    if byte_exact:
        text_col = extract_text_udf("html")
        status_col = extract_status_udf("html")
    else:
        text_col = extract_text_native(F.col("html"))
        status_col = extract_status_native(F.col("html"))
    return pages.select(
        F.col("url"),
        host_of(F.col("url")).alias("host"),
        path_of(F.col("url")).alias("path"),
        status_col.alias("status_like"),
        F.date_trunc("hour", F.col("warc_ts")).alias("ts_bucket"),
        text_col.alias("extracted_text"),
        F.col("lang"),
    )


def parse_conn_like(pages: DataFrame, vectorized: bool = True) -> DataFrame:
    """pages -> exploded conn_like typed records.

    ``vectorized=True``: the fused Arrow extract+explode (one C++ pass).
    ``vectorized=False``: fully native — split lines, filter the EV prefix,
    regexp_extract each field (7 regexps/line but zero Python).
    """
    if vectorized:
        return extract_events_arrow(pages)
    line = F.explode(
        F.filter(F.split(F.col("text"), "\n"), lambda x: x.startswith("EV "))
    ).alias("line")
    ev = pages.select(
        "url",
        F.date_trunc("hour", F.col("warc_ts")).alias("ts_bucket"),
        "lang",
        line,
    )
    g = lambda i: F.regexp_extract(  # noqa: E731
        F.col("line"),
        r"^EV type=(\w+) src=(\S+) dst=(\S+) sport=(\d+) dport=(\d+) bytes=(\d+) dur_ms=(\d+)$",
        i,
    )
    return ev.select(
        "url",
        F.nullif(g(1), F.lit("")).alias("record_type"),
        F.nullif(g(2), F.lit("")).alias("id_orig_h"),
        F.nullif(g(3), F.lit("")).alias("id_resp_h"),
        g(4).cast("int").alias("orig_p"),
        g(5).cast("int").alias("resp_p"),
        g(6).cast("long").alias("bytes"),
        g(7).cast("long").alias("duration_ms"),
        "ts_bucket",
        "lang",
    ).filter(F.col("record_type").isNotNull())  # drop non-matching lines, same as the Arrow path


def canonical_url(url: Column) -> Column:
    """Crawl-style URL canonicalization — the url-keyed dedup key a web
    corpus computes before content dedup (url dedup removes ~40% of raw
    Common-Crawl fetches before any text is compared):

      1. strip the fragment,
      2. lowercase scheme and host (ONLY those — path/query are
         case-significant),
      3. drop the scheme's default port (:80 http, :443 https),
      4. empty path -> '/',
      5. sort query parameters (full 'k=v' strings, duplicates kept) and
         drop an empty query.

    Pure native Column expressions over anchored basic regexes (char
    classes + groups only — identical semantics in Java regex and RE2,
    so the DuckDB oracle replays byte-for-byte). Non-absolute or
    non-authority URLs pass through with just the fragment stripped —
    canonicalization must never destroy a key it does not understand.
    """
    u = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:/?]+://([^/?]*)", 1))
    hostport = F.when(
        (scheme == "http"), F.regexp_replace(hostport, ":80$", "")
    ).when(
        (scheme == "https"), F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    path = F.regexp_extract(u, r"^[^:/?]+://[^/?]*(/[^?]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?(.*)$", 1)
    q_sorted = F.concat_ws(
        "&", F.array_sort(F.filter(F.split(q, "&"), lambda x: x != ""))
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(q_sorted != "", F.concat(F.lit("?"), q_sorted)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def _remove_dot_segments(p: Column) -> Column:
    """RFC 3986 §5.2.4 over a '/'-leading path: one ``aggregate`` fold
    over the '/'-split segments ('.' skipped, '..' pops — never past the
    leading root marker), plus the spec's trailing-slash rule (a path
    ENDING in '.' or '..' resolves to a directory). Pure expressions;
    the fold state is the segment array, bounded by the path itself."""
    segs = F.split(p, "/")
    acc = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda a, s: (
            F.when(s == ".", a)
            .when(
                s == "..",
                F.when(F.size(a) > 1, F.slice(a, 1, F.size(a) - 1)).otherwise(a),
            )
            .otherwise(F.concat(a, F.array(s)))
        ),
    )
    trail = F.when(
        F.element_at(segs, -1).isin(".", ".."), F.lit("/")
    ).otherwise(F.lit(""))
    return F.concat(F.concat_ws("/", acc), trail)


def resolve_url(base: Column, href: Column) -> Column:
    """RFC 3986 §5.2 reference resolution (STRICT variant) — the step a
    crawl frontier needs between href extraction and canonicalization:
    relative links only mean something against the page they appear on.

    Contract: ``base`` is an absolute hierarchical URL
    (``scheme://authority[/path][?query]``, the pages-table shape); the
    reference may be any of the spec's forms — absolute (returned
    verbatim, strict: ``http:g`` stays ``http:g``), network-path
    (``//host/..``), absolute-path, query-only, fragment-only/empty,
    or relative-path (merged with the base directory, dot segments
    removed per §5.2.4). Fragments are preserved (downstream
    ``canonical_url`` strips them). NULL base or href -> NULL.

    All native expressions — regex decomposition + one array fold —
    zero shuffle, codegen-friendly; tests pin EVERY §5.4 normal and
    abnormal example plus a hypothesis sweep against
    ``urllib.parse.urljoin`` (scheme-ful refs excluded there: urljoin
    implements the spec's non-strict option for same-scheme refs).
    """
    b = F.regexp_replace(base, "#.*$", "")
    b_scheme = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    b_auth = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    b_path = F.regexp_extract(b, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)

    h_frag = F.regexp_extract(href, "(#.*)$", 1)
    h_nf = F.regexp_replace(href, "#.*$", "")
    h_query = F.regexp_extract(h_nf, r"(\?.*)$", 1)
    h_path = F.regexp_replace(h_nf, r"\?.*$", "")

    has_scheme = h_nf.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
    net_auth = F.regexp_extract(h_path, "^(//[^/?#]*)", 1)
    net_path = F.regexp_extract(h_path, "^//[^/?#]*(.*)$", 1)
    merged = F.when(b_path == "", F.concat(F.lit("/"), h_path)).otherwise(
        F.concat(F.regexp_replace(b_path, "[^/]*$", ""), h_path)
    )
    resolved = (
        F.when(has_scheme, href)
        .when(
            h_path.startswith("//"),
            F.concat(
                b_scheme, F.lit(":"), net_auth,
                _remove_dot_segments(net_path), h_query, h_frag,
            ),
        )
        .when(
            h_path.startswith("/"),
            F.concat(b_auth, _remove_dot_segments(h_path), h_query, h_frag),
        )
        .when((h_path == "") & (h_query != ""), F.concat(b_auth, b_path, h_query, h_frag))
        .when(h_path == "", F.concat(b, h_frag))
        .otherwise(F.concat(b_auth, _remove_dot_segments(merged), h_query, h_frag))
    )
    return F.when(base.isNotNull() & href.isNotNull(), resolved)


def normalize_pct(url: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization — the equivalence
    class canonical_url cannot see: ``%7Eu`` and ``~u`` are the SAME
    resource, and real crawls fetch both. Two spec rules in one fold
    over the '%'-split pieces:

    - §6.2.2.2: a triplet encoding an UNRESERVED char (ALPHA / DIGIT /
      '-' '.' '_' '~') decodes to the char;
    - §6.2.2.1: any other valid triplet uppercases its hex digits
      (``%2f`` -> ``%2F``).

    Malformed escapes ('%' not followed by two hex digits, or a
    trailing '%') pass through byte-identical — normalization must
    never destroy what it does not understand (same contract as
    canonical_url). Compose ``canonical_url(normalize_pct(url))`` for
    the full dedup key. Pure expressions (split + one aggregate fold +
    conv/chr); the fold state is the string itself — zero shuffle."""
    parts = F.split(url, "%", -1)
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def step(acc: Column, piece: Column) -> Column:
        hex2 = F.upper(F.substring(piece, 1, 2))
        valid = hex2.rlike("^[0-9A-F]{2}$")
        code = F.conv(hex2, 16, 10).cast("int")
        unreserved = (
            ((code >= 65) & (code <= 90))
            | ((code >= 97) & (code <= 122))
            | ((code >= 48) & (code <= 57))
            | code.isin(45, 46, 95, 126)
        )
        tail = F.substring(piece, 3, 2147483647)
        return F.concat(
            acc,
            F.when(valid & unreserved, F.concat(F.chr(code), tail))
            .when(valid, F.concat(F.lit("%"), hex2, tail))
            .otherwise(F.concat(F.lit("%"), piece)),
        )

    return F.aggregate(rest, F.element_at(parts, 1), step)


# the standard cross-site tracking params every crawl canonicalizer drops:
# Google Analytics utm_*, plus the click-id params ad platforms append
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref_src")


def strip_tracking_params(
    url: Column,
    prefixes: tuple[str, ...] = TRACKING_PREFIXES,
    exact: tuple[str, ...] = TRACKING_EXACT,
) -> Column:
    """Drop tracking query parameters — the third URL-dup generator
    after percent-encoding and param order: ``/p?utm_source=x&id=1`` and
    ``/p?id=1`` are the same resource. Splits the query on '&', keeps a
    parameter unless its KEY (the part before '=', or the whole param)
    matches a tracking prefix or exact name (case-insensitive); a query
    left empty drops its '?'. Fragment-free input expected (compose
    after canonical_url, which strips fragments; full dedup key =
    ``strip_tracking_params(canonical_url(normalize_pct(url)))``).
    Non-URL rows and URLs without a query pass through byte-identical.
    Pure expressions (one split + filter + rebuild), zero shuffle."""
    head = F.regexp_extract(url, r"^([^?]*)\?", 1)
    q = F.regexp_extract(url, r"^[^?]*\?(.*)$", 1)

    def keep(p: Column) -> Column:
        key = F.lower(F.regexp_extract(p, "^([^=]*)", 1))
        bad = F.lit(False)
        for pre in prefixes:
            bad = bad | key.startswith(pre.lower())
        for name in exact:
            bad = bad | (key == name.lower())
        return ~bad

    kept = F.concat_ws("&", F.filter(F.split(q, "&"), keep))
    rebuilt = F.concat(
        head, F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit(""))
    )
    return F.when(url.rlike(r"\?"), rebuilt).otherwise(url)


def surt_key(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform — the key Common Crawl's
    CDX(J) URL index sorts by (public spec: Internet Archive / pywb
    "SURT"; CC's cc-index files are SURT-ordered so one host's, one
    domain's, or one TLD's captures are a contiguous key range).

    ``http://www.Example.com:8080/A/b?b=2&a=1#f`` ->
    ``com,example:8080)/a/b?a=1&b=2``

      1. fragment stripped,
      2. scheme dropped, host lowercased, default port dropped
         (:80 http, :443 https), non-default port kept,
      3. leading ``www.`` stripped (the IA canonicalizer's convention),
      4. host labels REVERSED and joined with commas (the sort trick:
         subdomains of a domain share a prefix),
      5. ``)`` separator, then path and query lowercased (CDX "massaged
         url" convention), empty path -> ``/``, query params sorted,
         empty query dropped.

    Pure native Column expressions over the same anchored basic regexes
    as :func:`canonical_url` (identical Java-regex/RE2 semantics, so the
    DuckDB oracle replays byte-for-byte). Non-authority URLs fall back
    to the lowercased fragment-stripped input — a sort key must never be
    NULL for a row the index owns.
    """
    u = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:/?]+://([^/?]*)", 1))
    hostport = F.when(
        (scheme == "http"), F.regexp_replace(hostport, ":80$", "")
    ).when(
        (scheme == "https"), F.regexp_replace(hostport, ":443$", "")
    ).otherwise(hostport)
    host = F.regexp_replace(hostport, ":[0-9]*$", "")
    port = F.regexp_extract(hostport, r"(:[0-9]*)$", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    revhost = F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    path = F.lower(F.regexp_extract(u, r"^[^:/?]+://[^/?]*(/[^?]*)?", 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.lower(F.regexp_extract(u, r"\?(.*)$", 1))
    q_sorted = F.concat_ws(
        "&", F.array_sort(F.filter(F.split(q, "&"), lambda x: x != ""))
    )
    key = F.concat(
        revhost,
        port,
        F.lit(")"),
        path,
        F.when(q_sorted != "", F.concat(F.lit("?"), q_sorted)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", F.lower(u)).otherwise(key)


# ---------------------------------------------------------------------------
# user-agent classification (http_like enrichment)
# ---------------------------------------------------------------------------
# (needle, family, is_bot) in PRIORITY ORDER — the order IS the contract:
# bots/tools before browsers (Googlebot's UA contains 'Safari'), Edg/OPR
# before Chrome (Chromium derivatives embed 'Chrome/'), Chrome before
# Safari (Chrome embeds 'Safari/'). A DuckDB CASE chain over the same
# ordered LIKE tests replays classification exactly.
UA_RULES: list[tuple[str, str, bool]] = [
    ("Googlebot", "googlebot", True),
    ("bingbot", "bingbot", True),
    ("curl/", "curl", True),
    ("Wget", "wget", True),
    ("python-requests", "python-requests", True),
    ("Edg/", "edge", False),
    ("OPR/", "opera", False),
    ("Chrome/", "chrome", False),
    ("Safari/", "safari", False),
    ("Firefox/", "firefox", False),
    ("Trident/", "ie", False),
    ("MSIE ", "ie", False),
]


def ua_family(ua: Column) -> Column:
    """Browser/tool family from a User-Agent string: first matching
    needle in ``UA_RULES`` order wins; no match -> 'other', NULL/empty ->
    'unknown'. Pure codegen contains-chain, zero shuffle — the standard
    http-log enrichment next to the TLD/lang dims."""
    expr = F.lit("other")
    for needle, fam, _bot in reversed(UA_RULES):
        expr = F.when(ua.contains(needle), F.lit(fam)).otherwise(expr)
    return F.when(ua.isNull() | (ua == ""), F.lit("unknown")).otherwise(expr)


def ua_is_bot(ua: Column) -> Column:
    """True iff the FIRST matching rule is a bot/tool rule — consistent
    with ``ua_family`` by construction (same ordered chain)."""
    expr = F.lit(False)
    for needle, _fam, bot in reversed(UA_RULES):
        expr = F.when(ua.contains(needle), F.lit(bot)).otherwise(expr)
    return F.when(ua.isNull() | (ua == ""), F.lit(False)).otherwise(expr)
