"""S4/S5 recast: vectorized field extraction over page html/text.

The reference parses per row, per line, re-splitting every line against every
field (/root/reference/src/zeek/zeek_log.rs:179-221, two full passes per file
at zeek_log.rs:157-160). Here extraction is either

- **native Column expressions** (JVM, whole-stage codegen) where regexps are
  expressible — the fast default; or
- **Arrow-vectorized pandas UDFs** with regexes compiled once per batch
  iterator (never per row) — used where byte-level fidelity over the
  ``html:binary`` column is required (the byte-identity invariant in
  BASELINE.json:input_hint) and for the multi-group grok event parse.

No per-row Python anywhere.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EVENT_STRUCT

# sentinel markers shared with the synth spec (synth.py html template)
TEXT_RE_BYTES = re.compile(rb"<!--BEGIN_TEXT-->(.*?)<!--END_TEXT-->", re.DOTALL)
STATUS_RE_BYTES = re.compile(rb'<meta name="status" content="(\d+)"/>')
# grok pattern for the Zeek-style event lines embedded in page text
EVENT_RE = re.compile(
    r"^EV type=(?P<record_type>\w+) src=(?P<src>\S+) dst=(?P<dst>\S+) "
    r"sport=(?P<sport>\d+) dport=(?P<dport>\d+) bytes=(?P<bytes>\d+) "
    r"dur_ms=(?P<dur>\d+)$",
    re.MULTILINE,
)


# --- Arrow-vectorized extractors (byte-exact path) --------------------------
@F.pandas_udf(T.StringType())
def extract_text_udf(html: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Byte-exact payload extraction from html:binary.

    Operates on raw bytes (never lets pandas re-encode) and decodes the
    exact matched slice — the invariant tested bytewise per url.
    """
    pat = TEXT_RE_BYTES  # compiled once per executor batch-iterator

    def _one(b) -> str | None:
        if b is None:
            return None
        m = pat.search(bytes(b))
        return m.group(1).decode("utf-8") if m else None

    for batch in html:
        yield batch.map(_one)


@F.pandas_udf(T.IntegerType())
def extract_status_udf(html: Iterator[pd.Series]) -> Iterator[pd.Series]:
    pat = STATUS_RE_BYTES

    def _one(b):
        if b is None:
            return None
        m = pat.search(bytes(b))
        return int(m.group(1)) if m else None

    for batch in html:
        yield batch.map(_one).astype("Int32")


@F.pandas_udf(T.ArrayType(EVENT_STRUCT))
def extract_events_udf(text: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Grok parse of event lines -> array<struct>, vectorized via Arrow.

    Replaces the reference's per-line split+zip (zeek_log.rs:179-188) with
    one compiled multi-group regex over each page's text; the caller
    explodes the array into typed conn-like records.
    """
    pat = EVENT_RE

    def _one(t):
        if t is None:
            return None
        out = []
        for m in pat.finditer(t):
            out.append(
                {
                    "record_type": m.group("record_type"),
                    "id_orig_h": m.group("src"),
                    "id_resp_h": m.group("dst"),
                    "orig_p": int(m.group("sport")),
                    "resp_p": int(m.group("dport")),
                    "bytes": int(m.group("bytes")),
                    "duration_ms": int(m.group("dur")),
                }
            )
        return out

    for batch in text:
        yield batch.map(_one)


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

    ``byte_exact=True`` routes text extraction through the Arrow UDF on raw
    bytes; ``False`` uses the pure-JVM path (same result for UTF-8 corpora,
    no Python at all — measured in bench).
    """
    text_col = extract_text_udf("html") if byte_exact else extract_text_native(F.col("html"))
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

    ``vectorized=True``: one Arrow UDF pass producing array<struct>, then a
    native explode. ``vectorized=False``: fully native — split lines, filter
    the EV prefix, regexp_extract each field (7 regexps/line but zero Python).
    """
    if vectorized:
        ev = pages.select(
            "url",
            F.date_trunc("hour", F.col("warc_ts")).alias("ts_bucket"),
            "lang",
            F.explode(extract_events_udf("text")).alias("e"),
        )
        return ev.select(
            "url",
            F.col("e.record_type").alias("record_type"),
            F.col("e.id_orig_h").alias("id_orig_h"),
            F.col("e.id_resp_h").alias("id_resp_h"),
            F.col("e.orig_p").alias("orig_p"),
            F.col("e.resp_p").alias("resp_p"),
            F.col("e.bytes").alias("bytes"),
            F.col("e.duration_ms").alias("duration_ms"),
            "ts_bucket",
            "lang",
        )
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
    ).filter(F.col("record_type").isNotNull())  # drop non-matching lines, same as the UDF path
