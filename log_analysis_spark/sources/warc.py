"""WARC (ISO 28500) web-archive source — Common Crawl's on-disk format.

The north star models a Common-Crawl-style pages table
(url, warc_ts, html, text, lang); real CC corpora arrive as ``.warc.gz``
files, so ingest-format fidelity here plays the role the gzipped Zeek
TSV reader (``zeek_tsv.py``) plays for the reference's own logs
(/root/reference/src/zeek/zeek_log.rs:86-224): a self-describing
header-block format decoded into typed rows.

Format (public spec, WARC/1.0 and /1.1; ISO 28500):

- a WARC file is a concatenation of records; Common Crawl compresses
  each record as its own gzip MEMBER, so one stream-decompress of the
  whole file yields the plain concatenation (Python ``gzip`` handles
  multi-member streams natively — the flate2-analog of the reference's
  S3 step);
- each record is ``WARC/1.x CRLF``, then ``Name: value`` header lines,
  a blank line, then exactly ``Content-Length`` octets of block, then
  ``CRLF CRLF``;
- for ``WARC-Type: response`` records the block is an HTTP response:
  status line + headers + blank line + body (the page bytes).

Parsing is **Content-Length-driven slicing** — the body is never
scanned for delimiters, so binary payloads containing ``WARC/1.0`` or
blank lines cannot desynchronize the reader (the reason naive
split-on-separator WARC readers are wrong).

Scale shape: ``read_warc`` maps **one task per WARC file** via
``spark.read.format("binaryFile")`` + ``mapInPandas`` — exactly
Common Crawl's unit of parallelism (segment files, ~1 GB). At 100 TB
that is ~100k independent tasks with no shuffle; the Python cost is
one linear pass per file (header parse + slicing; the body bytes are
sliced, not decoded). Malformed tails and short blocks surface as
``_malformed`` rows (dead-letter analog of ``text_logs.py``) instead
of failing the task, and a truncated final record is recovered
best-effort like real CC tooling does.

``parse_warc_column`` exposes the same parser over an in-plan binary
column, which is what the ``warc_roundtrip`` gate query uses: build
real WARC bytes from the documents table, parse them back, and prove
url/ts/status/payload byte-identity against a DuckDB oracle that
derives the expected values relationally (any off-by-one in the
slicing breaks the md5 equality).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _parse_warc_date(s: str | None) -> datetime | None:
    """WARC-Date is W3C ISO-8601 UTC ('2024-07-02T00:00:01Z'; WARC/1.1
    allows fractional seconds). Returned tz-naive UTC to match the
    pages table's warc_ts convention."""
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s.strip().replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _split_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an HTTP response block.
    Header section ends at the first CRLFCRLF (the spec separator; a
    bare LFLF is tolerated for sloppy servers). Unparseable -> the whole
    block is returned as body with NULL status."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = block.find(sep)
        if idx >= 0:
            head, body = block[:idx], block[idx + len(sep) :]
            break
    else:
        return None, None, block
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    status: int | None = None
    ctype: str | None = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    else:
        return None, None, block  # not an HTTP head — keep bytes intact
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1") or None
            break
    return status, ctype, body


def records_from_bytes(buf: bytes, file_name: str = "") -> Iterator[dict]:
    """Parse one (decompressed) WARC stream into record dicts matching
    WARC_SCHEMA. Content-Length-driven; never scans payload bytes.

    Emitted per record: the WARC headers we type (WARC-Type,
    WARC-Target-URI, WARC-Date) plus, for response records whose block
    is an HTTP message, the parsed status / Content-Type and the raw
    body bytes as ``payload``. Non-response records (request, metadata,
    warcinfo, ...) keep their full block as payload so nothing is
    silently dropped. A structurally broken record emits ONE
    ``_malformed`` row for the remaining bytes and stops (there is no
    resynchronization point once Content-Length is unreliable)."""
    pos, n = 0, len(buf)
    while pos < n:
        while pos < n and buf[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            yield _malformed(file_name, n - pos)
            return
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield _malformed(file_name, n - pos)
            return
        head = buf[pos:hdr_end].decode("utf-8", errors="replace")
        headers: dict[str, str] = {}
        for ln in head.split("\r\n")[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            yield _malformed(file_name, n - pos)
            return
        body_start = hdr_end + 4
        block = buf[body_start : body_start + clen]
        pos = body_start + clen
        if len(block) < clen:
            # truncated final record: recover what's there (CC tooling
            # convention) but label it so audits can count truncation
            yield _malformed(file_name, clen - len(block))
            return
        rec_type = headers.get("warc-type", "")
        url = headers.get("warc-target-uri") or None
        ts = _parse_warc_date(headers.get("warc-date"))
        status: int | None = None
        ctype: str | None = None
        payload = block
        if rec_type == "response" and headers.get("content-type", "").startswith(
            "application/http"
        ):
            status, ctype, payload = _split_http_response(block)
        yield {
            "warc_file": file_name,
            "rec_type": rec_type or None,
            "url": url,
            "warc_ts": ts,
            "http_status": status,
            "content_type": ctype,
            "payload": payload,
        }


def _malformed(file_name: str, nbytes: int) -> dict:
    return {
        "warc_file": file_name,
        "rec_type": "_malformed",
        "url": None,
        "warc_ts": None,
        "http_status": None,
        "content_type": None,
        "payload": str(nbytes).encode("ascii"),
    }


def _maybe_gunzip(content: bytes) -> bytes:
    """Whole-stream decompress when the magic says gzip; multi-member
    streams (Common Crawl's record-per-member layout) concatenate."""
    if content[:2] == b"\x1f\x8b":
        return gzip.decompress(content)
    return content


def read_warc(
    spark: SparkSession,
    path: str | list[str],
    types: tuple[str, ...] | None = ("response",),
) -> DataFrame:
    """Distributed WARC scan: one task per file, no shuffle.

    ``types`` filters record types executor-side before rows are even
    built (``None`` keeps every type). ``_malformed`` rows always pass
    so audits can count them. The payload of kept response records is
    the raw HTTP body bytes — feed ``pages_from_warc`` to land the
    pages-table shape."""
    want = set(types) if types is not None else None

    def parse(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                buf = _maybe_gunzip(bytes(content))
                name = path_.rsplit("/", 1)[-1]
                for rec in records_from_bytes(buf, name):
                    if not want or rec["rec_type"] in want or rec["rec_type"] == "_malformed":
                        rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(parse, WARC_SCHEMA)


def parse_warc_column(df: DataFrame, bytes_col: str, keep_cols: list[str] | None = None) -> DataFrame:
    """Parse a binary column of WARC bytes (one or more records per
    cell) with the SAME core parser — the in-plan form the gate query
    and oracle exercise. ``keep_cols`` ride along unchanged."""
    keep = keep_cols or []
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in keep] + list(WARC_SCHEMA.fields)
    )

    def parse(batches: Iterable) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                cell = pdf[bytes_col].iloc[i]
                if cell is None:
                    continue
                buf = bytes(cell)
                base = {k: pdf[k].iloc[i] for k in keep}
                for rec in records_from_bytes(buf, ""):
                    rows.append({**base, **rec})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(parse, out_schema)


def pages_from_warc(
    recs: DataFrame, lang: bool = True, charset_sniff: bool = True
) -> DataFrame:
    """Land the pages-table shape (url, warc_ts, html, text, lang) from
    parsed response records: html = raw body bytes, text = the generic
    boilerplate strip (functions/html.py, pure codegen), lang = the
    n-gram heuristic over that text. 2xx HTML responses only — the
    crawl-pipeline keep-rule (redirects/errors carry no page).

    ``charset_sniff`` (default on) decodes the body through
    ``functions/charset.py`` (BOM > in-document ``charset=`` prescan >
    utf-8) instead of a blind utf-8 cast, so Latin-1 and UTF-16 pages
    land with correct text while ``html`` keeps the origin bytes —
    still zero extra shuffle (the sniff fuses into the same projection).
    """
    from ..functions.charset import decode_html, sniff_charset
    from ..functions.html import html_to_text
    from ..functions.textstats import langid

    keep = recs.filter(
        (F.col("rec_type") == "response")
        & F.col("url").isNotNull()
        & F.col("warc_ts").isNotNull()
        & F.col("http_status").between(200, 299)
        & (F.coalesce(F.col("content_type"), F.lit("")).startswith("text/html")
           | F.col("content_type").isNull())
    )
    if charset_sniff:
        body_text = decode_html(F.col("payload"), sniff_charset(F.col("payload")))
    else:
        body_text = F.col("payload").cast("string")
    out = keep.select(
        F.col("url"),
        F.col("warc_ts"),
        F.col("payload").alias("html"),
        html_to_text(body_text).alias("text"),
    )
    if lang:
        out = out.withColumn("lang", langid(F.col("text")))
    else:
        out = out.withColumn("lang", F.lit(None).cast("string"))
    return out


# ---------------------------------------------------------------------------
# fixture writer (tests + docs): build spec-exact .warc / .warc.gz files
# ---------------------------------------------------------------------------


def build_record(
    rec_type: str,
    url: str | None,
    date: str,
    block: bytes,
    content_type: str | None = None,
    rec_id: str = "<urn:uuid:0>",
) -> bytes:
    headers = ["WARC/1.0", f"WARC-Type: {rec_type}"]
    if url:
        headers.append(f"WARC-Target-URI: {url}")
    headers += [
        f"WARC-Date: {date}",
        f"WARC-Record-ID: {rec_id}",
    ]
    if content_type:
        headers.append(f"Content-Type: {content_type}")
    headers.append(f"Content-Length: {len(block)}")
    head = "\r\n".join(headers).encode("utf-8")
    return head + b"\r\n\r\n" + block + b"\r\n\r\n"


def build_http_response_block(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(status, "X")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode("latin-1")
    return head + b"\r\n" + body


def write_warc_fixture(
    path: str,
    records: list[bytes],
    gzip_members: bool = True,
) -> str:
    """Write records as one WARC file; ``gzip_members=True`` compresses
    each record as its own gzip member (the Common Crawl layout)."""
    if gzip_members:
        out = io.BytesIO()
        for rec in records:
            out.write(gzip.compress(rec))
        data = out.getvalue()
    else:
        data = b"".join(records)
    with open(path, "wb") as f:
        f.write(data)
    return path


# ---------------------------------------------------------------------------
# WET / WAT — Common Crawl's companion distributions (same WARC container)
# ---------------------------------------------------------------------------
#
# CC publishes three parallel datasets per segment: .warc.gz (raw HTTP),
# .wet.gz (extracted plain text as WARC-Type: conversion records whose
# block IS the UTF-8 text), and .wat.gz (per-page metadata as WARC-Type:
# metadata records whose block is a JSON "Envelope" carrying the HTML
# head fields and the outlink list). The container framing is identical,
# so the Content-Length-driven core parser above reads all three; these
# helpers land each payload in its natural relational shape. WAT JSON is
# decoded JVM-side with from_json on a typed subset schema — no Python
# in the parse path beyond the container walk.

# the subset of the WAT envelope this engine consumes (public format:
# https://commoncrawl.org/the-data/get-started/ "WAT" — field names are
# verbatim, including hyphens)
WAT_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "Envelope",
            T.StructType(
                [
                    T.StructField(
                        "Payload-Metadata",
                        T.StructType(
                            [
                                T.StructField(
                                    "HTTP-Response-Metadata",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "HTML-Metadata",
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "Head",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "Title",
                                                                        T.StringType(),
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                        T.StructField(
                                                            "Links",
                                                            T.ArrayType(
                                                                T.StructType(
                                                                    [
                                                                        T.StructField("path", T.StringType()),
                                                                        T.StructField("url", T.StringType()),
                                                                        T.StructField("text", T.StringType()),
                                                                    ]
                                                                )
                                                            ),
                                                        ),
                                                    ]
                                                ),
                                            )
                                        ]
                                    ),
                                )
                            ]
                        ),
                    )
                ]
            ),
        )
    ]
)


def pages_from_wet(recs: DataFrame, lang: bool = True) -> DataFrame:
    """(url, warc_ts, text[, lang]) from parsed WET ``conversion``
    records — the block IS the extracted UTF-8 text (the WET spec), so
    this is one codegen projection: rec-type/url/ts keep-rule + a binary
    -> string cast. ``lang`` adds the n-gram heuristic over that text.
    Zero shuffle; pairs with :func:`pages_from_warc` the way CC's .wet
    pairs with its .warc."""
    from ..functions.textstats import langid

    out = recs.filter(
        (F.col("rec_type") == "conversion")
        & F.col("url").isNotNull()
        & F.col("warc_ts").isNotNull()
    ).select(
        "url",
        "warc_ts",
        F.col("payload").cast("string").alias("text"),
    )
    if lang:
        out = out.withColumn("lang", langid(F.col("text")))
    return out


def wat_links(recs: DataFrame) -> DataFrame:
    """Exploded outlink relation (url, warc_ts, title, link_path,
    link_url, link_text) from parsed WAT ``metadata`` records. The JSON
    envelope is decoded JVM-side (``from_json`` against
    :data:`WAT_ENVELOPE_SCHEMA` — unknown fields ignored, malformed
    JSON nulls out and is filtered), then the Links array explodes.
    This is the zero-refetch way to build the link graph
    (operators/graph.py takes (src, dst) straight from this relation):
    at 10^12 pages the .wat sidecar is ~10x smaller than the raw crawl
    and never touches the HTML parser. Pages with no outlinks drop
    (inner explode) — graph edges, not page inventory."""
    env = F.from_json(F.col("payload").cast("string"), WAT_ENVELOPE_SCHEMA)
    html_md = env["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"
    ]
    return (
        recs.filter(
            (F.col("rec_type") == "metadata")
            & F.col("url").isNotNull()
            & F.col("warc_ts").isNotNull()
        )
        .select(
            "url",
            "warc_ts",
            html_md["Head"]["Title"].alias("title"),
            F.explode(html_md["Links"]).alias("_l"),
        )
        .select(
            "url",
            "warc_ts",
            "title",
            F.col("_l.path").alias("link_path"),
            F.col("_l.url").alias("link_url"),
            F.col("_l.text").alias("link_text"),
        )
    )


def build_wet_record(url: str, date: str, text: str) -> bytes:
    """Spec-exact WET conversion record (fixture/docs use)."""
    return build_record(
        "conversion", url, date, text.encode("utf-8"), content_type="text/plain"
    )


def build_wat_record(
    url: str,
    date: str,
    links: list[tuple[str, str, str]],
    title: str | None = None,
) -> bytes:
    """Spec-exact WAT metadata record; ``links`` are (path, url, text)
    triples as CC emits them (path e.g. 'A@/href')."""
    import json as _json

    env = {
        "Envelope": {
            "WARC-Header-Metadata": {"WARC-Target-URI": url, "WARC-Date": date},
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        **({"Head": {"Title": title}} if title is not None else {}),
                        "Links": [
                            {"path": p, "url": u, "text": t} for p, u, t in links
                        ],
                    }
                }
            },
        }
    }
    return build_record(
        "metadata", url, date, _json.dumps(env).encode("utf-8"),
        content_type="application/json",
    )


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    date: str = "2024-07-02T12:34:56Z",
    status: int = 200,
    content_type: str = "text/html",
    gzip_members: bool = True,
) -> DataFrame:
    """Distributed WARC export — the sink half of :func:`read_warc`:
    every partition writes ONE ``part-{pid}.warc[.gz]`` file of
    ``response`` records (gzip **members** per record when
    ``gzip_members`` — the Common Crawl layout, so the output is
    directly re-ingestable by this module AND by standard WARC tooling).

    Returns a manifest relation ``(file, n_records, n_bytes)`` — one row
    per non-empty partition; materializing it IS the export (mapInPandas
    is lazy). Record bytes come from the same :func:`build_record` /
    :func:`build_http_response_block` builders the fixtures use, so the
    round-trip ``write_warc -> read_warc`` is byte-exact on the payload
    (pinned in pytest).

    Scale shape: one file per partition (CC's own parallelism unit —
    repartition upstream to choose shard count/size), streaming writes
    (no per-partition buffering of the whole shard). Documented cap:
    files open via plain POSIX io — local/NFS/FUSE-mounted stores; a
    production deployment on HDFS/S3 would swap in the Hadoop
    FileSystem API, which changes none of the record arithmetic.
    """
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"
    src = df.select(
        F.col(url_col).cast("string").alias("_u"),
        F.col(text_col).cast("string").alias("_t"),
    )

    def writer(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        nbytes = 0
        fh = None
        try:
            for pdf in batches:
                if len(pdf) and fh is None:
                    os.makedirs(out_dir, exist_ok=True)
                    fh = open(path, "wb")
                for u, t in zip(pdf["_u"], pdf["_t"]):
                    body = ("" if t is None else t).encode("utf-8")
                    block = build_http_response_block(
                        body, status=status, content_type=content_type
                    )
                    rec = build_record(
                        "response",
                        u,
                        date,
                        block,
                        content_type="application/http; msgtype=response",
                        rec_id=f"<urn:uuid:{pid}-{n}>",
                    )
                    out = gzip.compress(rec) if gzip_members else rec
                    fh.write(out)
                    n += 1
                    nbytes += len(out)
        finally:
            if fh is not None:
                fh.close()
        if n:
            yield pd.DataFrame(
                {"file": [path], "n_records": [n], "n_bytes": [nbytes]}
            )

    return src.mapInPandas(writer, schema="file string, n_records long, n_bytes long")


def write_wet(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    date: str = "2024-07-02T12:34:56Z",
    gzip_members: bool = True,
) -> DataFrame:
    """WET export — curated text in Common Crawl's own extracted-text
    distribution format (``conversion`` records whose block IS the
    page's UTF-8 text): the natural handoff from `curation_job` to any
    CC-tooling consumer, and the inverse of :func:`pages_from_wet`.
    Same one-file-per-partition / manifest contract as
    :func:`write_warc`; round-trip pinned in pytest."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.wet.gz" if gzip_members else ".warc.wet"
    src = df.select(
        F.col(url_col).cast("string").alias("_u"),
        F.col(text_col).cast("string").alias("_t"),
    )

    def writer(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        nbytes = 0
        fh = None
        try:
            for pdf in batches:
                if len(pdf) and fh is None:
                    os.makedirs(out_dir, exist_ok=True)
                    fh = open(path, "wb")
                for u, t in zip(pdf["_u"], pdf["_t"]):
                    rec = build_wet_record(u, date, "" if t is None else t)
                    out = gzip.compress(rec) if gzip_members else rec
                    fh.write(out)
                    n += 1
                    nbytes += len(out)
        finally:
            if fh is not None:
                fh.close()
        if n:
            yield pd.DataFrame(
                {"file": [path], "n_records": [n], "n_bytes": [nbytes]}
            )

    return src.mapInPandas(writer, schema="file string, n_records long, n_bytes long")
