"""WARC source tests (sources/warc.py): spec-exact fixtures round-trip
through the distributed reader with payload byte-identity, malformed
tails dead-letter instead of failing, and the pages-table projection
applies the crawl keep-rules."""

import os

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.sources.warc import (
    build_http_response_block,
    build_record,
    pages_from_warc,
    parse_warc_column,
    read_warc,
    records_from_bytes,
    write_warc_fixture,
)

BODY_A = b"<html><body><p>alpha page</p></body></html>"
BODY_B = b"<html><body><p>beta page</p></body></html>"
# binary payload embedding both a fake record head and a blank line: a
# delimiter-scanning parser desynchronizes here; Content-Length slicing
# must not
BODY_TRAP = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n" + bytes(range(256))


def _fixture_records():
    return [
        build_record(
            "warcinfo",
            None,
            "2024-07-02T00:00:00Z",
            b"software: test\r\n",
            content_type="application/warc-fields",
        ),
        build_record(
            "request",
            "http://a.example/x",
            "2024-07-02T00:00:01Z",
            b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n",
            content_type="application/http; msgtype=request",
        ),
        build_record(
            "response",
            "http://a.example/x",
            "2024-07-02T00:00:01Z",
            build_http_response_block(BODY_A, 200, "text/html"),
            content_type="application/http; msgtype=response",
        ),
        build_record(
            "response",
            "http://b.example/y",
            "2024-07-03T10:20:30Z",
            build_http_response_block(BODY_TRAP, 200, "application/octet-stream"),
            content_type="application/http; msgtype=response",
        ),
        build_record(
            "response",
            "http://c.example/z",
            "2024-07-03T10:20:31Z",
            build_http_response_block(BODY_B, 404, "text/html"),
            content_type="application/http; msgtype=response",
        ),
    ]


@pytest.mark.parametrize("gz", [True, False], ids=["gzip-members", "plain"])
def test_roundtrip_byte_identity(spark, tmpdir_path, gz):
    path = os.path.join(tmpdir_path, "seg-0.warc" + (".gz" if gz else ""))
    write_warc_fixture(path, _fixture_records(), gzip_members=gz)
    rows = (
        read_warc(spark, tmpdir_path, types=None)
        .orderBy("warc_ts", "rec_type", "url")
        .collect()
    )
    assert [r["rec_type"] for r in rows] == [
        "warcinfo",
        "request",
        "response",
        "response",
        "response",
    ]
    resp = {r["url"]: r for r in rows if r["rec_type"] == "response"}
    assert bytes(resp["http://a.example/x"]["payload"]) == BODY_A
    assert bytes(resp["http://b.example/y"]["payload"]) == BODY_TRAP
    assert bytes(resp["http://c.example/z"]["payload"]) == BODY_B
    assert resp["http://a.example/x"]["http_status"] == 200
    assert resp["http://c.example/z"]["http_status"] == 404
    assert resp["http://a.example/x"]["content_type"] == "text/html"
    assert str(resp["http://b.example/y"]["warc_ts"]) == "2024-07-03 10:20:30"


def test_default_types_filter(spark, tmpdir_path):
    write_warc_fixture(os.path.join(tmpdir_path, "s.warc.gz"), _fixture_records())
    rows = read_warc(spark, tmpdir_path).collect()  # default: responses only
    assert {r["rec_type"] for r in rows} == {"response"}
    assert len(rows) == 3


def test_truncated_tail_dead_letters(spark, tmpdir_path):
    recs = _fixture_records()
    data = b"".join(recs[:3])
    # chop the final record mid-body: Content-Length says more bytes exist
    data = data[:-20]
    p = os.path.join(tmpdir_path, "trunc.warc")
    with open(p, "wb") as f:
        f.write(data)
    rows = read_warc(spark, tmpdir_path, types=None).collect()
    types = sorted(r["rec_type"] for r in rows)
    assert types == ["_malformed", "request", "warcinfo"]
    bad = [r for r in rows if r["rec_type"] == "_malformed"][0]
    assert int(bytes(bad["payload"])) > 0  # missing-byte count


def test_garbage_prefix_dead_letters():
    recs = list(records_from_bytes(b"not a warc stream at all", "f"))
    assert len(recs) == 1 and recs[0]["rec_type"] == "_malformed"


def test_http_head_lf_only_tolerated():
    block = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nhello"
    rec = build_record(
        "response",
        "http://a/x",
        "2024-07-02T00:00:00Z",
        block,
        content_type="application/http; msgtype=response",
    )
    (r,) = records_from_bytes(rec, "f")
    assert r["http_status"] == 200
    assert r["content_type"] == "text/plain"
    assert r["payload"] == b"hello"


def test_fractional_second_and_offset_dates():
    rec = build_record(
        "response",
        "http://a/x",
        "2024-07-02T01:02:03.250000+02:00",
        build_http_response_block(b"b"),
        content_type="application/http; msgtype=response",
    )
    (r,) = records_from_bytes(rec, "f")
    assert str(r["warc_ts"]) == "2024-07-01 23:02:03.250000"  # normalized to UTC


def test_non_http_response_keeps_full_block():
    block = b"raw bytes, no HTTP head"
    rec = build_record(
        "response",
        "http://a/x",
        "2024-07-02T00:00:00Z",
        block,
        content_type="application/http; msgtype=response",
    )
    (r,) = records_from_bytes(rec, "f")
    assert r["http_status"] is None
    assert r["payload"] == block


def test_parse_warc_column_keep_cols(spark):
    recs = _fixture_records()
    df = spark.createDataFrame(
        [(1, bytearray(recs[2])), (2, bytearray(recs[4]))], "k int, raw binary"
    )
    out = parse_warc_column(df, "raw", keep_cols=["k"]).orderBy("k").collect()
    assert [r["k"] for r in out] == [1, 2]
    assert bytes(out[0]["payload"]) == BODY_A
    assert out[1]["http_status"] == 404


def test_pages_from_warc_keep_rules(spark, tmpdir_path):
    write_warc_fixture(os.path.join(tmpdir_path, "s.warc.gz"), _fixture_records())
    pages = pages_from_warc(read_warc(spark, tmpdir_path)).orderBy("url").collect()
    # 404 dropped; octet-stream dropped; only the 200 text/html page stays
    assert [r["url"] for r in pages] == ["http://a.example/x"]
    assert bytes(pages[0]["html"]) == BODY_A
    assert pages[0]["text"] == "alpha page"
    assert pages[0]["lang"] is not None


def test_cli_warc_ingest_resumes(spark, tmpdir_path):
    from log_analysis_spark.plans.job import ingest_warc

    warc_dir = os.path.join(tmpdir_path, "warc")
    os.makedirs(warc_dir)
    write_warc_fixture(os.path.join(warc_dir, "s.warc.gz"), _fixture_records())
    pages_path = os.path.join(tmpdir_path, "pages")
    out_dir = os.path.join(tmpdir_path, "out")
    r1 = ingest_warc(spark, warc_dir, pages_path, out_dir)
    assert r1 == {"warc_ingested": True, "pages": 1}
    df = spark.read.parquet(pages_path)
    assert df.count() == 1 and "day" in df.columns
    assert str(df.select("day").first()["day"]) == "2024-07-02"
    # unchanged input -> skipped; touched input -> re-ingested
    r2 = ingest_warc(spark, warc_dir, pages_path, out_dir)
    assert r2 == {"warc_ingested": False, "skipped": True}
    write_warc_fixture(
        os.path.join(warc_dir, "s2.warc.gz"), _fixture_records()[:3], gzip_members=True
    )
    r3 = ingest_warc(spark, warc_dir, pages_path, out_dir)
    assert r3["warc_ingested"] is True


def test_pages_from_warc_charset_sniff(spark, tmpdir_path):
    """Non-UTF-8 fetches land with correct text: a Latin-1 body with an
    in-document declaration and a UTF-16LE BOM body both decode through
    the charset sniff; html keeps the origin bytes; charset_sniff=False
    reproduces the old blind utf-8 cast (mojibake on the Latin-1 byte)."""
    latin1 = '<meta charset="latin-1"><body><p>café page</p></body>'.encode("latin-1")
    utf16 = "﻿<body><p>naïve page</p></body>".encode("utf-16-le")
    recs = [
        build_record(
            "response",
            "http://l1.example/a",
            "2024-07-02T00:00:01Z",
            build_http_response_block(latin1, 200, "text/html"),
            content_type="application/http; msgtype=response",
        ),
        build_record(
            "response",
            "http://u16.example/b",
            "2024-07-02T00:00:02Z",
            build_http_response_block(utf16, 200, "text/html"),
            content_type="application/http; msgtype=response",
        ),
    ]
    write_warc_fixture(os.path.join(tmpdir_path, "c.warc.gz"), recs)
    pages = {
        r["url"]: r
        for r in pages_from_warc(read_warc(spark, tmpdir_path)).collect()
    }
    assert pages["http://l1.example/a"]["text"] == "café page"
    assert bytes(pages["http://l1.example/a"]["html"]) == latin1  # origin bytes kept
    assert pages["http://u16.example/b"]["text"] == "naïve page"
    raw = {
        r["url"]: r["text"]
        for r in pages_from_warc(
            read_warc(spark, tmpdir_path), charset_sniff=False
        ).collect()
    }
    assert "café" not in raw["http://l1.example/a"]  # blind cast mangles é


# ---- WET / WAT companion distributions ----


def test_wet_pages_from_fixture_file(spark, tmpdir_path):
    from log_analysis_spark.sources.warc import build_wet_record, pages_from_wet

    recs = [
        build_wet_record("http://a.example/x", "2024-07-02T00:00:01Z", "alpha page"),
        build_wet_record("http://b.example/y", "2024-07-02T00:00:02Z", "café naïve"),
    ]
    write_warc_fixture(os.path.join(tmpdir_path, "s.wet.gz"), recs)
    got = {
        r["url"]: r
        for r in pages_from_wet(
            read_warc(spark, tmpdir_path, types=("conversion",))
        ).collect()
    }
    assert got["http://a.example/x"]["text"] == "alpha page"
    assert got["http://b.example/y"]["text"] == "café naïve"  # UTF-8 decode
    assert str(got["http://a.example/x"]["warc_ts"]) == "2024-07-02 00:00:01"
    assert set(got["http://a.example/x"].asDict()) == {
        "url", "warc_ts", "text", "lang",
    }


def test_wat_links_explode_and_empty_drop(spark, tmpdir_path):
    from log_analysis_spark.sources.warc import build_wat_record, wat_links

    recs = [
        build_wat_record(
            "http://a.example/x",
            "2024-07-02T00:00:01Z",
            [("A@/href", "/next", "more"), ("IMG@/src", "http://i.example/1", "")],
            title="Page A",
        ),
        # no outlinks: must not produce rows (edges, not inventory)
        build_wat_record("http://b.example/y", "2024-07-02T00:00:02Z", [], title="B"),
    ]
    write_warc_fixture(os.path.join(tmpdir_path, "s.wat.gz"), recs)
    rows = wat_links(read_warc(spark, tmpdir_path, types=("metadata",))).collect()
    assert {r["url"] for r in rows} == {"http://a.example/x"}
    got = {(r["link_path"], r["link_url"], r["link_text"]) for r in rows}
    assert got == {("A@/href", "/next", "more"), ("IMG@/src", "http://i.example/1", "")}
    assert all(r["title"] == "Page A" for r in rows)


def test_wat_links_malformed_json_nulls_out(spark):
    from log_analysis_spark.sources.warc import wat_links

    rec = build_record(
        "metadata",
        "http://broken.example/",
        "2024-07-02T00:00:03Z",
        b"{not json",
        content_type="application/json",
    )
    df = spark.createDataFrame([(bytearray(rec),)], "raw binary")
    out = wat_links(parse_warc_column(df, "raw"))
    # malformed envelope -> from_json nulls -> inner explode drops the row
    assert out.count() == 0


def test_write_warc_roundtrip_byte_exact(spark, tmpdir_path):
    """write_warc -> read_warc round-trips every payload byte-exactly
    (md5 + octet length per url), one CC-layout gzip-member file per
    partition, manifest counts match, empty partitions write nothing."""
    import glob
    import gzip as _gz
    import os

    from log_analysis_spark.sources.warc import read_warc, write_warc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = docs.selectExpr(
        "concat('https://h', doc_id, '.example/p') AS url", "text"
    ).repartition(4)
    out = f"{tmpdir_path}/warc_out"
    manifest = write_warc(src, out).collect()
    assert sum(r["n_records"] for r in manifest) == 500
    files = sorted(glob.glob(os.path.join(out, "part-*.warc.gz")))
    assert [os.path.basename(r["file"]) for r in sorted(
        manifest, key=lambda r: r["file"]
    )] == [os.path.basename(f) for f in files]
    # gzip MEMBERS: the file is a valid multi-member stream AND each
    # record is its own member (standard tooling can seek members)
    with open(files[0], "rb") as fh:
        raw = fh.read()
    assert raw[:2] == b"\x1f\x8b"
    assert _gz.decompress(raw).startswith(b"WARC/1.0\r\n")

    back = read_warc(spark, f"{out}/*.warc.gz")
    got = {
        r["url"]: (r["payload_md5"], r["payload_len"])
        for r in back.selectExpr(
            "url", "md5(payload) AS payload_md5",
            "octet_length(payload) AS payload_len",
        ).collect()
    }
    want = {
        r["url"]: (r["m"], r["n"])
        for r in src.selectExpr(
            "url", "md5(cast(text AS BINARY)) AS m",
            "octet_length(text) AS n",
        ).collect()
    }
    assert got == want and len(got) == 500


def test_write_warc_empty_partition_writes_nothing(spark, tmpdir_path):
    import glob
    import os

    from log_analysis_spark.sources.warc import write_warc

    df = spark.createDataFrame(
        [("https://a.x/p", "hello")], ["url", "text"]
    ).repartition(8)
    out = f"{tmpdir_path}/warc_sparse"
    manifest = write_warc(df, out).collect()
    assert len(manifest) == 1 and manifest[0]["n_records"] == 1
    assert len(glob.glob(os.path.join(out, "part-*.warc.gz"))) == 1


def test_write_wet_roundtrip(spark, tmpdir_path):
    """write_wet -> parse_warc_column/pages_from_wet recovers every
    text byte-exactly — curated corpus out, CC-compatible WET in."""
    from log_analysis_spark.sources.warc import pages_from_wet, read_warc, write_wet

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = docs.selectExpr(
        "concat('https://w', doc_id, '.example/p') AS url", "text"
    ).repartition(3)
    out = f"{tmpdir_path}/wet_out"
    manifest = write_wet(src, out).collect()
    assert sum(r["n_records"] for r in manifest) == 500

    recs = read_warc(spark, f"{out}/*.warc.wet.gz", types=("conversion",))
    pages = pages_from_wet(recs, lang=False)
    got = {
        r["url"]: r["m"]
        for r in pages.selectExpr(
            "url", "md5(cast(text AS BINARY)) AS m"
        ).collect()
    }
    want = {
        r["url"]: r["m"]
        for r in src.selectExpr(
            "url", "md5(cast(text AS BINARY)) AS m"
        ).collect()
    }
    assert got == want and len(got) == 500
