"""Charset sniff + decode semantics (WHATWG-style BOM/prescan order)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.functions.charset import decode_html, sniff_charset

CASES = [
    # (name, raw bytes, expected charset, expected decoded text)
    ("bom_utf8", "﻿".encode("utf-8") + "café".encode("utf-8"), "utf-8", "café"),
    ("bom_utf16le", "﻿café".encode("utf-16-le"), "utf-16le", "café"),
    ("bom_utf16be", "﻿café".encode("utf-16-be"), "utf-16be", "café"),
    (
        "meta_latin1",
        b'<meta charset="latin-1"><p>caf\xe9</p>',
        "iso-8859-1",
        '<meta charset="latin-1"><p>café</p>',
    ),
    (
        "meta_content_type",
        b"<meta content=\"text/html; charset='Windows-1252'\"><p>a</p>",
        "windows-1252",
        "<meta content=\"text/html; charset='Windows-1252'\"><p>a</p>",
    ),
    (
        # cp1252 C1 block decodes to the REAL characters (smart quotes,
        # euro); the undefined 0x81 passes through as the C1 control
        "cp1252_c1_block",
        b'<meta charset="cp1252">\x93q\x94 \x80 \x81 \x97',
        "windows-1252",
        '<meta charset="cp1252">\u201cq\u201d \u20ac \x81 \u2014',
    ),
    ("meta_utf8_alias", b'<meta charset=UTF8><p>ok</p>', "utf-8", "<meta charset=UTF8><p>ok</p>"),
    ("no_meta_default", b"<p>plain</p>", "utf-8", "<p>plain</p>"),
    ("unknown_name", b'<meta charset="klingon"><p>x</p>', "utf-8", '<meta charset="klingon"><p>x</p>'),
    # BOM BEATS a contradicting declaration (WHATWG order)
    (
        "bom_beats_meta",
        "﻿".encode("utf-8") + b'<meta charset="latin-1">ok',
        "utf-8",
        '<meta charset="latin-1">ok',
    ),
]


@pytest.fixture(scope="module")
def decoded(spark):
    df = spark.createDataFrame(
        [(n, bytearray(b)) for n, b, _, _ in CASES], "name string, html binary"
    )
    out = df.select(
        "name",
        sniff_charset(F.col("html")).alias("cs"),
        decode_html(F.col("html"), sniff_charset(F.col("html"))).alias("text"),
    )
    return {r.name: r for r in out.collect()}


@pytest.mark.parametrize("name,_b,want_cs,want_text", CASES)
def test_sniff_and_decode(decoded, name, _b, want_cs, want_text):
    assert decoded[name].cs == want_cs
    assert decoded[name].text == want_text


def test_null_bytes_pass_through(spark):
    df = spark.createDataFrame([(None,)], "html binary")
    r = df.select(
        sniff_charset(F.col("html")).alias("cs"),
        decode_html(F.col("html"), sniff_charset(F.col("html"))).alias("text"),
    ).collect()[0]
    assert r.cs is None and r.text is None


def test_prescan_window_bound(spark):
    # a declaration past the 1024-byte prescan window is ignored
    b = b" " * 1100 + b'<meta charset="latin-1">x'
    df = spark.createDataFrame([(bytearray(b),)], "html binary")
    assert df.select(sniff_charset(F.col("html"))).collect()[0][0] == "utf-8"
