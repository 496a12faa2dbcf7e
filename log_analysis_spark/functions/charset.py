"""Charset sniffing and decoding for raw fetched HTML bytes.

The north-star input shape carries ``html`` as a BINARY column — real
fetched bytes arrive in whatever encoding the origin server chose, and a
corpus that casts everything to UTF-8 silently mangles every Latin-1 and
UTF-16 page. This module is the ingest-side bridge: detect the charset
(BOM first, then the page's own ``charset=`` declaration, then a caller
default) and decode to the string column every downstream operator
(html_to_text, langid, quality, dedup) consumes.

Detection order mirrors the WHATWG encoding sniff:

1. **BOM** (authoritative): ``EF BB BF`` -> utf-8, ``FF FE`` -> utf-16le,
   ``FE FF`` -> utf-16be.
2. **In-document declaration**: the first ``charset=`` attribute in the
   first 1024 bytes (the WHATWG prescan window), matched case-
   insensitively over a Latin-1 view of the prefix (Latin-1 is a total
   byte->char map, so the scan itself can never fail); aliases
   normalize (latin-1/latin1 -> iso-8859-1, utf8 -> utf-8, ascii ->
   us-ascii, cp1252 -> windows-1252). windows-1252 decodes PROPERLY:
   iso-8859-1 (total) followed by one ``translate`` mapping the 27
   defined C1-block positions (0x80-0x9F) to their cp1252 characters
   (smart quotes, dashes, euro, ...), the 5 undefined positions passing
   through as C1 controls. Declared iso-8859-1 stays pure iso-8859-1
   (the conservative choice; WHATWG folds that label into windows-1252
   too — callers wanting browser behavior can alias it before decode).
3. **Caller default** (utf-8) when neither is present or the declared
   name is unknown.

Decoding is a literal-charset ``when`` chain over the closed vocabulary
(Spark's ``decode`` requires a literal charset name); malformed
sequences decode to U+FFFD (Java CharsetDecoder REPLACE — total, never
throws), and a leading BOM-decoded U+FEFF is stripped so the text
output is byte-identical to the origin markup. NULL bytes pass through
as NULL text.

Everything is native expressions (substring/decode/regexp on the 1 KiB
prefix) — zero shuffle, fully inside whole-stage codegen; at 10^12
pages this is a map-side stage fused with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CHARSET_RX = r"""(?i)charset\s*=\s*["']?([A-Za-z0-9_.:-]+)"""
PRESCAN_BYTES = 1024

_BOM_UTF8 = bytearray(b"\xef\xbb\xbf")

# the 27 defined C1-block (0x80-0x9F) positions of windows-1252 and their
# real characters; 0x81/0x8D/0x8F/0x90/0x9D are undefined and pass through
_CP1252_DEFINED = [i for i in range(0x80, 0xA0) if i not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)]
_CP1252_FROM = "".join(chr(i) for i in _CP1252_DEFINED)
_CP1252_TO = bytes(_CP1252_DEFINED).decode("cp1252")
_BOM_UTF16LE = bytearray(b"\xff\xfe")
_BOM_UTF16BE = bytearray(b"\xfe\xff")


def sniff_charset(bin_col: Column, default: str = "utf-8") -> Column:
    """Detected charset name for raw page bytes (see module docstring)."""
    meta = F.lower(
        F.regexp_extract(
            F.decode(F.substring(bin_col, 1, PRESCAN_BYTES), "ISO-8859-1"),
            CHARSET_RX,
            1,
        )
    )
    declared = (
        F.when(meta.isin("utf-8", "utf8"), F.lit("utf-8"))
        .when(meta.isin("iso-8859-1", "latin-1", "latin1"), F.lit("iso-8859-1"))
        .when(meta.isin("windows-1252", "cp1252"), F.lit("windows-1252"))
        .when(meta.isin("us-ascii", "ascii"), F.lit("us-ascii"))
        .when(meta == "utf-16le", F.lit("utf-16le"))
        .when(meta == "utf-16be", F.lit("utf-16be"))
        .otherwise(F.lit(default))
    )
    return (
        F.when(bin_col.isNull(), F.lit(None).cast("string"))
        .when(F.substring(bin_col, 1, 3) == F.lit(_BOM_UTF8), F.lit("utf-8"))
        .when(F.substring(bin_col, 1, 2) == F.lit(_BOM_UTF16LE), F.lit("utf-16le"))
        .when(F.substring(bin_col, 1, 2) == F.lit(_BOM_UTF16BE), F.lit("utf-16be"))
        .otherwise(declared)
    )


def decode_html(bin_col: Column, charset_col: Column) -> Column:
    """Decode page bytes with the (per-row) detected charset; leading
    BOM-decoded U+FEFF stripped; unknown charset names fall back to
    UTF-8; NULL bytes -> NULL text."""
    decoded = (
        F.when(charset_col == "utf-16le", F.decode(bin_col, "UTF-16LE"))
        .when(charset_col == "utf-16be", F.decode(bin_col, "UTF-16BE"))
        .when(charset_col == "iso-8859-1", F.decode(bin_col, "ISO-8859-1"))
        .when(
            charset_col == "windows-1252",
            F.translate(F.decode(bin_col, "ISO-8859-1"), _CP1252_FROM, _CP1252_TO),
        )
        .when(charset_col == "us-ascii", F.decode(bin_col, "US-ASCII"))
        .otherwise(F.decode(bin_col, "UTF-8"))
    )
    return F.when(
        bin_col.isNotNull(), F.regexp_replace(decoded, "^\\ufeff", "")
    )
