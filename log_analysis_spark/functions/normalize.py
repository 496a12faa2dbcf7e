"""Unicode text normalization for web-corpus preprocessing.

Every hash-based stage downstream (exact dedup, MinHash shingles, span
scrub, decontamination) treats bytes as identity, so two renderings of
the same text — precomposed ``é`` vs ``e`` + COMBINING ACUTE — must be
canonicalized BEFORE hashing or they silently never deduplicate. This is
the standard first step of C4/CCNet-style cleaning: Unicode NFC, control
character removal, whitespace collapse.

Execution split (fastest engine for each piece):
- NFC/NFKC: no Spark builtin exists, so this is a **vectorized pandas
  UDF** (`pandas.Series.str.normalize`, Arrow-batched — the sanctioned
  Python path; never per-row Python objects through pickle).
- control strip + whitespace collapse + trim: native ``regexp_replace``
  / ``trim`` — JVM codegen, zero Python.

Oracle story: DuckDB ships ``nfc_normalize`` (utf8proc), so the full
clean replays exactly; cross-engine agreement between CPython's
``unicodedata`` and utf8proc is pinned by a hypothesis fuzz test over
combining marks (tests/test_normalize.py).

Composition contract: normalize FIRST, then hash — `clean_text` is the
canonical pre-hash projection for the curation pipeline.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# C0 controls except \t\n\r, plus DEL. Same escape syntax in Java regex
# and RE2, so the oracle reuses the literal verbatim.
CONTROL_RX = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
WS_RX = r"\s+"


_UDF_CACHE: dict[str, object] = {}


def _norm_udf(form: str):
    """Arrow-batched pandas UDF for a normalization form. Built lazily
    (pandas_udf needs a live SparkContext to resolve the return type, so
    a module-level decorator would break plain imports)."""
    if form not in _UDF_CACHE:

        def _f(s: pd.Series) -> pd.Series:
            return s.str.normalize(form)

        _f.__name__ = f"nfc_{form.lower()}"
        _UDF_CACHE[form] = pandas_udf("string")(_f)
    return _UDF_CACHE[form]


def nfc(col: Column) -> Column:
    """Unicode NFC via Arrow-batched pandas (CPython unicodedata)."""
    return _norm_udf("NFC")(col)


def nfkc(col: Column) -> Column:
    """NFKC — compatibility forms folded (ﬁ -> fi, ² -> 2); lossy by
    design, use for matching keys, not for retained text."""
    return _norm_udf("NFKC")(col)


def strip_controls(col: Column) -> Column:
    """Remove C0/C1-DEL control characters (native, codegen)."""
    return F.regexp_replace(col, CONTROL_RX, "")


def collapse_whitespace(col: Column) -> Column:
    """Runs of whitespace -> one space, then trim (native, codegen)."""
    return F.trim(F.regexp_replace(col, WS_RX, " "))


def clean_text(col: Column, form: str = "NFC") -> Column:
    """The canonical pre-hash normalization: control strip -> NFC (or
    NFKC) -> whitespace collapse -> trim. Order is part of the contract
    and load-bearing: stripping a control can bring a base character and
    a combining mark together (``Y \\x0B ̀`` -> ``Y ̀``), so
    normalization must run AFTER the strip or the output is not
    NFC-normalized (found by the hypothesis fuzz; regression-pinned).
    Whitespace collapse substitutes single spaces — no character removal
    — so it cannot denormalize and runs last."""
    if form == "NFC":
        f = nfc
    elif form == "NFKC":
        f = nfkc
    else:
        raise ValueError(f"unsupported form {form!r} (NFC or NFKC)")
    return collapse_whitespace(f(strip_controls(col)))


def clean_text_oracle(expr: str) -> str:
    """DuckDB replay of ``clean_text(..., 'NFC')`` over SQL ``expr`` —
    same regexes, same order. (No NFKC replay: DuckDB exposes only
    nfc_normalize; NFKC parity is pinned by pytest instead.)"""
    return (
        f"trim(regexp_replace(nfc_normalize(regexp_replace({expr}, "
        f"'{CONTROL_RX}', '', 'g')), '{WS_RX}', ' ', 'g'))"
    )


# ---------------------------------------------------------------------------
# Mojibake repair (ftfy-style, one round of UTF-8-read-as-latin1/cp1252)
# ---------------------------------------------------------------------------
# cp1252's 27 printable characters in the 0x80-0x9F window, and the C1
# control characters latin1 puts at the same byte values. A document that
# was UTF-8 on the wire but decoded by a cp1252 reader renders the bytes
# 0x80-0x9F as the FIRST string; a latin1 reader renders them as the
# SECOND. Mapping the first onto the second makes the string's codepoints
# literally equal to its original byte values, which is what lets a pure
# latin1 re-encode recover the original UTF-8 bytes. The 5 cp1252 holes
# (0x81 0x8D 0x8F 0x90 0x9D) have no printable form and pass through as
# C1 controls on both sides, so they need no mapping row.
_CP1252_PRINTABLE = "\u20ac\u201a\u0192\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039\u0152\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc\u2122\u0161\u203a\u0153\u017e\u0178"
_CP1252_AS_C1 = "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008a\u008b\u008c\u008e\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099\u009a\u009b\u009c\u009e\u009f"

# Structural UTF-8 validity over the latin1-char rendering of a byte
# string (each char U+0000-U+00FF IS the byte): the RFC 3629 table as a
# Java regex full-match. A string matching this AND containing at least
# one char >= U+0080 is exactly "valid multi-byte UTF-8 someone decoded
# with a single-byte charset".
_UTF8_SHAPE_RX = (
    "^(?:[\\x00-\\x7f]"
    "|[\\xc2-\\xdf][\\x80-\\xbf]"
    "|\\xe0[\\xa0-\\xbf][\\x80-\\xbf]"
    "|[\\xe1-\\xec\\xee\\xef][\\x80-\\xbf]{2}"
    "|\\xed[\\x80-\\x9f][\\x80-\\xbf]"
    "|\\xf0[\\x90-\\xbf][\\x80-\\xbf]{2}"
    "|[\\xf1-\\xf3][\\x80-\\xbf]{3}"
    "|\\xf4[\\x80-\\x8f][\\x80-\\xbf]{2})*$"
)


def fix_mojibake(col: Column) -> Column:
    """Repair ONE round of the classic web mojibake: text that was UTF-8
    bytes on the wire but was decoded as latin1 or cp1252. ftfy's core
    move (Speer 2019, ``ftfy.fixes.fix_encoding``) re-expressed as pure
    JVM codegen — no Python in the hot path, no external library:

    1. ``translate`` the 27 cp1252-printable 0x80-0x9F characters onto
       the C1 controls latin1 puts at those byte values (now every
       codepoint == its original byte value, if the story is right);
    2. fire ONLY when the full string now matches the structural UTF-8
       regex AND contains at least one non-ASCII char (so there is a
       multi-byte sequence to collapse) — a string with codepoints
       > U+00FF, or high bytes in non-UTF-8 positions (genuine latin1
       text typed by a human), can never match and passes through
       byte-identical;
    3. re-encode latin1 (chars == bytes, cannot fail on a matched
       string) and decode UTF-8 (structurally valid by the regex, cannot
       error or produce U+FFFD) — the WHEN guard short-circuits, so
       Spark 4's strict codingErrorAction never sees an unmappable row.

    The guard makes the repair conservative and idempotent: applied to
    already-clean text it is the identity (clean text either is ASCII or
    contains codepoints the regex rejects), and applied twice it fixes
    only the one encoding round it fixed the first time. Double-mojibake
    (two decode rounds) needs two applications by construction.

    Scale shape: one translate + two regex predicates + encode/decode,
    all whole-stage codegen; zero shuffle, zero Python.
    """
    t = F.translate(col, _CP1252_PRINTABLE, _CP1252_AS_C1)
    fire = t.rlike(_UTF8_SHAPE_RX) & t.rlike("[\\x80-\\xff]")
    return F.when(fire, F.decode(F.encode(t, "ISO-8859-1"), "UTF-8")).otherwise(
        col
    )
