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
