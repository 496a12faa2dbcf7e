"""Unicode normalization tests: semantics, NFKC, and cross-engine NFC
parity (CPython unicodedata vs DuckDB utf8proc) under fuzz."""

import unicodedata

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from log_analysis_spark.functions.normalize import (
    clean_text,
    clean_text_oracle,
)

CASES = [
    # (raw, cleaned-NFC)
    ("hello  world", "hello world"),
    ("  lead and trail\t\n", "lead and trail"),
    ("éclair", "éclair"),  # combining acute -> precomposed é
    ("a\x00b\x07c", "abc"),  # C0 controls stripped
    ("a\x0bb", "ab"),  # vertical tab is a control here, not whitespace
    ("", ""),
    ("   ", ""),
    ("é", "é"),  # already NFC: unchanged
    # fuzz-found: stripping the control joins Y and the combining grave;
    # NFC must run AFTER the strip so they compose (U+1EF2)
    ("Y\x0b̀", "Ỳ"),
]


def test_clean_text_cases(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(CASES)], ["i", "t"])
    got = {
        r.i: r.c
        for r in df.select("i", clean_text(F.col("t")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, CASES[i], got[i])


def test_nfkc_folds_compat_forms(spark):
    df = spark.createDataFrame([("ﬁle ²",)], ["t"])
    (row,) = df.select(clean_text(F.col("t"), form="NFKC").alias("c")).collect()
    assert row.c == "file 2"
    with pytest.raises(ValueError):
        clean_text(F.col("t"), form="NFD")


def test_oracle_matches_on_cases(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(CASES)], ["i", "t"])
    got = {
        r.i: r.c
        for r in df.select("i", clean_text(F.col("t")).alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, r) for i, (r, _) in enumerate(CASES)])
    want = dict(con.execute(f"SELECT i, {clean_text_oracle('t')} FROM t").fetchall())
    assert got == want


# Alphabet chosen to exercise composition: ASCII, precomposed Latin-1,
# combining marks (acute/grave/tilde/cedilla), Greek, Hangul jamo (NFC
# composes L+V+T into syllables), whitespace and controls.
FUZZ_ALPHABET = (
    "ab XY.\t\n\x0b\x07"
    "éñéñç̀"
    "αάά"
    "각각"
)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet=FUZZ_ALPHABET, min_size=0, max_size=40),
        min_size=1,
        max_size=16,
    )
)
def test_nfc_parity_fuzz(spark, texts):
    """CPython NFC == utf8proc NFC through the full clean pipeline."""
    df = spark.createDataFrame(list(enumerate(texts)), ["i", "t"])
    got = {
        r.i: r.c
        for r in df.select("i", clean_text(F.col("t")).alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    want = dict(con.execute(f"SELECT i, {clean_text_oracle('t')} FROM t").fetchall())
    assert got == want
    # and CPython's own unicodedata agrees the result is NFC-stable
    for v in got.values():
        assert unicodedata.is_normalized("NFC", v)
