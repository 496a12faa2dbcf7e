"""Text-analysis function tests against hand-computed values and the
documents table's declared labels."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from log_analysis_spark.functions import textstats as TS

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny(spark):
    pdf = pd.DataFrame(
        {
            "i": [0, 1, 2, 3],
            "text": [
                "the cat and the dog",
                "der hund und die katze ist da",
                "",
                "one-token",
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_token_count(tiny):
    got = {r["i"]: r["n"] for r in tiny.select("i", TS.token_count(F.col("text")).alias("n")).collect()}
    assert got == {0: 5, 1: 7, 2: 0, 3: 1}


def test_stopword_hits_multiplicity(tiny):
    got = {
        r["i"]: r["n"]
        for r in tiny.select("i", TS.stopword_hits(F.col("text"), "en").alias("n")).collect()
    }
    assert got[0] == 3  # 'the' x2 + 'and'
    assert got[2] == 0


def test_langid_on_tiny(tiny):
    got = {r["i"]: r["l"] for r in tiny.select("i", TS.langid(F.col("text")).alias("l")).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "unknown"


def test_langid_accuracy_on_synth_pages(spark):
    """The synth corpus embeds lang-correlated word pools (synth.py
    _LANG_WORDS) — langid must recover the label for the languages it
    models. (The driver's documents table has uncorrelated lang labels, so
    accuracy there is meaningless; parity on it is still oracle-checked.)"""
    from log_analysis_spark.synth import gen_pages_local

    pdf = gen_pages_local(1500)[["text", "lang"]]
    d = spark.createDataFrame(pdf)
    known = d.filter(F.col("lang").isin(list(TS.LANGID_ORDER))).select(
        "lang", TS.langid(F.col("text")).alias("pred")
    )
    n = known.count()
    correct = known.filter(F.col("lang") == F.col("pred")).count()
    assert n > 0
    assert correct / n >= 0.9


def test_fingerprint_known_value(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["ab c"]}))
    got = df.select(TS.fingerprint(F.col("text")).alias("f")).first()["f"]
    expect = 0
    for ch in "ab c":
        expect = (expect * 31 + ord(ch)) % 2147483647
    assert got == expect


def test_fingerprint_case_and_punct_invariant(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": [0, 1], "text": ["Hello, World 42!", "hello world "]})
    )
    got = {r["i"]: r["f"] for r in df.select("i", TS.fingerprint(F.col("text")).alias("f")).collect()}
    # lowercased, non-[a-z ] stripped -> both reduce to 'hello world '
    assert got[0] == got[1]


def test_quality_score_bounds(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = d.select(TS.quality_score(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).first()
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_shingles(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["a b c d", "a b", ""]}))
    got = [r["s"] for r in df.select(TS.shingles(F.col("text"), 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []
    assert got[2] == []


def test_redact_pii_masks_and_counts(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from log_analysis_spark.functions import textstats as TS

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "t": [
                    "mail a.b+c@example.co.uk from 192.168.0.1 and 10.0.0.2",
                    "no pii here",
                ]
            }
        )
    )
    n_e, n_i = TS.pii_counts(F.col("t"))
    rows = df.select(
        n_e.alias("ne"), n_i.alias("ni"), TS.redact_pii(F.col("t")).alias("r")
    ).collect()
    assert rows[0]["ne"] == 1 and rows[0]["ni"] == 2
    assert rows[0]["r"] == "mail <EMAIL> from <IP> and <IP>"
    assert rows[1]["ne"] == 0 and rows[1]["ni"] == 0
    assert rows[1]["r"] == "no pii here"


def test_script_counts_and_dominant(spark):
    from log_analysis_spark.functions.textstats import dominant_script, script_counts

    rows = [
        (1, "hello world"),
        (2, "Привет мир hello"),
        (3, "你好世界"),
        (4, "مرحبا بالعالم"),
        (5, "안녕하세요"),
        (6, "12345 !!!"),
        (7, "ab Привет"),  # tie 2-latin vs 6-cyrillic -> cyrillic
        (8, "abПр"),       # exact tie 2 vs 2 -> first in priority order: latin
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r["i"]: r
        for r in df.select(
            "i", *script_counts(F.col("t")), dominant_script(F.col("t")).alias("d")
        ).collect()
    }
    assert out[1]["n_latin"] == 10 and out[1]["d"] == "latin"
    assert out[2]["n_cyrillic"] == 9 and out[2]["d"] == "cyrillic"
    assert out[3]["n_cjk"] == 4 and out[3]["d"] == "cjk"
    assert out[4]["n_arabic"] == 12 and out[4]["d"] == "arabic"
    assert out[5]["n_hangul"] == 5 and out[5]["d"] == "hangul"
    assert out[6]["d"] == "none"
    assert out[7]["d"] == "cyrillic"
    assert out[8]["d"] == "latin"  # fixed priority order breaks exact ties
