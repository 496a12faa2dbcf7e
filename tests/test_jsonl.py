"""Dolma-style JSONL interchange + attribute sidecars (sources/jsonl.py)."""

import gzip
import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from log_analysis_spark.sources.jsonl import (
    SPAN_TYPE,
    apply_attribute_filter,
    read_attributes,
    read_docs_jsonl,
    remove_spans,
    write_attributes,
    write_docs_jsonl,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma", "web", "en"),
        (2, "uno dos", "web", "es"),
        (3, "один два три", "books", "ru"),  # non-ASCII round trip
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source", "lang"])


def test_jsonl_roundtrip(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "docs")
    write_docs_jsonl(_docs(spark), p)
    back = read_docs_jsonl(spark, p).filter(F.col("_corrupt").isNull())
    got = {r["id"]: (r["text"], r["source"], r["lang"]) for r in back.collect()}
    assert got == {
        "1": ("alpha beta gamma", "web", "en"),
        "2": ("uno dos", "web", "es"),
        "3": ("один два три", "books", "ru"),
    }


def test_corrupt_line_dead_letters(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "docs")
    write_docs_jsonl(_docs(spark), p, compression="none")
    with open(os.path.join(p, "extra.json"), "w") as fh:
        fh.write('{"id": "4", "text": broken\n')
    # Spark disallows queries that reference ONLY the corrupt column on a
    # raw JSON scan — cache first (the documented pattern)
    df = read_docs_jsonl(spark, p).cache()
    try:
        assert df.filter(F.col("_corrupt").isNotNull()).count() == 1
        assert df.filter(F.col("_corrupt").isNull()).count() == 3
    finally:
        df.unpersist()


def test_gzip_on_disk(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "docs")
    write_docs_jsonl(_docs(spark), p)  # default gzip
    part = glob.glob(os.path.join(p, "part-*.json.gz"))[0]
    with gzip.open(part, "rt") as fh:
        assert fh.readline().startswith('{"id":')


def test_attribute_sidecar_filter(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "attrs")
    docs = _docs(spark).select(F.col("doc_id").cast("string").alias("id"), "text")
    attrs = docs.select(
        "id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    write_attributes(attrs, p)
    schema = T.StructType([T.StructField("n_tokens", T.LongType())])
    back = read_attributes(spark, p, schema)
    kept = apply_attribute_filter(docs, back, F.col("n_tokens") >= 3)
    assert {r["id"] for r in kept.collect()} == {"1", "3"}
    # the doc text column is untouched by the sidecar join
    assert "text" in kept.columns


def _scrub(spark, text, spans):
    schema = T.StructType(
        [T.StructField("t", T.StringType()), T.StructField("s", SPAN_TYPE)]
    )
    df = spark.createDataFrame([(text, spans)], schema)
    return df.select(remove_spans(F.col("t"), F.col("s")).alias("o")).first()["o"]


def test_remove_spans_basic(spark):
    assert _scrub(spark, "0123456789", [(2, 5, 1.0)]) == "0156789"
    assert _scrub(spark, "0123456789", [(0, 3, 1.0), (7, 10, 1.0)]) == "3456"


def test_remove_spans_overlap_and_nesting(spark):
    # overlapping spans merge via the running cursor max
    assert _scrub(spark, "0123456789", [(2, 6, 1.0), (4, 8, 1.0)]) == "0189"
    # nested span is swallowed entirely
    assert _scrub(spark, "0123456789", [(1, 9, 1.0), (3, 5, 1.0)]) == "09"
    # unsorted input is sorted by the fold
    assert _scrub(spark, "0123456789", [(7, 9, 1.0), (1, 3, 1.0)]) == "034569"


def test_remove_spans_edges(spark):
    # empty span list -> identity
    assert _scrub(spark, "abc", []) == "abc"
    # zero-width span -> identity
    assert _scrub(spark, "abc", [(1, 1, 1.0)]) == "abc"
    # span past the end clamps
    assert _scrub(spark, "abc", [(2, 99, 1.0)]) == "ab"
    # span fully past the end -> identity
    assert _scrub(spark, "abc", [(5, 9, 1.0)]) == "abc"
    # whole-string span -> empty
    assert _scrub(spark, "abc", [(0, 3, 1.0)]) == ""


def test_remove_spans_character_not_byte(spark):
    # offsets are CHARACTER positions (Dolma's span convention)
    assert _scrub(spark, "héllo wörld", [(0, 6, 1.0)]) == "wörld"
