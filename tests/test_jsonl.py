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
    lines = []
    for part in glob.glob(os.path.join(p, "part-*.json.gz")):
        with gzip.open(part, "rt") as fh:
            lines += [ln for ln in fh if ln.strip()]
    assert len(lines) == 3 and all(ln.startswith('{"id":') for ln in lines)


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


def test_tagger_sidecar_scrub_circle(spark, tmpdir_path):
    """The full tag-then-filter circle: duplicate_span_attributes tags
    maximal duplicated runs, the spans ride a Dolma sidecar, remove_spans
    applies them over the SAME single-space normalization — the
    duplicated boilerplate vanishes, everything else survives."""
    import os

    from log_analysis_spark.functions.textstats import tokens
    from log_analysis_spark.operators.dedup import duplicate_span_attributes

    rows = [
        (1, "alpha beta gamma delta CALL NOW TO SUBSCRIBE epsilon"),
        (2, "one two three CALL NOW TO SUBSCRIBE four five"),
        (3, "no boilerplate in this one at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
        "text", F.array_join(tokens(F.col("text")), " ")
    )
    spans = duplicate_span_attributes(docs, k=4, hash_fn="md5")
    side = spans.groupBy(F.col("doc_id").alias("id")).agg(
        F.collect_list(
            F.struct(
                F.col("start"),
                F.col("end"),
                F.lit(1.0).alias("score"),
            )
        ).alias("dup_spans")
    )
    p = os.path.join(tmpdir_path, "attrs")
    write_attributes(side, p)
    back = read_attributes(
        spark, p, T.StructType([T.StructField("dup_spans", SPAN_TYPE)])
    )
    joined = docs.join(back, docs["doc_id"] == back["id"].cast("long"), "left")
    out = joined.select(
        "doc_id",
        F.when(
            F.col("dup_spans").isNotNull(),
            remove_spans(F.col("text"), F.col("dup_spans")),
        )
        .otherwise(F.col("text"))
        .alias("clean"),
    )
    got = {r["doc_id"]: r["clean"] for r in out.collect()}
    assert "CALL NOW" not in got[1] and "CALL NOW" not in got[2]
    assert "alpha beta gamma delta" in got[1] and "epsilon" in got[1]
    assert "one two three" in got[2] and "four five" in got[2]
    assert got[3] == "no boilerplate in this one at all"
