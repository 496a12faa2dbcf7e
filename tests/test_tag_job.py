"""Tagger job (plans/tag_job.py): Dolma-style sidecar producer."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from log_analysis_spark.plans.tag_job import run_taggers
from log_analysis_spark.sources.jsonl import (
    SPAN_TYPE,
    read_attributes,
    write_docs_jsonl,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma delta SHARED RUN OF TOKENS HERE end"),
        (2, "one two SHARED RUN OF TOKENS HERE three"),
        (3, "contact me at bob@example.com please"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_run_taggers_sidecar_shapes(spark, tmpdir_path):
    out = f"{tmpdir_path}/attrs"
    src = f"{tmpdir_path}/docs"
    _docs(spark).write.parquet(src)
    stats = run_taggers(
        spark, src, out,
        ["tokens", "quality", "langid", "pii", "dup_spans"],
        k=5, hash_fn="md5",
    )
    assert stats["taggers"]["tokens"] == 3
    assert stats["taggers"]["pii"] == 3
    # only the two docs sharing the 5-token run get span rows
    assert stats["taggers"]["dup_spans"] == 2

    tok = read_attributes(
        spark, f"{out}/tokens",
        T.StructType([T.StructField("n_tokens", T.LongType())]),
    )
    got = {r["id"]: r["n_tokens"] for r in tok.collect()}
    assert got == {"1": 10, "2": 8, "3": 5}

    pii = read_attributes(
        spark, f"{out}/pii",
        T.StructType([T.StructField("n_emails", T.LongType())]),
    )
    assert {r["id"]: r["n_emails"] for r in pii.collect()} == {
        "1": 0, "2": 0, "3": 1,
    }

    spans = read_attributes(
        spark, f"{out}/dup_spans",
        T.StructType([T.StructField("dup_spans", SPAN_TYPE)]),
    )
    by_id = {r["id"]: r["dup_spans"] for r in spans.collect()}
    assert set(by_id) == {"1", "2"}
    # doc 1: "SHARED RUN OF TOKENS HERE" starts after "alpha beta gamma
    # delta " (23 chars incl. separators) and ends at char 48
    assert [(s["start"], s["end"]) for s in by_id["1"]] == [(23, 48)]
    assert [(s["start"], s["end"]) for s in by_id["2"]] == [(8, 33)]


def test_run_taggers_jsonl_input(spark, tmpdir_path):
    src = f"{tmpdir_path}/docs_jsonl"
    write_docs_jsonl(_docs(spark), src)
    out = f"{tmpdir_path}/attrs2"
    stats = run_taggers(spark, src, out, ["tokens"], jsonl=True)
    assert stats["taggers"]["tokens"] == 3


def test_run_taggers_unknown_tagger(spark, tmpdir_path):
    src = f"{tmpdir_path}/docs"
    _docs(spark).write.parquet(src)
    with pytest.raises(ValueError, match="unknown taggers"):
        run_taggers(spark, src, f"{tmpdir_path}/x", ["nope"])


def test_producer_to_curation_consumer_circle(spark, tmpdir_path):
    """tag_job's dup_spans sidecar feeds curation_job --attr-spans: the
    shared run vanishes from the normalized corpus, everything else
    survives. The one convention (single-space normalization) is applied
    corpus-side before curation, as the tag_job docstring requires."""
    from log_analysis_spark.functions.textstats import tokens
    from log_analysis_spark.plans.curation_job import run_curation

    src = f"{tmpdir_path}/docs_norm"
    _docs(spark).withColumn(
        "text", F.array_join(tokens(F.col("text")), " ")
    ).withColumn("lang", F.lit("en")).write.parquet(src)  # quality stage needs lang
    attrs_out = f"{tmpdir_path}/attrs3"
    run_taggers(spark, src, attrs_out, ["dup_spans"], k=5, hash_fn="md5")
    out = f"{tmpdir_path}/cur"
    r = run_curation(
        spark, src, out, span_k=99,  # inert scrub stage; the sidecar does the work
        attr_spans_path=f"{attrs_out}/dup_spans", attr_field="dup_spans",
        test_frac=0.0, valid_frac=0.0,
    )
    assert r["stages_run"][0] == "attr_scrub"
    texts = {
        r2["doc_id"]: r2["text"]
        for r2 in spark.read.parquet(f"{out}/stage_attr_scrub").collect()
    }
    assert "SHARED RUN" not in texts[1] and "SHARED RUN" not in texts[2]
    assert "alpha beta gamma delta" in texts[1]
    assert texts[3] == "contact me at bob@example.com please"
