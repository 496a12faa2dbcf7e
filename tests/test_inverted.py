"""Materialized inverted index (operators/inverted.py)."""

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.inverted import (
    term_lookup,
    terms_lookup_all,
    write_inverted_index,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark loves parquet and parquet loves spark"),
        (2, "spark joins tables"),
        (3, "tables of parquet data"),
        (4, "the the the the the"),  # stopword-class doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index_path(corpus, spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("inv") / "idx")
    write_inverted_index(corpus, p, n_buckets=16)
    return p


def test_single_term_lookup(spark, index_path):
    got = {r["doc_id"]: r["tf"] for r in term_lookup(spark, index_path, "parquet", 16).collect()}
    assert got == {1: 2, 3: 1}


def test_conjunctive_lookup(spark, index_path):
    got = {
        r["doc_id"]: r["sum_tf"]
        for r in terms_lookup_all(spark, index_path, ["spark", "parquet"], n_buckets=16).collect()
    }
    assert got == {1: 4}  # 2x spark + 2x parquet; docs 2,3 have only one term


def test_lookup_prunes_partitions(spark, index_path):
    plan = term_lookup(spark, index_path, "parquet", 16)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PartitionFilters" in plan and "_b" in plan
    # the scan must keep the term filter too (pushed to parquet)
    assert "term" in plan


def test_max_df_frac_drops_stopwords(spark, corpus, tmpdir_path):
    p = f"{tmpdir_path}/idx_df"
    write_inverted_index(corpus, p, n_buckets=16, max_df_frac=0.6)
    # 'the' appears in 1/4 docs -> kept; raise bar: 'spark' in 2/4 kept at .6
    # use a term in 3/4 docs? none; instead assert 'the' survives and a
    # synthetic high-df term does not
    rows = [(i, "common word here.") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p2 = f"{tmpdir_path}/idx_df2"
    write_inverted_index(df, p2, n_buckets=16, max_df_frac=0.5)
    assert term_lookup(spark, p2, "common", 16).count() == 0  # df=100% > 50%
    assert term_lookup(spark, p, "parquet", 16).count() == 2
