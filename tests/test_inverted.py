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


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def bm25_index(corpus, spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("inv25") / "idx")
    write_inverted_index(corpus, p, n_buckets=16, with_doclen=True)
    return p


def _py_bm25(corpus_rows, terms, k1=1.2, b=0.75, ln=True):
    """Independent Python implementation of the identical formula."""
    import math

    docs = {i: t.split() for i, t in corpus_rows}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    scores = {}
    for t in sorted(set(terms)):
        df = sum(1 for w in docs.values() if t in w)
        if df == 0:
            continue
        raw = (n - df + 0.5) / (df + 0.5) + 1.0
        idf = math.log(raw) if ln else raw
        for i, w in docs.items():
            tf = w.count(t)
            if tf:
                dl = len(w)
                scores[i] = scores.get(i, 0.0) + idf * (
                    (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
                )
    return scores


CORPUS_ROWS = [
    (1, "spark loves parquet and parquet loves spark"),
    (2, "spark joins tables"),
    (3, "tables of parquet data"),
    (4, "the the the the the"),
]


@pytest.mark.parametrize("mode,ln", [("lucene", True), ("rational", False)])
def test_bm25_matches_python_oracle(spark, bm25_index, mode, ln):
    from log_analysis_spark.operators.inverted import bm25_search

    got = {
        r["doc_id"]: r["score"]
        for r in bm25_search(
            spark, bm25_index, ["spark", "parquet"], n_buckets=16, idf_mode=mode
        ).collect()
    }
    want = _py_bm25(CORPUS_ROWS, ["spark", "parquet"], ln=ln)
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i], rel=1e-12)
    # doc 1 (both terms, high tf) must rank first
    assert max(got, key=got.get) == 1


def test_bm25_prunes_and_skips_stats_dir(spark, bm25_index):
    from log_analysis_spark.operators.inverted import bm25_search, term_lookup

    plan = (
        bm25_search(spark, bm25_index, ["parquet"], n_buckets=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "_b" in plan
    # the _stats side-table is invisible to plain index reads
    got = {r["doc_id"]: r["tf"] for r in term_lookup(spark, bm25_index, "parquet", 16).collect()}
    assert got == {1: 2, 3: 1}


def test_bm25_unknown_terms_and_empty(spark, bm25_index):
    from log_analysis_spark.operators.inverted import bm25_search

    assert bm25_search(spark, bm25_index, ["zzz"], n_buckets=16).count() == 0
    with pytest.raises(ValueError):
        bm25_search(spark, bm25_index, [])


def test_bm25_tie_break_deterministic(spark, tmpdir_path):
    from log_analysis_spark.operators.inverted import bm25_search, write_inverted_index

    rows = [(i, "same text here") for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = f"{tmpdir_path}/idx_tie"
    write_inverted_index(df, p, n_buckets=8, with_doclen=True)
    out = bm25_search(spark, p, ["same"], topk=3, n_buckets=8).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]  # equal scores -> id asc


# ---------------------------------------------------------------------------
# positional postings + phrase search
# ---------------------------------------------------------------------------
def test_phrase_search_golden(spark, tmpdir_path):
    from log_analysis_spark.operators.inverted import (
        phrase_search,
        write_inverted_index,
    )

    rows = [
        (1, "the cat sat on the cat mat"),
        (2, "cat the mat"),
        (3, "the cat the cat"),
        (4, "completely unrelated words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = f"{tmpdir_path}/idx_pos"
    write_inverted_index(df, p, n_buckets=8, with_positions=True)

    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(spark, p, ["the", "cat"], n_buckets=8).collect()
    }
    assert got == {1: 2, 3: 2}  # doc 2 has the words, never adjacent

    # repeated term in the phrase: each slot intersects its own list
    got3 = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(
            spark, p, ["the", "cat", "the"], n_buckets=8
        ).collect()
    }
    assert got3 == {3: 1}

    # single-term phrase degenerates to tf
    got1 = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(spark, p, ["cat"], n_buckets=8).collect()
    }
    assert got1 == {1: 2, 2: 1, 3: 2}


def test_phrase_search_pruning_and_empty(spark, tmpdir_path):
    import pytest as _pt

    from log_analysis_spark.operators.inverted import (
        phrase_search,
        write_inverted_index,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    p = f"{tmpdir_path}/idx_pos2"
    write_inverted_index(df, p, n_buckets=8, with_positions=True)
    plan = (
        phrase_search(spark, p, ["a", "b"], n_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "_b" in plan
    assert phrase_search(spark, p, ["a", "zzz"], n_buckets=8).count() == 0
    with _pt.raises(ValueError):
        phrase_search(spark, p, [])


# --------------------------------------------------------------------------
# snippets + per-bucket compaction
# --------------------------------------------------------------------------


def test_snippets_window_and_clamping(spark):
    """±window tokens around the FIRST hit; clamped at both array ends;
    docs without the term are absent; hit_pos is 1-based."""
    from log_analysis_spark.operators.inverted import snippets

    rows = [
        (1, "alpha beta target gamma delta epsilon zeta"),
        (2, "target at start of doc here"),
        (3, "ends with the target"),
        (4, "no hit in this document"),
        (5, "target early then target again later"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["hit_pos"], r["snippet"])
        for r in snippets(df, "target", window=2).collect()
    }
    assert got == {
        1: (3, "alpha beta target gamma delta"),
        2: (1, "target at start"),
        3: (4, "with the target"),
        5: (1, "target early then"),  # FIRST occurrence only
    }


def test_compact_index_bucket_single_run_same_answers(spark, tmpdir_path):
    """After two append runs land in a bucket, compaction leaves ONE
    parquet file, identical postings, and identical term_lookup
    answers — a pure re-layout."""
    import glob

    from log_analysis_spark.operators.inverted import (
        _bucket_of,
        compact_index_bucket,
        postings,
        term_lookup,
    )

    p = f"{tmpdir_path}/idx_c"
    a1 = spark.createDataFrame(
        [(1, "spark loves parquet"), (2, "parquet tables")],
        "doc_id long, text string",
    )
    a2 = spark.createDataFrame(
        [(3, "more parquet rows"), (4, "spark again")],
        "doc_id long, text string",
    )
    write_inverted_index(a1, p, n_buckets=4)
    postings(a2, n_buckets=4).write.mode("append").partitionBy("_b").parquet(p)

    b = _bucket_of(spark, "parquet", 4, "xxhash64")
    before = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in spark.read.parquet(f"{p}/_b={b}").collect()
    )
    want = {
        r["doc_id"]: r["tf"]
        for r in term_lookup(spark, p, "parquet", n_buckets=4).collect()
    }
    assert want == {1: 1, 2: 1, 3: 1}
    assert len(glob.glob(f"{p}/_b={b}/*.parquet")) >= 2  # two runs

    n = compact_index_bucket(spark, p, b)
    assert n == len(before)
    after = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in spark.read.parquet(f"{p}/_b={b}").collect()
    )
    assert after == before
    assert len(glob.glob(f"{p}/_b={b}/*.parquet")) == 1  # one sorted run
    got = {
        r["doc_id"]: r["tf"]
        for r in term_lookup(spark, p, "parquet", n_buckets=4).collect()
    }
    assert got == want
