"""Benchmark decontamination: planted overlap, edge docs, plan shape."""

from __future__ import annotations

import pandas as pd
import pytest

from log_analysis_spark.operators.decontam import contamination, decontaminate


@pytest.fixture(scope="module")
def corpus(spark):
    # bench doc shares the 3-gram "red fox jumps" with train doc 1 only
    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick red fox jumps over fences",  # contaminated
                    "a completely different training text here",  # clean
                    "tiny doc",  # < 3 tokens -> zero grams
                    "",  # empty
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["benchmark red fox jumps question"]})
    )
    return train, bench


def test_planted_contamination(corpus):
    train, bench = corpus
    rows = {
        r["doc_id"]: r
        for r in contamination(train, bench, n=3, hash_fn="md5").collect()
    }
    assert rows[1]["is_contaminated"] == 1
    assert rows[1]["contaminated_ngrams"] == 1  # exactly "red fox jumps"
    assert rows[1]["total_ngrams"] == 5
    assert rows[1]["contamination_frac"] == pytest.approx(0.2)
    assert rows[2]["is_contaminated"] == 0
    assert rows[2]["contaminated_ngrams"] == 0
    # zero-gram docs stay in the audit with totals 0 and NULL frac
    for did in (3, 4):
        assert rows[did]["total_ngrams"] == 0
        assert rows[did]["contamination_frac"] is None
        assert rows[did]["is_contaminated"] == 0
    assert set(rows) == {1, 2, 3, 4}


def test_decontaminate_drops_flagged(corpus):
    train, bench = corpus
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, bench, n=3, hash_fn="md5").collect()
    )
    assert kept == [2, 3, 4]
    # threshold above the planted 0.2 overlap keeps everything
    kept_all = sorted(
        r["doc_id"]
        for r in decontaminate(train, bench, n=3, hash_fn="md5", max_frac=0.5).collect()
    )
    assert kept_all == [1, 2, 3, 4]


def test_single_shuffle_plan(corpus):
    """The probe must reuse the gram-set aggregation's partitioning: the
    bench side is broadcast, and the only corpus exchanges are the window
    shuffle inside shingle_hash_rows plus the set-agg — the explode ->
    broadcast join -> re-agg adds NO exchange on the corpus side."""
    train, bench = corpus
    plan = (
        contamination(train, bench, n=3, hash_fn="md5")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # exchanges: tokenize window + collect_set agg on the corpus, the
    # broadcast exchange for the bench set, one for the bench-side
    # distinct, bench-side window, and the final left join back to ids.
    n_corpus_shuffles = plan.count("Exchange hashpartitioning(_id")
    assert n_corpus_shuffles <= 2, plan
