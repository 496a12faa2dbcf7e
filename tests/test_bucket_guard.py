"""Giant-bucket guard: oversized LSH buckets are excluded from candidate
generation without losing pairs that other bands still catch."""

from __future__ import annotations

import pandas as pd
import pytest

from log_analysis_spark.operators.dedup import minhash_lsh_pairs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_guard_off_equals_exact_semantics(spark, docs):
    base = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    huge_guard = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8, max_bucket=10**6
        ).collect()
    }
    assert base == huge_guard  # guard far above any bucket -> no effect


def test_guard_bounds_candidates_but_keeps_high_sim_pairs(spark, docs):
    base = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    guarded = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.8, max_bucket=16
        ).collect()
    }
    # guarded output is a subset of the exact-verified pairs...
    assert guarded <= base
    # ...and near-identical pairs survive: at j>=0.8 a pair shares most
    # bands; only pairs whose EVERY shared band is a giant bucket drop.
    if base:
        assert len(guarded) / len(base) >= 0.5


def test_guard_drops_degenerate_cluster(spark):
    """100 identical docs = one boilerplate cluster: with a tight guard,
    candidate pairs collapse instead of exploding quadratically."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(120),
            "text": ["the same boilerplate text repeated again and again here"] * 100
            + [f"unique doc number {i} with words alpha beta gamma delta {i}" for i in range(20)],
        }
    )
    df = spark.createDataFrame(pdf)
    unguarded = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.8).count()
    guarded = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.8, max_bucket=50
    ).count()
    assert unguarded == 100 * 99 / 2  # quadratic blowup
    assert guarded == 0  # cluster excluded wholesale (declared-dup path)