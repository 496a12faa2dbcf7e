"""Materialized MinHash text-dedup index (dedup.write_text_index /
text_gate_indexed): result-identity with the ad-hoc dedup_against gate,
partition-pruned probes, append-per-ingest maintenance, and the empty /
exact-only edges."""

from __future__ import annotations

import pytest

from log_analysis_spark.operators.dedup import (
    dedup_against,
    text_gate_indexed,
    write_text_index,
)

# 12-word docs so 3-gram shingle sets are rich enough for LSH at the
# test's band settings; c2' in the batch flips ONE word (jaccard ~0.8),
# b_novel shares nothing.
_CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river"),
    (2, "pack my box with five dozen liquor jugs before the long trip"),
    (4, "a stitch in time saves nine but haste makes waste they say"),
    (6, "every good boy deserves fudge while the band plays on tonight"),
]
_BATCH = [
    (1, "the quick brown fox jumps over the lazy dog near the river"),  # exact dup of 0
    (3, "pack my box with five dozen liquor jugs before the long voyage"),  # near dup of 2
    (5, "completely unrelated content about orbital mechanics and launch windows here"),
    (7, "another novel document describing deep sea vents and chemosynthetic life"),
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_gate_identity_with_dedup_against(spark, tmpdir_path, hash_fn):
    corpus, batch = _mk(spark, _CORPUS), _mk(spark, _BATCH)
    idx = f"{tmpdir_path}/tidx_{hash_fn}"
    write_text_index(
        corpus, idx, "doc_id", "text",
        num_perm=16, bands=8, n=3, hash_fn=hash_fn, n_buckets=4,
    )
    handles: list = []
    indexed = text_gate_indexed(
        spark, batch, idx, "doc_id", "text",
        num_perm=16, bands=8, n=3, threshold=0.5, hash_fn=hash_fn,
        n_buckets=4, unpersist_handles=handles,
    )
    adhoc = dedup_against(
        batch, corpus, "doc_id", "text",
        num_perm=16, bands=8, n=3, threshold=0.5, hash_fn=hash_fn,
    )
    got = sorted(r["doc_id"] for r in indexed.collect())
    want = sorted(r["doc_id"] for r in adhoc.collect())
    assert got == want
    assert 1 not in got  # exact dup gated by the hashes/ stage
    assert 3 not in got  # near dup gated by bands/ + sets/ verify
    assert {5, 7} <= set(got)  # novel docs survive
    for h in handles:
        h.unpersist()


def test_gate_probe_reads_are_partition_pruned(spark, tmpdir_path):
    corpus, batch = _mk(spark, _CORPUS), _mk(spark, _BATCH)
    idx = f"{tmpdir_path}/tidx_plan"
    write_text_index(
        corpus, idx, "doc_id", "text",
        num_perm=16, bands=8, n=3, hash_fn="xxhash64", n_buckets=4,
    )
    out = text_gate_indexed(
        spark, batch, idx, "doc_id", "text",
        num_perm=16, bands=8, n=3, threshold=0.5, hash_fn="xxhash64", n_buckets=4,
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every index scan (hashes/, bands/, sets/) rides a PartitionFilters
    # on its bucket column — corpus directories outside the batch's
    # bucket set are never file-listed
    assert plan.count("PartitionFilters: [_b") >= 3


def test_append_per_ingest_matches_full_rewrite(spark, tmpdir_path):
    corpus = _mk(spark, _CORPUS)
    batch1, batch2 = _mk(spark, _BATCH), _mk(
        spark,
        [
            # exact dup of a batch1 SURVIVOR (5) — only caught if the
            # append actually landed in the index
            (9, "completely unrelated content about orbital mechanics and launch windows here"),
            (11, "yet another fresh document on glacier mass balance and albedo feedback"),
        ],
    )
    kw = dict(num_perm=16, bands=8, n=3, hash_fn="xxhash64", n_buckets=4)
    idx = f"{tmpdir_path}/tidx_app"
    write_text_index(corpus, idx, "doc_id", "text", **kw)
    # materialize before appending: the gate result is LAZY and reads the
    # index — appending and then re-evaluating it would gate its own rows
    # against themselves (the production shape is the same: you append the
    # rows you actually ingested, not a live query over the index)
    surv1 = _mk(
        spark,
        [
            (r["doc_id"], r["text"])
            for r in text_gate_indexed(
                spark, batch1, idx, "doc_id", "text", threshold=0.5, **kw
            ).collect()
        ],
    )
    write_text_index(surv1, idx, "doc_id", "text", mode="append", **kw)
    got2 = sorted(
        r["doc_id"]
        for r in text_gate_indexed(
            spark, batch2, idx, "doc_id", "text", threshold=0.5, **kw
        ).collect()
    )
    # reference: one index over corpus + batch1 survivors, written fresh
    full = f"{tmpdir_path}/tidx_full"
    write_text_index(corpus.unionByName(surv1), full, "doc_id", "text", **kw)
    want2 = sorted(
        r["doc_id"]
        for r in text_gate_indexed(
            spark, batch2, full, "doc_id", "text", threshold=0.5, **kw
        ).collect()
    )
    assert got2 == want2 == [11]


def test_exact_only_and_empty_batch(spark, tmpdir_path):
    corpus = _mk(spark, _CORPUS)
    idx = f"{tmpdir_path}/tidx_edge"
    write_text_index(
        corpus, idx, "doc_id", "text",
        num_perm=16, bands=8, n=3, hash_fn="xxhash64", n_buckets=4,
    )
    batch = _mk(spark, _BATCH)
    # threshold=None: only the exact stage — the near-dup (3) survives
    got = sorted(
        r["doc_id"]
        for r in text_gate_indexed(
            spark, batch, idx, "doc_id", "text",
            num_perm=16, bands=8, n=3, threshold=None, hash_fn="xxhash64",
            n_buckets=4,
        ).collect()
    )
    assert got == [3, 5, 7]
    empty = _mk(spark, []).limit(0)
    assert (
        text_gate_indexed(
            spark, empty, idx, "doc_id", "text",
            num_perm=16, bands=8, n=3, threshold=0.5, hash_fn="xxhash64",
            n_buckets=4,
        ).count()
        == 0
    )


def test_bad_mode_rejected(spark, tmpdir_path):
    with pytest.raises(ValueError, match="mode"):
        write_text_index(
            _mk(spark, _CORPUS), f"{tmpdir_path}/x", "doc_id", "text", mode="merge"
        )
