"""Document chunking: boundary arithmetic, coverage, reconstruction."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    " ".join(f"t{i}" for i in range(10)),  # 10 tokens
                    "a b c",                               # shorter than a chunk
                    "",                                    # empty
                ],
            }
        )
    )


def test_chunk_boundaries_and_overlap(docs):
    rows = sorted(
        (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1)
        .filter("doc_id = 1")
        .collect()
    )
    # step 3: starts 1, 4, 7 over 10 tokens
    assert rows == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]


def test_short_and_empty_docs_one_chunk(docs):
    rows = {
        r["doc_id"]: r
        for r in chunk_documents(docs, chunk_tokens=4, overlap=1)
        .filter("doc_id >= 2")
        .collect()
    }
    assert rows[2]["chunk_idx"] == 0 and rows[2]["n_tokens"] == 3
    assert rows[2]["chunk_text"] == "a b c"
    assert rows[3]["chunk_idx"] == 0 and rows[3]["n_tokens"] == 0
    assert rows[3]["chunk_text"] == ""


def test_chunks_reconstruct_original(spark):
    """Dropping each chunk's leading ``overlap`` tokens (except chunk 0)
    and concatenating in chunk order reproduces the token stream — i.e.
    full coverage, no gaps, exact overlap."""
    text = " ".join(f"w{i}" for i in range(137))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    chunks = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=32, overlap=8).collect()
    )
    toks: list[str] = []
    for idx, ct in chunks:
        parts = ct.split()
        toks.extend(parts if idx == 0 else parts[8:])
    assert toks == text.split()
    # every chunk except possibly the last is full-size
    sizes = [len(ct.split()) for _i, ct in chunks]
    assert all(s == 32 for s in sizes[:-1]) and 0 < sizes[-1] <= 32


def test_overlap_must_be_smaller_than_chunk(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_pack_offsets_match_serial_prefix_sum(spark):
    from log_analysis_spark.operators.chunking import pack_offsets

    pdf = pd.DataFrame(
        {
            "doc_id": list(range(50)),
            "text": [" ".join(f"t{j}" for j in range(3 + (i * 7) % 20)) for i in range(50)],
        }
    )
    df = spark.createDataFrame(pdf)
    handles: list = []
    got = {
        r["doc_id"]: (r["n_tokens"], r["offset"], r["pack_id"], r["offset_in_pack"])
        for r in pack_offsets(df, context_tokens=32, num_partitions=4,
                              unpersist_handles=handles).collect()
    }
    for h in handles:
        h.unpersist()
    acc = 0
    for i in range(50):
        nt = 3 + (i * 7) % 20
        assert got[i] == (nt, acc, acc // 32, acc % 32), i
        acc += nt


def test_pack_offsets_independent_of_partitioning(spark):
    """Offsets depend only on id order — 2-partition and 8-partition runs
    must produce identical rows (the two-phase scan's determinism
    contract)."""
    from log_analysis_spark.operators.chunking import pack_offsets

    pdf = pd.DataFrame(
        {"doc_id": list(range(40)), "text": ["x " * (1 + i % 9) for i in range(40)]}
    )
    df = spark.createDataFrame(pdf)
    a = sorted(tuple(r) for r in pack_offsets(df, context_tokens=16, num_partitions=2).collect())
    b = sorted(tuple(r) for r in pack_offsets(df, context_tokens=16, num_partitions=8).collect())
    assert a == b


# ---------------------------------------------------------------------------
# token-budget sharding
# ---------------------------------------------------------------------------
def test_shard_assign_bounds_and_continuity(spark):
    from log_analysis_spark.operators.chunking import shard_assign

    rows = [(i, " ".join(["w"] * (20 + (i * 37) % 180))) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = shard_assign(df, shard_tokens=1000, num_partitions=4).collect()
    by_shard = {}
    max_doc = max((20 + (i * 37) % 180) for i in range(200))
    for r in a:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 3
    for s, docs in by_shard.items():
        tok = sum(d.n_tokens for d in docs)
        assert tok < 1000 + max_doc  # budget + one straddling doc
        if s + 1 in by_shard:  # shards are contiguous id ranges
            assert max(d.doc_id for d in docs) < min(
                d.doc_id for d in by_shard[s + 1]
            )


def test_shard_assign_stable_under_partitioning(spark):
    from log_analysis_spark.operators.chunking import shard_assign

    rows = [(i, " ".join(["w"] * (5 + i % 50))) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.doc_id: r.shard for r in shard_assign(df, shard_tokens=300, num_partitions=2).collect()}
    b = {
        r.doc_id: r.shard
        for r in shard_assign(
            df.repartition(11), shard_tokens=300, num_partitions=7
        ).collect()
    }
    assert a == b


def test_write_token_shards_roundtrip_and_pruning(spark, tmpdir_path):
    from log_analysis_spark.operators.chunking import write_token_shards

    rows = [(i, " ".join(["tok"] * (30 + (i * 13) % 90)), f"l{i%2}") for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = f"{tmpdir_path}/shards"
    stats = write_token_shards(df, path, shard_tokens=1500)
    assert stats["total_docs"] == 150
    assert stats["n_shards"] >= 3
    assert stats["max_tokens"] < 1500 + 120
    back = spark.read.parquet(path)
    assert back.count() == 150
    assert set(back.columns) >= {"doc_id", "text", "lang", "n_tokens", "shard"}
    # partition pruning: one shard directory read shows a PartitionFilters plan
    one = back.filter(F.col("shard") == 0)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan
    # shard dirs on disk
    import os

    assert any(d.startswith("shard=") for d in os.listdir(path))
