"""Document chunking: boundary arithmetic, coverage, reconstruction."""

from __future__ import annotations

import pandas as pd
import pytest

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
