"""Property-based cross-engine parity: the text functions must agree with
their DuckDB oracle fragments on ARBITRARY printable-ASCII inputs, not just
the synth corpus — randomized fuzz over tokenization edge cases (runs of
whitespace, leading/trailing separators, punctuation-only strings, empty
strings, digit/symbol boundaries)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from log_analysis_spark.functions import textstats as TS

# printable ASCII only: unicode case-mapping/whitespace classes can differ
# between Java regex and RE2/ICU — the engine contract is pinned on ASCII,
# and the corpus queries never rely on exotic-codepoint semantics
_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)

_TOKENS_SQL = "list_filter(regexp_split_to_array(trim(t), '\\s+'), x -> x != '')"
_FP_SQL = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(list_filter(regexp_split_to_array("
    "regexp_replace(lower(t), '[^a-z ]', '', 'g'), ''), c -> c != ''), "
    "c -> ord(c))), (acc, c) -> (acc * 31 + c) % 2147483647)"
)
_BPE_SQL = "len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT"


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=st.lists(_ASCII, min_size=1, max_size=6))
def test_token_fp_bpe_parity_on_random_ascii(spark, duck, texts):
    pdf = pd.DataFrame({"i": range(len(texts)), "t": texts})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "i",
            TS.token_count(F.col("t")).cast("long").alias("nt"),
            TS.fingerprint(F.col("t")).alias("fp"),
            TS.bpe_ish_token_count(F.col("t")).cast("long").alias("bpe"),
        )
        .orderBy("i")
        .collect()
    )
    duck.register("t_tbl", pdf)
    want = duck.execute(
        f"SELECT i, len({_TOKENS_SQL})::BIGINT AS nt, {_FP_SQL} AS fp, "
        f"{_BPE_SQL} AS bpe FROM t_tbl ORDER BY i"
    ).fetchall()
    duck.unregister("t_tbl")
    assert [(r["i"], r["nt"], r["fp"], r["bpe"]) for r in got] == [
        (int(i), int(nt), int(fp), int(bpe)) for i, nt, fp, bpe in want
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=st.lists(_ASCII, min_size=1, max_size=4))
def test_quality_chunking_parity_on_random_ascii(spark, duck, texts):
    """The round-4 operators (repetition stats, char-bigram familiarity,
    chunking, packing offsets) vs their OWN gate oracles — the exact SQL
    the driver runs — on arbitrary printable-ASCII corpora. Floats compare
    with ==: the determinism contract is bit-exact replay, and this fuzz
    hunts the inputs (whitespace runs, empties, punctuation-only) where an
    ordering or rounding assumption would crack first."""
    import __spark_entry__ as E

    from log_analysis_spark.operators.chunking import chunk_documents, pack_offsets
    from log_analysis_spark.operators.quality import (
        char_bigram_scores,
        repetition_stats,
    )

    sqls = E.oracle_sql()
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "lang": ["en"] * len(texts),
            "text": texts,
        }
    )
    sdf = spark.createDataFrame(pdf)
    duck.register("documents", pdf)
    try:
        pairs = [
            (repetition_stats(sdf), sqls["repetition_stats"]),
            (char_bigram_scores(sdf), sqls["char_bigram_scores"]),
            (
                chunk_documents(sdf, chunk_tokens=32, overlap=8),
                sqls["doc_chunks"],
            ),
            (
                pack_offsets(sdf, context_tokens=512, num_partitions=2),
                sqls["pack_offsets"],
            ),
        ]
        for got_df, sql in pairs:
            cols = sorted(got_df.columns)
            got = sorted(
                tuple(r[c] for c in cols) for r in got_df.collect()
            )
            want_pdf = duck.execute(sql).df()
            want = sorted(
                tuple(row[c] for c in cols)
                for _i, row in want_pdf.iterrows()
            )
            assert got == want, sql[:80]
    finally:
        duck.unregister("documents")
