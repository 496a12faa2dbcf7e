"""Benchmark decontamination for LLM training corpora.

Standard pre-training practice (GPT-3 appendix C's 13-gram filter; PaLM;
Llama 2's eval-overlap audit): before training, flag or drop every
training document that shares a word-n-gram with an evaluation/benchmark
set, so downstream eval numbers measure generalization rather than
memorization. The reference (a Zeek log pipeline) has no analog; this is
first-class capability for the 100 TB curation pipeline, same tier as
dedup.

Scale design
------------
The two sides are wildly asymmetric: the training corpus is 10^12
documents, the benchmark union is ~10^5-10^6 documents (~10^7-10^8
distinct n-grams == a few hundred MB as int64 hashes). So:

- the benchmark side reduces to DISTINCT n-gram hashes once and is
  **broadcast** — the corpus never shuffles for the membership probe;
- per-document gram sets materialize through ONE aggregation
  (``_hashed_shingle_sets`` — also the projection-collapse barrier, see
  ``operators.dedup``), the only corpus shuffle in the whole operator;
- the probe re-explodes the set and re-aggregates by the SAME key, so
  Catalyst reuses the existing hash partitioning — explode, broadcast
  join, and the count-agg all run in the same stage, no second exchange
  (pinned by ``tests/test_decontam.py::test_single_shuffle_plan``);
- ``broadcast_bench=False`` falls back to a shuffled join for benchmark
  sets past driver memory (then AQE picks the strategy).

Determinism: gram hashing is the shared ``dedup._base_hash`` (xxhash64 at
scale, 60-bit md5 for the cross-engine oracle); counts and the overlap
fraction are pure integer arithmetic plus one IEEE division, so a SQL
oracle replays the result bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hashed_shingle_sets, shingle_hash_rows


def benchmark_ngram_hashes(
    bench_df: DataFrame,
    text_col: str = "text",
    n: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_h: long) — the DISTINCT word-n-gram hashes of the benchmark set.

    Materialize this once per eval-suite release and reuse across runs
    (it is a plain DataFrame — write it to parquet and read it back).
    """
    rows = shingle_hash_rows(
        bench_df.select(F.monotonically_increasing_id().alias("_bid"), text_col),
        "_bid",
        text_col,
        n,
        hash_fn=hash_fn,
    )
    return rows.select("_h").distinct()


def contamination(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hash_fn: str = "xxhash64",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document benchmark-overlap audit.

    Returns one row per ``df`` document:
    (id_col, total_ngrams, contaminated_ngrams, contamination_frac,
    is_contaminated) where ``total_ngrams`` counts the document's DISTINCT
    n-gram hashes, ``contaminated_ngrams`` those also present anywhere in
    ``bench_df``, ``contamination_frac`` their ratio (NULL when the
    document is shorter than ``n`` tokens), and ``is_contaminated`` is
    ``1`` iff any gram overlaps.

    ``n`` trades recall for precision: 8-13 is standard for real corpora
    (GPT-3 used 13); small-SF tests use 3 so synthetic sentences overlap.
    """
    bench = benchmark_ngram_hashes(bench_df, text_col, n, hash_fn).withColumn(
        "_hit", F.lit(1)
    )
    if broadcast_bench:
        bench = F.broadcast(bench)
    sets = _hashed_shingle_sets(df, id_col, text_col, n, hash_fn=hash_fn)
    grams = sets.select("_id", F.explode("_sh").alias("_h"))
    probed = grams.join(bench, "_h", "left").groupBy("_id").agg(
        F.count(F.lit(1)).alias("total_ngrams"),
        F.count("_hit").alias("contaminated_ngrams"),
    )
    base = df.select(F.col(id_col).alias("_id"))
    out = base.join(probed, "_id", "left")
    total = F.coalesce(F.col("total_ngrams"), F.lit(0).cast("long"))
    cont = F.coalesce(F.col("contaminated_ngrams"), F.lit(0).cast("long"))
    return out.select(
        F.col("_id").alias(id_col),
        total.alias("total_ngrams"),
        cont.alias("contaminated_ngrams"),
        F.when(total > 0, cont.cast("double") / total.cast("double")).alias(
            "contamination_frac"
        ),
        (cont > 0).cast("int").alias("is_contaminated"),
    )


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    hash_fn: str = "xxhash64",
    max_frac: float = 0.0,
    broadcast_bench: bool = True,
) -> DataFrame:
    """``df`` minus contaminated documents (all original columns).

    ``max_frac=0.0`` (default) drops any document sharing even one n-gram
    with the benchmark — the conservative standard. A positive ``max_frac``
    keeps documents whose overlap fraction is <= the threshold (Llama-2
    style partial-overlap tolerance). Implemented as a join against the
    flagged-id set so the corpus passes through once.
    """
    audit = contamination(
        df, bench_df, id_col, text_col, n, hash_fn, broadcast_bench
    )
    bad = audit.filter(
        (F.col("is_contaminated") == 1)
        & (F.col("contamination_frac") > max_frac)
    ).select(id_col)
    return df.join(bad, id_col, "left_anti")
