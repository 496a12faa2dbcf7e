"""Materialized inverted index: term -> postings, bucket-partitioned.

The text member of the materialized-index family (sign-LSH buckets / IVF
cells / IVF-PQ code cells, operators/similarity.py): term lookups over a
10^12-document corpus must not scan the corpus, so postings rows
(term, doc id, tf) are written PARTITIONED BY a hash bucket of the term.
A lookup computes the query term's bucket in the driver and reads ONLY
that directory — partition pruning at file-listing time, 1/n_buckets of
the index per probed term, before any IO. Conjunctive (AND) queries read
one directory per term and intersect by doc id.

Scale notes:
- The postings relation is O(corpus distinct (term, doc) pairs); the one
  shuffle in the build is the (term, doc) count aggregation, with
  map-side partials collapsing repeated terms per document first.
- Stopword-class terms make single postings lists enormous; the bucket
  partitioning spreads storage but a lookup for such a term still reads
  its whole list — the standard remedy rides on top (df-based stop list:
  drop terms whose document frequency exceeds a fraction of the corpus;
  `max_df_frac` applies it at build time, with the df relation being one
  more bounded-by-vocabulary aggregate).
- The layout appends per ingest batch like the IVF-PQ index stream:
  bucket = f(term) only, so new batches write to the same directories
  without rewriting old files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textstats import tokens
from .dedup import _base_hash


def term_bucket(term, n_buckets: int, hash_fn: str = "xxhash64"):
    return F.pmod(_base_hash(term, hash_fn), F.lit(n_buckets))


def postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
    max_df_frac: float | None = None,
) -> DataFrame:
    """(term, id, tf, _b) postings rows. ``max_df_frac`` drops terms
    whose document frequency exceeds that fraction of the corpus (the
    df relation is vocabulary-bounded and the join is term-keyed)."""
    out = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    if max_df_frac is not None:
        n_docs = df.count()
        dfreq = out.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
        keep = dfreq.filter(F.col("_df") <= int(max_df_frac * n_docs)).select("term")
        out = out.join(keep, "term")
    return out.withColumn("_b", term_bucket(F.col("term"), n_buckets, hash_fn))


def write_inverted_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
    max_df_frac: float | None = None,
) -> None:
    rows = postings(df, id_col, text_col, n_buckets, hash_fn, max_df_frac)
    rows.write.mode("overwrite").partitionBy("_b").parquet(path)


def _bucket_of(spark: SparkSession, term: str, n_buckets: int, hash_fn: str) -> int:
    row = spark.range(1).select(
        term_bucket(F.lit(term), n_buckets, hash_fn).alias("b")
    ).first()
    return int(row["b"])


def _read_index(spark: SparkSession, path: str, id_col: str) -> DataFrame:
    """Read the postings layout; an index whose build emptied the
    postings (e.g. max_df_frac dropped everything) has no part files and
    no inferable schema — that is an EMPTY index, not an error."""
    try:
        return spark.read.parquet(path)
    except Exception:  # noqa: BLE001 - fileless dir <=> AnalysisException
        return spark.createDataFrame(
            [], f"term string, {id_col} long, tf long, _b long"
        )


def term_lookup(
    spark: SparkSession,
    path: str,
    term: str,
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tf) for one term — reads exactly one bucket directory."""
    b = _bucket_of(spark, term, n_buckets, hash_fn)
    return (
        _read_index(spark, path, id_col)
        .filter((F.col("_b") == b) & (F.col("term") == term))
        .drop("_b", "term")
    )


def terms_lookup_all(
    spark: SparkSession,
    path: str,
    terms: list[str],
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Conjunctive (AND) lookup: ids containing EVERY term, with summed
    tf — reads one bucket directory per distinct term bucket. The
    intersection is a doc-keyed aggregate over the (tiny relative to
    corpus) union of the probed postings lists, HAVING count(distinct
    term) == |terms|."""
    if not terms:
        raise ValueError("terms_lookup_all: empty term list")
    uniq = sorted(set(terms))
    buckets = sorted({_bucket_of(spark, t, n_buckets, hash_fn) for t in uniq})
    idx = _read_index(spark, path, id_col)
    rows = idx.filter(
        F.col("_b").isin(buckets) & F.col("term").isin(uniq)
    )
    agg = rows.groupBy(id_col).agg(
        F.count_distinct("term").alias("_nt"),
        F.sum("tf").cast("long").alias("sum_tf"),
    )
    return agg.filter(F.col("_nt") == len(uniq)).drop("_nt")
