"""Model-free document vectorization: hashed TF-IDF vectors.

Bridges the text stack to the similarity/ANN stack: documents become
fixed-dim `array<double>` unit vectors (the hashing trick over tokens,
weighted by corpus rarity), so EVERY vector operator in this repo —
cosine top-k, kNN join, LSH/IVF/PQ indexes, SemDeDup, embedding
near-dup — runs on plain text corpora with no external embedding model.
This is the classic pre-neural retrieval representation (Salton's
vector space model + the feature-hashing trick of Weinberger 2009, the
same trick `selection.py`/`classify.py` use for scalar features).

Construction (all deterministic, oracle-replayable):

- **tf**: one LEFT FOLD over the token-bucket occurrence array builds
  the dim-length count vector in a single pass (the array is referenced
  once as the fold input — the projection-collapse-safe form; a
  per-dimension ``filter`` would re-hash the tokens dim times).
- **rarity**: ``N / df_j`` per bucket — RATIONAL rarity, not log-idf,
  because ln() is not correctly rounded across libms (the same
  deliberate trade as ``tfidf_top_terms`` and BM25's rational mode;
  ranking is monotone-equivalent for single-term weights). df comes
  from one bounded aggregate (<= dim rows, collected and re-broadcast
  as a literal array — the kmeans/IVF driver-state contract).
- **normalize**: the shared left-fold sum-of-squares + one sqrt + one
  division per element (`dedup.normalized_vectors` semantics, replayed
  by the oracle's `_sql_normvec`).

Scale shape: the df aggregate is the only shuffle (explode + keyed agg
collapsing to <= dim rows via map-side partials); vector construction
and weighting are zero-shuffle projections. At dim=64..1024 the fold
costs dim adds per token occurrence — whole-stage codegen work, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.textstats import tokens
from .dedup import _base_hash


def _bucket_array(toks: Column, dim: int, hash_fn: str) -> Column:
    """array<long> of token bucket ids (occurrence order, multiplicity
    implicit) — unigrams only: vector dimensions model term presence,
    not the n-gram context features of selection/classify."""
    return F.transform(toks, lambda t: F.pmod(_base_hash(t, hash_fn), F.lit(dim)))


def _tf_vector(bk: Column, dim: int) -> Column:
    """Count vector via ONE fold over the occurrence array."""
    zeros = F.array(*([F.lit(0.0).cast("double")] * dim))
    return F.aggregate(
        bk,
        zeros,
        lambda acc, b: F.transform(
            acc,
            lambda v, i: v + F.when(i.cast("long") == b, F.lit(1.0)).otherwise(F.lit(0.0)),
        ),
    )


def hashed_tfidf_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, vec): unit-normalized hashed TF-IDF document vectors.

    Zero-token documents get a NULL vec (no direction exists) — filter
    before feeding ANN operators, matching their NULL contracts."""
    spark = df.sparkSession
    toks_df = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).repartition(spark.sparkContext.defaultParallelism)
    with_bk = toks_df.select(
        id_col, _bucket_array(F.col("_toks"), dim, hash_fn).alias("_bk")
    )
    # df_j: docs containing bucket j — bounded (<= dim rows)
    n_docs = df.count()
    rows = (
        with_bk.select(F.explode(F.array_distinct("_bk")).alias("_b"))
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_df"))
        .collect()
    )
    dfreq = {int(r["_b"]): int(r["_df"]) for r in rows}
    # rational rarity, one division each, computed driver-side
    rarity = [
        float(n_docs) / float(dfreq[j]) if dfreq.get(j) else 0.0 for j in range(dim)
    ]
    r_lit = F.array(*[F.lit(x).cast("double") for x in rarity])
    weighted = F.zip_with(_tf_vector(F.col("_bk"), dim), r_lit, lambda t, r: t * r)
    # AGGREGATION BARRIER before normalizing: the normalize lambda below
    # references `_w` per element, and projection collapse would otherwise
    # re-inline the whole tf-fold construction into every division —
    # O(dim^2 * tokens) per row, measured 49 s -> 4 s warm at sf0.1/dim=32
    # (the _hashed_shingle_sets trap; a repartition does NOT stop it).
    wmat = (
        with_bk.select(F.col(id_col), weighted.alias("_w"), F.size("_bk").alias("_n"))
        .groupBy(id_col)
        .agg(F.first("_w").alias("_w"), F.first("_n").alias("_n"))
    )
    # unit-normalize: left-fold sum of squares, one sqrt, one division per
    # element (dedup.normalized_vectors semantics / _sql_normvec replay);
    # over the now-concrete `_w` the per-element fold recompute is just
    # dim^2 adds — codegen noise
    ss = F.aggregate(
        F.col("_w"), F.lit(0.0).cast("double"), lambda a, x: a + x * x
    )
    vec = F.when(
        F.col("_n") > 0, F.transform(F.col("_w"), lambda x: x / F.sqrt(ss))
    )
    return wmat.select(id_col, vec.alias("vec"))
