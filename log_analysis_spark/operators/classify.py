"""Distributed linear quality-classifier training + inference.

LLM data pipelines gate documents with small linear classifiers over
cheap text features (GPT-3's LR quality filter over hashed features,
LLaMA/CCNet's fastText-style wiki-vs-crawl scoring). This module
trains one from scratch, Spark-first: a least-mean-squares linear
model over the SAME hashed unigram+bigram bucket features as the DSIR
selector (operators/selection.py), fit by full-batch gradient descent
on +-1 labels, then applied as a map-side scoring projection.

Feature representation: the RAW occurrence array (one bucket id per
unigram/bigram occurrence, multiplicity implicit) — never a
(bucket, count) aggregation. Scoring is a left fold over that array
(``acc + w[b]``, bias as the fold INIT), so inference is a pure
zero-shuffle projection with the weights riding as a literal array,
and the per-occurrence gradient contribution is just the doc residual
(``sum_i r_i * c_ib`` == sum over occurrences of ``r_i``).

Scale shape:

- Inference: zero shuffle, zero joins — tokenize, hash, fold.
- Training: the occurrence table is materialized once and persisted;
  each iteration is one map-side residual projection + ONE bounded
  gradient aggregate (<= n_buckets+1 rows collected per iteration —
  the same driver-state contract as ``similarity.kmeans``: model state
  is O(n_buckets) doubles, however large the corpus).

Determinism contract (the kmeans/pagerank/BPE family rule):

- ``deterministic=False`` (production): per-bucket gradients use
  associative ``sum`` — map-side partials collapse before the
  n_buckets-row shuffle.
- ``deterministic=True`` (oracle-replay witness): each bucket's
  gradient is a LEFT FOLD over its (doc-id)-sorted residual
  contributions, and every weight update is the literal three-step
  ``w + lr * (g / n)`` expression — every intermediate is a
  deterministic IEEE step DuckDB replays bit-for-bit by unrolling the
  iterations. Materializes per-bucket contribution lists: replay/test
  scale, not 10^12 rows.

The bias rides as a virtual occurrence (bucket ``n_buckets``) appended
once per document, so zero-token documents still train/score and the
replay needs no special case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.textstats import tokens
from .selection import hashed_feature_buckets


def doc_feature_occurrences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    hash_fn: str = "xxhash64",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, keep..., f) where f = array<long> of hashed unigram+bigram
    bucket ids in occurrence order (unigrams then bigrams), with the
    bias slot (bucket ``n_buckets``) appended last. Zero shuffle: the
    repartition materializes the token array once (projection-collapse
    trap, see operators/selection.py) and everything else is per-row."""
    toks_df = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        tokens(F.col(text_col)).alias("_toks"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    return toks_df.select(
        id_col,
        *keep_cols,
        F.concat(
            hashed_feature_buckets(F.col("_toks"), n_buckets, hash_fn),
            F.array(F.lit(n_buckets).cast("long")),
        ).alias("f"),
    )


def score_expr(f: Column, weights: list[float]) -> Column:
    """w . x as a left fold over the occurrence array: init 0.0, step
    ``acc + w[b]`` — one add per occurrence, multiplicity implicit.
    (The bias occurrence makes the init a plain zero.)"""
    w = F.array(*[F.lit(float(x)).cast("double") for x in weights])
    return F.aggregate(
        f,
        F.lit(0.0).cast("double"),
        lambda acc, b: acc + F.element_at(w, (b + 1).cast("int")),
    )


def train_linear_classifier(
    labeled: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    iters: int = 3,
    lr: float = 0.05,
    hash_fn: str = "xxhash64",
    deterministic: bool = False,
    unpersist_handles: list | None = None,
) -> list[float]:
    """Fit w (length n_buckets+1, bias last) by full-batch LMS gradient
    descent on ``label_col`` values +-1. Returns the weight list (pass
    to :func:`linear_scores` / :func:`score_expr`)."""
    feats = doc_feature_occurrences(
        labeled, id_col, text_col, n_buckets, hash_fn, keep_cols=(label_col,)
    ).persist()
    if unpersist_handles is not None:
        unpersist_handles.append(feats)
    n = feats.count()
    if n == 0:
        raise ValueError("train_linear_classifier: empty input")
    w = [0.0] * (n_buckets + 1)
    for _ in range(iters):
        contrib = feats.select(
            F.col(id_col),
            (F.col(label_col).cast("double") - score_expr(F.col("f"), w)).alias("_r"),
            F.explode("f").alias("_b"),
        )
        if deterministic:
            rows = (
                contrib.groupBy("_b")
                .agg(
                    F.aggregate(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col(id_col).alias("i"), F.col("_r").alias("g"))
                            )
                        ),
                        F.lit(0.0).cast("double"),
                        lambda acc, s: acc + s["g"],
                    ).alias("_gs")
                )
                .collect()
            )
        else:
            rows = contrib.groupBy("_b").agg(F.sum("_r").alias("_gs")).collect()
        grad = {int(r["_b"]): float(r["_gs"]) for r in rows}
        # literal three-step update the oracle replays: w + lr * (g / n)
        w = [w[b] + lr * (grad.get(b, 0.0) / n) for b in range(n_buckets + 1)]
    return w


def linear_scores(
    df: DataFrame,
    weights: list[float],
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, keep..., score, predicted): map-side inference — hashed
    occurrence array + weight-literal fold, zero shuffle. ``predicted``
    = score >= 0."""
    n_buckets = len(weights) - 1
    feats = doc_feature_occurrences(
        df, id_col, text_col, n_buckets, hash_fn, keep_cols=keep_cols
    )
    return feats.select(
        id_col,
        *keep_cols,
        score_expr(F.col("f"), weights).alias("score"),
    ).withColumn("predicted", F.col("score") >= 0.0)


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    n_bins: int = 10,
    lo: float = -1.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-diagram bins for a scored relation: clamp-floor the
    score into ``n_bins`` equal bins over [lo, hi] and report per bin
    (n, n_pos, min_score, max_score) — the classifier-ops diagnostic
    that says whether score 0.9 actually means 90% positive before a
    threshold is chosen. Every aggregate is order-independent (counts,
    min, max — deliberately NO float sum, whose partition-order rounding
    would break exact replay); the bin edge arithmetic is the identical
    literal expression in any ANSI engine, so the whole relation is
    oracle-exact. One map-side-combinable aggregation, <= n_bins rows
    out."""
    rel = (
        (F.col(score_col) - F.lit(lo))
        / F.lit(hi - lo)
        * F.lit(float(n_bins))
    )
    bin_ = F.greatest(
        F.least(F.floor(rel), F.lit(n_bins - 1).cast("long")),
        F.lit(0).cast("long"),
    )
    return (
        scored.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col(label_col) == F.lit(1.0)).cast("long"))
            .cast("long")
            .alias("n_pos"),
            F.min(score_col).alias("min_score"),
            F.max(score_col).alias("max_score"),
        )
        .orderBy("bin")
    )
