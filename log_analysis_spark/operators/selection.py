"""Importance-resampling data selection (DSIR; Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Given a large RAW corpus and a small TARGET corpus (the distribution you
want more of), estimate per-document importance weights from hashed
n-gram feature counts and select raw documents with probability
proportional to weight. The feature space is the hashing trick: word
unigrams + bigrams hashed into ``n_buckets`` cells, so model state is
O(n_buckets) however large either corpus is.

Scale shape:

- Bucket counts per side are ONE explode + keyed aggregate each —
  map-side partials collapse to <= n_buckets rows per partition, and the
  result (<= n_buckets integers) is a bounded driver collect, exactly
  like the IVF seed collect in operators/similarity.py.
- The per-bucket likelihood ratios ride the scoring projection as one
  literal array, so scoring is map-side: no join against the corpus, no
  shuffle except the one documented repartition barrier that
  materializes the token array before bigram construction (the
  projection-collapse trap — see operators/quality.py:95-103; a lambda
  that references the tokenize EXPRESSION re-splits the text once per
  element).
- The global max weight (for the acceptance threshold) is a 1-row
  aggregate broadcast back via crossJoin — the whitelisted
  bounded-broadcast pattern shared with similarity.quantized_topk.

Determinism / oracle replay: counts are exact integers; each smoothed
probability is one int->double division; a document's weight is a
LEFT FOLD over its VALUE-SORTED ratio list (equal doubles commute, so
value order is a total enough order); the acceptance test multiplies
instead of divides (u * w_max < weight) so no extra rounding step
exists. Every double is therefore bit-identical in DuckDB — the
production variant of this operator would work in log space, but ln()
is not correctly rounded across libms (same deliberate trade as the HLL
linear-counting branch, operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens
from .dedup import _base_hash

U_DENOM = float(1 << 60)  # md5_hash60 range -> uniform in [0, 1)


def _bigrams(toks: Column) -> Column:
    """Word bigrams from a CONCRETE token-array column (callers must
    materialize it behind an exchange first — see module docstring)."""
    k = F.size(toks) - 1
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def hashed_feature_buckets(toks: Column, n_buckets: int, hash_fn: str = "xxhash64") -> Column:
    """array<long> of hashed unigram+bigram feature buckets, with
    multiplicity (the multinomial model counts repeats)."""
    feats = F.concat(toks, _bigrams(toks))
    return F.transform(feats, lambda t: F.pmod(_base_hash(t, hash_fn), F.lit(n_buckets)))


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, hash_fn: str
) -> tuple[dict[int, int], int]:
    """{bucket: count} + total feature count — a BOUNDED collect
    (<= n_buckets rows)."""
    toks_df = df.select(tokens(F.col(text_col)).alias("_toks")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    counts = (
        toks_df.select(
            F.explode(hashed_feature_buckets(F.col("_toks"), n_buckets, hash_fn)).alias("_b")
        )
        .groupBy("_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    by_bucket = {int(r["_b"]): int(r["_c"]) for r in counts}
    return by_bucket, sum(by_bucket.values())


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, n_feats, weight): per-raw-document importance weight
    prod_f p_target(f) / p_raw(f) over its features (add-one smoothing),
    computed as a value-sorted left fold. Documents with no features
    weigh 1.0."""
    tc, tt = _bucket_counts(target, text_col, n_buckets, hash_fn)
    rc, rt = _bucket_counts(raw, text_col, n_buckets, hash_fn)
    ratios = []
    for b in range(n_buckets):
        num = (tc.get(b, 0) + 1) / (tt + n_buckets)
        den = (rc.get(b, 0) + 1) / (rt + n_buckets)
        ratios.append(num / den)
    lit_ratios = F.lit(ratios).cast("array<double>")

    toks_df = raw.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).repartition(F.col(id_col))
    feats = toks_df.select(
        id_col,
        hashed_feature_buckets(F.col("_toks"), n_buckets, hash_fn).alias("_f"),
    )
    weight = F.aggregate(
        F.array_sort(
            F.transform(
                F.col("_f"),
                lambda b: F.element_at(lit_ratios, (b + 1).cast("int")),
            )
        ),
        F.lit(1.0),
        lambda acc, v: acc * v,
    )
    return feats.select(
        id_col,
        F.size("_f").cast("long").alias("n_feats"),
        weight.alias("weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, n_feats, weight, selected): acceptance-sampling selection —
    keep a document iff u * max_weight < weight, where u is the
    deterministic md5 uniform of its id (the stratified_sample
    hash-threshold pattern). Multiplying by max_weight instead of
    normalizing keeps the replay to one extra double multiply."""
    w = dsir_weights(raw, target, id_col, text_col, n_buckets, hash_fn)
    wmax = w.agg(F.max("weight").alias("_wmax"))
    u = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(F.lit("sel"), F.col(id_col).cast("string")), "UTF-8")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        / F.lit(U_DENOM)
    )
    return (
        w.crossJoin(F.broadcast(wmax))
        .select(
            id_col,
            "n_feats",
            "weight",
            (u * F.col("_wmax") < F.col("weight")).alias("selected"),
        )
    )
