"""Deterministic sampling operators for training-data pipelines.

``rand()``-based sampling is irreproducible across partitionings, retries,
and engines; every sampler here decides membership from a HASH of a stable
key, so the same row set is selected on any cluster size, on re-runs after
failure, and by the DuckDB oracle. All native Column expressions — the
sample predicate pushes into the scan (no shuffle, no Python).

Use cases: language-balanced subsetting (per-group rates), deterministic
train/valid/test splits keyed by document id or URL (a given document
always lands in the same split — critical for dedup-safe eval sets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_hash60

SCALE = 10_000  # rate granularity: 0.01%


def _bucket(key: Column) -> Column:
    """Stable [0, SCALE) bucket from a key — md5-based so any engine can
    replay membership exactly."""
    return F.pmod(md5_hash60(key.cast("string")), F.lit(SCALE))


def sample_stratified(
    df: DataFrame,
    group_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-group deterministic sampling: keep a row iff its key's hash
    bucket falls under the group's rate. Groups absent from ``fractions``
    use ``default_fraction``. Rates are exact to 1/SCALE in expectation and
    exactly reproducible row-for-row."""
    rate = F.lit(int(round(default_fraction * SCALE)))
    for g, frac in sorted(fractions.items()):
        rate = F.when(F.col(group_col) == g, F.lit(int(round(frac * SCALE)))).otherwise(rate)
    return df.filter(_bucket(F.col(key_col)) < rate)


def split_by_hash(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    valid_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic train/valid/test assignment as a ``_split`` column.
    A key always maps to the same split — safe against re-partitioning,
    retries, and incremental re-runs (new data never reshuffles old
    assignments)."""
    b = _bucket(F.col(key_col))
    t = int(round(test_fraction * SCALE))
    v = int(round(valid_fraction * SCALE))
    return df.withColumn(
        "_split",
        F.when(b < t, F.lit("test"))
        .when(b < t + v, F.lit("valid"))
        .otherwise(F.lit("train")),
    )


def keyed_quota_sample(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Per-key quota: keep at most ``cap`` rows per key, chosen as a
    deterministic uniform subset (host/domain balancing — web corpora cap
    pages per registrable domain so crawl-frontier skew doesn't dominate
    training mixes). Adds ``_rank`` (1-based within the key).

    Rows rank by (md5(id), id) inside each key, so the kept subset is
    stable under re-partitioning, retries, and growth that appends
    HIGHER-hash rows; ties are impossible because the id rides the sort.

    Scale: ONE keyed shuffle (the window). The md5 sort key makes the
    within-key order data-independent, so AQE's skew-split handles a hot
    domain's sort spill; if a key can exceed executor spill capacity
    (10^9+ rows), pre-thin with ``sample_stratified`` at rate
    ~OVERSAMPLE*cap/count before the exact window — the hash order makes
    the two-phase result IDENTICAL to the one-phase result as long as the
    threshold keeps >= cap rows per key.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(
        md5_hash60(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= cap)
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sample of k rows by priority sampling (Duffield, Lund &
    Thorup 2007): each row draws a deterministic uniform u in (0,1] from an
    md5 hash of its id and gets priority q = w / u; the k highest-priority
    rows are the sample. Inclusion probability is ~proportional to weight
    (exactly min(1, w/tau)), so token-weighted corpus subsetting keeps the
    long documents a uniform row sample would under-represent.

    Output: (id, weight, priority, est_weight) for the k winners, where
    ``est_weight = max(w, tau)`` with tau the (k+1)-th priority — the DLT
    unbiased per-row weight estimator (sum(est_weight) over the sample
    estimates total corpus weight; pinned in pytest).

    Determinism/replayability: u = (h+1)/2^60 with h = md5_hash60(id), so
    q = w * 2^60 / (h+1). The stored priority is exactly that: the 2^60
    multiply is a power-of-two exponent shift (no rounding) and the single
    division is one IEEE op — DuckDB replays both bit-exactly. The scale
    must stay: it cancels in the RANKING but not in the tau used by the
    estimator (est_weight compares tau against raw weights).

    Scale: map-side priority projection + global top-(k+1) — Spark's
    TakeOrdered keeps a per-partition heap and merges k+1 rows per
    partition on the driver; no full sort, no shuffle of the corpus. tau
    rides back via one 1-row broadcast join.
    """
    pr = df.select(
        F.col(id_col),
        F.col(weight_col).cast("double").alias("weight"),
        (
            (F.col(weight_col).cast("double") * F.lit(float(1 << 60)))
            / (md5_hash60(F.col(id_col).cast("string")) + F.lit(1)).cast("double")
        ).alias("priority"),
    ).filter(F.col("weight") > 0)
    top = pr.orderBy(F.desc("priority"), F.asc(id_col)).limit(k + 1)
    # tau = lowest of the k+1 priorities = the threshold; the k winners are
    # the rest. Both come from the SAME bounded (k+1)-row relation. When the
    # corpus has <= k weighted rows there is no threshold — every row is
    # sampled and its estimate is its exact weight (tau NULL -> coalesce).
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("priority"), F.asc(id_col))
    ranked = top.withColumn("_r", F.row_number().over(w))
    tau = ranked.agg(
        F.min(F.when(F.col("_r") == k + 1, F.col("priority"))).alias("_tau")
    )
    return (
        ranked.filter(F.col("_r") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            id_col,
            "weight",
            "priority",
            F.greatest(
                F.col("weight"), F.coalesce(F.col("_tau"), F.col("weight"))
            ).alias("est_weight"),
        )
    )


def priority_sample_per_group(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    group_col: str,
    k: int,
) -> DataFrame:
    """Per-group weighted priority sample: k rows PER GROUP with inclusion
    ~proportional to weight inside each group — per-language corpus quotas
    where long documents should win, with the same DLT estimator contract
    as :func:`priority_sample` applied group-wise (per-group tau from the
    (k+1)-th priority; groups with <= k rows keep everything, estimates
    exact).

    One keyed shuffle (the group window); priorities are the identical
    md5-uniform arithmetic, so the per-group winner sets, taus, and
    estimates replay bit-for-bit in the oracle. Group cardinality bounds
    nothing here — a group's rank window is a linear within-partition
    scan, and AQE splits a skewed group's sort spill.
    """
    from pyspark.sql.window import Window

    pr = df.select(
        F.col(group_col),
        F.col(id_col),
        F.col(weight_col).cast("double").alias("weight"),
        (
            (F.col(weight_col).cast("double") * F.lit(float(1 << 60)))
            / (md5_hash60(F.col(id_col).cast("string")) + F.lit(1)).cast("double")
        ).alias("priority"),
    ).filter(F.col("weight") > 0)
    w = Window.partitionBy(group_col).orderBy(F.desc("priority"), F.asc(id_col))
    wg = Window.partitionBy(group_col)
    ranked = pr.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k + 1
    )
    tagged = ranked.withColumn(
        "_tau",
        F.max(F.when(F.col("_r") == k + 1, F.col("priority"))).over(wg),
    )
    return tagged.filter(F.col("_r") <= k).select(
        group_col,
        id_col,
        "weight",
        "priority",
        F.greatest(
            F.col("weight"), F.coalesce(F.col("_tau"), F.col("weight"))
        ).alias("est_weight"),
    )
