"""Training-data mixture planning: per-source token budgets.

A pre-training corpus is assembled from SOURCES (CommonCrawl, books,
code, per-language slices, ...) in target PROPORTIONS — GPT-3's
weighted mix, The Pile's per-set epochs, XLM-R's temperature-rebalanced
languages (the p^alpha weight computation itself is
``q_lang_temperature`` in the driver gate; this module turns such
weights into an actual document selection). Given ``{source: weight}``
and a total token budget, pick a deterministic document subset whose
per-source token mass hits each source's share.

Semantics: per source, documents are taken in deterministic hash order
(epoch-shuffle analog, stable under repartitioning and corpus growth —
the same contract as ``sampling.keyed_quota_sample``, but the quota is
a TOKEN budget, not a row cap) until the budget is crossed; the
straddling document is included, so per-source mass is bounded by
``budget_s + max_doc_tokens`` — the same whole-document bound as
``chunking.shard_assign``.

Scale shape: the per-source running token total is a GROUPED two-phase
distributed prefix sum — range-partition by (source, hash-order key),
per-partition partial sums, per-(source, partition) bases computed from
the bounded totals collect (sources x partitions rows) and broadcast
back. Never a per-source single-partition window: with 10 sources over
10^12 rows that would serialize 10^11 rows through one task. Budgets
are config, computed driver-side in exact Python arithmetic and joined
as a broadcast dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions.textstats import token_count
from .dedup import _base_hash


def mixture_budgets(weights: dict[str, float], total_tokens: int) -> dict[str, int]:
    """{source: token budget}: floor-allocated shares of ``total_tokens``
    proportional to weight. Driver-side exact arithmetic (config, not
    data); leftovers from flooring go to the heaviest source so the
    budgets sum to ``total_tokens``."""
    w_sum = float(sum(weights.values()))
    if w_sum <= 0:
        raise ValueError("weights must sum to a positive value")
    budgets = {s: int(total_tokens * (w / w_sum)) for s, w in weights.items()}
    leftover = total_tokens - sum(budgets.values())
    if leftover:
        top = max(weights, key=lambda s: (weights[s], s))
        budgets[top] += leftover
    return budgets


def grouped_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    val_col: str,
    num_partitions: int | None = None,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """Adds ``offset`` = EXCLUSIVE running sum of ``val_col`` within each
    group in ``order_col`` order — the grouped form of
    ``chunking.pack_offsets``'s two-phase scan. Deterministic in
    (group, order) alone; the partitioned relation persists so the
    partition ids seen by the totals collect and the final plan are one
    evaluation (minhash precedent; pass ``unpersist_handles=[]`` to
    release)."""
    parted = (
        df.repartitionByRange(num_partitions, group_col, order_col)
        if num_partitions
        else df.repartitionByRange(group_col, order_col)
    )
    parted = parted.withColumn("_pid", F.spark_partition_id()).persist()
    if unpersist_handles is not None:
        unpersist_handles.append(parted)
    totals = (
        parted.groupBy(group_col, "_pid")
        .agg(F.sum(val_col).alias("_t"))
        .collect()
    )
    per_group: dict[str, list] = {}
    for r in totals:
        per_group.setdefault(r[group_col], []).append((r["_pid"], r["_t"]))
    bases = []
    for g, lst in per_group.items():
        acc = 0
        for pid, t in sorted(lst):
            bases.append((g, pid, acc))
            acc += t
    gtype = dict(df.dtypes)[group_col]
    base_df = df.sparkSession.createDataFrame(
        bases, schema=f"{group_col} {gtype}, _pid int, _base long"
    )
    w = (
        Window.partitionBy(group_col, "_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_ex = F.coalesce(F.sum(val_col).over(w), F.lit(0).cast("long"))
    return parted.join(F.broadcast(base_df), [group_col, "_pid"]).withColumn(
        "offset", (F.col("_base") + local_ex).cast("long")
    ).drop("_pid", "_base")


def plan_mixture(
    df: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    source_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    num_partitions: int | None = None,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """Per-document mixture plan: (id, source, n_tokens, offset, budget,
    selected). ``selected`` = the document's exclusive per-source token
    prefix is still under its source's budget (so the straddling doc is
    kept, and a source with no weight never selects). ``hash_fn='md5'``
    is the oracle-replayable variant."""
    budgets = mixture_budgets(weights, total_tokens)
    spark = df.sparkSession
    bdim = spark.createDataFrame(
        [(s, b) for s, b in sorted(budgets.items())], [source_col, "budget"]
    ).withColumn("budget", F.col("budget").cast("long"))
    counts = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        _base_hash(F.col(id_col).cast("string"), hash_fn).alias("_ord"),
    )
    with_off = grouped_prefix_sum(
        counts,
        source_col,
        "_ord",
        "n_tokens",
        num_partitions=num_partitions,
        unpersist_handles=unpersist_handles,
    )
    return (
        with_off.join(F.broadcast(bdim), source_col, "left")
        .withColumn("budget", F.coalesce(F.col("budget"), F.lit(0).cast("long")))
        .withColumn("selected", F.col("offset") < F.col("budget"))
        .select(id_col, source_col, "n_tokens", "offset", "budget", "selected")
    )


def mixture_summary(plan: DataFrame, source_col: str = "lang") -> DataFrame:
    """Per-source achieved mass: (source, budget, n_docs, n_tokens) over
    the selected set — the report a mixing job emits next to its output."""
    return (
        plan.filter(F.col("selected"))
        .groupBy(source_col, "budget")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
