"""Document chunking for LLM training-data preparation.

The step between curation and tokenizer ingest: long documents split into
fixed-size token windows with overlap (context-window packing's input).
No reference analog (the reference processes network logs); the contract
follows standard pre-training practice.

Scale design: tokens materialize once per document behind an exchange
barrier (the projection-collapse trap — see operators.quality), chunk
starts derive arithmetically, and each chunk is a native ``slice`` off
the concrete token array; one ``posexplode`` emits (doc, chunk) rows.
Zero Python, one shuffle (the barrier), output rows ~ input tokens /
(chunk_tokens - overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) — fixed token windows.

    Chunk i starts at token ``1 + i * (chunk_tokens - overlap)`` and spans
    up to ``chunk_tokens`` tokens; consecutive chunks share ``overlap``
    tokens. Starts run while ``start <= max(n_tokens - overlap, 1)``, so:
    every token lands in at least one chunk, a document of at most
    ``chunk_tokens`` tokens yields exactly one chunk, and no chunk is a
    strict suffix-duplicate of its predecessor (the final chunk always
    carries more than ``overlap`` new... at least one new token). Empty
    documents yield one empty chunk (chunk_idx 0, n_tokens 0) so the
    output covers every input row.

    Deterministic: chunk boundaries are pure integer arithmetic on the
    token count; an oracle replays text and counts exactly.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens ({chunk_tokens})"
        )
    step = chunk_tokens - overlap
    toks_df = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    ).repartition("_id")
    n = F.size("_toks")
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step))
    exploded = toks_df.select(
        "_id", "_toks", F.posexplode(starts).alias("_ci", "_s")
    )
    out = exploded.select(
        "_id", "_ci", F.slice("_toks", F.col("_s"), chunk_tokens).alias("_chunk")
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_ci").cast("long").alias("chunk_idx"),
        F.size("_chunk").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "_chunk").alias("chunk_text"),
    )


def pack_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    context_tokens: int = 2048,
    num_partitions: int | None = None,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """(id, n_tokens, offset, pack_id, offset_in_pack) — concat-then-split
    sequence packing: documents concatenate in id order into one global
    token stream cut every ``context_tokens`` (the standard pre-training
    packing layout; documents may span pack boundaries). ``offset`` is the
    EXCLUSIVE prefix sum of token counts in id order — where this doc's
    first token lands in the stream.

    The prefix sum is the textbook two-phase distributed scan, NOT a
    global single-partition window (which would serialize 10^12 rows
    through one task): range-partition by id, per-PARTITION running sum
    (a window whose partition key is the physical partition — parallel),
    then add each partition's base offset, computed from the tiny
    per-partition totals on the driver and broadcast back. Offsets depend
    only on id order, not on partition boundaries, so the result is
    deterministic and SQL-replayable (one window in the oracle).

    The partitioned relation persists so the partition-id assignment seen
    by the totals collection and by the final plan is the same evaluation;
    pass ``unpersist_handles=[]`` to release it after materializing
    (minhash precedent).
    """
    from ..functions.textstats import token_count

    counts = df.select(
        F.col(id_col).alias("_id"),
        token_count(F.col(text_col)).cast("long").alias("_nt"),
    )
    parted = (
        counts.repartitionByRange(num_partitions, "_id")
        if num_partitions
        else counts.repartitionByRange("_id")
    )
    parted = parted.withColumn("_pid", F.spark_partition_id()).persist()
    if unpersist_handles is not None:
        unpersist_handles.append(parted)
    totals = {
        r["_pid"]: r["_t"]
        for r in parted.groupBy("_pid").agg(F.sum("_nt").alias("_t")).collect()
    }
    base, acc = {}, 0
    for pid in sorted(totals):
        base[pid] = acc
        acc += totals[pid]
    base_df = df.sparkSession.createDataFrame(
        [(pid, b) for pid, b in sorted(base.items())], ["_pid", "_base"]
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("_pid")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_ex = F.coalesce(F.sum("_nt").over(w), F.lit(0).cast("long"))
    out = parted.join(F.broadcast(base_df), "_pid").select(
        F.col("_id").alias(id_col),
        F.col("_nt").alias("n_tokens"),
        (F.col("_base") + local_ex).alias("offset"),
    )
    return out.select(
        id_col,
        "n_tokens",
        "offset",
        F.floor(F.col("offset") / context_tokens).cast("long").alias("pack_id"),
        (F.col("offset") % context_tokens).cast("long").alias("offset_in_pack"),
    )


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_tokens: int = 1 << 20,
    num_partitions: int | None = None,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """(id, n_tokens, offset, shard) — contiguous token-budget sharding:
    documents in id order, shard = floor(exclusive-prefix-tokens /
    shard_tokens), documents NEVER split (a doc straddling a boundary
    belongs wholly to the shard where it starts). Per-shard token mass is
    bounded by ``shard_tokens + max_doc_tokens`` — the balanced-output
    layout a tokenizer-ingest job wants ("~1M tokens per file"), without
    next-fit bin packing's sequential scan (whose fill-state crosses
    partition boundaries and cannot be stitched exactly).

    Same two-phase distributed prefix sum as :func:`pack_offsets` (never
    a global single-partition window); deterministic in id order, so
    shard membership is stable across partitionings and re-runs.
    """
    out = pack_offsets(
        df,
        id_col=id_col,
        text_col=text_col,
        context_tokens=shard_tokens,
        num_partitions=num_partitions,
        unpersist_handles=unpersist_handles,
    )
    return out.select(
        id_col, "n_tokens", "offset", F.col("pack_id").alias("shard")
    )


def write_token_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_tokens: int = 1 << 20,
    num_partitions: int | None = None,
) -> dict:
    """Materialize the corpus as token-balanced shard directories:
    ``path/shard=K/``, each holding whole documents totalling ~
    ``shard_tokens`` tokens (bound: < shard_tokens + max doc). Returns
    balance stats. One keyed shuffle (clustering rows by shard before the
    partitionBy write keeps one file per shard instead of one per
    (task, shard) pair); shard directories are partition-pruned on read.
    """
    handles: list = []
    assigned = shard_assign(
        df, id_col, text_col, shard_tokens, num_partitions, unpersist_handles=handles
    )
    data = df.join(assigned.select(id_col, "n_tokens", "shard"), on=id_col)
    data.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(path)
    for h in handles:
        h.unpersist()
    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("docs"))
        .agg(
            F.count(F.lit(1)).alias("n_shards"),
            F.min("tok").alias("min_tokens"),
            F.max("tok").alias("max_tokens"),
            F.sum("tok").alias("total_tokens"),
            F.sum("docs").alias("total_docs"),
        )
        .collect()[0]
    )
    return {k: stats[k] for k in stats.asDict()}
