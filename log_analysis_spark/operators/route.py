"""R1/R2 recast: single-pass multi-sink router.

The reference fans records into a BTreeMap keyed by ZeekProtocol, dropping
unknown types (/root/reference/src/zeek/zeek_log.rs:383-397). The naive Spark
translation — one filtered write per record type — would scan the input N
times. The scalable design is ONE pass: filter to the whitelist, then
``partitionBy(record_type, day)`` so each sink is a partition directory and
every row is read and written exactly once. R2's hour-bucket nesting
(zeek_log.rs:394-397) is the derived ``ts_bucket`` column, already
hour-truncated by the parser.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import RECORD_TYPES


def whitelist_filter(df: DataFrame, types: list[str] | None = None) -> DataFrame:
    """Drop unknown record types (ZeekProtocol::NONE analog)."""
    return df.filter(F.col("record_type").isin(types or RECORD_TYPES))


def route_to_sinks(
    df: DataFrame,
    out_dir: str,
    types: list[str] | None = None,
    day_col: str = "ts_bucket",
    mode: str = "overwrite",
) -> dict[str, str]:
    """One-pass fan-out write; returns {record_type: sink_path}.

    Parquet layout stands in for per-type Iceberg tables: each
    ``record_type=<t>`` directory is a sink, day-subpartitioned for pruning.
    """
    types = types or RECORD_TYPES
    routed = whitelist_filter(df, types).withColumn(
        "day", F.date_format(F.col(day_col), "yyyy-MM-dd")
    )
    (
        routed.write.mode(mode)
        .partitionBy("record_type", "day")
        .parquet(out_dir)
    )
    return {t: os.path.join(out_dir, f"record_type={t}") for t in types}


def read_sink(spark: SparkSession, out_dir: str, record_type: str) -> DataFrame:
    """Read one sink back; partition pruning keeps this a single-type scan."""
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .filter(F.col("record_type") == record_type)
    )


def compact_sink(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = ("record_type", "day"),
    zorder_cols: tuple[str, ...] = (),
    zorder_bits: int = 8,
) -> dict:
    """Small-file compaction for a parquet sink: rewrite to ~target-size
    files, preserving the partition layout.

    Streaming/micro-batch sinks and per-day resume units accumulate many
    small files (the classic operational pain at scale — file-listing and
    task-scheduling costs grow with file count, not data size). One
    coalesced rewrite per run: read, repartition to ceil(bytes/target) by
    the partition columns (so each output partition directory gets its own
    write tasks), then swap the compacted temp dir into place. Returns
    {files_before, files_after, bytes}.

    The swap is two renames (path -> ._compact_old, tmp -> path), NOT one
    atomic operation: there is a window in which ``path`` does not exist,
    and a reader racing the swap can see an absent directory. Run
    compaction when the sink is quiesced. A crash inside the window is
    recoverable: the old data is intact in ``._compact_old`` and this
    function rolls it back on failure (on a real deployment the same swap
    is an Iceberg snapshot commit, which IS atomic — see
    plans/bucketing.py).

    ``zorder_cols`` (optional) turns the rewrite into OPTIMIZE-with-
    ZORDER: the named columns — which must already be small non-negative
    ints in [0, 2^zorder_bits), e.g. an hour bucket and a host hash
    bucket written at sink time — are Morton-interleaved
    (plans/bucketing.zorder_key) and the rewrite range-partitions on
    (partition_cols..., z) then sorts within partitions, so every output
    file covers a narrow range of EVERY clustered dimension inside its
    partition directory (multi-dim min/max skipping; measured in
    tests/test_bucketing.py). Composite range keys keep each task inside
    1-2 partition directories, so file counts stay ~bytes/target.
    """
    import shutil

    def _count_files(p: str) -> tuple[int, int]:
        n = b = 0
        for root, _dirs, files in os.walk(p):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(root, f))
        return n, b

    # recover from a prior run that crashed inside the swap window: the
    # data would be stranded in ._compact_old with `path` absent
    stale_old = path.rstrip("/") + "._compact_old"
    if not os.path.exists(path) and os.path.exists(stale_old):
        os.rename(stale_old, path)

    before, total_bytes = _count_files(path)
    n_out = max(1, -(-total_bytes // target_bytes))
    df = spark.read.option("basePath", path).parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    part_cols = [c for c in partition_cols if c in df.columns]
    if zorder_cols:
        from ..plans.bucketing import zorder_key

        zed = df.withColumn(
            "_z", zorder_key([F.col(c) for c in zorder_cols], bits=zorder_bits)
        )
        writer = (
            zed.repartitionByRange(n_out, *part_cols, "_z")
            .sortWithinPartitions(*part_cols, "_z")
            .drop("_z")
        )
    elif part_cols:
        writer = df.repartition(n_out, *part_cols)
    else:
        writer = df.repartition(n_out)
    w = writer.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        # roll the original back instead of stranding it in ._compact_old
        os.rename(old, path)
        raise
    shutil.rmtree(old, ignore_errors=True)
    after, _ = _count_files(path)
    return {"files_before": before, "files_after": after, "bytes": total_bytes}


def routed_counts(df: DataFrame, types: list[str] | None = None) -> DataFrame:
    """Per-sink row counts without writing — used by correctness checks.
    Ordered by record_type like the reference's BTreeMap iteration (O1,
    /root/reference/src/types/types.rs:5)."""
    return (
        whitelist_filter(df, types)
        .groupBy("record_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("record_type")
    )


def rendezvous_shard(key, shards: list[str], out_col: str = "shard"):
    """Rendezvous (highest-random-weight) shard assignment for a key column.

    Thaler & Ravishankar 1998: each (key, shard) pair gets an independent
    hash weight; the key routes to the shard with the highest weight. Unlike
    ``pmod(hash, n)`` routing, growing the fleet from n to n+1 shards moves
    ONLY the keys the new shard wins (~1/(n+1) of them) and NEVER moves a
    key between two existing shards — the property that makes stateful sink
    resharding (per-shard indexes, caches, writers) cheap at 10^12 keys.

    Pure projection (one md5 per shard per row, zero shuffle); the weight is
    ``md5_hash60(shard || '|' || key)`` so the DuckDB oracle replays the
    assignment exactly. Ties are broken by shard list order via the ordered
    CASE chain — deterministic, though 60-bit ties never occur in practice.

    Returns a Column producing the winning shard name.
    """
    from .dedup import md5_hash60

    if not shards:
        raise ValueError("rendezvous_shard needs at least one shard")
    key_s = key.cast("string")
    weights = [
        md5_hash60(F.concat(F.lit(s + "|"), key_s)) for s in shards
    ]
    mx = F.greatest(*weights) if len(weights) > 1 else weights[0]
    expr = F.when(weights[0] == mx, F.lit(shards[0]))
    for w, s in zip(weights[1:], shards[1:]):
        expr = expr.when(w == mx, F.lit(s))
    return expr.alias(out_col)


def rendezvous_route(
    df: DataFrame, key_col: str, shards: list[str], out_col: str = "shard"
) -> DataFrame:
    """Attach the rendezvous shard assignment as a column. Routing stays a
    map-side projection; a downstream ``repartition(out_col)`` or
    ``partitionBy(out_col)`` write turns it into the physical fan-out."""
    return df.withColumn(out_col, rendezvous_shard(F.col(key_col), shards))
