"""Bucketed-table seam: co-located joins without shuffles.

The design point (SURVEY.md §4, BASELINE.json north_star) buckets the
pages table by ``bucket(N, url)`` in Iceberg so repeated url-keyed joins
and dedup stages never re-shuffle the fact table. Without the Iceberg
runtime, Spark's native bucketed tables (``bucketBy`` + ``saveAsTable``)
give the same property: two tables bucketed by the same key into the same
bucket count join with ZERO Exchange on either side (verified by plan
inspection in tests/test_bucketing.py).

At 10^12 rows this is the difference between re-shuffling ~100 TB per
url-keyed stage and reading co-located buckets; the bucket count is sized
so one bucket (~total/N) fits an executor's memory (e.g. N=65536 at
100 TB → ~1.5 GB/bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted table (session catalog, parquet)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key. With matching
    bucket specs Spark plans a sort-merge join whose children read buckets
    directly — no Exchange, no shuffle of either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (test hook)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan


def zorder_key(cols, bits: int = 16):
    """Morton / Z-order interleave of d pre-bucketed int columns into one
    int64 sort key (Morton 1966; the layout rule behind Delta/Iceberg
    OPTIMIZE ZORDER BY). Bit b of column i lands at position b*d + i, so
    consecutive z values alternate through all dimensions — sorting by z
    gives every column LOCALLY NARROW value ranges inside each file, which
    is what turns parquet row-group min/max stats into multi-dimensional
    data skipping: a 2-D box predicate prunes files on BOTH columns, where
    a lexicographic (x, y) sort prunes on x only and reads every file for
    a y-selective query (measured in tests/test_bucketing.py).

    Inputs must already be small non-negative ints in [0, 2^bits) —
    hash buckets, quantile ranks, day numbers; d*bits must be <= 63.
    Pure integer shift/mask arithmetic (d*bits terms, whole-stage codegen,
    zero shuffle) — the DuckDB oracle replays it exactly.
    """
    from pyspark.sql import functions as F

    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"zorder_key: {d} cols x {bits} bits exceeds int64")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cl = c.cast("long")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(cl, b).bitwiseAND(F.lit(1).cast("long")),
                b * d + i,
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Rewrite a table in Z-order layout: compute the interleaved key,
    range-partition on it (contiguous z slices -> one file each, the
    distributed equivalent of a global sort without a single-reducer
    bottleneck), sort within partitions, drop the key. Run as a
    maintenance rewrite after ingest, like ``compact_parquet_dir``."""
    from pyspark.sql import functions as F

    z = df.withColumn("_z", zorder_key([F.col(c) for c in zcols], bits=bits))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
