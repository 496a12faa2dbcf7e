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
