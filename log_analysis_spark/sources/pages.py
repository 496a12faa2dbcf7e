"""Pages-table storage seam (Iceberg-or-parquet, SURVEY.md §7 step 1).

The design point is an Iceberg table partitioned ``days(warc_ts)`` and
bucketed ``bucket(N, url)``. This sandbox has no iceberg-spark runtime jar,
so the seam falls back to a parquet layout with the identical partition
shape (``day=YYYY-MM-DD`` directories); pipeline semantics, partition
pruning, and all tests are unchanged — swapping the writer/reader here is
the only Iceberg migration step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_pages_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        df.withColumn("day", F.date_format("warc_ts", "yyyy-MM-dd"))
        .write.mode(mode)
        .partitionBy("day")
        .parquet(path)
    )


def read_pages_table(
    spark: SparkSession,
    path: str,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """Scan with partition pruning: the reference only ever lists one date
    directory (zeek_search_params.rs:59-74); here a ``day`` predicate prunes
    to the same partitions inside one declarative scan, and a date RANGE is
    a single scan instead of the reference's per-day loop
    (/root/reference/src/main.rs:303-334)."""
    df = spark.read.parquet(path)
    if start_date is not None:
        df = df.filter(F.col("day") >= start_date)
    if end_date is not None:
        df = df.filter(F.col("day") <= end_date)
    return df
