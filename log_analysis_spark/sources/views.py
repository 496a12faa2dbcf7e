"""SQL surface: register the engine's tables as temp views.

The reference exposes results only through its Rust API/TUI; a Spark-native
engine's equivalent "give me a query surface" is ``spark.sql`` over
registered views — after ``register_views`` every operator the oracle SQL
in ``__spark_entry__`` expresses is runnable verbatim by a user, and BI
tools on a cluster get the same names via the metastore instead.

Views are lazy logical plans: registration reads only parquet footers for
schema, and every ``spark.sql`` query over them still gets full Catalyst
pushdown/pruning (the view is inlined into the plan, not materialized).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each ``<sf_dir>/<table>.parquet`` as a temp view named
    ``<table>``. Returns the list actually registered (missing files are
    skipped, so a partial dataset still yields a usable SQL surface)."""
    registered = []
    for t in tables or TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        spark.read.parquet(path).createOrReplaceTempView(t)
        registered.append(t)
    return registered


def register_pages(
    spark: SparkSession, path: str, name: str = "pages"
) -> DataFrame:
    """Register the (possibly day-partitioned) pages table as a view and
    return its DataFrame. Partition pruning on ``day`` flows through the
    view into any ``spark.sql`` filter."""
    from .pages import read_pages_table

    df = read_pages_table(spark, path)
    df.createOrReplaceTempView(name)
    return df
