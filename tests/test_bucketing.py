"""Bucketed co-located join: no shuffle Exchange on either side."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from log_analysis_spark.plans.bucketing import (
    co_located_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    write_bucketed(ev.select("event_id", "user_id", "value"), "ev_b", "user_id", 8)
    write_bucketed(users, "users_b", "user_id", 8)
    yield "ev_b", "users_b"
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS users_b")


def test_co_located_join_has_no_shuffle(spark, bucketed_tables):
    l, r = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = co_located_join(spark, l, r, "user_id")
        assert not plan_has_exchange(joined)
        # and it is still correct
        row = joined.filter(F.col("user_id") == 42).select(F.count(F.lit(1))).first()
        n_direct = (
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .filter(F.col("user_id") == 42)
            .count()
        )
        assert row[0] == n_direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join on plain parquet shuffles both sides."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        joined = ev.join(users, "user_id")
        assert plan_has_exchange(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
