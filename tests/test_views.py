"""SQL surface: registered views are queryable and keep scan pushdown."""

from __future__ import annotations

import contextlib
import io

from log_analysis_spark.sources.views import register_views

SF_DIR = "/root/testdata/sf0.001"


def test_register_views_and_sql(spark):
    got = register_views(spark, SF_DIR)
    assert "events" in got and "documents" in got
    n = spark.sql("SELECT count(*) AS n FROM events").collect()[0]["n"]
    assert n > 0
    joined = spark.sql(
        "SELECT r.r_name, count(*) AS n FROM nation n "
        "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
    )
    assert joined.count() == 5


def test_view_query_pushes_filter_to_scan(spark):
    register_views(spark, SF_DIR, tables=["events"])
    df = spark.sql("SELECT event_id FROM events WHERE user_id = 7")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the view inlines: the filter reaches the parquet scan, the projection
    # prunes to the two referenced columns
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters")[1][:200]
    assert "props" not in plan.split("ReadSchema")[1][:400]


def test_register_views_skips_missing(spark):
    got = register_views(spark, "/nonexistent_dir_xyz")
    assert got == []
