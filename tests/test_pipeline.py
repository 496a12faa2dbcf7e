"""End-to-end pipeline: routed counts, aggregates vs golden, resume."""

import os

from pyspark.sql import functions as F

from log_analysis_spark.functions.parse import parse_conn_like, parse_http_like
from log_analysis_spark.operators.aggregate import (
    distinct_per_host,
    events_per_host_hour,
    salted_group_count,
    topk_domains,
    union_dedup_first_seen,
)
from log_analysis_spark.operators.enrich import enrich
from log_analysis_spark.operators.route import read_sink, route_to_sinks, routed_counts
from log_analysis_spark.plans.job import run_pipeline
from log_analysis_spark.schemas import RECORD_TYPES
from log_analysis_spark.synth import gen_pages, write_pages

from .golden import (
    golden_events_per_host_hour,
    golden_pages,
    golden_routed_counts,
    golden_topk,
)

N = 1500


def test_routed_counts_match_golden(spark):
    conn = parse_conn_like(gen_pages(spark, N))
    got = {r["record_type"]: r["n_rows"] for r in routed_counts(conn).collect()}
    assert got == golden_routed_counts(golden_pages(N))


def test_router_drops_unknown(spark):
    conn = parse_conn_like(gen_pages(spark, N))
    assert conn.filter(F.col("record_type") == "bogus").count() > 0
    routed = routed_counts(conn).toPandas()
    assert "bogus" not in set(routed.record_type)


def test_route_write_and_readback(spark, tmpdir_path):
    conn = parse_conn_like(gen_pages(spark, N))
    sinks = route_to_sinks(conn, tmpdir_path)
    want = golden_routed_counts(golden_pages(N))
    for rt in RECORD_TYPES:
        assert os.path.isdir(sinks[rt])
        assert read_sink(spark, tmpdir_path, rt).count() == want[rt]
    # routed-row equality on one sink: exact url multiset
    got_urls = sorted(
        r["url"] for r in read_sink(spark, tmpdir_path, "dns").select("url").collect()
    )
    from .golden import golden_conn_events

    ev = golden_conn_events(golden_pages(N))
    want_urls = sorted(ev[ev.record_type == "dns"].url)
    assert got_urls == want_urls


def test_events_per_host_hour_matches_golden(spark):
    http = parse_http_like(gen_pages(spark, N), byte_exact=False)
    got = (
        events_per_host_hour(http, host_col="host", ts_col="ts_bucket")
        .toPandas()
        .sort_values(["host", "hour"])
        .reset_index(drop=True)
    )
    want = (
        golden_events_per_host_hour(golden_pages(N))
        .sort_values(["host", "hour"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.n_events.to_numpy() == want.n_events.to_numpy()).all()
    assert (got.host.to_numpy() == want.host.to_numpy()).all()


def test_topk_matches_golden(spark):
    http = parse_http_like(gen_pages(spark, N), byte_exact=False)
    got = [(r["host"], r["n_pages"]) for r in topk_domains(http, k=10).collect()]
    assert got == golden_topk(golden_pages(N), k=10)


def test_salted_count_equals_plain(spark):
    http = parse_http_like(gen_pages(spark, N), byte_exact=False)
    plain = {
        r["host"]: r["n"]
        for r in http.groupBy("host").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {r["host"]: r["n"] for r in salted_group_count(http, "host").collect()}
    assert plain == salted


def test_distinct_per_host(spark):
    conn = parse_conn_like(gen_pages(spark, N))
    conn = conn.withColumn("host", F.parse_url("url", F.lit("HOST")))
    got = {r["host"]: r["n_distinct"] for r in distinct_per_host(conn, "host", "id_orig_h").collect()}
    want = (
        conn.groupBy("host")
        .agg(F.countDistinct("id_orig_h").alias("n"))
        .collect()
    )
    assert got == {r["host"]: r["n"] for r in want}


def test_union_dedup_first_seen(spark):
    a = spark.createDataFrame(
        [("h1", "2024-07-02"), ("h2", "2024-07-02")], ["host", "first_day"]
    )
    b = spark.createDataFrame(
        [("h1", "2024-07-03"), ("h3", "2024-07-03")], ["host", "first_day"]
    )
    got = {r["host"]: r["first_day"] for r in union_dedup_first_seen(a, b).collect()}
    assert got == {"h1": "2024-07-02", "h2": "2024-07-02", "h3": "2024-07-03"}


def test_enrich_left_join_nulls(spark):
    http = parse_http_like(gen_pages(spark, 400), byte_exact=False)
    e = enrich(http, spark)
    unk = e.filter(F.col("lang") == "unknown")
    assert unk.count() > 0
    assert unk.filter(F.col("region_name").isNotNull()).count() == 0
    known = e.filter(F.col("lang") == "de")
    assert known.filter(F.col("region_name") != "Europe").count() == 0


def test_pipeline_resume(spark, tmpdir_path):
    """Kill/rerun semantics: second run skips all completed day units;
    final counts unchanged (north_rule resumability)."""
    inp = os.path.join(tmpdir_path, "pages")
    out = os.path.join(tmpdir_path, "out")
    write_pages(spark, 800, inp, partitions=4)

    m1 = run_pipeline(spark, inp, out)
    assert len(m1["days_processed"]) == 3 and m1["days_skipped"] == []
    total1 = spark.read.parquet(os.path.join(out, "sinks", "http_like")).count()
    assert total1 == 800

    m2 = run_pipeline(spark, inp, out)
    assert m2["days_processed"] == [] and len(m2["days_skipped"]) == 3
    total2 = spark.read.parquet(os.path.join(out, "sinks", "http_like")).count()
    assert total2 == total1

    # invalidate one unit -> only that unit reruns, counts still exact
    os.remove(os.path.join(out, "_manifest", "pipeline__2024-07-03.json"))
    m3 = run_pipeline(spark, inp, out)
    assert m3["days_processed"] == ["2024-07-03"]
    assert spark.read.parquet(os.path.join(out, "sinks", "http_like")).count() == total1


def test_pipeline_host_filter_membership(spark, tmpdir_path):
    """Membership across days on the pages pipeline (FIXTURES.md §5)."""
    from log_analysis_spark.sources.pages import read_pages_table
    from log_analysis_spark.synth import MEMBERSHIP_HOST

    inp = os.path.join(tmpdir_path, "pages")
    write_pages(spark, 3000, inp, partitions=4)
    pages = read_pages_table(spark, inp)
    http = parse_http_like(pages, byte_exact=False).filter(
        F.col("host") == MEMBERSHIP_HOST
    )
    day1 = http.filter(F.to_date("ts_bucket") == "2024-07-02").count()
    day2 = http.filter(F.to_date("ts_bucket") == "2024-07-03").count()
    assert day1 > 0 and day2 == 0


def test_compact_sink_reduces_files_preserves_rows(spark, tmpdir_path):
    """Compaction: a fragmented sink (many tiny files) rewrites to few
    target-size files with identical rows and intact partition dirs."""
    from log_analysis_spark.operators.route import compact_sink

    conn = parse_conn_like(gen_pages(spark, 500)).repartition(24)  # fragment
    sink = os.path.join(tmpdir_path, "frag_sink")
    route_to_sinks(conn, sink)
    before_rows = spark.read.option("basePath", sink).parquet(sink).count()
    stats = compact_sink(spark, sink, target_bytes=64 * 1024 * 1024)
    assert stats["files_after"] < stats["files_before"]
    after = spark.read.option("basePath", sink).parquet(sink)
    assert after.count() == before_rows
    assert any(d.startswith("record_type=") for d in os.listdir(sink))


def test_compact_sink_recovers_from_crash_in_swap_window(spark, tmpdir_path):
    """Crash-recovery: a compaction that died INSIDE the swap window (old
    data renamed to ._compact_old, `path` absent) must heal on rerun — the
    stale ._compact_old restores at entry and the rerun completes with
    identical rows. Mirrors the torn-sink-write healing test (ADVICE r3:
    the recovery branches were untested)."""
    import shutil

    import pytest

    from log_analysis_spark.operators.route import compact_sink

    conn = parse_conn_like(gen_pages(spark, 500)).repartition(24)
    sink = os.path.join(tmpdir_path, "crash_sink")
    route_to_sinks(conn, sink)
    before_rows = spark.read.option("basePath", sink).parquet(sink).count()

    # simulate the crash: the swap's first rename happened (path ->
    # ._compact_old), the second (tmp -> path) never did, tmp is garbage
    os.rename(sink, sink + "._compact_old")
    os.makedirs(os.path.join(sink + "._compact_tmp", "halfwritten"), exist_ok=True)
    assert not os.path.exists(sink)

    stats = compact_sink(spark, sink, target_bytes=64 * 1024 * 1024)
    after = spark.read.option("basePath", sink).parquet(sink)
    assert after.count() == before_rows
    assert stats["files_after"] < stats["files_before"]
    assert not os.path.exists(sink + "._compact_old")
    assert not os.path.exists(sink + "._compact_tmp")

    # rollback branch: if the tmp -> path rename fails, the original data
    # must come back from ._compact_old instead of being stranded
    orig_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        if dst == sink and src.endswith("._compact_tmp"):
            calls["n"] += 1
            raise OSError("injected rename failure")
        return orig_rename(src, dst)

    os.rename = failing_rename
    try:
        with pytest.raises(OSError, match="injected"):
            compact_sink(spark, sink, target_bytes=64 * 1024 * 1024)
    finally:
        os.rename = orig_rename
    assert calls["n"] == 1
    restored = spark.read.option("basePath", sink).parquet(sink)
    assert restored.count() == before_rows
    shutil.rmtree(sink + "._compact_tmp", ignore_errors=True)


def test_single_pass_and_resume_modes_produce_identical_sinks(spark, tmpdir_path):
    """run_once (throughput mode) and run_pipeline (per-day resume mode)
    must land the SAME routed rows — mode choice is an operational knob,
    never a semantics change."""
    from log_analysis_spark.plans.job import run_once

    src = os.path.join(tmpdir_path, "pages")
    write_pages(spark, 600, src)
    out_a = os.path.join(tmpdir_path, "out_resume")
    out_b = os.path.join(tmpdir_path, "out_single")
    run_pipeline(spark, src, out_a)
    run_once(spark, src, out_b)
    for sink in ("sinks/http_like", "sinks/conn_like"):
        a = spark.read.option("basePath", f"{out_a}/{sink}").parquet(f"{out_a}/{sink}")
        b = spark.read.option("basePath", f"{out_b}/{sink}").parquet(f"{out_b}/{sink}")
        cols = sorted(set(a.columns) & set(b.columns))
        assert a.count() == b.count() > 0, sink
        assert a.select(cols).exceptAll(b.select(cols)).count() == 0, sink
        assert b.select(cols).exceptAll(a.select(cols)).count() == 0, sink


def test_public_api_surface_importable():
    import log_analysis_spark as la

    assert callable(la.asof_join) and callable(la.dup_clusters)
    assert callable(la.run_pipeline) and callable(la.sample_stratified)


def test_salted_join_equals_plain_join(spark):
    """Explicit salted join must be row-identical to the plain equi-join
    (skew template: hot key spread across n_salt reducers)."""
    import pandas as pd

    from log_analysis_spark.operators.aggregate import salted_join

    big = spark.createDataFrame(
        pd.DataFrame({"k": [1] * 500 + [2] * 10 + [3] * 5, "v": range(515)})
    )
    dim = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 4], "name": ["a", "b", "d"]}))
    got = salted_join(big, dim, "k")
    want = big.join(dim, "k")
    assert got.count() == want.count() == 510
    cols = sorted(got.columns)
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got.select(cols)).count() == 0


def test_torn_sink_write_without_manifest_is_healed(spark, tmpdir_path):
    """Crash-mid-write simulation (north_rule resumability, the sharp
    case): a day's sink directory holds a TORN write (files deleted, junk
    added) and its manifest entry is gone — exactly the state a kill
    between sink write and manifest commit leaves (checkpoint.py's
    documented commit order). The rerun must reprocess ONLY that day via
    dynamic partition overwrite and restore exact counts, junk gone."""
    import glob
    import os as _os

    inp = os.path.join(tmpdir_path, "pages2")
    out = os.path.join(tmpdir_path, "out2")
    write_pages(spark, 600, inp, partitions=4)
    m1 = run_pipeline(spark, inp, out)
    assert len(m1["days_processed"]) == 3
    sink = os.path.join(out, "sinks", "http_like")
    total1 = spark.read.parquet(sink).count()
    assert total1 == 600

    day_dir = os.path.join(sink, "day=2024-07-03")
    parts = glob.glob(os.path.join(day_dir, "*.parquet"))
    assert parts
    _os.remove(parts[0])  # torn: half-written output lost a file
    with open(os.path.join(day_dir, "part-junk.parquet.tmp"), "w") as f:
        f.write("garbage")  # torn: stray temp file survived the crash
    _os.remove(os.path.join(out, "_manifest", "pipeline__2024-07-03.json"))

    m2 = run_pipeline(spark, inp, out)
    assert m2["days_processed"] == ["2024-07-03"]
    assert spark.read.parquet(sink).count() == total1
    assert not glob.glob(os.path.join(day_dir, "*.tmp"))


def test_topk_from_partials_equals_sink_recount(spark, tmpdir_path):
    """finalize() computes topk_domains from the per-day
    events_per_host_hour PARTIALS (O(aggregate rows)); it must equal the
    old O(corpus) form — recounting the whole http_like sink — including
    after a day-unit re-run (partition overwrite keeps partials exact)."""
    from log_analysis_spark.plans.job import finalize, run_pipeline

    inp = os.path.join(tmpdir_path, "pages")
    out = os.path.join(tmpdir_path, "out")
    write_pages(spark, 600, inp, partitions=4)
    run_pipeline(spark, inp, out)

    # force one unit to re-run (the overwrite path), then re-finalize
    os.remove(os.path.join(out, "_manifest", "pipeline__2024-07-03.json"))
    run_pipeline(spark, inp, out)

    got = [
        (r["host"], r["n_pages"])
        for r in spark.read.parquet(os.path.join(out, "agg", "topk_domains"))
        .orderBy(F.desc("n_pages"), F.asc("host"))
        .collect()
    ]
    http = spark.read.parquet(os.path.join(out, "sinks", "http_like"))
    want = [
        (r["host"], r["n_pages"]) for r in topk_domains(http, k=10).collect()
    ]
    assert got == want and len(got) == 10


def test_pipeline_robots_exclusion_and_resume_invalidation(spark, tmpdir_path):
    """--robots excludes blocked pages before parse, and a changed
    robots table invalidates the day's resume unit."""
    from log_analysis_spark.synth import HOT_HOSTS

    pages_dir = f"{tmpdir_path}/pages"
    out_dir = f"{tmpdir_path}/out"
    write_pages(spark, 600, pages_dir)

    # robots: HOT_HOSTS[0] bans everything for *, other hosts have no body
    rb1 = f"{tmpdir_path}/robots1"
    spark.createDataFrame(
        [(HOT_HOSTS[0], "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    ).write.parquet(rb1)

    m1 = run_pipeline(spark, pages_dir, out_dir, robots_path=rb1)
    assert m1["days_skipped"] == []
    sink = spark.read.parquet(f"{out_dir}/sinks/http_like")
    assert sink.filter(F.col("host") == HOT_HOSTS[0]).count() == 0
    assert sink.filter(F.col("host") == HOT_HOSTS[1]).count() > 0

    # identical rerun: all days resume-skipped
    m2 = run_pipeline(spark, pages_dir, out_dir, robots_path=rb1)
    assert m2["days_processed"] == []

    # a DIFFERENT robots table must re-run (fingerprint includes bodies)
    rb2 = f"{tmpdir_path}/robots2"
    spark.createDataFrame(
        [(HOT_HOSTS[1], "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    ).write.parquet(rb2)
    m3 = run_pipeline(spark, pages_dir, out_dir, robots_path=rb2)
    assert m3["days_skipped"] == []
    sink = spark.read.parquet(f"{out_dir}/sinks/http_like")
    assert sink.filter(F.col("host") == HOT_HOSTS[1]).count() == 0
    assert sink.filter(F.col("host") == HOT_HOSTS[0]).count() > 0


def test_pivot_counts_fixed_vocabulary(spark):
    from log_analysis_spark.operators.aggregate import pivot_counts

    rows = [
        (1, "click"), (1, "click"), (1, "view"),
        (2, "purchase"),
        (3, "unknown"),  # outside the pinned list -> contributes nothing
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = {r["user_id"]: r for r in pivot_counts(
        df, "user_id", "event_type", ["click", "view", "purchase"]
    ).collect()}
    assert (out[1]["click"], out[1]["view"], out[1]["purchase"]) == (2, 1, 0)
    assert (out[2]["click"], out[2]["purchase"]) == (0, 1)
    # user 3 appears (it has rows) but with all-zero pinned columns
    assert (out[3]["click"], out[3]["view"], out[3]["purchase"]) == (0, 0, 0)


def test_funnel_counts_strict_order(spark):
    import datetime as dt

    from log_analysis_spark.operators.aggregate import funnel_counts

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # user 1 completes the funnel in order
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # user 2: click BEFORE view -> stops after step 1
        (2, t(1), "view"), (2, t(0), "click"),
        # user 3: view+click, purchase missing
        (3, t(0), "view"), (3, t(5), "click"),
        # user 4: never views; a later purchase cannot enter the funnel
        (4, t(0), "click"), (4, t(1), "purchase"),
        # user 5: same-timestamp click does NOT count (strict >)
        (5, t(0), "view"), (5, t(0), "click"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["step_idx"]: (r["step"], r["n_users"]) for r in funnel_counts(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert out == {1: ("view", 4), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_counts_empty_first_step(spark):
    from log_analysis_spark.operators.aggregate import funnel_counts

    df = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), "click")],
        ["user_id", "ts", "event_type"],
    )
    out = funnel_counts(df, "user_id", "ts", "event_type", ["view", "click"])
    assert [(r["step_idx"], r["n_users"]) for r in out.orderBy("step_idx").collect()] == [
        (1, 0), (2, 0),
    ]


# ---------------------------------------------------------------------------
# rolling distinct actives (WAU)
# ---------------------------------------------------------------------------
def test_rolling_distinct_users_hand_case(spark):
    from log_analysis_spark.operators.aggregate import rolling_distinct_users

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 12:00:00"),  # same user+day: counts once
        (2, "2024-01-03 09:00:00"),
        (1, "2024-01-09 09:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        r["day"]: r["active_users"]
        for r in rolling_distinct_users(df, window_days=7).collect()
    }
    # window [d-6, d]: day 03..07 sees users {1,2}; 08 sees {2};
    # 09 sees {2 (03 <= 09-6? no: 03 < 03)}: 09-6=03 -> {2, 1}
    assert got["2024-01-01"] == 1
    assert got["2024-01-03"] == 2
    assert got["2024-01-07"] == 2
    assert got["2024-01-08"] == 1  # user 1's Jan-1 events aged out
    assert got["2024-01-09"] == 2  # Jan-3 user2 + Jan-9 user1
    assert got["2024-01-15"] == 1  # trailing window of the Jan-9 event
    assert "2024-01-16" not in got


def test_rolling_distinct_users_window1_is_dau(spark):
    from log_analysis_spark.operators.aggregate import rolling_distinct_users

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dau = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {
        r["day"]: r["active_users"]
        for r in rolling_distinct_users(ev, window_days=1).collect()
    }
    assert got == dau
