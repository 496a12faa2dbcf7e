"""spark-submit entrypoint: the full parse->enrich->route->aggregate job.

CLI args mirror ZeekSearchParams' fields (path_prefix, selected_date,
start/end dates, src filter; /root/reference/src/zeek/zeek_search_params.rs:
15-33) — the TUI (main.rs event loop) is replaced by this batch job.

Resume: units are day partitions; completed (stage, day) units found in the
lineage manifest with a matching input fingerprint are skipped (north_rule:
"resumable from checkpoint with per-partition lineage + metrics"). Sink
writes use dynamic partition overwrite so re-running a unit is idempotent.

Ship to a cluster as:
  spark-submit --py-files log_analysis_spark.zip -m log_analysis_spark.plans.job ...
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import events_per_host_hour, topk_domains
from ..operators.enrich import enrich
from ..operators.route import route_to_sinks
from ..functions.parse import parse_conn_like, parse_http_like
from ..sources.pages import read_pages_table
from .checkpoint import Manifest, UnitResult, dir_bytes, dir_fingerprint


def list_days(input_path: str, start: str | None, end: str | None) -> list[str]:
    if not os.path.isdir(input_path):
        raise SystemExit(
            f"error: input path {input_path!r} does not exist or is not a "
            "pages table directory (expected day=YYYY-MM-DD partitions)"
        )
    days = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(input_path)
        if d.startswith("day=")
    )
    if not days:
        raise SystemExit(
            f"error: no day=YYYY-MM-DD partitions under {input_path!r}"
        )
    if start:
        days = [d for d in days if d >= start]
    if end:
        days = [d for d in days if d <= end]
    return days


def _apply_robots(
    spark: SparkSession,
    pages: DataFrame,
    robots_path: str | None,
    robots_agent: str,
) -> DataFrame:
    """Optional crawl-exclusion stage (operators/robots.py): filter the
    pages table against per-host robots.txt bodies BEFORE parse — the
    retro-active opt-out sweep every crawl-derived pipeline needs. The
    rule dim broadcasts; zero fact-side shuffle (see robots.py)."""
    if not robots_path:
        return pages
    from ..operators.robots import robots_filter

    bodies = spark.read.parquet(robots_path)
    return robots_filter(pages, bodies, agent=robots_agent, url_col="url")


def run_day(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    day: str,
    host_filter: str | None = None,
    byte_exact: bool = True,
    proto_filter: str | None = None,
    robots_path: str | None = None,
    robots_agent: str = "*",
) -> UnitResult:
    """Process one day partition end-to-end (one declarative plan per sink
    family; the scan is pruned to the day's directory).

    Manifest metrics (rows in/out) ride the write jobs themselves via
    ``df.observe`` — no extra ``count()`` scan of the input and no re-read
    of the just-written sink (at 10^12 rows those were ~2 spare passes per
    unit purely for bookkeeping)."""
    from pyspark.sql import Observation

    obs_in = Observation(f"rows_in_{day}")
    pages = read_pages_table(spark, input_path, day, day).observe(
        obs_in, F.count(F.lit(1)).alias("n")
    )
    pages = _apply_robots(spark, pages, robots_path, robots_agent)

    http = parse_http_like(pages, byte_exact=byte_exact)
    if host_filter:
        http = http.filter(F.col("host") == host_filter)
    http_e = enrich(http, spark, host_col="host")

    conn = parse_conn_like(pages, vectorized=True)
    if host_filter:
        conn = conn.filter(
            (F.col("id_orig_h") == host_filter) | (F.col("id_resp_h") == host_filter)
        )
    # proto_type predicate (ZeekSearchParams.proto_type; the reference only
    # ever left this as commented-out specializations, zeek_log.rs:263-288 —
    # here it is just one more composed Column filter)
    if proto_filter:
        conn = conn.filter(F.col("record_type") == proto_filter.lower())

    sink_dir = os.path.join(out_dir, "sinks", "conn_like")
    route_to_sinks(conn, sink_dir, mode="overwrite")

    http_dir = os.path.join(out_dir, "sinks", "http_like")
    obs_out = Observation(f"rows_out_{day}")
    (
        http_e.withColumn("day", F.date_format("ts_bucket", "yyyy-MM-dd"))
        .observe(obs_out, F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(http_dir)
    )

    agg_dir = os.path.join(out_dir, "agg", "events_per_host_hour")
    (
        events_per_host_hour(http_e, host_col="host", ts_col="ts_bucket")
        .withColumn("day", F.date_format("hour", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(agg_dir)
    )

    # .get blocks until the first action through each observed node is done;
    # both writes above have completed by now, so these are immediate
    rows_in = int(obs_in.get["n"])
    rows_out = int(obs_out.get["n"])
    return UnitResult(rows_in=rows_in, rows_out=rows_out, bytes_out=dir_bytes(http_dir))


def run_once(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    start: str | None = None,
    end: str | None = None,
    byte_exact: bool = True,
    with_sinks: bool = True,
) -> dict:
    """Single-pass pipeline over a date RANGE: one pruned scan per record
    family, one write (or aggregate action) each — the shape you'd run on a
    cluster when resume granularity isn't needed. 3 Spark jobs total vs
    ~5 per day for the day-looped resume mode; used by bench for
    throughput/scaling measurement.

    ``with_sinks=False`` replaces the sink writes with routed-count
    aggregate actions (pipeline compute without local-FS commit serialism).
    """
    pages = read_pages_table(spark, input_path, start, end)
    t0 = time.monotonic()
    http_e = enrich(parse_http_like(pages, byte_exact=byte_exact), spark, host_col="host")
    conn = parse_conn_like(pages, vectorized=True)
    if with_sinks:
        (
            http_e.withColumn("day", F.date_format("ts_bucket", "yyyy-MM-dd"))
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(os.path.join(out_dir, "sinks", "http_like"))
        )
        route_to_sinks(conn, os.path.join(out_dir, "sinks", "conn_like"))
        (
            events_per_host_hour(http_e, host_col="host", ts_col="ts_bucket")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "agg", "events_per_host_hour"))
        )
    else:
        from ..operators.route import routed_counts

        events_per_host_hour(http_e, host_col="host", ts_col="ts_bucket").count()
        topk_domains(http_e, k=10, host_col="host").count()
        routed_counts(conn).count()
    return {"wall_sec": time.monotonic() - t0}


def finalize(spark: SparkSession, out_dir: str, k: int = 10) -> DataFrame:
    """Cross-day final aggregates from the per-day PARTIALS, not the raw
    sink: topk_domains = sum of events_per_host_hour counts per host
    (same rows as counting the http_like sink — each sink row lands in
    exactly one (host, hour) cell — pinned by
    test_topk_from_partials_equals_sink_recount). The partials are
    O(hosts x hours) rows and re-runs of a day OVERWRITE that day's
    partition, so this stays correct under resume/param-change re-runs
    with no retraction problem — incremental view maintenance by
    materialized partial aggregates (operators/incremental.py holds the
    generic mergeable-state form). At 10^12 rows the previous form
    (re-counting the whole sink) was an O(corpus) rescan per refresh;
    this is O(aggregate rows)."""
    partials = spark.read.parquet(os.path.join(out_dir, "agg", "events_per_host_hour"))
    top = (
        partials.groupBy("host")
        .agg(F.sum("n_events").alias("n_pages"))
        .orderBy(F.desc("n_pages"), F.asc("host"))
        .limit(k)
    )
    top.write.mode("overwrite").parquet(os.path.join(out_dir, "agg", "topk_domains"))
    return top


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    start: str | None = None,
    end: str | None = None,
    host_filter: str | None = None,
    resume: bool = True,
    byte_exact: bool = True,
    proto_filter: str | None = None,
    robots_path: str | None = None,
    robots_agent: str = "*",
) -> dict:
    """Full job with per-day lineage + resume. Returns run metrics."""
    manifest = Manifest(os.path.join(out_dir, "_manifest"))
    days = list_days(input_path, start, end)
    t0 = time.monotonic()
    processed, skipped, rows_in_total = [], [], 0
    # dynamic partition overwrite => re-running a unit replaces only its day
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    for day in days:
        # fingerprint = input files + job params: a changed host filter or
        # parse mode must invalidate the unit, not be silently skipped
        fp = (
            dir_fingerprint(os.path.join(input_path, f"day={day}"))
            + f"|host={host_filter}|byte_exact={byte_exact}"
            + (f"|proto={proto_filter}" if proto_filter else "")
            # robots bodies are INPUT: a changed/added/removed exclusion
            # table must re-run the unit, not be silently skipped
            + (
                f"|robots={dir_fingerprint(robots_path)}:{robots_agent}"
                if robots_path
                else ""
            )
        )
        if resume and manifest.is_done("pipeline", day, fp):
            skipped.append(day)
            continue
        res = run_day(
            spark,
            input_path,
            out_dir,
            day,
            host_filter,
            byte_exact,
            proto_filter,
            robots_path,
            robots_agent,
        )
        manifest.mark_done("pipeline", day, fp, res)
        processed.append(day)
        rows_in_total += res.rows_in
    finalize(spark, out_dir)
    wall = time.monotonic() - t0
    return {
        "days_processed": processed,
        "days_skipped": skipped,
        "rows_in": rows_in_total,
        "wall_sec": wall,
        "pages_per_sec": (rows_in_total / wall) if wall > 0 else None,
    }


def ingest_warc(
    spark: SparkSession,
    warc_dir: str,
    pages_path: str,
    out_dir: str,
    resume: bool = True,
) -> dict:
    """Materialize the pages table from raw ``.warc(.gz)`` files
    (sources/warc.py): one task per WARC file -> response records ->
    (url, warc_ts, html, text, lang) written day-partitioned. One
    resume unit, fingerprinted by the WARC directory listing — a
    changed/extended crawl re-ingests, an unchanged one is skipped."""
    from pyspark.sql import Observation

    from ..sources.pages import write_pages_table
    from ..sources.warc import pages_from_warc, read_warc

    manifest = Manifest(os.path.join(out_dir, "_manifest"))
    fp = dir_fingerprint(warc_dir)
    if resume and manifest.is_done("warc_ingest", "all", fp):
        return {"warc_ingested": False, "skipped": True}
    obs = Observation("warc_pages")
    pages = pages_from_warc(read_warc(spark, warc_dir)).observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    write_pages_table(pages, pages_path)
    n = int(obs.get["n"])
    manifest.mark_done(
        "warc_ingest", "all", fp, UnitResult(rows_in=n, rows_out=n, bytes_out=dir_bytes(pages_path))
    )
    return {"warc_ingested": True, "pages": n}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="pages table path (required unless --compact)")
    ap.add_argument("--out", help="output root (required unless --compact)")
    ap.add_argument("--start-date")
    ap.add_argument("--end-date")
    ap.add_argument("--host", help="host filter (src_ip analog)")
    ap.add_argument("--proto", help="record-type filter (proto_type analog)")
    ap.add_argument(
        "--robots",
        help="parquet table of (host, robots_txt) bodies; pages blocked "
        "for --robots-agent are excluded before parse (RFC 9309; "
        "operators/robots.py). Rides the resume fingerprint.",
    )
    ap.add_argument("--robots-agent", default="*")
    ap.add_argument(
        "--warc-ingest",
        metavar="WARC_DIR",
        help="ingest raw .warc(.gz) files (Common Crawl layout; "
        "sources/warc.py) into the pages table at --input before "
        "running the pipeline; manifest-resumed",
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--single-pass",
        action="store_true",
        help="one date-range scan, no per-day resume units (throughput mode)",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--compact",
        metavar="SINK_PATH",
        help="compact a fragmented parquet sink to ~target-size files "
        "(operators.route.compact_sink) instead of running the pipeline; "
        "run when the sink is quiesced",
    )
    ap.add_argument(
        "--compact-target-mb",
        type=int,
        default=128,
        help="target output file size for --compact (MiB)",
    )
    args = ap.parse_args()
    if not args.compact and (not args.input or not args.out):
        ap.error("--input and --out are required unless --compact is given")

    from ..session import get_spark

    spark = get_spark("log-analysis-job", master=args.master)
    if args.compact:
        from ..operators.route import compact_sink

        stats = compact_sink(
            spark, args.compact, target_bytes=args.compact_target_mb * 1024 * 1024
        )
        print(json.dumps(stats))
        return
    if args.warc_ingest:
        ingest = ingest_warc(
            spark, args.warc_ingest, args.input, args.out, resume=not args.no_resume
        )
    else:
        ingest = None
    if args.single_pass:
        metrics = run_once(
            spark, args.input, args.out, args.start_date, args.end_date
        )
    else:
        metrics = run_pipeline(
            spark,
            args.input,
            args.out,
            args.start_date,
            args.end_date,
            args.host,
            resume=not args.no_resume,
            proto_filter=args.proto,
            robots_path=args.robots,
            robots_agent=args.robots_agent,
        )
    if ingest is not None:
        metrics["warc_ingest"] = ingest
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
