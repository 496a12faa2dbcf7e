"""Structured Streaming variant of the pipeline (continuous ingest mode).

The reference is strictly batch — one date directory per search, no
watermarks or state (/root/reference/src/zeek/zeek_log.rs:364-410; SURVEY.md
§2 "deliberately absent"). This module supplies the streaming recast the
north rule's continuous-ingest story implies: the same parse -> enrich ->
route -> aggregate operators applied to a file-source stream of page
parquet, with event-time windows + watermark for the per-host-hour
aggregate and checkpointed exactly-once sinks.

Operator reuse is 1:1: ``parse_http_like``/``enrich`` are batch/stream
agnostic DataFrame transforms (Catalyst plans them either way). Only the
source (``readStream``) and sinks (``writeStream`` + checkpointLocation)
differ — which is precisely Spark's batch/streaming unification story.

Scale notes: file-source streaming scales by ``maxFilesPerTrigger``
(micro-batch admission control); the watermark bounds per-host-hour state
so a 10^12-row backfill cannot OOM state storage; sink checkpointing gives
resume-on-restart semantics equivalent to the batch manifest
(plans/checkpoint.py), supplied by Spark itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse import parse_http_like
from ..operators.enrich import enrich
from ..schemas import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over the pages table layout (day=... dirs)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{path}/day=*")
    )


def streaming_events_per_host_hour(
    pages: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Windowed per-host-hour counts with late-data handling.

    The batch equivalent groups on date_trunc('hour'); here the event-time
    window + watermark bounds aggregation state (late pages beyond the
    watermark are dropped deterministically).
    """
    http = parse_http_like(pages, byte_exact=True)
    return (
        http.withWatermark("ts_bucket", watermark)
        .groupBy(F.window("ts_bucket", "1 hour").alias("w"), F.col("host"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour"), "host", "n_events")
    )


def start_pipeline_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Start the streaming pipeline: enriched http records appended to a
    day-partitioned sink, exactly-once via checkpointing.

    Returns the StreamingQuery (caller awaits/stops). Routing whitelist
    applies as in batch: unknown langs still pass (left join), rows keep
    their record identity from the parser.
    """
    pages = read_pages_stream(spark, input_path, max_files_per_trigger)
    http_e = enrich(parse_http_like(pages, byte_exact=True), spark, host_col="host")
    routed = http_e.withColumn("day", F.date_format("ts_bucket", "yyyy-MM-dd"))
    return (
        routed.writeStream.format("parquet")
        .option("path", f"{out_dir}/http_like")
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("day")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def read_zeek_family_stream(
    spark: SparkSession,
    path_glob: str,
    record_type: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Continuous ingest of the reference's own on-disk format: a text
    stream over ``{prefix}/*/{proto}.*.log(.gz)`` files, header/footer
    lines dropped, tokenized by the family vocabulary and typed-cast —
    the streaming twin of ``zeek_tsv.read_proto`` + ``zeek_records``.

    The reference tails nothing (strictly batch per date dir); a live Zeek
    deployment appends hourly .log.gz files, which is exactly the file
    source's incremental-listing model.
    """
    from ..sources.zeek_records import parse_tsv_lines

    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path_glob)
    )
    data = lines.filter(~F.col("value").startswith("#"))  # S6 analog
    return parse_tsv_lines(data, record_type)


def start_zeek_family_stream(
    spark: SparkSession,
    path_glob: str,
    record_type: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
):
    """Stream one typed family to its own parquet sink, exactly-once."""
    typed = read_zeek_family_stream(spark, path_glob, record_type, max_files_per_trigger)
    return (
        typed.writeStream.format("parquet")
        .option("path", f"{out_dir}/{record_type}")
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_exact_dedup(
    pages: DataFrame, watermark: str = "24 hours", key_cols: tuple[str, ...] = ("url",)
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence per key within the
    watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to keys seen
    inside the watermark window (a plain dropDuplicates on a stream grows
    state forever — a non-starter on a 10^12-row feed). A re-crawled URL
    arriving more than ``watermark`` after its first appearance is admitted
    again — the right contract for continuous web ingest, where cross-
    horizon dedup belongs to the batch layer (``operators.dedup``).
    """
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def start_dedup_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "24 hours",
    max_files_per_trigger: int = 100000,
):
    """Start a deduplicated pass-through stream: first occurrence per url
    (within the watermark) lands in the sink exactly once."""
    pages = read_pages_stream(spark, input_path, max_files_per_trigger)
    deduped = streaming_exact_dedup(pages, watermark).withColumn(
        "day", F.date_format("warc_ts", "yyyy-MM-dd")
    )
    return (
        deduped.drop("html").writeStream.format("parquet")
        .option("path", f"{out_dir}/pages_dedup")
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("day")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_agg_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 100000,
):
    """Start the watermarked per-host-hour aggregate stream (append mode:
    a window emits once its watermark passes — deterministic finalization).

    Default admits all ready files in one micro-batch: a file source is not
    event-time-ordered, so small triggers would advance the watermark past
    windows that still have in-flight rows (correct streaming semantics —
    those rows count as late — but surprising for bounded backfills).
    Continuous ingest deployments lower ``max_files_per_trigger`` and accept
    the watermark's late-row policy.
    """
    pages = read_pages_stream(spark, input_path, max_files_per_trigger)
    agg = streaming_events_per_host_hour(pages, watermark)
    return (
        agg.writeStream.format("parquet")
        .option("path", f"{out_dir}/events_per_host_hour")
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_ivfpq_encode_stream(
    spark: SparkSession,
    input_path: str,
    index_dir: str,
    checkpoint_dir: str,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 100000,
):
    """Continuous IVF-PQ index maintenance: embedding rows are
    cell-assigned and PQ-encoded ON ARRIVAL and appended to the
    cell-partitioned (id, codes) index — the streaming twin of
    ``similarity.write_ivfpq_index``, so the ANN index never needs a
    full-corpus rebuild as the corpus grows.

    The encode stage is the same fold-exact Column projection as the
    batch write path (both run inside whole-stage codegen per
    micro-batch); quantizers (centroids/codebooks) are FROZEN constants —
    the standard production contract: retraining the quantizer means
    rebuilding the index, appending rows never does.
    ``ivfpq_topk_indexed`` works unchanged over the streaming layout.
    """
    from ..operators.similarity import nearest_centroid, pq_encode_expr

    schema = spark.read.parquet(input_path).schema
    emb = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    enc = emb.select(
        F.col(id_col),
        pq_encode_expr(F.col(vec_col), codebooks).alias("_codes"),
        nearest_centroid(F.col(vec_col), centroids).alias("_c"),
    )
    return (
        enc.writeStream.format("parquet")
        .option("path", index_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("_c")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_hll_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    value_cols: tuple[str, ...] = ("user_id", "event_type"),
    p: int = 8,
    hash_fn: str = "xxhash64",
    max_files_per_trigger: int = 100000,
):
    """Maintain a HyperLogLog register table over a growing events
    directory — the streaming twin of ``sketches.hll_registers``.

    max() is associative and insensitive to arrival order, so the exact
    batch expression (``hll_register_rows`` -> groupBy(reg).max) runs as
    an unwatermarked streaming aggregation whose state is the m-register
    table itself — O(2^p) state forever, no growth, no late-data policy
    needed (a late row can only raise a register, never retract one).
    Each trigger rewrites ``{out_dir}/hll_registers`` atomically via
    foreachBatch overwrite (complete mode; the relation is <= 2^p rows,
    so the rewrite is trivial at any corpus size). The register table
    feeds the same harmonic estimator as the batch path; per-day sketch
    tables merge by greatest(max_rho) without touching raw rows.
    """
    from ..operators.sketches import hll_register_rows

    schema = spark.read.parquet(input_path).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    rows = hll_register_rows(
        ev, F.concat_ws("|", *[F.col(c) for c in value_cols]), p, hash_fn
    )
    regs = rows.groupBy("reg").agg(F.max("_rho").alias("max_rho"))

    def _sink(batch_df: DataFrame, _bid: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/hll_registers")

    return (
        regs.writeStream.foreachBatch(_sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_bloom_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    value_cols: tuple[str, ...] = ("user_id",),
    m_bits: int = 1 << 16,
    k: int = 4,
    hash_fn: str = "xxhash64",
    max_files_per_trigger: int = 100000,
):
    """Maintain a Bloom-filter word table over a growing directory — the
    streaming twin of ``sketches.bloom_build`` (same shape as
    ``start_hll_stream`` above: bit_or is associative and
    arrival-order-insensitive, so the batch expression runs as an
    unwatermarked streaming aggregation whose state is the word table —
    O(m/32) rows forever; a late row can only set bits, never clear).

    This is the live half of the ingest-dedup gate: the batch path
    (``dedup.dedup_against``) prefilters a new snapshot against the
    corpus filter; this stream keeps that filter current as documents
    arrive, rewriting ``{out_dir}/bloom_words`` atomically per trigger.
    """
    from ..operators.sketches import bloom_positions

    schema = spark.read.parquet(input_path).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    pos = ev.select(
        F.explode(
            bloom_positions(
                F.concat_ws("|", *[F.col(c) for c in value_cols]),
                m_bits,
                k,
                hash_fn,
            )
        ).alias("p")
    )
    words = (
        pos.select(
            F.shiftright(F.col("p"), 5).alias("word_idx"),
            F.expr("shiftleft(1L, cast(p & 31 as int))").alias("_m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_m").alias("word"))
    )

    def _sink(batch_df: DataFrame, _bid: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/bloom_words")

    return (
        words.writeStream.foreachBatch(_sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_ingest_gate_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    max_files_per_trigger: int = 100000,
):
    """The `dedup.dedup_against` ingest gate run CONTINUOUSLY: documents
    stream in, each micro-batch is (1) internally exact-deduped (min-id
    survivor), (2) anti-joined against the corpus hash index, and the
    survivors append to ``{out}/corpus`` while their hashes append to
    ``{out}/hash_index`` — the 8-bytes/doc relation that makes the next
    batch's gate a hash anti-join instead of a corpus scan.

    Delivery semantics (same contract note as the typed router): the two
    appends are not atomic, so a crash between corpus- and index-append
    followed by a REPLAYED trigger can duplicate that batch's rows in the
    corpus (at-least-once); every LATER batch is content-exactly-once
    because its gate sees the index. Exactly-once for the batch itself
    needs a transactional table format (Iceberg — MIGRATION.md); a
    downstream `exact_dedup` also self-heals. Unbounded state lives in
    the index DIRECTORY, not in streaming state — the streaming query
    itself keeps zero aggregation state.
    """
    import os

    from ..operators.dedup import _base_hash, exact_dedup

    schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    idx_path = os.path.join(out_dir, "hash_index")
    corpus_path = os.path.join(out_dir, "corpus")

    def _sink(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        keep = exact_dedup(batch, id_col, text_col).select(
            F.col("keep_id").alias(id_col)
        )
        b = batch.join(keep, id_col).withColumn(
            "_bh", _base_hash(F.col(text_col), hash_fn)
        )
        try:
            idx = sp.read.parquet(idx_path)
            b = b.join(idx, "_bh", "left_anti")
        except Exception:  # noqa: BLE001 - first batch: no index yet
            pass
        b = b.persist()
        try:
            b.drop("_bh").write.mode("append").parquet(corpus_path)
            b.select("_bh").distinct().write.mode("append").parquet(idx_path)
        finally:
            b.unpersist()

    return (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_text_gate_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.8,
    hash_fn: str = "xxhash64",
    n_buckets: int = 64,
    max_files_per_trigger: int = 100000,
):
    """NEAR-dup ingest gate run CONTINUOUSLY — the streaming twin of
    ``dedup.text_gate_indexed`` with per-batch index maintenance. Where
    ``start_ingest_gate_stream`` gates exact content hashes only, each
    micro-batch here is (1) internally exact-deduped (min-id survivor;
    in-batch NEAR dups both survive the batch — same simpler-rule note
    as the media gate: a later re-arrival is gated by the index),
    (2) gated against the materialized text index — exact hash anti-join
    PLUS MinHash-LSH near-dup verify, every probe partition-pruned — and
    (3) survivors append to ``{out}/corpus`` while
    ``write_text_index(mode='append')`` grows the hashes/bands/sets
    relations, so the NEXT batch's near-dup gate costs O(batch), never a
    corpus recompute. Unbounded state lives in the index DIRECTORY; the
    streaming query itself keeps zero aggregation state.

    Delivery semantics: same at-least-once note as
    ``start_ingest_gate_stream`` (corpus- and index-append are not
    atomic; every LATER batch is content-exactly-once because its gate
    sees the index; Iceberg makes the batch itself transactional —
    MIGRATION.md)."""
    import os

    from ..operators.dedup import exact_dedup, text_gate_indexed, write_text_index

    schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    idx_path = os.path.join(out_dir, "text_index")
    corpus_path = os.path.join(out_dir, "corpus")

    def _sink(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        keep = exact_dedup(batch, id_col, text_col).select(
            F.col("keep_id").alias(id_col)
        )
        b = batch.join(keep, id_col)
        handles: list = []
        if os.path.exists(os.path.join(idx_path, "sets", "_SUCCESS")):
            b = text_gate_indexed(
                sp, b, idx_path, id_col, text_col,
                num_perm=num_perm, bands=bands, n=n, threshold=threshold,
                hash_fn=hash_fn, n_buckets=n_buckets,
                unpersist_handles=handles,
            )
        # localCheckpoint (not persist) BEFORE the appends: the gate plan
        # READS the index paths, and writing to a path RECACHES any plan
        # over it (Spark recache-by-path) — a merely-persisted gate result
        # would be recomputed against its own first append and the later
        # index relations would see the batch gated to empty. Truncating
        # the lineage to materialized rows severs the path dependency.
        b = b.localCheckpoint(eager=True)
        try:
            b.write.mode("append").parquet(corpus_path)
            write_text_index(
                b, idx_path, id_col, text_col,
                num_perm=num_perm, bands=bands, n=n, hash_fn=hash_fn,
                n_buckets=n_buckets, mode="append",
            )
        finally:
            for h in handles:
                h.unpersist()

    return (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_paragraph_dedup_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    max_files_per_trigger: int = 100000,
):
    """CCNet paragraph dedup run CONTINUOUSLY — the streaming twin of
    ``dedup.paragraph_dedup`` (max_docs=1) with a growing paragraph-hash
    index: each micro-batch is gated by ``paragraph_dedup_against``
    (in-batch first-occurrence election + anti-join against every
    earlier arrival's published hashes), surviving docs append to
    ``{out}/corpus`` with their scrubbed text, and the batch's kept
    hashes append to ``{out}/para_index`` — so the cookie banner that
    arrived last week suppresses this week's copies at O(batch) probe
    cost, never a corpus recompute. Docs whose every paragraph was
    already published drop entirely (the batch twin's empty-text rule).

    When arrivals carry ascending ids the streamed corpus equals
    ``paragraph_dedup(all_arrivals)`` exactly (pinned in pytest).
    Unbounded state lives in the index DIRECTORY (8 bytes per distinct
    paragraph); the streaming query itself keeps zero aggregation state.
    Same at-least-once note as ``start_ingest_gate_stream``: corpus- and
    index-append are not atomic, but every LATER batch is
    content-exactly-once because its gate sees the index."""
    import os

    from ..operators.dedup import paragraph_dedup_against

    schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    idx_path = os.path.join(out_dir, "para_index")
    corpus_path = os.path.join(out_dir, "corpus")

    def _sink(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        if os.path.exists(os.path.join(idx_path, "_SUCCESS")):
            seen = sp.read.parquet(idx_path)
        else:
            seen = sp.createDataFrame([], "_h long")
        per_doc, new_h = paragraph_dedup_against(
            batch, seen, id_col, text_col, hash_fn=hash_fn
        )
        keep = per_doc.filter(F.length("clean_text") > 0).select(
            F.col(id_col), F.col("clean_text").alias(text_col)
        )
        out_rows = batch.drop(text_col).join(keep, id_col).select(*batch.columns)
        # localCheckpoint BEFORE the appends — the gate plan reads the
        # index path and writing to it would recache-by-path (same seam
        # as start_text_gate_stream)
        out_rows = out_rows.localCheckpoint(eager=True)
        new_h = new_h.localCheckpoint(eager=True)
        out_rows.write.mode("append").parquet(corpus_path)
        new_h.write.mode("append").parquet(idx_path)

    return (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_zeek_typed_router_stream(
    spark: SparkSession,
    path_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    families: list[str] | None = None,
    max_files_per_trigger: int = 64,
):
    """ONE streaming job composing ingest -> typed cast -> router: a single
    text stream over a MIXED-family glob (``{prefix}/*/*.log*``), each
    micro-batch fanned into per-family typed parquet sinks.

    This closes the round-3 gap where ``start_router_stream`` routed and
    ``start_zeek_family_stream`` typed, separately: record_type derives
    from the file name (the reference's S2 path split, zeek_log.rs:374-383),
    every family in the whitelist gets its own vocabulary's tokenize +
    typed-cast stage (``parse_tsv_lines``), and each lands in
    ``{out_dir}/{family}/day=<date-dir>`` — per-family schemas CAN'T share
    one ``writeStream.partitionBy`` sink (heterogeneous columns), so the
    fan-out is ``foreachBatch``, the standard multi-sink idiom.

    Delivery: ``foreachBatch`` + append is at-least-once on micro-batch
    retry (exactly-once needs an idempotent/transactional sink — Iceberg
    per MIGRATION.md, or replayed-batch-id dedup). For the bounded
    ``availableNow`` backfills tested here a batch either commits fully or
    the whole job is rerun fresh, so row-set equality vs the batch path
    holds; a continuous deployment should front an Iceberg sink.

    Scale: ONE pass over the input per micro-batch scan; each family's
    filter + parse is a narrow projection over the shared in-memory batch
    (no re-read — Spark caches nothing extra because the batch DataFrame
    re-plans the file slice per sink, still one file-listing per trigger).
    """
    from ..sources.zeek_records import FIELDS_BY_TYPE, parse_tsv_lines

    families = families or sorted(FIELDS_BY_TYPE)
    lines = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path_glob)
    )
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    tagged = (
        lines.filter(~F.col("value").startswith("#"))  # S6 analog
        .select(
            "value",
            F.lower(F.split(fname, r"\.").getItem(0)).alias("record_type"),
            F.element_at(F.split(F.input_file_name(), "/"), -2).alias("day"),
        )
    )

    def _route(batch, _batch_id):
        # one tiny distinct job up front so absent families don't write
        # empty sink directories every micro-batch
        present = {r[0] for r in batch.select("record_type").distinct().collect()}
        for fam in families:
            if fam not in present:
                continue
            fam_rows = batch.filter(F.col("record_type") == fam)
            typed = parse_tsv_lines(fam_rows, fam, keep_cols=("day",))
            (
                typed.write.mode("append")
                .partitionBy("day")
                .parquet(f"{out_dir}/{fam}")
            )

    return (
        tagged.writeStream.foreachBatch(_route)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_router_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    types: list[str] | None = None,
    max_files_per_trigger: int = 100000,
):
    """Streaming multi-sink router: typed conn-like records fan out to
    per-record-type sink directories in ONE pass — the streaming twin of
    ``route.route_to_sinks`` (R1). ``writeStream.partitionBy(record_type,
    day)`` keeps the single-scan property (each micro-batch writes every
    type's directory from one pass over the batch, never one job per
    type), the whitelist filter prunes unknown types before any shuffle,
    and the checkpoint gives exactly-once sink semantics per micro-batch.
    Sinks stay readable as ``record_type=<t>/day=<d>`` partitions, so
    ``route.read_sink`` works unchanged on the streaming output."""
    from ..functions.parse import parse_conn_like
    from ..operators.route import whitelist_filter

    pages = read_pages_stream(spark, input_path, max_files_per_trigger)
    conn = whitelist_filter(parse_conn_like(pages, vectorized=True), types)
    routed = conn.withColumn("day", F.date_format("ts_bucket", "yyyy-MM-dd"))
    return (
        routed.writeStream.format("parquet")
        .option("path", f"{out_dir}/conn_like")
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("record_type", "day")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_state_stream(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    checkpoint_dir: str,
    keys: list[str],
    metrics,
    p: int = 6,
    hash_fn: str = "xxhash64",
    max_files_per_trigger: int = 100000,
):
    """Continuously maintain a mergeable-aggregate state table
    (operators/incremental.py) from a growing directory — the streaming
    twin of ``update_state``. Unlike the HLL/Bloom twins (idempotent
    max/bit_or state), count/sum merges are NOT replay-safe, so each
    micro-batch merge is made exactly-once by hand: the micro-batch id
    commits inside ``_meta.json`` written into the state tmp directory
    BEFORE the atomic swap (state content + commit marker land in one
    rename), and a replayed batch id after a crash-restart is skipped.
    State stays O(groups) rows regardless of history; each trigger costs
    one batch aggregation plus a state-sized merge."""
    from ..operators.incremental import read_state_meta, update_state

    schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def _sink(batch_df: DataFrame, bid: int) -> None:
        committed = read_state_meta(state_path)
        if committed is not None and bid <= committed.get("last_batch_id", -1):
            return  # replayed micro-batch after crash-restart
        update_state(
            spark, state_path, batch_df, keys, metrics, p, hash_fn,
            meta={"last_batch_id": bid},
        )

    return (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_inverted_index_stream(
    spark: SparkSession,
    input_path: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
    with_doclen: bool = False,
    with_positions: bool = False,
    max_files_per_trigger: int = 100000,
):
    """Keep the materialized inverted index fresh from a document stream
    — the text sibling of the IVF-PQ encode stream: each micro-batch's
    postings rows APPEND into the bucket-partitioned layout (bucket =
    f(term) only, so new batches land in existing directories without
    rewriting old files; lookups/BM25/phrase queries keep pruning).

    ``with_doclen`` also maintains the BM25 corpus stats: the two-long
    (n_docs, sum_dl) row is re-written per batch via a tmp-dir atomic
    swap (the ``update_state`` discipline). Contract notes:

    - Batches must contain NEW documents only — compose
      ``start_ingest_gate_stream`` upstream; replayed triggers after a
      crash between postings-append and stats-swap can double that one
      batch (at-least-once; Iceberg for transactional appends —
      MIGRATION.md). BM25's df stays correct across appends because a
      (term, doc) posting is complete within the batch that owns the
      doc.
    - ``max_df_frac`` stop-listing is corpus-global and therefore a
      batch-build option only; a streamed index applies stop-lists at
      query time instead.
    """
    import os
    import shutil

    from ..functions.textstats import token_count
    from ..operators.inverted import postings

    schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    stats_path = os.path.join(index_path, "_stats")

    def _sink(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        rows = postings(
            batch,
            id_col,
            text_col,
            n_buckets,
            hash_fn,
            None,
            with_doclen,
            with_positions,
        )
        rows.write.mode("append").partitionBy("_b").parquet(index_path)
        if not with_doclen:
            return
        inc = batch.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(token_count(F.col(text_col))).cast("long").alias("s"),
        ).first()
        n_docs, sum_dl = int(inc["n"]), int(inc["s"] or 0)
        try:
            old = sp.read.parquet(stats_path).first()
            n_docs += int(old["n_docs"])
            sum_dl += int(old["sum_dl"])
        except Exception:  # noqa: BLE001 - first batch: no stats yet
            pass
        tmp = stats_path + "._tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        sp.createDataFrame(
            [(n_docs, sum_dl)], "n_docs long, sum_dl long"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        back = stats_path + "._old"
        shutil.rmtree(back, ignore_errors=True)
        if os.path.exists(stats_path):
            os.rename(stats_path, back)
        try:
            os.rename(tmp, stats_path)
        except OSError:
            if os.path.exists(back):
                os.rename(back, stats_path)
            raise
        shutil.rmtree(back, ignore_errors=True)

    return (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_cdx_stream(
    spark: SparkSession,
    input_path: str,
    index_path: str,
    checkpoint_dir: str,
    url_col: str = "url",
    ts_col: str = "ts",
    text_col: str = "text",
    max_files_per_trigger: int = 100000,
):
    """Keep the materialized CDX index (sources/cdx.py) fresh from a
    capture stream — the URL-index sibling of the inverted-index twin:
    each micro-batch's capture rows route to the EXISTING range buckets
    (boundary = each bucket's original min_key, read from the bounded
    ``_cluster`` sidecar; keys below the first boundary extend bucket 0)
    and APPEND as new sorted runs inside ``data/_rb=<b>`` — exactly how
    CC itself publishes new crawls as additional sorted index shards.
    The sidecar then merges per-bucket (min, max, n) and re-writes via
    the tmp-dir atomic swap (the ``update_state`` discipline), so
    lookups prune correctly the moment the batch commits.

    Contract notes (same as the inverted-index twin):

    - The index must exist (``write_cdx_index``) before the stream
      starts; the initial build owns boundary selection, the stream
      never re-samples — buckets therefore stay non-overlapping (a key
      routes to bucket b iff boundary(b) <= key < boundary(b+1), so a
      bucket's max can never cross its neighbour's min).
    - Appends are at-least-once across a crash between data-append and
      sidecar-swap (that one batch can double; the sidecar n is a
      diagnostic count, pruning correctness only needs min/max, which
      are idempotent under replay). Iceberg for transactional appends —
      MIGRATION.md.
    - Within-bucket ordering is per-FILE sorted runs after appends, not
      one global run; ``cdx_lookup_prefix`` filters (order is not part
      of its contract) and a periodic batch rewrite re-sorts a bucket in
      place when range scans want single-run locality.
    """
    import os
    import shutil

    from ..sources.cdx import cdx_records

    schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    cluster_path = os.path.join(index_path, "_cluster")

    def _sink(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        old = sp.read.parquet(cluster_path).collect()  # bounded: n_buckets
        bounds = sorted(
            ((r["_rb"], r["min_key"]) for r in old), key=lambda t: t[1]
        )
        route = [
            (
                rb,
                "" if i == 0 else lo,
                bounds[i + 1][1] if i + 1 < len(bounds) else None,
            )
            for i, (rb, lo) in enumerate(bounds)
        ]
        bdf = sp.createDataFrame(route, "_rb int, lo string, hi string")
        routed = cdx_records(batch, url_col, ts_col, text_col).join(
            F.broadcast(bdf),
            (F.col("surt") >= F.col("lo"))
            & (F.col("hi").isNull() | (F.col("surt") < F.col("hi"))),
        ).drop("lo", "hi")
        routed.persist()
        try:
            (
                routed.sortWithinPartitions("surt", "ts")
                .write.mode("append")
                .partitionBy("_rb")
                .parquet(f"{index_path}/data")
            )
            inc = {
                r["_rb"]: r
                for r in routed.groupBy("_rb")
                .agg(
                    F.min("surt").alias("mn"),
                    F.max("surt").alias("mx"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            }
        finally:
            routed.unpersist()
        merged = [
            (
                r["_rb"],
                min(r["min_key"], inc[r["_rb"]]["mn"])
                if r["_rb"] in inc
                else r["min_key"],
                max(r["max_key"], inc[r["_rb"]]["mx"])
                if r["_rb"] in inc
                else r["max_key"],
                int(r["n"]) + int(inc[r["_rb"]]["n"]) if r["_rb"] in inc else int(r["n"]),
            )
            for r in old
        ]
        tmp = cluster_path + "._tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        sp.createDataFrame(
            merged, "_rb int, min_key string, max_key string, n long"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        back = cluster_path + "._old"
        shutil.rmtree(back, ignore_errors=True)
        if os.path.exists(cluster_path):
            os.rename(cluster_path, back)
        try:
            os.rename(tmp, cluster_path)
        except OSError:
            if os.path.exists(back):
                os.rename(back, cluster_path)
            raise
        shutil.rmtree(back, ignore_errors=True)

    return (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_classifier_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    weights: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    max_files_per_trigger: int = 100000,
):
    """Online document scoring with a trained linear classifier
    (operators/classify.py): the streaming twin of ``linear_scores``.
    Inference is a stateless zero-shuffle projection (hashed occurrence
    fold against the weight-literal array), so this is a plain append
    file sink — exactly-once via the file-sink commit log, no state
    store, no watermark. The model rides the PLAN as literals: to roll
    a new model, stop and restart with new weights (scores already
    written are immutable history; re-scoring is a batch backfill job).
    """
    from ..operators.classify import linear_scores

    schema = spark.read.parquet(input_path).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    scored = linear_scores(docs, weights, id_col, text_col, hash_fn)
    return (
        scored.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def start_media_gate_stream(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
    payload_col: str = "payload",
    max_hamming: int = 7,
    n_chunks: int = 8,
    max_files_per_trigger: int = 100000,
):
    """Perceptual media ingest gate run CONTINUOUSLY — the streaming twin
    of ``dedup.fingerprint_gate`` over ``multimodal.phash_images``:
    binary media rows stream in; each micro-batch is fingerprinted
    (one mapInPandas stage), internally deduped (min-id survivor per
    near-dup set would need clustering, so the in-batch rule is the
    simpler exact-fingerprint min-id — re-encodes WITHIN one batch that
    differ by a few bits both survive the batch and the SECOND one is
    gated by the index on its next appearance), gated against the corpus
    fingerprint index by the pigeonhole hamming join, and survivors
    append to ``{out}/media`` while their fingerprints append to
    ``{out}/fp_index`` — 8 bytes/item, so the gate probes an index, never
    the media bytes.

    Delivery semantics: same at-least-once note as
    ``start_ingest_gate_stream`` (two appends, not atomic; later batches
    are content-exactly-once because the gate sees the index; Iceberg
    makes the batch itself transactional — MIGRATION.md)."""
    import os

    from ..functions.multimodal import phash_images
    from ..operators.dedup import fingerprint_gate

    schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    idx_path = os.path.join(out_dir, "fp_index")
    media_path = os.path.join(out_dir, "media")

    def _sink(batch: DataFrame, _bid: int) -> None:
        sp = batch.sparkSession
        fp = phash_images(batch, url_col=url_col, payload_col=payload_col)
        # in-batch exact-fingerprint dedup: min-id survivor
        keep = fp.groupBy("fingerprint").agg(F.min(url_col).alias(url_col))
        try:
            idx = sp.read.parquet(idx_path)
            keep = fingerprint_gate(
                keep, idx, url_col, "fingerprint",
                max_hamming=max_hamming, n_chunks=n_chunks,
            )
        except Exception:  # noqa: BLE001 - first batch: no index yet
            pass
        keep = keep.persist()
        try:
            batch.join(keep.select(url_col), url_col).write.mode("append").parquet(
                media_path
            )
            keep.select(url_col, "fingerprint").write.mode("append").parquet(idx_path)
        finally:
            keep.unpersist()

    return (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_lm_score_stream(
    spark: SparkSession,
    input_path: str,
    ref_path: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    max_files_per_trigger: int = 100000,
):
    """Online reference-LM scoring — the streaming twin of
    ``lm.stupid_backoff_scores``: the Stupid Backoff model is trained
    ONCE from the static reference corpus at start (three gram
    relations, persisted so micro-batches re-read the cache instead of
    re-aggregating), then every micro-batch runs the BATCH scorer
    verbatim inside ``foreachBatch`` and appends (id, n_tokens,
    sb_score) rows. foreachBatch is required because the per-document
    position-ordered fold is a grouped aggregation, which an append-mode
    streaming plan cannot host without a watermark the use case doesn't
    have (documents are complete rows, not windows).

    Delivery: at-least-once on a crash-replayed trigger (same caveat
    and self-heal note as ``start_ingest_gate_stream`` — scores are a
    pure function of the row, so replayed rows are byte-identical
    duplicates a downstream exact dedup removes). Model roll = stop,
    retrain, restart — scored history is immutable, rescoring is the
    batch job. The returned query object carries ``_lm_handles`` —
    unpersist after stopping."""
    from ..operators.lm import stupid_backoff_model, stupid_backoff_scores

    model = stupid_backoff_model(spark.read.parquet(ref_path), min_count=min_count)
    handles = []
    for key in ("uni", "bi", "tri"):
        model[key] = model[key].persist()
        model[key].count()  # materialize once; batches re-read the cache
        handles.append(model[key])

    schema = spark.read.parquet(input_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def _sink(batch: DataFrame, _bid: int) -> None:
        stupid_backoff_scores(batch, model, id_col, text_col).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        src.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q._lm_handles = handles
    return q


def start_drift_stream(
    spark: SparkSession,
    input_path: str,
    reference_path: str,
    out_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 500.0,
    n_bins: int = 16,
    max_files_per_trigger: int = 100000,
):
    """Streaming data-drift monitor — the streaming twin of
    ``profile.histogram_compare`` + ``drift_score``.

    The REFERENCE histogram is computed once from a static snapshot
    (bounded: <= n_bins count rows, collected to a literal relation).
    The stream side is an unwatermarked streaming count per bin —
    count is associative and arrival-order-insensitive, so complete-mode
    state is the <= n_bins cumulative histogram itself (O(n_bins)
    forever, no growth, no late-data policy: a late row only increments
    a cell). Each trigger rewrites ``{out_dir}/drift`` atomically with
    the per-bin comparison + the folded triangular-discrimination value
    against the reference — the SAME ``drift_from_counts`` /
    ``drift_score`` algebra as batch, so streamed drift equals the batch
    drift of everything-that-arrived, bit for bit (pinned in pytest).
    An ingest pipeline watches this relation to catch a corrupted or
    re-weighted source before it pollutes a 100 TB corpus.
    """
    from ..operators.profile import _bin_expr, drift_from_counts, drift_score

    ref = (
        spark.read.parquet(reference_path)
        .groupBy(_bin_expr(F.col(value_col), lo, hi, n_bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    ref_rows = ref.collect()  # bounded: <= n_bins rows
    schema = spark.read.parquet(input_path).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    counts = ev.groupBy(
        _bin_expr(F.col(value_col), lo, hi, n_bins).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n_b"))

    def _sink(batch_df: DataFrame, _bid: int) -> None:
        s = batch_df.sparkSession
        ca = s.createDataFrame(ref_rows, schema="bin int, n_a long")
        bins = drift_from_counts(ca, batch_df)
        out = bins.join(F.broadcast(drift_score(bins))).select(
            "bin", "n_a", "n_b", "p_a", "p_b", "term", "drift"
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/drift")

    return (
        counts.writeStream.foreachBatch(_sink)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
