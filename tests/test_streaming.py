"""Streaming pipeline tests: availableNow micro-batch run over the synth
pages table must produce the same routed rows / aggregate counts as batch."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from log_analysis_spark.functions.parse import parse_http_like
from log_analysis_spark.operators.aggregate import events_per_host_hour
from log_analysis_spark.streaming.stream_job import (
    start_agg_stream,
    start_pipeline_stream,
)
from log_analysis_spark.synth import write_pages


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "pages")
    write_pages(spark, 2000, p)
    return p


def test_stream_matches_batch_rows(spark, pages_path, tmpdir_path):
    q = start_pipeline_stream(
        spark, pages_path, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt"
    )
    q.awaitTermination(300)
    got = spark.read.parquet(f"{tmpdir_path}/out/http_like")
    batch = parse_http_like(spark.read.parquet(pages_path).drop("day"), byte_exact=True)
    assert got.count() == 2000
    # routed-row equality on the url key set
    assert (
        got.select("url").exceptAll(batch.select("url")).count() == 0
        and batch.select("url").exceptAll(got.select("url")).count() == 0
    )


def test_stream_agg_matches_batch(spark, pages_path, tmpdir_path):
    q = start_agg_stream(
        spark, pages_path, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt"
    )
    q.awaitTermination(300)
    got = spark.read.parquet(f"{tmpdir_path}/out/events_per_host_hour")
    pages = spark.read.parquet(pages_path).drop("day")
    batch = events_per_host_hour(parse_http_like(pages, byte_exact=True))
    # availableNow + watermark: windows whose watermark passed are emitted;
    # with bounded input the final watermark covers all but the max event
    # hour region — compare on the emitted subset, counts must be exact.
    joined = got.alias("s").join(
        batch.alias("b"), on=[F.col("s.hour") == F.col("b.hour"), F.col("s.host") == F.col("b.host")]
    )
    n_got = got.count()
    assert n_got > 0
    assert joined.filter(F.col("s.n_events") != F.col("b.n_events")).count() == 0
    assert joined.count() == n_got


def test_stream_restart_resumes_from_checkpoint(spark, pages_path, tmpdir_path):
    out, ckpt = f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt"
    q = start_pipeline_stream(spark, pages_path, out, ckpt, max_files_per_trigger=2)
    q.awaitTermination(300)
    n1 = spark.read.parquet(f"{out}/http_like").count()
    # restart with the same checkpoint: no new input -> no duplicate rows
    q2 = start_pipeline_stream(spark, pages_path, out, ckpt)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(f"{out}/http_like").count()
    assert n1 == n2 == 2000
    assert os.path.isdir(f"{ckpt}/offsets")


def test_stream_dedup_first_occurrence_per_url(spark, pages_path, tmpdir_path):
    """Streaming exact dedup: duplicated input (two ingests of the same
    table in one availableNow batch) must emit each url once."""
    import shutil

    from log_analysis_spark.streaming.stream_job import start_dedup_stream

    dup_path = f"{tmpdir_path}/pages_dup"
    shutil.copytree(pages_path, dup_path)
    # duplicate every file under a second name -> every url arrives twice
    for root, _dirs, files in os.walk(dup_path):
        for f in files:
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(root, f), os.path.join(root, "dup_" + f))
    q = start_dedup_stream(
        spark, dup_path, f"{tmpdir_path}/dd_out", f"{tmpdir_path}/dd_ckpt"
    )
    q.awaitTermination(300)
    got = spark.read.parquet(f"{tmpdir_path}/dd_out/pages_dedup")
    n_in = spark.read.parquet(dup_path).count()
    assert n_in == 4000  # duplication happened
    assert got.count() == 2000  # one row per url
    assert got.select("url").distinct().count() == 2000


def test_zeek_family_stream_typed_sink(spark, tmpdir_path):
    """Streaming ingest of the reference's gzipped-TSV format: typed dns
    rows land in the sink with casts applied; a second run after a new
    file appears processes ONLY the new file (checkpointed incremental
    listing)."""
    from pyspark.sql import types as T

    from log_analysis_spark.sources import zeek_tsv as zk
    from log_analysis_spark.streaming.stream_job import start_zeek_family_stream

    fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h", "id.resp_p",
              "proto", "trans_id", "rtt", "query", "qclass", "qclass_name",
              "qtype", "qtype_name", "rcode", "rcode_name", "AA", "TC", "RD",
              "RA", "Z", "answers", "TTLs", "rejected"]
    root = os.path.join(tmpdir_path, "zeek")
    zk.write_zeek_fixture(
        root, "2024-07-02", "dns", "00:00:00-01:00:00", fields,
        [["1719878401.0", "D1", "10.0.0.1", "5353", "8.8.8.8", "53", "udp",
          "1", "-", "a.example", "1", "C_INTERNET", "1", "A", "0", "NOERROR",
          "F", "F", "T", "T", "0", "-", "-", "F"]],
    )
    glob = f"{root}/*/dns.*.log.gz"
    out, ckpt = f"{tmpdir_path}/zs_out", f"{tmpdir_path}/zs_ckpt"
    q = start_zeek_family_stream(spark, glob, "dns", out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(f"{out}/dns")
    assert got.count() == 1
    sch = {f.name: f.dataType for f in got.schema.fields}
    assert sch["ts"] == T.DoubleType() and sch["qtype"] == T.LongType()
    r = got.collect()[0]
    assert r["qtype_name"] == "A" and r["RD"] is True and r["rtt"] is None

    # a new hourly file appears -> incremental micro-batch picks up only it
    zk.write_zeek_fixture(
        root, "2024-07-02", "dns", "01:00:00-02:00:00", fields,
        [["1719882001.0", "D2", "10.0.0.2", "5353", "8.8.4.4", "53", "udp",
          "2", "-", "b.example", "1", "C_INTERNET", "28", "AAAA", "3",
          "NXDOMAIN", "F", "F", "T", "F", "0", "-", "-", "T"]],
    )
    q2 = start_zeek_family_stream(spark, glob, "dns", out, ckpt)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(f"{out}/dns")
    assert got2.count() == 2
    assert {r["uid"] for r in got2.collect()} == {"D1", "D2"}


def test_zeek_typed_router_stream_matches_batch(spark, tmpdir_path):
    """ONE streaming job over a MIXED-family fixture tree (conn + dns +
    files across two dates): ingest -> per-family typed cast -> per-family
    sinks, row-sets equal to the batch path (search(typed=True)) per
    family. Extends test_stream_router_matches_batch_sinks through the
    typed cast stage (round-3 verdict ask #5)."""
    from pyspark.sql import types as T

    from log_analysis_spark.sources import zeek_tsv as zk
    from log_analysis_spark.streaming.stream_job import (
        start_zeek_typed_router_stream,
    )
    from tests.test_zeek_records import (
        _conn_http_fixture,
        _dns_fixture,
        _files_ssh_smtp_notice_fixture,
    )

    root = os.path.join(tmpdir_path, "zeek")
    _dns_fixture(root)            # dns on 2024-07-02
    _conn_http_fixture(root)      # conn + http on 2024-07-02
    _files_ssh_smtp_notice_fixture(root)  # files/ssh/smtp/notice 2024-07-02
    # second date: another dns file (cross-date union in one stream)
    dns_fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h",
                  "id.resp_p", "proto", "trans_id", "rtt", "query", "qclass",
                  "qclass_name", "qtype", "qtype_name", "rcode", "rcode_name",
                  "AA", "TC", "RD", "RA", "Z", "answers", "TTLs", "rejected"]
    zk.write_zeek_fixture(
        root, "2024-07-03", "dns", "00:00:00-01:00:00", dns_fields,
        [["1719964801.0", "D9", "10.0.0.9", "5353", "9.9.9.9", "53", "udp",
          "9", "-", "c.example", "1", "C_INTERNET", "1", "A", "0", "NOERROR",
          "F", "F", "T", "T", "0", "-", "-", "F"]],
    )

    out, ckpt = f"{tmpdir_path}/tr_out", f"{tmpdir_path}/tr_ckpt"
    q = start_zeek_typed_router_stream(spark, f"{root}/*/*.log.gz", out, ckpt)
    q.awaitTermination(300)

    # per-family row-set equality vs the batch typed path, across dates
    for fam in ("conn", "dns", "http", "files", "ssh", "smtp", "notice"):
        got = spark.read.parquet(f"{out}/{fam}")
        batches = []
        for date in ("2024-07-02", "2024-07-03"):
            try:
                frames = zk.search(spark, root, date, typed=True)
            except Exception:
                continue
            if fam in frames:
                batches.append(frames[fam].drop("record_type", "hour_bucket"))
        want = batches[0]
        for b in batches[1:]:
            want = want.unionByName(b)
        cols = sorted(want.columns)
        g, w = got.select(*cols), want.select(*cols)
        assert g.count() == w.count() > 0, fam
        assert g.exceptAll(w).count() == 0 and w.exceptAll(g).count() == 0, fam

    # the typed cast reached the sink: files seen_bytes is a long, notice
    # lat is a double, and the day partition column came from the date dir
    files_sch = {f.name: f.dataType for f in spark.read.parquet(f"{out}/files").schema.fields}
    assert files_sch["seen_bytes"] == T.LongType()
    assert files_sch["timedout"] == T.BooleanType()
    dns_days = {
        str(r["day"])  # hive partition discovery types day=... as DATE
        for r in spark.read.parquet(f"{out}/dns").select("day").distinct().collect()
    }
    assert dns_days == {"2024-07-02", "2024-07-03"}


def test_ivfpq_encode_stream_matches_batch_index(spark, tmpdir_path):
    """Streaming IVF-PQ index maintenance: rows encoded on arrival land in
    the same cell-partitioned (id, codes) layout as the batch
    write_ivfpq_index, queries over it return identical results, and a
    second batch of arrivals appends incrementally without re-encoding or
    duplicating the first."""
    from log_analysis_spark.operators import similarity as SIM

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = SIM.ivf_centroids(emb, n_centroids=8, lloyd_iters=0)
    books = SIM.pq_codebooks(emb, m=4, n_codes=8)
    half_a = emb.filter("vec_id % 2 = 0")
    half_b = emb.filter("vec_id % 2 = 1")

    src = f"{tmpdir_path}/emb_src"
    half_a.write.mode("overwrite").parquet(src)
    idx, ckpt = f"{tmpdir_path}/stream_idx", f"{tmpdir_path}/idx_ckpt"
    from log_analysis_spark.streaming.stream_job import start_ivfpq_encode_stream

    q = start_ivfpq_encode_stream(spark, src, idx, ckpt, cents, books)
    q.awaitTermination(300)
    got_a = spark.read.parquet(idx)
    assert got_a.count() == half_a.count()

    # second arrival wave -> incremental append, no dups
    half_b.write.mode("append").parquet(src)
    q2 = start_ivfpq_encode_stream(spark, src, idx, ckpt, cents, books)
    q2.awaitTermination(300)
    got = spark.read.parquet(idx)
    assert got.count() == emb.count()
    assert got.select("vec_id").distinct().count() == emb.count()

    # content identical to the batch index path
    batch_idx = f"{tmpdir_path}/batch_idx"
    SIM.write_ivfpq_index(emb, batch_idx, cents, books)
    want = spark.read.parquet(batch_idx).select("vec_id", "_codes", "_c")
    have = got.select("vec_id", "_codes", "_c")
    assert have.exceptAll(want).count() == 0 and want.exceptAll(have).count() == 0

    # and the indexed query is byte-for-byte the same over either layout
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    a = SIM.ivfpq_topk_indexed(spark, idx, qv, cents, books, k=10, n_probe=2).collect()
    b = SIM.ivfpq_topk_indexed(spark, batch_idx, qv, cents, books, k=10, n_probe=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_stream_router_matches_batch_sinks(spark, pages_path, tmpdir_path):
    """Streaming multi-sink router: per-type routed row sets must equal the
    batch router's over the same input, and the sink layout must be the
    same record_type=<t>/day=<d> partitioning (read_sink-compatible)."""
    from log_analysis_spark.functions.parse import parse_conn_like
    from log_analysis_spark.operators.route import read_sink, routed_counts
    from log_analysis_spark.streaming.stream_job import start_router_stream

    q = start_router_stream(
        spark, pages_path, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt_router"
    )
    q.awaitTermination(300)
    out = f"{tmpdir_path}/out/conn_like"
    got_counts = {
        r["record_type"]: r["n_rows"]
        for r in routed_counts(spark.read.parquet(out)).collect()
    }
    batch = parse_conn_like(spark.read.parquet(pages_path).drop("day"))
    want_counts = {
        r["record_type"]: r["n_rows"] for r in routed_counts(batch).collect()
    }
    assert got_counts == want_counts and got_counts
    # read_sink works unchanged over the streaming layout
    one_type = next(iter(want_counts))
    sink = read_sink(spark, out, one_type)
    assert sink.count() == want_counts[one_type]
    assert set(sink.select("record_type").distinct().toPandas()["record_type"]) == {one_type}


def test_hll_stream_matches_batch_registers(spark, tmpdir_path):
    """Streaming HLL register maintenance: after two incremental file
    arrivals the register table must equal the batch `hll_registers` over
    the full input (max is associative — order of arrival is irrelevant),
    and a restart resumes from state instead of reprocessing."""
    from log_analysis_spark.operators.sketches import hll_registers
    from log_analysis_spark.streaming.stream_job import start_hll_stream

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    inp = f"{tmpdir_path}/ev_in"
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(inp)
    args = (spark, inp, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt_hll")
    q = start_hll_stream(*args, p=8)
    q.awaitTermination(300)

    # second arrival: the other half lands later as new files in the dir
    ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(inp)
    q2 = start_hll_stream(*args, p=8)
    q2.awaitTermination(300)

    got = {
        r["reg"]: r["max_rho"]
        for r in spark.read.parquet(f"{tmpdir_path}/out/hll_registers").collect()
    }
    want = {
        r["reg"]: r["max_rho"]
        for r in hll_registers(
            ev, F.concat_ws("|", F.col("user_id"), F.col("event_type")), p=8
        ).collect()
    }
    assert got == want and len(got) > 0


def test_bloom_stream_matches_batch_words(spark, tmpdir_path):
    """Streaming Bloom word-table maintenance: after two incremental
    arrivals the word table equals batch `bloom_build` over the full
    input (bit_or is associative), and every full-corpus member probes
    true against the streamed words (the ingest-gate contract)."""
    from log_analysis_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
        bloom_words_array,
    )
    from log_analysis_spark.streaming.stream_job import start_bloom_stream

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    inp = f"{tmpdir_path}/ev_in"
    m_bits, k = 1 << 14, 4
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(inp)
    args = (spark, inp, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt_bloom")
    q = start_bloom_stream(*args, m_bits=m_bits, k=k)
    q.awaitTermination(300)

    ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(inp)
    q2 = start_bloom_stream(*args, m_bits=m_bits, k=k)
    q2.awaitTermination(300)

    got = {
        r["word_idx"]: r["word"]
        for r in spark.read.parquet(f"{tmpdir_path}/out/bloom_words").collect()
    }
    want_df = bloom_build(ev, F.col("user_id").cast("string"), m_bits, k)
    want = {r["word_idx"]: r["word"] for r in want_df.collect()}
    assert got == want and len(got) > 0

    # no false negatives through the streamed filter
    words = [0] * (m_bits >> 5)
    for i, w in got.items():
        words[i] = w
    missed = (
        ev.select(F.col("user_id").cast("string").alias("v"))
        .distinct()
        .filter(~bloom_maybe_contains(F.col("v"), words, m_bits, k))
        .count()
    )
    assert missed == 0


def test_ingest_gate_stream_content_exactly_once(spark, tmpdir_path):
    """Streaming ingest-dedup gate: two arrivals with in-batch dups and
    cross-arrival dups; every distinct text lands in the corpus exactly
    once and the hash index covers exactly the corpus contents."""
    from log_analysis_spark.streaming.stream_job import start_ingest_gate_stream

    inp = f"{tmpdir_path}/docs_in"
    out = f"{tmpdir_path}/gate_out"
    a1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string",
    )
    a1.write.parquet(inp)
    args = (spark, inp, out, f"{tmpdir_path}/ckpt_gate")
    q = start_ingest_gate_stream(*args)
    q.awaitTermination(300)

    a2 = spark.createDataFrame(
        [(10, "alpha text"), (11, "gamma text"), (12, "gamma text")],
        "doc_id long, text string",
    )
    a2.write.mode("append").parquet(inp)
    q2 = start_ingest_gate_stream(*args)
    q2.awaitTermination(300)

    corpus = spark.read.parquet(f"{out}/corpus")
    texts = sorted(r["text"] for r in corpus.collect())
    assert texts == ["alpha text", "beta text", "gamma text"]
    # min-id survivor within the batch; first-arrival wins across batches
    ids = {r["text"]: r["doc_id"] for r in corpus.collect()}
    assert ids == {"alpha text": 1, "beta text": 2, "gamma text": 11}
    assert spark.read.parquet(f"{out}/hash_index").distinct().count() == 3


def test_state_stream_matches_batch_and_skips_replay(spark, tmpdir_path):
    """Streaming mergeable-state maintenance: after two incremental file
    arrivals the finalized state equals batch agg_state over the full
    input; a replayed micro-batch id is a no-op (count/sum are not
    idempotent — the _meta.json batch-id commit makes the merge
    exactly-once)."""
    from log_analysis_spark.operators.incremental import (
        Metric,
        agg_state,
        finalize_state,
        read_state_meta,
        update_state,
    )
    from log_analysis_spark.streaming.stream_job import start_state_stream

    metrics = [
        Metric("n", "count"),
        Metric("sum_uid", "sum", "user_id"),
        Metric("users", "hll", "user_id"),
    ]
    keys = ["event_type"]
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    inp = f"{tmpdir_path}/ev_in"
    state = f"{tmpdir_path}/state"
    ev.filter(F.col("event_id") % 2 == 0).write.parquet(inp)
    args = (spark, inp, state, f"{tmpdir_path}/ckpt_state", keys, metrics)
    start_state_stream(*args, p=5).awaitTermination(300)
    ev.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(inp)
    start_state_stream(*args, p=5).awaitTermination(300)

    def fin(df):
        return {
            tuple(r)[0]: tuple(r)[1:]
            for r in finalize_state(df, keys, metrics, p=5).collect()
        }

    got = fin(spark.read.parquet(state))
    want = fin(agg_state(ev, keys, metrics, p=5))
    assert got == want and len(got) > 0

    # end-to-end replay: a FRESH checkpoint reprocesses every input file
    # as micro-batch 0; its bid <= the committed id, so the guard must
    # skip it and the state must not double-count
    meta = read_state_meta(state)
    assert meta is not None and meta["last_batch_id"] >= 1
    start_state_stream(
        spark, inp, state, f"{tmpdir_path}/ckpt_state_replay", keys, metrics, p=5
    ).awaitTermination(300)
    assert fin(spark.read.parquet(state)) == want
    assert read_state_meta(state)["last_batch_id"] == meta["last_batch_id"]

    # and a genuinely new meta id does merge (sanity of the guard)
    update_state(spark, state, ev.limit(50), keys, metrics, p=5,
                 meta={"last_batch_id": meta["last_batch_id"] + 1})
    assert fin(spark.read.parquet(state)) != want


def test_inverted_index_stream_matches_batch(spark, tmpdir_path):
    """Streamed postings (two arrival batches) == batch-built index:
    same (term, doc, tf) rows, same BM25 answers, same _stats."""
    import os

    from log_analysis_spark.operators.inverted import (
        bm25_search,
        write_inverted_index,
    )
    from log_analysis_spark.streaming.stream_job import (
        start_inverted_index_stream,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    arrivals = f"{tmpdir_path}/arrivals"
    docs.filter("doc_id % 2 = 0").write.parquet(arrivals)

    idx_s = f"{tmpdir_path}/idx_stream"
    q = start_inverted_index_stream(
        spark, arrivals, idx_s, f"{tmpdir_path}/ckpt",
        hash_fn="md5", with_doclen=True,
    )
    q.awaitTermination()
    # second arrival batch
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(arrivals)
    q = start_inverted_index_stream(
        spark, arrivals, idx_s, f"{tmpdir_path}/ckpt",
        hash_fn="md5", with_doclen=True,
    )
    q.awaitTermination()

    idx_b = f"{tmpdir_path}/idx_batch"
    write_inverted_index(docs, idx_b, hash_fn="md5", with_doclen=True)

    cols = ["term", "doc_id", "tf", "dl"]
    got = {tuple(r) for r in spark.read.parquet(idx_s).select(*cols).collect()}
    want = {tuple(r) for r in spark.read.parquet(idx_b).select(*cols).collect()}
    assert got == want

    ss = spark.read.parquet(os.path.join(idx_s, "_stats")).first()
    sb = spark.read.parquet(os.path.join(idx_b, "_stats")).first()
    assert (ss["n_docs"], ss["sum_dl"]) == (sb["n_docs"], sb["sum_dl"])

    gs = [
        (r["doc_id"], r["score"])
        for r in bm25_search(spark, idx_s, ["table", "row"], hash_fn="md5").collect()
    ]
    gb = [
        (r["doc_id"], r["score"])
        for r in bm25_search(spark, idx_b, ["table", "row"], hash_fn="md5").collect()
    ]
    assert gs == gb


def test_classifier_stream_matches_batch_scores(spark, tmpdir_path):
    """Streaming classifier inference: scores streamed over two arrivals
    equal batch linear_scores over the full input (stateless projection,
    exactly-once via the file-sink log)."""
    from log_analysis_spark.operators.classify import (
        linear_scores,
        train_linear_classifier,
    )
    from log_analysis_spark.streaming.stream_job import start_classifier_stream

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id",
        "text",
        F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(F.lit(-1.0)).alias("y"),
    )
    w = train_linear_classifier(
        docs, "y", n_buckets=64, iters=2, lr=0.02, unpersist_handles=[]
    )
    inp = f"{tmpdir_path}/docs_in"
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text").write.parquet(inp)
    args = (spark, inp, f"{tmpdir_path}/scores", f"{tmpdir_path}/ckpt_cls", w)
    start_classifier_stream(*args).awaitTermination(300)
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").write.mode(
        "append"
    ).parquet(inp)
    start_classifier_stream(*args).awaitTermination(300)

    got = {
        r["doc_id"]: r["score"]
        for r in spark.read.parquet(f"{tmpdir_path}/scores").collect()
    }
    want = {
        r["doc_id"]: r["score"]
        for r in linear_scores(docs.select("doc_id", "text"), w).collect()
    }
    assert got == want and len(got) == 500


def test_text_gate_stream_near_dup_gating(spark, tmpdir_path):
    """Streaming NEAR-dup text ingest gate with per-batch index
    maintenance: arrival 1 carries an in-batch exact dup (min-id
    survivor); arrival 2 carries a cross-arrival exact dup (gated by
    hashes/), a cross-arrival NEAR dup — one word changed, jaccard ~0.8
    — that the exact-only stream would pass but this gate drops
    (bands/ + sets/ verify), and a novel doc (survives and is itself
    appended to the index)."""
    from log_analysis_spark.streaming.stream_job import start_text_gate_stream

    t_a = "the quick brown fox jumps over the lazy dog near the river"
    t_a_near = "the quick brown fox jumps over the lazy dog near the canal"
    t_b = "pack my box with five dozen liquor jugs before the long trip"
    t_c = "a stitch in time saves nine but haste makes waste they say"
    inp = f"{tmpdir_path}/tg_in"
    out = f"{tmpdir_path}/tg_out"
    spark.createDataFrame(
        [(1, t_a), (2, t_b), (3, t_a)], "doc_id long, text string"
    ).write.parquet(inp)
    args = (spark, inp, out, f"{tmpdir_path}/tg_ckpt")
    kw = dict(num_perm=16, bands=8, n=3, threshold=0.5, n_buckets=4)
    q = start_text_gate_stream(*args, **kw)
    q.awaitTermination(300)

    spark.createDataFrame(
        [(10, t_a), (11, t_a_near), (12, t_c)], "doc_id long, text string"
    ).write.mode("append").parquet(inp)
    q2 = start_text_gate_stream(*args, **kw)
    q2.awaitTermination(300)

    corpus = {r["doc_id"]: r["text"] for r in spark.read.parquet(f"{out}/corpus").collect()}
    assert corpus == {1: t_a, 2: t_b, 12: t_c}
    # index covers exactly the corpus: 3 distinct hashes, 3 shingle sets
    assert spark.read.parquet(f"{out}/text_index/hashes").distinct().count() == 3
    assert spark.read.parquet(f"{out}/text_index/sets").select("_id").distinct().count() == 3


def test_media_gate_stream_near_dup_gating(spark, tmpdir_path):
    """Streaming perceptual ingest gate: arrival 1 carries a base image
    and its exact byte-copy (in-batch exact-fingerprint dedup -> min-id
    survivor); arrival 2 carries a one-pixel re-encode of the base
    (hamming <= 7 -> gated by the fp index) and an unrelated image
    (survives). Final media/fp_index hold exactly {base, unrelated}."""
    import numpy as np

    from log_analysis_spark.streaming.stream_job import start_media_gate_stream
    from tests.test_multimodal import make_bmp

    rng = np.random.default_rng(61)
    base = rng.integers(10, 240, size=(24, 36, 3), dtype=np.uint8)
    edited = base.copy()
    edited[0, 0] = 255  # one sampled pixel: a few hamming bits
    other = rng.integers(0, 256, size=(24, 36, 3), dtype=np.uint8)

    inp = f"{tmpdir_path}/media_in"
    out = f"{tmpdir_path}/media_out"
    a1 = spark.createDataFrame(
        [("u1", bytearray(make_bmp(base))), ("u2", bytearray(make_bmp(base)))],
        "url string, payload binary",
    )
    a1.write.parquet(inp)
    args = (spark, inp, out, f"{tmpdir_path}/ckpt_media")
    q = start_media_gate_stream(*args)
    q.awaitTermination(300)

    a2 = spark.createDataFrame(
        [("u3", bytearray(make_bmp(edited))), ("u4", bytearray(make_bmp(other)))],
        "url string, payload binary",
    )
    a2.write.mode("append").parquet(inp)
    q2 = start_media_gate_stream(*args)
    q2.awaitTermination(300)

    media = sorted(r["url"] for r in spark.read.parquet(f"{out}/media").collect())
    assert media == ["u1", "u4"]
    idx = spark.read.parquet(f"{out}/fp_index")
    assert sorted(r["url"] for r in idx.collect()) == ["u1", "u4"]


def test_lm_score_stream_matches_batch_scores(spark, tmpdir_path):
    """Streaming reference-LM scoring: scores streamed over two arrivals
    equal batch stupid_backoff_scores over the full input, bit-for-bit
    (the foreachBatch sink runs the batch operator verbatim; per-doc
    scores are row-pure, so arrival partitioning cannot change them)."""
    from log_analysis_spark.operators.lm import (
        stupid_backoff_model,
        stupid_backoff_scores,
    )
    from log_analysis_spark.streaming.stream_job import start_lm_score_stream

    all_docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ref_path = f"{tmpdir_path}/lm_ref"
    all_docs.filter(F.col("lang") == "en").select("text").write.parquet(ref_path)

    docs = all_docs.select("doc_id", "text").limit(60).persist()
    inp = f"{tmpdir_path}/lm_docs_in"
    out = f"{tmpdir_path}/lm_scores_out"
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(inp)
    args = (spark, inp, ref_path, out, f"{tmpdir_path}/ckpt_lm")
    q = start_lm_score_stream(*args)
    q.awaitTermination(300)
    for h in q._lm_handles:
        h.unpersist()

    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(inp)
    q2 = start_lm_score_stream(*args)
    q2.awaitTermination(300)
    for h in q2._lm_handles:
        h.unpersist()

    streamed = {
        r["doc_id"]: (r["n_tokens"], r["sb_score"])
        for r in spark.read.parquet(out).collect()
    }
    model = stupid_backoff_model(spark.read.parquet(ref_path), min_count=2)
    want = {
        r["doc_id"]: (r["n_tokens"], r["sb_score"])
        for r in stupid_backoff_scores(docs, model).collect()
    }
    docs.unpersist()
    assert streamed == want


def test_cdx_stream_appends_and_repairs_sidecar(spark, tmpdir_path):
    """Streamed captures (two arrival batches) extend the batch-built
    CDX index: every lookup equals brute force over the union; the
    sidecar's min/max absorb keys below/above the original ranges; the
    replayed trigger with the SAME checkpoint is a no-op."""
    import pandas as pd

    from log_analysis_spark.sources.cdx import (
        cdx_lookup_prefix,
        cdx_records,
        write_cdx_index,
    )
    from log_analysis_spark.streaming.stream_job import start_cdx_stream

    def caps(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["url", "ts", "text"])
        )

    base = caps(
        [
            (f"http://www.{d}/p/{i}", "20240701000000", f"b {d} {i}")
            for d in ["mid.com", "late.org"]
            for i in range(10)
        ]
    )
    idx = f"{tmpdir_path}/cdx_idx"
    write_cdx_index(cdx_records(base), idx, n_buckets=4)

    arrivals = f"{tmpdir_path}/cdx_arrivals"
    # batch 1: new captures inside existing ranges + BELOW every range
    # (aaa.biz sorts before com,*) + ABOVE (zzz.xyz sorts after org,*)
    b1 = caps(
        [
            ("http://www.mid.com/p/3", "20240801000000", "b mid.com 3 v2"),
            ("http://aaa.biz/low", "20240801000000", "low"),
            ("http://zzz.xyz/high", "20240801000000", "high"),
        ]
    )
    b1.write.parquet(arrivals)
    start_cdx_stream(
        spark, arrivals, idx, f"{tmpdir_path}/cdx_ckpt"
    ).awaitTermination()
    # batch 2: another domain entirely
    caps(
        [("http://www.late.org/p/99", "20240901000000", "late 99")]
    ).write.mode("append").parquet(arrivals)
    start_cdx_stream(
        spark, arrivals, idx, f"{tmpdir_path}/cdx_ckpt"
    ).awaitTermination()

    union = base.unionByName(b1).unionByName(
        caps([("http://www.late.org/p/99", "20240901000000", "late 99")])
    )
    for prefix in ["com,mid", "org,late)/p/9", "biz,aaa", "xyz,zzz", "com,"]:
        got = sorted(
            map(tuple, cdx_lookup_prefix(spark, idx, prefix).collect())
        )
        want = sorted(
            map(
                tuple,
                cdx_records(union)
                .filter(F.col("surt").startswith(prefix))
                .collect(),
            )
        )
        assert got == want and got, prefix

    side = spark.read.parquet(f"{idx}/_cluster").collect()
    assert sum(r["n"] for r in side) == 24
    assert min(r["min_key"] for r in side).startswith("biz,aaa")
    assert max(r["max_key"] for r in side).startswith("xyz,zzz")

    # replay with the same checkpoint: nothing new -> counts unchanged
    start_cdx_stream(
        spark, arrivals, idx, f"{tmpdir_path}/cdx_ckpt"
    ).awaitTermination()
    side2 = spark.read.parquet(f"{idx}/_cluster").collect()
    assert sum(r["n"] for r in side2) == 24


def test_drift_stream_matches_batch_drift(spark, tmpdir_path):
    """Streaming drift monitor: after two incremental arrivals the
    drift relation equals batch histogram_compare(reference, all-arrived)
    bit for bit (count is associative — arrival order irrelevant), and
    the per-batch rewrite is atomic (complete mode over <= n_bins rows)."""
    from log_analysis_spark.operators.profile import (
        drift_score,
        histogram_compare,
    )
    from log_analysis_spark.streaming.stream_job import start_drift_stream

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ref_path = f"{tmpdir_path}/ref"
    ev.filter(F.col("event_id") % 3 == 0).select("value").write.parquet(ref_path)
    inp = f"{tmpdir_path}/ev_in"
    ev.filter(F.col("event_id") % 3 == 1).select("value").write.parquet(inp)

    args = (spark, inp, ref_path, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt_drift")
    q = start_drift_stream(*args, value_col="value", lo=0.0, hi=500.0, n_bins=16)
    q.awaitTermination(300)

    # second arrival shifts the stream-side distribution
    ev.filter(F.col("event_id") % 3 == 2).select("value").write.mode(
        "append"
    ).parquet(inp)
    q2 = start_drift_stream(*args, value_col="value", lo=0.0, hi=500.0, n_bins=16)
    q2.awaitTermination(300)

    got = {
        r["bin"]: (r["n_a"], r["n_b"], r["term"], r["drift"])
        for r in spark.read.parquet(f"{tmpdir_path}/out/drift").collect()
    }
    ref = spark.read.parquet(ref_path)
    arrived = spark.read.parquet(inp)
    bins = histogram_compare(ref, arrived, "value", 0.0, 500.0, n_bins=16)
    want_drift = drift_score(bins).collect()[0]["drift"]
    want = {
        r["bin"]: (r["n_a"], r["n_b"], r["term"], want_drift)
        for r in bins.collect()
    }
    assert got == want and len(got) > 0 and want_drift > 0.0


def test_paragraph_dedup_stream_equals_batch(spark, tmpdir_path):
    """Streaming CCNet paragraph dedup over two ascending-id arrivals
    equals batch paragraph_dedup over the union: arrival 1 plants an
    in-batch cross-doc banner (first doc keeps it), arrival 2 re-sends
    the same banner (gated by the para_index) plus a boilerplate-only
    doc (drops entirely) and novel text (kept and indexed)."""
    from log_analysis_spark.operators.dedup import paragraph_dedup
    from log_analysis_spark.streaming.stream_job import (
        start_paragraph_dedup_stream,
    )

    a1 = [
        (1, "alpha body one\nSubscribe to our newsletter"),
        (2, "beta body two\nSubscribe to our newsletter"),
    ]
    a2 = [
        (3, "gamma body three\nSubscribe to our newsletter"),
        (4, "Subscribe to our newsletter"),
        (5, "delta body five\nwholly novel line"),
    ]
    inp = f"{tmpdir_path}/pd_in"
    out = f"{tmpdir_path}/pd_out"
    spark.createDataFrame(a1, "doc_id long, text string").write.parquet(inp)
    args = (spark, inp, out, f"{tmpdir_path}/pd_ckpt")
    start_paragraph_dedup_stream(*args).awaitTermination(300)
    spark.createDataFrame(a2, "doc_id long, text string").write.mode(
        "append"
    ).parquet(inp)
    start_paragraph_dedup_stream(*args).awaitTermination(300)

    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/corpus").collect()
    }
    full = spark.createDataFrame(a1 + a2, "doc_id long, text string")
    want = {
        r["doc_id"]: r["clean_text"]
        for r in paragraph_dedup(full).filter(F.length("clean_text") > 0).collect()
    }
    assert got == want
    assert 4 not in got  # boilerplate-only doc vanished
    assert got[1].endswith("Subscribe to our newsletter")  # first keeps it
    # index holds one hash per distinct kept paragraph
    n_idx = spark.read.parquet(f"{out}/para_index").distinct().count()
    n_kept_paras = sum(t.count("\n") + 1 for t in got.values())
    assert n_idx == n_kept_paras
