"""Curation job: stage graph, manifest resume, empty-corpus halt."""

from __future__ import annotations


from pyspark.sql import functions as F

from log_analysis_spark.plans.curation_job import run_curation

SF_DOCS = "/root/testdata/sf0.01/documents.parquet"


def test_full_run_then_resume_skips_everything(spark, tmpdir_path):
    out = f"{tmpdir_path}/cur"
    r1 = run_curation(spark, SF_DOCS, out, span_k=6, test_frac=0.1, valid_frac=0.1)
    assert r1["stages_run"] == ["scrub", "dedup", "quality", "decontam", "split"]
    assert r1["halted_empty_at"] is None
    # stage funnel is monotone non-increasing
    rows = [r1["stages"][s]["rows_out"] for s in r1["stages_run"]]
    assert rows == sorted(rows, reverse=True) or rows[0] <= 500
    assert all(
        r1["stages"][s]["rows_in"] >= r1["stages"][s]["rows_out"]
        for s in r1["stages_run"]
    )
    got = spark.read.parquet(f"{out}/corpus")
    assert got.count() == r1["stages"]["split"]["rows_out"] > 0
    assert set(r["_split"] for r in got.select("_split").distinct().collect()) == {
        "train", "valid", "test"
    }

    r2 = run_curation(spark, SF_DOCS, out, span_k=6, test_frac=0.1, valid_frac=0.1)
    assert r2["stages_run"] == [] and len(r2["stages_skipped"]) == 5


def test_param_change_invalidates_stages(spark, tmpdir_path):
    out = f"{tmpdir_path}/cur"
    run_curation(spark, SF_DOCS, out, span_k=6)
    # a changed split fraction must re-run every stage whose fingerprint
    # includes params (all of them) rather than silently skip
    r = run_curation(spark, SF_DOCS, out, span_k=6, test_frac=0.2)
    assert "split" in r["stages_run"]


def test_empty_corpus_halts_instead_of_crashing(spark, tmpdir_path):
    # benchmark == corpus and n=3: decontamination drops every doc
    out = f"{tmpdir_path}/cur_empty"
    r = run_curation(
        spark, SF_DOCS, out, benchmark_path=SF_DOCS, span_k=6, decontam_n=3
    )
    assert r["halted_empty_at"] in {"decontam", "split"}
    assert r["stages"]["decontam"]["rows_out"] == 0


def test_c4_stage_prepends_and_cleans(spark, tmpdir_path):
    """--c4-clean prepends the boilerplate stage: driver docs have no
    terminal punctuation, so a doctored corpus (half the docs get a
    punctuated line appended) loses exactly the unpunctuated half at the
    c4 stage, and the kept docs carry the cleaned text downstream."""
    from pyspark.sql import functions as F

    src = f"{tmpdir_path}/docs_in"
    docs = spark.read.parquet(SF_DOCS)
    doctored = docs.withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(2)) == 0,
            F.concat(F.col("text"), F.lit("\nA clean closing sentence.")),
        ).otherwise(F.col("text")),
    )
    doctored.write.parquet(src)
    out = f"{tmpdir_path}/cur_c4"
    r = run_curation(spark, src, out, span_k=6, c4=True)
    assert r["stages_run"][0] == "c4"
    c4 = r["stages"]["c4"]
    assert c4["rows_in"] == 500 and c4["rows_out"] == 250
    cleaned = spark.read.parquet(f"{out}/stage_c4")
    assert cleaned.filter(~F.col("text").endswith("A clean closing sentence.")).count() == 0

    # flipping the flag off invalidates the graph (param fingerprint)
    r2 = run_curation(spark, src, out, span_k=6, c4=False)
    assert "scrub" in r2["stages_run"]


def test_html_ingest_extract_stage(spark, tmpdir_path):
    """--html: raw crawl pages run through the extract stage (html
    boilerplate strip, xxhash64(url) ids) then the normal graph; resume
    skips all stages including extract on identical rerun."""
    from log_analysis_spark.plans.curation_job import run_curation
    from log_analysis_spark.synth import write_pages

    pages_dir = f"{tmpdir_path}/pages"
    out_dir = f"{tmpdir_path}/out_html"
    write_pages(spark, 400, pages_dir)

    m1 = run_curation(
        spark, pages_dir, out_dir, span_k=6, html=True, neardup=False
    )
    assert m1["stages_run"][0] == "extract"
    assert m1["halted_empty_at"] is None
    ext = spark.read.parquet(f"{out_dir}/stage_extract")
    assert set(ext.columns) == {"doc_id", "url", "lang", "text"}
    assert ext.count() == 400
    assert ext.select("doc_id").distinct().count() == 400  # stable unique ids
    # boilerplate stripped: no tags/comments survive in extracted text
    assert ext.filter(F.col("text").contains("<")).count() == 0
    assert ext.filter(F.col("text").contains("BEGIN_TEXT")).count() == 0
    corpus = spark.read.parquet(f"{out_dir}/corpus")
    assert corpus.count() > 0

    m2 = run_curation(
        spark, pages_dir, out_dir, span_k=6, html=True, neardup=False
    )
    assert m2["stages_run"] == [] and "extract" in m2["stages_skipped"]


def test_mixture_stage_budgets_selection(spark, tmpdir_path):
    """--mixture: the pre-split mixture stage keeps only the planner's
    per-lang token-budget selection; unweighted langs drop entirely;
    changed weights invalidate the stage on rerun."""
    from log_analysis_spark.operators.mixing import plan_mixture

    out = f"{tmpdir_path}/cur_mix"
    mix = {"en": 3.0, "de": 1.0}
    r1 = run_curation(
        spark, SF_DOCS, out, span_k=6, mixture=mix, mixture_tokens=5000
    )
    assert "mixture" in r1["stages_run"]
    got = spark.read.parquet(f"{out}/stage_mixture")
    langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}
    # the kept set is exactly the planner's selection over the decontam output
    upstream = spark.read.parquet(f"{out}/stage_decontam")
    expected = (
        plan_mixture(upstream, mix, 5000)
        .filter(F.col("selected"))
        .select("doc_id")
    )
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    exp_ids = {r["doc_id"] for r in expected.collect()}
    assert got_ids == exp_ids and got_ids

    r2 = run_curation(
        spark, SF_DOCS, out, span_k=6, mixture=mix, mixture_tokens=5000
    )
    assert r2["stages_run"] == []
    r3 = run_curation(
        spark, SF_DOCS, out, span_k=6, mixture={"en": 1.0, "de": 1.0},
        mixture_tokens=5000,
    )
    assert "mixture" in r3["stages_run"]


def test_binned_quality_gate_close_to_exact_and_stricter(spark, tmpdir_path):
    """--binned-quality: the sketch-median gate keeps a SUBSET-or-equal
    of the exact gate's survivors within one bin width (one-sided
    estimator: est >= true median), and the flag invalidates resume."""
    out_a = f"{tmpdir_path}/cur_exact"
    out_b = f"{tmpdir_path}/cur_binned"
    ra = run_curation(spark, SF_DOCS, out_a, span_k=6)
    rb = run_curation(spark, SF_DOCS, out_b, span_k=6, binned_quality=True)
    exact_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out_a}/stage_quality").select("doc_id").collect()
    }
    binned_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out_b}/stage_quality").select("doc_id").collect()
    }
    assert binned_ids <= exact_ids and binned_ids
    # the estimator's one-sided bound: anything the sketch gate dropped
    # beyond the exact gate scores within ONE BIN WIDTH of its lang's
    # exact median (scores cluster, so the count can be large — the
    # BOUND is what's guaranteed, not a retention fraction)
    from log_analysis_spark.functions.textstats import quality_score

    dedup_out = spark.read.parquet(f"{out_a}/stage_dedup")
    scored = dedup_out.withColumn("_q", quality_score(F.col("text")))
    med = {
        r["lang"]: r["m"]
        for r in scored.groupBy("lang").agg(F.expr("percentile(_q, 0.5)").alias("m")).collect()
    }
    width = 1.0 / 128
    dropped = scored.filter(
        F.col("doc_id").isin([int(i) for i in (exact_ids - binned_ids)])
    ).collect()
    assert all(med[r["lang"]] <= r["_q"] < med[r["lang"]] + width for r in dropped)
    # flag change re-runs the quality stage and everything after it
    rb2 = run_curation(spark, SF_DOCS, out_b, span_k=6)
    assert "quality" in rb2["stages_run"]


def test_scrub_mode_windows(spark, tmpdir_path):
    """--scrub-mode windows: the any-alignment scrub runs as the scrub
    stage; mode change invalidates resume."""
    out = f"{tmpdir_path}/cur_win"
    r1 = run_curation(spark, SF_DOCS, out, span_k=6, scrub_mode="windows")
    assert "scrub" in r1["stages_run"] and r1["halted_empty_at"] is None
    assert spark.read.parquet(f"{out}/stage_scrub").count() > 0
    r2 = run_curation(spark, SF_DOCS, out, span_k=6, scrub_mode="windows")
    assert r2["stages_run"] == []
    r3 = run_curation(spark, SF_DOCS, out, span_k=6, scrub_mode="blocks")
    assert "scrub" in r3["stages_run"]


def test_html_extract_decodes_binary_through_charset_sniff(spark):
    """A BINARY html column (the pages-table shape) decodes through the
    charset sniff before the boilerplate strip: a Latin-1 page with an
    in-document declaration lands as 'café', not mojibake."""
    from log_analysis_spark.plans.curation_job import _extract

    latin1 = '<meta charset="latin-1"><body><p>a café row</p></body>'.encode("latin-1")
    df = spark.createDataFrame(
        [("http://l1.example/a", bytearray(latin1))], "url string, html binary"
    )
    row = _extract(df).collect()[0]
    assert "café" in row.text and "Ã" not in row.text


def test_media_dedup_stage_drops_perceptual_neardups(spark, tmpdir_path):
    """--media adds a media_dedup stage after dedup: docs whose BMP
    payload is a perceptual near-dup of a lower-id surviving doc drop
    (min-id keep via connected components over the pigeonhole hamming
    join); unrelated images and docs WITHOUT a media row pass through.
    Edited media bytes invalidate the stage's manifest fingerprint."""
    import numpy as np

    from tests.test_multimodal import make_bmp

    rng = np.random.default_rng(41)
    base = rng.integers(10, 240, size=(24, 36, 3), dtype=np.uint8)
    bright = np.clip(base.astype(np.int32) + 3, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(24, 36, 3), dtype=np.uint8)

    # texts long + unique enough to survive scrub (k=6) and exact dedup
    words = lambda i: " ".join(f"w{i}x{j} word{j}" for j in range(12))
    docs = spark.createDataFrame(
        [(i, f"http://ex/{i}", "en", words(i)) for i in range(1, 5)],
        "doc_id long, url string, lang string, text string",
    )
    media = spark.createDataFrame(
        [
            (1, bytearray(make_bmp(base))),
            (2, bytearray(make_bmp(bright))),  # near-dup of doc 1 -> drop
            (3, bytearray(make_bmp(other))),   # unrelated -> keep
            # doc 4 has no media row -> keep
        ],
        "doc_id long, payload binary",
    )
    docs_path = f"{tmpdir_path}/docs"
    media_path = f"{tmpdir_path}/media"
    docs.write.parquet(docs_path)
    media.write.parquet(media_path)

    out = f"{tmpdir_path}/cur_media"
    r = run_curation(
        spark, docs_path, out, span_k=6, test_frac=0.1, valid_frac=0.1,
        media_path=media_path,
    )
    assert "media_dedup" in r["stages_run"]
    kept = sorted(
        x["doc_id"]
        for x in spark.read.parquet(f"{out}/stage_media_dedup").collect()
    )
    assert kept == [1, 3, 4]

    # resume: identical inputs skip every stage
    r2 = run_curation(
        spark, docs_path, out, span_k=6, test_frac=0.1, valid_frac=0.1,
        media_path=media_path,
    )
    assert "media_dedup" in r2["stages_skipped"]

    # changed media bytes re-run the stage (fingerprint rides the params)
    media2 = spark.createDataFrame(
        [(1, bytearray(make_bmp(base))), (3, bytearray(make_bmp(other)))],
        "doc_id long, payload binary",
    )
    media_path2 = f"{tmpdir_path}/media2"
    media2.write.parquet(media_path2)
    r3 = run_curation(
        spark, docs_path, out, span_k=6, test_frac=0.1, valid_frac=0.1,
        media_path=media_path2,
    )
    assert "media_dedup" in r3["stages_run"]
    kept3 = sorted(
        x["doc_id"]
        for x in spark.read.parquet(f"{out}/stage_media_dedup").collect()
    )
    assert kept3 == [1, 2, 3, 4]  # doc 2's near-dup media row is gone


def test_domain_filter_stage_drops_junk_domains(spark, tmpdir_path):
    out = f"{tmpdir_path}/cur_dom"
    # spamfarm: 4 docs, all under 40 chars -> pass_rate 0 < 0.5, dropped.
    # lowev: 2 short docs but below min_docs=3 evidence -> kept.
    # good: 4 docs, 3 long -> pass_rate 0.75 >= 0.5, kept.
    long = "word " * 20  # 100 chars
    rows = (
        [(i, "short junk", "en", "spamfarm", 10) for i in range(4)]
        + [(10 + i, "tiny", "en", "lowev", 4) for i in range(2)]
        + [(20, "brief", "en", "good", 5)]
        + [(21 + i, long + str(i), "en", "good", 101) for i in range(3)]
    )
    src = f"{tmpdir_path}/docs_dom"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(src)
    r = run_curation(
        spark, src, out, span_k=6, test_frac=0.0, valid_frac=0.0,
        domain_min_pass=0.5, domain_min_chars=40, domain_min_docs=3,
    )
    assert r["stages_run"][0] == "domain_filter"
    st = r["stages"]["domain_filter"]
    assert (st["rows_in"], st["rows_out"]) == (10, 6)  # spamfarm gone
    kept = spark.read.parquet(f"{out}/stage_domain_filter")
    assert set(x.source for x in kept.select("source").distinct().collect()) == {
        "lowev", "good"
    }
    # resume: identical params skip the stage; changed threshold re-runs it
    r2 = run_curation(
        spark, src, out, span_k=6, test_frac=0.0, valid_frac=0.0,
        domain_min_pass=0.5, domain_min_chars=40, domain_min_docs=3,
    )
    assert "domain_filter" in r2["stages_skipped"]
    r3 = run_curation(
        spark, src, out, span_k=6, test_frac=0.0, valid_frac=0.0,
        domain_min_pass=0.9, domain_min_chars=40, domain_min_docs=3,
    )
    assert "domain_filter" in r3["stages_run"]


def test_justext_stage_cleans_and_drops_no_content_pages(spark, tmpdir_path):
    out = f"{tmpdir_path}/cur_jt"
    prose = "it was the best of times and the worst of it all"
    doc_mixed = prose + "\nGo on\nHome About Contact Products Pricing"
    doc_nav = "Home About Contact Products Pricing\nBuy now"
    rows = [
        (1, doc_mixed, "en", "s0", len(doc_mixed)),
        (2, doc_nav, "en", "s0", len(doc_nav)),
    ]
    src = f"{tmpdir_path}/docs_jt"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(src)
    r = run_curation(
        spark, src, out, span_k=6, test_frac=0.0, valid_frac=0.0, justext=True
    )
    assert r["stages_run"][0] == "justext"
    st = r["stages"]["justext"]
    assert (st["rows_in"], st["rows_out"]) == (2, 1)  # nav-only page gone
    kept = spark.read.parquet(f"{out}/stage_justext").collect()
    assert len(kept) == 1 and kept[0].doc_id == 1
    # GOOD prose + rescued short line survive; nav line stripped
    assert kept[0].text == prose + "\nGo on"


def test_lm_filter_stage_drops_oov_gibberish(spark, tmpdir_path):
    """--lm-ref + --lm-min-score adds the CCNet-style lm_filter stage
    after quality: a Stupid Backoff model trained on the reference
    corpus scores every doc; pure-OOV gibberish scores exactly 0.0 and
    drops, in-domain prose passes. Re-run skips via the manifest; a
    changed threshold re-runs the stage."""
    ref = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog",),
            ("the quick brown fox runs over the green hill",),
            ("a quick brown fox is a happy fox indeed",),
        ],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            # one lang each: the per-lang median quality gate is then a
            # self-median pass-through, isolating the lm_filter verdicts
            (1, "http://ex/1", "en",
             "the quick brown fox jumps over the lazy dog today"),
            (2, "http://ex/2", "de",
             "a quick brown fox runs over the green hill again"),
            (3, "http://ex/3", "xx", "zzqj vvkx pplm qqrs ttuv wwxy"),
        ],
        "doc_id long, url string, lang string, text string",
    )
    ref_path = f"{tmpdir_path}/lm_ref"
    docs_path = f"{tmpdir_path}/docs_lm"
    ref.write.parquet(ref_path)
    docs.write.parquet(docs_path)

    out = f"{tmpdir_path}/cur_lm"
    kw = dict(span_k=6, test_frac=0.1, valid_frac=0.1,
              lm_ref_path=ref_path, lm_min_score=1e-12)
    r = run_curation(spark, docs_path, out, **kw)
    assert "lm_filter" in r["stages_run"]
    kept = sorted(
        x["doc_id"]
        for x in spark.read.parquet(f"{out}/stage_lm_filter").collect()
    )
    assert kept == [1, 2]

    r2 = run_curation(spark, docs_path, out, **kw)
    assert "lm_filter" in r2["stages_skipped"]

    # a stricter threshold rides the fingerprint: everything re-runs and
    # an impossible bar empties the corpus at the lm_filter stage
    kw3 = dict(kw, lm_min_score=2.0)
    r3 = run_curation(spark, docs_path, f"{tmpdir_path}/cur_lm3", **kw3)
    assert r3["halted_empty_at"] == "lm_filter"


def test_paragraph_dedup_stage(spark, tmpdir_path):
    """--paragraph-dedup runs CCNet's cross-corpus paragraph scrub
    before scrub: a doctored corpus where every doc carries the same
    banner line keeps the banner in exactly ONE doc; an all-boilerplate
    doc leaves the corpus entirely."""
    from pyspark.sql import functions as F

    src = f"{tmpdir_path}/docs_pd"
    docs = spark.read.parquet(SF_DOCS).limit(40)
    doctored = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit("\nSubscribe to our newsletter"))
    )
    # one extra doc that is ONLY the banner -> must vanish
    only_banner = doctored.limit(1).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        *[c for c in doctored.columns if c not in ("doc_id", "text")],
        F.lit("Subscribe to our newsletter").alias("text"),
    ).select(*doctored.columns)
    doctored.unionByName(only_banner).write.parquet(src)

    out = f"{tmpdir_path}/cur_pd"
    r = run_curation(spark, src, out, span_k=6, paragraph_dedup=True)
    assert r["stages_run"][0] == "paragraph_dedup"
    pd_stats = r["stages"]["paragraph_dedup"]
    assert pd_stats["rows_in"] == 41 and pd_stats["rows_out"] == 40
    staged = spark.read.parquet(f"{out}/stage_paragraph_dedup")
    n_with_banner = staged.filter(
        F.col("text").contains("Subscribe to our newsletter")
    ).count()
    assert n_with_banner == 1  # first occurrence only
    assert staged.filter(F.col("doc_id") >= 1000000).count() == 0

    # param rides the fingerprint: changing max_docs invalidates
    r2 = run_curation(
        spark, src, out, span_k=6, paragraph_dedup=True, paragraph_max_docs=50
    )
    assert "paragraph_dedup" in r2["stages_run"]
    staged2 = spark.read.parquet(f"{out}/stage_paragraph_dedup")
    assert (
        staged2.filter(F.col("text").contains("Subscribe to our newsletter")).count()
        == 41
    )


def test_wet_ingest_materializes_documents(spark, tmpdir_path):
    """--wet-ingest: raw .wet.gz (gzip-member conversion records) become
    the documents table before curation; the unchanged WET dir skips on
    resume."""
    import os

    from log_analysis_spark.plans.curation_job import ingest_wet
    from log_analysis_spark.sources.warc import build_wet_record, write_warc_fixture

    wet_dir = f"{tmpdir_path}/wet"
    os.makedirs(wet_dir)
    recs = [
        build_wet_record(
            f"http://w{i}.example.com/p",
            "2024-07-02T12:00:00Z",
            f"alpha beta gamma delta {i} " * 8,
        )
        for i in range(12)
    ]
    write_warc_fixture(f"{wet_dir}/f1.warc.wet.gz", recs[:6])
    write_warc_fixture(f"{wet_dir}/f2.warc.wet.gz", recs[6:])

    src = f"{tmpdir_path}/wet_docs"
    out = f"{tmpdir_path}/cur_wet"
    r = ingest_wet(spark, wet_dir, src, out)
    assert r == {"wet_ingested": True, "docs": 12}
    docs = spark.read.parquet(src)
    assert docs.count() == 12
    assert set(docs.columns) == {"doc_id", "url", "lang", "text"}
    assert docs.filter(docs.text.contains("alpha beta gamma")).count() == 12

    # curation runs straight off the materialized table
    stats = run_curation(spark, src, out, span_k=6)
    assert stats["stages"]["split"]["rows_out"] > 0
    # unchanged WET dir -> ingest skips
    r2 = ingest_wet(spark, wet_dir, src, out)
    assert r2 == {"wet_ingested": False, "skipped": True}


def test_attr_scrub_stage_and_jsonl_export(spark, tmpdir_path):
    """--attr-spans applies a Dolma span sidecar as the leading stage
    (tagged docs lose exactly the spanned characters, untagged docs pass
    through), --export-jsonl publishes the curated corpus as gzipped
    JSONL split dirs, and both resume + invalidate via the manifest."""
    import glob
    import os

    from log_analysis_spark.sources.jsonl import write_attributes

    src = f"{tmpdir_path}/docs_in"
    docs = spark.read.parquet(SF_DOCS)
    docs.write.parquet(src)

    # sidecar: docs with even id lose their first 4 characters
    attrs_dir = f"{tmpdir_path}/attrs"
    tagged = docs.filter(F.pmod("doc_id", F.lit(2)) == 0).select(
        F.col("doc_id").alias("id"),
        F.array(
            F.struct(
                F.lit(0).cast("long").alias("start"),
                F.lit(4).cast("long").alias("end"),
                F.lit(1.0).alias("score"),
            )
        ).alias("pii_spans"),
    )
    write_attributes(tagged, attrs_dir)

    out = f"{tmpdir_path}/cur_attr"
    r = run_curation(
        spark, src, out, span_k=6, attr_spans_path=attrs_dir,
        export_jsonl=True,
    )
    assert r["stages_run"][0] == "attr_scrub"
    assert r["stages_run"][-1] == "export_jsonl"
    scrubbed = {
        row["doc_id"]: row["text"]
        for row in spark.read.parquet(f"{out}/stage_attr_scrub").collect()
    }
    orig = {row["doc_id"]: row["text"] for row in docs.collect()}
    for did, text in orig.items():
        if did % 2 == 0:
            assert scrubbed[did] == text[4:]
        else:
            assert scrubbed[did] == text

    # export layout: one gzipped JSONL dir per split
    splits = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(out, "jsonl", "_split=*"))
    )
    assert splits == ["_split=test", "_split=train", "_split=valid"]
    assert glob.glob(os.path.join(out, "jsonl", "_split=train", "*.json.gz"))

    # resume skips both the stage and the export
    r2 = run_curation(
        spark, src, out, span_k=6, attr_spans_path=attrs_dir,
        export_jsonl=True,
    )
    assert r2["stages_run"] == []
    assert "attr_scrub" in r2["stages_skipped"]
    assert "export_jsonl" in r2["stages_skipped"]

    # re-tagged sidecar invalidates the scrub (bytes ride the fingerprint)
    write_attributes(tagged.limit(10), attrs_dir)
    r3 = run_curation(
        spark, src, out, span_k=6, attr_spans_path=attrs_dir,
        export_jsonl=True,
    )
    assert "attr_scrub" in r3["stages_run"]


def test_fix_encoding_stage_repairs_mojibake(spark, tmpdir_path):
    """--fix-encoding: a REALLY latin1-mangled corpus (built with Spark's
    own encode/decode, the same bytes a bad reader would produce) comes
    out of the stage byte-identical to the clean corpus; clean docs pass
    through unchanged; the flag rides the param fingerprint (off -> the
    stage disappears and text stays mangled)."""
    src = f"{tmpdir_path}/docs_fe"
    docs = spark.read.parquet(SF_DOCS).limit(30)
    # give every doc a non-ascii decoration, then mangle HALF of them
    clean = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" café №"), F.col("doc_id"))
    )
    mangled = clean.withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(2)) == 0,
            F.decode(F.encode(F.col("text"), "UTF-8"), "ISO-8859-1"),
        ).otherwise(F.col("text")),
    )
    mangled.write.parquet(src)

    out = f"{tmpdir_path}/cur_fe"
    r = run_curation(spark, src, out, span_k=6, fix_encoding=True)
    assert r["stages_run"][0] == "fix_encoding"
    staged = spark.read.parquet(f"{out}/stage_fix_encoding")
    want = {row["doc_id"]: row["text"] for row in clean.collect()}
    got = {row["doc_id"]: row["text"] for row in staged.collect()}
    assert got == want  # mangled recovered AND clean untouched

    # without the flag the stage does not exist
    out2 = f"{tmpdir_path}/cur_fe_off"
    r2 = run_curation(spark, src, out2, span_k=6)
    assert "fix_encoding" not in r2["stages_run"]


def test_sentence_dedup_stage(spark, tmpdir_path):
    """--sentence-dedup: a shared trailing sentence survives in exactly
    one doc; a doc that is ONLY the shared sentence vanishes; max_docs
    rides the fingerprint (loosening it re-runs and keeps every copy)."""
    src = f"{tmpdir_path}/docs_sd"
    docs = spark.read.parquet(SF_DOCS).limit(40)
    doctored = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(". Accept all cookies now."))
    )
    only_banner = doctored.limit(1).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        *[c for c in doctored.columns if c not in ("doc_id", "text")],
        F.lit("Accept all cookies now.").alias("text"),
    ).select(*doctored.columns)
    doctored.unionByName(only_banner).write.parquet(src)

    out = f"{tmpdir_path}/cur_sd"
    r = run_curation(spark, src, out, span_k=6, sentence_dedup=True)
    assert r["stages_run"][0] == "sentence_dedup"
    sd = r["stages"]["sentence_dedup"]
    assert sd["rows_in"] == 41 and sd["rows_out"] == 40
    staged = spark.read.parquet(f"{out}/stage_sentence_dedup")
    n_with_banner = staged.filter(
        F.col("text").contains("Accept all cookies now.")
    ).count()
    assert n_with_banner == 1  # first occurrence only
    assert staged.filter(F.col("doc_id") >= 1000000).count() == 0

    r2 = run_curation(
        spark, src, out, span_k=6, sentence_dedup=True, sentence_max_docs=50
    )
    assert "sentence_dedup" in r2["stages_run"]
    staged2 = spark.read.parquet(f"{out}/stage_sentence_dedup")
    assert (
        staged2.filter(F.col("text").contains("Accept all cookies now.")).count()
        == 41
    )


def test_priority_select_stage(spark, tmpdir_path):
    """--priority-k: the pre-split stage keeps exactly the k-document
    length-weighted priority sample of its input; changed k invalidates
    the stage; unchanged rerun skips everything."""
    from log_analysis_spark.operators.sampling import priority_sample

    out = f"{tmpdir_path}/cur_pk"
    r1 = run_curation(spark, SF_DOCS, out, span_k=6, priority_k=40)
    assert "priority_select" in r1["stages_run"]
    got = spark.read.parquet(f"{out}/stage_priority_select")
    assert got.count() == 40
    upstream = spark.read.parquet(f"{out}/stage_decontam")
    expected = priority_sample(
        upstream.withColumn("_w", F.length("text")), "doc_id", "_w", 40
    )
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {
        r["doc_id"] for r in expected.select("doc_id").collect()
    }

    r2 = run_curation(spark, SF_DOCS, out, span_k=6, priority_k=40)
    assert r2["stages_run"] == []
    r3 = run_curation(spark, SF_DOCS, out, span_k=6, priority_k=25)
    assert "priority_select" in r3["stages_run"]
    assert spark.read.parquet(f"{out}/stage_priority_select").count() == 25
