"""Resumable corpus-curation job: the training-data twin of ``plans.job``.

Composes the LLM-curation operators this package already verifies
individually — duplicated-span scrub, exact + near dedup with cluster
resolution, quality gating, benchmark decontamination, deterministic
split — into one spark-submit entrypoint with the SAME manifest/resume
contract as the log pipeline (north rule: resumable from checkpoint with
lineage + metrics):

    python -m log_analysis_spark.plans.curation_job \
        --input /data/documents --out /data/curated \
        [--benchmark /data/benchmarks] [--span-k 50] [--neardup] \
        [--master local[8]]

Stage graph (each stage materializes to parquet and commits a manifest
unit; a killed run resumes at the first stage whose input fingerprint +
params don't match):

    domain_filter (--domain-min-pass R) drop every doc of a source/
             domain whose rate of docs passing the len(text) >=
             --domain-min-chars test is below R (needs >=
             --domain-min-docs docs of evidence) — the RefinedWeb-style
             domain gate, run FIRST because one domain verdict spares
             every later stage all of that domain's pages
    attr_scrub (--attr-spans sidecar.jsonl --attr-field pii_spans)
             apply a Dolma-style span-attribute sidecar: tagger-
             produced character ranges are cut from doc text (byte-
             exact sorted-fold scrub); sidecar bytes ride the
             fingerprint
    c4       (--c4-clean) C4 line-level boilerplate cleaning
    justext  (--justext) context-smoothed block classification keeps
             only GOOD lines (boilerplate_blocks); no-content pages drop
    paragraph_dedup (--paragraph-dedup) CCNet cross-corpus paragraph
             dedup: first occurrence survives, boilerplate-only docs
             drop (the stage CCNet runs first; ~70% of raw CC text)
    scrub    strip k-word spans duplicated across documents
    dedup    exact dedup (min-id survivor) [+ MinHash-LSH near-dup
             clusters resolved keep-best-quality with --neardup]
    media_dedup (--media docs.parquet with (doc_id, payload)) drop docs
             whose image payload is a perceptual near-dup of a lower-id
             surviving doc (pigeonhole hamming clusters, min-id keep)
    quality  keep docs at/above their language's median quality score
    lm_filter (--lm-ref ref.parquet --lm-min-score S) CCNet-style
             reference-LM gate: Stupid Backoff model trained on the
             reference corpus, docs below the mean-score threshold drop
    decontam drop docs sharing n-grams with --benchmark (skipped when no
             benchmark given; the stage still commits, recording 0 drops)
    mixture  (--mixture 'en=3,de=1' --mixture-tokens N) keep only the
             mixture planner's per-lang token-budget selection
    split    deterministic hash split, written partitioned by _split
    export_jsonl (--export-jsonl) publish the curated corpus as gzipped
             Dolma JSONL, one directory per split (release layout)

Unlike the per-day log pipeline, dedup/quality/decontam are GLOBAL
relations (a duplicate pair can span any two shards), so the resume unit
is the STAGE, not a partition of one: each stage's output parquet is its
checkpoint, Spark's own task retry covers intra-stage failures, and the
manifest fingerprint (upstream output listing + stage params) decides
skip-vs-recompute exactly as `plans.checkpoint` does for days. At 10^12
docs every stage is the already-audited scale shape of its operator (see
SCALE.md); the stage boundaries double as natural places to re-bucket.

Metrics: one JSON line on stdout — per-stage rows in/out/bytes, stages
skipped, wall seconds — mirroring `plans.job`'s contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import Manifest, UnitResult, dir_bytes, dir_fingerprint


def _extract(df: DataFrame) -> DataFrame:
    """Leading stage for raw crawl input (``--html``): a pages table
    (url, html[, lang]) becomes documents-shaped (doc_id, url, lang,
    text) via the generic boilerplate strip (functions/html.py — one
    zero-shuffle codegen projection). doc_id = xxhash64(url): stable
    across runs and partitionings, so downstream manifests/dedup keys
    survive re-extraction (collision odds at 64 bits are negligible
    below ~10^9 urls; beyond that pass pre-assigned ids instead).
    A BINARY html column (the pages-table shape) decodes through the
    charset sniff (functions/charset.py — BOM > declaration > utf-8)
    like the WARC path; a string column passes straight to the strip."""
    from ..functions.html import html_to_text

    lang = F.col("lang") if "lang" in df.columns else F.lit("und")
    if dict(df.dtypes).get("html") == "binary":
        from ..functions.charset import decode_html, sniff_charset

        body = decode_html(F.col("html"), sniff_charset(F.col("html")))
    else:
        body = F.col("html").cast("string")
    return df.select(
        F.xxhash64(F.col("url")).alias("doc_id"),
        F.col("url"),
        lang.alias("lang"),
        html_to_text(body).alias("text"),
    )


def _c4(df: DataFrame) -> DataFrame:
    """Optional leading stage: C4 line-level boilerplate cleaning —
    line-filtered text replaces `text`, pages the filter drops leave the
    corpus. Zero-shuffle projection (operators/quality.py), so as a
    stage it costs one read + one write."""
    from ..operators.quality import c4_line_filter

    cleaned = (
        c4_line_filter(df)
        .filter(~F.col("page_dropped"))
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    return df.drop("text").join(cleaned, "doc_id").select(*df.columns)


def _attr_scrub(df: DataFrame, attrs: DataFrame, field: str) -> DataFrame:
    """Optional leading stage (``--attr-spans``): apply a Dolma-style
    span-attribute sidecar — tagger-produced character ranges keyed by
    doc id — by cutting the spans out of ``text`` with the byte-exact
    sorted-fold scrub (sources/jsonl.py remove_spans). Docs without a
    sidecar row pass through untouched (left join); one equi-join +
    projection, no other shuffle. This is the tag-then-filter contract's
    scrub half: taggers never rewrite the corpus, this stage applies
    their verdicts."""
    from ..sources.jsonl import remove_spans

    a = attrs.select(
        F.col("id").cast("long").alias("_aid"), F.col(field).alias("_spans")
    )
    joined = df.join(a, on=df["doc_id"] == F.col("_aid"), how="left")
    scrubbed = F.when(
        F.col("_spans").isNotNull(), remove_spans(F.col("text"), F.col("_spans"))
    ).otherwise(F.col("text"))
    return joined.withColumn("text", scrubbed).select(*df.columns)


def _domain_filter(
    df: DataFrame, min_pass: float, min_chars: int, min_docs: int
) -> DataFrame:
    """Optional early stage (``--domain-min-pass``): drop every document
    of a domain whose pages are consistently junk — the RefinedWeb-style
    URL/domain-level gate that runs BEFORE per-document rules, because
    one domain verdict spares the pipeline every page from it. The
    domain key is the corpus ``source`` column; the per-doc signal is
    the integer ``length(text) >= min_chars`` test; a domain is dropped
    iff its pass rate < ``min_pass`` AND it has >= ``min_docs``
    documents (low-evidence domains are never condemned on a sample of
    one). After ``--html`` extraction there is no ``source`` column, so
    the key falls back to the url host (graph.host_of). Costs one
    bounded aggregate (operators/reputation.py — output is O(domains))
    plus a broadcast anti-join back; the document side never shuffles."""
    from ..operators.reputation import domain_reputation

    if "source" in df.columns:
        key = F.col("source")
    else:
        from ..operators.graph import host_of

        key = host_of(F.col("url"))
    sig = df.select(
        key.alias("domain"),
        F.length("text").cast("long").alias("n_tokens"),
        (F.length("text") >= min_chars).alias("passed"),
    )
    bad = (
        domain_reputation(sig)
        .filter((F.col("pass_rate") < min_pass) & (F.col("n_docs") >= min_docs))
        .select(F.col("domain").alias("_bad_dom"))
    )
    return (
        df.join(
            F.broadcast(bad), key == F.col("_bad_dom"), "left_anti"
        ).select(*df.columns)
    )


def _justext(df: DataFrame) -> DataFrame:
    """Optional leading stage (``--justext``): context-smoothed block
    classification (operators/quality.py boilerplate_blocks) — GOOD
    lines replace `text`, pages with no content lines leave the corpus.
    The contextual alternative to ``--c4-clean``: C4 judges each line
    alone, this rescues short lines adjacent to prose. Zero-shuffle
    projection, so as a stage it costs one read + one write."""
    from ..operators.quality import boilerplate_blocks

    cleaned = (
        boilerplate_blocks(df)
        .filter(F.col("n_content") > 0)
        .select("doc_id", F.col("content_text").alias("text"))
    )
    return df.drop("text").join(cleaned, "doc_id").select(*df.columns)


def _fix_encoding(df: DataFrame) -> DataFrame:
    """Optional early stage (``--fix-encoding``): ftfy-style mojibake
    repair (functions/normalize.py fix_mojibake) — one round of
    UTF-8-read-as-latin1/cp1252 undone in pure codegen. Runs BEFORE any
    hashing stage so a mojibake'd and a clean rendering of the same page
    dedup together, and AFTER attr_scrub (sidecar span offsets refer to
    the text the tagger saw — repair would shift them). Row-local
    projection: as a stage it costs one read + one write."""
    from ..functions.normalize import fix_mojibake

    return df.withColumn("text", fix_mojibake(F.col("text")))


def _sentence_dedup(df: DataFrame, max_docs: int, hash_fn: str) -> DataFrame:
    """Cross-corpus sentence dedup (``--sentence-dedup``): the
    paragraph stage's machinery at sentence granularity — drops every
    sentence whose normalized hash already appeared in another document,
    keeps first occurrences, reassembles with single spaces; docs whose
    every sentence was someone else's boilerplate drop entirely."""
    from ..operators.dedup import sentence_dedup

    deduped = sentence_dedup(
        df, "doc_id", "text", max_docs=max_docs, hash_fn=hash_fn
    )
    keep = deduped.filter(F.length("clean_text") > 0).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    return df.drop("text").join(keep, "doc_id").select(*df.columns)


def _paragraph_dedup(df: DataFrame, max_docs: int, hash_fn: str) -> DataFrame:
    """CCNet's FIRST pipeline stage (Wenzek et al. 2020 §3.1 — they
    measured ~70% of raw Common Crawl text removed here, so running it
    before scrub/dedup/quality spares every later stage those bytes):
    drop every newline-paragraph whose normalized hash already appeared
    in another document, keep first occurrences, reassemble; docs whose
    every paragraph was someone else's boilerplate drop entirely."""
    from ..operators.dedup import paragraph_dedup

    deduped = paragraph_dedup(
        df, "doc_id", "text", max_docs=max_docs, hash_fn=hash_fn
    )
    keep = deduped.filter(F.length("clean_text") > 0).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    return df.drop("text").join(keep, "doc_id").select(*df.columns)


def _scrub(
    df: DataFrame, span_k: int, hash_fn: str, mode: str = "blocks"
) -> DataFrame:
    """``mode='blocks'`` = non-overlapping k-word blocks (O(tokens/k),
    alignment-sensitive); ``mode='windows'`` = sliding k-token windows
    (O(tokens), catches boilerplate at ANY alignment — Lee et al.'s
    exact-substring semantics). Same output contract either way."""
    from ..operators.dedup import duplicated_span_scrub, duplicated_window_scrub

    fn = duplicated_span_scrub if mode == "blocks" else duplicated_window_scrub
    scrubbed = fn(
        df, "doc_id", "text", k=span_k, max_docs=1, hash_fn=hash_fn
    )
    keep = scrubbed.filter(F.length("clean_text") > 0).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    return df.drop("text").join(keep, "doc_id").select(*df.columns)


def _dedup(df: DataFrame, neardup: bool, hash_fn: str) -> DataFrame:
    from ..functions.textstats import quality_score
    from ..operators.dedup import (
        dedup_keep_best,
        dup_clusters,
        exact_dedup,
        minhash_lsh_pairs,
    )

    survivors = exact_dedup(df, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    out = df.join(survivors, "doc_id").select(*df.columns)
    if not neardup:
        return out
    pairs = minhash_lsh_pairs(out, "doc_id", "text", hash_fn=hash_fn)
    clusters = dup_clusters(out, "doc_id", pairs)
    scored = out.select("doc_id", quality_score(F.col("text")).alias("_q"))
    kept = (
        dedup_keep_best(scored, clusters, "doc_id", "_q")
        .filter(F.col("_keep"))
        .select(F.col("_id").alias("doc_id"))
    )
    return out.join(kept, "doc_id").select(*out.columns)


def _media_dedup(
    df: DataFrame, media: DataFrame, max_hamming: int, algo: str
) -> DataFrame:
    """Drop docs whose attached media payload is a perceptual near-dup of
    a lower-id surviving doc (``--media``): dHash/aHash fingerprints in
    one mapInPandas stage (functions/multimodal.py), pigeonhole candidate
    join (never all-pairs), connected-component resolution, keep the
    cluster-minimum doc_id. Docs without a media row pass through — the
    gate only ever REMOVES near-dup media carriers. Fingerprints are
    computed only for docs still alive at this stage (the media table
    joins against the current corpus first), so a shrinking corpus never
    pays for dead media. Same composition as the `image_neardup` /
    `image_ingest_gate` gate queries; at 10^12 the fingerprint relation
    is 8 bytes/doc and every join is keyed."""
    from ..functions.multimodal import phash_images
    from ..operators.dedup import dup_clusters, hamming_pairs

    fp = phash_images(
        media.join(df.select("doc_id"), "doc_id").select(
            F.col("doc_id").cast("string").alias("url"), "payload"
        ),
        url_col="url",
        payload_col="payload",
        algo=algo,
    ).select(F.col("url").cast("long").alias("doc_id"), "fingerprint")
    pairs = hamming_pairs(
        fp, "doc_id", "fingerprint", max_hamming=max_hamming, n_chunks=8
    )
    clusters = dup_clusters(fp, "doc_id", pairs)
    drop = clusters.filter(F.col("_id") != F.col("_label")).select(
        F.col("_id").alias("doc_id")
    )
    return df.join(drop, "doc_id", "left_anti")


def _quality(df: DataFrame, binned: bool = False) -> DataFrame:
    """Keep docs at/above their language's median quality score.

    ``binned=True`` (``--binned-quality``) swaps the exact
    ``percentile()`` — an every-value shuffle, the one stage here whose
    state grows with the corpus — for the fixed-bin quantile sketch
    (operators/sketches.py:binned_quantiles): <= n_bins counts per lang
    shuffle instead, median estimate one bin-width above the truth at
    most (one-sided, so the gate only gets slightly STRICTER). The
    10^12-row default; exact stays the small-corpus/replay witness."""
    from ..functions.textstats import quality_score

    scored = df.withColumn("_q", quality_score(F.col("text")))
    if binned:
        from ..operators.sketches import binned_quantiles

        med = binned_quantiles(
            scored, F.col("_q"), ["lang"], qs=(0.5,), lo=0.0, hi=1.0, n_bins=128
        ).select("lang", F.col("p50_est").alias("_p50"))
    else:
        med = scored.groupBy("lang").agg(F.expr("percentile(_q, 0.5)").alias("_p50"))
    return (
        scored.join(F.broadcast(med), "lang")
        .filter(F.col("_q") >= F.col("_p50"))
        .select(*df.columns)
    )


def _lm_filter(
    df: DataFrame, ref: DataFrame, min_score: float, min_count: int
) -> DataFrame:
    """CCNet-style reference-LM gate (``--lm-ref`` + ``--lm-min-score``):
    train a Stupid Backoff model (operators/lm.py; Brants et al. 2007)
    on the REFERENCE corpus — the clean-text stand-in for CCNet's
    Wikipedia LM — and drop every document whose mean per-token score
    falls below the threshold. Zero-token documents have nothing to
    score and drop with the gibberish (inner join on the scored ids).
    The reference bytes ride the manifest fingerprint, so an edited
    reference re-runs the stage."""
    from ..operators.lm import stupid_backoff_model, stupid_backoff_scores

    model = stupid_backoff_model(ref, min_count=min_count)
    keep = stupid_backoff_scores(df, model).filter(
        F.col("sb_score") >= F.lit(min_score)
    )
    return df.join(keep.select("doc_id"), "doc_id")


def _decontam(
    df: DataFrame, bench: DataFrame | None, n: int, hash_fn: str
) -> DataFrame:
    if bench is None:
        return df
    from ..operators.decontam import decontaminate

    return decontaminate(df, bench, "doc_id", "text", n=n, hash_fn=hash_fn)


def _mixture(df: DataFrame, weights: dict[str, float], total_tokens: int, hash_fn: str) -> DataFrame:
    """Optional pre-split stage (``--mixture``): keep only the documents
    the mixture planner selects — per-lang token budgets proportional to
    the given weights, documents taken in deterministic hash order
    (operators/mixing.py; langs absent from the weights drop)."""
    from ..operators.mixing import plan_mixture

    plan = plan_mixture(
        df, weights, total_tokens, source_col="lang", id_col="doc_id",
        text_col="text", hash_fn=hash_fn,
    )
    keep = plan.filter(F.col("selected")).select("doc_id")
    return df.join(keep, "doc_id").select(*df.columns)


def _priority_select(df: DataFrame, k: int) -> DataFrame:
    """Optional pre-split stage (``--priority-k``): weighted corpus
    subsetting — keep the k-document priority sample with inclusion
    ~proportional to CURRENT document length (sampling.priority_sample;
    length measured after every upstream scrub so a heavily-scrubbed doc
    competes at its surviving mass). The probabilistic counterpart to
    ``--mixture``'s greedy per-lang token budgets: every document has a
    length-proportional chance, long-tail languages are not zeroed out."""
    from ..operators.sampling import priority_sample

    keep = priority_sample(
        df.withColumn("_w", F.length("text")), "doc_id", "_w", k
    ).select("doc_id")
    return df.join(keep, "doc_id").select(*df.columns)


def _split(df: DataFrame, test_frac: float, valid_frac: float) -> DataFrame:
    from ..operators.sampling import split_by_hash

    return split_by_hash(df, "doc_id", test_frac, valid_frac)


def ingest_wet(
    spark: SparkSession,
    wet_dir: str,
    input_path: str,
    out_dir: str,
    resume: bool = True,
) -> dict:
    """Materialize the documents table from raw ``.wet(.gz)`` files —
    Common Crawl's extracted-text distribution (sources/warc.py
    pages_from_wet): one task per WET file -> conversion records ->
    (doc_id, url, lang, text) with doc_id = xxhash64(url), the same id
    contract as the ``--html`` extract stage. Starting curation from
    .wet skips HTML parsing entirely (CC already did it) — the cheapest
    on-ramp when raw markup is not needed. One resume unit,
    fingerprinted by the WET directory listing."""
    from pyspark.sql import Observation

    from ..sources.warc import pages_from_wet, read_warc

    manifest = Manifest(os.path.join(out_dir, "_manifest"))
    fp = dir_fingerprint(wet_dir)
    if resume and manifest.is_done("wet_ingest", "all", fp):
        return {"wet_ingested": False, "skipped": True}
    obs = Observation("wet_docs")
    docs = (
        pages_from_wet(read_warc(spark, wet_dir, types=("conversion",)))
        .select(
            F.xxhash64(F.col("url")).alias("doc_id"), "url", "lang", "text"
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    docs.write.mode("overwrite").parquet(input_path)
    n = int(obs.get["n"])
    manifest.mark_done(
        "wet_ingest",
        "all",
        fp,
        UnitResult(rows_in=n, rows_out=n, bytes_out=dir_bytes(input_path)),
    )
    return {"wet_ingested": True, "docs": n}


def run_curation(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    benchmark_path: str | None = None,
    span_k: int = 50,
    neardup: bool = False,
    decontam_n: int = 8,
    test_frac: float = 0.01,
    valid_frac: float = 0.01,
    hash_fn: str = "xxhash64",
    resume: bool = True,
    c4: bool = False,
    justext: bool = False,
    html: bool = False,
    mixture: dict[str, float] | None = None,
    mixture_tokens: int = 0,
    binned_quality: bool = False,
    scrub_mode: str = "blocks",
    fix_encoding: bool = False,
    paragraph_dedup: bool = False,
    paragraph_max_docs: int = 1,
    sentence_dedup: bool = False,
    sentence_max_docs: int = 1,
    media_path: str | None = None,
    media_hamming: int = 7,
    media_algo: str = "dhash",
    domain_min_pass: float | None = None,
    domain_min_chars: int = 200,
    domain_min_docs: int = 3,
    lm_ref_path: str | None = None,
    lm_min_score: float = 0.0,
    lm_min_count: int = 2,
    attr_spans_path: str | None = None,
    attr_field: str = "pii_spans",
    export_jsonl: bool = False,
    priority_k: int = 0,
) -> dict:
    """Run (or resume) the curation stage graph. Returns run metrics."""
    manifest = Manifest(os.path.join(out_dir, "_manifest"))
    t0 = time.monotonic()
    params = (
        f"span_k={span_k}|scrub={scrub_mode}|neardup={neardup}|n={decontam_n}"
        f"|t={test_frac}|v={valid_frac}|hash={hash_fn}"
        f"|bench={benchmark_path}|c4={c4}|jt={justext}|html={html}"
        + (f"|binnedq={binned_quality}" if binned_quality else "")
        + (
            f"|mix={sorted(mixture.items())}:{mixture_tokens}"
            if mixture
            else ""
        )
        + (
            # media bytes ride the fingerprint: edited media re-runs the
            # stage, same contract as --robots in plans.job
            f"|media={dir_fingerprint(media_path)}:{media_hamming}:{media_algo}"
            if media_path
            else ""
        )
        + ("|fixenc=1" if fix_encoding else "")
        + (f"|pd={paragraph_max_docs}" if paragraph_dedup else "")
        + (f"|sd={sentence_max_docs}" if sentence_dedup else "")
        + (
            f"|dom={domain_min_pass}:{domain_min_chars}:{domain_min_docs}"
            if domain_min_pass is not None
            else ""
        )
        + (
            # reference-corpus bytes ride the fingerprint: an edited
            # reference LM re-runs the stage, same contract as --media
            f"|lm={dir_fingerprint(lm_ref_path)}:{lm_min_score}:{lm_min_count}"
            if lm_ref_path is not None
            else ""
        )
        + (
            # sidecar bytes ride the fingerprint: re-tagged spans re-run
            # the scrub, same contract as --media / --lm-ref
            f"|attrs={dir_fingerprint(attr_spans_path)}:{attr_field}"
            if attr_spans_path is not None
            else ""
        )
        + (f"|pk={priority_k}" if priority_k else "")
    )
    bench = (
        spark.read.parquet(benchmark_path) if benchmark_path is not None else None
    )
    media = spark.read.parquet(media_path) if media_path is not None else None
    lm_ref = spark.read.parquet(lm_ref_path) if lm_ref_path is not None else None

    attr_spans = None
    if attr_spans_path is not None:
        from pyspark.sql import types as T

        from ..sources.jsonl import SPAN_TYPE, read_attributes

        attr_spans = read_attributes(
            spark,
            attr_spans_path,
            T.StructType([T.StructField(attr_field, SPAN_TYPE)]),
        )

    stages: list[tuple[str, Callable[[DataFrame], DataFrame], str | None]] = [
        *([("extract", _extract, None)] if html else []),
        *(
            [
                (
                    "attr_scrub",
                    lambda d: _attr_scrub(d, attr_spans, attr_field),
                    None,
                )
            ]
            if attr_spans is not None
            else []
        ),
        *(
            [
                (
                    "domain_filter",
                    lambda d: _domain_filter(
                        d, domain_min_pass, domain_min_chars, domain_min_docs
                    ),
                    None,
                )
            ]
            if domain_min_pass is not None
            else []
        ),
        *([("fix_encoding", _fix_encoding, None)] if fix_encoding else []),
        *([("c4", _c4, None)] if c4 else []),
        *([("justext", _justext, None)] if justext else []),
        *(
            [
                (
                    "paragraph_dedup",
                    lambda d: _paragraph_dedup(d, paragraph_max_docs, hash_fn),
                    None,
                )
            ]
            if paragraph_dedup
            else []
        ),
        *(
            [
                (
                    "sentence_dedup",
                    lambda d: _sentence_dedup(d, sentence_max_docs, hash_fn),
                    None,
                )
            ]
            if sentence_dedup
            else []
        ),
        ("scrub", lambda d: _scrub(d, span_k, hash_fn, scrub_mode), None),
        ("dedup", lambda d: _dedup(d, neardup, hash_fn), None),
        *(
            [
                (
                    "media_dedup",
                    lambda d: _media_dedup(d, media, media_hamming, media_algo),
                    None,
                )
            ]
            if media is not None
            else []
        ),
        ("quality", lambda d: _quality(d, binned_quality), None),
        *(
            [
                (
                    "lm_filter",
                    lambda d: _lm_filter(d, lm_ref, lm_min_score, lm_min_count),
                    None,
                )
            ]
            if lm_ref is not None
            else []
        ),
        ("decontam", lambda d: _decontam(d, bench, decontam_n, hash_fn), None),
        *(
            [("mixture", lambda d: _mixture(d, mixture, mixture_tokens, hash_fn), None)]
            if mixture
            else []
        ),
        *(
            [("priority_select", lambda d: _priority_select(d, priority_k), None)]
            if priority_k
            else []
        ),
        ("split", lambda d: _split(d, test_frac, valid_frac), "_split"),
    ]

    prev_path = input_path
    ran, skipped, metrics = [], [], {}
    for name, fn, partition_col in stages:
        stage_out = os.path.join(
            out_dir, "corpus" if name == "split" else f"stage_{name}"
        )
        fp = dir_fingerprint(prev_path) + "|" + params
        if resume and manifest.is_done("curation", name, fp):
            skipped.append(name)
            prev_path = stage_out
            continue
        try:
            src = spark.read.parquet(prev_path)
        except Exception:  # noqa: BLE001 - resumed past an emptied stage
            halted = name
            break
        rows_in = src.count()
        result = fn(src)
        writer = result.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(stage_out)
        # an emptied corpus writes NO part files (Spark skips empty
        # tasks), so the read-back cannot infer a schema — count 0 and
        # halt the graph honestly instead of crashing downstream
        try:
            rows_out = spark.read.parquet(stage_out).count()
        except Exception:  # noqa: BLE001 - empty dir <=> AnalysisException
            rows_out = 0
        res = UnitResult(rows_in, rows_out, dir_bytes(stage_out))
        manifest.mark_done("curation", name, fp, res)
        ran.append(name)
        metrics[name] = {
            "rows_in": rows_in,
            "rows_out": rows_out,
            "bytes_out": res.bytes_out,
        }
        prev_path = stage_out
        if rows_out == 0:
            halted = name
            break
    else:
        halted = None
    if export_jsonl and halted is None:
        # release layout: gzipped Dolma JSONL, one subdirectory per split
        # (_split=train/valid/test), manifest-resumed like any stage
        from ..sources.jsonl import write_docs_jsonl

        export_dir = os.path.join(out_dir, "jsonl")
        fp = dir_fingerprint(prev_path) + "|" + params
        if resume and manifest.is_done("curation", "export_jsonl", fp):
            skipped.append("export_jsonl")
        else:
            corpus = spark.read.parquet(prev_path)
            rows = corpus.count()
            write_docs_jsonl(corpus, export_dir, partition_by="_split")
            res = UnitResult(rows, rows, dir_bytes(export_dir))
            manifest.mark_done("curation", "export_jsonl", fp, res)
            ran.append("export_jsonl")
            metrics["export_jsonl"] = {
                "rows_in": rows,
                "rows_out": rows,
                "bytes_out": res.bytes_out,
            }
    splits = None
    if halted is None:
        # release card: bounded per-split row counts straight off the
        # partition column (one partial-agg'd pass over the final corpus)
        try:
            splits = {
                r["_split"]: r["n"]
                for r in spark.read.parquet(prev_path)
                .groupBy("_split")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        except Exception:  # noqa: BLE001 - corpus without _split (custom graph)
            splits = None
    wall = time.monotonic() - t0
    return {
        "stages_run": ran,
        "stages_skipped": skipped,
        "stages": metrics,
        "splits": splits,
        "halted_empty_at": halted,
        "wall_sec": wall,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--benchmark", help="benchmark/eval documents parquet")
    ap.add_argument("--span-k", type=int, default=50)
    ap.add_argument("--neardup", action="store_true")
    ap.add_argument("--decontam-n", type=int, default=8)
    ap.add_argument("--test-frac", type=float, default=0.01)
    ap.add_argument("--valid-frac", type=float, default=0.01)
    ap.add_argument("--hash-fn", default="xxhash64", choices=["xxhash64", "md5"])
    ap.add_argument(
        "--c4-clean",
        action="store_true",
        help="prepend the C4 line-level boilerplate stage",
    )
    ap.add_argument(
        "--justext",
        action="store_true",
        help="prepend the context-smoothed block-classification cleaning "
        "stage (boilerplate_blocks) - the contextual alternative to "
        "--c4-clean; both may run (C4 first)",
    )
    ap.add_argument(
        "--html",
        action="store_true",
        help="input is a raw crawl pages table (url, html[, lang]); an "
        "extract stage (functions/html.py boilerplate strip, doc_id = "
        "xxhash64(url)) runs first",
    )
    ap.add_argument(
        "--mixture",
        help="per-lang mixture weights 'en=3,de=1' — adds a pre-split "
        "stage keeping only the mixture planner's selection "
        "(operators/mixing.py); requires --mixture-tokens",
    )
    ap.add_argument(
        "--mixture-tokens",
        type=int,
        default=0,
        help="total token budget the mixture weights divide",
    )
    ap.add_argument(
        "--priority-k",
        type=int,
        default=0,
        help="adds a pre-split priority_select stage: keep a k-document "
        "weighted priority sample (inclusion ~proportional to current "
        "text length; deterministic md5 uniforms) — the probabilistic "
        "counterpart to --mixture's greedy per-lang budgets",
    )
    ap.add_argument(
        "--scrub-mode",
        choices=["blocks", "windows"],
        default="blocks",
        help="span-scrub unit: non-overlapping k-word blocks (O(tokens/k), "
        "alignment-sensitive) or sliding k-token windows (O(tokens), "
        "any-alignment exact-substring semantics)",
    )
    ap.add_argument(
        "--media",
        help="media parquet (doc_id, payload binary) — adds a media_dedup "
        "stage after dedup: perceptual-fingerprint near-dup clusters "
        "(pigeonhole hamming join) keep only the minimum doc_id",
    )
    ap.add_argument(
        "--media-hamming",
        type=int,
        default=7,
        help="max hamming distance for media near-dup (default 7, 8-chunk "
        "pigeonhole full recall)",
    )
    ap.add_argument(
        "--media-algo", choices=["dhash", "ahash"], default="dhash"
    )
    ap.add_argument(
        "--binned-quality",
        action="store_true",
        help="use the fixed-bin quantile sketch for the per-lang median "
        "quality gate instead of exact percentile() — bounded-state "
        "scale path (one-sided: the gate gets at most one bin-width "
        "stricter)",
    )
    ap.add_argument(
        "--domain-min-pass",
        type=float,
        default=None,
        help="adds an early domain_filter stage: drop every doc of a "
        "source/domain whose fraction of docs with len(text) >= "
        "--domain-min-chars falls below this rate (domains with fewer "
        "than --domain-min-docs docs are never dropped)",
    )
    ap.add_argument(
        "--wet-ingest",
        metavar="WET_DIR",
        help="materialize the documents table at --input from raw .wet(.gz) files (Common Crawl extracted-text layout) before curating; manifest-resumed",
    )
    ap.add_argument(
        "--paragraph-dedup",
        action="store_true",
        help="CCNet cross-corpus paragraph dedup stage (runs before scrub)",
    )
    ap.add_argument("--paragraph-max-docs", type=int, default=1)
    ap.add_argument(
        "--sentence-dedup",
        action="store_true",
        help="cross-corpus sentence dedup stage (after paragraph dedup, "
        "before scrub)",
    )
    ap.add_argument("--sentence-max-docs", type=int, default=1)
    ap.add_argument(
        "--fix-encoding",
        action="store_true",
        help="ftfy-style mojibake repair stage (before any hashing stage)",
    )
    ap.add_argument("--domain-min-chars", type=int, default=200)
    ap.add_argument("--domain-min-docs", type=int, default=3)
    ap.add_argument(
        "--lm-ref",
        help="reference-corpus parquet to train the Stupid Backoff LM on "
        "(enables the lm_filter stage; CCNet's Wikipedia-LM analogue)",
    )
    ap.add_argument(
        "--lm-min-score",
        type=float,
        default=0.0,
        help="drop docs whose mean Stupid Backoff score under the "
        "--lm-ref model is below this",
    )
    ap.add_argument("--lm-min-count", type=int, default=2)
    ap.add_argument(
        "--attr-spans",
        help="Dolma-style span-attribute sidecar (JSONL dir); the spans "
        "are scrubbed from doc text as a leading stage",
    )
    ap.add_argument(
        "--attr-field",
        default="pii_spans",
        help="attribute name inside the sidecar holding the span array",
    )
    ap.add_argument(
        "--export-jsonl",
        action="store_true",
        help="after split, also publish the corpus as gzipped Dolma JSONL "
        "(one dir per split)",
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    mixture = None
    if args.mixture:
        if args.mixture_tokens <= 0:
            ap.error("--mixture requires --mixture-tokens > 0")
        try:
            mixture = {
                k.strip(): float(v)
                for k, v in (kv.split("=", 1) for kv in args.mixture.split(","))
            }
        except ValueError:
            ap.error("--mixture must look like 'en=3,de=1'")

    from ..session import get_spark

    spark = get_spark("corpus-curation-job", master=args.master)
    ingest = (
        ingest_wet(
            spark, args.wet_ingest, args.input, args.out,
            resume=not args.no_resume,
        )
        if args.wet_ingest
        else None
    )
    stats = run_curation(
        spark,
        args.input,
        args.out,
        benchmark_path=args.benchmark,
        span_k=args.span_k,
        neardup=args.neardup,
        decontam_n=args.decontam_n,
        test_frac=args.test_frac,
        valid_frac=args.valid_frac,
        hash_fn=args.hash_fn,
        resume=not args.no_resume,
        c4=args.c4_clean,
        justext=args.justext,
        html=args.html,
        mixture=mixture,
        mixture_tokens=args.mixture_tokens,
        priority_k=args.priority_k,
        binned_quality=args.binned_quality,
        scrub_mode=args.scrub_mode,
        fix_encoding=args.fix_encoding,
        paragraph_dedup=args.paragraph_dedup,
        paragraph_max_docs=args.paragraph_max_docs,
        sentence_dedup=args.sentence_dedup,
        sentence_max_docs=args.sentence_max_docs,
        media_path=args.media,
        media_hamming=args.media_hamming,
        media_algo=args.media_algo,
        domain_min_pass=args.domain_min_pass,
        domain_min_chars=args.domain_min_chars,
        domain_min_docs=args.domain_min_docs,
        lm_ref_path=args.lm_ref,
        lm_min_score=args.lm_min_score,
        lm_min_count=args.lm_min_count,
        attr_spans_path=args.attr_spans,
        attr_field=args.attr_field,
        export_jsonl=args.export_jsonl,
    )
    if ingest is not None:
        stats["wet_ingest"] = ingest
    print(json.dumps(stats))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
