"""Standalone tagger job: compute Dolma-style attribute sidecars.

The producer half of the tag-then-filter contract (AI2's ``dolma tag``
command is the public model): run a chosen set of taggers over a corpus
and write one attribute sidecar per tagger — the corpus file itself is
NEVER rewritten. The consumer half already exists (`curation_job
--attr-spans`, `sources/jsonl.py apply_attribute_filter`).

    python -m log_analysis_spark.plans.tag_job \
        --input /data/documents.parquet --out /data/attrs \
        --taggers tokens,quality,langid,pii,dup_spans \
        [--jsonl] [--k 50] [--hash-fn xxhash64] [--master local[8]]

Each tagger lands at ``{out}/{tagger}`` as gzipped JSONL
(``{"id", "attributes": {...}}``). One JSON metrics line on stdout
(rows per tagger, wall seconds) mirroring the other plans' contract.

Taggers (all zero-shuffle projections except dup_spans):

  tokens     n_tokens (whitespace), n_bpe_ish (BPE-ish regex pre-split)
  quality    quality_score (length/punct/stopword composite)
  langid     lang guess + dominant script
  pii        email/phone match counts (the audit signal; the scrub
             itself stays a consumer-side choice)
  dup_spans  maximal cross-document duplicated k-token window spans
             (operators/dedup.duplicate_span_attributes) — CHARACTER
             offsets over the single-space normalized text; consumers
             must apply them over the same normalization (the
             documented producer/consumer convention)

Scale: each tagger is one pass; dup_spans is the window-scrub shape
(O(tokens) window rows, islands bounded by duplicated windows). Taggers
run as separate jobs so a failed tagger reruns alone.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tag_tokens(docs: DataFrame) -> DataFrame:
    from ..functions.textstats import bpe_ish_token_count, token_count

    return docs.select(
        F.col("doc_id").alias("id"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_ish"),
    )


def _tag_quality(docs: DataFrame) -> DataFrame:
    from ..functions.textstats import quality_score

    return docs.select(
        F.col("doc_id").alias("id"),
        quality_score(F.col("text")).alias("quality_score"),
    )


def _tag_langid(docs: DataFrame) -> DataFrame:
    from ..functions.textstats import dominant_script, langid

    return docs.select(
        F.col("doc_id").alias("id"),
        langid(F.col("text")).alias("lang_guess"),
        dominant_script(F.col("text")).alias("script"),
    )


def _tag_pii(docs: DataFrame) -> DataFrame:
    from ..functions.textstats import pii_counts

    emails, phones = pii_counts(F.col("text"))
    return docs.select(
        F.col("doc_id").alias("id"),
        emails.cast("long").alias("n_emails"),
        phones.cast("long").alias("n_phones"),
    )


def _tag_dup_spans(docs: DataFrame, k: int, hash_fn: str) -> DataFrame:
    from ..operators.dedup import duplicate_span_attributes

    spans = duplicate_span_attributes(docs, "doc_id", "text", k=k, hash_fn=hash_fn)
    return spans.groupBy(F.col("doc_id").alias("id")).agg(
        F.collect_list(
            F.struct(
                F.col("start"),
                F.col("end"),
                F.col("n_windows").cast("double").alias("score"),
            )
        ).alias("dup_spans")
    )


def run_taggers(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    taggers: list[str],
    jsonl: bool = False,
    k: int = 50,
    hash_fn: str = "xxhash64",
) -> dict:
    from ..sources.jsonl import read_docs_jsonl, write_attributes

    t0 = time.monotonic()
    if jsonl:
        docs = (
            read_docs_jsonl(spark, input_path)
            .filter(F.col("_corrupt").isNull())
            .select(F.col("id").cast("long").alias("doc_id"), "text")
        )
    else:
        docs = spark.read.parquet(input_path)

    fns = {
        "tokens": _tag_tokens,
        "quality": _tag_quality,
        "langid": _tag_langid,
        "pii": _tag_pii,
        "dup_spans": lambda d: _tag_dup_spans(d, k, hash_fn),
    }
    unknown = sorted(set(taggers) - set(fns))
    if unknown:
        raise ValueError(f"unknown taggers {unknown}; have {sorted(fns)}")
    metrics: dict[str, int] = {}
    for name in taggers:
        attrs = fns[name](docs)
        write_attributes(attrs, f"{out_dir}/{name}")
        metrics[name] = spark.read.json(f"{out_dir}/{name}").count()
    return {"taggers": metrics, "wall_sec": time.monotonic() - t0}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--taggers", default="tokens,quality,langid,pii",
        help="comma list: tokens,quality,langid,pii,dup_spans",
    )
    ap.add_argument("--jsonl", action="store_true",
                    help="input is Dolma JSONL instead of parquet")
    ap.add_argument("--k", type=int, default=50,
                    help="dup_spans window length (tokens)")
    ap.add_argument("--hash-fn", default="xxhash64",
                    choices=["xxhash64", "md5"])
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ..session import get_spark

    spark = get_spark("tag-job", master=args.master)
    stats = run_taggers(
        spark,
        args.input,
        args.out,
        [t.strip() for t in args.taggers.split(",") if t.strip()],
        jsonl=args.jsonl,
        k=args.k,
        hash_fn=args.hash_fn,
    )
    print(json.dumps(stats))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
