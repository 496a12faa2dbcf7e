"""Search CLI over the materialized inverted index.

The user-facing surface of operators/inverted.py: build a
positional+doclen index from a documents parquet once, then run term /
conjunctive / BM25 / exact-phrase queries against it — each query reads
only the probed bucket directories (partition pruning at file-listing
time), so interactive lookups stay O(postings of the query terms)
regardless of corpus size.

  python -m log_analysis_spark.plans.search_job \\
      --index /tmp/idx --build-from /root/testdata/sf0.01/documents.parquet
  python -m log_analysis_spark.plans.search_job \\
      --index /tmp/idx --mode bm25 --query "table row" --topk 5
  python -m log_analysis_spark.plans.search_job \\
      --index /tmp/idx --mode phrase --query "hash value"

Prints ONE JSON line: {"mode", "query", "n_results", "results": [...],
"wall_sec"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True, help="index root directory")
    ap.add_argument(
        "--build-from",
        help="documents parquet: (re)build the index (doclen + positions "
        "layout — serves every query mode) and exit",
    )
    ap.add_argument(
        "--mode",
        default="bm25",
        choices=["term", "and", "bm25", "phrase"],
        help="term: one term's postings; and: conjunctive; bm25: ranked "
        "(lucene idf); phrase: exact consecutive sequence",
    )
    ap.add_argument(
        "--compact-bucket",
        type=int,
        default=None,
        help="rewrite ONE posting bucket as a single sorted run (the "
        "post-append maintenance step) and exit",
    )
    ap.add_argument(
        "--snippets-from",
        help="documents parquet: with --mode term, also emit ±5-token "
        "keyword-in-context snippets for the result docs",
    )
    ap.add_argument("--query", help="whitespace-separated query terms")
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--hash-fn", default="xxhash64", choices=["xxhash64", "md5"])
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from ..session import get_spark

    spark = get_spark("search-job", master=args.master)
    t0 = time.monotonic()

    if args.build_from:
        from ..operators.inverted import write_inverted_index

        write_inverted_index(
            spark.read.parquet(args.build_from),
            args.index,
            id_col=args.id_col,
            text_col=args.text_col,
            n_buckets=args.n_buckets,
            hash_fn=args.hash_fn,
            with_doclen=True,
            with_positions=True,
        )
        print(json.dumps({"built": args.index, "wall_sec": time.monotonic() - t0}))
        sys.stdout.flush()
        spark.stop()
        return

    if args.compact_bucket is not None:
        from ..operators.inverted import compact_index_bucket

        n = compact_index_bucket(
            spark, args.index, args.compact_bucket, id_col=args.id_col
        )
        print(
            json.dumps(
                {
                    "compacted_bucket": args.compact_bucket,
                    "rows": n,
                    "wall_sec": time.monotonic() - t0,
                }
            )
        )
        sys.stdout.flush()
        spark.stop()
        return

    if not args.query:
        ap.error("--query is required unless --build-from is given")
    terms = args.query.split()
    common = dict(
        id_col=args.id_col, n_buckets=args.n_buckets, hash_fn=args.hash_fn
    )
    from ..operators import inverted as IX

    if args.mode == "term":
        hits = IX.term_lookup(spark, args.index, terms[0], **common)
        if args.snippets_from:
            docs = spark.read.parquet(args.snippets_from)
            hits = hits.join(
                IX.snippets(
                    docs, terms[0], args.id_col, args.text_col, window=5
                ),
                args.id_col,
            )
        rows = hits.orderBy(args.id_col).limit(args.topk).collect()
    elif args.mode == "and":
        rows = (
            IX.terms_lookup_all(spark, args.index, terms, **common)
            .orderBy(args.id_col)
            .limit(args.topk)
            .collect()
        )
    elif args.mode == "bm25":
        rows = IX.bm25_search(
            spark, args.index, terms, topk=args.topk, **common
        ).collect()
    else:
        rows = (
            IX.phrase_search(spark, args.index, terms, **common)
            .orderBy(args.id_col)
            .limit(args.topk)
            .collect()
        )
    out = {
        "mode": args.mode,
        "query": terms,
        "n_results": len(rows),
        "results": [r.asDict() for r in rows],
        "wall_sec": time.monotonic() - t0,
    }
    print(json.dumps(out))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
