"""Materialized inverted index: term -> postings, bucket-partitioned.

The text member of the materialized-index family (sign-LSH buckets / IVF
cells / IVF-PQ code cells, operators/similarity.py): term lookups over a
10^12-document corpus must not scan the corpus, so postings rows
(term, doc id, tf) are written PARTITIONED BY a hash bucket of the term.
A lookup computes the query term's bucket in the driver and reads ONLY
that directory — partition pruning at file-listing time, 1/n_buckets of
the index per probed term, before any IO. Conjunctive (AND) queries read
one directory per term and intersect by doc id.

Scale notes:
- The postings relation is O(corpus distinct (term, doc) pairs); the one
  shuffle in the build is the (term, doc) count aggregation, with
  map-side partials collapsing repeated terms per document first.
- Stopword-class terms make single postings lists enormous; the bucket
  partitioning spreads storage but a lookup for such a term still reads
  its whole list — the standard remedy rides on top (df-based stop list:
  drop terms whose document frequency exceeds a fraction of the corpus;
  `max_df_frac` applies it at build time, with the df relation being one
  more bounded-by-vocabulary aggregate).
- The layout appends per ingest batch like the IVF-PQ index stream:
  bucket = f(term) only, so new batches write to the same directories
  without rewriting old files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textstats import token_count, tokens
from .dedup import _base_hash


def term_bucket(term, n_buckets: int, hash_fn: str = "xxhash64"):
    return F.pmod(_base_hash(term, hash_fn), F.lit(n_buckets))


def postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
    max_df_frac: float | None = None,
    with_doclen: bool = False,
    with_positions: bool = False,
) -> DataFrame:
    """(term, id, tf, [positions,] [dl,] _b) postings rows.
    ``with_positions`` adds the sorted 1-based token-position list per
    posting (the phrase-query layout — positional postings cost
    O(tokens) ints instead of O(distinct terms) rows, the standard
    storage trade every phrase-capable index makes).
    ``max_df_frac`` drops
    terms whose document frequency exceeds that fraction of the corpus
    (the df relation is vocabulary-bounded and the join is term-keyed).
    ``with_doclen`` denormalizes the document's token count onto every
    posting row — the classic ranked-retrieval layout: BM25 scoring then
    needs NO join against a corpus-sized doc-length table at query time,
    at the cost of one long per posting."""
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "term"),
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("tf")]
    if with_positions:
        # 1-based token positions, sorted — the phrase-query payload
        aggs.append(
            F.sort_array(F.collect_list(F.col("_pos") + 1)).alias("positions")
        )
    out = tok.groupBy("term", id_col).agg(*aggs)
    if max_df_frac is not None:
        n_docs = df.count()
        dfreq = out.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
        keep = dfreq.filter(F.col("_df") <= int(max_df_frac * n_docs)).select("term")
        out = out.join(keep, "term")
    if with_doclen:
        dl = df.select(
            F.col(id_col), token_count(F.col(text_col)).cast("long").alias("dl")
        )
        out = out.join(dl, id_col)  # id-keyed build-time shuffle, once
    return out.withColumn("_b", term_bucket(F.col("term"), n_buckets, hash_fn))


def write_inverted_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
    max_df_frac: float | None = None,
    with_doclen: bool = False,
    with_positions: bool = False,
) -> None:
    """``with_doclen`` additionally writes the corpus stats BM25 needs
    (n_docs, sum_dl — two longs) under ``path/_stats``: the underscore
    prefix hides it from Spark's directory listing, so plain index reads
    never see it, while :func:`bm25_search` reads it by explicit path.
    ``with_positions`` writes positional postings for
    :func:`phrase_search`."""
    rows = postings(
        df,
        id_col,
        text_col,
        n_buckets,
        hash_fn,
        max_df_frac,
        with_doclen,
        with_positions,
    )
    rows.write.mode("overwrite").partitionBy("_b").parquet(path)
    if with_doclen:
        stats = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(token_count(F.col(text_col))).cast("long").alias("sum_dl"),
        )
        stats.write.mode("overwrite").parquet(f"{path}/_stats")


def _bucket_of(spark: SparkSession, term: str, n_buckets: int, hash_fn: str) -> int:
    row = spark.range(1).select(
        term_bucket(F.lit(term), n_buckets, hash_fn).alias("b")
    ).first()
    return int(row["b"])


def _read_index(
    spark: SparkSession,
    path: str,
    id_col: str,
    with_dl: bool = False,
    with_pos: bool = False,
) -> DataFrame:
    """Read the postings layout; an index whose build emptied the
    postings (e.g. max_df_frac dropped everything) has no part files and
    no inferable schema — that is an EMPTY index, not an error."""
    try:
        return spark.read.parquet(path)
    except Exception:  # noqa: BLE001 - fileless dir <=> AnalysisException
        pos = "positions array<int>, " if with_pos else ""
        dl = "dl long, " if with_dl else ""
        return spark.createDataFrame(
            [], f"term string, {id_col} long, tf long, {pos}{dl}_b long"
        )


def term_lookup(
    spark: SparkSession,
    path: str,
    term: str,
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tf) for one term — reads exactly one bucket directory."""
    b = _bucket_of(spark, term, n_buckets, hash_fn)
    return (
        _read_index(spark, path, id_col)
        .filter((F.col("_b") == b) & (F.col("term") == term))
        .drop("_b", "term")
    )


def terms_lookup_all(
    spark: SparkSession,
    path: str,
    terms: list[str],
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Conjunctive (AND) lookup: ids containing EVERY term, with summed
    tf — reads one bucket directory per distinct term bucket. The
    intersection is a doc-keyed aggregate over the (tiny relative to
    corpus) union of the probed postings lists, HAVING count(distinct
    term) == |terms|."""
    if not terms:
        raise ValueError("terms_lookup_all: empty term list")
    uniq = sorted(set(terms))
    buckets = sorted({_bucket_of(spark, t, n_buckets, hash_fn) for t in uniq})
    idx = _read_index(spark, path, id_col)
    rows = idx.filter(
        F.col("_b").isin(buckets) & F.col("term").isin(uniq)
    )
    agg = rows.groupBy(id_col).agg(
        F.count_distinct("term").alias("_nt"),
        F.sum("tf").cast("long").alias("sum_tf"),
    )
    return agg.filter(F.col("_nt") == len(uniq)).drop("_nt")


def phrase_search(
    spark: SparkSession,
    path: str,
    phrase: list[str],
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, n_matches) — documents containing the exact consecutive
    token sequence ``phrase``, with the number of start positions
    (phrase frequency), over an index written ``with_positions=True``.

    Classic positional-intersection evaluation: candidate starts are the
    first term's positions, then for each later phrase slot j the
    surviving starts are intersected with that term's positions shifted
    by -j (``array_intersect`` of already-sorted unique position lists).
    Repeated terms in the phrase are handled naturally — each slot
    intersects against its term's one positions list.

    Scale: reads ONLY the probed bucket directories (one per distinct
    term); the per-doc state is the phrase terms' position lists —
    O(occurrences), never the corpus; the intersection runs map-side
    after one doc-keyed aggregation of the (tiny) probed postings.
    """
    if not phrase:
        raise ValueError("phrase_search: empty phrase")
    uniq = sorted(set(phrase))
    buckets = sorted({_bucket_of(spark, t, n_buckets, hash_fn) for t in uniq})
    rows = _read_index(spark, path, id_col, with_pos=True).filter(
        F.col("_b").isin(buckets) & F.col("term").isin(uniq)
    )
    g = rows.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("term"), F.col("positions")))
        ).alias("_pm"),
        F.count(F.lit(1)).alias("_nt"),
    )
    # every distinct phrase term must occur at all
    g = g.filter(F.col("_nt") == len(uniq))
    starts = F.col("_pm")[phrase[0]]
    for j, t in enumerate(phrase[1:], start=1):
        starts = F.array_intersect(
            starts, F.transform(F.col("_pm")[t], lambda p: p - j)
        )
    out = g.select(
        F.col(id_col), F.size(starts).cast("long").alias("n_matches")
    )
    return out.filter(F.col("n_matches") > 0)


def bm25_search(
    spark: SparkSession,
    path: str,
    terms: list[str],
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    hash_fn: str = "xxhash64",
    idf_mode: str = "lucene",
) -> DataFrame:
    """BM25 ranked retrieval (Robertson et al., TREC-3) over an index
    written with ``with_doclen=True`` — (id, score), best first.

        score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))

    Disjunctive (OR) semantics, the standard ranked-retrieval contract.
    Reads ONLY the probed buckets' directories (partition pruning) plus
    the two-long ``_stats`` row; document frequency per term is a window
    count over the probed postings (a term's probed list IS its full
    postings list, so the count is the true corpus df). No corpus-sized
    join at query time — ``dl`` rides on every posting row by layout.

    ``idf_mode``:
      - ``'lucene'`` (default): idf = ln(1 + (N-df+0.5)/(df+0.5)) — the
        BM25+ variant every search engine ships. ln() is not correctly
        rounded across libms, so this mode's cross-engine replay is
        approximate (pytest pins it against a Python-computed oracle at
        rel 1e-12 instead).
      - ``'rational'``: idf = 1 + (N-df+0.5)/(df+0.5) — drops the log.
        Every operation is then a single-rounding IEEE step, so the
        DuckDB oracle replays scores bit-for-bit (the same
        determinism-contract split as the HLL linear-counting branch).
        Rankings agree with 'lucene' when per-term df values are of the
        same magnitude; it is the replay witness, not the production
        default.

    Ties at the cut break by ascending id, so top-k is deterministic
    under any partitioning.
    """
    if not terms:
        raise ValueError("bm25_search: empty term list")
    uniq = sorted(set(terms))
    buckets = sorted({_bucket_of(spark, t, n_buckets, hash_fn) for t in uniq})
    rows = _read_index(spark, path, id_col, with_dl=True).filter(
        F.col("_b").isin(buckets) & F.col("term").isin(uniq)
    )
    st = spark.read.parquet(f"{path}/_stats").first()
    n_docs, sum_dl = int(st["n_docs"]), int(st["sum_dl"])
    if n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")
    avgdl = sum_dl / n_docs  # one IEEE division; the oracle replays it

    from pyspark.sql import Window

    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    idf_rational = ((F.lit(n_docs) - dfreq).cast("double") + F.lit(0.5)) / (
        dfreq.cast("double") + F.lit(0.5)
    ) + F.lit(1.0)
    if idf_mode == "lucene":
        idf = F.log(idf_rational)
    elif idf_mode == "rational":
        idf = idf_rational
    else:
        raise ValueError(f"unknown idf_mode {idf_mode!r}")
    tf_d = F.col("tf").cast("double")
    dl_part = F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl))
    wgt = idf * ((tf_d * F.lit(k1 + 1.0)) / (tf_d + F.lit(k1) * dl_part))
    scored = rows.select(F.col(id_col), F.col("term"), wgt.alias("_w"))
    # term-sorted left fold — the per-doc sum is order-pinned for replay
    per_doc = scored.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "_w"))),
            F.lit(0.0),
            lambda acc, s: acc + s["_w"],
        ).alias("score")
    )
    return per_doc.orderBy(F.col("score").desc(), F.col(id_col)).limit(topk)


def compact_index_bucket(
    spark: SparkSession, path: str, bucket: int, id_col: str = "doc_id"
) -> int:
    """Rewrite ONE posting bucket (``path/_b=<bucket>``) as a single
    (term, id)-sorted run — the periodic maintenance step after streamed
    appends (each ``start_inverted_index_stream`` batch lands as its own
    run; queries stay correct but a term's postings scatter across
    files and lose locality). Touches only the named bucket directory:
    at web scale compaction is an embarrassingly parallel per-bucket job
    scheduled by append volume (file count per bucket), never a global
    index rewrite — the same contract as ``sources.cdx.
    compact_cdx_bucket``, whose tmp-dir + rename discipline this reuses
    (a reader listing mid-compaction sees all old runs or the one new
    run, never a partial mix). ``_stats`` is untouched: it aggregates
    documents, which compaction does not change. Returns the bucket's
    posting-row count. Answers are proven identical pre/post in pytest
    (postings are (term, id)-unique by the new-docs-only append
    contract, so compaction is a pure re-layout, never a merge)."""
    import os
    import shutil

    bucket_dir = f"{path}/_b={bucket}"
    rows = spark.read.parquet(bucket_dir)
    tmp = f"{path}/._b_tmp_{bucket}"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        rows.repartition(1)
        .sortWithinPartitions("term", id_col)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    n = spark.read.parquet(tmp).count()
    back = f"{path}/._b_old_{bucket}"
    shutil.rmtree(back, ignore_errors=True)
    os.rename(bucket_dir, back)
    try:
        os.rename(tmp, bucket_dir)
    except OSError:
        os.rename(back, bucket_dir)
        raise
    shutil.rmtree(back, ignore_errors=True)
    return int(n)


def snippets(
    df: DataFrame,
    term: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
) -> DataFrame:
    """Keyword-in-context result snippets: for every document whose
    token stream contains ``term`` (exact token match — the index's own
    tokenization), the ``window`` tokens either side of the FIRST
    occurrence, space-joined, plus the 1-based hit position. The
    display-layer companion to ``term_lookup``: run it on the bounded
    id-joined result set, never the corpus.

    Pure zero-shuffle projection (tokenize, array_position, slice,
    join); both engines replay the identical array arithmetic, so the
    oracle is exact. Documents without the term are absent (the
    array_position-0 filter), matching term_lookup's row set when the
    index was built un-pruned."""
    tok = tokens(F.col(text_col))
    pos = F.array_position(tok, term)
    start = F.greatest(pos - window, F.lit(1))
    # slice length: from start through pos + window, clamped by the array
    length = pos + window - start + 1
    return (
        df.select(
            F.col(id_col),
            pos.cast("long").alias("hit_pos"),
            F.array_join(F.slice(tok, start, length), " ").alias("snippet"),
        )
        .filter(F.col("hit_pos") > 0)
    )
