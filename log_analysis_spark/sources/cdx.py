"""CDX(J)-style URL capture index — Common Crawl's random-access seam.

CC publishes, next to each crawl, a SURT-sorted capture index (the
``cc-index``: 300 sorted ``cdx-*.gz`` shards) plus a tiny secondary
index (``cluster.idx``) recording each shard block's first key — so "all
captures of example.com" is a binary search in the secondary index
followed by reads of ONLY the overlapping shard blocks. This module is
that layout, Spark-native:

- :func:`cdx_records` — (surt, url, ts, digest) capture rows; the sort
  key is :func:`~log_analysis_spark.functions.parse.surt_key`, the
  digest is a payload hash (md5 here — CC uses SHA1-B32; documented
  deviation, the oracle replays md5 natively).
- :func:`write_cdx_index` — global range layout: ``repartitionByRange``
  on the SURT key (Spark's distributed range partitioner — the sampled
  split points are the 10^12-scale answer to "sort 300 shards"), sorted
  within each bucket, one ``_rb=<bucket>`` directory per range, plus a
  ``_cluster`` sidecar of (bucket, min_key, max_key, n) — the
  ``cluster.idx`` analogue, n_buckets rows total.
- :func:`cdx_lookup_prefix` — reads the bounded sidecar, keeps only
  buckets whose [min_key, max_key] overlaps the probe prefix range, and
  lists ONLY those directories: partition pruning at file-listing time,
  exactly like the inverted index's probed-bucket reads
  (operators/inverted.py) and the IVF-PQ cell dirs (similarity.py).

Scale shape at 10^12 captures: the index build is one range shuffle +
per-partition sort (the same work a global sort-merge write costs —
there is no cheaper way to a sorted index); the sidecar aggregate is
bounded (n_buckets rows); lookups touch O(overlapping buckets) files and
never the full index. The reference has no random-access story at all —
its per-row scan re-reads every file per query (BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse import surt_key

# a code point never present in a SURT key: closes the prefix range
_PREFIX_HI = "\uffff"


def cdx_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Capture rows (surt, url, ts, digest) — zero shuffle, pure
    codegen projection; ``digest`` is md5 of the payload text (content
    drift between captures of one URL shows as digest changes)."""
    return pages.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("string").alias("ts"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("digest"),
    )


def write_cdx_index(records: DataFrame, path: str, n_buckets: int = 16) -> None:
    """Materialize the SURT-ordered index at ``path``: ``data/_rb=<b>``
    range-bucket dirs (sorted within) + the ``_cluster`` sidecar.

    The records relation is persisted across the two writes — the range
    partitioner SAMPLES its split points, so data and sidecar must see
    the SAME partitioning (the persist pins it); the sidecar is derived
    from the exact rows each bucket holds, never from re-sampled
    boundaries."""
    rb = (
        records.repartitionByRange(n_buckets, "surt")
        .withColumn("_rb", F.spark_partition_id())
        .persist()
    )
    try:
        (
            rb.sortWithinPartitions("surt", "ts")
            .write.mode("overwrite")
            .partitionBy("_rb")
            .parquet(f"{path}/data")
        )
        (
            rb.groupBy("_rb")
            .agg(
                F.min("surt").alias("min_key"),
                F.max("surt").alias("max_key"),
                F.count(F.lit(1)).alias("n"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{path}/_cluster")
        )
    finally:
        rb.unpersist()


def cdx_lookup_prefix(spark: SparkSession, path: str, prefix: str) -> DataFrame:
    """All captures whose SURT key starts with ``prefix`` — e.g.
    ``"com,example"`` (a domain and all its subdomains),
    ``"com,example)/images"`` (a path subtree), ``"uk,"`` (a TLD).

    Reads the n_buckets-row sidecar (bounded collect), keeps buckets
    whose [min_key, max_key] overlaps [prefix, prefix + U+FFFF), and
    file-lists ONLY those directories; the residual startswith filter
    runs inside the scan. A probe that overlaps nothing returns an
    empty, correctly-typed relation without touching the data dirs."""
    cluster = spark.read.parquet(f"{path}/_cluster").collect()
    hi = prefix + _PREFIX_HI
    hit = sorted(
        r["_rb"]
        for r in cluster
        if r["max_key"] >= prefix and r["min_key"] <= hi
    )
    if not hit:
        return (
            spark.read.parquet(f"{path}/data")
            .filter(F.lit(False))
            .drop("_rb")
        )
    df = spark.read.parquet(*[f"{path}/data/_rb={b}" for b in hit])
    return df.filter(F.col("surt").startswith(prefix))


def compact_cdx_bucket(spark: SparkSession, path: str, rb: int) -> int:
    """Rewrite one range bucket as a single sorted run and repair its
    sidecar row — the periodic maintenance step after streamed appends
    (each append lands as its own sorted run; lookups stay correct but
    range scans lose single-run locality). Touches ONLY the named
    bucket's directory and the bounded sidecar: at 10^12 captures
    compaction is an embarrassingly parallel per-bucket job scheduled by
    append volume (the sidecar's n vs the bucket's file count), never a
    global rewrite. Returns the bucket's row count.

    The rewrite uses the tmp-dir + rename discipline (a reader that
    lists mid-compaction sees either all old runs or the one new run,
    never a partial mix); the sidecar row rewrite reuses the same swap.
    """
    import os
    import shutil

    bucket_dir = f"{path}/data/_rb={rb}"
    rows = spark.read.parquet(bucket_dir)
    tmp = f"{path}/data/._rb_tmp_{rb}"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        rows.repartition(1)
        .sortWithinPartitions("surt", "ts")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    n = spark.read.parquet(tmp).count()
    back = f"{path}/data/._rb_old_{rb}"
    shutil.rmtree(back, ignore_errors=True)
    os.rename(bucket_dir, back)
    try:
        os.rename(tmp, bucket_dir)
    except OSError:
        os.rename(back, bucket_dir)
        raise
    shutil.rmtree(back, ignore_errors=True)

    cluster_path = f"{path}/_cluster"
    side = spark.read.parquet(cluster_path).collect()
    agg = (
        spark.read.parquet(bucket_dir)
        .agg(
            F.min("surt").alias("mn"),
            F.max("surt").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    merged = [
        (
            r["_rb"],
            agg["mn"] if r["_rb"] == rb else r["min_key"],
            agg["mx"] if r["_rb"] == rb else r["max_key"],
            int(agg["n"]) if r["_rb"] == rb else int(r["n"]),
        )
        for r in side
    ]
    tmp2 = cluster_path + "._tmp"
    shutil.rmtree(tmp2, ignore_errors=True)
    spark.createDataFrame(
        merged, "_rb int, min_key string, max_key string, n long"
    ).coalesce(1).write.mode("overwrite").parquet(tmp2)
    back2 = cluster_path + "._old"
    shutil.rmtree(back2, ignore_errors=True)
    os.rename(cluster_path, back2)
    try:
        os.rename(tmp2, cluster_path)
    except OSError:
        os.rename(back2, cluster_path)
        raise
    shutil.rmtree(back2, ignore_errors=True)
    return int(agg["n"])
