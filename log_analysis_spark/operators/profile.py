"""Corpus profiling & drift diagnostics.

Two one-pass relational diagnostics a curation pipeline runs before and
after every major corpus change:

* :func:`dataset_profile` — the "dataset card" numbers (doc counts, byte
  mass, size extremes) for EVERY combination of the profile dimensions in
  a single scan, via ``CUBE``: Catalyst's Expand operator fans each row
  into the 2^d grouping sets map-side and one hash aggregate (with
  partial/map-side combine) lands all of them — one shuffle for the whole
  card, where d separate groupBys would re-scan 100 TB d+1 times.
* :func:`histogram_compare` / value drift — distribution drift between
  two snapshots of a numeric column, as fixed-width bin histograms plus
  the triangular-discrimination statistic Δ(P,Q) = Σ (p−q)²/(p+q)
  (Topsøe 2000, "Some inequalities for information divergence and related
  measures of discrimination" — public paper). Chosen over PSI/KL
  PRECISELY because it is log-free: every per-bin term is one subtract,
  one multiply, one add and one divide over int/int IEEE ratios, so the
  statistic replays bit-exactly in any ANSI engine, and Δ is bounded in
  [0, 2] with no empty-bin blow-ups (a PSI bin with q=0 is ±inf).

Scale shape (10^12 rows): each snapshot reduces to ≤ ``n_bins`` count
cells (map-side combinable) before anything joins; totals are 1-row
broadcast dims; the drift fold runs over the bounded bin relation. The
expensive thing — the scan — happens exactly once per snapshot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALL = "<all>"  # cube marker for an aggregated-out dimension


def dataset_profile(
    docs: DataFrame,
    dims: tuple[str, ...] = ("lang", "source"),
    size_col: str = "n_chars",
) -> DataFrame:
    """One-pass dataset card over every CUBE combination of ``dims``.

    Returns ``(gid, *dims, n_docs, sum_<size>, min_<size>, max_<size>)``
    — ``gid`` is Spark's ``grouping_id()`` (bit i set ⟺ dim i aggregated
    out), and aggregated-out dims read :data:`ALL` so a real NULL value
    in the data can never be confused with a cube total. All aggregates
    are integer-exact (count / sum / min / max over longs).
    """
    size = F.col(size_col).cast("long")
    out = (
        docs.cube(*dims)
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size).alias(f"sum_{size_col}"),
            F.min(size).alias(f"min_{size_col}"),
            F.max(size).alias(f"max_{size_col}"),
        )
    )
    for d in dims:
        out = out.withColumn(d, F.coalesce(F.col(d), F.lit(ALL)))
    return out.select(
        "gid", *dims, "n_docs", f"sum_{size_col}", f"min_{size_col}", f"max_{size_col}"
    )


def _bin_expr(col: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Fixed-width bin index in [0, n_bins): floor((v-lo)/w) clamped.

    width is the exact double (hi-lo)/n_bins; the floor+clamp chain is
    three builtins every engine evaluates identically on doubles.
    """
    w = (hi - lo) / float(n_bins)
    raw = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(w))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("int")


def histogram_compare(
    a: DataFrame,
    b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 16,
) -> DataFrame:
    """Per-bin comparison of ``col``'s distribution in snapshots a and b.

    Returns one row per occupied bin: ``(bin, n_a, n_b, p_a, p_b, term)``
    where p_* are the int/int IEEE bin probabilities and ``term`` is the
    triangular-discrimination contribution (p_a−p_b)²/(p_a+p_b). Each
    side collapses to ≤ n_bins cells map-side before the (bounded) outer
    join; totals ride 1-row broadcast dims.
    """
    ca = a.groupBy(_bin_expr(F.col(col), lo, hi, n_bins).alias("bin")).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    cb = b.groupBy(_bin_expr(F.col(col), lo, hi, n_bins).alias("bin")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    return drift_from_counts(ca, cb)


def drift_from_counts(ca: DataFrame, cb: DataFrame) -> DataFrame:
    """The comparison half of :func:`histogram_compare`, over
    already-binned count relations ``(bin, n_a)`` / ``(bin, n_b)`` —
    shared by the batch path and the streaming drift monitor (whose
    cumulative bin counts come from an unwatermarked streaming count)."""
    ta = ca.agg(F.sum("n_a").alias("tot_a"))
    tb = cb.agg(F.sum("n_b").alias("tot_b"))
    joined = (
        ca.join(cb, on="bin", how="full")
        .select(
            "bin",
            F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
        )
        .join(F.broadcast(ta))
        .join(F.broadcast(tb))
    )
    p_a = F.col("n_a").cast("double") / F.col("tot_a").cast("double")
    p_b = F.col("n_b").cast("double") / F.col("tot_b").cast("double")
    term = F.when(
        (F.col("n_a") + F.col("n_b")) > 0,
        ((p_a - p_b) * (p_a - p_b)) / (p_a + p_b),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "bin",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        term.alias("term"),
    )


def drift_score(bins: DataFrame) -> DataFrame:
    """Fold :func:`histogram_compare`'s bounded bin relation into the
    single triangular-discrimination value, as a deterministic bin-ASC
    left fold (the sum order is pinned, so the double replays exactly)."""
    return bins.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("drift")
    )


def key_skew_histogram(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Join/agg-key skew pre-flight: the log2-bucket histogram of per-key
    row counts — (bucket, n_keys, n_rows, max_cnt), bucket = the bit
    length of the count (floor(log2)+1), computed as
    ``length(conv(cnt, 10, 2))`` so the bucketing is pure INTEGER string
    arithmetic (an actual ``floor(log2(double))`` would put a correctly-
    rounded-vs-not boundary between engines; the binary-digit count
    cannot disagree). Reading the report: a shuffle on this key is
    bounded by ``max_cnt`` rows on one reducer; buckets ≥ ~25 (>16M rows
    per key) mean salting (``salted_count``) or AQE skew-join before any
    100 TB join/groupBy on this key.

    Scale shape: one map-side-combinable count per key (the same shuffle
    the candidate join itself would pay — run on a sample when even that
    is too much), then a ≤ 64-row histogram aggregate. No collect, no
    window."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_key.withColumn(
            "bucket", F.length(F.conv(F.col("cnt"), 10, 2)).cast("int")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
        )
        .orderBy("bucket")
    )


def compaction_plan(
    manifest: DataFrame,
    dir_col: str,
    file_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction planner over a file-manifest relation:
    assign every file a rewrite bin of ~``target_bytes``, per directory
    (the compaction unit of a day/lang-partitioned lake). Deterministic
    next-fit-by-cumulative-size: files order by (bytes DESC, file) and
    ``bin = floor(cum_bytes_before / target)`` — pure integer window
    arithmetic, so the plan replays exactly in any ANSI engine. A file
    larger than the target gets a bin to itself and the following file
    jumps past it (bin ids may have gaps); a bin's total is bounded by
    ``target + its last file`` — compaction targets are advisory, the
    point is turning 10^6 kilobyte files into 10^3 target-size ones.

    Returns one row per file: (dir, file, bytes, bin). Scale shape: ONE
    window keyed by directory — a manifest is file-count-bounded (100 TB
    at 256 MB/file is ~4·10^5 rows), so even the degenerate single-dir
    case is a driver-trivial relation; there is deliberately no
    cross-directory balancing (bins never span the partition unit a
    query engine prunes by)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(dir_col)
        .orderBy(F.col(bytes_col).desc(), F.col(file_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(bytes_col).over(w), F.lit(0).cast("long"))
    return manifest.select(
        dir_col,
        file_col,
        F.col(bytes_col).cast("long").alias(bytes_col),
        F.floor(cum_before / F.lit(target_bytes)).cast("long").alias("bin"),
    )


def parquet_file_stats(
    spark,
    path: str,
    cols: list[str],
    n_tasks: int = 32,
) -> DataFrame:
    """Per-file column min/max from parquet FOOTER metadata — no data
    pages read. This is what a data-skipping layer sees: the manifest a
    lakehouse table format (Iceberg/Delta) keeps per file, reconstructed
    from the files themselves. Feed it to ``compaction_plan`` (sizes) or
    use it to AUDIT a layout: after ``write_zordered`` / zorder
    compaction every clustered column shows narrow per-file ranges, after
    an unclustered write it shows full-domain ranges (pinned in
    tests/test_bucketing.py).

    Distributed, not a driver loop: the file listing (driver-side walk,
    file-count-bounded like every manifest relation here) parallelizes
    across ``n_tasks`` and each task reads ONLY footers via pyarrow —
    ~10 KB of IO per file regardless of file size, so 10^5 files cost
    ~1 GB of metadata reads spread over the cluster.

    Returns (file, n_rows, col, min_val, max_val) with min/max as strings
    (cross-type transport; cast at the caller by the known column type).
    Row-group stats merge per file: min of mins / max of maxes.
    """
    import os as _os

    files = []
    for root, _dirs, fs in _os.walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                files.append(_os.path.join(root, f))
    files.sort()
    want = list(cols)

    def _read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            out = {"file": [], "n_rows": [], "col": [], "min_val": [], "max_val": []}
            for fpath in b["file"]:
                md = pq.ParquetFile(fpath).metadata
                name_to_idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }
                for c in want:
                    i = name_to_idx.get(c)
                    if i is None:
                        continue
                    mins, maxs = [], []
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(i).statistics
                        if st is None or not st.has_min_max:
                            mins, maxs = [], []
                            break
                        mins.append(st.min)
                        maxs.append(st.max)
                    out["file"].append(fpath)
                    out["n_rows"].append(md.num_rows)
                    out["col"].append(c)
                    out["min_val"].append(str(min(mins)) if mins else None)
                    out["max_val"].append(str(max(maxs)) if maxs else None)
            yield pd.DataFrame(out)

    fdf = spark.createDataFrame([(f,) for f in files], ["file"]).repartition(
        min(n_tasks, max(1, len(files)))
    )
    return fdf.mapInPandas(
        _read_footers,
        "file string, n_rows long, col string, min_val string, max_val string",
    )
