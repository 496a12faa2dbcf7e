"""PySpark-native rebuild of endepointe/log-analysis.

A log/telemetry parse -> enrich -> route -> aggregate engine recast from the
reference's Rust per-row pipeline (/root/reference/src/zeek/zeek_log.rs) into
declarative DataFrame plans optimized by Catalyst, with vectorized
pandas/Arrow UDFs for the grok/regex field-extraction hot path, plus the
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB corpus pipeline needs.

Design tenets (SURVEY.md section 4/7):
- DataFrame/SQL only; no RDDs; UDFs are Arrow-vectorized and confined to
  regex extraction where native expressions cannot express the semantics.
- Every filter/projection is declared so Catalyst pushes it into the scan.
- Joins against small dims are broadcast; skewed aggregates are salted
  two-phase; AQE is on for runtime re-planning.
- Storage is partitioned by day (days(warc_ts)) behind a catalog seam so
  Iceberg and plain parquet layouts are interchangeable.
"""

__version__ = "0.2.0"


def __getattr__(name):
    # lazy public surface: keep `import log_analysis_spark` cheap (no Spark
    # session side effects) while exposing the main entry points at the top
    # level for discoverability
    _SURFACE = {
        "get_spark": ("log_analysis_spark.session", "get_spark"),
        "run_pipeline": ("log_analysis_spark.plans.job", "run_pipeline"),
        "run_once": ("log_analysis_spark.plans.job", "run_once"),
        "search": ("log_analysis_spark.sources.zeek_tsv", "search"),
        "asof_join": ("log_analysis_spark.operators.asof", "asof_join"),
        "range_join_points": ("log_analysis_spark.operators.asof", "range_join_points"),
        "exact_dedup": ("log_analysis_spark.operators.dedup", "exact_dedup"),
        "minhash_lsh_pairs": ("log_analysis_spark.operators.dedup", "minhash_lsh_pairs"),
        "simhash_pairs": ("log_analysis_spark.operators.dedup", "simhash_pairs"),
        "dup_clusters": ("log_analysis_spark.operators.dedup", "dup_clusters"),
        "dup_clusters_star": ("log_analysis_spark.operators.dedup", "dup_clusters_star"),
        "dedup_keep_best": ("log_analysis_spark.operators.dedup", "dedup_keep_best"),
        "winnowed_fingerprints": ("log_analysis_spark.operators.dedup", "winnowed_fingerprints"),
        "winnow_pairs": ("log_analysis_spark.operators.dedup", "winnow_pairs"),
        "brute_force_topk": ("log_analysis_spark.operators.similarity", "brute_force_topk"),
        "lsh_topk": ("log_analysis_spark.operators.similarity", "lsh_topk"),
        "ivf_topk": ("log_analysis_spark.operators.similarity", "ivf_topk"),
        "knn_join": ("log_analysis_spark.operators.similarity", "knn_join"),
        "quantize_vectors": ("log_analysis_spark.operators.similarity", "quantize_vectors"),
        "sample_stratified": ("log_analysis_spark.operators.sampling", "sample_stratified"),
        "split_by_hash": ("log_analysis_spark.operators.sampling", "split_by_hash"),
        "pq_codebooks": ("log_analysis_spark.operators.similarity", "pq_codebooks"),
        "pq_encode": ("log_analysis_spark.operators.similarity", "pq_encode"),
        "pq_encode_arrow": ("log_analysis_spark.operators.similarity", "pq_encode_arrow"),
        "pq_topk": ("log_analysis_spark.operators.similarity", "pq_topk"),
        "ivfpq_topk": ("log_analysis_spark.operators.similarity", "ivfpq_topk"),
        "register_views": ("log_analysis_spark.sources.views", "register_views"),
        "register_pages": ("log_analysis_spark.sources.views", "register_pages"),
    }
    if name in _SURFACE:
        import importlib

        mod, attr = _SURFACE[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
