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

__version__ = "0.1.0"
