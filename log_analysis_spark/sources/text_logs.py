"""Plain-text log-file source: read lines, grok-extract typed fields.

The reference reads Zeek TSV with a per-row Rust splitter
(`/root/reference/src/zeek/zeek_search.rs:94-141`); zeek_tsv.py recasts
that faithfully. This source covers the OTHER log shape a pipeline meets
in practice — free-text lines (syslog, app logs, access logs) with no
header row — as ``spark.read.text`` + one compiled grok pattern
(functions/grok.py), all codegen, plus the S2 partition-key-from-path
projection so ``dir/app=nginx/day=2024-07-01/*.log.gz`` prunes at the
file listing like every other source here.

Scale notes: text files split by line ranges (uncompressed) or per-file
(gzip — same story as zeek_tsv); the grok regex runs k times per row for
k fields (see functions/grok.py cost note); malformed lines drop by
default or survive NULL-typed for a dead-letter sink audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.grok import grok_extract


def read_grok_logs(
    spark: SparkSession,
    path: str,
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
    path_keys: list[str] | None = None,
    keep_unmatched: bool = False,
    keep_line: bool = False,
) -> DataFrame:
    """Lines -> grok fields (+ optional ``key=value`` path components).

    ``path_keys``: names of hive-style components to lift off each file's
    directory path (``.../day=2024-07-01/...`` -> column ``day``) — the
    reference's filename-derived keys (S2) generalized. Extraction uses
    ``input_file_name()`` so it works for ANY directory layout, globbed
    or not, without requiring the hive partition discovery that
    ``spark.read.text`` on explicit file lists bypasses.
    """
    df = spark.read.text(path)  # column: value
    for k in path_keys or []:
        df = df.withColumn(
            k,
            F.regexp_extract(F.input_file_name(), f"[/\\\\]{k}=([^/\\\\]+)", 1),
        )
    out = grok_extract(
        df, "value", pattern, extra_patterns, keep_unmatched=keep_unmatched
    )
    return out if keep_line else out.drop("value")


def dead_letters(
    spark: SparkSession,
    path: str,
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
) -> DataFrame:
    """The lines the pattern does NOT match (audit/dead-letter sink) —
    the complement of ``read_grok_logs``'s default drop."""
    from ..functions.grok import grok_compile

    rx, _ = grok_compile(pattern, extra_patterns)
    return spark.read.text(path).filter(~F.col("value").rlike(rx))
