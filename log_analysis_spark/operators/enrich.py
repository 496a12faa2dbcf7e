"""E1/E3 recast: broadcast-hash-join enrichment against offline dim tables.

The reference enriches each distinct IP with a blocking HTTP GET to
ip2location.io, thread-per-IP behind an Arc<Mutex>
(/root/reference/src/ip2location.rs:174-222, zeek_log.rs:416-458). Its
commented-out local-file cache (ip2location.rs:176-206) is the precedent for
this design: the lookup is a pre-materialized dimension table, and the
per-key fan-out becomes a broadcast hash join — no network, no mutex, no
shuffle of the fact side.

Enriched columns are nullable (left join), mirroring the 12 Option<String>
fields of IP2LocationResponse (/root/reference/src/ip2location.rs:9-24);
unknown keys yield NULLs, handled downstream with coalesce (E4,
/root/reference/src/main.rs:511-541).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LANG_DIM_SCHEMA, TLD_DIM_SCHEMA

# deterministic dim contents (FIXTURES.md §2). The 'unknown' lang is
# deliberately absent -> exercises the left-join NULL case.
_TLD_ROWS = [
    ("com", "example.com", "NA"),
    ("org", "example.org", "NA"),
    ("net", "example.net", "NA"),
    ("de", "example.de", "EU"),
    ("fr", "example.fr", "EU"),
    ("io", "example.io", "EU"),
    ("edu", "example.edu", "NA"),
    ("cn", "example.cn", "APAC"),
]
_LANG_ROWS = [
    ("en", "Americas", "America/New_York"),
    ("de", "Europe", "Europe/Berlin"),
    ("fr", "Europe", "Europe/Paris"),
    ("es", "Americas", "America/Mexico_City"),
    ("zh", "Asia Pacific", "Asia/Shanghai"),
]


def tld_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_TLD_ROWS, TLD_DIM_SCHEMA)


def lang_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_LANG_ROWS, LANG_DIM_SCHEMA)


def enrich(df: DataFrame, spark: SparkSession, host_col: str = "host") -> DataFrame:
    """Left-join TLD + lang dims onto parsed records via broadcast, then
    decorate with the public-suffix registrable domain (the north star's
    'TLD/registrable-domain table' — full longest-match semantics in
    operators/domains.py, K more broadcast joins).

    All dims are tiny (<=100 rows); ``broadcast()`` pins the hash-join plan
    so the fact table never shuffles — at 10^12 rows a shuffle here would be
    the pipeline's dominant cost.
    """
    from .domains import registrable_domain

    tld = F.substring_index(F.col(host_col), ".", -1).alias("tld")
    out = df.withColumn("tld", tld)
    out = out.join(F.broadcast(tld_dim(spark)), on="tld", how="left")
    out = out.join(F.broadcast(lang_dim(spark)), on="lang", how="left")
    return registrable_domain(out, host_col=host_col)


def null_coalesced_view(df: DataFrame) -> DataFrame:
    """E4: Option-display defaults (unwrap_or("") / "0.0",
    /root/reference/src/main.rs:511-541) as coalesce columns."""
    return df.select(
        *[
            F.coalesce(F.col(c), F.lit("")).alias(c)
            if t == "string"
            else F.col(c)
            for c, t in df.dtypes
        ]
    )
