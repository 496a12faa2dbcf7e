"""Domain-level reputation: per-registrable-domain quality priors.

Web-corpus curation pipelines score DOMAINS, not just documents — a
domain whose pages are consistently short, token-poor, or filter-failing
is spam-farm shaped, and that prior then gates every page from it
(RefinedWeb §3.1 and FineWeb both run URL/domain-level filtering before
per-document rules; the reference's analogue is its per-key enrichment
decoration, src/ip2location.rs, recast from IP->geo to domain->quality).

Two halves, composing like every enrichment in this repo:

- :func:`domain_reputation` — the AGGREGATE: one groupBy(domain) over
  integer signals (doc count, filter passes, token totals). Ratios are a
  single correctly-rounded division of two exact integers, so the
  relation replays bit-identically in any engine (same trick as
  operators/quality.py's average-probability score: never sum floats
  across an engine-dependent order).
- :func:`with_domain_prior` — the JOIN-BACK: decorate each document row
  with its domain's reputation columns, broadcast when the domain dim is
  small (it is: O(registrable domains) ~ 10^8 rows of a few counters vs
  10^12 documents — still broadcastable after a min-docs cut, or a plain
  hash join when not).

Scale shape: the aggregate is ONE map-side-combinable shuffle keyed by
domain; hot domains (10^8 pages of one domain is real Common-Crawl skew)
partial-aggregate inside each task before shuffling, so the reducer sees
one row per (task, domain), never the raw pages. The join-back never
shuffles the document side when broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_reputation(
    df: DataFrame,
    domain_col: str = "domain",
    tokens_col: str = "n_tokens",
    pass_col: str = "passed",
) -> DataFrame:
    """(domain, n_docs, n_pass, total_tokens, pass_rate, avg_tokens) —
    integer sums plus one exact division each for the two ratios.
    ``pass_col`` is any boolean per-document verdict (a quality-funnel
    stage, a classifier threshold); ``tokens_col`` any integer size
    signal."""
    return (
        df.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col(pass_col).cast("long")).cast("long").alias("n_pass"),
            F.sum(F.col(tokens_col).cast("long")).cast("long").alias(
                "total_tokens"
            ),
        )
        .select(
            F.col(domain_col),
            "n_docs",
            "n_pass",
            "total_tokens",
            (F.col("n_pass").cast("double") / F.col("n_docs").cast("double")).alias(
                "pass_rate"
            ),
            (
                F.col("total_tokens").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("avg_tokens"),
        )
    )


def with_domain_prior(
    df: DataFrame,
    reputation: DataFrame,
    domain_col: str = "domain",
    broadcast_rep: bool = True,
) -> DataFrame:
    """Decorate document rows with their domain's reputation columns
    (left join — domains absent from the reputation dim yield NULLs the
    caller coalesces per policy, same null-display contract as
    operators/enrich.py). ``broadcast_rep=False`` for a reputation dim
    past broadcast size: plain hash join, document side shuffles once on
    the domain key."""
    rep = F.broadcast(reputation) if broadcast_rep else reputation
    return df.join(rep, on=domain_col, how="left")
