"""A1/A2 recast plus the grouped aggregates the north rule requires.

The reference's only aggregate is a (buggy) distinct-source-IP overview that
reads just the first cell of each column vector
(/root/reference/src/zeek/zeek_log.rs:332-362, value[0] at :350) and a
first-wins cross-date merge (/root/reference/src/main.rs:303-334). The
rebuild does the correct full distinct and documents the deviation
(SURVEY.md §2 A1/A2).

Skew note (hot domains take ~40% of rows): plain ``count`` aggregates are
already skew-safe — Spark's hash aggregate does map-side partial
aggregation, so each executor emits one partial row per (host, hour) and the
reducer sees tiny inputs regardless of key skew. Salting is therefore applied
where partials *cannot* collapse the hot key: exact per-key DISTINCT counts
(``distinct_per_host``), where phase 1 salts the key to spread the distinct
set across reducers, then phase 2 merges exact partial counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALT = 32  # matches shuffle parallelism; at 1000 executors raise to ~256


def distinct_hosts(df: DataFrame, host_col: str = "id_orig_h") -> DataFrame:
    """A1 rebuilt: full distinct of source hosts (not value[0])."""
    return df.select(F.col(host_col).alias("host")).distinct()


def events_per_host_hour(
    df: DataFrame, host_col: str = "host", ts_col: str = "ts_bucket"
) -> DataFrame:
    """groupBy(host, hour).count() — partial-agg handles hot-host skew."""
    return (
        df.groupBy(
            F.col(host_col).alias("host"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def topk_domains(df: DataFrame, k: int = 10, host_col: str = "host") -> DataFrame:
    """Exact top-k by count; deterministic tie-break on host.

    Partial aggregation reduces each partition to one row per domain before
    the shuffle; the final ORDER BY ... LIMIT k is a tiny single-stage sort
    over |domains| rows, so this survives a 100x scale-up unchanged.
    """
    return (
        df.groupBy(F.col(host_col).alias("host"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .orderBy(F.desc("n_pages"), F.asc("host"))
        .limit(k)
    )


def distinct_per_host(
    df: DataFrame, host_col: str = "host", value_col: str = "id_orig_h"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per host, salted two-phase.

    Phase 1 groups by (host, value) — the salt is implicit in the hash
    partitioning of the composite key, which spreads a hot host's distinct
    values across all reducers. Phase 2 counts the deduped rows per host.
    This is the expansion Catalyst itself performs for COUNT DISTINCT, made
    explicit so the plan is stable under AQE at any scale.
    """
    dedup = df.select(
        F.col(host_col).alias("host"), F.col(value_col).alias("v")
    ).distinct()
    return dedup.groupBy("host").agg(F.count(F.lit(1)).alias("n_distinct"))


def union_dedup_first_seen(
    df_a: DataFrame, df_b: DataFrame, key: str = "host", seen_col: str = "first_day"
) -> DataFrame:
    """A2: cross-date merge, first-seen wins
    (/root/reference/src/main.rs:321-330). Expressed order-insensitively as
    min(first_day) per key — equivalent to the reference's insert-if-absent
    over ascending dates, but associative so it parallelizes."""
    return (
        df_a.unionByName(df_b)
        .groupBy(key)
        .agg(F.min(seen_col).alias(seen_col))
    )


def salted_group_count(
    df: DataFrame, key_col: str, agg_col_name: str = "n", n_salt: int = N_SALT
) -> DataFrame:
    """Explicit two-phase salted count for demonstration/verification.

    Semantically identical to groupBy(key).count(); used in tests to prove
    the salted plan returns the same result, and as the template for
    aggregates whose partials do not collapse (e.g. collect-heavy UDAFs).
    """
    salt = F.pmod(F.xxhash64(F.col(key_col), F.monotonically_increasing_id()), F.lit(n_salt))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key_col).agg(F.sum("_partial").alias(agg_col_name))


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    key_col: str,
    n_salt: int = N_SALT,
) -> DataFrame:
    """Skew-proof equi-join of a big skewed fact against a dim too large to
    broadcast: the big side gets a random-but-deterministic salt, the dim is
    REPLICATED n_salt times with every salt value, and the join runs on
    (key, salt) — a hot key's rows spread over n_salt reducers instead of
    one straggler. Semantically identical to ``big.join(dim, key)``.

    AQE's skew-join split handles sort-merge stragglers at runtime; this
    explicit form is for engines/paths where AQE cannot help (e.g. a
    skewed key feeding a downstream keyed aggregation in the same stage)
    and as the verifiable template. Cost: dim shuffle inflates n_salt x —
    use only when dim << big and the key histogram is known-skewed.
    """
    salt = F.pmod(
        F.xxhash64(F.col(key_col), F.monotonically_increasing_id()), F.lit(n_salt)
    )
    b = big.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return b.join(d, on=[key_col, "_salt"]).drop("_salt")


def pivot_counts(
    df: DataFrame, key_col: str, pivot_col: str, values: list[str]
) -> DataFrame:
    """Wide per-key counts of an EXPLICIT category list — ``pivot`` with
    the value list pinned (never the two-pass distinct-discovery form,
    which at 10^12 rows would scan the table once just to learn the
    columns). One partial-aggregated shuffle; absent combinations read 0.
    The fixed list also keeps the output schema stable across runs — the
    contract a downstream table needs (reference's router enum is the
    same idea: a closed vocabulary, unknowns dropped earlier).
    """
    out = df.groupBy(key_col).pivot(pivot_col, values).count()
    for v in values:
        out = out.withColumn(v, F.coalesce(F.col(v), F.lit(0)).cast("long"))
    return out


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed ``steps`` in
    strict timestamp order (classic conversion funnel — step i+1 counts
    only events strictly after the user's earliest completion of step i).

    Shape: one keyed aggregate per step (min-ts, map-side combinable)
    joined back to the events by user — k bounded equi-joins for a
    k-step funnel, no windows over the whole corpus, no driver state.
    Returns ``(step_idx, step, n_users)`` with step_idx 1-based.
    """
    reached = df.filter(F.col(type_col) == steps[0]).groupBy(
        F.col(user_col).alias("_u")
    ).agg(F.min(ts_col).alias("_t"))
    outs = [
        reached.agg(
            F.lit(1).cast("long").alias("step_idx"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
        )
    ]
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            df.filter(F.col(type_col) == s)
            .join(reached, on=F.col(user_col) == F.col("_u"))
            .filter(F.col(ts_col) > F.col("_t"))
            .groupBy("_u")
            .agg(F.min(ts_col).alias("_t2"))
            .select("_u", F.col("_t2").alias("_t"))
        )
        outs.append(
            nxt.agg(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(s).alias("step"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
        reached = nxt
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), outs)


def rolling_distinct_users(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day distinct actives per day (the WAU/MAU family): for
    every day d, the count of distinct users seen in [d-(N-1), d].

    Shape matters at 10^12 events: a per-day range join (ev.day BETWEEN
    d-6 AND d) would plan as a broadcast-nested-loop; instead every event
    FANS OUT to the N window-end days it contributes to (explode of a
    6-element date sequence — a map-side x N row multiply, still linear),
    which turns the whole thing into one hash aggregate keyed by
    (day, user) then (day). Distinct-(day,user) pairs collapse map-side,
    so a user's 10^6 events in one week cost one row per covered day, not
    10^6. Days trailing the last event (windows ending there) are
    included — the window definition, identical in the oracle.
    """
    ev = df.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    )
    fan = ev.select(
        "_u",
        F.explode(
            F.sequence(F.col("_d"), F.date_add(F.col("_d"), window_days - 1))
        ).alias("_day"),
    )
    return (
        fan.groupBy("_day")
        .agg(F.countDistinct("_u").alias("active_users"))
        .select(
            F.date_format("_day", "yyyy-MM-dd").alias("day"), "active_users"
        )
        .orderBy("day")
    )
