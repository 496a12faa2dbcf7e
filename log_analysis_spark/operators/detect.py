"""Network-security detections over event/connection streams.

The reference (endepointe/log-analysis) is a Zeek security-log analysis
tool; these are the standard detections an analyst layers on top of the
same conn/dns relations it parses (the RITA / Active-Countermeasures
heuristic family, re-expressed relationally):

- **Beaconing** (`beacon_candidates`): C2 implants phone home on a
  timer, so a (src, dst) channel's inter-arrival gaps are abnormally
  REGULAR. The score is the gaps' normalized squared variation computed
  from pure int64 sums — one subtraction and one division at the end,
  so it replays bit-exactly in any ANSI engine. Human browsing is
  bursty (score ~1+); a 60s-timer implant with small jitter scores
  near 0.
- **Port scanning** (`port_scan_candidates`): one source touching many
  distinct destination ports inside a time bucket. Pure count-distinct
  per (src, hour).
- **DNS tunneling** (`dns_tunnel_stats`): data exfiltration over DNS
  needs long, many-label, high-entropy query names. Integer proxies
  only (name length, label count, longest hex run) — no float entropy,
  so the flags replay exactly.

Scale shape: every detection is one keyed aggregation over the event
relation (beaconing adds one per-channel ordered lag window — the
channel is the natural partition key, and no channel holds more rows
than its own traffic). No all-pairs, no collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def beacon_candidates(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_events: int = 20,
    max_jitter: float = 0.2,
) -> DataFrame:
    """Per-channel beacon score from inter-arrival regularity.

    Events order by (second-truncated timestamp, ``id_col``) — the id
    tie-break makes the gap sequence deterministic under same-second
    bursts. Gaps are int64 SECONDS (microseconds would overflow the
    n*sum(g^2) term at ~10^4 five-minute gaps; seconds keep every
    intermediate inside int64 up to ~10^6 day-scale gaps per channel —
    documented headroom). With S = sum(g), Q = sum(g^2) over n gaps:

        jitter = (n*Q - S*S) / (S*S)

    — the gaps' variance-to-mean-squared ratio scaled by n (>= 0; 0 iff
    perfectly periodic). int64 multiply/subtract, ONE double division.

    Returns (key..., n_events, span_s, mean_gap_s, jitter, is_beacon).
    Channels with fewer than ``min_events`` events or zero span keep
    NULL jitter and never flag (a same-second burst is not a timer).
    """
    evts = df.select(
        *key_cols,
        F.unix_timestamp(F.col(ts_col)).alias("_t"),
        F.col(id_col).alias("_eid"),
    )
    w = Window.partitionBy(*key_cols).orderBy("_t", "_eid")
    gapped = evts.withColumn("_g", F.col("_t") - F.lag("_t").over(w))
    agg = gapped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("_t") - F.min("_t")).cast("long").alias("span_s"),
        F.sum("_g").cast("long").alias("_s"),
        F.sum(F.col("_g") * F.col("_g")).cast("long").alias("_q"),
        F.count("_g").cast("long").alias("_n"),
    )
    ok = (F.col("n_events") >= min_events) & (F.col("_s") > 0)
    jitter = F.when(
        ok,
        (
            (F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")).cast("double")
            / (F.col("_s") * F.col("_s")).cast("double")
        ),
    )
    return agg.select(
        *key_cols,
        "n_events",
        "span_s",
        F.when(ok, F.col("_s").cast("double") / F.col("_n").cast("double")).alias(
            "mean_gap_s"
        ),
        jitter.alias("jitter"),
        F.coalesce(jitter <= F.lit(max_jitter), F.lit(False)).alias("is_beacon"),
    )


def port_scan_candidates(
    df: DataFrame,
    src_col: str,
    port_col: str,
    ts_col: str = "ts",
    min_ports: int = 100,
) -> DataFrame:
    """Distinct destination ports per (source, UTC hour); flag buckets
    at or above ``min_ports`` — the vertical-scan shape (one host
    sweeping a port range). Exact count-distinct: two-phase groupBy, the
    expansion keyed by (src, hour, port) so a scanning source fans out
    across reducers instead of concentrating. Returns
    (src, hour, n_conns, n_ports, is_scan)."""
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    return (
        df.select(F.col(src_col).alias("src"), hour, F.col(port_col).alias("_p"))
        .groupBy("src", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conns"),
            F.count_distinct("_p").cast("long").alias("n_ports"),
        )
        .withColumn("is_scan", F.col("n_ports") >= min_ports)
    )


# longest run of [0-9a-f] characters — encoded payloads (hex/base16
# exfil chunks) produce long runs where human-named hosts do not.
_HEX_RUN_RX = "[0-9a-f]+"


def dns_tunnel_stats(
    df: DataFrame,
    src_col: str,
    qname_col: str,
    min_queries: int = 10,
    min_avg_len: int = 40,
    min_avg_labels: int = 4,
) -> DataFrame:
    """Per-source DNS query-name shape statistics with integer-exact
    tunneling flags: average name length, average label count, and the
    maximum hex-run length seen (the payload-chunk signature). Flags
    when a source's averages exceed both thresholds — compared as
    integer sums cross-multiplied against thresholds (sum_len >= T * n),
    so no float average enters the decision. Returns (src, n_queries,
    sum_len, sum_labels, max_hex_run, is_tunnel)."""
    per_q = df.select(
        F.col(src_col).alias("src"),
        F.length(qname_col).cast("long").alias("_len"),
        (F.size(F.split(F.col(qname_col), "\\.", -1))).cast("long").alias("_labels"),
        F.coalesce(
            F.array_max(
                F.transform(
                    F.regexp_extract_all(F.col(qname_col), F.lit(_HEX_RUN_RX), 0),
                    F.length,
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("_hex"),
    )
    agg = per_q.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("_len").cast("long").alias("sum_len"),
        F.sum("_labels").cast("long").alias("sum_labels"),
        F.max("_hex").cast("long").alias("max_hex_run"),
    )
    return agg.withColumn(
        "is_tunnel",
        (F.col("n_queries") >= min_queries)
        & (F.col("sum_len") >= F.lit(min_avg_len) * F.col("n_queries"))
        & (F.col("sum_labels") >= F.lit(min_avg_labels) * F.col("n_queries")),
    )


def beacon_state(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-channel MERGEABLE beacon state for incremental/streaming
    maintenance: (key..., n, first_t, last_t, s, q) — event count, the
    channel's first/last second, and the int64 gap sums the jitter
    score needs. A batch's state merges with the accumulated state in
    O(channels) (``merge_beacon_states``) PROVIDED batches arrive in
    time order per channel (the same ascending-arrival contract every
    streaming twin documents): the bridge gap between the old state's
    last event and the new batch's first is reconstructed at merge
    time, so merge(state(b1), state(b2)) == state(b1 ∪ b2) EXACTLY
    (pinned in pytest — the incremental_agg associativity-proof
    pattern applied to a detection)."""
    evts = df.select(
        *key_cols,
        F.unix_timestamp(F.col(ts_col)).alias("_t"),
        F.col(id_col).alias("_eid"),
    )
    w = Window.partitionBy(*key_cols).orderBy("_t", "_eid")
    gapped = evts.withColumn("_g", F.col("_t") - F.lag("_t").over(w))
    return gapped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("_t").cast("long").alias("first_t"),
        F.max("_t").cast("long").alias("last_t"),
        F.coalesce(F.sum("_g"), F.lit(0)).cast("long").alias("s"),
        F.coalesce(F.sum(F.col("_g") * F.col("_g")), F.lit(0))
        .cast("long")
        .alias("q"),
    )


def merge_beacon_states(
    old: DataFrame, new: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Merge two beacon-state relations where every ``old`` event
    precedes every ``new`` event per channel: the bridge gap
    ``new.first_t - old.last_t`` joins the sums; channels present on
    one side pass through. One keyed full-outer join, O(channels)."""
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"_o_{c}") for c in ("n", "first_t", "last_t", "s", "q")],
    )
    nw = new.select(
        *key_cols,
        *[F.col(c).alias(f"_n_{c}") for c in ("n", "first_t", "last_t", "s", "q")],
    )
    j = o.join(nw, on=list(key_cols), how="full_outer")
    both = F.col("_o_n").isNotNull() & F.col("_n_n").isNotNull()
    bridge = F.col("_n_first_t") - F.col("_o_last_t")
    return j.select(
        *key_cols,
        (F.coalesce("_o_n", F.lit(0)) + F.coalesce("_n_n", F.lit(0)))
        .cast("long")
        .alias("n"),
        F.coalesce("_o_first_t", "_n_first_t").cast("long").alias("first_t"),
        F.coalesce("_n_last_t", "_o_last_t").cast("long").alias("last_t"),
        (
            F.coalesce("_o_s", F.lit(0))
            + F.coalesce("_n_s", F.lit(0))
            + F.when(both, bridge).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("s"),
        (
            F.coalesce("_o_q", F.lit(0))
            + F.coalesce("_n_q", F.lit(0))
            + F.when(both, bridge * bridge).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("q"),
    )


def beacon_scores_from_state(
    state: DataFrame,
    key_cols: list[str],
    min_events: int = 20,
    max_jitter: float = 0.2,
) -> DataFrame:
    """Finalize a beacon-state relation into exactly
    :func:`beacon_candidates`' output — same guards, same integer
    arithmetic, same single division, so incremental maintenance and
    the full recompute agree bit-for-bit."""
    ok = (F.col("n") >= min_events) & (F.col("s") > 0)
    n_gaps = F.col("n") - F.lit(1)
    jitter = F.when(
        ok,
        (
            (n_gaps * F.col("q") - F.col("s") * F.col("s")).cast("double")
            / (F.col("s") * F.col("s")).cast("double")
        ),
    )
    return state.select(
        *key_cols,
        F.col("n").alias("n_events"),
        (F.col("last_t") - F.col("first_t")).cast("long").alias("span_s"),
        F.when(ok, F.col("s").cast("double") / n_gaps.cast("double")).alias(
            "mean_gap_s"
        ),
        jitter.alias("jitter"),
        F.coalesce(jitter <= F.lit(max_jitter), F.lit(False)).alias("is_beacon"),
    )


# ---------------------------------------------------------------------------
# homoglyph / confusable-domain detection
# ---------------------------------------------------------------------------
# ASCII confusable map (UTS #39 skeleton idea restricted to the pairs that
# survive IDN/ASCII hostnames): single chars via one translate, multi-char
# sequences via ordered replace — ORDER IS THE CONTRACT ('rn'->'m' before
# 'vv'->'w' etc.; both engines scan left-to-right non-overlapping, so a
# fixed application order makes the skeleton deterministic and replayable).
CONFUSABLE_TRANSLATE = ("01l5", "oiis")  # 0->o; 1,l->i (the 1/l/i class); 5->s
CONFUSABLE_SEQS = (("rn", "m"), ("vv", "w"), ("cl", "d"))


def confusable_skeleton(col):
    """Collapse a hostname to its visual skeleton: confusable characters
    and sequences map to one canonical form, so 'paypa1.com', 'paypal.com'
    and 'paypai.com'-style lookalikes collide. Zero shuffle, pure codegen;
    the complement to edit-distance matching (dedup.edit_distance_pairs):
    homoglyphs are visually identical but can be many EDITS apart
    ('rn' vs 'm'), while typos are visually distinct but few edits apart.
    """
    out = F.translate(col, CONFUSABLE_TRANSLATE[0], CONFUSABLE_TRANSLATE[1])
    for a, b in CONFUSABLE_SEQS:
        out = F.replace(out, F.lit(a), F.lit(b))
    return out


def confusable_groups(df: DataFrame, host_col: str = "host") -> DataFrame:
    """Groups of DISTINCT observed hostnames that collapse to one skeleton
    — each group is a lookalike cluster to review (the legitimate domain
    plus its homoglyph squats). The skeleton IS the block key: one
    groupBy, members as a sorted '|'-joined roster (bounded by cluster size),
    never any pairwise comparison. Output: (skeleton, n_hosts, hosts),
    only skeletons with >= 2 distinct raw spellings."""
    sk = (
        df.select(F.col(host_col).alias("_h"))
        .filter(F.length("_h") > 0)
        .distinct()
        .withColumn("_sk", confusable_skeleton(F.col("_h")))
    )
    return (
        sk.groupBy(F.col("_sk").alias("skeleton"))
        .agg(
            F.countDistinct("_h").alias("n_hosts"),
            F.array_join(F.sort_array(F.collect_set("_h")), "|").alias("hosts"),
        )
        .filter(F.col("n_hosts") >= 2)
        .orderBy("skeleton")
    )
