"""Crawl-frontier scheduling: politeness-aware fetch planning.

The crawl-side complement of the robots.txt filter (operators/robots.py):
given the candidate URL set a crawler may fetch, produce the fetch PLAN —
which worker owns each URL, in what order a host's URLs are fetched, and
the earliest offset (seconds into the crawl round) each fetch may start
so the per-host ``Crawl-delay`` politeness interval is honored.

Design (all relational, one shuffle):

- **Host affinity is structural politeness.** Every URL of a host maps to
  worker ``pmod(hash(host), n_workers)``, so a host is fetched by exactly
  one worker and per-host serialization cannot be violated by cluster
  parallelism — the invariant real crawlers (Heritrix queue assignment,
  Nutch ``partition.url.mode=byHost``) enforce the same way.
- **Within-host order is deterministic**: priority DESC first (if given),
  then the md5/xxhash base-hash of the URL — stable under repartitioning
  and corpus growth, like every other deterministic sample in this repo
  (operators/sampling.py). Rank comes from ONE ``row_number`` window
  partitioned by host — the only shuffle in the plan, and it shares the
  host key with the worker assignment.
- **Earliest start offset** = ``(rank-1) * delay_s`` with the host's
  Crawl-delay from ``robots.crawl_delays`` (a BROADCAST dim — robots
  rule sets are O(hosts), tiny next to the frontier) and a caller default
  where no delay line exists.

Scale shape at 10^12 URLs: the window is a single hash-partitioned
shuffle on host; a mega-host's chain is long because politeness is
serial per host — that is workload reality, not compute skew (the
row_number for one host is a linear within-partition scan). The delays
dim never shuffles the frontier. Skew-sensitive callers cap per-host
depth first with ``sampling.keyed_quota_sample`` — composition, not a
special case here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import _base_hash


def schedule_frontier(
    urls: DataFrame,
    delays: DataFrame | None = None,
    default_delay_s: float = 1.0,
    n_workers: int = 64,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Input: (host, url[, priority]) frontier rows; ``delays`` an
    optional (host, delay_s) dim (shape of ``robots.crawl_delays``).
    Output adds ``worker`` (host-affine partition), ``fetch_order``
    (1-based per-host rank) and ``fetch_offset_s`` (earliest start,
    seconds). ``hash_fn='md5'`` is the oracle-replayable variant."""
    host = F.col(host_col)
    order = [F.col(priority_col).desc()] if priority_col else []
    order += [_base_hash(F.col(url_col), hash_fn).asc(), F.col(url_col).asc()]
    w = Window.partitionBy(host_col).orderBy(*order)
    out = urls.withColumn("fetch_order", F.row_number().over(w))
    if delays is not None:
        out = out.join(
            F.broadcast(delays.select(host_col, "delay_s")), on=host_col, how="left"
        )
    else:
        out = out.withColumn("delay_s", F.lit(None).cast("double"))
    return (
        out.withColumn(
            "delay_s", F.coalesce(F.col("delay_s"), F.lit(float(default_delay_s)))
        )
        .withColumn(
            "worker",
            F.pmod(_base_hash(host, hash_fn), F.lit(n_workers)).cast("int"),
        )
        .withColumn(
            "fetch_offset_s",
            (F.col("fetch_order") - F.lit(1)).cast("double") * F.col("delay_s"),
        )
    )


def grow_frontier(
    cand: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    src_host_col: str = "src_host",
    bloom_m_bits: int | None = None,
    bloom_k: int = 4,
    hash_fn: str = "xxhash64",
    broadcast_seen: bool = False,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """One BFS crawl-growth step: candidate URLs (extracted, resolved,
    canonicalized link targets with their referring host) anti-joined
    against the already-seen set, then referrer-weighted:
    ``(url, n_referrers)`` with n_referrers = distinct source hosts —
    the classic crawl-priority signal.

    ``bloom_m_bits`` is the 10^12 shape (SCALE.md §crawl-graph): a Bloom
    filter over the seen set (``sketches.bloom_build`` — false-negative-
    free by construction) rides the plan as one literal array, so every
    candidate the filter rejects is DEFINITELY new and skips the
    anti-join shuffle entirely; only bloom-possible candidates (true
    seen + the ~(1-e^(-kn/m))^k false-positive sliver) take the exact
    anti-join. Result-IDENTICAL to the plain anti-join — the filter
    changes which rows pay the shuffle, never the answer (pinned by
    pytest and by the gate query running WITH the filter against an
    oracle that never heard of it). Size m for the seen-set cardinality;
    past the 2^27-bit literal guard, broadcast-join the words relation
    (``bloom_words_array`` docstring).

    ``broadcast_seen`` hints the exact anti-join side when the seen dim
    is small (test fixtures); at scale leave False and let AQE decide.

    The bloom branch consumes ``cand`` twice (bloom-miss stream + exact
    anti-join stream), so the tagged candidate relation is PERSISTED
    before branching — same contract as the MinHash shingle relation
    (dedup.py): pass ``unpersist_handles=[]`` to release it after your
    action. This is load-bearing twice over: (a) one compute of the
    candidate projection instead of two, and (b) a projection-collapse
    barrier — candidate URLs arrive as deep canonicalize(resolve(...))
    expression trees, and without the barrier Catalyst inlines that tree
    into every bloom hash probe, both union branches, and the aggregate
    key (~10 copies; measured 22.8 s -> 1.5 s on the gate fixture).
    """
    seen_urls = seen.select(url_col).distinct()

    def _anti(df: DataFrame) -> DataFrame:
        side = F.broadcast(seen_urls) if broadcast_seen else seen_urls
        return df.join(side, on=url_col, how="left_anti")

    if bloom_m_bits is not None:
        from .sketches import bloom_build, bloom_maybe_contains, bloom_words_array

        words = bloom_words_array(
            bloom_build(seen_urls, F.col(url_col), bloom_m_bits, bloom_k, hash_fn),
            bloom_m_bits,
        )
        maybe = bloom_maybe_contains(
            F.col(url_col), words, bloom_m_bits, bloom_k, hash_fn
        )
        tagged = cand.select(
            url_col, src_host_col, maybe.alias("_bloom_maybe")
        ).persist()
        if unpersist_handles is not None:
            unpersist_handles.append(tagged)
        new = tagged.filter(~F.col("_bloom_maybe")).unionByName(
            _anti(tagged.filter(F.col("_bloom_maybe")))
        ).drop("_bloom_maybe")
    else:
        new = _anti(cand)
    return new.groupBy(url_col).agg(
        F.countDistinct(src_host_col).cast("long").alias("n_referrers")
    )


# ---------------------------------------------------------------------------
# URL path-template mining (crawler-trap / infinite-space detection)
# ---------------------------------------------------------------------------

def url_templates(
    df: DataFrame,
    url_col: str = "url",
    min_count: int = 2,
) -> DataFrame:
    """Collapse URL paths to structural templates and count distinct
    URLs per (host, template): ``/p/482/view`` and ``/p/483/view`` are
    one template ``/p/N/view`` with n_urls=2. Templates whose distinct-
    URL count explodes are PARAMETER SPACES — calendars, session ids,
    pagination, faceted search — the classic crawler traps a frontier
    must cap per template rather than discover one URL at a time
    (Heritrix's path-ology rules and IRLbot's spam/budget work both
    gate on exactly this signal).

    Template rules, in order (order matters — a >=8-char hex run is 'H'
    BEFORE shorter digit runs become 'N'):
      1. runs of >= 8 hex chars -> 'H'   (session ids, content hashes)
      2. runs of digits         -> 'N'   (numeric ids, page numbers)
    Both are single regexp_replace passes (replace-all), exact in any
    regex engine; the host rides separately (``graph.host_of``), so the
    same path shape on different hosts stays distinct.

    Scale shape at 10^12 URLs: project (host, template, url) then ONE
    count-distinct aggregate keyed by (host, template) — map-side
    partials collapse each task's repeats of a template before the
    shuffle, and the output relation is bounded by the template
    vocabulary (tiny next to the URL space: that reduction is the whole
    point of the operator). No joins, no windows.
    """
    from .graph import host_of

    url = F.col(url_col)
    path = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/]+(/[^?#]*)?", 1)
    tmpl = F.regexp_replace(
        F.regexp_replace(path, "[0-9a-f]{8,}", "H"), "[0-9]+", "N"
    )
    return (
        df.select(
            host_of(url).alias("host"),
            tmpl.alias("template"),
            url.alias("_u"),
        )
        .groupBy("host", "template")
        .agg(F.countDistinct("_u").cast("long").alias("n_urls"))
        .filter(F.col("n_urls") >= min_count)
    )


def crawl_budget(
    hosts: DataFrame,
    host_col: str = "host",
    weight_col: str = "w",
    total_slots: int = 0,
    num_partitions: int | None = None,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """Apportion ``total_slots`` fetch slots across hosts proportionally
    to integer weights, by Hamilton's largest-remainder method — the
    standard way a crawler turns host priorities (page counts, inlink
    mass, reputation) into an integer per-host budget that sums EXACTLY
    to the fleet's slot count:

        floor_h = (D * w_h) div W       (W = sum of weights)
        rem_h   = (D * w_h) mod W
        budget  = floor_h + 1 for the R = D - sum(floor_h) hosts with
                  the largest (rem_h, then lowest host) — R < n_hosts
                  always, by sum(rem_h) = R * W.

    Everything is int64 arithmetic (caller contract: D * max(w) must fit
    int64 — true for any real crawl, D <= 10^8 slots x w <= 10^10 pages
    needs the documented D*w < 2^63 headroom check), so the plan replays
    bit-exactly in any ANSI engine; there is no float proportion anywhere.

    Returns (host_col, weight_col, budget) with sum(budget) == D (0 for
    every host when the weight mass is 0). One row per host expected
    (pre-aggregate upstream); duplicate hosts would apportion per-row.

    Scale shape: the host relation is O(hosts), not O(pages) — one
    bounded sum, then the remainder rank via the SAME two-phase
    distributed scan as chunking.pack_offsets (range-partition on the
    sort key, per-partition row_number, driver-side per-partition counts
    broadcast back as base offsets) — never a global single-partition
    window. Bounded actions: the weight sum and the tiny per-partition
    count collect.
    """
    d = int(total_slots)
    h = hosts.select(
        F.col(host_col).alias("_host"), F.col(weight_col).cast("long").alias("_w")
    )
    wsum = h.agg(F.sum("_w").alias("_s")).collect()[0]["_s"]  # bounded: 1 value
    if not wsum or wsum <= 0 or d <= 0:
        return h.select(
            F.col("_host").alias(host_col),
            F.col("_w").alias(weight_col),
            F.lit(0).cast("long").alias("budget"),
        )
    num = (F.lit(d).cast("long") * F.col("_w")).alias("_num")
    fl = F.expr(f"_num div {wsum}L").alias("_fl")
    rem = (F.col("_num") % F.lit(wsum)).alias("_rem")
    scored = h.select("_host", "_w", num).select("_host", "_w", "_num", fl, rem)
    # R = D - sum(floors): one more bounded 1-value action
    fsum = scored.agg(F.sum("_fl").alias("_t")).collect()[0]["_t"]
    r_extra = d - int(fsum)
    # two-phase distributed rank by (rem DESC, host ASC)
    parted = (
        scored.repartitionByRange(num_partitions, F.desc("_rem"), F.asc("_host"))
        if num_partitions
        else scored.repartitionByRange(F.desc("_rem"), F.asc("_host"))
    )
    parted = parted.withColumn("_pid", F.spark_partition_id()).persist()
    if unpersist_handles is not None:
        unpersist_handles.append(parted)
    counts = {
        r["_pid"]: r["_n"]
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    base, acc = {}, 0
    for pid in sorted(counts):
        base[pid] = acc
        acc += counts[pid]
    base_df = hosts.sparkSession.createDataFrame(
        [(pid, b) for pid, b in sorted(base.items())], ["_pid", "_base"]
    )
    w_rank = Window.partitionBy("_pid").orderBy(F.desc("_rem"), F.asc("_host"))
    ranked = parted.join(F.broadcast(base_df), "_pid").withColumn(
        "_rk", F.col("_base") + F.row_number().over(w_rank)
    )
    return ranked.select(
        F.col("_host").alias(host_col),
        F.col("_w").alias(weight_col),
        (
            F.col("_fl")
            + F.when(F.col("_rk") <= F.lit(r_extra), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("budget"),
    )
