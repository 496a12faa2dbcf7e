"""Link-graph analytics: href extraction -> host edge list -> PageRank.

The missing graph member next to ``dedup.dup_clusters`` (connected
components): PageRank (Brin & Page 1998; Page et al. 1999) is the
canonical link-authority signal a web-corpus pipeline computes per crawl
snapshot — crawl prioritization, spam down-weighting, quality priors for
training-data selection. Reference parity note: the reference pipeline
(endepointe/log-analysis) has no graph stage; this extends the same
enrich/aggregate surface its ip.db export feeds (src/ip2location.rs),
re-expressed over the web-pages domain.

Scale shape (10^12 pages -> ~10^8 hosts):

- ``extract_links`` is pure codegen (``regexp_extract_all`` over the
  decoded html column) — no Python in the hot path, pushdown-friendly.
- ``host_edges`` collapses page-level links to weighted (src, dst) HOST
  pairs before any iteration: map-side partial aggregation absorbs
  hot-host fan-out (everyone links to the same two hubs in the synth
  corpus, deliberately), so iteration state is O(host-pairs), never
  O(page-links).
- Each ``pagerank`` iteration is one join of ranks to edges on src (both
  sides hash-partitioned on the key; AQE reuses the exchange) plus one
  keyed shuffle (groupBy dst). Lineage is truncated with
  ``localCheckpoint`` every ``checkpoint_every`` iterations — the same
  discipline as ``dedup.dup_clusters``, without it the plan doubles per
  iteration.
- Determinism contract (the oracle gate): with ``deterministic=True``
  per-dst contributions are summed as a LEFT FOLD over the src-sorted
  contribution list, and each contribution is the single
  correctly-rounded expression ``(rank * w) / out_w`` — every
  intermediate is a deterministic function of the input rows, so DuckDB
  replays all iterations bit-for-bit. A plain ``sum()`` would be
  partition-order-dependent in its last ulp. The fold materializes an
  in-degree-sized list per dst (bounded by n_hosts); at 10^12 scale pass
  ``deterministic=False`` for the associative partial-agg sum — bitwise
  replay is a test-time contract, not a production need.
- Dangling hosts (no out-links) keep their teleport share and their rank
  mass leaks (the classic simplified variant); total rank then sums to
  < 1. The damping teleport term keeps every rank positive; relative
  order among non-dangling hosts is unaffected for ranking purposes.
  Redistribution would need a per-iteration global scalar (one extra
  tiny action) — deliberately omitted to keep each iteration one-pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HREF_RE = r'href="([^"]+)"'
# full anchor elements: group 1 = href target, group 2 = anchor body.
# Written in the Java-regex/RE2 common subset (inline flags, lazy .*?,
# [^<>] tag bodies) so the DuckDB oracle reuses the literal verbatim.
ANCHOR_RE = r'(?is)<a\s[^<>]*href="([^"]+)"[^<>]*>(.*?)</a>'


def host_of(url: Column) -> Column:
    """scheme://host/... -> host (ports kept; non-URLs -> empty string)."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) — one row per href anchor in the page html.

    Pure codegen: decode + regexp_extract_all + explode; rows without
    anchors vanish (explode, not explode_outer — a page with no links
    contributes no edges).
    """
    html_str = F.col(html_col).cast("string")
    return df.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.regexp_extract_all(html_str, F.lit(HREF_RE), F.lit(1))).alias(
            "dst_url"
        ),
    )


def extract_anchors(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url, anchor) — one row per ``<a href=...>`` element,
    with the anchor's visible text (inline tags stripped, whitespace
    collapsed, NOT entity-decoded — compose ``functions.html`` upstream
    for full decoding).

    Anchor text is the classic link-based relevance/label signal (what
    OTHER pages call this page) — used for quality priors and retrieval
    training pairs. Pure codegen: two ``regexp_extract_all`` passes over
    the SAME regex (so the two arrays are equal-length by construction)
    zipped and exploded; no Python, no shuffle.
    """
    h = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(1)).alias("d"),
        F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(2)).alias("r"),
    )
    out = df.select(F.col(url_col).alias("src_url"), F.explode(pairs).alias("_p"))
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("_p.r"), r"(?s)<[^<>]*>", " "), r"\s+", " "
        )
    )
    return out.select(
        "src_url", F.col("_p.d").alias("dst_url"), anchor.alias("anchor")
    )


def anchor_text_summary(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    drop_self: bool = True,
) -> DataFrame:
    """(dst, anchor, w, n_src_hosts) — per destination-HOST anchor-text
    histogram. ``n_src_hosts`` (distinct linking hosts) is the
    spam-resistance column: one host repeating an anchor a million times
    moves ``w`` but not ``n_src_hosts``. Same scale shape as
    :func:`host_edges` — map-side partials collapse the hub skew before
    the keyed aggregation; count-distinct stays a two-level agg on
    (dst, anchor, src), never a corpus-wide distinct."""
    a = extract_anchors(df, url_col, html_col).select(
        host_of(F.col("src_url")).alias("src"),
        host_of(F.col("dst_url")).alias("dst"),
        "anchor",
    )
    a = a.filter((F.col("src") != "") & (F.col("dst") != ""))
    if drop_self:
        a = a.filter(F.col("src") != F.col("dst"))
    return a.groupBy("dst", "anchor").agg(
        F.count(F.lit(1)).alias("w"),
        F.countDistinct("src").alias("n_src_hosts"),
    )


def host_edges(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    drop_self: bool = True,
) -> DataFrame:
    """Weighted host-level edge list (src, dst, w) from page html.

    Aggregates BEFORE any downstream iteration: partial aggregation
    collapses the hot-host link skew map-side, so the edge relation is
    O(host-pairs) regardless of how many pages link to the same hub.
    ``drop_self`` removes same-host navigation links (they dominate real
    pages and only feed rank back to the emitter).
    """
    links = extract_links(df, url_col, html_col).select(
        host_of(F.col("src_url")).alias("src"),
        host_of(F.col("dst_url")).alias("dst"),
    )
    links = links.filter((F.col("src") != "") & (F.col("dst") != ""))
    if drop_self:
        links = links.filter(F.col("src") != F.col("dst"))
    return links.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "w",
    iters: int = 5,
    damping: float = 0.85,
    deterministic: bool = True,
    checkpoint_every: int = 3,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """(node, rank) after ``iters`` fixed power iterations.

    rank'(v) = (1-d)/N + d * sum_{u->v} rank(u) * w(u,v) / out_w(u)

    Fixed iteration count (not tolerance-based) so a replay — including
    the DuckDB oracle — runs the identical computation; see the module
    docstring for the determinism and dangling-mass contracts. One
    bounded action up front (N = distinct node count); each iteration is
    one src-keyed join + one dst-keyed aggregation.
    """
    if weight is None:
        edges = edges.select(src, dst).withColumn("_w", F.lit(1).cast("long"))
    else:
        edges = edges.select(src, dst, F.col(weight).cast("long").alias("_w"))

    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded action: node count only
    if n == 0:
        return nodes.withColumn("rank", F.lit(None).cast("double"))

    out_w = edges.groupBy(src).agg(F.sum("_w").alias("_ow"))
    # contribution fraction is fixed across iterations — compute once
    ew = (
        edges.join(out_w, on=src)
        .select(
            F.col(src).alias("_src"),
            F.col(dst).alias("_dst"),
            F.col("_w"),
            F.col("_ow"),
        )
        .persist()
    )
    ew.count()  # materialize once; every iteration re-reads the cache

    teleport = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))

    for i in range(iters):
        contribs = ew.join(
            ranks, on=ew["_src"] == ranks["node"], how="inner"
        ).select(
            F.col("_dst").alias("node"),
            F.col("_src").alias("_from"),
            (
                (F.col("rank") * F.col("_w").cast("double"))
                / F.col("_ow").cast("double")
            ).alias("_c"),
        )
        if deterministic:
            summed = contribs.groupBy("node").agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("_from", "_c"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["_c"],
                ).alias("_s")
            )
        else:
            summed = contribs.groupBy("node").agg(F.sum("_c").alias("_s"))
        new_ranks = nodes.join(summed, on="node", how="left").select(
            "node",
            (
                F.lit(teleport) + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks

    if unpersist_handles is not None:
        # same seam as dedup.minhash_lsh_pairs: caller releases the two
        # persisted relations after consuming the result
        unpersist_handles.extend([nodes, ew])
    return ranks


def host_pagerank(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    iters: int = 5,
    damping: float = 0.85,
    deterministic: bool = False,
) -> DataFrame:
    """End-to-end: page html -> host edges -> (host, rank)."""
    return pagerank(
        host_edges(pages, url_col, html_col),
        iters=iters,
        damping=damping,
        deterministic=deterministic,
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "w",
    iters: int = 5,
    damping: float = 0.85,
    deterministic: bool = True,
    checkpoint_every: int = 3,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """(node, trust) after ``iters`` biased power iterations (Gyöngyi,
    Garcia-Molina, Pedersen 2004, "Combating Web Spam with TrustRank").

    trust'(v) = (1-d) * t(v) + d * sum_{u->v} trust(u) * w(u,v) / out_w(u)

    Identical recurrence to :func:`pagerank` except the teleport vector:
    t(v) = 1/|S| for the trusted seed nodes S (``seeds`` intersected
    with the graph's node set), 0 everywhere else, and trust STARTS at t
    (the paper's biased initialization) — so mass reaches a page only
    through link paths from the trusted set, and spam farms that earn
    uniform-teleport PageRank score near-zero trust. The web-spam use:
    seed with a human-audited host whitelist, flag hosts whose
    PageRank/TrustRank ratio is large.

    Same contracts as :func:`pagerank`: pre-aggregated edge relation,
    fixed iteration count (oracle-replayable), ``deterministic=True``
    folds contributions in src-sorted order, lineage truncated every
    ``checkpoint_every`` iterations. Dangling-node mass decays (no
    redistribution) exactly as in :func:`pagerank`.

    Scale shape: the seed relation is human-curated (10^2..10^5 rows) —
    it broadcasts onto the node relation once to build the teleport
    column; each iteration is the same one src-keyed join + one
    dst-keyed aggregation as pagerank. Bounded action: one count of the
    in-graph seed set. Seeds with no presence in the graph are ignored;
    an empty intersection yields all-zero trust (documented — the
    caller picked seeds outside the crawl).
    """
    if weight is None:
        edges = edges.select(src, dst).withColumn("_w", F.lit(1).cast("long"))
    else:
        edges = edges.select(src, dst, F.col(weight).cast("long").alias("_w"))

    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    seed_nodes = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    in_graph = seed_nodes.join(nodes, "node")
    k = in_graph.count()  # bounded action: curated-seed-set size
    tnodes = (
        nodes.join(
            F.broadcast(in_graph.withColumn("_hit", F.lit(1))), "node", "left"
        )
        .select(
            "node",
            F.when(F.col("_hit").isNotNull(), F.lit(1.0 / k if k else 0.0))
            .otherwise(F.lit(0.0))
            .alias("_t"),
        )
        .persist()
    )
    tnodes.count()  # materialize once; every iteration re-reads the cache

    out_w = edges.groupBy(src).agg(F.sum("_w").alias("_ow"))
    ew = (
        edges.join(out_w, on=src)
        .select(
            F.col(src).alias("_src"),
            F.col(dst).alias("_dst"),
            F.col("_w"),
            F.col("_ow"),
        )
        .persist()
    )
    ew.count()

    one_minus_d = 1.0 - damping
    ranks = tnodes.select("node", F.col("_t").alias("trust"))

    for i in range(iters):
        contribs = ew.join(
            ranks, on=ew["_src"] == ranks["node"], how="inner"
        ).select(
            F.col("_dst").alias("node"),
            F.col("_src").alias("_from"),
            (
                (F.col("trust") * F.col("_w").cast("double"))
                / F.col("_ow").cast("double")
            ).alias("_c"),
        )
        if deterministic:
            summed = contribs.groupBy("node").agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("_from", "_c"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["_c"],
                ).alias("_s")
            )
        else:
            summed = contribs.groupBy("node").agg(F.sum("_c").alias("_s"))
        new_ranks = tnodes.join(summed, on="node", how="left").select(
            "node",
            (
                F.lit(one_minus_d) * F.col("_t")
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
            ).alias("trust"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            new_ranks = new_ranks.localCheckpoint(eager=True)
        ranks = new_ranks

    if unpersist_handles is not None:
        unpersist_handles.extend([tnodes, ew])
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "w",
    iters: int = 5,
    deterministic: bool = True,
    checkpoint_every: int = 3,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """(node, hub, auth) after ``iters`` HITS iterations (Kleinberg 1999).

    hub'(u)  = sum_{u->v} w(u,v) * auth(v)   then hub  := hub / max(hub)
    auth'(v) = sum_{u->v} w(u,v) * hub(u)    then auth := auth / max(auth)

    Normalization is L-infinity (divide by the max score), NOT the
    textbook L2: max over doubles is exact and order-independent, and
    one division is a single correctly-rounded op — so the whole
    iteration replays bit-for-bit in the DuckDB oracle, where an L2 norm
    (sqrt of a float sum) would pin the last ulp to summation order and
    libm. The ranking and the fixed point direction are identical under
    any p-norm; only the scale of the scores differs.

    Same contracts as :func:`pagerank`: pre-aggregated edge relation
    (one row per (src, dst) — ``host_edges`` output shape; duplicate
    pairs would make the deterministic fold's sort order ambiguous),
    fixed iteration count, ``deterministic=True`` sums contributions as
    a left fold over the counterpart-sorted list (test-time contract;
    pass False at production scale for the associative partial-agg sum),
    lineage truncated every ``checkpoint_every`` iterations. The two
    1-row max relations ride whitelisted broadcast crossJoins (the
    dsir_select pattern). Nodes with no out-edges have hub 0; no
    in-edges, auth 0; an empty edge relation yields an empty result.
    """
    if weight is None:
        edges = edges.select(src, dst).withColumn("_w", F.lit(1).cast("long"))
    else:
        edges = edges.select(src, dst, F.col(weight).cast("long").alias("_w"))
    ew = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), "_w"
    ).persist()
    nodes = (
        ew.select(F.col("_src").alias("node"))
        .union(ew.select(F.col("_dst").alias("node")))
        .distinct()
        .persist()
    )

    def _fold_sum(contribs: DataFrame, key: str, other: str) -> DataFrame:
        """sum(_c) per key — ordered left fold in deterministic mode."""
        if deterministic:
            return contribs.groupBy(key).agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct(other, "_c"))),
                    F.lit(0.0),
                    lambda acc, s: acc + s["_c"],
                ).alias("_s")
            )
        return contribs.groupBy(key).agg(F.sum("_c").alias("_s"))

    def _linf_normalize(raw: DataFrame, out_col: str) -> DataFrame:
        """nodes left-join raw, divide by max(_s); all-zero-safe."""
        mx = raw.agg(F.max("_s").alias("_m"))
        return (
            nodes.join(raw.withColumnRenamed(raw.columns[0], "node"), "node", "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.coalesce(
                    F.col("_s") / F.nullif(F.col("_m"), F.lit(0.0)), F.lit(0.0)
                ).alias(out_col),
            )
        )

    auth = nodes.select("node", F.lit(1.0).alias("auth"))
    hub = None
    for i in range(iters):
        hc = ew.join(auth, on=ew["_dst"] == auth["node"]).select(
            "_src", "_dst", (F.col("auth") * F.col("_w").cast("double")).alias("_c")
        )
        hub = _linf_normalize(_fold_sum(hc, "_src", "_dst"), "hub")
        ac = ew.join(hub, on=ew["_src"] == hub["node"]).select(
            "_dst", "_src", (F.col("hub") * F.col("_w").cast("double")).alias("_c")
        )
        auth = _linf_normalize(_fold_sum(ac, "_dst", "_src"), "auth")
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            hub = hub.localCheckpoint(eager=True)
            auth = auth.localCheckpoint(eager=True)

    out = hub.join(auth, on="node")
    if unpersist_handles is not None:
        unpersist_handles.extend([nodes, ew])
    return out
