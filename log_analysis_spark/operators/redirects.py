"""Redirect-chain resolution by pointer jumping.

A crawl snapshot carries HTTP 3xx results as (url, redirect_to) edges; a
curation pipeline must resolve every fetched URL to its terminal target
(to credit content to the canonical location, merge fetch stats, and
drop infinite redirect loops). The reference pipeline has no redirect
stage (out of its Zeek scope); this extends the crawl-side operator
family (robots.py, frontier.py, sitemap.py).

Algorithm: pointer jumping (path doubling) over the functional graph —
each state row is ``(url, cur, hops, done)`` where ``cur`` is the node
exactly ``hops`` redirects downstream of ``url``. One iteration joins
the state against itself on ``cur = url``, composing each pointer with
its target's pointer, so covered distance doubles per iteration:
``ceil(log2(max_hops))`` keyed self-joins resolve every chain of length
<= ``max_hops`` with its EXACT hop count (a done row's ``(cur, hops)``
is final, so later compositions add its exact remaining distance).
Cycles and over-long chains never produce a terminal row and surface as
``unresolved`` — no driver-side cycle hunting.

Scale: the state table has one row per REDIRECTING url (~10^11 * the
redirect fraction), each iteration is one hash-partitioned equi-join of
the state with itself — log2(32) = 5 shuffles total, each O(state), and
the corpus of non-redirect URLs is never touched. Contrast the naive
follow-one-hop loop: ``max_hops`` iterations instead of ``log2``.

Determinism/oracle: duplicate source urls collapse to ``min(dst)`` at
entry (a crawl can record the same url redirecting differently across
fetches; min is an order-free tie-break), after which the graph is
functional and the result is unique — the DuckDB oracle replays it with
a step-by-step recursive CTE capped at ``max_hops``, a completely
different formulation that must land on identical rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "url",
    dst_col: str = "redirect_to",
    max_hops: int = 32,
) -> DataFrame:
    """Resolve each redirecting url to its terminal target.

    Returns one row per distinct source url: ``(url, final_url, n_hops,
    unresolved)``. ``final_url``/``n_hops`` are NULL and ``unresolved``
    true when the chain loops or exceeds ``max_hops``.
    """
    e = (
        edges.select(F.col(src_col).alias("url"), F.col(dst_col).alias("_dst"))
        .groupBy("url")
        .agg(F.min("_dst").alias("cur"))
    )
    # done = cur is terminal (no outgoing edge). Not-done rows always
    # have cur present as a state key, so the jump join below matches.
    srcs = e.select(F.col("url").alias("_s")).distinct()
    state = (
        e.join(srcs, e["cur"] == srcs["_s"], "left")
        .select(
            "url",
            "cur",
            F.lit(1).cast("long").alias("hops"),
            F.col("_s").isNull().alias("done"),
        )
    )
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        j = state.select(
            F.col("url").alias("_ju"),
            F.col("cur").alias("_jc"),
            F.col("hops").alias("_jh"),
            F.col("done").alias("_jd"),
        )
        state = (
            state.join(j, state["cur"] == j["_ju"], "left")
            .select(
                "url",
                F.when(F.col("done"), F.col("cur")).otherwise(F.col("_jc")).alias("cur"),
                F.when(F.col("done"), F.col("hops"))
                .otherwise(F.col("hops") + F.col("_jh"))
                .alias("hops"),
                F.when(F.col("done"), F.lit(True)).otherwise(F.col("_jd")).alias("done"),
            )
            .localCheckpoint(eager=False)
        )
    ok = F.col("done") & (F.col("hops") <= F.lit(max_hops))
    return state.select(
        "url",
        F.when(ok, F.col("cur")).alias("final_url"),
        F.when(ok, F.col("hops")).alias("n_hops"),
        (~ok).alias("unresolved"),
    )
