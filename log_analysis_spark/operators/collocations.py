"""Collocation mining: PMI-ranked adjacent word pairs over a corpus.

Surfaces the multiword expressions ("new york", "machine learning") that
matter for tokenizer vocabulary decisions, phrase-aware dedup shingles,
and corpus drift reports. The ranking statistic is the *pointwise mutual
information exponent* — the likelihood ratio

    lift(w1, w2) = p(w1, w2) / (p(w1) * p(w2))
                 = (c12 / B) / ((c1 / N) * (c2 / N))

with c12 the adjacent-bigram count, c1/c2 unigram counts, B the corpus
bigram total and N the token total. PMI itself is ``ln(lift)``; ln is
monotone, so ranking by lift IS ranking by PMI — and skipping the log
keeps the score a FIXED finite tree of IEEE-double ops over exact
integers (one division per probability, one multiply, one divide), which
replays bit-identically in any engine. A transcendental would instead
inherit the platform libm's rounding (the same reason quality.py scores
ratios, not logs).

Scale shape at 10^12 tokens:

- two explode->groupBy aggregates (unigrams, bigrams) — both map-side
  combinable, both bounded by VOCABULARY (|V| and the distinct-bigram
  count), not corpus size; the ``min_count`` cut is applied to the
  bigram relation before any join, which is what makes the join sides
  head-of-Zipf small.
- the two scalar totals (N, B) ride 1-row broadcast crossJoins — the
  whitelisted pattern from operators/selection.py (dsir_select).
- the unigram dim joins back onto the *filtered* bigram relation twice
  (w1, w2) — vocabulary-keyed hash joins; at web scale the filtered
  bigram head is small enough that both sides are dwarfed by the scan.
- nothing in the plan touches the documents table twice: tokens are
  exploded once into a persisted-free lineage reused via the two
  aggregates of one projection (Catalyst shares the scan; no action in
  between, so no persist contract is needed).

Reference scope: the reference pipeline (endepointe/log-analysis) stops
at per-key counts (``src/analysis.rs`` overview aggregation); collocation
lift is part of this repo's training-data analysis layer, same family as
functions/textstats.py top_terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import textstats as TS


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int | None = 50,
) -> DataFrame:
    """Top-``k`` adjacent word pairs by PMI lift.

    Output: (w1, w2, n_pair, lift), ordered lift DESC then (w1, w2);
    ``k=None`` returns the whole ``min_count``-filtered relation. The
    lift expression tree is documented in the module docstring and must
    not be re-parenthesized — the DuckDB oracle replays it verbatim.
    """
    toks = docs.select(TS.tokens(F.col(text_col)).alias("_t"))

    uni = toks.select(F.explode(F.col("_t")).alias("term"))
    uc = uni.groupBy("term").agg(F.count(F.lit(1)).alias("_c"))
    # N as sum of per-term counts: one extra reduce over the vocabulary
    # relation instead of a second pass over the corpus.
    nn = uc.agg(F.sum("_c").alias("_n"))

    pairs = toks.filter(F.size("_t") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_t"), 1, F.size("_t") - 1).alias("w1"),
                F.slice(F.col("_t"), 2, F.size("_t") - 1).alias("w2"),
            )
        ).alias("_p")
    ).select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    bb = pairs.agg(F.count(F.lit(1)).alias("_b"))
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    if min_count > 1:
        bc = bc.filter(F.col("n_pair") >= min_count)

    u1 = uc.select(F.col("term").alias("w1"), F.col("_c").alias("_c1"))
    u2 = uc.select(F.col("term").alias("w2"), F.col("_c").alias("_c2"))
    d = F.col  # noqa: E731 — brevity in the fixed expression tree below
    out = (
        bc.join(u1, on="w1")
        .join(u2, on="w2")
        .crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(bb))
        .select(
            "w1",
            "w2",
            "n_pair",
            (
                (d("n_pair").cast("double") / d("_b").cast("double"))
                / (
                    (d("_c1").cast("double") / d("_n").cast("double"))
                    * (d("_c2").cast("double") / d("_n").cast("double"))
                )
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
    )
    return out.limit(k) if k is not None else out
