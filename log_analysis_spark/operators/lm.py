"""Distributed n-gram language-model scoring: Stupid Backoff.

Brants et al. 2007 ("Large Language Models in Machine Translation")
introduced Stupid Backoff as THE n-gram smoothing for MapReduce-scale
corpora: no discounting, no normalization pass — the score of a word in
context is a raw count ratio, backing off one order (times a fixed
penalty alpha = 0.4) whenever the longer n-gram is unseen:

    S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)        if c(w1 w2 w3) > 0
                  = alpha * S(w3 | w2)             otherwise
    S(w3 | w2)    = c(w2 w3) / c(w2)               if c(w2 w3) > 0
                  = alpha * S(w3)                  otherwise
    S(w3)         = c(w3) / N          (OOV words contribute 0)

The training side is exactly three map-side-combinable aggregates
(unigram / bigram / trigram counts) — the reason the scheme scales where
Kneser-Ney's cross-order statistics don't. The serving side is Brants'
"distributed LM": the scored corpus shuffles to the gram tables by gram
key (an equi-join), never the reverse; the model is NOT broadcast
because at web scale the trigram relation is corpus-sized. CCNet-style
use (Wenzek et al. 2020): train on a clean reference corpus, score the
crawl, drop the tail.

Per-document score: the ARITHMETIC MEAN of per-position scores, under
the repo's bit-exact replay contract (quality.char_bigram_scores sets
the precedent): every branch is a fixed tree of correctly-rounded IEEE
ops (one division, zero/one/two multiplies by the 0.4 literal), the
per-document sum folds in POSITION order, and the final mean is one
division. log-perplexity is deliberately not used — ln() is not required
to be correctly rounded, so it can differ between the JVM and another
engine in the last ulp and break replay. The mean of S values keeps the
same gibberish-vs-fluent separation at fixed document length.

Position handling: position 1 scores with the unigram ratio and
position 2 with the bigram chain — each position's MAXIMAL available
context starts the chain unpenalized; alpha applies only to actual
backoffs, per the paper. Documents with zero tokens produce no output
row (there is nothing to score).

Scale shape at 10^12 tokens: the score of a position depends ONLY on
its (w1, w2, w3) key, so the corpus-sized exploded relation never joins
the gram tables directly. Instead the DISTINCT key relation (Zipf-
bounded — the set of trigram types in the scored text, orders of
magnitude smaller than the token stream) takes the five gram-table
joins, producing a per-key score relation, and the corpus joins back
ONCE on the (null-safe) key. Corpus-sized shuffles: the distinct's
map-side-combined partial (per-partition key sets, not tokens), the
key join-back, and the per-document regroup — versus five full probe
shuffles in the naive shape. Hot function-word grams skew the join-back
probe side and AQE skew-join splitting handles them like every hot-key
join in this repo. The per-document regroup carries one (pos, double)
pair per token — the same order of bytes as the tokenized text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import tokens

ALPHA = 0.4  # the paper's backoff penalty; "stupid" because it's constant


def _positional_grams(t):
    """(pos, w1, w2, w3) structs for every position of token array ``t``;
    w1/w2 null where the context window crosses the document start."""
    return F.when(
        F.size(t) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size(t)),
            lambda i: F.struct(
                i.alias("pos"),
                F.when(i >= 3, F.element_at(t, i - 2)).alias("w1"),
                F.when(i >= 2, F.element_at(t, i - 1)).alias("w2"),
                F.element_at(t, i).alias("w3"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<pos:int,w1:string,w2:string,w3:string>>")
    )


def stupid_backoff_model(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> dict[str, DataFrame]:
    """Train the three gram-count relations over ``df``'s text.

    Returns ``{"uni": (w, c1), "bi": (wa, wb, c2), "tri": (w1, w2, w3,
    c3), "n": 1-row (_n)}``. ``min_count`` prunes trigrams below the
    threshold (the MapReduce-LM entropy-pruning analogue) — pruned
    trigrams back off at score time, exactly as unseen ones do.
    """
    # Spread the CPU-bound tokenize+explode across all cores: a small
    # training corpus can arrive as one scan split (one file / one row
    # group), which would serialize the whole gram count on one task.
    # The shuffle moves only the raw text bytes — trivial next to the
    # exploded gram stream it unlocks parallelism for.
    t = df.select(tokens(F.col(text_col)).alias("_t")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    uni = (
        t.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    n = uni.agg(F.sum("c1").alias("_n"))
    bi = (
        t.filter(F.size("_t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_t"), 1, F.size("_t") - 1).alias("wa"),
                    F.slice(F.col("_t"), 2, F.size("_t") - 1).alias("wb"),
                )
            ).alias("_p")
        )
        .groupBy(F.col("_p.wa").alias("wa"), F.col("_p.wb").alias("wb"))
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    tri = (
        t.filter(F.size("_t") >= 3)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_t"), 1, F.size("_t") - 2).alias("w1"),
                    F.slice(F.col("_t"), 2, F.size("_t") - 2).alias("w2"),
                    F.slice(F.col("_t"), 3, F.size("_t") - 2).alias("w3"),
                )
            ).alias("_p")
        )
        .groupBy(
            F.col("_p.w1").alias("w1"),
            F.col("_p.w2").alias("w2"),
            F.col("_p.w3").alias("w3"),
        )
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    if min_count > 1:
        tri = tri.filter(F.col("c3") >= min_count)
    return {"uni": uni, "bi": bi, "tri": tri, "n": n}


def stupid_backoff_scores(
    docs: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, sb_score) — mean Stupid Backoff score per document
    under ``model`` (from :func:`stupid_backoff_model`). The expression
    tree below is the replay contract — do not re-parenthesize."""
    a = F.lit(ALPHA)
    pos = (
        docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_tx"))
        # Same small-scan parallelization as training (see
        # stupid_backoff_model): tokenization + the positional-gram
        # explode are the CPU hot path and must not ride one scan split.
        .repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select(
            "_id",
            F.explode(_positional_grams(tokens(F.col("_tx")))).alias("_g"),
        )
        .select("_id", "_g.pos", "_g.w1", "_g.w2", "_g.w3")
    )

    tri = model["tri"]
    b12 = model["bi"].select(
        F.col("wa").alias("w1"), F.col("wb").alias("w2"), F.col("c2").alias("c12")
    )
    b23 = model["bi"].select(
        F.col("wa").alias("w2"), F.col("wb").alias("w3"), F.col("c2").alias("c23")
    )
    u2 = model["uni"].select(F.col("w").alias("w2"), F.col("c1").alias("cw2"))
    u3 = model["uni"].select(F.col("w").alias("w3"), F.col("c1").alias("cw3"))

    # Distinct-key scoring (Brants' distributed-LM shape, sharpened): the
    # score is a pure function of the (w1, w2, w3) key, so only the
    # Zipf-bounded key vocabulary visits the gram tables; the corpus-sized
    # position relation joins back once. Values are bit-identical to the
    # naive five-join plan — same expression tree over the same counts.
    keys = pos.select("w1", "w2", "w3").distinct()
    j = (
        keys.join(tri, ["w1", "w2", "w3"], "left")
        .join(b12, ["w1", "w2"], "left")
        .join(b23, ["w2", "w3"], "left")
        .join(u2, ["w2"], "left")
        .join(u3, ["w3"], "left")
        .crossJoin(F.broadcast(model["n"]))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    unig = F.coalesce(F.col("cw3"), F.lit(0)).cast("double") / d("_n")
    bigr = d("c23") / d("cw2")
    score = (
        F.when(F.col("c3").isNotNull(), d("c3") / d("c12"))
        .when(
            F.col("w1").isNotNull(),  # pos >= 3, trigram unseen -> back off
            F.when(F.col("c23").isNotNull(), a * bigr).otherwise((a * a) * unig),
        )
        .when(
            F.col("w2").isNotNull(),  # pos == 2: bigram is the maximal context
            F.when(F.col("c23").isNotNull(), bigr).otherwise(a * unig),
        )
        .otherwise(unig)  # pos == 1
    )
    kscore = j.select("w1", "w2", "w3", score.alias("_p"))
    # Null-safe equi-join: w1/w2 are NULL at positions 1-2 by construction
    # and <=> keys still plan as hash-join keys in Catalyst.
    scored = pos.alias("p").join(
        kscore.alias("k"),
        F.col("p.w1").eqNullSafe(F.col("k.w1"))
        & F.col("p.w2").eqNullSafe(F.col("k.w2"))
        & (F.col("p.w3") == F.col("k.w3")),
    )
    per_doc = (
        scored.select("p._id", "p.pos", F.col("k._p").alias("_p"))
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "_p"))).alias("_pp"))
    )
    fold = F.aggregate(
        F.transform("_pp", lambda s: s["_p"]),
        F.lit(0.0).cast("double"),
        lambda acc, p: acc + p,
    )
    return per_doc.select(
        F.col("_id").alias(id_col),
        F.size("_pp").cast("long").alias("n_tokens"),
        (fold / F.size("_pp").cast("double")).alias("sb_score"),
    )


def perplexity_buckets(
    docs: DataFrame,
    model: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    n_bins: int = 1000,
) -> DataFrame:
    """CCNet-style head/middle/tail quality buckets per language.

    Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data") partition each language's crawl into
    perplexity terciles under a clean reference LM — "head" (most
    fluent) feeds training, "tail" is dropped. This is that operator
    over the repo's Stupid Backoff scorer (higher ``sb_score`` = more
    fluent, so head = the TOP score tercile).

    Cutoffs are computed on a BINNED score histogram, not an exact sort:
    every per-position Stupid Backoff score is a count ratio in [0, 1]
    (c(w1w2w3) <= c(w1w2), c(w2w3) <= c(w2), c(w3) <= N; alpha only
    shrinks), hence the per-document mean is in [0, 1]; bin =
    min(floor(score * n_bins), n_bins - 1) is one correctly-rounded IEEE
    multiply + an exact floor, so the binning replays bit-for-bit in any
    engine. The per-(lang, bin) histogram is BOUNDED (|langs| * n_bins
    rows); tercile assignment is pure integer arithmetic on its
    cumulative counts (bin b is tail iff 3 * cum(b) <= n, middle iff
    3 * cum(b) <= 2n, else head) — all documents sharing a bin share a
    bucket, the documented tie rule. CCNet itself quantizes cutoffs the
    same way (published per-lang cutoff tables, not per-doc ranks).

    Returns (id, lang, n_tokens, sb_score, bucket).

    Scale shape at 10^12 docs: scoring is :func:`stupid_backoff_scores`'s
    gram-key shuffles; the lang attach is one id-keyed equi-join; the
    histogram is one map-side-combinable groupBy collapsing to a bounded
    relation; the cumulative window runs over that bounded relation
    (partitioned by lang); the bucket map broadcasts back. No extra
    corpus-sized shuffle beyond the id join.
    """
    from pyspark.sql.window import Window

    scores = stupid_backoff_scores(docs, model, id_col=id_col, text_col=text_col)
    scored = scores.join(
        docs.select(F.col(id_col), F.col(lang_col)), id_col
    ).withColumn(
        "_bin",
        F.least(
            F.floor(F.col("sb_score") * F.lit(float(n_bins))),
            F.lit(n_bins - 1).cast("long"),
        ),
    )
    hist = scored.groupBy(lang_col, "_bin").agg(F.count(F.lit(1)).alias("_c"))
    wl = Window.partitionBy(lang_col)
    cum = hist.select(
        lang_col,
        "_bin",
        F.sum("_c").over(wl.orderBy("_bin")).alias("_cum"),
        F.sum("_c").over(wl).alias("_n"),
    )
    buckets = cum.select(
        lang_col,
        "_bin",
        F.when(F.lit(3) * F.col("_cum") <= F.col("_n"), F.lit("tail"))
        .when(F.lit(3) * F.col("_cum") <= F.lit(2) * F.col("_n"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("bucket"),
    )
    return scored.join(F.broadcast(buckets), [lang_col, "_bin"]).select(
        id_col, lang_col, "n_tokens", "sb_score", "bucket"
    )
