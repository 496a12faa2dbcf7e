"""Cross-lingual document alignment by URL structure (CCAligned-style).

Web-scale parallel-corpus mining starts from the observation that
translated pages usually live at language-tagged variants of the same
URL (El-Kishky et al., "CCAligned: A Massive Collection of Cross-Lingual
Web-Document Pairs", EMNLP 2020 — public paper): strip language
identifiers from the URL, and pages that collapse to the same key are
translation candidates. This module is that move as pure Catalyst
expressions plus one equi-join:

* :func:`url_align_key` — deterministic language-stripped URL key, built
  ONLY from string/array builtins (``split`` / ``filter`` /
  ``array_join``) so the exact same derivation replays in ANSI SQL
  (``string_split`` / ``list_filter`` / ``array_to_string``). No
  lookaround regex (RE2 engines don't support it), no ``parse_url``
  (Spark-only).
* :func:`align_by_url` — pivot-language winner election (one min-id doc
  per key, a map-side-combinable aggregate) followed by a single
  equi-join from every other language onto the pivot winner.

Scale shape (10^12 pages): the pivot side reduces to AT MOST one row per
alignment key before the join — a hot key (site template shared by
millions of pages) costs one aggregate cell, never a quadratic pair
fan-out; the join is a plain hash equi-join on the key. Zero Python.

Reference seam: the reference's enrichment step decorates records by a
derived key (ip2location.rs); this is the same decorate-by-derived-key
shape with the key being the language-stripped URL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Segment shapes treated as language identifiers, per the CCAligned
# heuristic: a bare ISO-639-1 code ("en") or code+region with - or _
# ("en-us", "zh_cn"). Applied to lowercased URLs, so "EN-US" matches too.
# Documented cap: any two-letter path segment is treated as a language
# tag (the paper's own URL heuristic has the same false-positive shape).
_LANG_SEG_RX = "^[a-z]{2}([-_][a-z]{2})?$"

# Query parameters that carry language/locale choice rather than content.
_LANG_PARAMS = ("lang", "language", "locale", "hl", "lr")


def _seg_is_lang(seg: Column) -> Column:
    return seg.rlike(_LANG_SEG_RX)


def _param_is_lang(kv: Column) -> Column:
    key = F.split(kv, "=").getItem(0)
    return key.isin(*_LANG_PARAMS)


def url_align_key(url: Column) -> Column:
    """Language-stripped alignment key for ``url``.

    Derivation (each step a builtin that exists verbatim in ANSI SQL):

    1. lowercase; drop ``scheme://``; split off ``#fragment``.
    2. host = text before the first ``/`` (or the whole rest if no path);
       path+query = the remainder.
    3. path segments: split on ``/``, drop empty segments and segments
       matching :data:`_LANG_SEG_RX`; rejoin with ``/``.
    4. query params: split on ``&``, drop params whose key is in
       :data:`_LANG_PARAMS`; rejoin with ``&`` in original order.
    5. key = ``host + '/' + path`` (+ ``'?' + query`` when non-empty).
    """
    low = F.split(F.lower(url), "#").getItem(0)
    rest = F.element_at(F.split(low, "://"), -1)
    host = F.split(rest, "/").getItem(0)
    # substring-after-first-'/': split limit 2 keeps the remainder intact
    pathq = F.when(F.size(F.split(rest, "/", 2)) > 1, F.split(rest, "/", 2).getItem(1)).otherwise(
        F.lit("")
    )
    path = F.split(pathq, "\\?", 2).getItem(0)
    query = F.when(
        F.size(F.split(pathq, "\\?", 2)) > 1, F.split(pathq, "\\?", 2).getItem(1)
    ).otherwise(F.lit(""))
    kept_segs = F.filter(
        F.split(path, "/"), lambda s: (s != F.lit("")) & ~_seg_is_lang(s)
    )
    kept_params = F.filter(
        F.split(query, "&"), lambda kv: (kv != F.lit("")) & ~_param_is_lang(kv)
    )
    base = F.concat(host, F.lit("/"), F.array_join(kept_segs, "/"))
    return F.when(
        F.size(kept_params) > 0,
        F.concat(base, F.lit("?"), F.array_join(kept_params, "&")),
    ).otherwise(base)


def align_by_url(
    docs: DataFrame,
    url_col: str = "url",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    pivot_lang: str = "en",
) -> DataFrame:
    """Pair every non-``pivot_lang`` document with the pivot-language
    document at the same language-stripped URL.

    Returns ``(align_key, pivot_id, doc_id, lang)`` — one row per aligned
    non-pivot document. The pivot side is reduced to its min-``id_col``
    winner per key FIRST (map-side combinable ``min``), so the join can
    never produce more than one pair per non-pivot doc and a boilerplate
    key shared by millions of pivot pages costs one aggregate cell.
    """
    keyed = docs.withColumn("align_key", url_align_key(F.col(url_col)))
    pivots = (
        keyed.filter(F.col(lang_col) == pivot_lang)
        .groupBy("align_key")
        .agg(F.min(id_col).alias("pivot_id"))
    )
    others = keyed.filter(F.col(lang_col) != pivot_lang).select(
        "align_key", F.col(id_col).alias(id_col), F.col(lang_col).alias(lang_col)
    )
    return others.join(pivots, on="align_key", how="inner").select(
        "align_key", "pivot_id", id_col, lang_col
    )


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    block_col: str,
    k: int = 4,
    threshold: float = 1.0,
    src_id: str = "vec_id",
    tgt_id: str = "vec_id",
    vec_col: str = "embedding",
    unpersist_handles: list | None = None,
) -> DataFrame:
    """Margin-based bitext mining over sentence embeddings (Artetxe &
    Schwenk, "Margin-based Parallel Corpus Mining with Multilingual
    Sentence Embeddings", ACL 2019; scaled up as CCMatrix — public
    papers). For each source sentence, find the target sentence whose
    cosine stands out from BOTH sides' nearest-neighbor background:

        score(x, y) = cos(x, y) / ((mean_NNk(x) + mean_NNk(y)) / 2)

    and keep the per-source best candidate with score >= ``threshold``
    (the ratio margin; 1.0 = "better than the average neighborhood").

    ``block_col`` is REQUIRED and defines the candidate relation as an
    equi-join (LSH bucket / IVF cell at scale — exactly how CCMatrix runs
    its mining over FAISS shards; there is deliberately no |S|x|T|
    cross-join path). Neighborhood means are computed over the SAME
    candidate relation, so the whole statistic is well-defined per
    candidate set and replays exactly: vectors are unit-normalized once
    per side (aggregation barrier), each pair costs one left-fold dot,
    neighborhood means are rank-ordered left folds divided by the actual
    neighbor count, and ties break on id.

    The scored candidate relation is consumed three times (forward
    means, backward means, final join) — it is persisted; pass
    ``unpersist_handles=[]`` to release it after materializing.

    Returns ``(src_id, tgt_id, cos_sim, score)``, one row per mined pair.
    """
    from pyspark.sql.window import Window

    from .dedup import dot_product, normalized_vectors

    s = normalized_vectors(src, src_id, vec_col, extra_cols=[block_col]).select(
        F.col("_id").alias("_sid"), F.col(block_col).alias("_blk"), F.col("_nv").alias("_sv")
    )
    t = normalized_vectors(tgt, tgt_id, vec_col, extra_cols=[block_col]).select(
        F.col("_id").alias("_tid"), F.col(block_col).alias("_blk2"), F.col("_nv").alias("_tv")
    )
    scored = (
        s.join(t, on=F.col("_blk") == F.col("_blk2"))
        .select(
            "_sid",
            "_tid",
            dot_product(F.col("_sv"), F.col("_tv")).alias("cos_sim"),
        )
        .persist()
    )
    if unpersist_handles is not None:
        unpersist_handles.append(scored)

    def _nn_mean(part: str, order: str) -> DataFrame:
        w = Window.partitionBy(part).orderBy(F.desc("cos_sim"), F.asc(order))
        kept = scored.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
        return kept.groupBy(part).agg(
            (
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("_r", "cos_sim"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["cos_sim"],
                )
                / F.count(F.lit(1)).cast("double")
            ).alias(f"_m{part}")
        )

    fwd = _nn_mean("_sid", "_tid")
    bwd = _nn_mean("_tid", "_sid")
    x = (
        scored.join(fwd, on="_sid")
        .join(bwd, on="_tid")
        .select(
            "_sid",
            "_tid",
            "cos_sim",
            (
                F.col("cos_sim") / ((F.col("_m_sid") + F.col("_m_tid")) / F.lit(2.0))
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
    wbest = Window.partitionBy("_sid").orderBy(F.desc("score"), F.asc("_tid"))
    return (
        x.withColumn("_rr", F.row_number().over(wbest))
        .filter(F.col("_rr") == 1)
        .select(
            F.col("_sid").alias(src_id if src_id != tgt_id else "src_id"),
            F.col("_tid").alias(tgt_id if src_id != tgt_id else "tgt_id"),
            "cos_sim",
            "score",
        )
    )
