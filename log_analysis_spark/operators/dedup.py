"""Deduplication operators for web-scale corpora.

The reference's only dedup is first-seen-wins on distinct IPs
(/root/reference/src/main.rs:321-330). A 100 TB training-data pipeline needs
document dedup as a first-class stage; this module provides the standard
ladder, each expressed with native DataFrame ops (no Python UDFs — the
hashing/banding/verification all run in whole-stage codegen):

- exact dedup          — md5 groupBy, keep min-id
- n-gram Jaccard       — blocked self-join + exact set similarity
- MinHash + LSH        — signature -> bands -> bucket join -> exact verify
  (Broder, "On the resemblance and containment of documents", 1997; banding
  per Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch.3)
- SimHash              — 64-bit sign fingerprint, banded hamming candidates
  (Charikar, "Similarity estimation techniques from rounding algorithms",
  STOC 2002; chunk-pigeonhole candidates per Manku et al., WWW 2007)
- embedding near-dup   — cosine over ``array<float>``, LSH-bucketed
  (random-hyperplane LSH, Charikar 2002)

Scale design: every candidate-generation step is a hash-partitioned
bucket join (shuffle on bucket key, never a cross join); verification only
touches candidate pairs. ANSI-safe arithmetic throughout (inputs reduced
mod 2^31-1 before multiply so products stay < 2^62).

Projection-collapse lesson (why signatures are DataFrame-shaped, not a
single Column): an expensive Column expression (tokenize -> hash -> 64
affine mins) gets RE-INLINED by Catalyst's CollapseProject into every
downstream reference — a signature Column referenced by 16 band keys
re-tokenizes 16 times. The fix is an aggregation/shuffle barrier: hash the
shingles once into a materialized (persisted) relation
(``_hashed_shingle_sets``) and derive signatures from it
(``_signatures_from_sets``). A round-2 ``minhash_signature(text)`` Column
API existed and was deleted for exactly this trap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import shingles, tokens

MERSENNE = 2147483647  # 2^31-1


def md5_hash60(col: Column) -> Column:
    """60-bit hash from the first 15 hex digits of md5 — the cross-engine
    base hash: DuckDB replays it exactly (hex-digit left fold over
    ``substring(md5(x),1,15)``), unlike xxhash64 which DuckDB lacks. Used by
    the oracle-checked sketch variants; xxhash64 stays the scale default
    (no hex round-trip, full 64 bits)."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast("long")


def _base_hash(col: Column, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return md5_hash60(col)
    raise ValueError(f"unknown hash_fn {hash_fn!r} (want 'xxhash64' or 'md5')")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row per exact text (min id wins). Returns survivor ids +
    group size. Partial aggregation collapses duplicates map-side, so the
    shuffle carries one row per distinct hash regardless of dup skew."""
    return (
        df.select(F.col(id_col), F.md5(F.encode(F.col(text_col), "UTF-8")).alias("h"))
        .groupBy("h")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Only groups with >1 member (the duplicates report)."""
    return exact_dedup(df, id_col, text_col).filter(F.col("group_size") > 1)


def _jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two arrays (as sets). int/int IEEE division."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def shingle_hash_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    extra_cols: list[str] | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, [extra...], _h: int64) — one row per word-n-gram occurrence.

    Tokenizes ONCE per document (posexplode), then forms n-grams with
    ``lead()`` windows over token position. The Column-expression
    ``textstats.shingles`` is correct but re-evaluates the full
    split/trim/filter tokenization for every ``element_at`` reference —
    O(tokens x n) re-splits per document (measured: 12s to shingle 5k docs
    vs ~1s this way). int64 hashes because downstream set ops over longs
    are ~5x cheaper than over strings (collisions ~1e-13 per doc set, and
    Jaccard uses only set sizes).

    The window shuffle is keyed by id — linear, partial-agg-free but
    skew-safe (a document's tokens land on one reducer; documents are
    bounded).
    """
    from pyspark.sql.window import Window

    extra_cols = extra_cols or []
    toks = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in extra_cols],
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_tok"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    parts = [F.col("_tok").alias("_t0")] + [
        F.lead("_tok", j).over(w).alias(f"_t{j}") for j in range(1, n)
    ]
    grams = toks.select("_id", *extra_cols, *parts).filter(
        F.col(f"_t{n - 1}").isNotNull()
    )
    return grams.select(
        "_id",
        *extra_cols,
        _base_hash(F.concat_ws(" ", *[F.col(f"_t{j}") for j in range(n)]), hash_fn).alias("_h"),
    )


def _hashed_shingle_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    extra_cols: list[str] | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, [extra...], _sh: array<long>) — distinct shingle-hash sets,
    materialized through a REAL aggregation.

    collect_set (not a Column expression) on purpose: a mere
    ``repartition`` barrier does NOT stop projection collapse (Catalyst
    pulls a Project through a Repartition that doesn't reference its
    columns), after which the whole shingle pipeline is re-evaluated per
    joined PAIR — measured 1.4 ms/pair vs ~4 us/pair for the set ops
    themselves. An aggregate consumes the expression at its input, so
    downstream sees data.
    """
    rows = shingle_hash_rows(df, id_col, text_col, n, extra_cols, hash_fn)
    return rows.groupBy("_id", *(extra_cols or [])).agg(F.collect_set("_h").alias("_sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard over pairs sharing a blocking key.

    The block key bounds the join (hash-partitioned equi-join, never a
    cross product); at 10^12 docs the block would be an LSH band (see
    ``minhash_lsh_pairs``) — this exact variant is the verification oracle.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    sh = _hashed_shingle_sets(
        df.withColumnRenamed(block_col, "_blk") if block_col != "_blk" else df,
        id_col, text_col, n, extra_cols=["_blk"],
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(b, on=[F.col("a._blk") == F.col("b._blk"), F.col("a._id") < F.col("b._id")])
    return (
        pairs.select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            _jaccard(F.col("a._sh"), F.col("b._sh")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    hash_fn: str = "xxhash64",
    unpersist_handles: list | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join by prefix filtering (Xiao et al.
    2008, PPJoin; Chaudhuri et al. 2006, SSJoin) — the exact-recall
    counterpart to :func:`minhash_lsh_pairs`: every pair with word-
    n-gram Jaccard >= ``threshold`` is returned, with NO probabilistic
    misses and NO caller-supplied block key.

    The prefix principle: order every document's shingle-hash set by a
    single GLOBAL canonical order (document frequency ascending, hash
    ascending — rarest first), and index only each set's first
    ``n_i - ceil(t * n_i) + 1`` elements. Any pair with J >= t has
    overlap >= ceil(t * max(|A|,|B|)), which forces at least one shared
    element inside BOTH prefixes — so the equi-join on prefix tokens has
    full recall, and exact Jaccard runs on candidates only.

    Why this scales where a full posting join cannot: the prefix keeps
    each document's RAREST tokens, so posting lists of hot boilerplate
    shingles (the skew that kills naive token joins) are excluded from
    the index by construction unless a document consists of nothing
    else; residual skew falls to AQE. Cost: one df-count aggregate, one
    per-document rank (window keyed by the document — parallel), an
    equi-join on rare tokens, exact verify on candidates. The shingle-set
    relation persists once (candidate gen + verify both read it; caller
    releases via ``unpersist_handles`` — minhash precedent).

    Output: (id_a, id_b, jaccard), id_a < id_b, jaccard >= threshold —
    the same contract as :func:`ngram_jaccard_pairs`, which remains the
    blocked variant for when a trusted block key exists.
    """
    from pyspark.sql.window import Window

    sh = _hashed_shingle_sets(df, id_col, text_col, n, hash_fn=hash_fn).persist()
    if unpersist_handles is not None:
        unpersist_handles.append(sh)
    rows = sh.select(
        "_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_h")
    )
    dfreq = rows.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    ranked = rows.join(dfreq, "_h").withColumn(
        "_r",
        F.row_number().over(Window.partitionBy("_id").orderBy("_df", "_h")),
    )
    plen = F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
    prefix = ranked.filter(F.col("_r") <= plen).select("_id", "_h")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            on=[F.col("a._h") == F.col("b._h"), F.col("a._id") < F.col("b._id")],
        )
        .select(F.col("a._id").alias("_ia"), F.col("b._id").alias("_ib"))
        .distinct()
    )
    sa = sh.select(F.col("_id").alias("_ia"), F.col("_sh").alias("_sha"))
    sb = sh.select(F.col("_id").alias("_ib"), F.col("_sh").alias("_shb"))
    return (
        cand.join(sa, "_ia")
        .join(sb, "_ib")
        .select(
            F.col("_ia").alias("id_a"),
            F.col("_ib").alias("id_b"),
            _jaccard(F.col("_sha"), F.col("_shb")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    max_dist: int = 1,
    q: int = 2,
) -> DataFrame:
    """EXACT edit-distance self-join by q-gram prefix filtering (Ed-Join,
    Xiao, Wang & Lin 2008; count filter from Gravano et al. 2001): every
    DISTINCT string pair with levenshtein <= ``max_dist`` is returned —
    full recall, no block key. The fuzzy-matching workhorse: lookalike /
    typosquatting domain detection, entity resolution on names and titles.

    Pigeonhole: one edit destroys at most ``q`` of a string's padded
    q-grams, so ed <= d leaves at most d*q of A's distinct grams missing
    from B. Order every string's gram set by ONE global canonical order
    (document frequency ascending, gram ascending — rarest first) and index
    only the first d*q + 1 grams: any qualifying pair must share a gram
    inside BOTH prefixes, so the equi-join on prefix grams has full recall
    (pinned in pytest against unblocked all-pairs, and by the gate's
    cross-algorithm oracle). Exact ``levenshtein`` runs on candidates only,
    after the |len(a)-len(b)| <= d length filter.

    Scale: the prefix keeps each string's RAREST grams, so hot-gram posting
    lists (every '.com' suffix gram) never enter the candidate index unless
    a string consists of nothing else — the same skew-safety argument as
    :func:`prefix_jaccard_pairs`. One gram-frequency aggregate, one
    per-string rank window, a rare-gram equi-join, O(candidates) verify.

    Strings are padded with q-1 '#' on each side (standard boundary
    q-grams) so end-of-string edits are counted and len >= 1 strings always
    have grams; '#' must not occur in the data (true for hostnames/URLs).

    Short-string completeness: the shared-prefix guarantee needs
    max(|grams(a)|, |grams(b)|) > d*q (overlap >= max - d*q must be >= 1).
    Pairs where BOTH sides have <= d*q distinct grams (strings of a few
    characters, or degenerate single-char repeats) get a second candidate
    channel: an equi-join of the short strings on a length band (each short
    row fans to its 2d+1 admissible peer lengths — still no cross join, and
    the short set is tiny by construction: |grams| <= d*q bounds length
    except for degenerate repeats).

    Output: (str_a, str_b, dist), str_a < str_b, dist <= max_dist.
    """
    from pyspark.sql.window import Window

    pad = "#" * (q - 1)
    grams = F.expr(
        f"array_distinct(transform(sequence(1, char_length(_p) - {q} + 1), "
        f"i -> substring(_p, i, {q})))"
    )
    s = (
        df.select(F.col(str_col).alias("_s"))
        .filter(F.length("_s") > 0)
        .distinct()
        .withColumn("_p", F.concat(F.lit(pad), F.col("_s"), F.lit(pad)))
        .select(
            "_s",
            F.length("_s").alias("_n"),
            grams.alias("_g"),
        )
        .withColumn("_gn", F.size("_g"))
    )
    rows = s.select("_s", "_n", "_gn", F.explode("_g").alias("_h"))
    dfreq = rows.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    pref_len = q * max_dist + 1
    prefix = (
        rows.join(dfreq, "_h")
        .withColumn(
            "_r",
            F.row_number().over(Window.partitionBy("_s").orderBy("_df", "_h")),
        )
        .filter(F.col("_r") <= pref_len)
        .select("_s", "_n", "_h")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = a.join(
        b,
        on=[
            F.col("a._h") == F.col("b._h"),
            F.col("a._s") < F.col("b._s"),
            F.abs(F.col("a._n") - F.col("b._n")) <= max_dist,
        ],
    ).select(F.col("a._s").alias("str_a"), F.col("b._s").alias("str_b"))

    short = s.filter(F.col("_gn") <= q * max_dist).select("_s", "_n")
    sa = short.select(
        "_s",
        F.explode(
            F.sequence(F.col("_n") - max_dist, F.col("_n") + max_dist)
        ).alias("_k"),
    ).alias("sa")
    sb = short.select("_s", F.col("_n").alias("_k")).alias("sb")
    short_cand = sa.join(
        sb,
        on=[F.col("sa._k") == F.col("sb._k"), F.col("sa._s") < F.col("sb._s")],
    ).select(F.col("sa._s").alias("str_a"), F.col("sb._s").alias("str_b"))

    return (
        cand.unionByName(short_cand)
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("str_a"), F.col("str_b")))
        .filter(F.col("dist") <= max_dist)
    )


def duplicated_window_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    max_docs: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """ANY-ALIGNMENT exact-substring scrub: remove every token covered by
    a sliding k-token window that occurs in more than ``max_docs``
    distinct documents — the sliding-window form of Lee et al. 2021's
    exact-substring dedup (their suffix-array formulation finds matches
    at arbitrary alignment; k-gram window hashing is the equivalent for
    a fixed minimum match length, since any shared run of >= k tokens
    shares all its k-windows).

    :func:`duplicated_span_scrub`'s NON-overlapping blocks are O(tokens/k)
    but alignment-sensitive: the same boilerplate offset by one token in
    another document hashes into different blocks and survives (pinned in
    pytest). This variant pays O(tokens) window rows for alignment
    independence.

    Returns (id, n_windows, dup_windows, clean_text): n_windows =
    max(tokens - k + 1, 0); short/empty docs pass through untouched.

    Scale shape: tokenize once (posexplode), windows via lead() like
    :func:`shingle_hash_rows`; the frequency pass is a two-phase
    count-distinct on the 8-byte hash; coverage = dup windows exploded to
    their k positions (O(dup_windows x k) rows — boilerplate-heavy
    corpora should interval-merge dup windows per doc first; at
    ``max_docs=1`` typical web dup fractions keep this well under one
    extra token pass) anti-joined against the token rows; reassembly is
    the one id-keyed groupBy. Nothing is all-pairs.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_p", "_t"),
    )
    w = Window.partitionBy("_id").orderBy("_p")
    parts = [F.col("_t").alias("_t0")] + [
        F.lead("_t", j).over(w).alias(f"_t{j}") for j in range(1, k)
    ]
    wins = (
        toks.select("_id", F.col("_p").alias("_wp"), *parts)
        .filter(F.col(f"_t{k - 1}").isNotNull())
        .select(
            "_id",
            "_wp",
            _base_hash(
                F.concat_ws(" ", *[F.col(f"_t{j}") for j in range(k)]), hash_fn
            ).alias("_h"),
        )
    )
    freq = wins.groupBy("_h").agg(F.count_distinct("_id").alias("_nd"))
    dup = wins.join(freq, "_h").filter(F.col("_nd") > max_docs).select("_id", "_wp")
    covered = dup.select(
        "_id",
        F.explode(F.sequence(F.col("_wp"), F.col("_wp") + F.lit(k - 1))).alias("_p"),
    ).distinct()
    kept = toks.join(covered, ["_id", "_p"], "left_anti")
    clean = kept.groupBy("_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_p", "_t"))), lambda s: s["_t"]
            ),
        ).alias("clean_text")
    )
    n_win = wins.groupBy("_id").agg(F.count(F.lit(1)).cast("long").alias("n_windows"))
    n_dup = dup.groupBy("_id").agg(F.count(F.lit(1)).cast("long").alias("dup_windows"))
    base = df.select(F.col(id_col).alias("_id"))
    return (
        base.join(n_win, "_id", "left")
        .join(n_dup, "_id", "left")
        .join(clean, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_windows", F.lit(0).cast("long")).alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0).cast("long")).alias("dup_windows"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def duplicate_span_attributes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    max_docs: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The TAGGER form of :func:`duplicated_window_scrub`: instead of
    rewriting text, emit Dolma-style span attributes — maximal character
    ranges [start, end) covered by cross-document-duplicated k-token
    windows — so the verdicts ride an attribute sidecar
    (sources/jsonl.py write_attributes) and the scrub happens later, or
    never (tag-then-filter: audit first, apply when the release is cut).

    Offsets are over the SINGLE-SPACE NORMALIZED text (whitespace-split
    tokens joined by one space — exactly
    ``F.array_join(textstats.tokens(text), ' ')``); this is the one
    convention under which token→character arithmetic is exact without
    re-locating tokens in raw text. Producer and consumer must share it
    (the circle is pinned in pytest: tag → sidecar → remove_spans drops
    precisely the duplicated runs).

    Returns ``(id, start, end, n_windows)`` — one row per MAXIMAL merged
    span (overlapping/adjacent duplicated windows coalesce via a
    gaps-and-islands pass), ``n_windows`` = windows merged into the span.

    Scale shape: identical to the scrub up to the frequency join; the
    islands pass is a per-doc window function over DUP windows only
    (boilerplate-bounded), and offsets come from one cumulative-length
    window over the token rows — no all-pairs anywhere.
    """
    from pyspark.sql.window import Window

    from ..functions.textstats import tokens

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_p", "_t"),
    )
    w = Window.partitionBy("_id").orderBy("_p")
    parts = [F.col("_t").alias("_t0")] + [
        F.lead("_t", j).over(w).alias(f"_t{j}") for j in range(1, k)
    ]
    wins = (
        toks.select("_id", F.col("_p").alias("_wp"), *parts)
        .filter(F.col(f"_t{k - 1}").isNotNull())
        .select(
            "_id",
            "_wp",
            _base_hash(
                F.concat_ws(" ", *[F.col(f"_t{j}") for j in range(k)]), hash_fn
            ).alias("_h"),
        )
    )
    freq = wins.groupBy("_h").agg(F.count_distinct("_id").alias("_nd"))
    dup = wins.join(freq, "_h").filter(F.col("_nd") > max_docs).select("_id", "_wp")

    # gaps-and-islands: a window starts a new span iff it begins past the
    # running max end (exclusive) of every earlier duplicated window
    w_ord = Window.partitionBy("_id").orderBy("_wp")
    prev_end = F.max(F.col("_wp") + F.lit(k)).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "_new",
        F.when(prev_end.isNull() | (F.col("_wp") > prev_end), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    islands = flagged.withColumn(
        "_isl",
        F.sum("_new").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans_tok = islands.groupBy("_id", "_isl").agg(
        F.min("_wp").alias("_st"),
        (F.max("_wp") + F.lit(k)).alias("_et"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
    )

    # token -> character offsets over the single-space normalized text
    w_t = Window.partitionBy("_id").orderBy("_p")
    offs = toks.select(
        "_id",
        "_p",
        "_t",
        (
            F.coalesce(
                F.sum(F.length("_t")).over(
                    w_t.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + F.col("_p")
        )
        .cast("long")
        .alias("_off"),
    )
    so = offs.select(
        F.col("_id").alias("_ji1"),
        F.col("_p").alias("_sp"),
        F.col("_off").alias("start"),
    )
    eo = offs.select(
        F.col("_id").alias("_ji2"),
        F.col("_p").alias("_ep"),
        (F.col("_off") + F.length("_t")).cast("long").alias("end"),
    )
    return (
        spans_tok.join(
            so, on=[F.col("_id") == F.col("_ji1"), F.col("_st") == F.col("_sp")]
        )
        .join(eo, on=[F.col("_id") == F.col("_ji2"), F.col("_et") - 1 == F.col("_ep")])
        .select(F.col("_id").alias(id_col), "start", "end", "n_windows")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.9,
    hash_fn: str = "xxhash64",
    max_posting: int | None = None,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """Asymmetric shingle containment C(A,B) = |sh(A) & sh(B)| / |sh(A)|
    — the quote/subset detector.

    A short document embedded verbatim in a long one has LOW Jaccard
    (union dominated by the long doc) but containment ~1.0 in the
    short->long direction, which is why dedup pipelines audit
    containment separately (Broder 1997 §2 defines both). Output is
    DIRECTED: (id_a, id_b, containment) with id_a != id_b, meaning
    "id_a is contained in id_b" at >= threshold.

    Candidate generation (the scale knob):

    - ``block_col=None`` (default, the 10^12 shape): the shingle-hash
      equi-join itself — explode each doc's shingle set into postings,
      self-join postings on the shingle hash, distinct undirected pairs.
      FULL RECALL for any ``threshold > 0``: a pair at containment c > 0
      shares >= 1 shingle, so it appears in some posting bucket — no
      blocking-key assumption, no probabilistic miss. Cost is bounded by
      sum(df_h^2) over shingle document frequencies, linear-ish on real
      text where almost all shingles are rare; ``max_posting`` caps the
      boilerplate tail (a shingle in > max_posting docs is dropped from
      candidate generation — its pairs still surface through their other,
      rarer shared shingles unless ALL their shared shingles are that
      hot). Exact C(A,B) is then computed only on candidates, and both
      directions are verified from ONE undirected candidate row (one
      array_intersect serves A-in-B and B-in-A).
    - ``block_col='lang'`` (or source/domain): legacy within-block
      all-pairs — quadratic in the largest block; kept for small blocked
      audits. A LENGTH bucket is the WRONG block key here — containment
      pairs have very different lengths by construction.

    With ``max_posting=None`` the banded mode is result-IDENTICAL to an
    unblocked all-pairs scan (the cross-algorithm oracle replays exactly
    that); the blocked mode is its restriction to within-block pairs.
    """
    if block_col is not None:
        sh = _hashed_shingle_sets(
            df.withColumnRenamed(block_col, "_blk") if block_col != "_blk" else df,
            id_col, text_col, n, extra_cols=["_blk"], hash_fn=hash_fn,
        )
        a, b = sh.alias("a"), sh.alias("b")
        pairs = a.join(
            b, on=[F.col("a._blk") == F.col("b._blk"), F.col("a._id") != F.col("b._id")]
        )
        inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh"))).cast("double")
        denom = F.size(F.col("a._sh")).cast("double")
        cont = F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))
        return (
            pairs.select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                cont.alias("containment"),
            )
            .filter(F.col("containment") >= threshold)
        )

    # banded (block-key-free) path: posting-list candidates, exact verify.
    # The shingle sets are persisted — the posting explode AND the verify
    # join both read the same cached relation (one tokenize+hash pass).
    sh = _hashed_shingle_sets(df, id_col, text_col, n, hash_fn=hash_fn).persist()
    if unpersist_handles is not None:
        unpersist_handles.append(sh)
    post = sh.select("_id", F.explode("_sh").alias("_h"))
    if max_posting is not None:
        freq = post.groupBy("_h").agg(F.count(F.lit(1)).alias("_pdf"))
        post = post.join(
            freq.filter(F.col("_pdf") <= max_posting), on=["_h"]
        ).drop("_pdf")
    cand = (
        post.alias("a")
        .join(
            post.alias("b"),
            on=[F.col("a._h") == F.col("b._h"), F.col("a._id") < F.col("b._id")],
        )
        .select(F.col("a._id").alias("_ia"), F.col("b._id").alias("_ib"))
        .distinct()
    )
    j = (
        cand.join(
            sh.select(F.col("_id").alias("_ia"), F.col("_sh").alias("_sa")), "_ia"
        ).join(
            sh.select(F.col("_id").alias("_ib"), F.col("_sh").alias("_sb")), "_ib"
        )
    )
    inter = F.size(F.array_intersect(F.col("_sa"), F.col("_sb"))).cast("double")
    c_ab = inter / F.size("_sa").cast("double")  # _sh rows are non-empty by construction
    c_ba = inter / F.size("_sb").cast("double")
    both = j.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_ia").alias("id_a"),
                    F.col("_ib").alias("id_b"),
                    c_ab.alias("containment"),
                ),
                F.struct(
                    F.col("_ib").alias("id_a"),
                    F.col("_ia").alias("id_b"),
                    c_ba.alias("containment"),
                ),
            )
        ).alias("_r")
    ).select("_r.*")
    return both.filter(F.col("containment") >= threshold)


# --- MinHash + LSH ----------------------------------------------------------
def _perm_coeffs(num_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a,b) pairs for the universal-hash permutation family
    h_i(x) = (a_i*x + b_i) mod 2^31-1. splitmix-style constants, no RNG."""
    out = []
    s = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(num_perm):
        s = (s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        a = (s >> 33) % (MERSENNE - 1) + 1
        s = (s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        b = (s >> 33) % MERSENNE
        out.append((a, b))
    return out


def _signatures_from_sets(sh: DataFrame, num_perm: int) -> DataFrame:
    """(_id, _sig: array<long>) from materialized shingle-hash sets.

    Map-only: the sets behind ``_sh`` are aggregation-materialized (and, in
    the LSH pipeline, persisted), so the 64 affine-map/array_min expressions
    here cost num_perm multiplies per element in one projection — each
    shingle was hashed exactly once upstream, and no extra shuffle happens
    (the old explode -> 64 min-aggs form paid a second keyed exchange).
    Ids with an empty shingle set never reach ``_sh`` (they cannot be
    near-dups; an all-sentinel row would otherwise form one giant useless
    LSH bucket).
    """
    coeffs = _perm_coeffs(num_perm)
    base = F.transform(F.col("_sh"), lambda h: F.pmod(h, F.lit(MERSENNE)))

    def _perm(a: int, b: int):
        # closure factory (a defaulted lambda would read as 3-arg to Spark)
        return lambda h: F.pmod(a * h + b, F.lit(MERSENNE))

    sentinel = F.lit(MERSENNE).cast("long")
    mins = [
        F.coalesce(F.array_min(F.transform(base, _perm(a, b))), sentinel)
        for a, b in coeffs
    ]
    return sh.select("_id", F.array(*mins).alias("_sig"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig: array<long>): shingle-hash sets (one tokenize+hash pass)
    -> per-permutation array mins. See ``_signatures_from_sets``."""
    return _signatures_from_sets(
        _hashed_shingle_sets(df, id_col, text_col, n, hash_fn=hash_fn), num_perm
    )


def _banded(sig: DataFrame, num_perm: int, bands: int, hash_fn: str) -> DataFrame:
    """(_id, bkey) — one row per (doc, LSH band). Band key = band index +
    the band's signature slice; in xxhash64 mode the key is re-hashed so
    the shuffle key narrows to 8 bytes (equality semantics are identical;
    md5 mode keeps the readable string key the DuckDB oracle replays)."""
    r = num_perm // bands
    band_keys = [
        F.concat_ws("_", F.lit(str(b)), F.slice("_sig", b * r + 1, r))
        for b in range(bands)
    ]
    if hash_fn == "xxhash64":
        band_keys = [F.xxhash64(k) for k in band_keys]
    return sig.select("_id", F.explode(F.array(*band_keys)).alias("bkey"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = None,
    hash_fn: str = "xxhash64",
    unpersist_handles: list | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-verified.

    shingle -> signature -> band keys -> explode -> bucket self-join ->
    distinct candidate pairs -> exact Jaccard filter. The only shuffles are
    the bucket equi-join and the candidate distinct; both are keyed hash
    shuffles that scale linearly. Banding math: P(candidate) =
    1-(1-s^r)^b with r = num_perm/bands.

    The shingle-hash sets are computed ONCE and ``persist()``-ed — both the
    signature/banding stage and the exact-verify stage read the same cached
    relation, so the raw text is tokenized a single time (at cluster scale
    the same role is played by materializing the set table). The returned
    DataFrame is lazy, so there is no safe unpersist point inside this
    function — pass ``unpersist_handles=[]`` and the persisted relation is
    appended to it; long-lived sessions should ``h.unpersist()`` each handle
    once the result is materialized (otherwise the cache lives until
    executor storage evicts it).

    ``hash_fn='md5'`` swaps the shingle base hash for the cross-engine
    ``md5_hash60`` so a DuckDB oracle can replay the whole pipeline
    bit-for-bit; 'xxhash64' stays the scale default.

    ``max_bucket``: giant-bucket guard (SCALE.md) — a degenerate bucket
    (boilerplate cluster) of size B contributes B^2/2 candidates; buckets
    larger than this are dropped from candidate generation (their members
    still pair through their other, more selective bands). Default None =
    exact candidate semantics.
    """
    assert num_perm % bands == 0
    sh = _hashed_shingle_sets(df, id_col, text_col, n, hash_fn=hash_fn).persist()
    if unpersist_handles is not None:
        unpersist_handles.append(sh)
    banded = _banded(_signatures_from_sets(sh, num_perm), num_perm, bands, hash_fn)
    if max_bucket is not None:
        sizes = banded.groupBy("bkey").agg(F.count(F.lit(1)).alias("_bn"))
        banded = banded.join(
            sizes.filter(F.col("_bn") <= max_bucket), on=["bkey"]
        ).drop("_bn")
    a, b_ = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b_,
            on=[
                F.col("a.bkey") == F.col("b.bkey"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    verified = (
        cand.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .select("id_a", "id_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def dedup_against(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float | None = 0.8,
    hash_fn: str = "xxhash64",
    unpersist_handles: list | None = None,
    bloom_m_bits: int | None = None,
    bloom_k: int = 4,
) -> DataFrame:
    """Incremental (cross-snapshot) dedup: filter a NEW batch against an
    EXISTING corpus without ever reprocessing the corpus pairwise — the
    ingest gate of a continuously-growing training corpus.

    Two stages:
    1. EXACT — drop batch docs whose content hash already exists in the
       corpus: anti-join on the 60-bit text hash. The corpus side reduces
       to DISTINCT hashes (8 bytes/doc) — at 10^12 corpus docs this is the
       only corpus-wide relation and it is precomputable/reusable across
       batches (materialize it once per snapshot, like ip.db).
       With ``bloom_m_bits`` set, a Bloom prefilter (built over the same
       corpus hashes; ``sketches.bloom_build``, false-negative-free by
       construction) splits the batch FIRST as a zero-join map-side
       projection: definite-new rows skip the anti-join entirely and only
       the maybe-duplicate fraction (true dups + ~FP-rate of the batch)
       probes it — at 10^12 corpus rows that turns the one
       batch-wide shuffle into a shuffle of a few percent of the batch.
       The result is IDENTICAL with or without the prefilter (no false
       negatives), which is pinned in pytest.
    2. NEAR (``threshold`` not None) — MinHash-LSH band keys on BOTH
       sides, batch-x-corpus bucket equi-join -> distinct candidates ->
       exact Jaccard verify -> drop batch docs with ANY corpus near-dup
       >= threshold. The corpus never self-joins: candidate count is
       (batch docs) x (corpus docs in the same bucket), and at scale the
       corpus band-key relation is a materialized index appended per
       ingest, so each new batch costs O(batch) + one bucket join.

    Batch-internal duplicates are NOT removed here — compose with
    ``exact_dedup`` / ``minhash_lsh_pairs`` downstream; keeping the two
    concerns separate is what lets the corpus side stay an append-only
    index. Returns surviving batch rows (all original columns).

    ``hash_fn='md5'`` makes every stage replayable bit-for-bit by a DuckDB
    oracle (same base hash, permutations, banding, Jaccard as
    ``minhash_lsh_pairs``).
    """
    bh = batch.withColumn("_bh", _base_hash(F.col(text_col), hash_fn))
    ch = corpus.select(_base_hash(F.col(text_col), hash_fn).alias("_bh")).distinct()
    if bloom_m_bits is not None:
        from .sketches import bloom_build, bloom_maybe_contains, bloom_words_array

        words = bloom_words_array(
            bloom_build(
                ch, F.col("_bh").cast("string"), bloom_m_bits, bloom_k, hash_fn
            ),
            bloom_m_bits,
        )
        maybe = bloom_maybe_contains(
            F.col("_bh").cast("string"), words, bloom_m_bits, bloom_k, hash_fn
        )
        definite_new = bh.filter(~maybe).drop("_bh")
        survivors = definite_new.unionByName(
            bh.filter(maybe).join(ch, on="_bh", how="left_anti").drop("_bh")
        )
    else:
        survivors = bh.join(ch, on="_bh", how="left_anti").drop("_bh")
    if threshold is None:
        return survivors
    assert num_perm % bands == 0
    sh_b = _hashed_shingle_sets(survivors, id_col, text_col, n, hash_fn=hash_fn).persist()
    sh_c = _hashed_shingle_sets(corpus, id_col, text_col, n, hash_fn=hash_fn).persist()
    if unpersist_handles is not None:
        unpersist_handles.extend([sh_b, sh_c])
    banded_b = _banded(_signatures_from_sets(sh_b, num_perm), num_perm, bands, hash_fn)
    banded_c = _banded(_signatures_from_sets(sh_c, num_perm), num_perm, bands, hash_fn)
    cand = (
        banded_b.alias("a")
        .join(banded_c.alias("b"), on=[F.col("a.bkey") == F.col("b.bkey")])
        .select(F.col("a._id").alias("_bid"), F.col("b._id").alias("_cid"))
        .distinct()
    )
    dominated = (
        cand.join(sh_b.select(F.col("_id").alias("_bid"), F.col("_sh").alias("_shb")), "_bid")
        .join(sh_c.select(F.col("_id").alias("_cid"), F.col("_sh").alias("_shc")), "_cid")
        .filter(_jaccard(F.col("_shb"), F.col("_shc")) >= threshold)
        .select(F.col("_bid").alias(id_col))
        .distinct()
    )
    return survivors.join(dominated, on=id_col, how="left_anti")


# --- Materialized text-dedup index ------------------------------------------
def write_text_index(
    corpus: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    hash_fn: str = "xxhash64",
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Materialize the corpus side of :func:`dedup_against` as an on-disk
    index a small batch can PROBE instead of recomputing — the
    "materialized index appended per ingest" that function's docstring
    promises, as code. Three relations under ``path``:

    - ``hashes/`` — DISTINCT 60/64-bit content hashes, partitioned by
      ``_b = pmod(_bh, n_buckets)``: the exact-dup stage probes only the
      buckets the batch's own hashes fall in (8 bytes/corpus doc total).
    - ``bands/`` — (id, bkey) MinHash-LSH band postings, partitioned by
      ``_b = pmod(xxhash64(bkey), n_buckets)``: the candidate stage reads
      only the band buckets the batch's keys hash into.
    - ``sets/`` — (id, _sh) shingle-hash sets, partitioned by
      ``_b = pmod(xxhash64(id), n_buckets)``: the exact-Jaccard verify
      joins back only to the buckets that hold candidate corpus ids.

    Every probe prunes at file-listing time (PartitionFilters — pinned in
    pytest), so corpus bytes read scale with the BATCH, not the corpus —
    the same move as ``write_fp_index`` (chunk, bucket) and
    ``write_ivfpq_index`` (cells). ``sets/`` is the storage price of
    EXACT verify (O(corpus shingles) ≈ corpus bytes); a deployment that
    accepts signature-estimate verify can skip it and verify on band
    agreement instead — documented trade-off, not implemented, because
    result-identity with :func:`dedup_against` is the contract here.

    ``mode='append'`` is the per-ingest maintenance path: append the
    SURVIVORS of a gated batch (hashes/bands/sets computed batch-side
    only). ``hashes/`` may then hold a duplicate hash row across appends
    — harmless to the anti-join semantics (pinned in pytest); compact
    periodically if bytes matter. The three relations are written
    corpus → one pass each; tokenize/shingle happens once via a shared
    persisted set relation."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unknown mode {mode!r} (want 'overwrite' or 'append')")
    ch = corpus.select(_base_hash(F.col(text_col), hash_fn).alias("_bh")).distinct()
    ch.withColumn("_b", F.pmod(F.col("_bh"), F.lit(n_buckets))).write.mode(
        mode
    ).partitionBy("_b").parquet(path + "/hashes")
    sh = _hashed_shingle_sets(corpus, id_col, text_col, n, hash_fn=hash_fn).persist()
    try:
        banded = _banded(_signatures_from_sets(sh, num_perm), num_perm, bands, hash_fn)
        banded.withColumn(
            "_b", F.pmod(F.xxhash64(F.col("bkey")), F.lit(n_buckets))
        ).write.mode(mode).partitionBy("_b").parquet(path + "/bands")
        sh.withColumn(
            "_b", F.pmod(F.xxhash64(F.col("_id")), F.lit(n_buckets))
        ).write.mode(mode).partitionBy("_b").parquet(path + "/sets")
    finally:
        sh.unpersist()


def _probe_buckets(df: DataFrame, bucket_col: Column) -> list[int]:
    """Distinct partition-bucket values a probe relation touches — bounded
    by n_buckets by construction, so the collect is a driver-safe dim."""
    return [
        r["_pb"] for r in df.select(bucket_col.alias("_pb")).distinct().collect()
    ]


def text_gate_indexed(
    spark,
    batch: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float | None = 0.8,
    hash_fn: str = "xxhash64",
    n_buckets: int = 64,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """:func:`dedup_against` against a MATERIALIZED
    :func:`write_text_index` — result-identical (pinned in pytest; the
    gate query's oracle is literally the incremental_dedup replay), but
    the corpus is never recomputed: each stage collects the batch's
    bounded (≤ n_buckets) partition-bucket set and reads ONLY those
    directories of the index. num_perm/bands/n/hash_fn/n_buckets must
    match the index write. Returns surviving ``batch`` rows (all
    original columns)."""
    assert num_perm % bands == 0
    bh = batch.withColumn("_bh", _base_hash(F.col(text_col), hash_fn))
    hb = _probe_buckets(bh, F.pmod(F.col("_bh"), F.lit(n_buckets)))
    if not hb:
        return batch
    idx_h = spark.read.parquet(index_path + "/hashes").filter(F.col("_b").isin(hb))
    survivors = bh.join(idx_h.select("_bh"), on="_bh", how="left_anti").drop("_bh")
    if threshold is None:
        return survivors
    sh_b = _hashed_shingle_sets(survivors, id_col, text_col, n, hash_fn=hash_fn).persist()
    if unpersist_handles is not None:
        unpersist_handles.append(sh_b)
    banded_b = _banded(_signatures_from_sets(sh_b, num_perm), num_perm, bands, hash_fn)
    bb = _probe_buckets(banded_b, F.pmod(F.xxhash64(F.col("bkey")), F.lit(n_buckets)))
    if not bb:
        return survivors
    idx_bands = spark.read.parquet(index_path + "/bands").filter(F.col("_b").isin(bb))
    cand = (
        banded_b.alias("a")
        .join(idx_bands.alias("b"), on=[F.col("a.bkey") == F.col("b.bkey")])
        .select(F.col("a._id").alias("_bid"), F.col("b._id").alias("_cid"))
        .distinct()
        .persist()
    )
    if unpersist_handles is not None:
        unpersist_handles.append(cand)
    cb = _probe_buckets(cand, F.pmod(F.xxhash64(F.col("_cid")), F.lit(n_buckets)))
    if not cb:
        return survivors
    idx_sets = spark.read.parquet(index_path + "/sets").filter(F.col("_b").isin(cb))
    dominated = (
        cand.join(
            sh_b.select(F.col("_id").alias("_bid"), F.col("_sh").alias("_shb")), "_bid"
        )
        .join(
            idx_sets.select(F.col("_id").alias("_cid"), F.col("_sh").alias("_shc")),
            "_cid",
        )
        .filter(_jaccard(F.col("_shb"), F.col("_shc")) >= threshold)
        .select(F.col("_bid").alias(id_col))
        .distinct()
    )
    return survivors.join(dominated, on=id_col, how="left_anti")


# --- SimHash ----------------------------------------------------------------
def simhash(text: Column) -> Column:
    """64-bit SimHash of the token multiset, fully native.

    Token hashes via xxhash64; per bit position sum +1/-1 by bit value; the
    fingerprint sets bits with positive sums. Nested transform/aggregate
    runs inside codegen; cost is O(tokens*64) per row, no shuffle.
    """
    hashes = F.transform(tokens(text), lambda t: F.xxhash64(t))

    def _vote(i: int):
        # i must be a Python literal: shiftrightunsigned takes int numBits
        return lambda acc, h: acc + F.when(
            F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1).cast("long")) == 1, 1
        ).otherwise(-1)

    fp = F.lit(0).cast("long")
    for i in range(64):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote(i))
        fp = fp + F.when(vote > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return fp


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, fingerprint) via explode -> 64 bit-vote sums -> groupBy.

    Single pass over the token hashes (the Column-expression ``simhash``
    recomputes the token array inside each of the 64 bit aggregates);
    map-side partial aggregation keeps the shuffle at O(ids * 64) longs.
    ``hash_fn='md5'`` uses the 60-bit cross-engine base hash (bits 60-63 of
    the fingerprint are then always 0 — harmless: hamming and the chunk
    pigeonhole are unaffected) so a DuckDB oracle can replay it.
    """
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("_t"),
    ).select("_id", _base_hash(F.col("_t"), hash_fn).alias("_h"))
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned(F.col("_h"), i).bitwiseAND(F.lit(1).cast("long")) == 1, 1
            ).otherwise(-1)
        ).alias(f"_v{i}")
        for i in range(64)
    ]
    per_id = exploded.groupBy("_id").agg(*votes)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(
            F.col(f"_v{i}") > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per_id.select("_id", fp.alias("_sh"))


def hamming_pairs(
    fp_df: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Pairs within hamming <= max_hamming over PRECOMPUTED 64-bit
    fingerprints — text simhash or perceptual image hashes
    (``multimodal.phash_images``) alike.

    Candidate generation: split the fingerprint into ``n_chunks`` equal
    bit chunks; by pigeonhole any pair within hamming <= n_chunks - 1
    shares at least one chunk verbatim -> per-chunk equi-join (keyed
    shuffle, never a cross join) -> exact ``bit_count(xor)`` verify.
    Raise ``n_chunks`` with the threshold (8 chunks of 8 bits covers
    hamming <= 7) — asserted, so a silently-lossy setting is impossible
    unless ``allow_partial_recall=True`` explicitly opts into the
    diagnostic chunk-sharing-candidates-only mode.
    Output: (id_a, id_b, hamming) with id_a < id_b."""
    assert 64 % n_chunks == 0, "n_chunks must divide 64"
    assert allow_partial_recall or max_hamming <= n_chunks - 1, (
        f"pigeonhole recall needs n_chunks > max_hamming "
        f"(got n_chunks={n_chunks}, max_hamming={max_hamming}); pass "
        f"allow_partial_recall=True for diagnostic chunk-candidate mode"
    )
    chunks = _fp_chunks(fp_df, id_col, fp_col, n_chunks)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.ci") == F.col("b.ci"),
                F.col("a.cv") == F.col("b.cv"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            # long: SQL engines' bit_count is narrower/wider by dialect;
            # BIGINT on both sides keeps oracle value-hash parity
            F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh"))).cast("long").alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def _fp_chunks(
    fp_df: DataFrame, id_col: str, fp_col: str, n_chunks: int
) -> DataFrame:
    """(_id, _sh, ci, cv) — the pigeonhole chunk explode shared by the
    self-join (:func:`hamming_pairs`) and cross-relation
    (:func:`hamming_join`) candidate generators."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return fp_df.select(
        F.col(id_col).alias("_id"),
        F.col(fp_col).alias("_sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned(F.col(fp_col), i * width)
                        .bitwiseAND(F.lit(mask).cast("long"))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("_id", "_sh", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))


def hamming_join(
    a_df: DataFrame,
    b_df: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Cross-RELATION near-dup pairs: every (a, b) with a from ``a_df``,
    b from ``b_df``, and hamming(fp_a, fp_b) <= max_hamming — the
    batch-vs-corpus form of :func:`hamming_pairs` (which is the
    self-join form). Same pigeonhole guarantee: any pair within
    hamming <= n_chunks - 1 shares a chunk verbatim, so candidates come
    from a per-chunk equi-join (keyed shuffle — and at 10^12 scale the
    corpus side's chunk relation is a materialized index the batch
    probes, never a corpus rescan), then exact ``bit_count(xor)``
    verify. Output: (id_a, id_b, hamming), id_a from a, id_b from b —
    NOT deduplicated by id pair direction (a and b are different
    relations)."""
    assert 64 % n_chunks == 0, "n_chunks must divide 64"
    assert max_hamming <= n_chunks - 1, (
        f"pigeonhole recall needs n_chunks > max_hamming "
        f"(got n_chunks={n_chunks}, max_hamming={max_hamming})"
    )
    a = _fp_chunks(a_df, id_col, fp_col, n_chunks).alias("a")
    b = _fp_chunks(b_df, id_col, fp_col, n_chunks).alias("b")
    cand = (
        a.join(b, on=[F.col("a.ci") == F.col("b.ci"), F.col("a.cv") == F.col("b.cv")])
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh"))).cast("long").alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


def fingerprint_gate(
    batch: DataFrame,
    index: DataFrame,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Ingest gate over PRECOMPUTED fingerprints: rows of ``batch`` with
    NO near-dup (hamming <= max_hamming) in ``index`` — the perceptual
    analogue of ``dedup_against``'s exact-hash anti-join, for media
    streams where re-encodes must gate too. :func:`hamming_join`
    candidates -> distinct matched batch ids -> left_anti; the batch
    never all-pairs the index and the index never self-joins. Returns
    ``batch`` rows unchanged (all columns)."""
    hits = (
        hamming_join(
            batch.select(id_col, fp_col),
            index,
            id_col,
            fp_col,
            max_hamming=max_hamming,
            n_chunks=n_chunks,
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return batch.join(hits, id_col, "left_anti")


def write_fp_index(
    fp_df: DataFrame,
    path: str,
    id_col: str,
    fp_col: str,
    n_chunks: int = 8,
    n_buckets: int = 64,
) -> None:
    """Materialize the pigeonhole chunk index: one posting row per
    (item, chunk), PARTITIONED BY (ci, _b = cv mod n_buckets) — the
    corpus side of :func:`fingerprint_gate` as an on-disk layout a small
    batch can PROBE instead of rescanning. A gate then prunes to the
    batch's (chunk, bucket) directories at file-listing time: a b-item
    batch touches at most min(b * n_chunks, n_chunks * n_buckets)
    partitions of the n_chunks * n_buckets total, so corpus bytes read
    scale with the BATCH, not the corpus — the same
    partition-pruning-by-construction move as ``write_ivfpq_index``
    (cells) and the inverted index (term buckets). Index bytes:
    n_chunks rows x ~20 B per item; the fingerprint rides along for the
    exact verify so the gate never joins back to the corpus.

    One shuffle-free pass (chunk explode is a projection;
    ``partitionBy`` splits files per bucket within each task — compact
    after if small-files pressure matters at 10^12)."""
    chunks = _fp_chunks(fp_df, id_col, fp_col, n_chunks)
    out = chunks.select(
        F.col("_id").alias(id_col),
        F.col("_sh").alias(fp_col),
        "cv",
        "ci",
        F.pmod(F.col("cv"), F.lit(n_buckets)).alias("_b"),
    )
    out.write.mode("overwrite").partitionBy("ci", "_b").parquet(path)


def fingerprint_gate_indexed(
    spark,
    batch: DataFrame,
    index_path: str,
    id_col: str,
    fp_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
    n_buckets: int = 64,
) -> DataFrame:
    """:func:`fingerprint_gate` against a MATERIALIZED
    :func:`write_fp_index` — result-identical (pinned in pytest), but
    the corpus is probed through partition pruning: the batch's distinct
    (ci, _b) keys (a bounded <= n_chunks * n_buckets collect) become
    partition filters, so unprobed chunk-bucket directories are never
    listed or read. ``n_chunks``/``n_buckets`` must match the index
    write. Returns ``batch`` rows with no indexed fingerprint within
    ``max_hamming`` (all columns preserved)."""
    assert 64 % n_chunks == 0, "n_chunks must divide 64"
    assert max_hamming <= n_chunks - 1, "pigeonhole recall needs n_chunks > max_hamming"
    bc = _fp_chunks(batch, id_col, fp_col, n_chunks).withColumn(
        "_b", F.pmod(F.col("cv"), F.lit(n_buckets))
    )
    probes: dict[int, set] = {}
    for r in bc.select("ci", "_b").distinct().collect():  # bounded by n_chunks*n_buckets
        probes.setdefault(r["ci"], set()).add(r["_b"])
    if not probes:
        return batch
    cond = None
    for ci, bs in sorted(probes.items()):
        c = (F.col("ci") == ci) & F.col("_b").isin(*sorted(bs))
        cond = c if cond is None else (cond | c)
    idx = spark.read.parquet(index_path).filter(cond)
    j = bc.alias("a").join(
        idx.alias("b"),
        on=[F.col("a.ci") == F.col("b.ci"), F.col("a.cv") == F.col("b.cv")],
    )
    hits = (
        j.select(
            F.col("a._id").alias(id_col),
            F.bit_count(
                F.col("a._sh").bitwiseXOR(F.col(f"b.{fp_col}"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(id_col)
        .distinct()
    )
    return batch.join(hits, id_col, "left_anti")


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    hash_fn: str = "xxhash64", allow_partial_recall: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming: the
    fingerprint aggregation + the generic pigeonhole chunk join
    (:func:`hamming_pairs`, 4 x 16-bit chunks)."""
    sh = simhash_fingerprints(df, id_col, text_col, hash_fn=hash_fn)
    return hamming_pairs(
        sh, "_id", "_sh", max_hamming=max_hamming, n_chunks=4,
        allow_partial_recall=allow_partial_recall,
    )


# --- dup-cluster resolution (connected components) --------------------------
def dup_clusters(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: connected components
    by iterative min-label propagation. Returns (_id, _label) where _label
    is the minimum id reachable in the pair graph (singletons label
    themselves).

    Each iteration is one keyed shuffle (edges ⋈ labels → min per node);
    convergence takes graph-diameter iterations — near-dup clusters are
    shallow (boilerplate stars, chain edits), so typically 2-5. The driver
    loop holds only a changed-row counter per iteration; labels persist
    across iterations so lineage doesn't recompute from scratch. At 10^12
    nodes the same loop runs with checkpointing every few iterations
    (lineage truncation); the alternating large-star/small-star variant
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) drops the iteration count to O(log n) for deep graphs.
    """
    ids = df.select(F.col(id_col).alias("_id")).distinct()
    edges = (
        pairs.select(F.col("id_a").alias("_u"), F.col("id_b").alias("_v"))
        .unionByName(pairs.select(F.col("id_b").alias("_u"), F.col("id_a").alias("_v")))
        .distinct()
        .persist()
    )
    labels = ids.select("_id", F.col("_id").alias("_label")).persist()
    changed = 0
    for _ in range(max_iter):
        from pyspark.sql import Observation

        nbr_min = (
            edges.join(labels, edges["_v"] == labels["_id"])
            .groupBy("_u")
            .agg(F.min("_label").alias("_nl"))
        )
        # localCheckpoint (not persist): truncates lineage so the logical
        # plan stays O(1) per iteration instead of growing every round.
        # The changed-count rides the SAME job as an Observation metric —
        # one keyed join + one action per iteration, not two (the old
        # new-vs-old re-join doubled the per-iteration shuffle count).
        obs = Observation()
        new_labels = (
            labels.join(nbr_min, labels["_id"] == nbr_min["_u"], "left")
            .select(
                labels["_id"],
                F.least(F.col("_label"), F.coalesce(F.col("_nl"), F.col("_label"))).alias("_label"),
                (F.coalesce(F.col("_nl"), F.col("_label")) < F.col("_label")).alias("_chg"),
            )
            .observe(obs, F.sum(F.col("_chg").cast("long")).alias("n_changed"))
            .select("_id", "_label")
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["n_changed"] or 0)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed > 0:
        # exiting non-converged silently would return SPLIT clusters (a
        # chain deeper than max_iter keeps distinct labels) with no signal
        import warnings

        warnings.warn(
            f"dup_clusters: hit max_iter={max_iter} with {changed} labels "
            "still changing — cluster labels are NOT converged; raise "
            "max_iter or use dup_clusters_star (O(log n) rounds)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dup_clusters_star(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    max_iter: int = 30,
) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    rewriting (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — O(log n) rounds even on deep graphs, where
    ``dup_clusters``' plain min-propagation needs graph-diameter rounds
    (a 10^4-long chain-edit cluster would need 10^4 shuffles there).

    large-star: every node's HIGHER neighbors re-attach to its component
    minimum; small-star: every node's lower-or-equal neighbors collapse
    onto the minimum. Each round is two keyed aggregations + joins; the
    edge set monotonically contracts to stars (v -> root). Returns the
    same (_id, _label) contract as ``dup_clusters``.
    """
    ids = df.select(F.col(id_col).alias("_id")).distinct()
    edges = (
        pairs.select(F.col("id_a").alias("_u"), F.col("id_b").alias("_v"))
        .unionByName(pairs.select(F.col("id_b").alias("_u"), F.col("id_a").alias("_v")))
        .filter(F.col("_u") != F.col("_v"))
        .distinct()
        .persist()
    )
    converged = False
    for _round in range(max_iter):
        # large-star: m(u) = min(u, min N(u)); emit (v, m) for v in N(u), v > u
        m_large = edges.groupBy("_u").agg(
            F.least(F.min("_v"), F.first("_u")).alias("_m")
        )
        large = (
            edges.join(m_large, "_u")
            .filter(F.col("_v") > F.col("_u"))
            .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
        )
        # small-star on canonical (hi, lo) edges: m(u) = min(u, min N(u));
        # emit (v, m) for v in N(u) ∪ {u}
        canon = large.select(
            F.greatest("_u", "_v").alias("_u"), F.least("_u", "_v").alias("_v")
        ).filter(F.col("_u") != F.col("_v")).distinct()
        m_small = canon.groupBy("_u").agg(F.min("_v").alias("_m"))
        small = (
            canon.join(m_small, "_u")
            .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
            .unionByName(m_small.select(F.col("_u"), F.col("_m").alias("_v")))
            .filter(F.col("_u") != F.col("_v"))
            .distinct()
        )
        # localCheckpoint TRUNCATES lineage: without it the logical plan
        # doubles every round (unions/joins/distinct stack up) and Catalyst
        # itself OOMs after ~10 iterations — the standard iterative-graph
        # pattern on DataFrames (cluster jobs use checkpoint() on HDFS)
        new_edges = (
            small.unionByName(small.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # set-equality check in one cheap map-side agg + one anti-join that
        # only runs when the cardinalities already agree: both sides are
        # DISTINCT sets, so |new| == |old| and new \ old == {} imply
        # equality. (The old form ran two exceptAll joins every round.)
        n_new = new_edges.count()
        n_old = edges.count() if _round == 0 else n_prev
        converged = (
            n_new == n_old
            and new_edges.exceptAll(edges).limit(1).count() == 0
        )
        n_prev = n_new
        edges.unpersist()
        edges = new_edges
        if converged:
            break
    if not converged:
        import warnings

        warnings.warn(
            f"dup_clusters_star: hit max_iter={max_iter} before the edge "
            "set stabilized — cluster labels may be split; raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    # stars: every node's label = min(self, min neighbor); singletons self
    roots = edges.groupBy("_u").agg(F.least(F.min("_v"), F.first("_u")).alias("_label"))
    out = ids.join(roots, ids["_id"] == roots["_u"], "left").select(
        "_id", F.coalesce("_label", F.col("_id")).alias("_label")
    )
    edges.unpersist()
    return out


def dedup_keep_best(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Pick one canonical document per dup cluster: highest ``score_col``,
    ties to the smallest id. Returns (_id, _label, _keep) for every doc.
    One window over the cluster key — the standard keep-best stage after
    cluster resolution in a training-data dedup pipeline."""
    from pyspark.sql.window import Window

    scored = clusters.join(
        df.select(F.col(id_col).alias("_id"), F.col(score_col).alias("_score")), "_id"
    )
    w = Window.partitionBy("_label").orderBy(F.desc("_score"), F.asc("_id"))
    return scored.withColumn("_keep", F.row_number().over(w) == 1).drop("_score")


# --- embedding near-dup -----------------------------------------------------
def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays, accumulated in double with a
    deterministic left-to-right fold (bit-stable across engines/partitions).
    """
    def _dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )

    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def normalized_vectors(
    df: DataFrame, id_col: str, vec_col: str, extra_cols: list[str] | None = None
) -> DataFrame:
    """(_id, [extra...], _nv: array<double>) — unit-normalized vectors,
    materialized through an aggregation barrier.

    Pair-scoring with the raw cosine formula costs 3 folds per PAIR
    (dot(a,b), dot(a,a), dot(b,b)); the norms are per-VECTOR invariants.
    Normalizing once turns pair cost into a single dot product — and the
    aggregate barrier stops projection collapse from re-inlining the
    normalization into every pair (same trap as _hashed_shingle_sets).
    """
    extra_cols = extra_cols or []
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )
    nv = F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    projected = df.select(
        F.col(id_col).alias("_id"), *[F.col(c) for c in extra_cols], nv.alias("_nv")
    )
    return projected.groupBy("_id", *extra_cols).agg(F.first("_nv").alias("_nv"))


def dot_product(a: Column, b: Column) -> Column:
    """Deterministic left-to-right double dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda p, q: p * q),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold within a blocking key.

    At scale the block key is an LSH bucket (similarity.hyperplane_bucket);
    any coarse partitioner (cluster id, label) works — the join stays an
    equi-join on the block. Scoring = one dot product of pre-normalized
    vectors per pair.
    """
    v = normalized_vectors(df, id_col, vec_col, extra_cols=[block_col])
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col(f"a.{block_col}") == F.col(f"b.{block_col}"),
                F.col("a._id") < F.col("b._id"),
            ],
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            dot_product(F.col("a._nv"), F.col("b._nv")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# --- winnowing fingerprints -------------------------------------------------
def winnowed_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, _fps: array<long>) — winnowing document fingerprints
    (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD 2003): hash every word k-gram, slide
    a window of ``w`` consecutive k-gram hashes, record each window's
    minimum; the selected values (sorted, distinct) are the document's
    fingerprint set. Guarantees every shared substring of at least
    k + w - 1 tokens contributes a shared fingerprint — the position-
    robust dedup signal MOSS uses for code plagiarism.

    The k-gram hash array is materialized through an aggregation barrier
    before the window-min pass: the per-window lambda references the
    array once per window, and without the barrier projection collapse
    would re-inline the whole tokenize+hash expression into every window
    (the dedup-module trap, see _hashed_shingle_sets).

    Docs shorter than k + w - 1 tokens yield an empty fingerprint array
    (standard winnowing domain; use exact/minhash dedup for tiny docs).
    """
    kh = F.transform(shingles(F.col(text_col), k), lambda s: _base_hash(s, hash_fn))
    proj = df.select(F.col(id_col).alias("_id"), kh.alias("_kh"))
    mat = proj.groupBy("_id").agg(F.first("_kh").alias("_kh"))  # barrier
    nw = F.size(F.col("_kh")) - (w - 1)
    sel = F.when(
        nw > 0,
        F.transform(
            F.sequence(F.lit(1), nw),
            lambda i: F.array_min(F.slice(F.col("_kh"), i, w)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return mat.select("_id", F.array_sort(F.array_distinct(sel)).alias("_fps"))


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints:
    (id_a, id_b, n_shared) for pairs sharing >= ``min_shared`` selected
    hashes. Candidate generation is a fingerprint equi-join (keyed hash
    shuffle on the fingerprint value — never a cross join); a shared
    fingerprint witnesses a shared >= k+w-1-token substring, so this
    catches block-level copying that whole-document Jaccard dilutes."""
    fps = winnowed_fingerprints(df, id_col, text_col, k, w, hash_fn=hash_fn)
    flat = fps.select("_id", F.explode("_fps").alias("_fp"))
    a, b = flat.alias("a"), flat.alias("b")
    return (
        a.join(
            b,
            on=[F.col("a._fp") == F.col("b._fp"), F.col("a._id") < F.col("b._id")],
        )
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Duplicated-span scrub (sub-document exact dedup)
# ---------------------------------------------------------------------------

def span_blocks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_id, _b: long, _btxt, _h) — one row per fixed-``k``-word block.

    Sub-document unit for the duplicated-span scrub (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", which
    removes repeated ~50-token spans rather than whole documents; C4 used
    3-sentence spans). Blocks are NON-overlapping k-word windows — unlike
    ``shingle_hash_rows`` every token belongs to exactly one block, so the
    relation is O(tokens/k) rows and the scrubbed document reassembles
    losslessly from the kept blocks.

    Built explode-then-groupBy (posexplode tokens -> block index =
    floor(pos/k) -> order-restoring collect) rather than as nested
    array-slice expressions: the aggregation is a projection-collapse
    barrier, so the O(tokens) tokenization runs once per document instead
    of once per block reference (see module docstring). The one shuffle is
    keyed by id — skew-safe, documents are bounded.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("_pos", "_tok"),
    )
    blocks = (
        toks.groupBy("_id", (F.col("_pos") / k).cast("long").alias("_b"))
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_tok"))).alias("_st"))
        .select(
            "_id",
            "_b",
            F.concat_ws(
                " ", F.transform(F.col("_st"), lambda s: s["_tok"])
            ).alias("_btxt"),
        )
    )
    return blocks.withColumn("_h", _base_hash(F.col("_btxt"), hash_fn))


def duplicated_span_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    max_docs: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Strip every k-word block that occurs in more than ``max_docs``
    documents; reassemble the survivors in order.

    Returns one row per input document:
    (id_col, n_spans, dup_spans, clean_text) where ``clean_text`` is the
    space-joined concatenation of the kept blocks (''  when the document
    tokenizes empty or every span was duplicated boilerplate).

    Scale shape: block relation is O(tokens/k); the global frequency pass
    is a count-distinct-docs groupBy on the 8-byte block hash (two-phase,
    partial aggs collapse the boilerplate skew map-side); the frequency
    join is hash-on-hash (big-big — at web scale the duplicated-span set
    is itself huge, so no broadcast; AQE handles residual skew); the
    reassembly groupBy reuses the document key. No step is ever all-pairs
    and nothing exceeds O(corpus tokens / k) rows.
    """
    blocks = span_blocks(df, id_col, text_col, k, hash_fn)
    freq = blocks.groupBy("_h").agg(
        F.count_distinct("_id").alias("_nd")
    )
    flagged = blocks.join(freq, "_h").withColumn(
        "_dup", (F.col("_nd") > max_docs).cast("int")
    )
    per_doc = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("_dup").cast("long").alias("dup_spans"),
        F.concat_ws(
            " ",
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "_b",
                                F.when(F.col("_dup") == 0, F.col("_btxt")).alias(
                                    "_kt"
                                ),
                            )
                        )
                    ),
                    lambda s: s["_kt"],
                ),
                lambda t: t.isNotNull(),
            ),
        ).alias("clean_text"),
    )
    base = df.select(F.col(id_col).alias("_id"))
    return base.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
        F.coalesce("dup_spans", F.lit(0).cast("long")).alias("dup_spans"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """CCNet-style cross-corpus paragraph deduplication (Wenzek et al.
    2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data", §3.1) — the pipeline stage CCNet runs FIRST, before any
    LM scoring: split every document into paragraphs (newline-separated,
    as CCNet does), hash a normalized form of each, and drop every
    paragraph whose normalized hash appears in more than ``max_docs``
    documents EXCEPT its first occurrence. CCNet reports this removes
    ~70% of raw Common Crawl text (dates, navigation, cookie banners).

    Normalization (documented subset of CCNet's: they lowercase, map
    digits to zero, and strip punctuation before hashing): lowercase,
    every digit run -> '0', whitespace collapsed, ends trimmed. Both
    engines replay it with the same two regexes, so the md5 variant is
    bit-identical cross-engine.

    "First occurrence" is deterministic: the minimum (id, paragraph
    position) struct over the hash group — a plain ``min`` aggregate, so
    the winner election is map-side combinable (the all-reduce never
    sees more than one candidate row per partition per hash, which is
    what makes the cookie-banner hash with 10^9 occurrences survivable).
    Survivors reassemble in original order with their ORIGINAL bytes
    (normalization only keys the hash). Blank paragraphs never enter the
    paragraph relation and the reassembly joins survivors with single
    newlines — the documented contract (CCNet likewise re-joins kept
    paragraphs rather than preserving blank runs).

    Returns one row per input document:
    (id_col, n_paras, dup_paras, clean_text) — ``dup_paras`` counts the
    paragraphs this document LOST; ``clean_text`` is '' when every
    paragraph was someone else's boilerplate (downstream drops empties).

    Scale shape at 10^12 docs: the paragraph relation is O(total lines);
    the winner election is one min-aggregate groupBy on the 8-byte hash
    (two-phase, partial aggs collapse boilerplate skew map-side); the
    verdict join is hash-on-hash (big-big, AQE handles residual skew);
    reassembly reuses the document key. No step is all-pairs and no
    per-hash state exceeds one (id, pos) struct.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("_ptxt")), "[0-9]+", "0"),
            "\\s+",
            " ",
        )
    )
    paras = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_ptxt"),
        )
        .filter(F.trim(F.col("_ptxt")) != "")
        .withColumn("_h", _base_hash(norm, hash_fn))
    )
    winners = paras.groupBy("_h").agg(
        F.min(F.struct("_id", "_pos")).alias("_w"),
        F.count_distinct("_id").alias("_nd"),
    )
    flagged = paras.join(winners, "_h").withColumn(
        "_dup",
        (
            (F.col("_nd") > max_docs)
            & ~((F.col("_w._id") == F.col("_id")) & (F.col("_w._pos") == F.col("_pos")))
        ).cast("int"),
    )
    per_doc = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum("_dup").cast("long").alias("dup_paras"),
        F.concat_ws(
            "\n",
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "_pos",
                                F.when(F.col("_dup") == 0, F.col("_ptxt")).alias(
                                    "_kt"
                                ),
                            )
                        )
                    ),
                    lambda s: s["_kt"],
                ),
                lambda t: t.isNotNull(),
            ),
        ).alias("clean_text"),
    )
    base = df.select(F.col(id_col).alias("_id"))
    return base.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_paras", F.lit(0).cast("long")).alias("n_paras"),
        F.coalesce("dup_paras", F.lit(0).cast("long")).alias("dup_paras"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def paragraph_dedup_against(
    df: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """Cross-ARRIVAL form of :func:`paragraph_dedup` (max_docs=1
    semantics): a paragraph drops when its normalized hash is in the
    ``seen`` index (one ``_h`` long column — any earlier arrival already
    published it) OR when it is a non-first occurrence within this
    batch. Returns ``(per_doc, new_hashes)``: ``per_doc`` has
    :func:`paragraph_dedup`'s exact output shape, ``new_hashes`` is the
    distinct hash relation of the paragraphs this batch KEPT — append it
    to the index so the next arrival's gate sees them.

    Equivalence contract (pinned by the streaming twin's pytest): when
    arrivals carry ascending ids, gating batches against the growing
    index composes to EXACTLY ``paragraph_dedup(union_of_all_batches,
    max_docs=1)`` — the in-batch min-(id,pos) winner and the
    index-priority rule together reproduce the global first-occurrence
    election.

    Scale shape: the batch explodes to O(batch lines); the index probe
    is a hash equi-join (batch-side small, index-side a bare 8-byte
    column relation); the index never self-joins and never re-reads the
    corpus."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("_ptxt")), "[0-9]+", "0"),
            "\\s+",
            " ",
        )
    )
    paras = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_ptxt"),
        )
        .filter(F.trim(F.col("_ptxt")) != "")
        .withColumn("_h", _base_hash(norm, hash_fn))
    )
    seen_h = (
        seen.select(F.col(seen.columns[0]).alias("_h"))
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    marked = paras.join(seen_h, "_h", "left")
    winners = marked.groupBy("_h").agg(
        F.min(F.struct("_id", "_pos")).alias("_w"),
        F.count_distinct("_id").alias("_nd"),
    )
    flagged = marked.join(winners, "_h").withColumn(
        "_dup",
        (
            F.col("_seen").isNotNull()
            | (
                (F.col("_nd") > 1)
                & ~(
                    (F.col("_w._id") == F.col("_id"))
                    & (F.col("_w._pos") == F.col("_pos"))
                )
            )
        ).cast("int"),
    )
    per_doc = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum("_dup").cast("long").alias("dup_paras"),
        F.concat_ws(
            "\n",
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "_pos",
                                F.when(F.col("_dup") == 0, F.col("_ptxt")).alias(
                                    "_kt"
                                ),
                            )
                        )
                    ),
                    lambda s: s["_kt"],
                ),
                lambda t: t.isNotNull(),
            ),
        ).alias("clean_text"),
    )
    base = df.select(F.col(id_col).alias("_id"))
    out = base.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_paras", F.lit(0).cast("long")).alias("n_paras"),
        F.coalesce("dup_paras", F.lit(0).cast("long")).alias("dup_paras"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
    new_hashes = flagged.filter(F.col("_dup") == 0).select("_h").distinct()
    return out, new_hashes


# Sentence segmentation marker: U+001F (unit separator) — inserted after
# terminal punctuation, then split on. Never occurs in curated web text
# (the C4 line filter and charset layer strip C0 controls upstream).
_SENT_MARK = "\u001f"
# Explicit whitespace class, NOT \s: Java's \s includes \x0B where RE2's
# does not — spelling the class out keeps the Spark split and the DuckDB
# oracle replay byte-identical on any input.
_SENT_BREAK_RX = "([.!?])[ \\t\\n\\r]+"


def split_sentences(col: Column) -> Column:
    """array<string> of sentences: break after a [.!?] terminal
    punctuation character followed by whitespace (the whitespace run is
    consumed — it IS the boundary). Deliberately a fixed two-step rule
    (mark, then split) so any ANSI engine replays it with the same two
    regexes; no abbreviation lexicon ("Dr. Smith" splits — documented
    cap, the same one CCNet's Moses-based splitter has for unlisted
    abbreviations)."""
    return F.split(
        F.regexp_replace(col, _SENT_BREAK_RX, "$1" + _SENT_MARK), _SENT_MARK
    )


def sentence_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Cross-corpus SENTENCE deduplication — :func:`paragraph_dedup` at
    sentence granularity (the unit bitext mining and TTS corpora dedup
    at; also the scrub CCNet applies to the paragraph survivors'
    interior). Same normalization (lowercase, digit runs -> '0',
    whitespace collapse, trim), same 8-byte hash, same map-side-
    combinable min-(id, position) first-occurrence winner, survivors
    reassembled in order — joined with single spaces (sentences, unlike
    paragraphs, carry no meaningful separator bytes of their own once
    the boundary whitespace is consumed by the splitter).

    Returns (id_col, n_sents, dup_sents, clean_text), one row per input
    document. Scale shape identical to :func:`paragraph_dedup`: the
    sentence relation is O(total sentences), winner election is one
    two-phase min aggregate on the hash, no per-hash state beyond one
    (id, pos) struct — a 10^9-occurrence boilerplate sentence collapses
    map-side."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("_stxt")), "[0-9]+", "0"),
            "\\s+",
            " ",
        )
    )
    sents = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(split_sentences(F.col(text_col))).alias("_pos", "_stxt"),
        )
        .filter(F.trim(F.col("_stxt")) != "")
        .withColumn("_h", _base_hash(norm, hash_fn))
    )
    winners = sents.groupBy("_h").agg(
        F.min(F.struct("_id", "_pos")).alias("_w"),
        F.count_distinct("_id").alias("_nd"),
    )
    flagged = sents.join(winners, "_h").withColumn(
        "_dup",
        (
            (F.col("_nd") > max_docs)
            & ~((F.col("_w._id") == F.col("_id")) & (F.col("_w._pos") == F.col("_pos")))
        ).cast("int"),
    )
    per_doc = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sents"),
        F.sum("_dup").cast("long").alias("dup_sents"),
        F.concat_ws(
            " ",
            F.filter(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "_pos",
                                F.when(F.col("_dup") == 0, F.col("_stxt")).alias(
                                    "_kt"
                                ),
                            )
                        )
                    ),
                    lambda s: s["_kt"],
                ),
                lambda t: t.isNotNull(),
            ),
        ).alias("clean_text"),
    )
    base = df.select(F.col(id_col).alias("_id"))
    return base.join(per_doc, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("n_sents", F.lit(0).cast("long")).alias("n_sents"),
        F.coalesce("dup_sents", F.lit(0).cast("long")).alias("dup_sents"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
