"""Distributed BPE tokenizer training (Sennrich et al. 2016).

``functions/textstats.bpe_ish_token_count`` counts with a fixed regex;
this module LEARNS the merge table — the actual tokenizer-training step
of a corpus pipeline. Classic byte-pair encoding over words:

1. word histogram — the corpus collapses to (word, count) ONCE; all
   iterations run on this vocabulary-bounded relation (the standard BPE
   trick: 10^12 tokens -> ~10^6-10^8 distinct words, a dim table);
2. symbols = the word's characters + an end-of-word marker;
3. each merge step counts adjacent symbol pairs weighted by word count
   (one explode + keyed agg over the vocab relation, map-side partials),
   picks the most frequent pair (deterministic tiebreak: count DESC,
   then pair lexicographic — one single-row collect per step, exactly
   the bounded-action pattern of kmeans/pagerank), and rewrites every
   word's symbol list with a greedy-left merge fold;
4. the learned merges apply to unseen text with the same fold
   (:func:`bpe_segment`).

Determinism/oracle: everything is integer counts, string compares, and
order-pinned folds — the DuckDB oracle unrolls the merge steps
(list_reduce with the single-element-list trick for the typed init) and
reproduces the merge table bit-for-bit. Greedy-left overlap semantics
("aaa" + merge a+a -> [aa, a]) are part of the contract and pinned by
test and oracle alike.

Scale notes: iteration state is O(vocab), never O(corpus); lineage is
truncated with localCheckpoint every few merges (the dup_clusters
lesson); the per-step argmax is a 1-row collect. Production BPE uses
thousands of merges — each step is one tiny-relation pass here, and the
incremental pair-count update trick (only words containing the merged
pair change) is a documented optimization seam, not needed at vocab
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

END = "</w>"


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt) corpus word histogram — the one corpus-wide pass."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _initial_symbols(w: Column) -> Column:
    return F.concat(
        F.regexp_extract_all(w, F.lit("."), F.lit(0)), F.array(F.lit(END))
    )


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Greedy-left rewrite of one merge over a symbol array."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left)
            & (x == right),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = F.arrays_zip(
        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("l"),
        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("r"),
    )
    return (
        words.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("n"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges -> [(step, left, right, count)].

    Stops early if no adjacent pair remains (vocabulary exhausted).
    Ties break deterministically: highest count, then (left, right)
    lexicographic — identical in the SQL replay's ORDER BY.
    """
    words = word_histogram(df, text_col).select(
        "cnt", _initial_symbols(F.col("w")).alias("syms")
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((step, l, r, n))
        words = words.select("cnt", _merge_fold(F.col("syms"), l, r).alias("syms"))
        if (step + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


# --- byte-level BPE (GPT-2 style) -------------------------------------------
#
# Production tokenizers (GPT-2, Radford et al. 2019; tiktoken/HF BPE) are
# BYTE-level: the unit alphabet is the 256 byte values, so ANY input —
# any language, emoji, binary-ish noise — tokenizes with zero OOV, and a
# regex PRE-tokenizer bounds merges so they never cross word/space
# boundaries. This block reuses the word-level machinery above
# (`_merge_fold`, `_pair_counts` are symbol-agnostic) with two changes:
#
# - symbols are 2-hex-char byte codes from `hex(pretoken)` (both Spark
#   and DuckDB hex() a VARCHAR's UTF-8 bytes, uppercase — verified
#   bit-identical), so a learned token is a hex string that `unhex`
#   decodes back to exact bytes: decode(encode(x)) == x for ARBITRARY
#   text, no end-of-word marker needed;
# - the pre-tokenizer is GPT-2-STYLE but lookahead-free: RE2 (the
#   DuckDB oracle's engine) has no (?!...), so GPT-2's trailing-space
#   alternative `\s+(?!\S)` is dropped and whitespace runs bind greedily
#   left (" a  b" -> [' a', '  ', 'b'] vs GPT-2's [' a', ' ', ' b']).
#   Documented deviation: token BOUNDARIES at multi-space runs differ
#   from GPT-2; coverage is still total (every char falls in exactly one
#   alternative), which is what the round-trip property needs. \s is
#   also spelled as an explicit class — Java's \s includes \x0B, RE2's
#   does not, and the two engines must split identically.
GPT2_SPLIT_RX = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+| ?\p{N}+"
    r"| ?[^ \t\n\r\x0B\f\p{L}\p{N}]+"
    r"|[ \t\n\r\x0B\f]+"
)


def pretokenize(text: Column) -> Column:
    """GPT-2-style pre-token array (leading spaces ride with the token)."""
    return F.regexp_extract_all(text, F.lit(GPT2_SPLIT_RX), F.lit(0))


def _byte_symbols(w: Column) -> Column:
    """Per-byte symbol array: UTF-8 bytes as 2-hex-char codes."""
    return F.regexp_extract_all(F.hex(w), F.lit(".."), F.lit(0))


def pretoken_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt) pre-token histogram — the one corpus pass of byte BPE."""
    return (
        df.select(F.explode(pretokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def bpe_train_bytes(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, int]]:
    """Learn byte-level merges -> [(step, lhs_hex, rhs_hex, count)].

    Same vocabulary-bounded loop as :func:`bpe_train` (one explode+agg
    plus a 1-row argmax collect per step, greedy-left rewrite fold,
    count-DESC-then-lex tiebreak), over the pre-token histogram with
    hex-byte symbols. Merges never cross pre-token boundaries by
    construction — the GPT-2 property that keeps the merge table
    word-shape-aware without an end-of-word marker."""
    words = pretoken_histogram(df, text_col).select(
        "cnt", _byte_symbols(F.col("w")).alias("syms")
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((step, l, r, n))
        words = words.select("cnt", _merge_fold(F.col("syms"), l, r).alias("syms"))
        if (step + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_encode_bytes(
    text: Column, merges: list[tuple[int, str, str, int]]
) -> Column:
    """Encode a text column with a learned byte-merge table -> array of
    hex-string tokens (pre-tokenize, per-pre-token greedy-left folds in
    merge order, flatten in document order)."""

    def seg(w: Column) -> Column:
        syms = _byte_symbols(w)
        for _, left, right, _n in merges:
            syms = _merge_fold(syms, left, right)
        return syms

    return F.flatten(F.transform(pretokenize(text), seg))


def bpe_decode_bytes(tokens: Column) -> Column:
    """Exact inverse of :func:`bpe_encode_bytes`: tokens are hex byte
    strings, so decode is unhex(concat) -> UTF-8. decode(encode(x)) == x
    for arbitrary input (round-trip property test)."""
    return F.decode(F.unhex(F.concat_ws("", tokens)), "UTF-8")


def bpe_segment(word: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Apply a learned merge table to a word column -> subword array
    (the encode step; merges apply in learned order, same greedy-left
    fold as training). Expression depth grows with len(merges) — fine
    for the tens of merges tested here; a production encoder with
    thousands of merges belongs in an Arrow kernel (same seam as
    pq_encode_arrow)."""
    syms = _initial_symbols(word)
    for _, left, right, _n in merges:
        syms = _merge_fold(syms, left, right)
    return syms
