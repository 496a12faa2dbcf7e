"""Text-analysis functions for the training-data pipeline layer.

The reference analyzes log *records*; a 100 TB web-text engine also needs
document-level text analytics (language ID, quality scoring, token counts,
fingerprints). Everything here is **native Column expressions** — no Python
in the hot path, whole-stage codegen end-to-end — and every function has an
exactly-equivalent ANSI-SQL form (see ``__spark_entry__.oracle_sql``) so
results are oracle-checkable bit-for-bit (integer counts, int/int IEEE
divisions, and left-to-right deterministic folds only).

Scale notes: all functions are embarrassingly parallel per-row map
operations — zero shuffles, no UDF serialization; at 10^12 rows they run at
scan speed inside the same codegen stage as the parquet read.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword sets per language. Shared single source of truth: the SQL oracle
# strings are generated from these same lists (``__spark_entry__``).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "that", "it", "is", "was", "for",
           "on", "are", "with", "as", "they", "at", "this", "have", "from"],
    "de": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "ist", "im", "dem", "nicht", "ein", "eine"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "du", "une", "que",
           "dans", "qui", "pour", "sur", "se", "pas", "plus", "par", "avec"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "ser", "se", "no",
           "haber", "por", "con", "su", "para", "como", "estar", "tener"],
}
LANGID_ORDER = ["en", "de", "fr", "es"]  # deterministic tiebreak order

PUNCT_CLASS = r"[.,!?;:]"  # explicit class: identical semantics Java regex / RE2
FP_MOD = 2147483647  # 2^31-1, keeps the rolling hash inside BIGINT in both engines


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array (not [''])."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens (with multiplicity) in ``lang``'s stopword list."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(stop, t)))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: weighted mix of length fitness, low punct
    density, and stopword ratio. Pure int/int IEEE arithmetic -> bit-stable
    across engines."""
    n_tok = token_count(text).cast("double")
    n_chr = F.length(text).cast("double")
    stop_ratio = F.when(
        n_tok > 0, stopword_hits(text, "en").cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chr > 0, punct_count(text).cast("double") / n_chr
    ).otherwise(F.lit(0.0))
    len_fit = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    return len_fit * F.lit(0.5) + stop_ratio * F.lit(0.3) + (F.lit(1.0) - punct_ratio) * F.lit(0.2)


def langid(text: Column) -> Column:
    """Stopword-profile language ID with deterministic ties.

    argmax over per-language stopword hit counts; ties resolve to the first
    language in LANGID_ORDER; zero hits everywhere -> 'unknown'.
    """
    hits = {lg: stopword_hits(text, lg) for lg in LANGID_ORDER}
    best = F.greatest(*hits.values())
    expr = F.lit("unknown")
    # build reversed so earlier languages win ties
    for lg in reversed(LANGID_ORDER):
        expr = F.when((best > 0) & (hits[lg] == best), F.lit(lg)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash (base 31 mod 2^31-1) over the code points of
    the text's lowercase-ascii projection. Deterministic left-to-right fold;
    identical in Spark (``aggregate``) and DuckDB (``list_reduce``)."""
    ascii_only = F.regexp_replace(F.lower(text), r"[^a-z ]", "")
    chars = F.filter(F.split(ascii_only, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FP_MOD,
    )


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization: letter runs, digit runs, single symbols —
    the usual byte-pair-encoding pre-split, as one native regexp pass.
    Identical RE2/Java semantics for this pattern."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


# PII patterns chosen for identical Java-regex / RE2 semantics (no
# lookaround, no backrefs) so the DuckDB oracle replays them exactly
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_ipv4) occurrence counts — native regexp passes."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).cast("long"),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_RE), 0)).cast("long"),
    )


def redact_pii(text: Column) -> Column:
    """Mask emails then IPv4s with typed placeholder tokens — the standard
    scrub stage before corpus publication. Order matters (an email can
    contain digits-and-dots that would half-match the IP pattern after
    partial masking); both replacements are single native regexp passes."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; used by dedup (Jaccard / MinHash)."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


# Unicode script profiling: multilingual corpora route documents to
# script-appropriate tokenizers (whitespace tokenization is meaningless
# for CJK; Arabic needs its own normalization), and mixed-script text is
# itself a spam/obfuscation signal. Ranges are the core BMP blocks per
# the Unicode standard; counts are chars-in-class via the
# length-minus-stripped identity (one native regexp_replace per class,
# zero shuffle, identical semantics under Java regex and RE2).
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "A-Za-z"),
    ("cyrillic", "Ѐ-ӿ"),
    ("cjk", "一-鿿"),
    ("arabic", "؀-ۿ"),
    ("hangul", "가-힣"),
]


def script_counts(text: Column) -> list[Column]:
    """One count column per SCRIPT_RANGES entry (aliased `n_<script>`)."""
    return [
        (
            F.length(text) - F.length(F.regexp_replace(text, f"[{rng}]", ""))
        ).cast("long").alias(f"n_{name}")
        for name, rng in SCRIPT_RANGES
    ]


def dominant_script(text: Column) -> Column:
    """First script (in SCRIPT_RANGES order) holding the max class count;
    'none' when no script chars at all. The fixed priority order IS the
    tiebreak, stated so the replay can mirror it as a CASE chain."""
    counts = [
        F.length(text) - F.length(F.regexp_replace(text, f"[{rng}]", ""))
        for _name, rng in SCRIPT_RANGES
    ]
    m = F.greatest(*counts)
    out = F.lit("none")
    for (name, _rng), c in reversed(list(zip(SCRIPT_RANGES, counts))):
        out = F.when(c == m, F.lit(name)).otherwise(out)
    return F.when(m == 0, F.lit("none")).otherwise(out)
