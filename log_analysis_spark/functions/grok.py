"""Grok-pattern field extraction compiled to native regex projections.

The reference pipeline's parse stage is hand-written per-row Rust string
splitting (``/root/reference/src/zeek/zeek_search.rs`` tokenizes each line
field-by-field); the idiomatic log-pipeline equivalent is a *grok* pattern —
the ``%{SYNTAX:semantic}`` dialect popularized by Logstash — compiled down
to one anchored regular expression. This module implements that dialect
from scratch on public semantics:

- ``%{PATTERN}``                match a base pattern, capture nothing
- ``%{PATTERN:field}``          capture as string column ``field``
- ``%{PATTERN:field:int}``      capture and cast (``int`` -> long,
  ``float`` -> double)
- literal text between tokens matches verbatim (regex-escaped)
- user patterns may reference other patterns recursively (cycles are an
  error, depth-bounded)

Execution model: the compiled regex uses ONE capturing group per named
field (everything else non-capturing), so extraction is a plain column
projection of ``regexp_extract(col, rx, group_i)`` — JVM-side, inside
WholeStageCodegen, no Python in the hot path. Non-matching lines yield
NULL for every field (guarded by ``rlike``; Spark's bare
``regexp_extract`` would return ``''``, which a numeric cast turns into a
silent NULL-vs-empty divergence — the guard keeps both engines and both
typed/untyped fields on one story).

Cost note: Spark evaluates one ``regexp_extract`` call per field, i.e. k
regex executions per row for k fields over the same compiled pattern. For
very wide schemas (dozens of fields) prefer the single-pass Arrow kernel
(`functions/parse.py:extract_events_arrow`) which materializes all groups
from one ``re.match``; for the typical 3-8 field grok line the codegen
path wins (no Python worker round-trip).

The compiled regex restricts itself to the RE2-compatible subset (no
backreferences, no lookaround), so the SAME pattern string runs under
Java ``java.util.regex`` (Spark) and RE2 (DuckDB oracle) with identical
semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Base vocabulary — RE2-safe re-derivations of the public grok core set.
# Each entry is fully expanded (no %{} references) so compilation of a
# user pattern touches recursion only for user-supplied extras.
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE16NUM": r"(?:0[xX])?[0-9A-Fa-f]+",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPV6": r"[0-9A-Fa-f:]{2,39}",
    "IP": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[0-9A-Fa-f:]{2,39})",
    "HOSTNAME": (
        r"[A-Za-z0-9](?:[A-Za-z0-9-]{0,62})?"
        r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,62})?)*"
    ),
    "USERNAME": r"[A-Za-z0-9._-]+",
    "USER": r"[A-Za-z0-9._-]+",
    "EMAILADDRESS": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+",
    "UUID": r"[0-9A-Fa-f]{8}-(?:[0-9A-Fa-f]{4}-){3}[0-9A-Fa-f]{12}",
    "TIMESTAMP_ISO8601": (
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"
        r"(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?"
    ),
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "LOGLEVEL": (
        r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERR(?:OR)?"
        r"|CRIT(?:ICAL)?|FATAL|SEVERE|ALERT|EMERG(?:ENCY)?)"
    ),
    "URIPATH": r"/[^\s?#]*",
    "URIPARAM": r"\?[^\s#]*",
    "QUOTEDSTRING": r"\"[^\"]*\"",
    "PATH": r"(?:/[^\s?#]*|[A-Za-z]:\\[^\s]*)",
    "HTTPMETHOD": r"(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
}

_TOKEN_RE = re.compile(
    r"%\{(?P<name>[A-Z0-9_]+)(?::(?P<field>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?::(?P<type>int|long|float|double|string))?)?\}"
)

_TYPE_TO_SPARK = {
    "int": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "string": None,
    None: None,
}

_MAX_DEPTH = 16


class GrokError(ValueError):
    """Raised on unknown pattern names, bad capture types, or reference
    cycles in user-supplied pattern vocabularies."""


def _expand(name: str, vocab: dict[str, str], depth: int) -> str:
    """Resolve a pattern name to a flat regex, expanding nested %{} refs
    in user-supplied entries (capture-free: nested names can't bind
    fields)."""
    if depth > _MAX_DEPTH:
        raise GrokError(f"pattern recursion too deep (cycle through %{{{name}}}?)")
    if name not in vocab:
        raise GrokError(f"unknown grok pattern %{{{name}}}")
    body = vocab[name]

    def sub(m: re.Match) -> str:
        if m.group("field"):
            raise GrokError(
                f"pattern %{{{name}}} nests a field capture; captures are "
                "only allowed at the top level of the user pattern"
            )
        return "(?:" + _expand(m.group("name"), vocab, depth + 1) + ")"

    return _TOKEN_RE.sub(sub, body)


def grok_compile(
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
    anchored: bool = True,
) -> tuple[str, list[tuple[str, str | None, int]]]:
    """Compile a grok pattern to ``(regex, fields)`` where ``fields`` is
    ``[(field_name, spark_cast_type_or_None, capture_group_index), ...]``
    in left-to-right order, group indexes 1-based. ``anchored`` wraps the
    regex in ``^...$`` (full-line match — the Zeek/grok norm)."""
    vocab = dict(BASE_PATTERNS)
    if extra_patterns:
        vocab.update(extra_patterns)

    fields: list[tuple[str, str | None, int]] = []
    out: list[str] = []
    pos = 0
    group = 0
    for m in _TOKEN_RE.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        body = _expand(m.group("name"), vocab, 0)
        field = m.group("field")
        if field:
            group += 1
            if any(f[0] == field for f in fields):
                raise GrokError(f"duplicate field capture :{field}")
            fields.append((field, _TYPE_TO_SPARK[m.group("type")], group))
            out.append("(" + body + ")")
        else:
            out.append("(?:" + body + ")")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    rx = "".join(out)
    if anchored:
        rx = "^" + rx + "$"
    # Fail fast on regexes Python itself rejects (proxy for both engines).
    re.compile(rx)
    return rx, fields


def grok_extract(
    df: DataFrame,
    col: str | Column,
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
    keep_unmatched: bool = False,
) -> DataFrame:
    """Project one column per grok field onto ``df``. Non-matching rows
    are dropped (the router's contract for malformed lines) unless
    ``keep_unmatched`` — then they survive with every field NULL.

    All extraction is native ``rlike`` + ``regexp_extract`` — zero
    shuffle, zero Python, and a leading literal prefix in the pattern
    lets the JVM regex engine reject non-matching lines in O(prefix).
    """
    rx, fields = grok_compile(pattern, extra_patterns)
    c = F.col(col) if isinstance(col, str) else col
    matched = c.rlike(rx)
    if not keep_unmatched:
        df = df.filter(matched)
        guard = None
    else:
        guard = matched
    for name, cast, idx in fields:
        e = F.regexp_extract(c, rx, idx)
        if cast:
            e = e.cast(cast)
        if guard is not None:
            e = F.when(guard, e)
        df = df.withColumn(name, e)
    return df


def grok_oracle_exprs(
    pattern: str,
    line_expr: str,
    extra_patterns: dict[str, str] | None = None,
) -> tuple[str, list[str]]:
    """DuckDB replay helper: returns ``(match_predicate, [field_exprs])``
    mirroring :func:`grok_extract` — same regex string, same group
    indexes, CAST for typed fields. ``line_expr`` is the SQL expression
    producing the line. Single-quote escaping only (the compiled regex
    contains no single quotes unless the user pattern does)."""
    rx, fields = grok_compile(pattern, extra_patterns)
    lit = "'" + rx.replace("'", "''") + "'"
    pred = f"regexp_matches({line_expr}, {lit})"
    exprs = []
    for name, cast, idx in fields:
        e = f"regexp_extract({line_expr}, {lit}, {idx})"
        if cast == "long":
            e = f"CAST({e} AS BIGINT)"
        elif cast == "double":
            e = f"CAST({e} AS DOUBLE)"
        exprs.append(f"{e} AS {name}")
    return pred, exprs
