"""Registrable-domain (eTLD+1) extraction via public-suffix longest-match.

The reference decorates Zeek records with per-key lookups (its ip2location
step, /root/reference/src/ip2location.rs:174-222, recast in operators/
enrich.py as broadcast dim joins). For the Common-Crawl-style pages table
the analogous decoration is the *registrable domain*: the public-suffix
algorithm (publicsuffix.org/list — plain rules like ``co.uk``, wildcard
rules like ``*.ck``, exception rules like ``!www.ck``) applied to the url
host. ``enrich.enrich`` only takes the last label; this operator implements
the full longest-match algorithm.

Scale design — zero shuffle, bounded broadcast joins:

The rule list is keyed by its concrete suffix text (a wildcard rule
``*.ck`` is keyed ``ck``; an exception rule ``!www.ck`` is keyed
``www.ck``) and pre-aggregated to ONE row per key carrying the matched
public-suffix label count for each rule kind. A host with labels
``[a, b, example, co, uk]`` can only match a key of its last *i* labels,
and rule keys are at most K labels long (K is computed from the rule list
at plan time; the real PSL maxes at 5). So matching is exactly K left
BROADCAST hash joins — one per candidate suffix length — followed by one
projection that picks the prevailing rule per the public-suffix spec:

  1. an exception match wins outright; its public suffix is the rule minus
     its leftmost label (``!www.ck`` -> ``ck``);
  2. otherwise the match with the most labels prevails, where a wildcard
     rule keyed at *i* labels denotes a public suffix of *i+1* labels and
     only matches hosts with >= i+1 labels;
  3. if nothing matches, the public suffix is the last label (the spec's
     implicit ``*`` default rule).

The fact table never shuffles and never explodes: at 10^12 rows this is K
map-side hash probes against a dim of at most |rules| rows, entirely
inside whole-stage codegen. (The alternative — explode the candidate
suffixes and re-aggregate per host — costs a full-corpus shuffle for the
re-aggregation; rejected.)

Matching is on the lowercased host, per spec. Punycode/IDNA normalization
is out of scope (hosts in the pages table are already ASCII).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic modeled subset of the public suffix list: enough to
# exercise every rule kind (multi-label plain, private-registry plain,
# wildcard, exception, single-label plain) while staying a fixture.
# Callers with the real PSL pass their own ``rules`` list — the algorithm
# and plan shape are unchanged (K grows to 5).
DEFAULT_RULES = [
    "com",
    "org",
    "net",
    "io",
    "de",
    "fr",
    "uk",
    "edu",
    "cn",
    "au",
    "co.uk",
    "ac.uk",
    "com.au",
    "github.io",
    "s3.amazonaws.com",
    "*.ck",
    "!www.ck",
]


def _keyed_rules(rules: list[str]) -> dict[str, dict[str, int]]:
    """rule list -> {key: {plain|wc|exc: public-suffix label count}}.

    key = the concrete label suffix a host candidate can equal; the value
    is the label count of the PUBLIC SUFFIX that kind of match implies.
    """
    keyed: dict[str, dict[str, int]] = {}
    for rule in rules:
        if rule.startswith("!"):
            key = rule[1:]
            kind, ps = "exc", len(key.split(".")) - 1
        elif rule.startswith("*."):
            key = rule[2:]
            kind, ps = "wc", len(key.split(".")) + 1
        else:
            key = rule
            kind, ps = "plain", len(key.split("."))
        if ps < 1:
            raise ValueError(f"degenerate rule {rule!r}")
        keyed.setdefault(key, {})[kind] = ps
    return keyed


def registrable_domain(
    df: DataFrame,
    host_col: str = "host",
    rules: list[str] | None = None,
    suffix_col: str = "public_suffix",
    out_col: str = "registrable_domain",
) -> DataFrame:
    """Add ``public_suffix`` and ``registrable_domain`` columns.

    ``registrable_domain`` is NULL when the host IS a public suffix (or is
    a single label with no matching rule's parent). NULL hosts propagate
    NULL through both columns.
    """
    keyed = _keyed_rules(rules if rules is not None else DEFAULT_RULES)
    k_max = max(len(k.split(".")) for k in keyed)
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [
            (k, v.get("plain"), v.get("wc"), v.get("exc"))
            for k, v in sorted(keyed.items())
        ],
        "suffix_key string, _plain int, _wc int, _exc int",
    )

    # substring_index, NOT split+slice+concat_ws: the label-array route
    # allocates an array plus per-candidate rebuilt strings on EVERY row,
    # and the pipeline A/B measured it at ~27% of total parse->sink wall;
    # substring_index('a.b.c', '.', -i) yields the same last-i-labels
    # string (including degenerate empty-label cases) as one scan of the
    # string tail, and the label count is a translate+length, no array.
    h = F.lower(F.col(host_col))
    n = F.length(h) - F.length(F.translate(h, ".", "")) + 1
    out = df.withColumn("_h", h).withColumn("_n", n)
    for i in range(1, k_max + 1):
        cand = F.when(
            F.col("_n") >= i, F.substring_index(F.col("_h"), ".", -i)
        )
        dim_i = dim.select(
            F.col("suffix_key").alias(f"_cand{i}"),
            F.col("_plain").alias(f"_p{i}"),
            F.col("_wc").alias(f"_w{i}"),
            F.col("_exc").alias(f"_e{i}"),
        )
        out = out.withColumn(f"_cand{i}", cand).join(
            F.broadcast(dim_i), on=f"_cand{i}", how="left"
        )

    # prevailing public-suffix label count, per the spec's precedence
    exc = F.coalesce(
        *[F.col(f"_e{i}") for i in range(k_max, 0, -1)]
    ) if k_max > 1 else F.col("_e1")
    candidates: list[Column] = []
    for i in range(1, k_max + 1):
        candidates.append(F.when(F.col(f"_p{i}").isNotNull(), F.lit(i)))
        candidates.append(
            F.when(
                F.col(f"_w{i}").isNotNull() & (F.col("_n") >= i + 1),
                F.lit(i + 1),
            )
        )
    prevailing = F.greatest(*candidates, F.lit(1))
    ps_n = F.when(F.col(host_col).isNotNull(), F.coalesce(exc, prevailing))

    out = out.withColumn("_psn", ps_n)
    ps = F.expr("substring_index(_h, '.', -cast(_psn as int))")
    reg = F.when(
        F.col("_n") > F.col("_psn"),
        F.expr("substring_index(_h, '.', -(cast(_psn as int) + 1))"),
    )
    out = out.withColumn(
        suffix_col, F.when(F.col("_psn").isNotNull(), ps)
    ).withColumn(out_col, reg)
    drop = ["_h", "_n", "_psn"] + [
        f"_{p}{i}" for i in range(1, k_max + 1) for p in ("cand", "p", "w", "e")
    ]
    return out.drop(*drop)


def keyed_rules_sql_values(rules: list[str] | None = None) -> str:
    """The keyed rule dim as a SQL VALUES list — shared with the DuckDB
    oracle so both engines match against byte-identical rows."""
    keyed = _keyed_rules(rules if rules is not None else DEFAULT_RULES)

    def lit(v: int | None) -> str:
        return "NULL" if v is None else str(v)

    return ", ".join(
        f"('{k}', {lit(v.get('plain'))}, {lit(v.get('wc'))}, {lit(v.get('exc'))})"
        for k, v in sorted(keyed.items())
    )


def max_key_labels(rules: list[str] | None = None) -> int:
    keyed = _keyed_rules(rules if rules is not None else DEFAULT_RULES)
    return max(len(k.split(".")) for k in keyed)


# ---------------------------------------------------------------------------
# crawl deny/allow lists
# ---------------------------------------------------------------------------
def blocklist_filter(
    df: DataFrame,
    url_col: str = "url",
    host_col: str | None = None,
    block_suffixes: list[str] | None = None,
    block_prefixes: list[str] | None = None,
    allow_suffixes: list[str] | None = None,
    allow_prefixes: list[str] | None = None,
    flag_col: str | None = None,
) -> DataFrame:
    """Crawl-hygiene deny/allow filtering — the stage every web-corpus
    pipeline runs right after URL canonicalization (spam/adult/banned
    host lists, per-path opt-outs).

    Rule kinds (all matched against the lowercased registrable host,
    port excluded, and the raw url string):
      - ``block_suffixes``:  host equals the rule or ends with
        ``.<rule>`` — the hosts-file semantic ("example.com" blocks the
        apex and every subdomain).
      - ``block_prefixes``:  raw ``url.startswith(prefix)`` — per-path
        bans. Rules should be in canonical case (compose with
        ``canonical_url`` upstream for case-robust matching).
      - ``allow_*``: same shapes; an allow match overrides any block
        (the exception-rule semantic of public deny-list formats).

    NULL urls/hosts match nothing and pass through.

    Scale design — zero fact-side shuffle, like :func:`registrable_domain`:
    suffix rules group by their label count into at most K tiny dims,
    matched by K broadcast equi-joins on ``substring_index(host,'.',-i)``
    (never a per-row rule scan, never an explode); prefix rules group by
    their url host into one broadcast dim carrying a sorted prefix array,
    matched map-side with ONE ``exists(startswith)`` over that row's (few)
    candidate prefixes. At 10^12 rows the whole filter is map-side hash
    probes inside codegen.

    ``flag_col=None`` drops blocked rows; a name instead keeps every row
    and adds a boolean verdict column (audit mode).
    """
    spark = df.sparkSession
    host = (
        F.lower(F.col(host_col))
        if host_col
        else F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    )
    out = df.withColumn("_blh", host)
    n = F.length("_blh") - F.length(F.translate(F.col("_blh"), ".", "")) + 1
    out = out.withColumn("_bln", n)

    match_cols: dict[str, list[Column]] = {"block": [], "allow": []}
    tag = 0
    for kind, suffixes in (("block", block_suffixes), ("allow", allow_suffixes)):
        by_len: dict[int, list[str]] = {}
        for s in suffixes or []:
            by_len.setdefault(len(s.split(".")), []).append(s.lower())
        for i, rules_i in sorted(by_len.items()):
            tag += 1
            c = f"_blsfx{tag}"
            dim = spark.createDataFrame(
                [(r, True) for r in sorted(set(rules_i))], f"{c} string, _blhit{tag} boolean"
            )
            cand = F.when(F.col("_bln") >= i, F.substring_index(F.col("_blh"), ".", -i))
            out = out.withColumn(c, cand).join(F.broadcast(dim), on=c, how="left")
            match_cols[kind].append(F.col(f"_blhit{tag}").isNotNull() & F.col(f"_blhit{tag}"))

    prefix_exprs: dict[str, Column] = {}
    for kind, prefixes in (("block", block_prefixes), ("allow", allow_prefixes)):
        if not prefixes:
            continue
        tag += 1
        by_host: dict[str, list[str]] = {}
        for p in prefixes:
            import re as _re

            m = _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", p)
            if not m or not m.group(1):
                raise ValueError(f"prefix rule must be an absolute URL: {p!r}")
            by_host.setdefault(m.group(1).lower(), []).append(p)
        dim = spark.createDataFrame(
            [(h, sorted(ps)) for h, ps in sorted(by_host.items())],
            f"_blph{tag} string, _blpfx{tag} array<string>",
        )
        out = out.join(
            F.broadcast(dim), on=out["_blh"] == F.col(f"_blph{tag}"), how="left"
        ).drop(f"_blph{tag}")
        u = F.col(url_col)
        match_cols[kind].append(
            F.col(f"_blpfx{tag}").isNotNull()
            & F.exists(F.col(f"_blpfx{tag}"), lambda p: u.startswith(p))
        )

    def _any(cols: list[Column]) -> Column:
        acc = F.lit(False)
        for c in cols:
            acc = acc | F.coalesce(c, F.lit(False))
        return acc

    blocked = _any(match_cols["block"]) & ~_any(match_cols["allow"])
    drop = [c for c in out.columns if c.startswith("_bl")]
    if flag_col is None:
        return out.filter(~blocked).drop(*drop)
    return out.withColumn(flag_col, blocked).drop(*drop)
