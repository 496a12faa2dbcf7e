"""robots.txt parsing and URL filtering (RFC 9309).

A crawl-derived corpus must honor the crawl-exclusion protocol: the
per-host ``robots.txt`` bodies ride along in the crawl snapshot, and the
pipeline re-applies them when re-processing (agent policy changes,
retro-active opt-out sweeps). This operator family parses the raw bodies
into rule groups and filters a URL table against them — entirely with
native expressions, no Python in the hot path.

Semantics implemented (RFC 9309 + the now-standardized wildcard forms):

- Line model: ``#`` comments stripped, directives matched
  case-insensitively (``User-agent`` / ``Allow`` / ``Disallow``); unknown
  directives (``Crawl-delay``, ``Sitemap``) are ignored; blank/garbage
  lines are ignored.
- Groups: consecutive ``User-agent`` lines open ONE group that owns the
  rules that follow; a ``User-agent`` line after rules starts a new
  group. Rules before any ``User-agent`` line belong to no group and are
  dropped (spec-invalid).
- Agent selection: all groups whose agent set contains the product token
  (case-insensitive exact token; token-prefix matching like
  ``FooBot/1.2`` -> ``foobot`` is the caller's normalization, documented
  cap) are MERGED per RFC 9309 §2.2.1; if none match, the ``*`` groups
  apply; a host with neither — or with no robots body at all — allows
  everything.
- Rule matching: a rule's path pattern matches the URL's path+query,
  anchored at the path start, with ``*`` = any char run and a trailing
  ``$`` = end anchor. Empty-value rules are no-ops (``Disallow:`` alone
  means allow-all) and are dropped at parse time.
- Precedence: the longest (most specific, by raw pattern length) matching
  rule wins; ``Allow`` wins length ties; no match -> allowed.

Scale design: parsing is one ``posexplode`` over robots lines plus two
per-host window functions — state is O(robots lines), never touching the
URL corpus. The compiled per-host rule arrays form a dim that BROADCASTS
to the URL table (robots bodies are tiny; hosts are ~10^8 rows of a few
hundred bytes of rules — still a dim next to 10^12 URLs; for a
pathological rule corpus pass ``broadcast_dim=False`` and the join
becomes a host-keyed shuffle). The verdict is ONE map-side fold over the
(few) rules of that host: the inner segment walk folds over the rule's
``*``-split segments using only substr/instr arithmetic, so the whole
filter stays inside whole-stage codegen.

Determinism/oracle: every step is integer/string-exact — the DuckDB
oracle replays parse, group selection, and the segment-walk match with
the same regex literals and the same substr/instr arithmetic (expressed
relationally: rules exploded against URLs, ``max`` over (len, allow)
structs instead of the array fold — different formulation, identical
booleans). The ``$`` anchor is implemented by appending a ``\\x01``
sentinel to both the pattern core and the path, which turns the end
anchor into an ordinary unique-substring match (robots paths cannot
contain control bytes, so the sentinel never collides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SENTINEL = "\x01"

# shared regex literals (Java-regex/RE2 common subset; the oracle reuses
# them verbatim)
DIRECTIVE_RX = r"(?i)^(user-agent|allow|disallow|sitemap|crawl-delay)\s*:"
DIRECTIVE_STRIP_RX = r"(?i)^(user-agent|allow|disallow|sitemap|crawl-delay)\s*:\s*"
COMMENT_RX = "#.*"
URL_HOST_RX = r"^[a-z][a-z0-9+.-]*://([^/]+)"
URL_PATH_RX = r"^[a-z][a-z0-9+.-]*://[^/]+(/.*)?$"


def parse_robots(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, gid, kind, value) — one row per meaningful robots.txt line.

    ``kind`` in {'user-agent','allow','disallow','sitemap'}; ``gid``
    numbers rule groups 1..n per host (consecutive user-agent lines
    share a gid); spec-invalid rules before any group and empty-value
    allow/disallow no-ops are dropped. ``sitemap`` lines are GLOBAL per
    RFC 9309 §2.3 — they are emitted with gid 0 regardless of position
    (including before any group) and never join an agent's rule set;
    :func:`sitemaps` is the convenience projection. Agents are
    lowercased (matching is case-insensitive); rule values keep their
    case (paths and sitemap URLs are case-sensitive).
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "line"),
    )
    clean = F.trim(F.regexp_replace(F.col("line"), COMMENT_RX, ""))
    d = lines.select(
        "host",
        "pos",
        F.lower(F.regexp_extract(clean, DIRECTIVE_RX, 1)).alias("kind"),
        F.trim(F.regexp_replace(clean, DIRECTIVE_STRIP_RX, "")).alias("value"),
    ).filter(F.col("kind") != "")

    # sitemap lines are global and must not interrupt group construction
    # (a Sitemap between two User-agent lines does not split the group)
    sm = (
        d.filter((F.col("kind") == "sitemap") & (F.col("value") != ""))
        .select("host", F.lit(0).cast("long").alias("gid"), "kind", "value")
    )
    d = d.filter(F.col("kind") != "sitemap")

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("kind") == "user-agent"
    prev_ua = F.lag(is_ua.cast("int")).over(w)
    new_group = (is_ua & (prev_ua.isNull() | (prev_ua == 0))).cast("int")
    d = d.withColumn(
        "gid",
        F.sum(new_group).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    d = d.filter(F.col("gid") >= 1)
    # normalize: agents lowercase; empty-value rules are no-ops
    d = d.withColumn(
        "value", F.when(is_ua, F.lower(F.col("value"))).otherwise(F.col("value"))
    ).filter(is_ua | (F.col("value") != ""))
    return d.select("host", "gid", "kind", "value").union(sm)


def sitemaps(parsed: DataFrame) -> DataFrame:
    """(host, sitemap_url) — the crawl-seeding projection of
    :func:`parse_robots` output (RFC 9309 §2.3 global lines)."""
    return parsed.filter(F.col("kind") == "sitemap").select(
        "host", F.col("value").alias("sitemap_url")
    )


def _chosen_gids(parsed: DataFrame, agent: str) -> DataFrame:
    """(host, gid) — all groups governing ``agent``: groups naming it
    merge (RFC 9309 §2.2.1); hosts without one fall back to ``*``."""
    agents = parsed.filter(F.col("kind") == "user-agent")
    matched = (
        agents.filter(F.col("value") == agent.lower())
        .select("host", "gid")
        .distinct()
    )
    star = agents.filter(F.col("value") == "*").select("host", "gid").distinct()
    fallback = star.join(
        matched.select("host").distinct(), on="host", how="left_anti"
    )
    return matched.union(fallback)


def rules_for_agent(parsed: DataFrame, agent: str = "*") -> DataFrame:
    """(host, pattern, allow) — the merged rule set governing ``agent``.

    Hosts with neither a matching nor a ``*`` group yield no rows
    (allow-all by absence). Only allow/disallow lines become rules —
    sitemap (global) and crawl-delay (see :func:`crawl_delays`) do not.
    """
    rules = parsed.filter(F.col("kind").isin("allow", "disallow"))
    return rules.join(_chosen_gids(parsed, agent), on=["host", "gid"]).select(
        "host",
        F.col("value").alias("pattern"),
        (F.col("kind") == "allow").alias("allow"),
    )


def crawl_delays(parsed: DataFrame, agent: str = "*") -> DataFrame:
    """(host, delay_s) — the politeness interval governing ``agent``
    (de-facto ``Crawl-delay`` extension: group-scoped like rules; not in
    RFC 9309, honored by Bing/Yandex-class crawlers). Non-numeric values
    drop; multiple applicable groups take the MAX (the conservative
    politeness choice). Hosts without a delay line yield no row —
    caller applies its own default interval."""
    d = parsed.filter(F.col("kind") == "crawl-delay").select(
        # try_cast: ANSI mode throws on malformed numerics; junk -> NULL
        "host", "gid", F.col("value").try_cast("double").alias("delay_s")
    )
    d = d.filter(F.col("delay_s").isNotNull())
    return (
        d.join(_chosen_gids(parsed, agent), on=["host", "gid"])
        .groupBy("host")
        .agg(F.max("delay_s").alias("delay_s"))
    )


def _compiled_rule() -> list[Column]:
    """pattern -> (l, allow, segs) struct fields: raw-length precedence
    key, allow flag, and the sentinel-anchored ``*``-split segments the
    match fold walks."""
    pat = F.col("pattern")
    ends = pat.endswith("$")
    core = F.when(ends, F.expr("substring(pattern, 1, length(pattern) - 1)")).otherwise(
        pat
    )
    core2 = F.when(ends, F.concat(core, F.lit(SENTINEL))).otherwise(core)
    return [
        F.length(pat).alias("l"),
        F.col("allow").alias("allow"),
        F.split(core2, r"\*", -1).alias("segs"),
    ]


def _match(path2: Column, segs: Column) -> Column:
    """Segment walk: does the sentinel-suffixed path match the rule?

    Fold state is the 1-based scan position (-1 = fail). Segment 1 must
    anchor at the path start; each later segment must occur at-or-after
    the position the previous one ended (greedy-left ``instr``); empty
    segments (adjacent/leading/trailing ``*``) leave the position
    unchanged. All arithmetic is substr/instr — exact in both engines.
    """
    seg_i = F.transform(
        segs, lambda t, i: F.struct(t.alias("t"), (i + F.lit(1)).cast("int").alias("i"))
    )
    init = F.struct(
        F.lit(None).cast("string").alias("t"), F.lit(1).cast("int").alias("i")
    )

    def step(a: Column, x: Column) -> Column:
        pos = a["i"]
        rel = F.instr(F.substring(path2, pos, F.length(path2)), x["t"])
        after_abs = F.when(rel == 0, F.lit(-1)).otherwise(
            rel + pos - 1 + F.length(x["t"])
        )
        first = F.when(
            path2.startswith(x["t"]), F.length(x["t"]) + 1
        ).otherwise(F.lit(-1))
        nxt = F.when(x["t"] == "", pos).otherwise(
            F.when(x["i"] == 1, first).otherwise(after_abs)
        )
        return F.struct(
            F.lit(None).cast("string").alias("t"),
            F.when(pos == -1, F.lit(-1)).otherwise(nxt).cast("int").alias("i"),
        )

    return F.aggregate(seg_i, init, step)["i"] != -1


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
    flag_col: str | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Filter (or, with ``flag_col``, audit) a URL table against per-host
    robots.txt bodies for ``agent``.

    URLs whose host has no robots body, no applicable group, or no
    matching rule are allowed; non-absolute URLs pass through (match
    nothing), mirroring ``blocklist_filter``'s NULL semantics. The
    longest matching pattern decides; Allow wins ties.
    """
    compiled = rules_for_agent(parse_robots(robots, host_col, txt_col), agent)
    dim = compiled.groupBy("host").agg(
        F.sort_array(F.collect_list(F.struct(*_compiled_rule()))).alias("_rb_rules")
    )
    dim = dim.withColumnRenamed("host", "_rb_host")
    if broadcast_dim:
        dim = F.broadcast(dim)

    u_host = F.regexp_extract(F.col(url_col), URL_HOST_RX, 1)
    out = urls.withColumn("_rb_h", u_host).join(
        dim, on=F.col("_rb_h") == F.col("_rb_host"), how="left"
    )
    raw_path = F.regexp_extract(F.col(url_col), URL_PATH_RX, 1)
    path2 = F.concat(
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path), F.lit(SENTINEL)
    )
    # fold over the (l, allow)-ascending rules: any match replaces the
    # verdict, so the LAST match — longest pattern, allow on ties — wins
    init = F.struct(F.lit(-1).alias("l"), F.lit(True).alias("allow"))
    verdict = F.aggregate(
        F.col("_rb_rules"),
        init,
        lambda acc, r: F.when(
            _match(path2, r["segs"]),
            F.struct(r["l"].alias("l"), r["allow"].alias("allow")),
        ).otherwise(acc),
    )
    allowed = F.when(
        F.col("_rb_rules").isNull() | (F.col("_rb_h") == ""), F.lit(True)
    ).otherwise(verdict["allow"])
    drop = ["_rb_h", "_rb_host", "_rb_rules"]
    if flag_col is None:
        return out.filter(allowed).drop(*drop)
    return out.withColumn(flag_col, ~allowed).drop(*drop)
