"""robots.txt parse/select/match semantics (RFC 9309)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.robots import (
    parse_robots,
    robots_filter,
    rules_for_agent,
)

ROBOTS = [
    (
        "a.net",
        "# policy\nUser-agent: gptbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
        "Disallow: /*.zip$\nCrawl-delay: 2\nDisallow:\n",
    ),
    # two UA lines open ONE group; a later UA line starts a new group
    ("b.net", "User-agent: foo\nUser-agent: bar\nDisallow: /x\nUser-agent: *\nAllow: /\n"),
    # rules before any UA line are spec-invalid and dropped
    ("c.net", "Disallow: /orphan\n"),
]


@pytest.fixture()
def robots_df(spark):
    return spark.createDataFrame(ROBOTS, "host string, robots_txt string")


def _verdicts(spark, robots_df, urls, agent):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = robots_filter(df, robots_df, agent=agent, flag_col="blocked")
    return {r["url"]: r["blocked"] for r in out.collect()}


def test_parse_groups_and_noops(spark, robots_df):
    rows = {
        (r["host"], r["gid"], r["kind"], r["value"])
        for r in parse_robots(robots_df).collect()
    }
    # a.net: group 1 = gptbot, group 2 = *; the empty Disallow is dropped
    assert ("a.net", 1, "user-agent", "gptbot") in rows
    assert ("a.net", 1, "disallow", "/") in rows
    assert ("a.net", 2, "disallow", "/*.zip$") in rows
    assert not any(h == "a.net" and k == "disallow" and v == "" for h, _, k, v in rows)
    # b.net: foo and bar share gid 1; * is gid 2
    assert ("b.net", 1, "user-agent", "foo") in rows
    assert ("b.net", 1, "user-agent", "bar") in rows
    assert ("b.net", 1, "disallow", "/x") in rows
    assert ("b.net", 2, "user-agent", "*") in rows
    # c.net contributes nothing
    assert not any(h == "c.net" for h, _, _, _ in rows)


def test_agent_selection_and_star_fallback(spark, robots_df):
    got = {
        (r["host"], r["pattern"], r["allow"])
        for r in rules_for_agent(parse_robots(robots_df), "GptBot").collect()
    }
    # a.net: the gptbot group (case-insensitive); b.net: falls back to *
    assert got == {("a.net", "/", False), ("b.net", "/", True)}
    # bar group selected by exact token; star group NOT merged in
    bar = {
        (r["host"], r["pattern"], r["allow"])
        for r in rules_for_agent(parse_robots(robots_df), "bar").collect()
        if r["host"] == "b.net"
    }
    assert bar == {("b.net", "/x", False)}


def test_match_matrix(spark, robots_df):
    v = _verdicts(
        spark,
        robots_df,
        [
            "https://a.net/",
            "https://a.net/private/x",
            "https://a.net/private/ok1",  # longer Allow beats Disallow
            "https://a.net/data/f.zip",  # /*.zip$ wildcard + anchor
            "https://a.net/data/f.zip.txt",  # $ anchor rejects
            "https://b.net/x/deep",  # * group Allow: /
            "https://c.net/orphan",  # invalid rules dropped
            "https://d.net/whatever",  # no robots body
            "not-a-url",  # pass through
        ],
        agent="*",
    )
    assert v == {
        "https://a.net/": False,
        "https://a.net/private/x": True,
        "https://a.net/private/ok1": False,
        "https://a.net/data/f.zip": True,
        "https://a.net/data/f.zip.txt": False,
        "https://b.net/x/deep": False,
        "https://c.net/orphan": False,
        "https://d.net/whatever": False,
        "not-a-url": False,
    }


def test_allow_wins_length_ties(spark):
    robots = spark.createDataFrame(
        [("t.net", "User-agent: *\nDisallow: /abc\nAllow: /ab*\n")],
        "host string, robots_txt string",
    )
    v = _verdicts(spark, robots, ["https://t.net/abc"], "*")
    # '/abc' (disallow, l=4) vs '/ab*' (allow, l=4): allow wins the tie
    assert v["https://t.net/abc"] is False


def test_query_string_is_matched(spark):
    robots = spark.createDataFrame(
        [("q.net", "User-agent: *\nDisallow: /*?download=*\n")],
        "host string, robots_txt string",
    )
    v = _verdicts(
        spark,
        robots,
        ["https://q.net/f?download=1", "https://q.net/f?view=1"],
        "*",
    )
    assert v == {"https://q.net/f?download=1": True, "https://q.net/f?view=1": False}


def test_filter_mode_drops_blocked(spark, robots_df):
    df = spark.createDataFrame(
        [("https://a.net/private/x",), ("https://a.net/open",)], "url string"
    )
    kept = [r["url"] for r in robots_filter(df, robots_df, agent="*").collect()]
    assert kept == ["https://a.net/open"]


def test_merged_groups_union_rules(spark):
    """Two groups naming the same agent merge per RFC 9309 §2.2.1."""
    robots = spark.createDataFrame(
        [("m.net", "User-agent: bot\nDisallow: /a\nUser-agent: other\nDisallow: /z\nUser-agent: bot\nDisallow: /b\n")],
        "host string, robots_txt string",
    )
    v = _verdicts(
        spark, robots, ["https://m.net/a", "https://m.net/b", "https://m.net/z"], "bot"
    )
    assert v == {
        "https://m.net/a": True,
        "https://m.net/b": True,
        "https://m.net/z": False,
    }


def test_dim_is_broadcast(spark, robots_df):
    df = spark.createDataFrame([("https://a.net/x",)], "url string")
    plan = (
        robots_filter(df, robots_df, agent="*", flag_col="b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_sitemap_lines_global_and_non_breaking(spark):
    """Sitemap lines surface with gid 0 (even before any group), never
    join rule sets, and do not split a group they sit inside."""
    from log_analysis_spark.operators.robots import sitemaps

    robots = spark.createDataFrame(
        [
            (
                "s.net",
                "Sitemap: https://s.net/pre.xml\n"
                "User-agent: foo\n"
                "Sitemap: https://s.net/mid.xml\n"
                "User-agent: bar\n"  # still the SAME group as foo
                "Disallow: /x\n"
                "Sitemap: https://s.net/post.xml\n",
            )
        ],
        "host string, robots_txt string",
    )
    parsed = parse_robots(robots)
    sm = sorted(r["sitemap_url"] for r in sitemaps(parsed).collect())
    assert sm == [
        "https://s.net/mid.xml",
        "https://s.net/post.xml",
        "https://s.net/pre.xml",
    ]
    # foo and bar share one group despite the interleaved sitemap line
    agents = {
        (r["gid"], r["value"])
        for r in parsed.filter("kind = 'user-agent'").collect()
    }
    assert agents == {(1, "foo"), (1, "bar")}
    # sitemap rows never reach an agent's rule set
    rules = rules_for_agent(parsed, "foo").collect()
    assert {(r["pattern"], r["allow"]) for r in rules} == {("/x", False)}


def test_crawl_delay_group_scoped(spark):
    from log_analysis_spark.operators.robots import crawl_delays

    robots = spark.createDataFrame(
        [
            (
                "d.net",
                "User-agent: fastbot\nCrawl-delay: 0.5\nDisallow: /x\n"
                "User-agent: *\nCrawl-delay: 10\nCrawl-delay: junk\n",
            ),
            ("e.net", "User-agent: *\nDisallow: /y\n"),  # no delay line
        ],
        "host string, robots_txt string",
    )
    parsed = parse_robots(robots)
    star = {r["host"]: r["delay_s"] for r in crawl_delays(parsed, "*").collect()}
    assert star == {"d.net": 10.0}  # junk value dropped; e.net: no row
    fast = {
        r["host"]: r["delay_s"] for r in crawl_delays(parsed, "fastbot").collect()
    }
    assert fast == {"d.net": 0.5}
    # delay lines never leak into the filter rules (e.net contributes
    # its star-fallback /y; d.net only the fastbot group's /x)
    pats = {
        (r["host"], r["pattern"])
        for r in rules_for_agent(parsed, "fastbot").collect()
    }
    assert pats == {("d.net", "/x"), ("e.net", "/y")}


def test_broadcast_off_same_verdicts(spark, robots_df):
    """broadcast_dim=False (the pathological-rule-corpus escape hatch)
    must produce identical verdicts via a shuffle join."""
    urls = [
        "https://a.net/private/x",
        "https://a.net/private/ok1",
        "https://b.net/x/deep",
        "https://d.net/whatever",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    on = {
        r["url"]: r["blocked"]
        for r in robots_filter(df, robots_df, agent="*", flag_col="blocked").collect()
    }
    off = robots_filter(
        df, robots_df, agent="*", flag_col="blocked", broadcast_dim=False
    )
    got = {r["url"]: r["blocked"] for r in off.collect()}
    assert got == on
