"""Public-suffix registrable-domain extraction (operators/domains.py)."""

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.domains import (
    DEFAULT_RULES,
    _keyed_rules,
    max_key_labels,
    registrable_domain,
)

CASES = [
    # host, public_suffix, registrable_domain
    ("a.b.example.co.uk", "co.uk", "example.co.uk"),  # longest plain wins over 'uk'
    ("www.example.com", "com", "example.com"),
    ("example.com", "com", "example.com"),
    ("com", "com", None),  # host IS a public suffix
    ("foo.bar.ck", "bar.ck", "foo.bar.ck"),  # wildcard *.ck
    ("bar.ck", "bar.ck", None),  # wildcard: host is the public suffix
    ("www.ck", "ck", "www.ck"),  # exception !www.ck
    ("foo.www.ck", "ck", "www.ck"),  # exception applies under subdomains
    ("site.xyz", "xyz", "site.xyz"),  # no rule -> implicit '*' default
    ("localhost", "localhost", None),  # single label, no rule
    ("project.github.io", "github.io", "project.github.io"),  # private registry
    ("x.github.io", "github.io", "x.github.io"),
    ("github.io", "github.io", None),
    ("b.x.s3.amazonaws.com", "s3.amazonaws.com", "x.s3.amazonaws.com"),
    ("deep.sub.acme.com.au", "com.au", "acme.com.au"),
    ("UPPER.Example.COM", "com", "example.com"),  # lowercased per spec
    (None, None, None),  # NULL host propagates
]


@pytest.fixture(scope="module")
def resolved(spark):
    df = spark.createDataFrame([(h,) for h, _, _ in CASES], "host string")
    rows = registrable_domain(df).collect()
    return {r.host: (r.public_suffix, r.registrable_domain) for r in rows}


@pytest.mark.parametrize("host,ps,reg", CASES)
def test_psl_semantics(resolved, host, ps, reg):
    assert resolved[host] == (ps, reg)


def test_plan_no_shuffle_all_broadcast(spark):
    """The fact side must not shuffle: K broadcast hash joins only."""
    df = spark.range(100).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example.co.uk")).alias("host")
    )
    plan = registrable_domain(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only exchanges are the broadcast ones
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "Broadcast" in line, line


def test_custom_rules_and_k():
    keyed = _keyed_rules(["a.b.c.d", "*.e", "!x.y"])
    assert keyed["a.b.c.d"] == {"plain": 4}
    assert keyed["e"] == {"wc": 2}
    assert keyed["x.y"] == {"exc": 1}
    assert max_key_labels(["a.b.c.d", "*.e"]) == 4
    assert max_key_labels(DEFAULT_RULES) == 3


def test_degenerate_exception_rule_rejected():
    with pytest.raises(ValueError):
        _keyed_rules(["!single"])  # exception needs >= 2 labels


def test_enrich_includes_registrable_domain(spark):
    """Pipeline integration: enrich() decorates with the PSL columns."""
    from log_analysis_spark.operators.enrich import enrich

    df = spark.createDataFrame(
        [("a.b.example.co.uk", "en"), ("www.example.de", "de")],
        "host string, lang string",
    )
    out = {r.host: r for r in enrich(df, spark).collect()}
    assert out["a.b.example.co.uk"].registrable_domain == "example.co.uk"
    assert out["a.b.example.co.uk"].public_suffix == "co.uk"
    assert out["www.example.de"].registrable_domain == "example.de"
    assert out["www.example.de"].tld == "de"


# ---------------------------------------------------------------------------
# blocklist_filter
# ---------------------------------------------------------------------------
def _bl_df(spark):
    rows = [
        (1, "http://www.banned.com/x"),         # suffix block (subdomain)
        (2, "https://banned.com"),               # suffix block (apex)
        (3, "https://ok.org/a"),                 # clean
        (4, "http://WWW.BANNED.COM:80/y"),       # case-folded host still blocked
        (5, "https://good.banned.com/z"),        # allow_suffix override
        (6, "http://tracker.net/ads/1?x=1"),     # prefix block
        (7, "http://tracker.net/content"),       # same host, prefix miss
        (8, None),                               # NULL url passes
        (9, "http://notbanned.com/x"),           # 'banned.com' is not a suffix of 'notbanned.com'
    ]
    return spark.createDataFrame(rows, "id long, url string")


_BL_KW = dict(
    block_suffixes=["banned.com"],
    block_prefixes=["http://tracker.net/ads/", "http://tracker.net/beacon"],
    allow_suffixes=["good.banned.com"],
)


def test_blocklist_flag_mode(spark):
    from log_analysis_spark.operators.domains import blocklist_filter

    out = {
        r.id: r.blocked
        for r in blocklist_filter(_bl_df(spark), flag_col="blocked", **_BL_KW).collect()
    }
    assert out == {1: True, 2: True, 3: False, 4: True, 5: False,
                   6: True, 7: False, 8: False, 9: False}


def test_blocklist_filter_mode_drops(spark):
    from log_analysis_spark.operators.domains import blocklist_filter

    kept = sorted(
        r.id for r in blocklist_filter(_bl_df(spark), **_BL_KW).collect()
    )
    assert kept == [3, 5, 7, 8, 9]
    # no helper columns leak
    assert blocklist_filter(_bl_df(spark), **_BL_KW).columns == ["id", "url"]


def test_blocklist_host_col_and_errors(spark):
    from log_analysis_spark.operators.domains import blocklist_filter
    import pytest as _pt

    df = spark.createDataFrame([(1, "Sub.Banned.COM")], "id long, host string")
    out = blocklist_filter(
        df, host_col="host", block_suffixes=["banned.com"], flag_col="b"
    ).collect()
    assert out[0].b is True
    with _pt.raises(ValueError, match="absolute URL"):
        blocklist_filter(_bl_df(spark), block_prefixes=["/relative/only"]).collect()
