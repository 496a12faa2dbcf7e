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
