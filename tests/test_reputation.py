"""Domain reputation: integer-exact aggregate + broadcast join-back."""

from __future__ import annotations


def _docs(spark):
    rows = [
        ("good.org", 100, True), ("good.org", 200, True),
        ("good.org", 60, False),
        ("spam.biz", 5, False), ("spam.biz", 7, False),
    ]
    return spark.createDataFrame(rows, "domain string, n_tokens long, passed boolean")


def test_domain_reputation_values(spark):
    from log_analysis_spark.operators.reputation import domain_reputation

    rep = {r.domain: r for r in domain_reputation(_docs(spark)).collect()}
    g = rep["good.org"]
    assert (g.n_docs, g.n_pass, g.total_tokens) == (3, 2, 360)
    assert g.pass_rate == 2 / 3 and g.avg_tokens == 120.0
    s = rep["spam.biz"]
    assert (s.n_docs, s.n_pass, s.total_tokens) == (2, 0, 12)
    assert s.pass_rate == 0.0 and s.avg_tokens == 6.0


def test_with_domain_prior_join_back(spark):
    from log_analysis_spark.operators.reputation import (
        domain_reputation,
        with_domain_prior,
    )

    docs = _docs(spark)
    rep = domain_reputation(docs)
    out = with_domain_prior(
        docs.union(
            spark.createDataFrame(
                [("new.net", 50, True)],
                "domain string, n_tokens long, passed boolean",
            )
        ),
        rep,
    )
    rows = out.collect()
    assert len(rows) == 6  # left join never drops documents
    new = [r for r in rows if r.domain == "new.net"][0]
    assert new.pass_rate is None  # unseen domain -> null prior
    good = [r for r in rows if r.domain == "good.org"][0]
    assert good.pass_rate == 2 / 3


def test_with_domain_prior_broadcasts(spark):
    from log_analysis_spark.operators.reputation import (
        domain_reputation,
        with_domain_prior,
    )

    docs = _docs(spark)
    plan = (
        with_domain_prior(docs, domain_reputation(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
