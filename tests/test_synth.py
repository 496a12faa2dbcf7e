"""Generator determinism + corpus properties (FIXTURES.md §1, §5)."""

import pandas as pd

from log_analysis_spark.synth import (
    HOT_HOSTS,
    MEMBERSHIP_HOST,
    gen_pages,
    gen_pages_local,
)

N = 1500


def test_partition_invariance(spark):
    """Every cell is a function of the id: same table at any parallelism."""
    a = gen_pages(spark, N, partitions=2).toPandas().sort_values("url").reset_index(drop=True)
    b = gen_pages(spark, N, partitions=13).toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_matches_local_golden(spark):
    got = gen_pages(spark, N, partitions=4).toPandas().sort_values("url").reset_index(drop=True)
    want = gen_pages_local(N).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_corpus_properties():
    pdf = gen_pages_local(N)
    host = pdf.url.str.extract(r"https://([^/]+)/")[0]
    share = host.isin(HOT_HOSTS).mean()
    assert 0.3 < share < 0.5, "hot-host skew must be present"
    days = pdf.warc_ts.dt.date.nunique()
    assert days == 3
    member = pdf[host == MEMBERSHIP_HOST]
    assert len(member) > 0
    assert set(member.warc_ts.dt.strftime("%Y-%m-%d")) == {"2024-07-02"}
    # duplicates exist for the dedup operators
    assert pdf.text.duplicated().sum() > 0
    # html embeds the exact text payload
    row = pdf.iloc[17]
    assert row["text"].encode("utf-8") in row["html"]
