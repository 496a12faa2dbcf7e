"""Deterministic sampling: reproducibility across partitionings, per-group
rates, split stability."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from log_analysis_spark.operators import sampling as SP

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_stratified_sample_deterministic_across_partitionings(docs):
    frac = {"en": 0.5, "de": 0.2}
    a = {r["doc_id"] for r in SP.sample_stratified(docs, "lang", "doc_id", frac).collect()}
    b = {
        r["doc_id"]
        for r in SP.sample_stratified(
            docs.repartition(7, "lang"), "lang", "doc_id", frac
        ).collect()
    }
    assert a == b and a  # same row SET regardless of physical layout


def test_stratified_sample_rates_approx(docs):
    n_en = docs.filter(F.col("lang") == "en").count()
    got = SP.sample_stratified(docs, "lang", "doc_id", {"en": 0.5}, 0.0)
    got_en = got.filter(F.col("lang") == "en").count()
    assert got.count() == got_en  # default 0.0 drops every other group
    assert abs(got_en / n_en - 0.5) < 0.2  # hash buckets approximate the rate


def test_split_by_hash_stable_and_exhaustive(docs):
    s1 = {r["doc_id"]: r["_split"] for r in SP.split_by_hash(docs, "doc_id", 0.1, 0.1).collect()}
    s2 = {
        r["doc_id"]: r["_split"]
        for r in SP.split_by_hash(docs.repartition(5), "doc_id", 0.1, 0.1).collect()
    }
    assert s1 == s2
    assert set(s1.values()) <= {"train", "valid", "test"}
    assert len(s1) == docs.count()
    # growing the corpus never reassigns existing keys: subset invariance
    half = docs.filter(F.col("doc_id") % 2 == 0)
    s_half = {r["doc_id"]: r["_split"] for r in SP.split_by_hash(half, "doc_id", 0.1, 0.1).collect()}
    assert all(s1[k] == v for k, v in s_half.items())


def test_keyed_quota_sample_cap_and_stability(spark):
    from log_analysis_spark.operators.sampling import keyed_quota_sample

    rows = [(f"d{i % 5}", i) for i in range(200)]
    df = spark.createDataFrame(rows, "domain string, doc_id long")
    kept = keyed_quota_sample(df, "domain", "doc_id", cap=7)
    per = {r["domain"]: r["n"] for r in
           kept.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 7 for n in per.values())

    # identical kept set under a different partitioning
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(
        r.doc_id
        for r in keyed_quota_sample(df.repartition(17), "domain", "doc_id", cap=7).collect()
    )
    assert ids1 == ids2

    # growth that appends new rows never evicts... (only higher-rank rows
    # join): kept set of the subset is a superset-stable prefix per key
    small = df.filter(F.col("doc_id") < 100)
    kept_small = {r.doc_id for r in keyed_quota_sample(small, "domain", "doc_id", 7).collect()}
    kept_full_ranks = {
        r.doc_id: r["_rank"] for r in kept.collect()
    }
    # every doc kept from the full set that also exists in the subset must
    # be kept there too (hash order is data-independent)
    for doc_id, rank in kept_full_ranks.items():
        if doc_id < 100:
            assert doc_id in kept_small


# ---------------------------------------------------------------------------
# priority sampling (Duffield-Lund-Thorup)
# ---------------------------------------------------------------------------
def _py_priority(doc_id: int, w: float) -> float:
    """Bitwise Python replay of the engine-side priority."""
    import hashlib

    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    return (w * float(1 << 60)) / float(h + 1)


def test_priority_sample_matches_python_replay(docs):
    got = SP.priority_sample(docs, "doc_id", "n_chars", k=50).collect()
    assert len(got) == 50
    base = {r["doc_id"]: (r["n_chars"]) for r in docs.select("doc_id", "n_chars").collect()}
    pri = {d: _py_priority(d, float(w)) for d, w in base.items() if w > 0}
    expect = sorted(pri, key=lambda d: (-pri[d], d))[:51]
    tau = pri[expect[50]]
    assert [r["doc_id"] for r in sorted(got, key=lambda r: (-r["priority"], r["doc_id"]))] == expect[:50]
    for r in got:
        assert r["priority"] == pri[r["doc_id"]]  # bit-exact
        assert r["est_weight"] == max(r["weight"], tau)


def test_priority_sample_weight_bias(spark):
    """Heavy rows are sampled (far) more often than light ones: with 100
    heavy (w=1000) and 900 light (w=1) rows, a k=80 sample is dominated by
    heavy rows."""
    rows = [(i, 1000 if i < 100 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = SP.priority_sample(df, "doc_id", "w", k=80).collect()
    heavy = sum(1 for r in got if r["weight"] == 1000.0)
    assert heavy >= 70


def test_priority_sample_estimator_unbiased_shape(spark):
    """sum(est_weight) over the sample approximates total corpus weight
    (the DLT estimator's whole point). Deterministic fixture, so the check
    is a fixed tolerance, not a stochastic one."""
    rows = [(i, (i % 7) + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    total = sum(w for _, w in rows)
    got = SP.priority_sample(df, "doc_id", "w", k=500).collect()
    est = sum(r["est_weight"] for r in got)
    assert abs(est - total) / total < 0.15


def test_priority_sample_small_corpus_no_tau(spark):
    """<= k weighted rows: everything is sampled, est_weight == weight."""
    df = spark.createDataFrame([(1, 5), (2, 3), (3, 0)], ["doc_id", "w"])
    got = SP.priority_sample(df, "doc_id", "w", k=10).collect()
    assert {r["doc_id"] for r in got} == {1, 2}  # w=0 rows excluded
    for r in got:
        assert r["est_weight"] == r["weight"]


def test_priority_sample_partitioning_invariant(docs):
    a = {r["doc_id"] for r in SP.priority_sample(docs, "doc_id", "n_chars", k=64).collect()}
    b = {
        r["doc_id"]
        for r in SP.priority_sample(docs.repartition(13), "doc_id", "n_chars", k=64).collect()
    }
    assert a == b


def test_priority_sample_per_group_quota_and_consistency(docs):
    got = SP.priority_sample_per_group(docs, "doc_id", "n_chars", "lang", k=10).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert set(by_lang) == langs
    base = {
        (r["lang"], r["doc_id"]): r["n_chars"]
        for r in docs.select("lang", "doc_id", "n_chars").collect()
    }
    for lang, rows in by_lang.items():
        n_lang = sum(1 for (lg, _), w in base.items() if lg == lang and w > 0)
        assert len(rows) == min(10, n_lang)
        # group-wise winners == global priority order restricted to the group
        pri = {
            d: _py_priority(d, float(w))
            for (lg, d), w in base.items()
            if lg == lang and w > 0
        }
        expect = sorted(pri, key=lambda d: (-pri[d], d))[:10]
        assert sorted(r["doc_id"] for r in rows) == sorted(expect)
        for r in rows:
            assert r["priority"] == pri[r["doc_id"]]


def test_priority_sample_per_group_small_group_estimates_exact(spark):
    rows = [("en", i, 10) for i in range(50)] + [("xx", 1000, 7), ("xx", 1001, 3)]
    df = spark.createDataFrame(rows, ["lang", "doc_id", "w"])
    got = SP.priority_sample_per_group(df, "doc_id", "w", "lang", k=5).collect()
    xx = [r for r in got if r["lang"] == "xx"]
    assert len(xx) == 2
    for r in xx:
        assert r["est_weight"] == r["weight"]  # no tau in a <=k group
    assert len([r for r in got if r["lang"] == "en"]) == 5
