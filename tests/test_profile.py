"""Dataset card + histogram drift (operators/profile.py)."""

import math

from pyspark.sql import functions as F

from log_analysis_spark.operators.profile import (
    ALL,
    dataset_profile,
    drift_score,
    histogram_compare,
)


def _docs(spark):
    rows = [
        (0, "en", "s0", 10),
        (1, "en", "s0", 20),
        (2, "en", "s1", 5),
        (3, "fr", "s0", 7),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "source", "n_chars"])


def test_dataset_profile_cube_cells(spark):
    out = {
        (r["gid"], r["lang"], r["source"]): (
            r["n_docs"],
            r["sum_n_chars"],
            r["min_n_chars"],
            r["max_n_chars"],
        )
        for r in dataset_profile(_docs(spark)).collect()
    }
    # grand total: both dims aggregated out (gid = 0b11)
    assert out[(3, ALL, ALL)] == (4, 42, 5, 20)
    # per-lang totals (source aggregated out, gid = 0b01)
    assert out[(1, "en", ALL)] == (3, 35, 5, 20)
    assert out[(1, "fr", ALL)] == (1, 7, 7, 7)
    # per-source totals (lang aggregated out, gid = 0b10)
    assert out[(2, ALL, "s0")] == (3, 37, 7, 20)
    # leaf cells (gid = 0)
    assert out[(0, "en", "s1")] == (1, 5, 5, 5)
    # 1 grand + 2 langs + 2 sources + 3 leaves
    assert len(out) == 8


def test_dataset_profile_one_scan(spark):
    plan = (
        dataset_profile(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    )
    # the CUBE runs through a single Expand, not d+1 scans/joins
    assert plan.count("Expand") >= 1
    assert "Join" not in plan


def test_histogram_drift_identical_is_zero(spark):
    a = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    bins = histogram_compare(a, a, "v", 0.0, 10.0, n_bins=10)
    drift = drift_score(bins).collect()[0]["drift"]
    assert drift == 0.0
    rows = bins.collect()
    assert all(r["term"] == 0.0 and r["n_a"] == r["n_b"] for r in rows)


def test_histogram_drift_disjoint_is_two(spark):
    # fully disjoint supports: triangular discrimination hits its bound 2
    a = spark.range(50).select(F.lit(1.0).alias("v"))
    b = spark.range(50).select(F.lit(9.0).alias("v"))
    bins = histogram_compare(a, b, "v", 0.0, 10.0, n_bins=10)
    drift = drift_score(bins).collect()[0]["drift"]
    assert drift == 2.0


def test_histogram_clamps_out_of_range(spark):
    a = spark.createDataFrame([(-5.0,), (99.0,)], ["v"])
    got = sorted(
        r["bin"]
        for r in histogram_compare(a, a, "v", 0.0, 10.0, n_bins=10).collect()
    )
    assert got == [0, 9]


def test_drift_matches_python_replay(spark):
    av = [1.0, 1.5, 2.5, 7.0, 7.1]
    bv = [1.0, 6.0, 6.5, 7.0, 9.9]
    a = spark.createDataFrame([(v,) for v in av], ["v"])
    b = spark.createDataFrame([(v,) for v in bv], ["v"])
    bins = histogram_compare(a, b, "v", 0.0, 10.0, n_bins=5)
    got = drift_score(bins).collect()[0]["drift"]

    def binof(v):
        return min(max(math.floor((v - 0.0) / 2.0), 0), 4)

    ca: dict[int, int] = {}
    cb: dict[int, int] = {}
    for v in av:
        ca[binof(v)] = ca.get(binof(v), 0) + 1
    for v in bv:
        cb[binof(v)] = cb.get(binof(v), 0) + 1
    want = 0.0
    for i in sorted(set(ca) | set(cb)):
        pa = ca.get(i, 0) / len(av)
        pb = cb.get(i, 0) / len(bv)
        if ca.get(i, 0) + cb.get(i, 0) > 0:
            want += ((pa - pb) * (pa - pb)) / (pa + pb)
    assert got == want
