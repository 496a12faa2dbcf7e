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


def test_key_skew_histogram_bucket_boundaries(spark):
    """Bucket = binary digit count of the per-key row count: counts 1, 2,
    3, 4, 8 land in buckets 1, 2, 2, 3, 4 — the power-of-two boundaries
    are exact by construction (integer string length, no float log)."""
    from log_analysis_spark.operators.profile import key_skew_histogram

    rows = []
    for key, cnt in [("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 8)]:
        rows += [(key,)] * cnt
    df = spark.createDataFrame(rows, "k string")
    got = {
        r["bucket"]: (r["n_keys"], r["n_rows"], r["max_cnt"])
        for r in key_skew_histogram(df, ["k"]).collect()
    }
    assert got == {1: (1, 1, 1), 2: (2, 5, 3), 3: (1, 4, 4), 4: (1, 8, 8)}


def test_compaction_plan_bins_and_oversize(spark):
    """Next-fit-by-cumulative-size per dir: files sort (bytes DESC, file);
    an oversize file owns bin 0 and pushes the next file past a GAP;
    directories bin independently; assignment replays a serial walker."""
    from log_analysis_spark.operators.profile import compaction_plan

    rows = [
        ("d1", "big", 2500),   # bins 0-2 alone (target 1000)
        ("d1", "f1", 600),     # cum_before 2500 -> bin 2 (shared w/ big's tail)
        ("d1", "f2", 500),     # cum 3100 -> bin 3
        ("d1", "f3", 400),     # cum 3600 -> bin 3
        ("d2", "g1", 300),     # independent dir: cum 0 -> bin 0
        ("d2", "g2", 300),     # cum 300 -> bin 0
    ]
    df = spark.createDataFrame(rows, "dir string, file string, bytes long")
    got = {
        (r["dir"], r["file"]): r["bin"]
        for r in compaction_plan(df, "dir", "file", "bytes", 1000).collect()
    }
    # serial replay: sort (bytes desc, file) within dir, bin = cum_before // 1000
    want = {}
    for d in ("d1", "d2"):
        cum = 0
        for f, b in sorted(
            [(f, b) for dd, f, b in rows if dd == d], key=lambda t: (-t[1], t[0])
        ):
            want[(d, f)] = cum // 1000
            cum += b
    assert got == want
    assert got[("d1", "big")] == 0 and got[("d1", "f1")] == 2
    assert got[("d1", "f2")] == got[("d1", "f3")] == 3
    assert got[("d2", "g1")] == got[("d2", "g2")] == 0
