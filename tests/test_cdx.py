"""SURT keys + CDX index: key rules, pruned lookups, sidecar fidelity."""

from __future__ import annotations

import glob

import pandas as pd
import pytest

from pyspark.sql import functions as F

from log_analysis_spark.functions.parse import surt_key
from log_analysis_spark.sources.cdx import (
    cdx_lookup_prefix,
    cdx_records,
    write_cdx_index,
)


def _keys(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return [
        r["k"] for r in df.select(surt_key(F.col("url")).alias("k")).collect()
    ]


def test_surt_key_rules(spark):
    got = _keys(
        spark,
        [
            "http://www.Example.COM:80/A/b?b=2&a=1#frag",
            "https://blog.example.com:8443/x",
            "http://example.com",
            "https://example.co.uk:443/?z=1&a=2",
            "mailto:someone@example.com",
            "http://www.ck/",
        ],
    )
    assert got == [
        "com,example)/a/b?a=1&b=2",  # www strip, :80 drop, lowercase, sort
        "com,example,blog:8443)/x",  # non-default port kept after revhost
        "com,example)/",  # empty path -> /
        "uk,co,example)/?a=2&z=1",  # :443 drop, query sorted
        "mailto:someone@example.com",  # non-authority passthrough, lowered
        "ck)/",  # bare www.ck: the IA www-strip applies (documented)
    ]


@pytest.fixture(scope="module")
def captures(spark):
    # 40 urls across 4 domains, 2 captures each (content drift on one)
    rows = []
    for i in range(40):
        dom = ["alpha.com", "beta.com", "example.co.uk", "zeta.org"][i % 4]
        url = f"http://www.{dom}/p/{i}"
        rows.append((url, "20240701000000", f"body {i}"))
        rows.append((url, "20240801000000", f"body {i}" + (" v2" if i % 5 == 0 else "")))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "ts", "text"])
    )


@pytest.fixture(scope="module")
def index(spark, captures, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cdx") / "idx")
    write_cdx_index(cdx_records(captures), path, n_buckets=8)
    return path


def _brute(captures, prefix):
    recs = cdx_records(captures)
    return sorted(
        map(tuple, recs.filter(F.col("surt").startswith(prefix)).collect())
    )


def test_lookup_equals_brute_force(spark, captures, index):
    for prefix in ["com,alpha", "uk,co,example)/p/1", "org,", "com,"]:
        got = sorted(map(tuple, cdx_lookup_prefix(spark, index, prefix).collect()))
        assert got == _brute(captures, prefix), prefix
        assert got, prefix  # every probe above must actually match


def test_lookup_miss_is_empty_and_typed(spark, index):
    out = cdx_lookup_prefix(spark, index, "zz,nothing")
    assert out.columns == ["surt", "url", "ts", "digest"]
    assert out.count() == 0


def test_sidecar_matches_bucket_contents(spark, index):
    cluster = {
        r["_rb"]: r for r in spark.read.parquet(f"{index}/_cluster").collect()
    }
    total = 0
    for rb, meta in cluster.items():
        rows = spark.read.parquet(f"{index}/data/_rb={rb}").collect()
        keys = sorted(r["surt"] for r in rows)
        assert len(rows) == meta["n"]
        assert keys[0] == meta["min_key"] and keys[-1] == meta["max_key"]
        total += len(rows)
    assert total == 80
    # every data dir is accounted for in the sidecar (cluster.idx covers
    # the whole shard set)
    dirs = {
        int(p.rsplit("=", 1)[1])
        for p in glob.glob(f"{index}/data/_rb=*")
    }
    assert dirs == set(cluster)


def test_narrow_probe_prunes_buckets(spark, index):
    # a single-domain probe must touch strictly fewer dirs than exist —
    # the point of the sidecar. Recompute the hit set the lookup uses.
    cluster = spark.read.parquet(f"{index}/_cluster").collect()
    assert len(cluster) > 1, "need multiple buckets for pruning to mean anything"
    prefix, hi = "org,zeta", "org,zeta￿"
    hit = [
        r["_rb"] for r in cluster if r["max_key"] >= prefix and r["min_key"] <= hi
    ]
    assert 0 < len(hit) < len(cluster)


def test_digest_tracks_content_drift(spark, captures, index):
    out = cdx_lookup_prefix(spark, index, "com,alpha)/p/0").collect()
    assert len(out) == 2  # two captures of the same url
    assert out[0]["digest"] != out[1]["digest"]  # i=0 drifted (v2)


def test_compact_bucket_single_run_same_answers(spark, captures, index, tmp_path_factory):
    """After appended runs, compaction rewrites one bucket to a single
    sorted file, repairs its sidecar row, and changes no answer."""
    import glob as g
    import shutil

    from log_analysis_spark.sources.cdx import compact_cdx_bucket

    # work on a copy: other tests share the module-scoped index
    work = str(tmp_path_factory.mktemp("cdx") / "copy")
    shutil.copytree(index, work)
    cluster = spark.read.parquet(f"{work}/_cluster").collect()
    rb = max(cluster, key=lambda r: r["n"])["_rb"]
    # simulate streamed appends: write the bucket's own rows again as a
    # second run, then fix the sidecar n to match
    extra = spark.read.parquet(f"{work}/data/_rb={rb}").toPandas()
    n0 = len(extra)
    spark.createDataFrame(extra).write.mode("append").parquet(
        f"{work}/data/_rb={rb}"
    )
    before = sorted(
        map(tuple, spark.read.parquet(f"{work}/data/_rb={rb}").collect())
    )
    n = compact_cdx_bucket(spark, work, rb)
    assert n == 2 * n0
    files = g.glob(f"{work}/data/_rb={rb}/*.parquet")
    assert len(files) == 1  # one sorted run
    after_df = spark.read.parquet(f"{work}/data/_rb={rb}")
    assert sorted(map(tuple, after_df.collect())) == before
    # the single file is globally sorted
    keys = [r["surt"] for r in after_df.collect()]
    assert keys == sorted(keys)
    meta = {
        r["_rb"]: r for r in spark.read.parquet(f"{work}/_cluster").collect()
    }[rb]
    assert meta["n"] == 2 * n0
    assert meta["min_key"] == keys[0] and meta["max_key"] == keys[-1]
