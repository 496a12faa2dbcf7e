"""Bucketed co-located join: no shuffle Exchange on either side."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from log_analysis_spark.plans.bucketing import (
    co_located_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    write_bucketed(ev.select("event_id", "user_id", "value"), "ev_b", "user_id", 8)
    write_bucketed(users, "users_b", "user_id", 8)
    yield "ev_b", "users_b"
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS users_b")


def test_co_located_join_has_no_shuffle(spark, bucketed_tables):
    l, r = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = co_located_join(spark, l, r, "user_id")
        assert not plan_has_exchange(joined)
        # and it is still correct
        row = joined.filter(F.col("user_id") == 42).select(F.count(F.lit(1))).first()
        n_direct = (
            spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .filter(F.col("user_id") == 42)
            .count()
        )
        assert row[0] == n_direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join on plain parquet shuffles both sides."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
        joined = ev.join(users, "user_id")
        assert plan_has_exchange(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------
def _py_z(x, y, bits=8):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_python_replay(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.plans.bucketing import zorder_key

    df = spark.range(1000).select(
        (F.col("id") % 256).alias("x"), ((F.col("id") * 37 + 5) % 256).alias("y")
    )
    rows = df.withColumn(
        "z", zorder_key([F.col("x"), F.col("y")], bits=8)
    ).collect()
    for r in rows:
        assert r["z"] == _py_z(r["x"], r["y"])
    # hand cases: interleave puts x at even bit positions, y at odd
    assert _py_z(1, 0) == 1 and _py_z(0, 1) == 2 and _py_z(3, 3) == 15


def test_zorder_key_width_guard(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.plans.bucketing import zorder_key

    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], bits=32)  # 64 > 63


def _file_ranges(path, cols):
    """Per-parquet-file min/max of cols — what row-group pruning sees."""
    import glob

    import pandas as pd

    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        d = pd.read_parquet(f, columns=cols)
        if len(d):
            out.append({c: (int(d[c].min()), int(d[c].max())) for c in cols})
    return out


def test_zorder_layout_prunes_both_dimensions(spark, tmpdir_path):
    """The point of the layout: a y-selective box prunes MOST files under
    Z-order and NO files under the lexicographic (x, y) sort."""
    from pyspark.sql import functions as F

    from log_analysis_spark.plans.bucketing import write_zordered

    n = 1 << 16
    df = spark.range(n).select(
        (F.col("id") % 256).alias("x"), ((F.col("id") / 256).cast("long") % 256).alias("y")
    )
    zpath = f"{tmpdir_path}/zorder"
    lpath = f"{tmpdir_path}/lex"
    write_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
    (
        df.repartitionByRange(16, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def files_hit(path, y_lo, y_hi):
        return sum(
            1
            for r in _file_ranges(path, ["x", "y"])
            if not (r["y"][1] < y_lo or r["y"][0] > y_hi)
        )

    z_hit, l_hit = files_hit(zpath, 0, 63), files_hit(lpath, 0, 63)
    assert l_hit >= 14, f"lex layout should read ~all files, hit {l_hit}"
    assert z_hit <= 8, f"zorder should prune most files, hit {z_hit}"

    # layout rewrite preserves content exactly
    got = spark.read.parquet(zpath).groupBy("x", "y").count().collect()
    assert len(got) == 256 * 256 and all(r["count"] == 1 for r in got)


def test_parquet_file_stats_footers_match_data(spark, tmpdir_path):
    """Footer min/max == actual data min/max per file, with no data read
    (the collector only touches metadata)."""
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.profile import parquet_file_stats

    path = f"{tmpdir_path}/stats_src"
    spark.range(10000).select(
        (F.col("id") % 97).alias("x"), F.col("id").alias("y")
    ).repartitionByRange(4, "x").write.parquet(path)
    got = parquet_file_stats(spark, path, ["x", "y"]).collect()
    assert {r["col"] for r in got} == {"x", "y"}
    import glob

    import pandas as pd

    for f in glob.glob(f"{path}/part-*.parquet"):
        d = pd.read_parquet(f)
        for r in got:
            if r["file"] == f and r["col"] == "x":
                assert int(r["min_val"]) == int(d["x"].min())
                assert int(r["max_val"]) == int(d["x"].max())
                assert r["n_rows"] == len(d)


def test_compact_sink_zorder_clusters_within_partitions(spark, tmpdir_path):
    """OPTIMIZE-with-ZORDER: after compaction with zorder_cols, per-file
    ranges of BOTH bucket columns are narrow inside each partition dir;
    plain compaction leaves at least one dimension full-domain."""
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.profile import parquet_file_stats
    from log_analysis_spark.operators.route import compact_sink

    def build(path):
        n = 1 << 14
        (
            spark.range(n)
            .select(
                (F.col("id") % 2).cast("string").alias("day"),
                ((F.col("id") / 2).cast("long") % 64).alias("xb"),
                ((F.col("id") / 128).cast("long") % 64).alias("yb"),
                F.col("id").alias("payload"),
            )
            .repartition(120)  # many small files
            .write.partitionBy("day")
            .mode("overwrite")
            .parquet(path)
        )

    def spread(path):
        """mean per-file (max-min) range of xb and yb."""
        rows = parquet_file_stats(spark, path, ["xb", "yb"]).collect()
        byc = {"xb": [], "yb": []}
        for r in rows:
            byc[r["col"]].append(int(r["max_val"]) - int(r["min_val"]))
        return {c: sum(v) / len(v) for c, v in byc.items()}

    plain = f"{tmpdir_path}/sink_plain"
    zord = f"{tmpdir_path}/sink_zorder"
    build(plain)
    build(zord)
    r1 = compact_sink(spark, plain, target_bytes=2 * 1024, partition_cols=("day",))
    r2 = compact_sink(
        spark, zord, target_bytes=2 * 1024, partition_cols=("day",),
        zorder_cols=("xb", "yb"), zorder_bits=6,
    )
    assert r1["files_after"] < r1["files_before"]
    assert r2["files_after"] < r2["files_before"]
    sp_plain, sp_z = spread(plain), spread(zord)
    # zorder: both dims narrow; plain hash-repartition: both ~full domain
    assert sp_z["xb"] < sp_plain["xb"] / 2
    assert sp_z["yb"] < sp_plain["yb"] / 2
    # content identical after either rewrite
    a = spark.read.parquet(plain).select("payload").orderBy("payload").collect()
    b = spark.read.parquet(zord).select("payload").orderBy("payload").collect()
    assert a == b
