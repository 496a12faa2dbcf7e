

# ---------------------------------------------------------------------------
# CIDR enrichment
# ---------------------------------------------------------------------------
def test_ip_to_long_and_cidr_dim_arithmetic(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.enrich import cidr_dim, ip_to_long

    df = spark.createDataFrame(
        [("0.0.0.1",), ("10.0.0.0",), ("255.255.255.255",), ("192.168.1.1",)],
        ["ip"],
    ).select("ip", ip_to_long(F.col("ip")).alias("n"))
    got = {r["ip"]: r["n"] for r in df.collect()}
    assert got == {
        "0.0.0.1": 1,
        "10.0.0.0": 10 * 2**24,
        "255.255.255.255": 2**32 - 1,
        "192.168.1.1": (192 << 24) + (168 << 16) + (1 << 8) + 1,
    }
    dim = spark.createDataFrame(
        [("10.0.0.0/9", "a"), ("10.128.7.9/10", "b"), ("1.2.3.4/32", "c")],
        ["cidr", "v"],
    )
    rows = cidr_dim(dim).select("cidr", "_start", "_end").distinct().collect()
    got = {r["cidr"]: (r["_start"], r["_end"]) for r in rows}
    base = 10 * 2**24
    assert got["10.0.0.0/9"] == (base, base + 2**23 - 1)
    # base not mask-aligned: 10.128.7.9/10 must align down to 10.128.0.0
    assert got["10.128.7.9/10"] == (base + 2**23, base + 2**23 + 2**22 - 1)
    ip1234 = (1 << 24) + (2 << 16) + (3 << 8) + 4
    assert got["1.2.3.4/32"] == (ip1234, ip1234)
    # /9 spans 128 /16 buckets, /32 exactly one
    from pyspark.sql import functions as F2

    bkts = {
        r["cidr"]: r["n"]
        for r in cidr_dim(dim).groupBy("cidr").agg(F2.count("*").alias("n")).collect()
    }
    assert bkts == {"10.0.0.0/9": 128, "10.128.7.9/10": 64, "1.2.3.4/32": 1}


def test_cidr_enrich_matches_and_nulls(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.enrich import cidr_enrich

    facts = spark.createDataFrame(
        [("10.0.0.1", 1), ("10.130.9.9", 2), ("10.250.0.1", 3), ("8.8.8.8", 4)],
        ["ip", "k"],
    )
    dim = spark.createDataFrame(
        [("10.0.0.0/9", "low"), ("10.128.0.0/10", "mid")], ["cidr", "label"]
    )
    got = {r["ip"]: (r["label"], r["k"]) for r in cidr_enrich(facts, dim, "ip").collect()}
    assert got == {
        "10.0.0.1": ("low", 1),
        "10.130.9.9": ("mid", 2),
        "10.250.0.1": (None, 3),
        "8.8.8.8": (None, 4),
    }
    # row-preserving left join: every fact row exactly once
    assert cidr_enrich(facts, dim, "ip").count() == 4


def test_cidr_enrich_broadcast_no_fact_shuffle(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.enrich import cidr_enrich

    facts = spark.range(1000).select(
        F.concat(F.lit("10.0.0."), (F.col("id") % 250).cast("string")).alias("ip")
    )
    dim = spark.createDataFrame([("10.0.0.0/24", "x")], ["cidr", "label"])
    plan = cidr_enrich(facts, dim, "ip")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_ip_class_ranges_and_malformed(spark):
    from pyspark.sql import functions as F

    from log_analysis_spark.operators.enrich import ip_class

    cases = {
        "10.1.2.3": "private",
        "172.15.0.1": "public",   # just below 172.16/12
        "172.16.0.0": "private",
        "172.31.255.255": "private",
        "172.32.0.0": "public",   # just above
        "192.168.0.1": "private",
        "192.169.0.1": "public",
        "127.0.0.1": "loopback",
        "169.254.9.9": "link-local",
        "100.63.255.255": "public",  # below CGNAT
        "100.64.0.0": "cgnat",
        "100.127.255.255": "cgnat",
        "100.128.0.0": "public",
        "223.255.255.255": "public",
        "224.0.0.1": "multicast",
        "239.255.255.255": "multicast",
        "8.8.8.8": "public",
        "1.2.3": None,        # short
        "x.y.z.w": None,      # non-numeric
        "999.1.2.3": None,    # octet out of range
        "": None,
    }
    df = spark.createDataFrame([(ip,) for ip in cases], ["ip"]).select(
        "ip", ip_class(F.col("ip")).alias("c")
    )
    got = {r["ip"]: r["c"] for r in df.collect()}
    assert got == cases
