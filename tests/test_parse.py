"""Parse-stage invariants: byte identity, UDF/native equivalence, typing."""

import pandas as pd
from pyspark.sql import functions as F

from log_analysis_spark.functions.parse import parse_conn_like, parse_http_like
from log_analysis_spark.synth import gen_pages, gen_pages_local

from .golden import golden_conn_events

N = 1200


def test_byte_identity(spark):
    """BASELINE.json input_hint: extracted text per url equals the embedded
    payload bytewise (Arrow UDF path over html:binary)."""
    http = parse_http_like(gen_pages(spark, N), byte_exact=True)
    got = {r["url"]: r["extracted_text"] for r in http.select("url", "extracted_text").collect()}
    want = gen_pages_local(N).set_index("url")["text"]
    assert len(got) == N
    for url, text in got.items():
        assert text.encode("utf-8") == want.loc[url].encode("utf-8")


def test_native_matches_udf_http(spark):
    pages = gen_pages(spark, N)
    a = parse_http_like(pages, byte_exact=True).toPandas().sort_values("url").reset_index(drop=True)
    b = parse_http_like(pages, byte_exact=False).toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_conn_vectorized_matches_native(spark):
    pages = gen_pages(spark, N)
    key = ["url", "id_orig_h", "orig_p", "bytes"]
    a = parse_conn_like(pages, vectorized=True).toPandas().sort_values(key).reset_index(drop=True)
    b = parse_conn_like(pages, vectorized=False).toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_conn_matches_golden(spark):
    conn = parse_conn_like(gen_pages(spark, N), vectorized=True).toPandas()
    want = golden_conn_events(gen_pages_local(N))
    assert len(conn) == len(want)
    g = conn.groupby("record_type").size().to_dict()
    w = want.groupby("record_type").size().to_dict()
    assert g == w


def test_status_and_host_typed(spark):
    http = parse_http_like(gen_pages(spark, 200))
    kinds = dict(http.dtypes)
    assert kinds["status_like"] == "int"
    assert kinds["ts_bucket"] == "timestamp"
    assert http.filter(F.col("status_like").isin(200, 301, 404, 500)).count() == 200
    assert http.filter(F.col("host").rlike(r"^[a-z0-9.\-]+$")).count() == 200


class TestCanonicalUrl:
    CASES = [
        # raw -> canonical
        ("HTTP://Example.COM:80/A/b?b=2&a=1#frag", "http://example.com/A/b?a=1&b=2"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8080/x", "https://example.com:8080/x"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com?z=1&a=2", "http://example.com/?a=2&z=1"),
        ("http://example.com/p?", "http://example.com/p"),
        ("http://example.com/p?dup=1&dup=1&a=0", "http://example.com/p?a=0&dup=1&dup=1"),
        ("https://example.com:80/x", "https://example.com:80/x"),  # :80 not https default
        ("ftp://Host/X", "ftp://host/X"),
        ("not-a-url#frag", "not-a-url"),  # pass-through minus fragment
        ("/relative/path?b=1&a=2", "/relative/path?b=1&a=2"),
    ]

    def test_canonicalization_rules(self, spark):
        from log_analysis_spark.functions.parse import canonical_url

        df = spark.createDataFrame([(r,) for r, _ in self.CASES], "url string")
        got = {r.url: r.c for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()}
        for raw, want in self.CASES:
            assert got[raw] == want, f"{raw!r}: {got[raw]!r} != {want!r}"

    def test_idempotent(self, spark):
        from log_analysis_spark.functions.parse import canonical_url

        df = spark.createDataFrame([(r,) for r, _ in self.CASES], "url string")
        once = df.select(canonical_url(F.col("url")).alias("c"))
        twice = once.select(canonical_url(F.col("c")).alias("c"))
        assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]


# ---------------------------------------------------------------------------
# user-agent classification
# ---------------------------------------------------------------------------
def test_ua_family_precedence_matrix(spark):
    from log_analysis_spark.functions.parse import ua_family, ua_is_bot

    cases = {
        # chromium family embeds Chrome/ AND Safari/ — order decides
        "Mozilla/5.0 Chrome/120.0 Safari/537.36": ("chrome", False),
        "Mozilla/5.0 Chrome/120.0 Safari/537.36 Edg/120.0": ("edge", False),
        "Mozilla/5.0 Chrome/120.0 Safari/537.36 OPR/105.0": ("opera", False),
        "Mozilla/5.0 Version/17.1 Safari/605.1.15": ("safari", False),
        "Mozilla/5.0 rv:120.0 Gecko/20100101 Firefox/120.0": ("firefox", False),
        # Googlebot spoofs a Chrome/Safari suffix — bot rule must win
        "Mozilla/5.0 (compatible; Googlebot/2.1) Chrome/119 Safari/537.36": ("googlebot", True),
        "Mozilla/5.0 (compatible; bingbot/2.0)": ("bingbot", True),
        "curl/8.4.0": ("curl", True),
        "Wget/1.21": ("wget", True),
        "python-requests/2.31.0": ("python-requests", True),
        "Mozilla/5.0 (Windows NT 6.1; Trident/7.0)": ("ie", False),
        "Mozilla/4.0 (compatible; MSIE 8.0)": ("ie", False),
        "WeirdAgent/0.1": ("other", False),
        "": ("unknown", False),
        None: ("unknown", False),
    }
    df = spark.createDataFrame(
        [(ua,) for ua in cases], schema="ua string"
    ).select(
        "ua",
        ua_family(F.col("ua")).alias("fam"),
        ua_is_bot(F.col("ua")).alias("bot"),
    )
    got = {r["ua"]: (r["fam"], r["bot"]) for r in df.collect()}
    assert got == cases


def test_ua_family_no_shuffle(spark):
    from log_analysis_spark.functions.parse import ua_family

    df = spark.range(100).select(
        ua_family(F.concat(F.lit("Chrome/"), F.col("id").cast("string"))).alias("f")
    )
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
