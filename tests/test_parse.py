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
