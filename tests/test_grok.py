"""Grok compiler + extraction tests.

Covers: compilation (group numbering, literal escaping, typed captures,
custom/recursive vocabularies, error cases), Spark extraction semantics
(drop vs keep_unmatched-NULL), and cross-engine parity of the compiled
regex (the same string must extract identically under Java regex and
DuckDB's RE2 — the oracle contract of grok_oracle_exprs).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from log_analysis_spark.functions.grok import (
    GrokError,
    grok_compile,
    grok_extract,
    grok_oracle_exprs,
)

ACCESS = (
    '%{IPV4:ip} - %{USER:user} "%{HTTPMETHOD:method} %{URIPATH:path}" '
    "%{INT:status:int} %{INT:bytes:int}"
)
ACCESS_LINES = [
    '10.0.0.1 - alice "GET /index.html" 200 5120',
    '192.168.1.77 - bob.smith "POST /api/v1/upload" 201 31',
    "not a log line at all",
    '10.0.0.1 - carol "GET /a/b/c" 404 0',
]


def test_compile_groups_and_types():
    rx, fields = grok_compile(ACCESS)
    assert [f[0] for f in fields] == ["ip", "user", "method", "path", "status", "bytes"]
    assert [f[2] for f in fields] == [1, 2, 3, 4, 5, 6]
    assert dict((f[0], f[1]) for f in fields)["status"] == "long"
    assert rx.startswith("^") and rx.endswith("$")
    import re

    m = re.match(rx, ACCESS_LINES[0])
    assert m and m.group(5) == "200"


def test_literal_text_is_escaped():
    rx, _ = grok_compile("cost=$%{INT:c:int} (approx.)")
    import re

    assert re.match(rx, "cost=$42 (approx.)")
    assert not re.match(rx, "cost=X42 Xapprox+)")


def test_custom_patterns_recursive():
    extra = {"KV": r"%{WORD}=%{NOTSPACE}", "KVLIST": r"%{KV}(?: %{KV})*"}
    rx, fields = grok_compile("args: %{KVLIST:kvs}", extra)
    import re

    assert re.match(rx, "args: a=1 b=xy").group(1) == "a=1 b=xy"
    assert fields == [("kvs", None, 1)]


def test_errors():
    with pytest.raises(GrokError, match="unknown"):
        grok_compile("%{NOPE:x}")
    with pytest.raises(GrokError, match="duplicate"):
        grok_compile("%{INT:x} %{INT:x}")
    with pytest.raises(GrokError, match="recursion"):
        grok_compile("%{A:x}", {"A": "%{B}", "B": "%{A}"})
    with pytest.raises(GrokError, match="nests a field"):
        grok_compile("%{A:x}", {"A": "%{INT:inner}"})


def test_extract_drops_unmatched(spark):
    df = spark.createDataFrame([(l,) for l in ACCESS_LINES], ["line"])
    out = grok_extract(df, "line", ACCESS).orderBy("ip", "status")
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0].status == 200 and rows[0].bytes == 5120
    assert out.schema["status"].dataType.typeName() == "long"


def test_extract_keep_unmatched_nulls(spark):
    df = spark.createDataFrame([(l,) for l in ACCESS_LINES], ["line"])
    out = grok_extract(df, "line", ACCESS, keep_unmatched=True)
    assert out.count() == 4
    bad = out.filter(F.col("ip").isNull()).collect()
    assert len(bad) == 1 and bad[0].status is None


def test_oracle_parity_duckdb(spark):
    """The SAME compiled regex extracts identically in Spark and DuckDB."""
    pred, exprs = grok_oracle_exprs(ACCESS, "line")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(line VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(l,) for l in ACCESS_LINES])
    duck = con.execute(
        f"SELECT {', '.join(exprs)} FROM t WHERE {pred} ORDER BY ip, status"
    ).fetchall()
    df = spark.createDataFrame([(l,) for l in ACCESS_LINES], ["line"])
    got = [
        tuple(r)
        for r in grok_extract(df, "line", ACCESS)
        .select("ip", "user", "method", "path", "status", "bytes")
        .orderBy("ip", "status")
        .collect()
    ]
    assert [tuple(r) for r in duck] == got


def test_base_patterns_all_compile_and_match_themselves():
    from log_analysis_spark.functions.grok import BASE_PATTERNS

    samples = {
        "WORD": "hello_1",
        "NOTSPACE": "a/b=c",
        "SPACE": "  ",
        "DATA": "",
        "GREEDYDATA": "x y z",
        "INT": "-42",
        "NONNEGINT": "7",
        "NUMBER": "3.14",
        "BASE16NUM": "0xDEADbeef",
        "IPV4": "255.255.255.0",
        "IPV6": "fe80::1",
        "IP": "10.1.2.3",
        "HOSTNAME": "a.example-site.co.uk",
        "USERNAME": "user.name-1",
        "USER": "root",
        "EMAILADDRESS": "a.b+c@ex.io",
        "UUID": "123e4567-e89b-12d3-a456-426614174000",
        "TIMESTAMP_ISO8601": "2024-01-01T10:20:30.123Z",
        "HTTPDATE": "10/Oct/2000:13:55:36 -0700",
        "LOGLEVEL": "WARNING",
        "URIPATH": "/a/b.html",
        "URIPARAM": "?q=1&r=2",
        "QUOTEDSTRING": '"hi there"',
        "PATH": "/usr/local/bin",
        "HTTPMETHOD": "DELETE",
    }
    import re

    assert set(samples) == set(BASE_PATTERNS)
    for name, sample in samples.items():
        rx, _ = grok_compile(f"%{{{name}:v}}")
        assert re.match(rx, sample), name
        # and the same regex matches under RE2
        (ok,) = duckdb.sql(
            "SELECT regexp_matches(?, ?)", params=[sample, rx]
        ).fetchone()
        assert ok, name
