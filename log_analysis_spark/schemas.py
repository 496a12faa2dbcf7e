"""Typed schemas for the rebuild.

The reference keeps every value as a string and deliberately ignores Zeek's
``#types`` line (/root/reference/src/zeek/zeek_log.rs:147-149); the rebuild
types columns (FIXTURES.md section 3) while keeping raw extracted strings
where byte-identity is asserted. The ``ZeekProtocol`` routing vocabulary
(/root/reference/src/zeek/zeek_log_proto.rs:5-37) becomes the RECORD_TYPES
whitelist: unknown types route to nothing, like ``ZeekProtocol::NONE``
being dropped at /root/reference/src/zeek/zeek_log.rs:385.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- input: Common-Crawl-style pages table (BASELINE.json input_hint) -----
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# --- routing vocabulary ----------------------------------------------------
# Full reference enum (28 types, /root/reference/src/zeek/zeek_log_proto.rs:5-37)
ZEEK_PROTOCOLS = [
    "conn", "dns", "http", "files", "ftp", "ssl", "x509", "smtp", "snmp",
    "ssh", "pe", "dhcp", "ntp", "smb", "irc", "rdp", "ldap", "quic",
    "traceroute", "tunnel", "dpd", "known", "software", "weird", "notice",
    "captureloss", "reporter", "sip",
]
# Types the synthetic corpus / parser actually emits (subset, SURVEY.md §7.5)
RECORD_TYPES = ["conn", "dns", "http", "ssl", "weird"]

# --- parsed record schemas (FIXTURES.md §3) --------------------------------
HTTP_LIKE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("status_like", T.IntegerType(), True),
        T.StructField("ts_bucket", T.TimestampType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

CONN_LIKE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("record_type", T.StringType(), True),
        T.StructField("id_orig_h", T.StringType(), True),
        T.StructField("id_resp_h", T.StringType(), True),
        T.StructField("orig_p", T.IntegerType(), True),
        T.StructField("resp_p", T.IntegerType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("ts_bucket", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# array-of-structs payload returned by the vectorized event-line parser
EVENT_STRUCT = T.StructType(
    [
        T.StructField("record_type", T.StringType(), True),
        T.StructField("id_orig_h", T.StringType(), True),
        T.StructField("id_resp_h", T.StringType(), True),
        T.StructField("orig_p", T.IntegerType(), True),
        T.StructField("resp_p", T.IntegerType(), True),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

# --- enrichment dims (FIXTURES.md §2; recast of IP2LocationResponse's 12
# nullable strings, /root/reference/src/ip2location.rs:9-24) ---------------
TLD_DIM_SCHEMA = T.StructType(
    [
        T.StructField("tld", T.StringType(), False),
        T.StructField("registrable_suffix", T.StringType(), True),
        T.StructField("registry_region", T.StringType(), True),
    ]
)

LANG_DIM_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("region_name", T.StringType(), True),
        T.StructField("time_zone", T.StringType(), True),
    ]
)
