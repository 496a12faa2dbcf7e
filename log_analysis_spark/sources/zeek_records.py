"""Typed Zeek record families: per-type field vocabularies + cast stages.

The reference routes 28 record types (/root/reference/src/zeek/
zeek_log_proto.rs:5-37) but keeps every value an untyped string, ignoring
the ``#types`` header line (/root/reference/src/zeek/zeek_log.rs:147-149).
The rebuild supplies what a real Zeek user hits immediately: typed parsers
for the most common families — **conn**, **http**, **dns**, **ssl**,
**weird**, **files**, **ssh**, **smtp**, and **notice** — with field
vocabularies from the public Zeek log documentation (docs.zeek.org
log-files reference) and Zeek's value conventions:

- ``time``/``interval``  -> double (epoch seconds / seconds)
- ``double``             -> double (e.g. notice remote_location lat/lon)
- ``port``/``count``     -> int / long
- ``bool``               -> Zeek 'T'/'F' letters -> BooleanType
- ``vector[...]``        -> comma-separated -> array<string>
- unset ``-`` / ``(empty)`` sentinels -> NULL (handled upstream by
  ``zeek_tsv._null_sentinels``)

Everything is native Column casts in one projection — whole-stage codegen,
zero Python per row; at 10^12 rows the cast stage fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- per-family field vocabularies (public Zeek docs: dns.log, ssl.log,
# weird.log columns; names use the on-disk '.'->'_' convention of
# zeek_tsv.read_proto) ------------------------------------------------------
CONN_ID_FIELDS = ["id.orig_h", "id.orig_p", "id.resp_h", "id.resp_p"]

DNS_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "proto", "trans_id", "rtt",
    "query", "qclass", "qclass_name", "qtype", "qtype_name",
    "rcode", "rcode_name", "AA", "TC", "RD", "RA", "Z",
    "answers", "TTLs", "rejected",
]

SSL_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "version", "cipher", "curve",
    "server_name", "resumed", "last_alert", "next_protocol",
    "established", "ssl_history",
]

WEIRD_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "name", "addl", "notice", "peer",
]

CONN_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "proto", "service", "duration",
    "orig_bytes", "resp_bytes", "conn_state", "local_orig", "local_resp",
    "missed_bytes", "history", "orig_pkts", "orig_ip_bytes",
    "resp_pkts", "resp_ip_bytes", "tunnel_parents",
]

# files.log (Files::Info, Zeek 5+ layout with uid/id): the file-analysis
# framework's record — per public Zeek files.log docs
FILES_FIELDS = [
    "ts", "fuid", "uid", *CONN_ID_FIELDS, "source", "depth", "analyzers",
    "mime_type", "filename", "duration", "local_orig", "is_orig",
    "seen_bytes", "total_bytes", "missing_bytes", "overflow_bytes",
    "timedout", "parent_fuid", "md5", "sha1", "sha256",
    "extracted", "extracted_cutoff", "extracted_size",
]

SSH_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "version", "auth_success", "auth_attempts",
    "direction", "client", "server", "cipher_alg", "mac_alg",
    "compression_alg", "kex_alg", "host_key_alg", "host_key",
]

SMTP_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "trans_depth", "helo", "mailfrom",
    "rcptto", "date", "from", "to", "cc", "reply_to", "msg_id",
    "in_reply_to", "subject", "x_originating_ip", "first_received",
    "second_received", "last_reply", "path", "user_agent", "tls",
    "fuids", "is_webmail",
]

NOTICE_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "fuid", "file_mime_type", "file_desc",
    "proto", "note", "msg", "sub", "src", "dst", "p", "n", "peer_descr",
    "actions", "email_dest", "suppress_for",
    "remote_location.country_code", "remote_location.region",
    "remote_location.city", "remote_location.latitude",
    "remote_location.longitude",
]

HTTP_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "trans_depth", "method", "host", "uri",
    "referrer", "version", "user_agent", "origin",
    "request_body_len", "response_body_len", "status_code", "status_msg",
    "info_code", "info_msg", "tags", "username", "password", "proxied",
    "orig_fuids", "orig_filenames", "orig_mime_types",
    "resp_fuids", "resp_filenames", "resp_mime_types",
]

# cast kinds: time | interval | port | count | bool | vector | (default str)
_CASTS: dict[str, dict[str, str]] = {
    "dns": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "trans_id": "count", "rtt": "interval",
        "qclass": "count", "qtype": "count", "rcode": "count", "Z": "count",
        "AA": "bool", "TC": "bool", "RD": "bool", "RA": "bool",
        "rejected": "bool", "answers": "vector", "TTLs": "vector",
    },
    "ssl": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "resumed": "bool", "established": "bool",
    },
    "weird": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "notice": "bool",
    },
    "conn": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "duration": "interval",
        "orig_bytes": "count", "resp_bytes": "count", "missed_bytes": "count",
        "local_orig": "bool", "local_resp": "bool",
        "orig_pkts": "count", "orig_ip_bytes": "count",
        "resp_pkts": "count", "resp_ip_bytes": "count",
        "tunnel_parents": "vector",
    },
    "http": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "trans_depth": "count",
        "request_body_len": "count", "response_body_len": "count",
        "status_code": "count", "info_code": "count",
        "tags": "vector", "proxied": "vector",
        "orig_fuids": "vector", "orig_filenames": "vector",
        "orig_mime_types": "vector",
        "resp_fuids": "vector", "resp_filenames": "vector",
        "resp_mime_types": "vector",
    },
    "files": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "depth": "count", "analyzers": "vector", "duration": "interval",
        "local_orig": "bool", "is_orig": "bool",
        "seen_bytes": "count", "total_bytes": "count",
        "missing_bytes": "count",
        "overflow_bytes": "count", "timedout": "bool",
        "extracted_cutoff": "bool", "extracted_size": "count",
    },
    "ssh": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "version": "count", "auth_success": "bool", "auth_attempts": "count",
    },
    "smtp": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "trans_depth": "count", "rcptto": "vector", "to": "vector",
        "cc": "vector", "path": "vector", "tls": "bool",
        "fuids": "vector", "is_webmail": "bool",
    },
    "notice": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "p": "port", "n": "count", "actions": "vector",
        "email_dest": "vector", "suppress_for": "interval",
        "remote_location_latitude": "double",
        "remote_location_longitude": "double",
    },
}

FIELDS_BY_TYPE: dict[str, list[str]] = {
    "dns": DNS_FIELDS,
    "ssl": SSL_FIELDS,
    "weird": WEIRD_FIELDS,
    "conn": CONN_FIELDS,
    "http": HTTP_FIELDS,
    "files": FILES_FIELDS,
    "ssh": SSH_FIELDS,
    "smtp": SMTP_FIELDS,
    "notice": NOTICE_FIELDS,
}


def _cast_col(c: F.Column, kind: str) -> F.Column:
    if kind in ("time", "interval", "double"):
        return c.cast("double")
    if kind == "port":
        return c.cast("int")
    if kind == "count":
        return c.cast("long")
    if kind == "bool":
        # Zeek booleans are the letters T/F; anything else (incl. NULL from
        # the unset sentinel) stays NULL rather than failing the task
        return F.when(c == "T", F.lit(True)).when(c == "F", F.lit(False))
    if kind == "vector":
        return F.split(c, ",")
    return c


def cast_records(df: DataFrame, record_type: str) -> DataFrame:
    """Typed cast stage over a string DataFrame from ``zeek_tsv.read_proto``.

    One projection; columns not in the family's cast map (or extra columns
    like record_type/hour_bucket) pass through untouched, so the stage is
    robust to logs with additional fields.
    """
    casts = _CASTS.get(record_type.lower())
    if casts is None:
        raise ValueError(
            f"no typed schema for record type {record_type!r} "
            f"(have: {sorted(_CASTS)})"
        )
    cols = [
        _cast_col(F.col(name), casts[name]).alias(name) if name in casts else F.col(name)
        for name in df.columns
    ]
    return df.select(*cols)


def parse_tsv_lines(
    df: DataFrame,
    record_type: str,
    value_col: str = "value",
    sep: str = "\t",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Tokenize raw TSV lines by a family's field vocabulary and cast.

    The in-plan core of the reader (same split/getItem projection,
    ``-``/``(empty)`` -> NULL sentinels, typed cast stage) without the file
    plumbing — used by the driver-gate queries and reusable for lines
    arriving via any transport (files, Kafka values, events). Lines shorter
    than the vocabulary yield NULL for the missing trailing fields.
    ``keep_cols`` ride through untouched (e.g. routing/partition columns
    derived from the file path in the streaming router).
    """
    import re as _re

    from .zeek_tsv import _null_sentinels

    fields = FIELDS_BY_TYPE[record_type.lower()]
    parts = F.split(F.col(value_col), _re.escape(sep))
    # F.get (not getItem): ANSI mode throws on out-of-bounds, and a single
    # short/malformed line must never fail the task
    cols = [
        _null_sentinels(F.get(parts, i)).alias(name.replace(".", "_"))
        for i, name in enumerate(fields)
    ]
    return cast_records(
        df.select(*cols, *[F.col(c) for c in keep_cols]), record_type
    )


def read_proto_typed(spark, files: list[str], record_type: str) -> DataFrame:
    """Read one family's .log(.gz) files and apply its typed cast stage."""
    from .zeek_tsv import read_proto

    return cast_records(read_proto(spark, files), record_type)
