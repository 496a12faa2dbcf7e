"""Typed Zeek record families: per-type field vocabularies + cast stages.

The reference routes 28 record types (/root/reference/src/zeek/
zeek_log_proto.rs:5-37) but keeps every value an untyped string, ignoring
the ``#types`` header line (/root/reference/src/zeek/zeek_log.rs:147-149).
The rebuild supplies typed parsers for EVERY record type in the
reference's router enum — all 28 of zeek_log_proto.rs:5-37 (conn, dns,
http, files, ftp, ssl, x509, smtp, snmp, ssh, pe, dhcp, ntp, smb, irc,
rdp, ldap, quic, traceroute, tunnel, dpd, known, software, weird, notice,
capture_loss, reporter, sip) — with field vocabularies from the public
Zeek log documentation (docs.zeek.org log-files reference) and Zeek's
value conventions:

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

# --- the long tail: every remaining record type of the reference's router
# enum (zeek_log_proto.rs:5-37), fields per the corresponding public Zeek
# log documentation --------------------------------------------------------
FTP_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "user", "password", "command", "arg",
    "mime_type", "file_size", "reply_code", "reply_msg",
    "data_channel.passive", "data_channel.orig_h", "data_channel.resp_h",
    "data_channel.resp_p", "fuid",
]

X509_FIELDS = [  # x509.log, Zeek 4+ layout (fingerprint keyed)
    "ts", "fingerprint", "certificate.version", "certificate.serial",
    "certificate.subject", "certificate.issuer",
    "certificate.not_valid_before", "certificate.not_valid_after",
    "certificate.key_alg", "certificate.sig_alg", "certificate.key_type",
    "certificate.key_length", "certificate.exponent", "certificate.curve",
    "san.dns", "san.uri", "san.email", "san.ip",
    "basic_constraints.ca", "basic_constraints.path_len",
]

SNMP_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "duration", "version", "community",
    "get_requests", "get_bulk_requests", "get_responses", "set_requests",
    "display_string", "up_since",
]

PE_FIELDS = [
    "ts", "id", "machine", "compile_ts", "os", "subsystem", "is_exe",
    "is_64bit", "uses_aslr", "uses_dep", "uses_code_integrity", "uses_seh",
    "has_import_table", "has_export_table", "has_cert_table",
    "has_debug_data", "section_names",
]

DHCP_FIELDS = [  # dhcp.log aggregates a whole exchange: uids is a set
    "ts", "uids", "client_addr", "server_addr", "mac", "host_name",
    "client_fqdn", "domain", "requested_addr", "assigned_addr",
    "lease_time", "client_message", "server_message", "msg_types",
    "duration",
]

NTP_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "version", "mode", "stratum", "poll",
    "precision", "root_delay", "root_disp", "ref_id", "ref_time",
    "org_time", "rec_time", "xmt_time", "num_exts",
]

SMB_FIELDS = [  # the reference routes files literally named smb.*; the
    # closest public vocabulary is smb_mapping.log (tree-connect mapping)
    "ts", "uid", *CONN_ID_FIELDS, "path", "service", "native_file_system",
    "share_type",
]

IRC_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "nick", "user", "command", "value",
    "addl", "dcc_file_name", "dcc_file_size", "dcc_mime_type", "fuid",
]

RDP_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "cookie", "result", "security_protocol",
    "client_channels", "keyboard_layout", "client_build", "client_name",
    "client_dig_product_id", "desktop_width", "desktop_height",
    "requested_color_depth", "cert_type", "cert_count", "cert_permanent",
    "encryption_level", "encryption_method",
]

LDAP_FIELDS = [  # ldap.log (Zeek 6)
    "ts", "uid", *CONN_ID_FIELDS, "message_id", "version", "opcode",
    "result", "diagnostic_message", "object", "argument",
]

QUIC_FIELDS = [  # quic.log (Zeek 6)
    "ts", "uid", *CONN_ID_FIELDS, "version", "client_initial_dcid",
    "client_scid", "server_scid", "server_name", "client_protocol",
    "history",
]

TRACEROUTE_FIELDS = ["ts", "src", "dst", "proto"]

TUNNEL_FIELDS = ["ts", "uid", *CONN_ID_FIELDS, "tunnel_type", "action"]

DPD_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "proto", "analyzer", "failure_reason",
]

KNOWN_FIELDS = [  # the reference routes files named known.*; vocabulary
    # from known_services.log (the known-entities family's richest form)
    "ts", "host", "port_num", "port_proto", "service",
]

SOFTWARE_FIELDS = [
    "ts", "host", "host_p", "software_type", "name", "version.major",
    "version.minor", "version.minor2", "version.minor3", "version.addl",
    "unparsed_version",
]

CAPTURE_LOSS_FIELDS = [
    "ts", "ts_delta", "peer", "gaps", "acks", "percent_lost",
]

REPORTER_FIELDS = ["ts", "level", "message", "location"]

SIP_FIELDS = [
    "ts", "uid", *CONN_ID_FIELDS, "trans_depth", "method", "uri", "date",
    "request_from", "request_to", "response_from", "response_to",
    "reply_to", "call_id", "seq", "subject", "request_path",
    "response_path", "user_agent", "status_code", "status_msg", "warning",
    "request_body_len", "response_body_len", "content_type",
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
    "ftp": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "file_size": "count", "reply_code": "count",
        "data_channel_passive": "bool", "data_channel_resp_p": "port",
    },
    "x509": {
        "ts": "time", "certificate_version": "count",
        "certificate_not_valid_before": "time",
        "certificate_not_valid_after": "time",
        "certificate_key_length": "count",
        "san_dns": "vector", "san_uri": "vector", "san_email": "vector",
        "san_ip": "vector", "basic_constraints_ca": "bool",
        "basic_constraints_path_len": "count",
    },
    "snmp": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "duration": "interval", "get_requests": "count",
        "get_bulk_requests": "count", "get_responses": "count",
        "set_requests": "count", "up_since": "time",
    },
    "pe": {
        "ts": "time", "compile_ts": "time", "is_exe": "bool",
        "is_64bit": "bool", "uses_aslr": "bool", "uses_dep": "bool",
        "uses_code_integrity": "bool", "uses_seh": "bool",
        "has_import_table": "bool", "has_export_table": "bool",
        "has_cert_table": "bool", "has_debug_data": "bool",
        "section_names": "vector",
    },
    "dhcp": {
        "ts": "time", "uids": "vector", "lease_time": "interval",
        "msg_types": "vector", "duration": "interval",
    },
    "ntp": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "version": "count", "mode": "count", "stratum": "count",
        "poll": "interval", "precision": "interval",
        "root_delay": "interval", "root_disp": "interval",
        "ref_time": "time", "org_time": "time", "rec_time": "time",
        "xmt_time": "time", "num_exts": "count",
    },
    "smb": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
    },
    "irc": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "dcc_file_size": "count",
    },
    "rdp": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "client_channels": "vector", "desktop_width": "count",
        "desktop_height": "count", "cert_count": "count",
        "cert_permanent": "bool",
    },
    "ldap": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "message_id": "count", "version": "count",
    },
    "quic": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
    },
    "traceroute": {"ts": "time"},
    "tunnel": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
    },
    "dpd": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
    },
    "known": {
        "ts": "time", "port_num": "port", "service": "vector",
    },
    "software": {
        "ts": "time", "host_p": "port", "version_major": "count",
        "version_minor": "count", "version_minor2": "count",
        "version_minor3": "count",
    },
    "capture_loss": {
        "ts": "time", "ts_delta": "interval", "gaps": "count",
        "acks": "count", "percent_lost": "double",
    },
    "reporter": {"ts": "time"},
    "sip": {
        "ts": "time", "id_orig_p": "port", "id_resp_p": "port",
        "trans_depth": "count", "request_path": "vector",
        "response_path": "vector", "status_code": "count",
        "request_body_len": "count", "response_body_len": "count",
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
    "ftp": FTP_FIELDS,
    "x509": X509_FIELDS,
    "snmp": SNMP_FIELDS,
    "pe": PE_FIELDS,
    "dhcp": DHCP_FIELDS,
    "ntp": NTP_FIELDS,
    "smb": SMB_FIELDS,
    "irc": IRC_FIELDS,
    "rdp": RDP_FIELDS,
    "ldap": LDAP_FIELDS,
    "quic": QUIC_FIELDS,
    "traceroute": TRACEROUTE_FIELDS,
    "tunnel": TUNNEL_FIELDS,
    "dpd": DPD_FIELDS,
    "known": KNOWN_FIELDS,
    "software": SOFTWARE_FIELDS,
    "capture_loss": CAPTURE_LOSS_FIELDS,
    "reporter": REPORTER_FIELDS,
    "sip": SIP_FIELDS,
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
