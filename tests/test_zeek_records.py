"""Typed Zeek record families (dns/ssl/weird): cast stages + routed counts.

Extends the format-fidelity reader tests with the per-family typed schemas
a real Zeek user needs (reference routes 28 types untyped,
/root/reference/src/zeek/zeek_log_proto.rs:5-37; fields per public Zeek
docs)."""

import pytest

from pyspark.sql import types as T

from log_analysis_spark.sources import zeek_records as zr
from log_analysis_spark.sources import zeek_tsv as zk



def _dns_fixture(root: str) -> None:
    fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h", "id.resp_p",
              "proto", "trans_id", "rtt", "query", "qclass", "qclass_name",
              "qtype", "qtype_name", "rcode", "rcode_name", "AA", "TC", "RD",
              "RA", "Z", "answers", "TTLs", "rejected"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "dns", "00:00:00-01:00:00", fields,
        [
            ["1719878401.123456", "D1", "10.0.0.1", "5353", "8.8.8.8", "53",
             "udp", "1001", "0.015", "example.com", "1", "C_INTERNET",
             "1", "A", "0", "NOERROR", "F", "F", "T", "T", "0",
             "93.184.216.34,93.184.216.35", "300.0,600.0", "F"],
            ["1719878402.5", "D2", "10.0.0.2", "-", "8.8.4.4", "53",
             "udp", "1002", "-", "missing.example", "1", "C_INTERNET",
             "28", "AAAA", "3", "NXDOMAIN", "F", "F", "T", "F", "0",
             "-", "-", "T"],
        ],
    )


def _ssl_weird_fixture(root: str) -> None:
    ssl_fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h",
                  "id.resp_p", "version", "cipher", "curve", "server_name",
                  "resumed", "last_alert", "next_protocol", "established",
                  "ssl_history"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "ssl", "00:00:00-01:00:00", ssl_fields,
        [
            ["1719878403.0", "S1", "10.0.0.1", "44310", "93.184.216.34", "443",
             "TLSv13", "TLS_AES_128_GCM_SHA256", "x25519", "example.org",
             "F", "-", "h2", "T", "CsxkrOAd"],
            ["1719878404.0", "S2", "10.0.0.3", "44311", "93.184.216.34", "443",
             "TLSv12", "TLS_ECDHE_RSA_WITH_AES_128_GCM_SHA256", "-", "(empty)",
             "T", "-", "-", "F", "Cs"],
        ],
    )
    weird_fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h",
                    "id.resp_p", "name", "addl", "notice", "peer"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "weird", "00:00:00-01:00:00", weird_fields,
        [["1719878405.0", "W1", "10.0.0.9", "1024", "10.0.0.10", "80",
          "bad_HTTP_request", "-", "F", "zeek"]],
    )


def _conn_http_fixture(root: str) -> None:
    conn_fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h",
                   "id.resp_p", "proto", "service", "duration", "orig_bytes",
                   "resp_bytes", "conn_state", "local_orig", "local_resp",
                   "missed_bytes", "history", "orig_pkts", "orig_ip_bytes",
                   "resp_pkts", "resp_ip_bytes", "tunnel_parents"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "conn", "00:00:00-01:00:00", conn_fields,
        [
            ["1719878401.5", "C1", "10.0.0.1", "50001", "93.184.216.34", "443",
             "tcp", "ssl", "12.345", "4521", "98340", "SF", "T", "F",
             "0", "ShADadFf", "25", "5821", "40", "100460", "-"],
            ["1719878402.0", "C2", "10.0.0.2", "50002", "8.8.8.8", "53",
             "udp", "dns", "-", "-", "120", "S0", "-", "-",
             "0", "D", "1", "68", "0", "0", "T1,T2"],
        ],
    )
    http_fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h",
                   "id.resp_p", "trans_depth", "method", "host", "uri",
                   "referrer", "version", "user_agent", "origin",
                   "request_body_len", "response_body_len", "status_code",
                   "status_msg", "info_code", "info_msg", "tags", "username",
                   "password", "proxied", "orig_fuids", "orig_filenames",
                   "orig_mime_types", "resp_fuids", "resp_filenames",
                   "resp_mime_types"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "http", "00:00:00-01:00:00", http_fields,
        [
            ["1719878403.25", "H1", "10.0.0.1", "50003", "198.51.100.7", "80",
             "1", "GET", "example.com", "/index.html", "-", "1.1",
             "curl/8.0", "-", "0", "5120", "200", "OK", "-", "-",
             "(empty)", "-", "-", "-", "-", "-", "-",
             "FakeFuid1,FakeFuid2", "-", "text/html,text/plain"],
        ],
    )


def test_dns_typed_cast(spark, tmpdir_path):
    _dns_fixture(tmpdir_path)
    files = zk.discover(tmpdir_path, "2024-07-02")
    dns = zr.read_proto_typed(spark, files["dns"], "dns")
    sch = {f.name: f.dataType for f in dns.schema.fields}
    assert sch["ts"] == T.DoubleType()
    assert sch["id_orig_p"] == T.IntegerType()
    assert sch["trans_id"] == T.LongType()
    assert sch["qtype"] == T.LongType()
    assert sch["AA"] == T.BooleanType()
    assert sch["answers"] == T.ArrayType(T.StringType(), containsNull=False)
    rows = {r["uid"]: r for r in dns.collect()}
    r1, r2 = rows["D1"], rows["D2"]
    assert r1["ts"] == pytest.approx(1719878401.123456)
    assert r1["qtype"] == 1 and r1["qtype_name"] == "A"
    assert r1["AA"] is False and r1["RD"] is True
    assert r1["answers"] == ["93.184.216.34", "93.184.216.35"]
    assert r1["rejected"] is False
    # unset sentinels -> typed NULLs, one bad field never kills the row
    assert r2["id_orig_p"] is None
    assert r2["rtt"] is None
    assert r2["answers"] is None
    assert r2["rejected"] is True
    assert r2["rcode"] == 3 and r2["rcode_name"] == "NXDOMAIN"


def test_ssl_weird_typed_and_routed_counts(spark, tmpdir_path):
    _dns_fixture(tmpdir_path)
    _ssl_weird_fixture(tmpdir_path)
    files = zk.discover(tmpdir_path, "2024-07-02")
    # routed-count golden: every family routes to its own frame with the
    # fixture's row count (reference LogTree fan-out, zeek_log.rs:383-397)
    counts = {
        proto: zr.read_proto_typed(spark, files[proto], proto).count()
        for proto in ("dns", "ssl", "weird")
    }
    assert counts == {"dns": 2, "ssl": 2, "weird": 1}

    ssl = {r["uid"]: r for r in zr.read_proto_typed(spark, files["ssl"], "ssl").collect()}
    assert ssl["S1"]["established"] is True and ssl["S1"]["resumed"] is False
    assert ssl["S2"]["established"] is False and ssl["S2"]["resumed"] is True
    assert ssl["S2"]["curve"] is None          # '-' unset
    assert ssl["S2"]["server_name"] is None    # '(empty)'
    weird = zr.read_proto_typed(spark, files["weird"], "weird").collect()[0]
    assert weird["name"] == "bad_HTTP_request" and weird["notice"] is False


def test_conn_http_typed_cast(spark, tmpdir_path):
    """conn/http typed vocabularies on the real TSV file path (fields per
    public Zeek conn.log/http.log docs): interval/count/bool/vector casts,
    '-' unset sentinels -> typed NULLs."""
    _conn_http_fixture(tmpdir_path)
    files = zk.discover(tmpdir_path, "2024-07-02")

    conn = {r["uid"]: r for r in zr.read_proto_typed(spark, files["conn"], "conn").collect()}
    sch = {f.name: f.dataType for f in zr.read_proto_typed(spark, files["conn"], "conn").schema.fields}
    assert sch["duration"] == T.DoubleType()
    assert sch["orig_bytes"] == T.LongType()
    assert sch["local_orig"] == T.BooleanType()
    c1, c2 = conn["C1"], conn["C2"]
    assert c1["duration"] == pytest.approx(12.345)
    assert c1["orig_bytes"] == 4521 and c1["resp_ip_bytes"] == 100460
    assert c1["local_orig"] is True and c1["local_resp"] is False
    assert c1["tunnel_parents"] is None  # '-' unset set[string]
    assert c2["duration"] is None and c2["orig_bytes"] is None
    assert c2["local_orig"] is None
    assert c2["tunnel_parents"] == ["T1", "T2"]

    http = zr.read_proto_typed(spark, files["http"], "http").collect()[0]
    assert http["trans_depth"] == 1 and http["status_code"] == 200
    assert http["response_body_len"] == 5120
    assert http["referrer"] is None and http["tags"] is None  # '-'/'(empty)'
    assert http["resp_fuids"] == ["FakeFuid1", "FakeFuid2"]
    assert http["resp_mime_types"] == ["text/html", "text/plain"]

    # search(typed=True) dispatches the new families automatically
    frames = zk.search(spark, tmpdir_path, "2024-07-02", typed=True)
    assert {f.name: f.dataType for f in frames["conn"].schema.fields}[
        "resp_bytes"
    ] == T.LongType()
    assert {f.name: f.dataType for f in frames["http"].schema.fields}[
        "status_code"
    ] == T.LongType()


def _files_ssh_smtp_notice_fixture(root: str) -> None:
    files_fields = ["ts", "fuid", "uid", "id.orig_h", "id.orig_p",
                    "id.resp_h", "id.resp_p", "source", "depth", "analyzers",
                    "mime_type", "filename", "duration", "local_orig",
                    "is_orig", "seen_bytes", "total_bytes", "missing_bytes",
                    "overflow_bytes", "timedout", "parent_fuid", "md5",
                    "sha1", "sha256", "extracted", "extracted_cutoff",
                    "extracted_size"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "files", "00:00:00-01:00:00", files_fields,
        [
            ["1719878406.0", "F1", "C1", "10.0.0.1", "50001", "203.0.113.9",
             "80", "HTTP", "0", "MD5,SHA1", "text/html", "index.html",
             "0.25", "T", "F", "5120", "5120", "0", "0", "F", "-",
             "d41d8cd98f00b204e9800998ecf8427e", "-", "-", "-", "F", "-"],
            ["1719878407.0", "F2", "C2", "10.0.0.2", "50002", "203.0.113.9",
             "80", "HTTP", "0", "-", "application/pdf", "-",
             "-", "-", "T", "800", "-", "0", "0", "T", "-",
             "-", "-", "-", "-", "-", "-"],
        ],
    )
    ssh_fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h",
                  "id.resp_p", "version", "auth_success", "auth_attempts",
                  "direction", "client", "server", "cipher_alg", "mac_alg",
                  "compression_alg", "kex_alg", "host_key_alg", "host_key"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "ssh", "00:00:00-01:00:00", ssh_fields,
        [["1719878408.0", "SH1", "10.0.0.5", "40000", "198.51.100.22", "22",
          "2", "T", "3", "INBOUND", "SSH-2.0-OpenSSH_9.6",
          "SSH-2.0-OpenSSH_8.9", "chacha20-poly1305@openssh.com",
          "umac-64-etm@openssh.com", "none", "curve25519-sha256",
          "ssh-ed25519", "SHA256:deadbeef"]],
    )
    smtp_fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h",
                   "id.resp_p", "trans_depth", "helo", "mailfrom", "rcptto",
                   "date", "from", "to", "cc", "reply_to", "msg_id",
                   "in_reply_to", "subject", "x_originating_ip",
                   "first_received", "second_received", "last_reply", "path",
                   "user_agent", "tls", "fuids", "is_webmail"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "smtp", "00:00:00-01:00:00", smtp_fields,
        [["1719878409.0", "M1", "10.0.0.6", "40001", "192.0.2.25", "25",
          "1", "mail.example.com", "a@example.com", "b@example.org,c@example.org",
          "-", "a@example.com", "b@example.org", "-", "-", "<m1@example.com>",
          "-", "hello", "-", "-", "-", "250 OK", "192.0.2.25,192.0.2.26",
          "smtpclient/1.0", "T", "-", "F"]],
    )
    notice_fields = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h",
                     "id.resp_p", "fuid", "file_mime_type", "file_desc",
                     "proto", "note", "msg", "sub", "src", "dst", "p", "n",
                     "peer_descr", "actions", "email_dest", "suppress_for",
                     "remote_location.country_code", "remote_location.region",
                     "remote_location.city", "remote_location.latitude",
                     "remote_location.longitude"]
    zk.write_zeek_fixture(
        root, "2024-07-02", "notice", "00:00:00-01:00:00", notice_fields,
        [["1719878410.0", "N1", "10.0.0.7", "40002", "198.51.100.1", "22",
          "-", "-", "-", "tcp", "SSH::Password_Guessing", "guessing", "-",
          "10.0.0.7", "198.51.100.1", "22", "8", "-",
          "Notice::ACTION_LOG,Notice::ACTION_EMAIL", "-", "3600.0",
          "US", "-", "-", "37.75", "-122.45"]],
    )


def test_files_ssh_smtp_notice_typed_cast(spark, tmpdir_path):
    """files/ssh/smtp/notice typed vocabularies on the real TSV file path
    (fields per public Zeek docs; round-3 verdict ask #3): count/interval/
    bool/vector/double casts, '-' unset sentinels -> typed NULLs, and
    search(typed=True) dispatching all four automatically."""
    _files_ssh_smtp_notice_fixture(tmpdir_path)
    files = zk.discover(tmpdir_path, "2024-07-02")

    fl = {r["fuid"]: r for r in zr.read_proto_typed(spark, files["files"], "files").collect()}
    f1, f2 = fl["F1"], fl["F2"]
    assert f1["seen_bytes"] == 5120 and f1["depth"] == 0
    assert f1["analyzers"] == ["MD5", "SHA1"]
    assert f1["duration"] == pytest.approx(0.25)
    assert f1["local_orig"] is True and f1["timedout"] is False
    assert f1["extracted_cutoff"] is False
    assert f2["total_bytes"] is None and f2["md5"] is None
    assert f2["analyzers"] is None and f2["duration"] is None
    assert f2["timedout"] is True

    ssh = zr.read_proto_typed(spark, files["ssh"], "ssh").collect()[0]
    assert ssh["version"] == 2 and ssh["auth_attempts"] == 3
    assert ssh["auth_success"] is True and ssh["direction"] == "INBOUND"

    smtp = zr.read_proto_typed(spark, files["smtp"], "smtp").collect()[0]
    assert smtp["trans_depth"] == 1 and smtp["tls"] is True
    assert smtp["rcptto"] == ["b@example.org", "c@example.org"]
    assert smtp["path"] == ["192.0.2.25", "192.0.2.26"]
    assert smtp["cc"] is None and smtp["is_webmail"] is False

    notice = zr.read_proto_typed(spark, files["notice"], "notice").collect()[0]
    assert notice["p"] == 22 and notice["n"] == 8
    assert notice["actions"] == ["Notice::ACTION_LOG", "Notice::ACTION_EMAIL"]
    assert notice["suppress_for"] == pytest.approx(3600.0)
    assert notice["remote_location_latitude"] == pytest.approx(37.75)
    assert notice["remote_location_longitude"] == pytest.approx(-122.45)
    assert notice["email_dest"] is None

    frames = zk.search(spark, tmpdir_path, "2024-07-02", typed=True)
    assert set(frames) == {"files", "ssh", "smtp", "notice"}
    sch = {f.name: f.dataType for f in frames["files"].schema.fields}
    assert sch["seen_bytes"] == T.LongType() and sch["timedout"] == T.BooleanType()
    assert {f.name: f.dataType for f in frames["notice"].schema.fields}[
        "remote_location_latitude"
    ] == T.DoubleType()


REFERENCE_ROUTER_TYPES = {
    # the reference's full ZeekProtocol decode vocabulary
    # (/root/reference/src/zeek/zeek_log_proto.rs:40-74), minus NONE
    "conn", "dns", "http", "files", "ftp", "ssl", "x509", "smtp", "snmp",
    "ssh", "pe", "dhcp", "ntp", "smb", "irc", "rdp", "ldap", "quic",
    "traceroute", "tunnel", "dpd", "known", "software", "weird", "notice",
    "capture_loss", "reporter", "sip",
}

_KIND_SAMPLE = {
    "time": ("1719878401.5", 1719878401.5),
    "interval": ("0.25", 0.25),
    "double": ("2.5", 2.5),
    "port": ("443", 443),
    "count": ("7", 7),
    "bool": ("T", True),
    "vector": ("a,b", ["a", "b"]),
}


def test_typed_vocabulary_covers_full_reference_router():
    """Every record type the reference's router can decode has a typed
    vocabulary — full parity with the 28-type enum."""
    assert set(zr.FIELDS_BY_TYPE) == REFERENCE_ROUTER_TYPES
    # every cast-map key must point at a real field of its vocabulary
    for fam, casts in zr._CASTS.items():
        fields = {f.replace(".", "_") for f in zr.FIELDS_BY_TYPE[fam]}
        missing = set(casts) - fields
        assert not missing, f"{fam}: cast keys not in vocabulary: {missing}"


@pytest.mark.parametrize("fam", sorted(REFERENCE_ROUTER_TYPES))
def test_every_family_parses_and_casts(spark, fam):
    """One synthetic TSV line per family, values generated from the cast
    kinds: every typed column must land with the right Spark type and
    round-trip its value; every untyped column stays a string."""
    fields = zr.FIELDS_BY_TYPE[fam]
    casts = zr._CASTS[fam]
    cells = []
    for name in fields:
        key = name.replace(".", "_")
        kind = casts.get(key)
        cells.append(_KIND_SAMPLE[kind][0] if kind else f"v_{key}")
    df = spark.createDataFrame([("\t".join(cells),)], ["value"])
    row = zr.parse_tsv_lines(df, fam).collect()[0]
    for name in fields:
        key = name.replace(".", "_")
        kind = casts.get(key)
        if kind:
            assert row[key] == _KIND_SAMPLE[kind][1], (fam, key)
        else:
            assert row[key] == f"v_{key}", (fam, key)


def test_discover_handles_underscore_protos(spark, tmpdir_path):
    """capture_loss.log-style names (underscore in the record type) are
    discovered and routed — the reference decodes 'capture_loss'
    (zeek_log_proto.rs:67)."""
    zk.write_zeek_fixture(
        tmpdir_path, "2024-07-02", "capture_loss", "00:00:00-01:00:00",
        ["ts", "ts_delta", "peer", "gaps", "acks", "percent_lost"],
        [["1719878401.0", "900.0", "zeek", "3", "1200", "0.25"]],
    )
    files = zk.discover(tmpdir_path, "2024-07-02")
    assert "capture_loss" in files
    row = zr.read_proto_typed(spark, files["capture_loss"], "capture_loss").collect()[0]
    assert row["gaps"] == 3 and row["percent_lost"] == pytest.approx(0.25)
    assert row["ts_delta"] == pytest.approx(900.0)


def test_unknown_family_raises(spark):
    with pytest.raises(ValueError, match="no typed schema"):
        zr.cast_records(spark.range(1), "not_a_zeek_family")


def test_write_ip_db(spark, tmpdir_path):
    """ip.db export: distinct IPs across dates, one per line, chmod 444
    (reference tests/zeek_search.rs:70-123)."""
    import os
    import stat

    _dns_fixture(tmpdir_path)
    _ssl_weird_fixture(tmpdir_path)
    frames = zk.search(spark, tmpdir_path, "2024-07-02")
    out = os.path.join(tmpdir_path, "ip.db")
    n = zk.write_ip_db({"2024-07-02": frames}, out)
    with open(out) as f:
        ips = [ln.strip() for ln in f]
    assert n == len(ips) == len(set(ips))
    assert "10.0.0.1" in ips and ips == sorted(ips)
    assert stat.S_IMODE(os.stat(out).st_mode) == 0o444
    # idempotent re-export over the read-only file
    assert zk.write_ip_db({"2024-07-02": frames}, out) == n


def test_parse_tsv_lines_short_line_nulls(spark):
    df = spark.createDataFrame(
        [("1719878401\tD1\t10.0.0.1",)], ["value"]
    )
    out = zr.parse_tsv_lines(df, "dns").collect()[0]
    assert out["ts"] == 1719878401.0
    assert out["uid"] == "D1"
    assert out["id_orig_h"] == "10.0.0.1"
    assert out["qtype_name"] is None  # missing trailing fields -> NULL


def test_search_typed_applies_family_casts(spark, tmpdir_path):
    from pyspark.sql import types as T2

    _dns_fixture(tmpdir_path)
    _ssl_weird_fixture(tmpdir_path)
    frames = zk.search(spark, tmpdir_path, "2024-07-02", typed=True)
    sch = {f.name: f.dataType for f in frames["dns"].schema.fields}
    assert sch["ts"] == T2.DoubleType() and sch["AA"] == T2.BooleanType()
    assert {f.name: f.dataType for f in frames["ssl"].schema.fields}[
        "established"
    ] == T2.BooleanType()
