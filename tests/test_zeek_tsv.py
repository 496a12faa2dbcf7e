"""Zeek-TSV format-fidelity reader (FIXTURES.md §4; SURVEY.md §2 S1-S6, F1).

Mirrors the reference's own integration tests
(/root/reference/tests/zeek_search.rs) including the golden membership
pattern: an IP present on day 1 and absent on day 2 (:190-216)."""

import pytest

from log_analysis_spark.sources import zeek_tsv as zk

CONN_FIELDS = ["ts", "uid", "id.orig_h", "id.orig_p", "id.resp_h", "id.resp_p", "proto"]
IP_A = "43.134.231.178"  # golden IP from the reference's tests
IP_B = "91.92.245.221"


def _fixture_tree(root: str) -> None:
    zk.write_zeek_fixture(
        root, "2024-07-02", "conn", "00:00:00-01:00:00", CONN_FIELDS,
        [
            ["1719878401.1", "Cq1", IP_A, "5555", "10.0.0.2", "443", "tcp"],
            ["1719878402.2", "Cq2", "10.0.0.9", "1024", IP_B, "80", "tcp"],
            ["1719878403.3", "Cq3", "10.0.0.9", "-", "(empty)", "53", "udp"],
        ],
    )
    zk.write_zeek_fixture(
        root, "2024-07-02", "dns", "01:00:00-02:00:00", ["ts", "uid", "id.orig_h", "query"],
        [["1719882001.0", "Dq1", IP_A, "example.com"]],
    )
    zk.write_zeek_fixture(
        root, "2024-07-03", "conn", "00:00:00-01:00:00", CONN_FIELDS,
        [["1719964801.0", "Cq9", "10.0.0.7", "2222", "10.0.0.8", "443", "tcp"]],
    )


def test_header_sniff(tmpdir_path):
    _fixture_tree(tmpdir_path)
    files = zk.discover(tmpdir_path, "2024-07-02")
    assert set(files) == {"conn", "dns"}
    h = zk.sniff_header(files["conn"][0])
    assert h.separator == "\t"
    assert h.path == "conn"
    assert h.fields == CONN_FIELDS


def test_read_and_sentinels(spark, tmpdir_path):
    _fixture_tree(tmpdir_path)
    frames = zk.search(spark, tmpdir_path, "2024-07-02")
    conn = frames["conn"].toPandas()
    assert len(conn) == 3  # header + footer lines dropped
    assert set(conn.columns) >= {"id_orig_h", "record_type", "hour_bucket"}
    assert conn.record_type.unique().tolist() == ["conn"]
    assert conn.hour_bucket.unique().tolist() == ["00:00:00-01:00:00"]
    row = conn[conn.uid == "Cq3"].iloc[0]
    assert row["id_orig_p"] is None  # '-' unset sentinel
    assert row["id_resp_h"] is None  # '(empty)' sentinel


def test_src_ip_filter_and_membership(spark, tmpdir_path):
    """F1 row-level filter + golden membership across days
    (cf. /root/reference/tests/zeek_search.rs:190-216)."""
    _fixture_tree(tmpdir_path)
    day1 = zk.search(spark, tmpdir_path, "2024-07-02", src_ip=IP_A)
    ips1 = zk.distinct_src_ips(day1).toPandas()["ip"].tolist()
    assert IP_A in ips1

    day2 = zk.search(spark, tmpdir_path, "2024-07-03", src_ip=IP_A)
    total = sum(df.count() for df in day2.values())
    assert total == 0  # absent on day 2

    # resp-side match also keeps the row (row-level OR semantics)
    hit_b = zk.search(spark, tmpdir_path, "2024-07-02", src_ip=IP_B)
    assert hit_b["conn"].count() == 1


def test_proto_filter(spark, tmpdir_path):
    _fixture_tree(tmpdir_path)
    only = zk.search(spark, tmpdir_path, "2024-07-02", proto_type="DNS")
    assert list(only) == ["dns"]
    assert only["dns"].count() == 1


def test_invalid_date(tmpdir_path):
    with pytest.raises(zk.SearchInvalidStartDate):
        zk.discover(tmpdir_path, "07-02-2024")
    with pytest.raises(zk.SearchInvalidStartDate):
        zk.discover(tmpdir_path, "2099-01-01")


def test_distinct_src_ips_full(spark, tmpdir_path):
    """A1 rebuilt as FULL distinct (not the reference's value[0] sample —
    documented deviation, SURVEY.md §2 A1)."""
    _fixture_tree(tmpdir_path)
    frames = zk.search(spark, tmpdir_path, "2024-07-02")
    ips = sorted(zk.distinct_src_ips(frames).toPandas()["ip"])
    assert ips == sorted({IP_A, "10.0.0.9"})
