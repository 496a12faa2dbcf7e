"""Network-security detections (operators/detect.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.detect import (
    beacon_candidates,
    dns_tunnel_stats,
    port_scan_candidates,
)


def _chan(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )


def test_beacon_perfect_timer_scores_zero_and_flags(spark):
    """A perfectly periodic channel has jitter exactly 0.0; a bursty
    channel with the same event count does not flag."""
    t0 = datetime(2024, 1, 1)
    timer = [(1, i, t0 + timedelta(seconds=60 * i)) for i in range(30)]
    # bursty: 29 gaps alternating 1s and 3600s
    burst, cur = [], t0
    for i in range(30):
        burst.append((2, 100 + i, cur))
        cur += timedelta(seconds=1 if i % 2 == 0 else 3600)
    out = {
        r["user_id"]: r
        for r in beacon_candidates(
            _chan(spark, timer + burst), ["user_id"], min_events=20
        ).collect()
    }
    assert out[1]["jitter"] == 0.0 and out[1]["is_beacon"]
    assert out[1]["mean_gap_s"] == 60.0
    # bursty jitter: hand replay of (n*q - s*s)/(s*s)
    gaps = [1 if i % 2 == 0 else 3600 for i in range(29)]
    s, q, n = sum(gaps), sum(g * g for g in gaps), len(gaps)
    assert out[2]["jitter"] == pytest.approx((n * q - s * s) / (s * s))
    assert out[2]["jitter"] > 0.2 and not out[2]["is_beacon"]


def test_beacon_guards_min_events_and_zero_span(spark):
    """Channels under min_events, or with all-identical timestamps
    (span 0), keep NULL jitter and never flag."""
    t0 = datetime(2024, 1, 1)
    small = [(1, i, t0 + timedelta(seconds=60 * i)) for i in range(5)]
    burst0 = [(2, 100 + i, t0) for i in range(25)]
    out = {
        r["user_id"]: r
        for r in beacon_candidates(
            _chan(spark, small + burst0), ["user_id"], min_events=20
        ).collect()
    }
    assert out[1]["jitter"] is None and not out[1]["is_beacon"]
    assert out[2]["jitter"] is None and not out[2]["is_beacon"]
    assert out[2]["span_s"] == 0


def test_beacon_same_second_burst_tiebreak_deterministic(spark):
    """Events inside the same second order by event_id — the gap
    sequence (and so the score) is identical however the rows arrive."""
    t0 = datetime(2024, 1, 1)
    rows = [(1, i, t0 + timedelta(seconds=(i // 2) * 30)) for i in range(40)]
    a = beacon_candidates(_chan(spark, rows), ["user_id"]).collect()[0]
    b = beacon_candidates(
        _chan(spark, list(reversed(rows))), ["user_id"]
    ).collect()[0]
    assert a["jitter"] == b["jitter"]


def test_port_scan_threshold_edge(spark):
    """n_ports == min_ports flags; min_ports - 1 does not; repeats of
    the same port never inflate the distinct count."""
    t0 = datetime(2024, 1, 1)
    rows = [(1, t0, p) for p in range(100)]            # exactly 100
    rows += [(2, t0, p % 99) for p in range(200)]      # 99 distinct
    df = spark.createDataFrame(rows, "src long, ts timestamp, port long")
    out = {
        r["src"]: (r["n_ports"], r["is_scan"])
        for r in port_scan_candidates(df, "src", "port", min_ports=100).collect()
    }
    assert out[1] == (100, True)
    assert out[2] == (99, False)


def test_dns_tunnel_flags_and_hex_run(spark):
    """Integer cross-multiplied flags: the exfil source (len 46, 4
    labels, 32-hex run) flags; short organic names do not; a source
    under min_queries never flags even with long names."""
    rows = [(1, "a" * 14 + "bcdef0123456789abcdef0123456789a" + ".t.example.net")] * 12
    rows += [(2, "www.example.net")] * 12
    rows += [(3, "x" * 80 + ".a.b.c.d")] * 5  # long but too few
    df = spark.createDataFrame(rows, "src long, qname string")
    out = {
        r["src"]: r for r in dns_tunnel_stats(df, "src", "qname").collect()
    }
    assert out[1]["is_tunnel"]
    assert out[1]["max_hex_run"] >= 32
    assert not out[2]["is_tunnel"]
    assert out[2]["max_hex_run"] == 1  # 'e'/'a' singles in www.example.net
    assert not out[3]["is_tunnel"]  # n_queries guard


def test_beacon_state_merge_equals_full_recompute(spark):
    """merge(state(early), state(late)) == state(all) exactly, and the
    finalized scores equal beacon_candidates bit-for-bit — including a
    channel present in only one batch."""
    from log_analysis_spark.operators.detect import (
        beacon_state,
        beacon_scores_from_state,
        merge_beacon_states,
    )

    t0 = datetime(2024, 1, 1)
    rows = [(1, i, t0 + timedelta(seconds=60 * i + (i % 3))) for i in range(40)]
    rows += [(2, 100 + i, t0 + timedelta(seconds=i * i * 7)) for i in range(25)]
    rows += [(3, 200 + i, t0 + timedelta(seconds=30 * i)) for i in range(10, 22)]
    full = _chan(spark, rows)
    early = full.filter(F.col("ts") < t0 + timedelta(seconds=700))
    late = full.filter(F.col("ts") >= t0 + timedelta(seconds=700))
    # channel 3 lands entirely in 'early'? make sure both shapes exist
    merged = merge_beacon_states(
        beacon_state(early, ["user_id"]),
        beacon_state(late, ["user_id"]),
        ["user_id"],
    )
    want_state = {
        r["user_id"]: (r["n"], r["first_t"], r["last_t"], r["s"], r["q"])
        for r in beacon_state(full, ["user_id"]).collect()
    }
    got_state = {
        r["user_id"]: (r["n"], r["first_t"], r["last_t"], r["s"], r["q"])
        for r in merged.collect()
    }
    assert got_state == want_state

    want = {
        r["user_id"]: (r["n_events"], r["span_s"], r["mean_gap_s"], r["jitter"], r["is_beacon"])
        for r in beacon_candidates(full, ["user_id"], min_events=20).collect()
    }
    got = {
        r["user_id"]: (r["n_events"], r["span_s"], r["mean_gap_s"], r["jitter"], r["is_beacon"])
        for r in beacon_scores_from_state(merged, ["user_id"], min_events=20).collect()
    }
    assert got == want  # bitwise: same ints, same single division
    assert want[1][4] is True  # the timer channel flags


# ---------------------------------------------------------------------------
# homoglyph / confusable hosts
# ---------------------------------------------------------------------------
def test_confusable_skeleton_rules(spark):
    from log_analysis_spark.operators.detect import confusable_skeleton

    cases = {
        "paypa1.com": "paypai.com",
        "paypal.com": "paypai.com",  # 1 and l collapse to the same class
        "g00gle.com": "googie.com",
        "rnicrosoft.com": "microsoft.com",
        "vvindows.net": "windows.net",
        "c1oudfront.net": "cioudfront.net",
        "5tripe.io": "stripe.io",
    }
    df = spark.createDataFrame([(h,) for h in cases], ["h"])
    got = {
        r["h"]: r["sk"]
        for r in df.select("h", confusable_skeleton(F.col("h")).alias("sk")).collect()
    }
    assert got == cases


def test_confusable_groups_clusters_and_filters(spark):
    from log_analysis_spark.operators.detect import confusable_groups

    hosts = [
        "paypal.com", "paypa1.com", "paypai.com",   # one cluster of 3
        "rnail.example", "mail.example",            # rn->m cluster of 2
        "unique-host.org",                          # alone: filtered out
        "mail.example",                             # duplicate row: 1 spelling
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    got = {r["skeleton"]: (r["n_hosts"], r["hosts"]) for r in confusable_groups(df).collect()}
    assert got == {
        "paypai.com": (3, "paypa1.com|paypai.com|paypal.com"),
        "maii.exampie": (2, "mail.example|rnail.example"),
    }


def test_confusable_groups_no_false_merge(spark):
    from log_analysis_spark.operators.detect import confusable_groups

    df = spark.createDataFrame(
        [("alpha.com",), ("beta.com",), ("gamma.net",)], ["host"]
    )
    assert confusable_groups(df).count() == 0
