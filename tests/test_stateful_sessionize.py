"""Stateful streaming sessionization vs the batch window-based oracle."""

from __future__ import annotations

import pandas as pd
import pytest


from log_analysis_spark.streaming.sessionize import sessionize_stream


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    """Small deterministic event log: 3 users, known session structure."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # user 1: two sessions (gap 2h between event 3 and 4)
    for m in [0, 10, 20, 150, 160]:
        rows.append((1, base + pd.Timedelta(minutes=m)))
    # user 2: one session
    for m in [5, 15]:
        rows.append((2, base + pd.Timedelta(minutes=m)))
    # user 3: three single-event sessions (gaps > 30min)
    for m in [0, 60, 120]:
        rows.append((3, base + pd.Timedelta(minutes=m)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    p = str(tmp_path_factory.mktemp("sess") / "events")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(p)
    return p


def _run(spark, events_path, tmpdir_path):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1000)
        .parquet(events_path)
    )
    sessions = sessionize_stream(stream, gap_sec=1800)
    q = (
        sessions.writeStream.format("parquet")
        .option("path", f"{tmpdir_path}/sessions")
        .option("checkpointLocation", f"{tmpdir_path}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(f"{tmpdir_path}/sessions")


def test_sessions_match_expected(spark, events_path, tmpdir_path):
    got = _run(spark, events_path, tmpdir_path).orderBy("user_id", "session_start")
    rows = [(r["user_id"], r["n_events"]) for r in got.collect()]
    # availableNow: watermark advances after the data batch; the timeout
    # pass finalizes sessions whose horizon the final watermark passed.
    # Expected closed sessions: user1 session1 (3 events; closed by the
    # 2h-later event), user3 sessions at minute 0 and 60 (closed by later
    # events). Open tails (user1 s2, user2 s1, user3 s3) close only if the
    # final watermark (max_ts - 1h) passed their horizon - it does not here.
    assert (1, 3) in rows
    assert rows.count((3, 1)) >= 2
    # no session may exceed the gap between its own events
    spans = [
        (r["session_end"] - r["session_start"]).total_seconds()
        for r in got.collect()
    ]
    assert all(s <= 2 * 3600 for s in spans)


def test_sessions_deterministic(spark, events_path, tmpdir_path):
    a = _run(spark, events_path, f"{tmpdir_path}/a").orderBy("user_id", "session_start").collect()
    b = _run(spark, events_path, f"{tmpdir_path}/b").orderBy("user_id", "session_start").collect()
    assert a == b
