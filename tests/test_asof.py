"""As-of join: equivalence with pandas.merge_asof (a third independent
implementation besides the DuckDB ASOF JOIN oracle), inclusive-tie and
no-match semantics, plan shape (single exchange, no range-join blowup)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from log_analysis_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "key": rng.integers(0, 5, 200),
            "ts": rng.integers(0, 1000, 200),
            "lid": np.arange(200),
        }
    )
    right = (
        pd.DataFrame(
            {
                "key": rng.integers(0, 5, 80),
                "ts": rng.integers(0, 1000, 80),
                "val": rng.normal(size=80).round(3),
            }
        )
        .groupby(["key", "ts"], as_index=False)  # unique per (key, ts)
        .agg(val=("val", "max"))
    )
    return spark.createDataFrame(left), spark.createDataFrame(right), left, right


def test_asof_matches_pandas_merge_asof(frames):
    sl, sr, pl, pr = frames
    got = (
        asof_join(sl, sr, on=["key"], ts_col="ts", value_cols=["val"])
        .orderBy("lid")
        .toPandas()
    )
    want = pd.merge_asof(
        pl.sort_values("ts", kind="mergesort"),
        pr.sort_values("ts", kind="mergesort"),
        on="ts",
        by="key",
        direction="backward",  # right.ts <= left.ts, inclusive — same contract
    ).sort_values("lid")
    got_map = dict(zip(got["lid"], got["val"]))
    want_map = dict(zip(want["lid"], want["val"]))
    assert set(got_map) == set(want_map)
    for k in want_map:
        gv, wv = got_map[k], want_map[k]
        assert (pd.isna(gv) and pd.isna(wv)) or gv == wv


def test_asof_inclusive_tie_and_no_match(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"key": [1, 1, 2], "ts": [10, 5, 10], "lid": [0, 1, 2]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"key": [1, 1], "ts": [10, 3], "val": [9.0, 7.0]})
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join(left, right, ["key"], "ts", ["val"]).collect()
    }
    assert got[0] == 9.0  # equal ts is matched (inclusive)
    assert got[1] == 7.0  # earlier right row carried forward
    assert got[2] is None  # key with no right rows -> NULL


def test_asof_null_right_value_not_forward_filled(spark):
    """A matched right row whose value is legitimately NULL must attach
    NULL — not silently forward-fill an earlier right row's value (and with
    several value columns, all must come from the SAME right row). This is
    DuckDB/pandas ASOF semantics; per-column last(ignorenulls) violates it."""
    left = spark.createDataFrame(
        pd.DataFrame({"key": [1, 1], "ts": [6, 3], "lid": [0, 1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": [1, 1],
                "ts": [2, 5],
                "val": [7.0, None],
                "tag": ["a", "b"],
            }
        )
    )
    got = {
        r["lid"]: (r["val"], r["tag"])
        for r in asof_join(left, right, ["key"], "ts", ["val", "tag"]).collect()
    }
    assert got[0] == (None, "b")  # ts=6 matches ts=5 row: NULL val, tag b
    assert got[1] == (7.0, "a")  # ts=3 matches ts=2 row


def test_asof_plan_is_single_shuffle_no_range_join(frames):
    import contextlib
    import io

    sl, sr, _pl, _pr = frames
    df = asof_join(sl, sr, on=["key"], ts_col="ts", value_cols=["val"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the union-window form needs no join operator at all
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_range_join_matches_naive_and_plan_is_equi(spark):
    from log_analysis_spark.operators.asof import range_join_points

    rng = np.random.default_rng(9)
    left = spark.createDataFrame(
        pd.DataFrame(
            {"key": rng.integers(0, 4, 150), "ts": rng.integers(0, 5000, 150),
             "lid": np.arange(150)}
        )
    )
    s = rng.integers(0, 5000, 40)
    right_pd = pd.DataFrame(
        {"key": rng.integers(0, 4, 40), "s": s, "e": s + rng.integers(1, 900, 40)}
    ).drop_duplicates(["key", "s"])
    right = spark.createDataFrame(right_pd)

    got = range_join_points(
        left, right, on=["key"], ts_col="ts", start_col="s", end_col="e",
        bucket_width=250,
    )
    got_pairs = {(r["lid"], r["s"]) for r in got.collect()}
    lp = left.toPandas()
    want_pairs = {
        (lr.lid, rr.s)
        for lr in lp.itertuples()
        for rr in right_pd.itertuples()
        if lr.key == rr.key and rr.s <= lr.ts < rr.e
    }
    assert got_pairs == want_pairs and want_pairs

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # equi-join on (key, bucket)
