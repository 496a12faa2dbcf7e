"""Incremental mergeable-state tests: merge associativity/commutativity,
exact equivalence to full recompute, persisted-state refresh."""

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.incremental import (
    Metric,
    agg_state,
    finalize_state,
    merge_states,
    update_state,
)

METRICS = [
    Metric("n", "count"),
    Metric("s", "sum", "v"),
    Metric("lo", "min", "x"),
    Metric("hi", "max", "x"),
    Metric("d", "hll", "u"),
    Metric("q", "hist", "x", lo=-4.0, hi=12.0, bins=16, qs=(0.5, 0.9)),
]
KEYS = ["g"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long, x double, u long")


def _rows(n, offset=0):
    return [
        (f"g{i % 3}", i + offset, float((i * 7) % 13) - 3.0, (i * 31 + offset) % 50)
        for i in range(n)
    ]


def _collect(state_df):
    return {
        r["g"]: (
            r["n__cnt"], r["s__sum"], r["lo__min"], r["hi__max"],
            tuple(r["d__regs"]), tuple(r["q__hist"]),
        )
        for r in state_df.collect()
    }


def test_merge_equals_full_recompute(spark):
    full = _df(spark, _rows(90))
    parts = [
        full.filter(F.pmod("v", F.lit(3)) == i) for i in range(3)
    ]
    states = [agg_state(p, KEYS, METRICS, p=4) for p in parts]
    merged = merge_states(states, KEYS, METRICS, p=4)
    want = agg_state(full, KEYS, METRICS, p=4)
    assert _collect(merged) == _collect(want)


def test_merge_associative_and_commutative(spark):
    parts = [_df(spark, _rows(30, off)) for off in (0, 100, 200)]
    s = [agg_state(p, KEYS, METRICS, p=4) for p in parts]
    left = merge_states([merge_states([s[0], s[1]], KEYS, METRICS, 4), s[2]],
                        KEYS, METRICS, 4)
    right = merge_states([s[2], merge_states([s[1], s[0]], KEYS, METRICS, 4)],
                         KEYS, METRICS, 4)
    assert _collect(left) == _collect(right)


def test_new_group_appears_only_in_one_batch(spark):
    a = _df(spark, [("old", 1, 1.0, 1)])
    b = _df(spark, [("old", 2, -5.0, 2), ("new", 3, 9.0, 3)])
    m = merge_states(
        [agg_state(a, KEYS, METRICS, 4), agg_state(b, KEYS, METRICS, 4)],
        KEYS, METRICS, 4,
    )
    got = _collect(m)
    assert got["old"][0] == 2 and got["old"][1] == 3
    assert got["old"][2] == -5.0 and got["old"][3] == 1.0
    assert got["new"][0] == 1
    # equals full recompute
    want = _collect(agg_state(a.unionByName(b), KEYS, METRICS, 4))
    assert got == want


def test_hist_quantile_estimator_bound(spark):
    """Merged-histogram quantile estimates obey the one-sided bound:
    true quantile <= estimate < true + bin width (in-range data)."""
    import math

    rows = [(f"g{i % 2}", i, float((i * 7) % 13) - 3.0, i) for i in range(400)]
    df = _df(spark, rows)
    parts = [df.filter(F.pmod("v", F.lit(2)) == i) for i in range(2)]
    merged = merge_states(
        [agg_state(p, KEYS, METRICS, p=4) for p in parts], KEYS, METRICS, 4
    )
    fin = {r["g"]: r for r in finalize_state(merged, KEYS, METRICS, p=4).collect()}
    width = (12.0 - (-4.0)) / 16
    for g in ("g0", "g1"):
        xs = sorted(r[2] for r in rows if r[0] == g)
        assert fin[g]["q_n"] == len(xs)
        for q, col in ((0.5, "q_p50"), (0.9, "q_p90")):
            true = xs[math.ceil(q * len(xs)) - 1]
            assert true <= fin[g][col] < true + width + 1e-9


def test_metric_hist_validation():
    with pytest.raises(ValueError, match="hi > lo"):
        Metric("q", "hist", "x", lo=1.0, hi=1.0)


def test_finalize_columns_and_estimate_sanity(spark):
    # distinct-per-group (~200) >> m (16): the raw harmonic estimator's
    # operative regime (small-range small-n inputs bias high by design —
    # that's hll_corrected's job, not finalize's)
    rows = [(f"g{i % 3}", i, float(i % 7), i * 131 + 7) for i in range(600)]
    df = _df(spark, rows)
    out = finalize_state(agg_state(df, KEYS, METRICS, p=4), KEYS, METRICS, p=4)
    assert out.columns == [
        "g", "n", "s", "lo", "hi", "d_est", "d_present", "q_n", "q_p50", "q_p90",
    ]
    for r in out.collect():
        exact = df.filter(F.col("g") == r.g).select("u").distinct().count()
        assert r.d_present <= 16
        assert abs(r.d_est - exact) / exact < 0.6  # 1.04/sqrt(16) ~ 26% sd


def test_hll_only_metrics(spark):
    ms = [Metric("d", "hll", "u")]
    st = agg_state(_df(spark, _rows(20)), KEYS, ms, p=4)
    assert st.columns == ["g", "d__regs"]


def test_metric_validation():
    with pytest.raises(ValueError, match="unknown metric kind"):
        Metric("x", "avg", "v")
    with pytest.raises(ValueError, match="needs a col"):
        Metric("x", "sum")
    with pytest.raises(ValueError, match="at least one state"):
        merge_states([], KEYS, METRICS)


def test_update_state_roundtrip(spark, tmpdir_path):
    path = f"{tmpdir_path}/state"
    b1, b2 = _df(spark, _rows(40)), _df(spark, _rows(40, 500))
    update_state(spark, path, b1, KEYS, METRICS, p=4)
    refreshed = update_state(spark, path, b2, KEYS, METRICS, p=4)
    want = agg_state(b1.unionByName(b2), KEYS, METRICS, p=4)
    assert _collect(refreshed) == _collect(want)
    # no stale swap dirs left behind
    import os

    assert not os.path.exists(path + "._state_tmp")
    assert not os.path.exists(path + "._state_old")


def test_snapshot_diff_statuses(spark):
    from log_analysis_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame(
        [("a", "h1"), ("b", "h2"), ("c", "h3")], "url string, fp string"
    )
    new = spark.createDataFrame(
        [("a", "h1"), ("b", "hX"), ("d", "h4")], "url string, fp string"
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "unchanged",
        "b": "changed",
        "c": "removed",
        "d": "added",
    }
