"""Redirect-chain resolution: pointer jumping semantics."""

from __future__ import annotations

import pytest

from log_analysis_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "url string, redirect_to string")
    return {r.url: r for r in resolve_redirects(df, **kw).collect()}


def test_chain_exact_hops(spark):
    # 5-long chain crosses a doubling boundary (1 -> 2 -> 4 -> 5 hops):
    # hop counts must be exact, not powers of two
    edges = [(f"u{i}", f"u{i+1}") for i in range(5)]
    out = _resolve(spark, edges)
    for i in range(5):
        r = out[f"u{i}"]
        assert (r.final_url, r.n_hops, r.unresolved) == ("u5", 5 - i, False)


def test_cycle_unresolved(spark):
    out = _resolve(spark, [("p", "q"), ("q", "p"), ("a", "p")])
    assert all(r.unresolved and r.final_url is None and r.n_hops is None
               for r in out.values())


def test_hop_cap(spark):
    edges = [(f"u{i}", f"u{i+1}") for i in range(7)]
    out = _resolve(spark, edges, max_hops=6)
    assert out["u0"].unresolved  # 7 hops > cap, even though terminal
    assert (out["u1"].final_url, out["u1"].n_hops) == ("u7", 6)


def test_duplicate_src_min_dst(spark):
    out = _resolve(spark, [("a", "z"), ("a", "b"), ("b", "c")])
    assert (out["a"].final_url, out["a"].n_hops) == ("c", 2)  # min('b','z')


def test_self_loop(spark):
    out = _resolve(spark, [("s", "s"), ("a", "s")])
    assert out["s"].unresolved and out["a"].unresolved
