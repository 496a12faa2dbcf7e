"""Rendezvous (HRW) shard routing: determinism, balance, and the
minimal-disruption reshard property that motivates it over mod-N."""

import pytest

from pyspark.sql import functions as F

from log_analysis_spark.operators.route import rendezvous_route, rendezvous_shard

SHARDS5 = ["shard-a", "shard-b", "shard-c", "shard-d", "shard-e"]


def _keys_df(spark, n=2000):
    return spark.range(n).select(F.col("id").cast("long").alias("key"))


def _assign(spark, shards, n=2000):
    rows = rendezvous_route(_keys_df(spark, n), "key", shards).collect()
    return {r["key"]: r["shard"] for r in rows}


def test_assignment_deterministic_and_total(spark):
    a1 = _assign(spark, SHARDS5)
    a2 = _assign(spark, SHARDS5)
    assert a1 == a2
    assert set(a1.values()) <= set(SHARDS5)
    assert len(a1) == 2000


def test_reshard_moves_only_to_new_shard(spark):
    """Adding shard-f changes a key's assignment ONLY to shard-f — no key
    ever moves between two pre-existing shards (the HRW argmax over the old
    shards is unchanged by a new candidate unless the new one wins)."""
    before = _assign(spark, SHARDS5)
    after = _assign(spark, SHARDS5 + ["shard-f"])
    moved = {k for k in before if before[k] != after[k]}
    assert moved, "a 6th shard should win some keys"
    assert all(after[k] == "shard-f" for k in moved)
    # and the stolen fraction is ~1/6, nowhere near mod-N's ~5/6 churn
    assert 0.05 < len(moved) / len(before) < 0.30


def test_removal_reassigns_only_lost_keys(spark):
    """Dropping a shard re-routes exactly its keys; everyone else stays."""
    full = _assign(spark, SHARDS5)
    drop = "shard-c"
    without = _assign(spark, [s for s in SHARDS5 if s != drop])
    for k, s in full.items():
        if s == drop:
            assert without[k] != drop
        else:
            assert without[k] == s


def test_rough_balance(spark):
    """60-bit hashes spread keys near-uniformly across shards."""
    a = _assign(spark, SHARDS5, n=5000)
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == set(SHARDS5)
    for c in counts.values():
        assert 700 <= c <= 1300  # 1000 expected


def test_single_shard_and_empty(spark):
    one = _assign(spark, ["only"])
    assert set(one.values()) == {"only"}
    with pytest.raises(ValueError):
        rendezvous_shard(F.col("key"), [])


def test_projection_no_shuffle(spark):
    """Routing is map-side: no Exchange in the physical plan."""
    df = rendezvous_route(_keys_df(spark, 100), "key", SHARDS5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
