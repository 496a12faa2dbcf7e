"""HLL / Count-Min sketches: accuracy bounds, invariants, edge regimes."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.sketches import (
    cms_counts,
    cms_heavy_hitters,
    hll_corrected,
    hll_estimate,
    hll_registers,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.01/events.parquet")


def test_hll_estimate_within_tolerance(events):
    # 750 distinct pairs, m=256 -> sigma ~6.5%; allow 4 sigma for the
    # single fixed hash draw. Also the regression pin for the
    # double-division bug: before the shiftright fix the bias was +48%.
    v = F.concat_ws("|", F.col("user_id"), F.col("event_type"))
    row = hll_estimate(events, v, p=8).collect()[0]
    assert row["exact_distinct"] == 750
    assert abs(row["rel_err"]) < 0.26
    assert row["m"] == 256
    assert row["present_registers"] + row["zero_registers"] == 256


def test_hll_registers_bounded(events):
    v = F.col("user_id").cast("string")
    regs = hll_registers(events, v, p=6).collect()
    assert len(regs) <= 64
    assert all(1 <= r["max_rho"] <= 55 for r in regs)
    # distinct values partition across registers: per-register exact
    # distincts sum to the global exact distinct
    assert sum(r["n_distinct"] for r in regs) == 150


def test_hll_small_range_correction(spark):
    # 20 distinct values into m=256 registers: deep small-range regime
    # where the raw estimator is badly biased and linear counting wins
    df = spark.createDataFrame(pd.DataFrame({"v": [f"val{i}" for i in range(20)]}))
    row = hll_corrected(df, F.col("v"), p=8).collect()[0]
    assert row["small_range"] == 1
    raw_err = abs(row["estimate"] - 20) / 20
    corr_err = abs(row["corrected_estimate"] - 20) / 20
    assert corr_err < 0.25
    assert corr_err <= raw_err


def test_hll_md5_and_xxhash_modes_both_sane(events):
    v = F.concat_ws("|", F.col("user_id"), F.col("event_type"))
    for hf in ("md5", "xxhash64"):
        row = hll_estimate(events, v, p=8, hash_fn=hf).collect()[0]
        assert abs(row["rel_err"]) < 0.3, hf


def test_cms_table_bounded_and_conservative(events):
    item = F.col("user_id").cast("string")
    table = cms_counts(events, item, d=4, w=512).collect()
    assert len(table) <= 4 * 512
    # each of the d rows sums to the total row count (every item hits
    # exactly one cell per row)
    sums = {}
    for r in table:
        sums[r["j"]] = sums.get(r["j"], 0) + r["cnt"]
    assert set(sums) == {0, 1, 2, 3}
    assert all(s == 10000 for s in sums.values())

    hh = cms_heavy_hitters(events, item, k=10, d=4, w=512).collect()
    assert len(hh) == 10
    # Count-Min never underestimates
    assert all(r["overestimate"] >= 0 for r in hh)


def test_cms_planted_heavy_hitter(spark):
    # one item with 500 occurrences among 100 singletons: it must rank
    # first and, at w=512 with 101 distinct items, estimate exactly
    items = ["whale"] * 500 + [f"m{i}" for i in range(100)]
    df = spark.createDataFrame(pd.DataFrame({"i": items}))
    hh = cms_heavy_hitters(df, F.col("i"), k=3).collect()
    assert hh[0]["item"] == "whale"
    assert hh[0]["exact"] == 500
    assert hh[0]["est"] >= 500


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_bounded(spark):
    from log_analysis_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
        bloom_words_array,
    )

    m_bits, k = 1 << 10, 4
    members = spark.range(0, 300).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("v")
    )
    words_df = bloom_build(members, F.col("v"), m_bits, k)
    # state bound: at most m/32 words regardless of input size
    assert words_df.count() <= m_bits // 32
    words = bloom_words_array(words_df, m_bits)
    assert len(words) == m_bits // 32

    # every member MUST probe true (no false negatives, the core contract)
    hits = members.select(
        bloom_maybe_contains(F.col("v"), words, m_bits, k).alias("maybe")
    )
    assert hits.filter(~F.col("maybe")).count() == 0

    # non-members mostly probe false; at this load some false positives
    # are expected but the filter must reject the bulk
    non = spark.range(0, 300).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("v")
    )
    fp = non.select(
        bloom_maybe_contains(F.col("v"), words, m_bits, k).alias("maybe")
    ).filter(F.col("maybe")).count()
    assert fp < 150  # theoretical FPR ~0.44 at this deliberate overload


def test_bloom_probe_is_shuffle_free(spark):
    from log_analysis_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
        bloom_words_array,
    )

    m_bits, k = 1 << 10, 4
    members = spark.range(0, 50).select(F.col("id").cast("string").alias("v"))
    words = bloom_words_array(bloom_build(members, F.col("v"), m_bits, k), m_bits)
    probe = spark.range(0, 50).select(F.col("id").cast("string").alias("v"))
    plan = (
        probe.select(bloom_maybe_contains(F.col("v"), words, m_bits, k))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_bloom_rejects_bad_params(spark):
    from log_analysis_spark.operators.sketches import (
        bloom_positions,
        bloom_words_array,
    )

    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), m_bits=1000, k=4)  # not a power of two
    with pytest.raises(ValueError):
        bloom_words_array(None, m_bits=1 << 40)  # literal-array guard


# ---------------------------------------------------------------------------
# Binned quantiles
# ---------------------------------------------------------------------------

def test_binned_quantiles_error_bound(events):
    from log_analysis_spark.operators.sketches import binned_quantiles

    lo, hi, n_bins = 0.0, 512.0, 128
    width = (hi - lo) / n_bins
    est = {
        r["event_type"]: r
        for r in binned_quantiles(
            events, F.col("value"), ["event_type"], (0.5, 0.9), lo, hi, n_bins
        ).collect()
    }
    exact = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    for et, r in est.items():
        # upper-edge estimator: exact <= est < exact + width (in-range data)
        assert exact[et]["p50"] <= r["p50_est"] <= exact[et]["p50"] + width
        assert exact[et]["p90"] <= r["p90_est"] <= exact[et]["p90"] + width


def test_binned_quantiles_histogram_merges(events, spark):
    """Per-half histograms sum to the whole-corpus histogram (cell-wise
    addition is the merge operator, like HLL max / CMS sum)."""
    from log_analysis_spark.operators.sketches import histogram_bins

    def hist(df):
        return {
            (r["event_type"], r["b"]): r["c"]
            for r in df.select(
                "event_type", histogram_bins(F.col("value"), 0.0, 512.0, 128).alias("b")
            )
            .groupBy("event_type", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    full = hist(events)
    h1 = hist(events.filter(F.col("event_id") % 2 == 0))
    h2 = hist(events.filter(F.col("event_id") % 2 == 1))
    merged = dict(h1)
    for k, v in h2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_binned_quantiles_clamps_out_of_range(spark):
    from log_analysis_spark.operators.sketches import binned_quantiles

    df = spark.createDataFrame(
        [("g", -50.0), ("g", 0.5), ("g", 1.5), ("g", 999.0)],
        "g string, v double",
    )
    r = binned_quantiles(df, F.col("v"), ["g"], (0.5,), 0.0, 2.0, 4).collect()[0]
    assert r["n"] == 4
    # p50 rank=2 -> cumulative reaches 2 in bin 1 (values -50->bin0, .5->bin1)
    assert r["p50_est"] == 1.0
