"""Deterministic cardinality / frequency sketches (HLL, Count-Min).

At 10^12 rows the reference's exact `distinct` overview (reference
`src/zeek/mod.rs` distinct-values pass) becomes the dominant shuffle: an
exact distinct over a high-cardinality key moves the whole key column.
These sketches answer the same questions with bounded state:

- **HyperLogLog** (Flajolet et al. 2007): distinct count in m = 2^p
  registers. The shuffle carries at most m (register, max-rho) pairs per
  partition after map-side partial aggregation — constant, not O(keys).
- **Count-Min** (Cormode & Muthukrishnan 2005): frequency table in d x w
  integer cells; the sketch itself is broadcastable (d*w rows), so
  heavy-hitter probes never shuffle the corpus by item.

Unlike Spark's built-in `approx_count_distinct` (HLL++, whose binary
register encoding another engine cannot replay), these are built from
named column expressions over an explicit base hash, which makes every
intermediate — register index, rho, register maxima, harmonic sum — a
DETERMINISTIC function of the input rows. The DuckDB oracle replays the
estimates bit-for-bit: rho comes from trailing zeros of the hash's binary
string (identical `conv`/`bin` + trim semantics), 2^-rho terms are exact
binary powers in any IEEE pow, and the harmonic sum is a register-ordered
left fold (see the cross-engine recipe in `__spark_entry__`).

The emitted HLL estimate is the RAW harmonic estimator plus a
`small_range` flag. The standard linear-counting correction
(m*ln(m/V) when E <= 2.5m) is applied by ``hll_corrected`` for API
completeness but deliberately kept OUT of the oracle-checked columns:
ln() is not correctly-rounded across libms, so its last ulp may differ
between engines. Flag up, callers apply the correction; the gate query
pins parameters where the raw estimator is the operative branch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _base_hash

HASH_BITS = 60  # md5_hash60 width; xxhash64 values are masked down to this

# alpha_m from Flajolet et al. 2007, Fig. 3
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    if m < 16:
        raise ValueError(f"hll: m={m} too small (p >= 4 required)")
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def _h60(col: Column, hash_fn: str) -> Column:
    """Nonnegative 60-bit base hash (masks xxhash64's sign bit away so
    register/rho arithmetic is identical for both hash modes)."""
    h = _base_hash(col, hash_fn)
    if hash_fn == "xxhash64":
        h = h.bitwiseAND(F.lit((1 << HASH_BITS) - 1))
    return h


def hll_register_rows(
    df: DataFrame,
    value: Column,
    p: int = 6,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(_v, reg, _rho) — the per-row HLL observation. Shared by the batch
    aggregation (`hll_registers`) and the streaming twin
    (`streaming.stream_job.start_hll_stream` — max() is associative, so
    the identical expression maintains registers incrementally)."""
    m = 1 << p
    width = HASH_BITS - p
    rows = df.select(value.alias("_v")).select(
        "_v", _h60(F.col("_v"), hash_fn).alias("_h")
    )
    # shiftright, NOT "/": double division of a 60-bit value rounds away
    # the low bits past the 53-bit mantissa and corrupts the trailing-zero
    # distribution (measured: +50% estimate bias before this fix)
    rows = rows.select(
        "_v",
        (F.col("_h") % m).alias("reg"),
        F.shiftright(F.col("_h"), p).alias("_rest"),
    )
    b = F.conv(F.col("_rest").cast("string"), 10, 2)
    tz = F.length(b) - F.length(F.expr("trim(TRAILING '0' FROM conv(cast(_rest as string), 10, 2))"))
    return rows.select(
        "_v",
        "reg",
        F.when(F.col("_rest") == 0, F.lit(width + 1))
        .otherwise(F.lit(1) + tz)
        .cast("long")
        .alias("_rho"),
    )


def hll_registers(
    df: DataFrame,
    value: Column,
    p: int = 6,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(reg, max_rho, n_distinct) — the HLL register relation plus the
    per-register exact distinct count (register is a function of the
    value, so distinct values partition across registers and the exact
    total rides the same aggregation for free — no second pass).

    Map-side partial max() collapses each partition to <= m rows before
    the one keyed shuffle; reducer state is m longs.
    """
    return hll_register_rows(df, value, p, hash_fn).groupBy("reg").agg(
        F.max("_rho").alias("max_rho"),
        F.count_distinct("_v").alias("n_distinct"),
    )


def hll_estimate(
    df: DataFrame,
    value: Column,
    p: int = 6,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One row: (m, present_registers, zero_registers, harmonic_sum,
    estimate, exact_distinct, rel_err, small_range).

    ``estimate`` is the raw harmonic-mean estimator alpha_m * m^2 / S with
    S = sum over ALL m registers of 2^-M_j (absent registers contribute
    2^0 = 1 — added as one term AFTER the register-ordered fold, so the
    addition order is pinned). ``exact_distinct`` rides along for error
    accounting; drop ``n_distinct`` from `hll_registers` to skip its
    (distinct-value, register) shuffle when only the estimate is needed
    at scale. ``small_range`` flags where the linear-counting correction
    (``hll_corrected``) would apply.
    """
    from pyspark.sql.window import Window

    m = 1 << p
    a_mm = hll_alpha(m) * m * m  # same literal inlined in the SQL oracle
    regs = hll_registers(df, value, p, hash_fn)
    w_all = Window.partitionBy()
    one = (
        regs.withColumn(
            "_fold",
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("reg", F.pow(F.lit(2.0), -F.col("max_rho")).alias("_t"))
                        ).over(w_all)
                    ),
                    lambda s: s["_t"],
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
        )
        .withColumn("_present", F.count(F.lit(1)).over(w_all))
        .withColumn("_exact", F.sum("n_distinct").over(w_all))
        .limit(1)
    )
    est = F.lit(a_mm) / F.col("harmonic_sum")
    return (
        one.select(
            F.lit(m).cast("long").alias("m"),
            F.col("_present").cast("long").alias("present_registers"),
            (F.lit(m) - F.col("_present")).cast("long").alias("zero_registers"),
            (
                F.col("_fold") + (F.lit(m) - F.col("_present")).cast("double")
            ).alias("harmonic_sum"),
            F.col("_exact").cast("long").alias("exact_distinct"),
        )
        .select(
            "m",
            "present_registers",
            "zero_registers",
            "harmonic_sum",
            est.alias("estimate"),
            "exact_distinct",
            (
                (est - F.col("exact_distinct").cast("double"))
                / F.col("exact_distinct").cast("double")
            ).alias("rel_err"),
            (
                (est <= F.lit(2.5) * m) & (F.col("zero_registers") > 0)
            ).cast("int").alias("small_range"),
        )
    )


def hll_corrected(
    df: DataFrame,
    value: Column,
    p: int = 6,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """`hll_estimate` plus the linear-counting small-range correction
    (m * ln(m / V) when small_range and V > 0 — Flajolet et al. 2007
    section 4). Uses ln(), so this variant is NOT part of the bit-replay
    contract (module docstring); accuracy is pinned by pytest instead.
    """
    out = hll_estimate(df, value, p, hash_fn)
    m = 1 << p
    corrected = F.when(
        (F.col("small_range") == 1),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_registers").cast("double")),
    ).otherwise(F.col("estimate"))
    return out.withColumn("corrected_estimate", corrected)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def cms_counts(
    df: DataFrame,
    item: Column,
    d: int = 4,
    w: int = 512,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(j, cell, cnt) — the d x w Count-Min table. At most d*w rows
    regardless of input size (partial sums collapse map-side), so the
    materialized sketch BROADCASTS: downstream frequency probes join
    against it without shuffling the corpus by item.
    """
    rows = df.select(item.alias("_i"))
    exploded = rows.select(
        "_i", F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j")
    )
    cell = _h60(F.concat_ws(":", F.col("j"), F.col("_i")), hash_fn) % w
    return (
        exploded.select("j", cell.alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    item: Column,
    k: int = 10,
    d: int = 4,
    w: int = 512,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Top-k items by Count-Min estimated frequency:
    (item, est, exact, overestimate).

    est = min over the d rows of the item's cell counts — an upper bound
    on the true count (collisions only ever inflate), so
    ``overestimate >= 0`` always; with w >> heavy-hitter count the top-k
    ordering matches the exact one. Candidate items here come from a
    distinct over the corpus (the exact side is computed anyway for the
    audit); a pure at-scale probe joins an EXTERNAL candidate list
    against the broadcast sketch and touches the corpus zero times.
    Integer arithmetic end-to-end — the oracle replays it exactly.
    """
    sketch = F.broadcast(cms_counts(df, item, d, w, hash_fn))
    items = df.select(item.alias("_i")).groupBy("_i").agg(
        F.count(F.lit(1)).alias("exact")
    )
    probes = items.select(
        "_i",
        "exact",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    )
    probes = probes.select(
        "_i", "exact", "j",
        (_h60(F.concat_ws(":", F.col("j"), F.col("_i")), hash_fn) % w).alias("cell"),
    )
    est = (
        probes.join(sketch, ["j", "cell"])
        .groupBy("_i", "exact")
        .agg(F.min("cnt").alias("est"))
    )
    return (
        est.select(
            F.col("_i").alias("item"),
            F.col("est").cast("long").alias("est"),
            F.col("exact").cast("long").alias("exact"),
            (F.col("est") - F.col("exact")).cast("long").alias("overestimate"),
        )
        .orderBy(F.desc("est"), F.asc("item"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def bloom_positions(value: Column, m_bits: int, k: int, hash_fn: str = "xxhash64") -> Column:
    """array<long> of the k bit positions for ``value`` (Bloom 1970).

    Double hashing (Kirsch & Mitzenmacher 2006): pos_i = (h1 + i*h2) mod m
    with h2 forced odd so it is coprime with the power-of-two m. Both
    hashes are reduced mod m BEFORE the multiply, so every intermediate
    fits int64 exactly — the positions are a deterministic integer
    function of the value that DuckDB replays verbatim (unlike Spark's
    built-in BloomFilterAggregate, whose byte layout is opaque).
    """
    if m_bits & (m_bits - 1):
        raise ValueError(f"bloom: m_bits={m_bits} must be a power of two")
    h1 = _h60(value, hash_fn) % m_bits
    h2 = (_h60(F.concat(value, F.lit("\x01bloom")), hash_fn) % m_bits).bitwiseOR(
        F.lit(1)
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (h1 + i.cast("long") * h2) % m_bits,
    )


def bloom_build(
    df: DataFrame,
    value: Column,
    m_bits: int = 1 << 16,
    k: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(word_idx, word) — the filter's set bits packed 32 per word.

    32 bits per (64-bit) word, NOT 64: a mask for bit 63 overflows
    engines that check `1 << 63` (DuckDB raises; Java wraps to the sign
    bit) — keeping masks <= 2^31 makes shift/or/get semantics identical
    everywhere. The aggregation state is bounded at m_bits/32 rows
    however large the input: partial bit_or collapses each partition's
    contribution map-side, exactly like the HLL register relation above.
    The whole relation is broadcastable (m=2^27 -> 32 MB), which is what
    makes the ingest-gate prefilter in ``dedup.dedup_against``
    shuffle-free on the probe side.
    """
    pos = df.select(F.explode(bloom_positions(value, m_bits, k, hash_fn)).alias("p"))
    return (
        pos.select(
            F.shiftright(F.col("p"), 5).alias("word_idx"),
            F.expr("shiftleft(1L, cast(p & 31 as int))").alias("_m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_m").alias("word"))
    )


def bloom_words_array(words_df: DataFrame, m_bits: int) -> list:
    """Dense m_bits/32 long list from the (word_idx, word) relation — a
    BOUNDED driver collect (like the IVF seed collect): 2^20 bits = 32 K
    longs. Guarded so an oversized filter is an explicit error, not an
    accidental driver OOM; past the guard, ship the relation itself and
    broadcast-join on word_idx instead."""
    n_words = m_bits >> 5
    if n_words > (1 << 22):
        raise ValueError(
            f"bloom: m_bits={m_bits} too large for a literal array "
            "(collect bounded at 2^21 words); broadcast-join the words "
            "relation on word_idx instead"
        )
    dense = [0] * n_words
    for r in words_df.collect():
        dense[r["word_idx"]] = r["word"]
    return dense


def bloom_maybe_contains(
    value: Column,
    words: list,
    m_bits: int,
    k: int,
    hash_fn: str = "xxhash64",
) -> Column:
    """Boolean membership probe: true iff ALL k bits are set (no false
    negatives; false-positive rate ~ (1 - e^(-k*n/m))^k). The words list
    rides the plan as ONE array literal, so the probe is a pure map-side
    projection — zero joins, zero shuffle, full codegen."""
    lit_words = F.lit(words).cast("array<long>")
    return F.forall(
        bloom_positions(value, m_bits, k, hash_fn),
        lambda p: F.bit_get(
            F.element_at(lit_words, (F.shiftright(p, 5) + 1).cast("int")),
            (p % 32).cast("int"),
        )
        == 1,
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram quantiles
# ---------------------------------------------------------------------------

def histogram_bins(
    value: Column, lo: float, hi: float, n_bins: int
) -> Column:
    """Bin index in [0, n_bins): floor((v - lo) * n_bins / (hi - lo)),
    clamped — out-of-range values land in the end bins (they perturb the
    tails by at most their own mass, never crash the sketch). The
    multiply-BEFORE-divide order is part of the cross-engine contract."""
    raw = F.floor((value - F.lit(lo)) * n_bins / F.lit(hi - lo))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)).cast("long")


def binned_quantiles(
    df: DataFrame,
    value: Column,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 128,
) -> DataFrame:
    """Per-group quantile ESTIMATES from a fixed-bin histogram — the
    quantile member of the bounded-state sketch family (HLL cardinality /
    CMS frequency / Bloom membership). Exact `percentile()` over 10^12
    rows shuffles every value; this shuffles <= n_bins counts per group
    (map-side partials collapse first), the same constant-state shape as
    the other sketches, and per-day histograms MERGE by cell addition.

    Estimate = the UPPER edge of the smallest bin whose cumulative count
    reaches ceil(q * n): true quantile <= estimate < true + (hi-lo)/n_bins
    for in-range data — a one-sided error bound like Count-Min's. Every
    step (bin index, cumulative sums, rank, edge arithmetic) is exact
    integer or single-rounded double work, so the DuckDB oracle replays
    the estimates bit-for-bit. The cumulative window runs over the
    <= groups x n_bins relation — bounded by construction, never the
    corpus (same justification as the register/cell relations above).
    """
    from pyspark.sql.window import Window

    width = (hi - lo) / n_bins
    b = (
        df.select(*group_cols, histogram_bins(value, lo, hi, n_bins).alias("_bin"))
        .groupBy(*group_cols, "_bin")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w_cum = Window.partitionBy(*group_cols).orderBy("_bin")
    w_all = Window.partitionBy(*group_cols)
    cum = b.withColumn("_cm", F.sum("_c").over(w_cum)).withColumn(
        "_n", F.sum("_c").over(w_all)
    )
    aggs = []
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("_n"))
        hit_bin = F.min(F.when(F.col("_cm") >= rank, F.col("_bin")))
        est = F.lit(lo) + (hit_bin + 1) * F.lit(width)
        aggs.append(est.alias(f"p{int(q * 100)}_est"))
    out = cum.groupBy(*group_cols).agg(
        F.max("_n").alias("n"), *aggs
    )
    return out.orderBy(*group_cols)
