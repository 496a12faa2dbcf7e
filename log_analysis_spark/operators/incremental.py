"""Incremental view maintenance: mergeable grouped-aggregate state.

The pipeline's manifest resume (plans/job.py) makes *ingest* incremental —
each day partition processes once — but a GLOBAL rollup (per-host totals,
distinct users over all history) would still rescan every processed
partition on every refresh. At 10^12 rows that rescan IS the job. The
classic fix (Jesus et al., "Scalable Eventually Consistent Counters";
every streaming-warehouse "partial aggregate state" design) is to keep the
rollup as a *mergeable state table*: per group, the commutative-monoid
summaries of everything seen so far. A new batch folds in by merging
states — cost proportional to the BATCH, never to history.

Supported metric kinds and their merge monoids:
- ``count``            -> long,  merge = sum
- ``sum``              -> input type, merge = sum (use integer/decimal
  columns for bit-replayability; float sums are order-sensitive)
- ``min`` / ``max``    -> input type, merge = min/max
- ``hll``              -> array<long> of m = 2^p register maxima,
  merge = element-wise max (approximate distinct; the SAME register
  recipe as operators/sketches.py, so merged state over k batches is
  EXACTLY the state of the concatenated input — max is associative —
  and the estimate replays in DuckDB bit-for-bit)
- ``hist``             -> array<long> of fixed-bin counts (clamped end
  bins, sketches.histogram_bins), merge = element-wise sum; finalize
  emits binned_quantiles' upper-edge quantile estimates (one-sided
  error < bin width), replayable bit-for-bit

State layout: one row per group; metric columns named ``<name>__cnt``,
``<name>__sum``, ``<name>__min``, ``<name>__max``, ``<name>__regs``,
``<name>__hist``.
State is an ordinary DataFrame — persist it as parquet keyed by the
group columns; a 10^12-row corpus with 10^6 groups keeps state at 10^6
rows regardless of history length.

Scale design: ``agg_state`` is one keyed shuffle over the batch (HLL
registers get a map-side partial max per (group, register) first);
``merge_states`` shuffles only state rows (tiny); ``finalize_state`` is a
pure projection. Nothing rescans history, nothing collects to the driver.

The HLL estimate fold is SLOT-ORDERED over all m register slots (absent
slots hold rho=0 and contribute 2^0 = 1 inline), which pins the floating
addition order for the cross-engine replay — same contract as
sketches.hll_estimate, different but equally deterministic order.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketches import HASH_BITS, _h60, hll_alpha


@dataclass(frozen=True)
class Metric:
    name: str
    kind: str  # count | sum | min | max | hll | hist
    col: str | None = None  # source column (None for count)
    # hist-only knobs (sketches.histogram_bins semantics: clamped end
    # bins; dyadic (hi-lo)/bins keeps the width literal exact)
    lo: float = 0.0
    hi: float = 1.0
    bins: int = 128
    qs: tuple = (0.5, 0.9)

    def __post_init__(self):
        if self.kind not in ("count", "sum", "min", "max", "hll", "hist"):
            raise ValueError(f"unknown metric kind {self.kind!r}")
        if self.kind != "count" and not self.col:
            raise ValueError(f"metric {self.name!r}: kind {self.kind} needs a col")
        if self.kind == "hist" and not self.hi > self.lo:
            raise ValueError(f"metric {self.name!r}: hist needs hi > lo")


def _state_col(m: Metric) -> str:
    suffix = {
        "count": "cnt", "sum": "sum", "min": "min", "max": "max",
        "hll": "regs", "hist": "hist",
    }
    return f"{m.name}__{suffix[m.kind]}"


def _dense_long_array(rows: DataFrame, keys: list[str], idx: str, val: str,
                      length: int, out_name: str) -> DataFrame:
    """(keys, idx, val) -> (keys, array<long>[length]) with zeros for
    absent indices — the fixed-slot layout both hll and hist states use
    (slot order pins every downstream fold)."""
    return (
        rows.groupBy(*keys)
        .agg(F.map_from_entries(F.collect_list(F.struct(idx, val))).alias("_map"))
        .select(
            *keys,
            F.transform(
                F.sequence(F.lit(0), F.lit(length - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_map"), i.cast("long")), F.lit(0)
                ).cast("long"),
            ).alias(out_name),
        )
    )


def agg_state(
    df: DataFrame,
    keys: list[str],
    metrics: list[Metric],
    p: int = 6,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Aggregate one batch into mergeable state (one row per group)."""
    m_regs = 1 << p
    width = HASH_BITS - p

    plain_aggs: list[Column] = []
    for m in metrics:
        c = _state_col(m)
        if m.kind == "count":
            plain_aggs.append(F.count(F.lit(1)).alias(c))
        elif m.kind == "sum":
            plain_aggs.append(F.sum(m.col).alias(c))
        elif m.kind == "min":
            plain_aggs.append(F.min(m.col).alias(c))
        elif m.kind == "max":
            plain_aggs.append(F.max(m.col).alias(c))
    drop_after = []
    if not plain_aggs:  # hll-only metric lists still need a base relation
        plain_aggs = [F.count(F.lit(1)).alias("_n_rows_tmp")]
        drop_after = ["_n_rows_tmp"]
    out = df.groupBy(*keys).agg(*plain_aggs)

    for m in metrics:
        if m.kind != "hll":
            continue
        h = _h60(F.col(m.col).cast("string"), hash_fn)
        rows = df.select(
            *keys,
            (h % m_regs).alias("_reg"),
            F.shiftright(h, p).alias("_rest"),
        ).filter(F.col("_reg").isNotNull())
        b = F.conv(F.col("_rest").cast("string"), 10, 2)
        tz = F.length(b) - F.length(
            F.expr("trim(TRAILING '0' FROM conv(cast(_rest as string), 10, 2))")
        )
        rho = (
            F.when(F.col("_rest") == 0, F.lit(width + 1))
            .otherwise(F.lit(1) + tz)
            .cast("long")
        )
        maxes = (
            rows.select(*keys, "_reg", rho.alias("_rho"))
            .groupBy(*keys, "_reg")
            .agg(F.max("_rho").alias("_mr"))
        )
        regs = _dense_long_array(maxes, keys, "_reg", "_mr", m_regs, _state_col(m))
        out = out.join(regs, on=keys, how="left")

    for m in metrics:
        if m.kind != "hist":
            continue
        from .sketches import histogram_bins

        counts = (
            df.filter(F.col(m.col).isNotNull())
            .select(
                *keys,
                histogram_bins(F.col(m.col), m.lo, m.hi, m.bins).alias("_b"),
            )
            .groupBy(*keys, "_b")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        hist = _dense_long_array(counts, keys, "_b", "_c", m.bins, _state_col(m))
        out = out.join(hist, on=keys, how="left")
    return out.drop(*drop_after)


def merge_states(
    states: list[DataFrame],
    keys: list[str],
    metrics: list[Metric],
    p: int = 6,
) -> DataFrame:
    """Merge any number of state tables (batches, days, snapshots) into
    one — per metric kind's monoid. Groups present in only some states
    merge correctly (sums skip NULL, register arrays coalesce to zeros).
    Associative and commutative: any merge tree yields the identical
    state table."""
    m_regs = 1 << p
    if not states:
        raise ValueError("merge_states: need at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s, allowMissingColumns=True)

    def _zeros(n: int) -> Column:
        return F.array_repeat(F.lit(0).cast("long"), n)

    aggs: list[Column] = []
    for m in metrics:
        c = _state_col(m)
        if m.kind in ("count", "sum"):
            aggs.append(F.sum(c).alias(c))
        elif m.kind == "min":
            aggs.append(F.min(c).alias(c))
        elif m.kind == "max":
            aggs.append(F.max(c).alias(c))
        elif m.kind == "hll":
            aggs.append(
                F.aggregate(
                    F.collect_list(c),
                    _zeros(m_regs),
                    lambda acc, r: F.zip_with(acc, r, lambda a, b: F.greatest(a, b)),
                ).alias(c)
            )
        elif m.kind == "hist":
            aggs.append(
                F.aggregate(
                    F.collect_list(c),
                    _zeros(m.bins),
                    lambda acc, r: F.zip_with(acc, r, lambda a, b: a + b),
                ).alias(c)
            )
    return u.groupBy(*keys).agg(*aggs)


def finalize_state(
    state: DataFrame,
    keys: list[str],
    metrics: list[Metric],
    p: int = 6,
) -> DataFrame:
    """Project state to answers: counts/sums/mins/maxes verbatim, HLL
    arrays to (``<name>_est``, ``<name>_present``) via the slot-ordered
    harmonic fold (absent slots contribute 2^0 inline — order pinned for
    the DuckDB replay)."""
    m_regs = 1 << p
    a_mm = hll_alpha(m_regs) * m_regs * m_regs
    cols: list[Column] = [F.col(k) for k in keys]
    for m in metrics:
        c = _state_col(m)
        if m.kind == "hll":
            regs = F.coalesce(F.col(c), F.array_repeat(F.lit(0).cast("long"), m_regs))
            fold = F.aggregate(
                regs, F.lit(0.0), lambda a, v: a + F.pow(F.lit(2.0), -v)
            )
            cols.append((F.lit(a_mm) / fold).alias(f"{m.name}_est"))
            cols.append(
                F.size(F.filter(regs, lambda v: v > 0)).cast("long").alias(f"{m.name}_present")
            )
        elif m.kind == "hist":
            # binned_quantiles' upper-edge estimator over the dense cell
            # array: rank = ceil(q*n); estimate = lo + (first bin whose
            # cumulative count reaches rank + 1) * width. Fold state is a
            # (cum, idx, hit) struct walked in slot order — exact integer
            # work until the single edge multiplication.
            hist = F.coalesce(F.col(c), F.array_repeat(F.lit(0).cast("long"), m.bins))
            n = F.aggregate(hist, F.lit(0).cast("long"), lambda a, v: a + v)
            width = (m.hi - m.lo) / m.bins
            cols.append(n.alias(f"{m.name}_n"))
            for q in m.qs:
                rank = F.ceil(F.lit(q) * n)
                hit = F.aggregate(
                    hist,
                    F.struct(
                        F.lit(0).cast("long").alias("cum"),
                        F.lit(0).cast("int").alias("idx"),
                        F.lit(-1).cast("int").alias("hit"),
                    ),
                    lambda a, v: F.struct(
                        (a["cum"] + v).alias("cum"),
                        (a["idx"] + 1).alias("idx"),
                        F.when(a["hit"] >= 0, a["hit"])
                        .otherwise(
                            F.when((a["cum"] + v) >= rank, a["idx"]).otherwise(
                                F.lit(-1)
                            )
                        )
                        .alias("hit"),
                    ),
                    lambda a: a["hit"],
                )
                est = F.when(
                    n > 0, F.lit(m.lo) + (hit + 1) * F.lit(width)
                )
                cols.append(est.alias(f"{m.name}_p{int(q * 100)}"))
        else:
            cols.append(F.col(c).alias(m.name))
    return state.select(*cols)


def read_state_meta(state_path: str) -> dict | None:
    """The committed ``_meta.json`` riding inside the state directory
    (underscore prefix: invisible to parquet readers), or None."""
    import json
    import os

    f = os.path.join(state_path, "_meta.json")
    if not os.path.exists(f):
        return None
    with open(f) as fh:
        return json.load(fh)


def update_state(
    spark,
    state_path: str,
    batch: DataFrame,
    keys: list[str],
    metrics: list[Metric],
    p: int = 6,
    hash_fn: str = "xxhash64",
    meta: dict | None = None,
) -> DataFrame:
    """Read-merge-write refresh of a persisted state table. Writes to a
    tmp directory then swaps (same torn-write discipline as
    operators/route.py sinks); first call bootstraps from the batch
    alone. Returns the refreshed state (read back from the new path).

    ``meta`` (e.g. a streaming batch id) is written as ``_meta.json``
    INSIDE the tmp directory before the swap, so state content and its
    commit marker become visible in ONE rename — the idempotence anchor
    for the streaming twin's replayed micro-batches."""
    import json
    import os
    import shutil

    new = agg_state(batch, keys, metrics, p, hash_fn)
    if os.path.exists(state_path):
        old = spark.read.parquet(state_path)
        new = merge_states([old, new], keys, metrics, p)
    tmp = state_path.rstrip("/") + "._state_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    new.write.mode("overwrite").parquet(tmp)
    if meta is not None:
        with open(os.path.join(tmp, "_meta.json"), "w") as fh:
            json.dump(meta, fh)
    back = state_path.rstrip("/") + "._state_old"
    shutil.rmtree(back, ignore_errors=True)
    if os.path.exists(state_path):
        os.rename(state_path, back)
    try:
        os.rename(tmp, state_path)
    except OSError:
        if os.path.exists(back):
            os.rename(back, state_path)  # roll back
        raise
    shutil.rmtree(back, ignore_errors=True)
    return spark.read.parquet(state_path)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """(key, status) diff of two crawl snapshots by content fingerprint:
    ``added`` (key only in new), ``removed`` (only in old), ``changed``
    (both, fingerprints differ), ``unchanged``.

    The change-detection step every incremental re-crawl pipeline runs
    before spending downstream compute: only ``added``/``changed`` keys
    re-enter parse -> clean -> dedup; ``removed`` keys feed deletion
    sweeps. Fingerprints are whatever content hash the caller already
    carries (md5 of the raw body, or of ``normalize.clean_text`` output
    for render-noise-insensitive diffs — compose upstream).

    Scale: one full-outer hash join keyed on ``key_col`` — both sides
    shuffle once on the same key. Snapshots stored bucketed/partitioned
    by the key (the ``plans/bucketing.py`` seam) make it a zero-shuffle
    storage-partitioned join. Keys are assumed unique per snapshot
    (canonical-url dedup runs upstream); duplicate keys would cross-pair
    like any join.
    """
    o = old.select(F.col(key_col).alias("_k"), F.col(fp_col).alias("_fo"))
    n = new.select(F.col(key_col).alias("_k"), F.col(fp_col).alias("_fn"))
    j = o.join(n, on="_k", how="full_outer")
    status = (
        F.when(F.col("_fo").isNull(), F.lit("added"))
        .when(F.col("_fn").isNull(), F.lit("removed"))
        .when(F.col("_fo") != F.col("_fn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col("_k").alias(key_col), status.alias("status"))
