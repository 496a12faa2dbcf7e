"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every left row, attach the value columns of the LATEST right row with
``right.ts <= left.ts`` for the same key (the standard instrument-price /
state-at-event-time join). The reference has no joins beyond a broadcast
lookup (SURVEY.md §2 "deliberately absent"); this supplies the classic
temporal one.

Implementation is the scalable single-shuffle form — NOT a range join:
tag both inputs, union, hash-partition by key, sort by (ts, side) within
the key, and carry right values forward with ``last(..., ignorenulls)``
over an unbounded-preceding window. Cost is one exchange + one
sort-per-key regardless of how many right rows precede each left row; a
naive ``ON l.key = r.key AND r.ts <= l.ts`` join would expand to the full
per-key cross product before aggregation. Right rows sort BEFORE left rows
at equal ts, giving inclusive (<=) semantics.

Verified against DuckDB's independent native ASOF JOIN implementation in
the driver gate (__spark_entry__.oracle_sql) and against
pandas.merge_asof in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def range_join_points(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 3600,
) -> DataFrame:
    """Point-in-interval join: pairs every left row with each right interval
    ``[start, end)`` containing its ``ts_col``, per key.

    The naive formulation ``ON key AND start <= ts AND ts < end`` gives
    Catalyst only inequality conjuncts beyond the key — per-key cross
    product. Here intervals are EXPLODED over fixed-width buckets and
    points land in exactly one bucket, so the join is a pure equi-join on
    (key, bucket) followed by the exact containment filter. A point lies in
    one bucket and an interval covers each of its buckets once, so no
    dedup pass is needed. Shuffle volume is |left| + |right| x
    ceil(interval/bucket_width) rows — choose ``bucket_width`` near the
    typical interval length so the expansion factor stays ~1-2.
    """
    # Rename every right-side column up front: when left and right descend
    # from the same parent DataFrame (self-join), `lb[c] == rb[c]` hits
    # Spark's dataset-id disambiguation heuristic ("trivially true equals
    # predicate" warning). Distinct names make the equi-join unambiguous by
    # construction.
    lb = left.withColumn("_bk", F.floor(F.col(ts_col) / bucket_width).cast("long"))
    rb = right.select([F.col(c).alias(f"_r_{c}") for c in right.columns]).withColumn(
        "_r_bk",
        F.explode(
            F.sequence(
                F.floor(F.col(f"_r_{start_col}") / bucket_width).cast("long"),
                F.floor((F.col(f"_r_{end_col}") - 1) / bucket_width).cast("long"),
            )
        ),
    )
    cond = [F.col(c) == F.col(f"_r_{c}") for c in on] + [
        F.col("_bk") == F.col("_r_bk"),
        F.col(f"_r_{start_col}") <= F.col(ts_col),
        F.col(ts_col) < F.col(f"_r_{end_col}"),
    ]
    right_payload = [c for c in right.columns if c not in on]
    return lb.join(rb, cond).select(
        *left.columns, *[F.col(f"_r_{c}").alias(c) for c in right_payload]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: all left columns + ``value_cols`` from the latest
    right row at-or-before the left row's ``ts_col`` per ``on`` key
    (NULL when no right row precedes).

    ``right`` must be unique per (on, ts) — pre-aggregate if it isn't
    (duplicate right timestamps make "the" as-of row ambiguous in any
    engine).

    All value columns ride in ONE struct through ``last(ignorenulls)``: the
    struct is non-NULL for every right row even when its members are NULL,
    so the latest preceding right row wins atomically and its (possibly
    NULL) values attach as-is. Per-column ignorenulls would instead
    forward-fill a NULL member from an EARLIER right row — and with several
    value columns could even mix values from different right rows —
    diverging from ASOF JOIN semantics.
    """
    left_payload = [c for c in left.columns if c not in (*on, ts_col)]
    rstruct_t = (
        right.select(F.struct(*[F.col(v) for v in value_cols]).alias("_rv"))
        .schema["_rv"].dataType
    )
    l = left.select(
        *on,
        ts_col,
        *left_payload,
        F.lit(None).cast(rstruct_t).alias("_rv"),
        F.lit(1).alias("_side"),
    )
    r = right.select(
        *on,
        ts_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(v) for v in value_cols]).alias("_rv"),
        F.lit(0).alias("_side"),
    )
    combined = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        *on,
        ts_col,
        *left_payload,
        "_side",
        F.last(F.col("_rv"), ignorenulls=True).over(w).alias("_rv"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *on,
            ts_col,
            *left_payload,
            *[F.col("_rv").getField(v).alias(v) for v in value_cols],
        )
    )
