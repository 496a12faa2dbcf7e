"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet, sorts columns by
name and rows by value, and demands EXACT equality (we engineer queries to
be bit-identical across engines — see __spark_entry__ docstring).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _arrow_type_key(t) -> str:
    """Collapse only representation-equivalent Arrow types; anything else
    (e.g. DuckDB HUGEINT -> decimal128 vs Spark int64) must mismatch, because
    the driver's value-hash sees the engine-native representation."""
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_type_key(t.value_type)}>"
    return str(t)


def compare_arrow_types(spark_tbl, duck_tbl) -> list[str]:
    problems = []
    sch_s = {f.name: f.type for f in spark_tbl.schema}
    sch_d = {f.name: f.type for f in duck_tbl.schema}
    for c in sorted(set(sch_s) & set(sch_d)):
        ks, kd = _arrow_type_key(sch_s[c]), _arrow_type_key(sch_d[c])
        if ks != kd:
            problems.append(
                f"col {c}: engine-native type differs: spark={sch_s[c]} duck={sch_d[c]} "
                f"(driver value-hash WILL mismatch)"
            )
    return problems


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} duck={list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"col {c}: {int(neq.sum())}/{len(av)} mismatch; "
                    f"first at row {i}: {av[i]!r} vs {bv[i]!r} (diff {abs(av[i]-bv[i]):.3e})"
                )
        else:
            neq = av != bv
            if neq.any():
                i = int(np.argmax(neq))
                problems.append(
                    f"col {c}: {int(neq.sum())}/{len(av)} mismatch; "
                    f"first at row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from log_analysis_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_tbl = sdf.toArrow()
            spark_pdf = spark_tbl.to_pandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_pdf)} rows")
            n_rows_only += 1
            continue
        try:
            duck_tbl = con.execute(oracles[name]).arrow()
            duck_pdf = duck_tbl.to_pandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            n_bad += 1
            continue
        problems = compare_arrow_types(spark_tbl, duck_tbl)
        problems += compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} ({len(spark_pdf)} rows):")
            for p in problems:
                print(f"   {p}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(spark_pdf)} rows exact-match")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_rows_only} rows-only, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
