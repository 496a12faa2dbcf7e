"""Pandas-side golden-answer computation from the shared synth spec.

Computes expected pipeline outputs directly from gen_pages_local — NOT via a
second Spark job (FIXTURES.md §5) — so Spark results are checked against an
independent implementation of the same spec.
"""

from __future__ import annotations

import re

import pandas as pd

from log_analysis_spark.functions.parse import EVENT_RE
from log_analysis_spark.schemas import RECORD_TYPES
from log_analysis_spark.synth import gen_pages_local

STATUS_RE = re.compile(r'<meta name="status" content="(\d+)"/>')


def golden_pages(n: int) -> pd.DataFrame:
    return gen_pages_local(n)


def golden_conn_events(pages: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, r in pages.iterrows():
        for m in EVENT_RE.finditer(r["text"]):
            rows.append(
                {
                    "url": r["url"],
                    "record_type": m.group("record_type"),
                    "id_orig_h": m.group("src"),
                    "id_resp_h": m.group("dst"),
                    "bytes": int(m.group("bytes")),
                    "ts_hour": r["warc_ts"].floor("h"),
                    "lang": r["lang"],
                }
            )
    return pd.DataFrame(rows)


def golden_routed_counts(pages: pd.DataFrame) -> dict[str, int]:
    ev = golden_conn_events(pages)
    counts = ev[ev.record_type.isin(RECORD_TYPES)].record_type.value_counts()
    return {t: int(counts.get(t, 0)) for t in RECORD_TYPES}


def host_of(url: str) -> str:
    return url.split("//", 1)[1].split("/", 1)[0]


def golden_events_per_host_hour(pages: pd.DataFrame) -> pd.DataFrame:
    df = pages.assign(
        host=pages.url.map(host_of), hour=pages.warc_ts.dt.floor("h")
    )
    return (
        df.groupby(["host", "hour"]).size().reset_index(name="n_events")
    )


def golden_topk(pages: pd.DataFrame, k: int = 10) -> list[tuple[str, int]]:
    df = pages.assign(host=pages.url.map(host_of))
    counts = df.groupby("host").size().reset_index(name="n")
    counts = counts.sort_values(["n", "host"], ascending=[False, True]).head(k)
    return list(zip(counts.host, counts.n))
