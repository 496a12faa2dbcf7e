"""Deterministic synthetic Common-Crawl-style pages corpus.

Replaces the reference's encrypted, unavailable fixture tarball
(/root/reference/decrypt.sh:2-3, .MISSING_LARGE_BLOBS) with a generator whose
every cell is a pure function of the row id — so expected sink rows, routed
sets, and aggregate counts are computable by construction (FIXTURES.md §5),
independent of partitioning, ordering, or cluster size.

The same vectorized numpy kernel (``gen_batch``) backs both the distributed
generator (``mapInPandas`` over ``spark.range``) and the local golden-answer
computation in tests — one spec, two consumers (SURVEY.md §7 "hard parts").

Corpus properties baked in:
- hosts drawn zipf-style: two hot domains take ~40% of rows (skew/salting
  exercise), cold tail across >=6 TLDs present in the TLD dim;
- warc_ts spread over 3 days x 24 hours (mirrors the reference's date-dir +
  hour-bucket layout, /root/reference/src/zeek/zeek_log.rs:374-383);
- a designated membership host appears ONLY on day 1 (mirrors the golden
  membership test /root/reference/tests/zeek_search.rs:190-216);
- text embeds grok-matchable Zeek-style event lines (types from the
  RECORD_TYPES whitelist plus an unknown 'bogus' that must be dropped);
- html embeds the exact text payload between sentinel markers so extraction
  byte-identity is testable;
- ~2.4% exact-duplicate rows and ~2.3% near-duplicate rows (content derived
  from the previous id) to exercise the dedup operators;
- 3 anchor links per page AFTER the text markers (same zipf-ish host
  distribution from independent hash streams), feeding the link-graph
  operators (operators/graph.py) without touching extracted-text bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .schemas import PAGES_SCHEMA

# --- deterministic hashing (splitmix64) ------------------------------------
_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _U64(0xFFFFFFFFFFFFFFFF)
        x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)) & _U64(0xFFFFFFFFFFFFFFFF)
        return x ^ (x >> _U64(31))


def _h(ids: np.ndarray, salt: int) -> np.ndarray:
    """64-bit hash stream ``salt`` of each id."""
    return _splitmix64(ids.astype(_U64) ^ _U64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))


# --- corpus spec ------------------------------------------------------------
BASE_EPOCH = 1719878400  # 2024-07-02T00:00:00Z
N_DAYS = 3
MEMBERSHIP_HOST = "onlyday1.example.net"

HOT_HOSTS = ["hot-cdn.example.com", "big-portal.example.org"]
COLD_TLDS = ["com", "org", "net", "de", "fr", "io", "edu", "cn"]
N_COLD_HOSTS = 96

LANGS = ["en", "de", "fr", "es", "zh", "unknown"]
# word pools give the lang-id heuristic real signal
_LANG_WORDS = {
    "en": "the and of to in that it is was for on are with as they at this have from one had word".split(),
    "de": "der die und in den von zu das mit sich des auf ist im dem nicht ein eine als auch es".split(),
    "fr": "le la et les des en un du une que dans qui pour sur se pas plus par avec tout".split(),
    "es": "el la de que y en un ser se no haber por con su para como estar tener le lo".split(),
    "zh": "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他".split(),
    "unknown": "zxqv blorp frtzk qwpmx vlkrr ngzzt plwqo xkcdy rrqzp mlvnt".split(),
}
EVENT_TYPES = ["conn", "dns", "http", "ssl", "weird", "bogus"]  # bogus -> dropped by router
STATUS_CODES = [200, 200, 200, 301, 404, 500]

EXACT_DUP_MOD = 41   # id % 41 == 40 -> exact duplicate of id-1's content
NEAR_DUP_MOD = 43    # id % 43 == 42 -> near duplicate of id-1's content


def _cold_host(k: np.ndarray) -> list[str]:
    tld = [COLD_TLDS[int(x)] for x in k % len(COLD_TLDS)]
    return [f"site{int(x):03d}.example.{t}" for x, t in zip(k % N_COLD_HOSTS, tld)]


def _ip(h: np.ndarray) -> list[str]:
    return [
        f"10.{int(x >> 16) & 255}.{int(x >> 8) & 255}.{int(x) & 255}" for x in h
    ]


def gen_batch(ids: np.ndarray) -> pd.DataFrame:
    """Generate the pages rows for the given ids. Pure, vectorized."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    uids = ids.astype(_U64)

    # --- timestamp: 3 days x 24 hours, spread by hash; membership host day 1
    is_member = (ids % 1000) == 7
    sec_in_3d = (_h(uids, 1) % _U64(N_DAYS * 86400)).astype(np.int64)
    sec_day1 = (_h(uids, 2) % _U64(86400)).astype(np.int64)
    secs = np.where(is_member, sec_day1, sec_in_3d)
    ts = pd.to_datetime(BASE_EPOCH + secs, unit="s", utc=True).tz_localize(None)

    # --- host: zipf-ish (2 hot hosts ~40%), membership host pinned
    hsel = (_h(uids, 3) % _U64(100)).astype(np.int64)
    cold = _cold_host((_h(uids, 4) % _U64(10_000)).astype(np.int64))
    host = np.where(
        is_member,
        MEMBERSHIP_HOST,
        np.where(hsel < 25, HOT_HOSTS[0], np.where(hsel < 40, HOT_HOSTS[1], cold)),
    )

    # --- url (unique per id; section gives path structure)
    section = (_h(uids, 5) % _U64(20)).astype(np.int64)
    url = [
        f"https://{h}/s{int(s):02d}/page-{int(i)}.html"
        for h, s, i in zip(host, section, ids)
    ]

    # --- content seed: exact/near duplicates derive from the previous id
    exact_dup = (ids % EXACT_DUP_MOD) == (EXACT_DUP_MOD - 1)
    near_dup = (ids % NEAR_DUP_MOD) == (NEAR_DUP_MOD - 1)
    cseed = np.where(exact_dup | near_dup, np.maximum(ids - 1, 0), ids).astype(np.int64)
    cuids = cseed.astype(_U64)

    # --- lang from content seed (so text matches lang)
    lsel = (_h(cuids, 6) % _U64(100)).astype(np.int64)
    # weights: en 40, de 15, fr 15, es 12, zh 10, unknown 8
    lang_idx = np.select(
        [lsel < 40, lsel < 55, lsel < 70, lsel < 82, lsel < 92],
        [0, 1, 2, 3, 4],
        default=5,
    )
    lang = [LANGS[i] for i in lang_idx]

    # --- text: filler words (lang signal) + zeek-style event lines
    n_events = 1 + (_h(cuids, 7) % _U64(4)).astype(np.int64)  # 1..4
    texts: list[str] = []
    for j in range(n):
        cs = int(cuids[j])
        lw = _LANG_WORDS[LANGS[lang_idx[j]]]
        wsel = _splitmix64(np.arange(12, dtype=_U64) + _U64(cs * 31 + 11))
        words = " ".join(lw[int(w) % len(lw)] for w in wsel)
        ev_lines = []
        for e in range(int(n_events[j])):
            he = int(_splitmix64(_U64((cs * 131 + e * 7 + 3) & 0xFFFFFFFFFFFFFFFF)))
            rt = EVENT_TYPES[he % len(EVENT_TYPES)]
            src = f"10.{(he >> 40) & 255}.{(he >> 32) & 255}.{(he >> 24) & 255}"
            dst = f"192.168.{(he >> 16) & 255}.{(he >> 8) & 255}"
            sport = 1024 + (he & 0x7FFF)
            dport = [53, 80, 443, 8080, 22][(he >> 4) % 5]
            nbytes = (he >> 12) & 0xFFFFF
            dur = (he >> 20) & 0x3FFF
            ev_lines.append(
                f"EV type={rt} src={src} dst={dst} sport={sport} "
                f"dport={dport} bytes={nbytes} dur_ms={dur}"
            )
        body = words + "\n" + "\n".join(ev_lines)
        if near_dup[j]:
            body = body + " extraword"
        texts.append(body)

    # --- outlinks: 3 deterministic anchors per page AFTER the text markers
    # (extracted text stays byte-identical; operators/graph.py consumes
    # these). dst hosts reuse the zipf-ish selection from independent hash
    # streams, so the link graph has the same two hubs as the page
    # distribution — hot hosts earn hot in-degree, the skew PageRank and
    # host_edges must absorb.
    link_hosts: list[list[str]] = []
    for k, (sel_salt, cold_salt) in enumerate(((9, 10), (11, 12), (13, 14))):
        lsel_k = (_h(uids, sel_salt) % _U64(100)).astype(np.int64)
        cold_k = _cold_host((_h(uids, cold_salt) % _U64(10_000)).astype(np.int64))
        link_hosts.append(
            list(
                np.where(
                    lsel_k < 25,
                    HOT_HOSTS[0],
                    np.where(lsel_k < 40, HOT_HOSTS[1], cold_k),
                )
            )
        )
    navs = [
        "<nav>"
        + "".join(
            f'<a href="https://{link_hosts[k][j]}/l/{int(ids[j])}-{k}.html">l{k}</a>'
            for k in range(3)
        )
        + "</nav>"
        for j in range(n)
    ]

    # --- html: embeds status marker + the exact text payload between markers
    status = [STATUS_CODES[int(x)] for x in (_h(uids, 8) % _U64(len(STATUS_CODES))).astype(np.int64)]
    html = [
        (
            f'<html><head><title>{h} p{int(i)}</title>'
            f'<meta name="status" content="{st}"/></head>'
            f"<body><!--BEGIN_TEXT-->{t}<!--END_TEXT-->{nav}</body></html>"
        ).encode("utf-8")
        for h, i, st, t, nav in zip(host, ids, status, texts, navs)
    ]

    return pd.DataFrame(
        {"url": url, "warc_ts": ts, "html": html, "text": texts, "lang": lang}
    )


def gen_pages_local(n_rows: int) -> pd.DataFrame:
    """Driver-side golden generator for tests (same kernel, no Spark)."""
    return gen_batch(np.arange(n_rows, dtype=np.int64))


def gen_pages(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Distributed generator: id range -> mapInPandas(gen_batch).

    Deterministic regardless of partition count because every cell is a
    function of the id, never of partition-local RNG state.
    """
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 1)
    base = spark.range(0, n_rows, 1, partitions)

    def _gen(it):
        for pdf in it:
            yield gen_batch(pdf["id"].to_numpy())

    return base.mapInPandas(_gen, schema=PAGES_SCHEMA)


def write_pages(
    spark: SparkSession, n_rows: int, path: str, partitions: int | None = None
) -> None:
    """Materialize the corpus partitioned by day (days(warc_ts) layout).

    Parquet fallback for Iceberg ``days(warc_ts)`` partitioning: a derived
    ``day`` partition directory column; readers prune on it identically.
    """
    from pyspark.sql import functions as F

    df = gen_pages(spark, n_rows, partitions)
    (
        df.withColumn("day", F.date_format("warc_ts", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
