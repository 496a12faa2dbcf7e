"""Link-graph operators: href extraction, host edges, PageRank."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.graph import (
    extract_links,
    host_edges,
    host_pagerank,
    pagerank,
)
from log_analysis_spark.synth import HOT_HOSTS, gen_pages, gen_pages_local

_HREF = re.compile(r'href="([^"]+)"')
_HOST = re.compile(r"^[a-z][a-z0-9+.-]*://([^/]+)")


def _pages(spark, n=400):
    return gen_pages(spark, n)


def test_extract_links_matches_golden_regex(spark):
    """Spark extraction == independent Python re over the same spec."""
    n = 300
    got = {
        (r["src_url"], r["dst_url"])
        for r in extract_links(_pages(spark, n)).collect()
    }
    want = set()
    for _, row in gen_pages_local(n).iterrows():
        for m in _HREF.finditer(row["html"].decode("utf-8")):
            want.add((row["url"], m.group(1)))
    assert got == want
    assert len(want) == 3 * n  # spec: exactly 3 anchors per page


def test_extracted_text_bytes_unchanged_by_links(spark):
    """Anchors live outside the sentinel markers: extraction byte-identity
    (the north-star per-row invariant) is untouched."""
    pdf = gen_pages_local(50)
    for _, row in pdf.iterrows():
        h = row["html"].decode("utf-8")
        begin, end = h.index("<!--BEGIN_TEXT-->") + 17, h.index("<!--END_TEXT-->")
        assert h[begin:end] == row["text"]


def test_host_edges_weights_and_self_drop(spark):
    n = 400
    edges = {(r["src"], r["dst"]): r["w"] for r in host_edges(_pages(spark, n)).collect()}
    want: dict[tuple[str, str], int] = {}
    for _, row in gen_pages_local(n).iterrows():
        src = _HOST.match(row["url"]).group(1)
        for m in _HREF.finditer(row["html"].decode("utf-8")):
            dst = _HOST.match(m.group(1)).group(1)
            if dst != src:
                want[(src, dst)] = want.get((src, dst), 0) + 1
    assert edges == want
    assert all(s != d for s, d in edges)


def test_pagerank_cycle_is_uniform(spark):
    """On a 3-cycle every iteration is a fixed point: rank = 1/3."""
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], ["src", "dst", "w"]
    )
    for det in (True, False):
        out = {r["node"]: r["rank"] for r in pagerank(edges, iters=4, deterministic=det).collect()}
        assert out == pytest.approx({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})


def test_pagerank_star_hand_computed(spark):
    """a->c, b->c with damping 0.85, 1 iteration, from uniform 1/3:
    rank(c) = 0.15/3 + 0.85*(1/3 + 1/3); a,b get teleport only.
    c is dangling -> its mass leaks (documented contract)."""
    edges = spark.createDataFrame([("a", "c", 1), ("b", "c", 1)], ["src", "dst", "w"])
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=1).collect()}
    t = 0.15 / 3
    assert out["a"] == pytest.approx(t)
    assert out["b"] == pytest.approx(t)
    assert out["c"] == pytest.approx(t + 0.85 * (2 / 3))
    assert sum(out.values()) < 1.0  # leaked dangling mass


def test_pagerank_weighted_split(spark):
    """Weights split a source's vote proportionally: a->b w=3, a->c w=1."""
    edges = spark.createDataFrame([("a", "b", 3), ("a", "c", 1)], ["src", "dst", "w"])
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=1).collect()}
    t = 0.15 / 3
    assert out["b"] == pytest.approx(t + 0.85 * (1 / 3) * 0.75)
    assert out["c"] == pytest.approx(t + 0.85 * (1 / 3) * 0.25)


def test_pagerank_deterministic_equals_plain_sum(spark):
    """The fold-deterministic path computes the same ranks as the
    associative-sum scale path (up to reassociation ulps)."""
    pages = _pages(spark, 400)
    edges = host_edges(pages).persist()
    det = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}
    fast = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iters=3, deterministic=False).collect()
    }
    edges.unpersist()
    assert set(det) == set(fast)
    for k in det:
        assert det[k] == pytest.approx(fast[k], rel=1e-12)


def test_host_pagerank_hubs_rank_highest(spark):
    """The two hot hosts take ~40% of in-links by construction — they must
    own the top-2 ranks, and ranks must be positive with bounded total."""
    ranks = host_pagerank(_pages(spark, 600), iters=5).collect()
    by_rank = sorted(ranks, key=lambda r: -r["rank"])
    assert {by_rank[0]["node"], by_rank[1]["node"]} == set(HOT_HOSTS)
    total = sum(r["rank"] for r in ranks)
    assert 0 < total <= 1.0 + 1e-9
    assert all(r["rank"] > 0 for r in ranks)


def test_pagerank_unpersist_seam(spark):
    edges = spark.createDataFrame([("a", "b", 1)], ["src", "dst", "w"])
    handles: list = []
    pagerank(edges, iters=1, unpersist_handles=handles).collect()
    assert len(handles) == 2
    for h in handles:
        h.unpersist()


# ---------------------------------------------------------------------------
# anchor text
# ---------------------------------------------------------------------------
def test_extract_anchors_golden(spark):
    """Target + cleaned visible text per anchor; independent Python re."""
    from log_analysis_spark.operators.graph import extract_anchors

    html = (
        '<p><a class="nav" href="https://a.net/1"> <b>Bold</b>\n link </a>'
        '<a href="https://b.net/2">plain</a>'
        "<a no-href>skipped</a></p>"
    )
    df = spark.createDataFrame([("https://s.net/p", html)], "url string, html string")
    got = [
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in extract_anchors(df).collect()
    ]
    assert got == [
        ("https://s.net/p", "https://a.net/1", "Bold link"),
        ("https://s.net/p", "https://b.net/2", "plain"),
    ]


def test_extract_anchors_on_synth_pages(spark):
    """Every synth page's 3 nav anchors extract with their texts."""
    from log_analysis_spark.operators.graph import extract_anchors

    rows = extract_anchors(_pages(spark, 120)).collect()
    assert len(rows) == 3 * 120
    assert all(r["anchor"] != "" for r in rows)


def test_anchor_text_summary_spam_resistance(spark):
    """w counts every link; n_src_hosts counts distinct linking hosts —
    a single host repeating an anchor moves w only."""
    from log_analysis_spark.operators.graph import anchor_text_summary

    mk = '<a href="https://t.net/x">buy this</a>'
    rows = [
        ("https://spam.net/1", mk * 5),  # one host, 5 repeats
        ("https://real-a.net/1", mk),
        ("https://real-b.net/1", mk),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = anchor_text_summary(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["dst"], r["anchor"], r["w"], r["n_src_hosts"]) == (
        "t.net",
        "buy this",
        7,
        3,
    )


# ---------------------------------------------------------------------------
# HITS hubs/authorities
# ---------------------------------------------------------------------------

def _hits_py(edges, iters):
    """Independent replay: counterpart-sorted fold sums, L-inf norm."""
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    auth = {v: 1.0 for v in nodes}
    hub = {}
    for _ in range(iters):
        raw = {}
        for s, d, w in sorted(edges, key=lambda e: (e[0], e[1])):
            raw[s] = raw.get(s, 0.0) + auth[d] * w
        m = max(raw.values(), default=0.0)
        hub = {v: (raw.get(v, 0.0) / m if m else 0.0) for v in nodes}
        raw = {}
        for s, d, w in sorted(edges, key=lambda e: (e[1], e[0])):
            raw[d] = raw.get(d, 0.0) + hub[s] * w
        m = max(raw.values(), default=0.0)
        auth = {v: (raw.get(v, 0.0) / m if m else 0.0) for v in nodes}
    return {v: (hub[v], auth[v]) for v in nodes}


_HITS_EDGES = [
    # hub0 links to every authority; auth0 is linked by every hub;
    # stragglers link sparsely.
    ("hub0", "auth0", 3), ("hub0", "auth1", 1), ("hub0", "auth2", 1),
    ("hub1", "auth0", 2), ("hub1", "auth1", 1),
    ("hub2", "auth0", 1),
    ("auth1", "hub2", 1),  # a back-edge: auth1 is also a (weak) hub
]


def test_hits_matches_python_replay_bitwise(spark):
    from log_analysis_spark.operators.graph import hits

    e = spark.createDataFrame(_HITS_EDGES, "src string, dst string, w int")
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(e, iters=3).collect()}
    assert got == _hits_py(_HITS_EDGES, 3)


def test_hits_separates_hubs_from_authorities(spark):
    from log_analysis_spark.operators.graph import hits

    e = spark.createDataFrame(_HITS_EDGES, "src string, dst string, w int")
    got = {r["node"]: r for r in hits(e, iters=3).collect()}
    # L-inf normalization: the best hub / best authority score exactly 1
    assert got["hub0"]["hub"] == 1.0 and got["auth0"]["auth"] == 1.0
    # pure hubs earn no authority, pure authorities no hub mass
    assert got["hub0"]["auth"] == 0.0 and got["auth0"]["hub"] == 0.0
    assert got["hub0"]["hub"] > got["hub1"]["hub"] > got["hub2"]["hub"]
    assert got["auth0"]["auth"] > got["auth1"]["auth"] > got["auth2"]["auth"]


def test_hits_deterministic_matches_fast_mode_approx(spark):
    from log_analysis_spark.operators.graph import hits

    e = spark.createDataFrame(_HITS_EDGES, "src string, dst string, w int")
    det = {r["node"]: (r["hub"], r["auth"]) for r in hits(e, iters=2).collect()}
    fast = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(e, iters=2, deterministic=False).collect()
    }
    assert set(det) == set(fast)
    for v in det:
        assert abs(det[v][0] - fast[v][0]) < 1e-12
        assert abs(det[v][1] - fast[v][1]) < 1e-12


def test_hits_unpersist_handles_and_empty_graph(spark):
    from log_analysis_spark.operators.graph import hits

    handles: list = []
    e = spark.createDataFrame(_HITS_EDGES, "src string, dst string, w int")
    out = hits(e, iters=1, unpersist_handles=handles)
    assert out.count() == 6 and len(handles) == 2
    for h in handles:
        h.unpersist()
    empty = spark.createDataFrame([], "src string, dst string, w int")
    assert hits(empty, iters=2).count() == 0


def test_trustrank_seed_bias_and_spam_demotion(spark):
    """Trusted seed {a} on a -> b -> c plus a disconnected spam 2-cycle
    (x <-> y): trust flows ONLY along paths from a — hand-replayable in
    2 iterations — while the spam cycle, which would earn uniform
    teleport mass under pagerank, scores exactly 0.0 trust."""
    from log_analysis_spark.operators.graph import trustrank

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("x", "y", 1), ("y", "x", 1)],
        ["src", "dst", "w"],
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    out = {
        r["node"]: r["trust"]
        for r in trustrank(edges, seeds, iters=2, damping=0.85).collect()
    }
    # replay: t = {a: 1.0}; trust0 = t
    # iter1: a = 0.15*1, b = 0.85*1, c = 0
    # iter2: a = 0.15, b = 0.85*0.15, c = 0.85*(0.85*1)... from trust1
    t1 = {"a": 0.15, "b": 0.85, "c": 0.0, "x": 0.0, "y": 0.0}
    t2 = {
        "a": 0.15,
        "b": 0.85 * t1["a"],
        "c": 0.85 * t1["b"],
        "x": 0.0,
        "y": 0.0,
    }
    for node, want in t2.items():
        assert out[node] == pytest.approx(want), node
    assert out["x"] == 0.0 and out["y"] == 0.0  # exact zero, not approx


def test_trustrank_seed_outside_graph_ignored_and_multi_seed_split(spark):
    """Seeds not present in the graph drop out of |S| (teleport mass
    normalizes over the in-graph seeds only); with both a and b seeded
    the teleport splits 1/2 each."""
    from log_analysis_spark.operators.graph import trustrank

    edges = spark.createDataFrame([("a", "c", 1), ("b", "c", 1)], ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a",), ("b",), ("ghost",)], ["node"])
    out = {
        r["node"]: r["trust"]
        for r in trustrank(edges, seeds, iters=1, damping=0.85).collect()
    }
    # t = {a: 1/2, b: 1/2}; iter1: a,b keep 0.15*1/2; c = 0.85*(1/2+1/2)
    assert out["a"] == pytest.approx(0.15 * 0.5)
    assert out["b"] == pytest.approx(0.15 * 0.5)
    assert out["c"] == pytest.approx(0.85 * 1.0)


def test_trustrank_deterministic_equals_plain_sum_and_unpersist(spark):
    """Fold-deterministic trust equals the associative-sum scale path
    (up to reassociation ulps); the unpersist seam hands back exactly
    the two persisted relations."""
    from log_analysis_spark.operators.graph import trustrank

    pages = _pages(spark, 300)
    edges = host_edges(pages)
    seeds = edges.select(F.col("src").alias("node")).limit(3)
    handles: list = []
    det = {
        r["node"]: r["trust"]
        for r in trustrank(
            edges, seeds, iters=3, deterministic=True, unpersist_handles=handles
        ).collect()
    }
    fast = {
        r["node"]: r["trust"]
        for r in trustrank(edges, seeds, iters=3, deterministic=False).collect()
    }
    assert det.keys() == fast.keys()
    for k in det:
        assert det[k] == pytest.approx(fast[k], abs=1e-12)
    assert len(handles) == 2
    for h in handles:
        h.unpersist()
