"""Frontier scheduler tests (operators/frontier.py): host affinity,
deterministic per-host order, priority precedence, delay composition
with robots.txt Crawl-delay extraction."""

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.frontier import schedule_frontier


def _frontier(spark):
    rows = [
        ("a.example", f"http://a.example/p{i}", i % 3) for i in range(9)
    ] + [
        ("b.example", f"http://b.example/q{i}", 0) for i in range(4)
    ] + [
        ("c.example", "http://c.example/solo", 9)
    ]
    return spark.createDataFrame(rows, "host string, url string, priority int")


def test_host_affinity_and_rank_permutation(spark):
    out = schedule_frontier(_frontier(spark), n_workers=4).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        workers = {r["worker"] for r in rs}
        assert len(workers) == 1, f"{host} split across workers"
        assert workers.pop() in range(4)
        assert sorted(r["fetch_order"] for r in rs) == list(range(1, len(rs) + 1))


def test_deterministic_under_repartition(spark):
    f = _frontier(spark)
    a = schedule_frontier(f, n_workers=4).orderBy("url").collect()
    b = schedule_frontier(f.repartition(7, "url"), n_workers=4).orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_priority_fetched_first(spark):
    out = schedule_frontier(
        _frontier(spark), priority_col="priority", n_workers=4
    ).filter(F.col("host") == "a.example").orderBy("fetch_order").collect()
    pris = [r["priority"] for r in out]
    assert pris == sorted(pris, reverse=True)


def test_delay_dim_and_default(spark):
    delays = spark.createDataFrame(
        [("a.example", 5.0)], "host string, delay_s double"
    )
    out = schedule_frontier(_frontier(spark), delays, default_delay_s=2.0).collect()
    a = sorted(
        (r["fetch_order"], r["fetch_offset_s"]) for r in out if r["host"] == "a.example"
    )
    assert a == [(i + 1, 5.0 * i) for i in range(9)]
    b = sorted(
        (r["fetch_order"], r["fetch_offset_s"]) for r in out if r["host"] == "b.example"
    )
    assert b == [(i + 1, 2.0 * i) for i in range(4)]


def test_compose_with_robots_crawl_delays(spark):
    from log_analysis_spark.operators.robots import crawl_delays, parse_robots

    body = "User-agent: *\nCrawl-delay: 7\nDisallow: /private\n"
    robots = spark.createDataFrame([("a.example", body)], "host string, robots_txt string")
    delays = crawl_delays(parse_robots(robots), agent="*")
    out = schedule_frontier(_frontier(spark), delays).filter(
        F.col("host") == "a.example"
    ).collect()
    assert all(r["delay_s"] == 7.0 for r in out)
    assert {r["fetch_offset_s"] for r in out} == {7.0 * i for i in range(9)}


def test_md5_variant_matches_shape(spark):
    out = schedule_frontier(_frontier(spark), hash_fn="md5", n_workers=8).collect()
    assert len(out) == 14
    assert all(0 <= r["worker"] < 8 for r in out)


# --- grow_frontier (BFS growth step, bloom-prefiltered anti-join) -----------

def _growth_fixture(spark):
    from log_analysis_spark.operators.frontier import grow_frontier  # noqa: F401

    cand = spark.createDataFrame(
        [
            ("h1.net", "https://a.net/1"),   # new, two referrers
            ("h2.net", "https://a.net/1"),
            ("h1.net", "https://a.net/2"),   # already seen
            ("h3.net", "https://b.net/x"),   # new, one referrer
            ("h3.net", "https://c.net/y"),   # already seen
            ("h3.net", "https://b.net/x"),   # dup referrer -> still 1 distinct
        ],
        "src_host string, url string",
    )
    seen = spark.createDataFrame(
        [("https://a.net/2",), ("https://c.net/y",), ("https://z.net/unrelated",)],
        "url string",
    )
    return cand, seen


def test_grow_frontier_bloom_result_identical(spark):
    """The Bloom prefilter changes which rows pay the anti-join shuffle,
    never the answer: plain vs bloomed (including a TINY m=64 filter
    where false positives are near-certain) are row-identical."""
    from log_analysis_spark.operators.frontier import grow_frontier

    cand, seen = _growth_fixture(spark)
    expect = {("https://a.net/1", 2), ("https://b.net/x", 1)}

    def run(**kw):
        return {
            (r["url"], r["n_referrers"])
            for r in grow_frontier(cand, seen, **kw).collect()
        }

    assert run() == expect
    assert run(bloom_m_bits=1 << 12) == expect
    assert run(bloom_m_bits=64, bloom_k=2) == expect      # FP-heavy -> exact path absorbs
    assert run(bloom_m_bits=1 << 12, hash_fn="md5") == expect
    assert run(bloom_m_bits=1 << 12, broadcast_seen=True) == expect


def test_grow_frontier_bloom_rejects_power_of_two_violation(spark):
    from log_analysis_spark.operators.frontier import grow_frontier

    cand, seen = _growth_fixture(spark)
    with pytest.raises(ValueError, match="power of two"):
        grow_frontier(cand, seen, bloom_m_bits=100).collect()


# --- url_templates (crawler-trap detection) ---------------------------------

def test_url_templates_collapses_traps(spark):
    from log_analysis_spark.operators.frontier import url_templates

    urls = (
        [f"https://a.net/p/{i}/view" for i in range(50)]          # numeric trap
        + [f"https://a.net/s/{'%012x' % (i * 2654435761)}/cart" for i in range(20)]
        + ["https://a.net/about", "https://b.net/about",
           "https://b.net/about"]                                  # dup URL: 1 distinct
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = {(r.host, r.template): r.n_urls
            for r in url_templates(df, min_count=2).collect()}
    assert rows[("a.net", "/p/N/view")] == 50
    assert rows[("a.net", "/s/H/cart")] == 20
    # static pages: a.net/about is 1 distinct URL -> cut by min_count;
    # b.net/about is 1 distinct URL (dup rows collapse) -> also cut.
    assert ("a.net", "/about") not in rows and ("b.net", "/about") not in rows


def test_url_templates_hex_before_digits(spark):
    from log_analysis_spark.operators.frontier import url_templates

    # 8+ all-digit run is hex too -> 'H' (rule order), shorter digit
    # runs -> 'N'; query strings and fragments never reach the template.
    df = spark.createDataFrame(
        [("https://x.org/d/12345678/y",), ("https://x.org/d/99999999/y",),
         ("https://x.org/d/123/y?page=9#f",), ("https://x.org/d/456/y",)],
        "url string",
    )
    rows = {(r.host, r.template): r.n_urls
            for r in url_templates(df, min_count=1).collect()}
    assert rows[("x.org", "/d/H/y")] == 2
    assert rows[("x.org", "/d/N/y")] == 2


# --------------------------------------------------------------------------
# crawl_budget: Hamilton largest-remainder apportionment
# --------------------------------------------------------------------------


def _budget(spark, rows, d, **kw):
    from log_analysis_spark.operators.frontier import crawl_budget

    df = spark.createDataFrame(rows, ["host", "w"])
    return {
        r["host"]: r["budget"]
        for r in crawl_budget(df, total_slots=d, **kw).collect()
    }


def test_crawl_budget_hand_case_and_sum_invariant(spark):
    """Classic apportionment: weights 5/3/2 over D=10 give exactly
    5/3/2; weights 4/3/3 over D=7 give floors 2/2/2 and the extra slot
    goes to the largest remainder (host a: rem 28%10=8 vs 21%10=1)."""
    assert _budget(spark, [("a", 5), ("b", 3), ("c", 2)], 10) == {
        "a": 5, "b": 3, "c": 2,
    }
    got = _budget(spark, [("a", 4), ("b", 3), ("c", 3)], 7)
    assert got == {"a": 3, "b": 2, "c": 2}
    assert sum(got.values()) == 7


def test_crawl_budget_matches_serial_replay_and_tie_break(spark):
    """200 hosts with adversarial weights: the distributed two-phase rank
    equals a serial Hamilton walker; remainder ties break by host ASC;
    sum(budget) == D always."""
    rows = [(f"h{i:03d}", (i * 7919) % 97 + 1) for i in range(200)]
    d = 331
    got = _budget(spark, rows, d, num_partitions=7)
    wsum = sum(w for _, w in rows)
    fl = {h: (d * w) // wsum for h, w in rows}
    rem = {h: (d * w) % wsum for h, w in rows}
    extra = d - sum(fl.values())
    order = sorted(rows, key=lambda t: (-rem[t[0]], t[0]))
    want = dict(fl)
    for h, _ in order[:extra]:
        want[h] += 1
    assert got == want
    assert sum(got.values()) == d


def test_crawl_budget_zero_mass_and_zero_slots(spark):
    """W == 0 or D == 0 yields all-zero budgets, never a division."""
    assert _budget(spark, [("a", 0), ("b", 0)], 10) == {"a": 0, "b": 0}
    assert _budget(spark, [("a", 5), ("b", 3)], 0) == {"a": 0, "b": 0}


def test_crawl_budget_unpersist_seam(spark):
    """unpersist_handles hands back the one persisted ranked relation."""
    from log_analysis_spark.operators.frontier import crawl_budget

    df = spark.createDataFrame([("a", 4), ("b", 3), ("c", 3)], ["host", "w"])
    handles: list = []
    out = crawl_budget(df, total_slots=7, unpersist_handles=handles)
    assert out.count() == 3 and len(handles) == 1
    handles[0].unpersist()
