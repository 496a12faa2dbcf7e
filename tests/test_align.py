"""CCAligned-style URL alignment (operators/align.py)."""

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.align import align_by_url, url_align_key


def _keys(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(url_align_key(F.col("url")).alias("k")).collect()
    return [r["k"] for r in rows]


def test_key_strips_lang_segments_and_params(spark):
    got = _keys(
        spark,
        [
            "https://a.example/en/docs/intro.html",
            "https://a.example/fr/docs/intro.html",
            "https://a.example/EN-US/docs/intro.html",
            "https://a.example/zh_CN/docs/intro.html",
            "https://a.example/docs/intro.html?lang=fr&x=1",
            "https://a.example/docs/intro.html?hl=de&x=1",
            "https://a.example/docs/intro.html?x=1#frag",
        ],
    )
    assert set(got) == {"a.example/docs/intro.html?x=1"} | {
        "a.example/docs/intro.html"
    }
    # every variant with the x=1 param collapses to ONE key
    assert got[4] == got[5] == got[6]
    # bare-path variants (lang only in the path) collapse too
    assert got[0] == got[1] == got[2] == got[3]


def test_key_keeps_content_segments(spark):
    # 'p3' (digit) and 'docs' (len 4) are NOT language tags; 'it' IS
    # (two letters — the documented false-positive shape of the paper's
    # own heuristic strips real words like 'it').
    a, b = _keys(
        spark,
        ["http://h.x/docs/p3/it/page", "http://h.x/docs/p3/page"],
    )
    assert a == b == "h.x/docs/p3/page"


def test_key_scheme_case_and_no_path(spark):
    got = _keys(spark, ["HTTPS://H.X/EN/A", "https://h.x/a", "https://h.x"])
    assert got[0] == got[1] == "h.x/a"
    assert got[2] == "h.x/"


def test_align_pairs_and_winner_election(spark):
    rows = [
        # two English docs at the same key: min doc_id (10) must win
        (10, "en", "https://s.x/en/a"),
        (11, "en", "https://s.x/a?hl=en"),
        (20, "fr", "https://s.x/fr/a"),
        (21, "de", "https://s.x/a?lang=de"),
        # no English counterpart -> never aligned
        (30, "zh", "https://s.x/zh/only"),
        # English doc with no foreign counterpart -> no output row
        (40, "en", "https://s.x/en/solo"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "url"])
    got = {
        (r["pivot_id"], r["doc_id"], r["lang"])
        for r in align_by_url(docs).collect()
    }
    assert got == {(10, 20, "fr"), (10, 21, "de")}


def test_align_plan_is_single_equijoin(spark):
    docs = spark.createDataFrame(
        [(1, "en", "https://s.x/en/a"), (2, "fr", "https://s.x/fr/a")],
        ["doc_id", "lang", "url"],
    )
    plan = align_by_url(docs)._jdf.queryExecution().executedPlan().toString()
    # no cartesian / nested-loop shape anywhere in the candidate stage
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "url,key",
    [
        ("https://h.x/a//b", "h.x/a/b"),  # empty segments collapse
        ("https://h.x/a?lang=fr", "h.x/a"),  # all params stripped -> no '?'
        ("https://h.x/a?", "h.x/a"),  # empty query
    ],
)
def test_key_edges(spark, url, key):
    assert _keys(spark, [url]) == [key]


# --- bitext mining ----------------------------------------------------------
import math
import random


def _planted_bitext(spark, n_pairs=6, n_noise=8, dim=16, seed=7):
    """src/tgt embedding sides where src i and tgt 1000+i are the same
    direction plus a tiny deterministic perturbation (planted
    translations); noise rows are random directions."""
    rng = random.Random(seed)

    def unit():
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    src, tgt = [], []
    for i in range(n_pairs):
        base = unit()
        src.append((i, [float(x) for x in base], 0))
        pert = [x + 0.01 * ((j % 3) - 1) for j, x in enumerate(base)]
        tgt.append((1000 + i, [float(x) for x in pert], 0))
    for i in range(n_noise):
        src.append((100 + i, [float(x) for x in unit()], 0))
        tgt.append((1100 + i, [float(x) for x in unit()], 0))
    cols = ["vec_id", "embedding", "label"]
    return (
        spark.createDataFrame(src, cols),
        spark.createDataFrame(tgt, cols),
    )


def test_bitext_mine_finds_planted_pairs(spark):
    from log_analysis_spark.operators.align import bitext_mine

    src, tgt = _planted_bitext(spark)
    handles = []
    out = bitext_mine(
        src, tgt, block_col="label", k=4, threshold=1.0, unpersist_handles=handles
    ).collect()
    got = {r["src_id"]: r["tgt_id"] for r in out}
    for i in range(6):
        assert got.get(i) == 1000 + i, f"planted pair {i} not mined: {got}"
    # planted pairs score far above the margin bar
    scores = {r["src_id"]: r["score"] for r in out}
    assert all(scores[i] > 1.5 for i in range(6))
    assert handles and all(h.is_cached for h in handles)
    for h in handles:
        h.unpersist()


def test_bitext_mine_no_cross_join(spark):
    from log_analysis_spark.operators.align import bitext_mine

    src, tgt = _planted_bitext(spark)
    plan = (
        bitext_mine(src, tgt, block_col="label")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bitext_mine_threshold_filters(spark):
    from log_analysis_spark.operators.align import bitext_mine

    src, tgt = _planted_bitext(spark)
    out = bitext_mine(src, tgt, block_col="label", k=4, threshold=1.5).collect()
    # all planted pairs clear a 1.5 ratio margin, mapped to the right
    # counterpart (random noise CAN exceed a ratio margin when its
    # neighborhood mean is near zero — the statistic's documented shape —
    # so exclusivity is not asserted, correctness of the mapping is)
    got = {r["src_id"]: r["tgt_id"] for r in out}
    assert all(got.get(i) == 1000 + i for i in range(6))


def test_bitext_mine_over_ivf_cells(spark):
    """The 10^12 composition: candidate blocks from the IVF coarse
    quantizer (nearest_centroid cell ids) instead of a given label —
    planted translations land in the same cell (near-identical vectors
    quantize together) and are mined with the right counterparts."""
    from pyspark.sql import functions as F2

    from log_analysis_spark.operators.align import bitext_mine
    from log_analysis_spark.operators.similarity import (
        ivf_centroids,
        nearest_centroid,
    )

    src, tgt = _planted_bitext(spark, n_pairs=5, n_noise=10)
    both = src.unionByName(tgt)
    cents = ivf_centroids(both, n_centroids=4, lloyd_iters=0)
    s = src.withColumn("_cell", nearest_centroid(F2.col("embedding"), cents))
    t = tgt.withColumn("_cell", nearest_centroid(F2.col("embedding"), cents))
    out = bitext_mine(s, t, block_col="_cell", k=4, threshold=1.0).collect()
    got = {r["src_id"]: r["tgt_id"] for r in out}
    assert all(got.get(i) == 1000 + i for i in range(5))
