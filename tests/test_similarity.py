"""Similarity-search tests: exact top-k vs numpy, ANN recall, kNN join."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from log_analysis_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas()
    return {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}


def _exact_topk(emb_np, q, k):
    qv = np.asarray(q, dtype=np.float64)
    scores = {
        i: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        for i, v in emb_np.items()
    }
    return sorted(scores, key=lambda i: (-scores[i], i))[:k]


def test_brute_force_topk_matches_numpy(emb, emb_np):
    q = [float(x) for x in emb_np[0]]
    got = [r["vec_id"] for r in SIM.brute_force_topk(emb, q, k=10).collect()]
    assert got == _exact_topk(emb_np, q, 10)


def test_brute_force_topk_scores_descending(emb, emb_np):
    q = [float(x) for x in emb_np[1]]
    rows = SIM.brute_force_topk(emb, q, k=10).collect()
    scores = [r["cos_sim"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert rows[0]["vec_id"] == 1  # self is its own nearest neighbor


def test_lsh_topk_subset_and_recall(emb, emb_np):
    q = [float(x) for x in emb_np[0]]
    exact = set(_exact_topk(emb_np, q, 10))
    got = [r["vec_id"] for r in SIM.lsh_topk(emb, q, k=10, n_planes=8).collect()]
    assert len(got) <= 10
    # approximate: with 8 planes + 1-bit probing, expect meaningful overlap
    assert len(set(got) & exact) >= 3


def test_ivf_topk_runs_and_probes(emb, emb_np):
    cents = SIM.ivf_centroids(emb, n_centroids=4)
    assert cents.shape == (4, 64)
    q = [float(x) for x in emb_np[0]]
    got = SIM.ivf_topk(emb, q, cents, k=5, n_probe=2).collect()
    assert 0 < len(got) <= 5
    scores = [r["cos_sim"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_knn_join_matches_numpy_for_one_query(emb, emb_np):
    rows = SIM.knn_join(emb, emb, k=2, block_col="label").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["nid"], r["cos_sim"]))
    labels = {
        r.vec_id: r.label for r in emb.select("vec_id", "label").toPandas().itertuples()
    }
    qid = sorted(by_q)[0]
    qv = emb_np[qid]
    cands = {
        i: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        for i, v in emb_np.items()
        if i != qid and labels[i] == labels[qid]
    }
    expect = sorted(cands, key=lambda i: (-cands[i], i))[:2]
    got = [nid for _rank, nid, _s in sorted(by_q[qid])]
    assert got == expect
    assert all(len(v) <= 2 for v in by_q.values())


def test_knn_join_without_block_never_cross_joins(emb):
    """block_col=None must auto-derive an LSH block: the physical plan may
    not contain a broadcast nested-loop / cartesian product (a disguised
    |L|x|R| cross join would not survive real data sizes)."""
    import contextlib
    import io

    df = SIM.knn_join(emb, emb, k=2, block_col=None)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    # approximate-kNN contract still holds: <= k neighbors per query,
    # neighbors share the query's LSH bucket, never self-paired
    by_q = {}
    for r in rows:
        assert r["qid"] != r["nid"]
        by_q.setdefault(r["qid"], []).append(r["nid"])
    assert by_q and all(len(v) <= 2 for v in by_q.values())


def test_lsh_index_partition_pruning(emb, emb_np, spark, tmpdir_path):
    """The materialized LSH index must (a) return the same result as the
    ad-hoc lsh_topk and (b) prune partitions: the probe's scan plan shows a
    PartitionFilters entry on _bucket, i.e. unprobed bucket directories are
    never read."""
    import contextlib
    import io
    import os

    path = os.path.join(tmpdir_path, "lsh_index")
    SIM.write_lsh_index(emb, path, n_planes=8)
    # hive-partitioned layout, one dir per bucket
    assert any(d.startswith("_bucket=") for d in os.listdir(path))
    q = [float(x) for x in emb_np[0]]
    indexed = SIM.lsh_topk_indexed(spark, path, q, k=10, n_planes=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        indexed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_bucket" in plan
    got = [(r["vec_id"], r["cos_sim"]) for r in indexed.collect()]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in SIM.lsh_topk(emb, q, k=10, n_planes=8).collect()
    ]
    assert got == want


def test_ivf_index_partition_pruning(emb, emb_np, spark, tmpdir_path):
    import os

    path = os.path.join(tmpdir_path, "ivf_index")
    cents = SIM.ivf_centroids(emb, n_centroids=4, lloyd_iters=0)
    SIM.write_ivf_index(emb, path, cents)
    assert any(d.startswith("_c=") for d in os.listdir(path))
    q = [float(x) for x in emb_np[0]]
    got = [(r["vec_id"], r["cos_sim"]) for r in
           SIM.ivf_topk_indexed(spark, path, q, cents, k=5, n_probe=2).collect()]
    want = [(r["vec_id"], r["cos_sim"]) for r in
            SIM.ivf_topk(emb, q, cents, k=5, n_probe=2).collect()]
    assert got == want


def test_assign_centroids_arrow_matches_expression_path(emb):
    """The Arrow matrix-multiply assignment (scale path for large
    n_centroids) must agree with the fold-exact Column-expression path on
    real (non-equidistant) vectors."""
    cents = SIM.ivf_centroids(emb, n_centroids=4, lloyd_iters=0)
    expr = {
        r["vec_id"]: r["_c"]
        for r in emb.withColumn(
            "_c", SIM.nearest_centroid(F.col("embedding"), cents)
        ).select("vec_id", "_c").collect()
    }
    arrow = {
        r["vec_id"]: r["_c"]
        for r in SIM.assign_centroids_arrow(emb, cents).collect()
    }
    assert arrow == expr


def test_quantized_topk_recall_vs_exact(emb, emb_np):
    """int8 quantization at dim 64 should preserve nearly all of the exact
    top-10 (scales cancel in cosine; max per-element error 1/254)."""
    exact = set(_exact_topk(emb_np, [float(x) for x in emb_np[0]], 10))
    got = [r["vec_id"] for r in SIM.quantized_topk(emb, query_id=0, k=10).collect()]
    assert len(got) == 10
    assert len(set(got) & exact) >= 8
    assert got[0] == 0  # self is still its own nearest neighbor


def test_quantize_vectors_range_and_zero_guard(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2], "embedding": [[0.5, -1.0, 0.25], [0.0, 0.0, 0.0]]})
    )
    rows = {r["_id"]: r for r in SIM.quantize_vectors(df).collect()}
    assert rows[1]["_q"] == [64, -127, 32]  # floor(x*127/max|v| + .5)
    assert rows[1]["_scale"] == 1.0
    assert rows[2]["_q"] == [0, 0, 0]  # zero vector: no div-by-zero


def test_hyperplane_bucket_deterministic(emb):
    planes = SIM.hyperplanes(64, 8, seed=42)
    b1 = emb.select("vec_id", SIM.hyperplane_bucket(F.col("embedding"), planes).alias("b"))
    a = {r["vec_id"]: r["b"] for r in b1.collect()}
    b = {r["vec_id"]: r["b"] for r in b1.collect()}
    assert a == b
    assert all(0 <= v < 256 for v in a.values())


def test_pq_encode_shapes_and_determinism(emb):
    books = SIM.pq_codebooks(emb, m=4, n_codes=8)
    assert books.shape == (4, 8, 16)
    enc = SIM.pq_encode(emb, books)
    rows = {r["vec_id"]: r["_codes"] for r in enc.collect()}
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in rows.values())
    rows2 = {r["vec_id"]: r["_codes"] for r in SIM.pq_encode(emb, books).collect()}
    assert rows == rows2
    # a codebook seed vector reconstructs to itself: its codes must point
    # at its own slices (distance 0 beats every other code, ties by index)
    n = emb.count()
    stride = max(n // 8, 1)
    assert rows[0] == [0, 0, 0, 0]  # vec 0 is seed 0
    assert rows[stride * 3] == [3, 3, 3, 3]


def test_pq_topk_self_nearest_and_recall(emb, emb_np):
    """ADC ranking: the query (a database vector) must rank itself first
    with approx distance equal to sum of its own-code luts; top-10 should
    substantially overlap the exact cosine top-10 at m=4, k=8 on dim 64."""
    books = SIM.pq_codebooks(emb, m=4, n_codes=8)
    q = [float(x) for x in emb_np[0]]
    got = SIM.pq_topk(emb, q, books, k=10).collect()
    assert len(got) == 10
    assert got[0]["vec_id"] == 0  # seed 0 quantizes losslessly -> dist is minimal
    dists = [r["adc_dist"] for r in got]
    assert dists == sorted(dists)
    # ADC is coarse (8 codes/subspace) — demand overlap, not equality
    exact = set(_exact_topk(emb_np, q, 20))
    assert len({r["vec_id"] for r in got} & exact) >= 5


def test_ivfpq_topk_subset_of_probed_cells(emb, emb_np):
    """IVF-PQ results must come only from probed cells, rank by ADC, and
    keep reasonable recall vs exact cosine on this corpus."""
    cents = SIM.ivf_centroids(emb, n_centroids=8, lloyd_iters=0)
    books = SIM.pq_codebooks(emb, m=4, n_codes=8)
    q = [float(x) for x in emb_np[0]]
    got = SIM.ivfpq_topk(emb, q, cents, books, k=10, n_probe=2).collect()
    assert 0 < len(got) <= 10
    dists = [r["adc_dist"] for r in got]
    assert dists == sorted(dists)
    # membership: every hit's coarse cell is in the probe set
    scores = [
        (SIM._fold_dot(c, c) - 2.0 * SIM._fold_dot(q, c), ci)
        for ci, c in enumerate(cents)
    ]
    probe = {ci for _s, ci in sorted(scores)[:2]}
    assigned = {
        r["vec_id"]: r["_c"]
        for r in emb.withColumn(
            "_c", SIM.nearest_centroid(F.col("embedding"), cents)
        ).collect()
    }
    assert all(assigned[r["vec_id"]] in probe for r in got)
    assert got[0]["vec_id"] == 0  # query is a seed: its own cell is probed first


def test_pq_encode_arrow_matches_expression_path(emb):
    books = SIM.pq_codebooks(emb, m=4, n_codes=8)
    expr = {r["vec_id"]: list(r["_codes"]) for r in SIM.pq_encode(emb, books).collect()}
    arrow = {r["vec_id"]: list(r["_codes"]) for r in SIM.pq_encode_arrow(emb, books).collect()}
    assert expr == arrow


def test_ivfpq_index_prunes_and_matches_adhoc(emb, emb_np, spark, tmpdir_path):
    """The materialized IVF-PQ index must (a) lay out one directory per
    coarse cell, (b) prune partitions — the probe's scan plan shows a
    PartitionFilters entry on _c, (c) read ONLY the code column — the
    scan's ReadSchema contains no embedding — and (d) return exactly the
    ad-hoc ivfpq_topk's rows (ids AND ADC distances)."""
    import contextlib
    import io
    import os

    path = os.path.join(tmpdir_path, "ivfpq_index")
    cents = SIM.ivf_centroids(emb, n_centroids=8, lloyd_iters=0)
    books = SIM.pq_codebooks(emb, m=4, n_codes=8)
    SIM.write_ivfpq_index(emb, path, cents, books)
    assert any(d.startswith("_c=") for d in os.listdir(path))
    q = [float(x) for x in emb_np[0]]
    indexed = SIM.ivfpq_topk_indexed(spark, path, q, cents, books, k=10, n_probe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        indexed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "_c" in plan
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "embedding" not in read_schema and "_codes" in read_schema
    got = [(r["vec_id"], r["adc_dist"]) for r in indexed.collect()]
    want = [(r["vec_id"], r["adc_dist"]) for r in
            SIM.ivfpq_topk(emb, q, cents, books, k=10, n_probe=2).collect()]
    assert got == want


def test_ivfpq_index_arrow_write_matches(emb, emb_np, spark, tmpdir_path):
    """arrow=True (BLAS write path) produces the same index content on
    real separated vectors as the fold-exact default."""
    import os

    path = os.path.join(tmpdir_path, "ivfpq_index_arrow")
    cents = SIM.ivf_centroids(emb, n_centroids=8, lloyd_iters=0)
    books = SIM.pq_codebooks(emb, m=4, n_codes=8)
    SIM.write_ivfpq_index(emb, path, cents, books, arrow=True)
    q = [float(x) for x in emb_np[0]]
    got = [(r["vec_id"], r["adc_dist"]) for r in
           SIM.ivfpq_topk_indexed(spark, path, q, cents, books, k=10, n_probe=2).collect()]
    want = [(r["vec_id"], r["adc_dist"]) for r in
            SIM.ivfpq_topk(emb, q, cents, books, k=10, n_probe=2).collect()]
    assert got == want


@pytest.fixture(scope="module")
def planted(spark, emb):
    """Corpus with planted ground-truth neighbors: for each of 3 base
    vectors, 10 deterministic perturbed copies at cos ~ 0.99 (sigma=0.15
    relative noise). The raw synthetic embeddings have NO genuine near
    neighbors — every non-self exact-top-10 entry sits at cos ~ 0.26-0.39,
    i.e. random dim-64 directions, so recall@10 there measures scan
    fraction, not locality. Planting is the standard ANN-bench fix: the
    exact top-10 of a base query becomes its 10 copies, which multi-probe
    has a real signal to find."""
    import pandas as pd

    rng = np.random.default_rng(1234)
    base_ids = [0, 1, 7]
    pdf = emb.select("vec_id", "embedding").toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    rows = []
    truth = {}
    for b in base_ids:
        v = vecs[b]
        scale = 0.15 * float(np.linalg.norm(v)) / np.sqrt(len(v))
        ids = []
        for j in range(10):
            nid = 100000 + b * 100 + j
            w = v + scale * rng.standard_normal(len(v))
            rows.append({"vec_id": nid, "embedding": [float(x) for x in w]})
            ids.append(nid)
        truth[b] = set(ids)
    extra = spark.createDataFrame(pd.DataFrame(rows))
    corpus = emb.select("vec_id", "embedding").unionByName(extra)
    return corpus, vecs, truth


def test_lsh_multiprobe_recall_curve(planted):
    """Recall@10 (vs planted ground truth) vs probe width: monotone
    non-decreasing in probe_hamming per query, and Hamming<=2 at 8 planes
    reaches recall@10 >= 0.9 averaged over queries — the documented
    recall-sensitive probe setting (37 of 256 buckets read)."""
    corpus, vecs, truth = planted
    recalls = {0: [], 1: [], 2: []}
    for b, tset in truth.items():
        q = [float(x) for x in vecs[b]]
        for h in recalls:
            got = {
                r["vec_id"]
                for r in SIM.lsh_topk(
                    corpus, q, k=11, n_planes=8, probe_hamming=h
                ).collect()
            }
            recalls[h].append(len(got & tset) / 10.0)
    for a, b_ in zip(recalls[0], recalls[1]):
        assert a <= b_
    for a, b_ in zip(recalls[1], recalls[2]):
        assert a <= b_
    assert sum(recalls[2]) / len(recalls[2]) >= 0.9


def test_ivfpq_indexed_recall_on_planted(planted, spark, tmpdir_path):
    """The materialized IVF-PQ path finds planted true neighbors:
    recall@10 >= 0.9 at n_probe=4 of 8 cells averaged over queries (each
    copy shares its base's cell with overwhelming probability at cos~0.99)."""
    import os

    corpus, vecs, truth = planted
    cents = SIM.ivf_centroids(corpus, n_centroids=8, lloyd_iters=0)
    books = SIM.pq_codebooks(corpus, m=4, n_codes=8)
    path = os.path.join(tmpdir_path, "ivfpq_planted")
    SIM.write_ivfpq_index(corpus, path, cents, books)
    recalls = []
    for b, tset in truth.items():
        q = [float(x) for x in vecs[b]]
        got = {
            r["vec_id"]
            for r in SIM.ivfpq_topk_indexed(
                spark, path, q, cents, books, k=11, n_probe=4
            ).collect()
        }
        recalls.append(len(got & tset) / 10.0)
    assert sum(recalls) / len(recalls) >= 0.9


def test_ivfpq_nprobe_recall_curve(emb, emb_np):
    """IVF-PQ recall@10 (vs exact cosine top-20, PQ being coarse) must be
    monotone in n_probe; n_probe=4 of 8 cells reaches the documented
    overlap bar on this corpus."""
    cents = SIM.ivf_centroids(emb, n_centroids=8, lloyd_iters=0)
    books = SIM.pq_codebooks(emb, m=4, n_codes=8)
    q = [float(x) for x in emb_np[0]]
    exact20 = set(_exact_topk(emb_np, q, 20))
    overlap = {}
    for np_ in (1, 2, 4, 8):
        got = {r["vec_id"] for r in
               SIM.ivfpq_topk(emb, q, cents, books, k=10, n_probe=np_).collect()}
        overlap[np_] = len(got & exact20)
    assert overlap[1] <= overlap[2] <= overlap[4] + 1  # ADC re-ranking may swap 1
    assert overlap[4] >= 5
    assert overlap[8] >= 5  # all cells = plain pq_topk overlap


def test_nearest_centroid_null_vector_yields_null(spark):
    """NULL (and all-NaN) embeddings must assign to NULL — never the -1
    init sentinel, which would turn into element_at(lut, 0) runtime errors
    in the PQ paths (ADVICE r3). The PQ/ADC pipeline over a NULL vector
    yields NULL codes and NULL distance, not an exception."""
    import pandas as pd

    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    books = cents.reshape(1, 2, 2)  # m=1, 2 codes, d_sub=2
    df = spark.createDataFrame(
        pd.DataFrame({
            "vec_id": [1, 2, 3],
            "embedding": [[1.0, 0.1], None, [float("nan"), float("nan")]],
        })
    )
    rows = {
        r["vec_id"]: r["_c"]
        for r in df.withColumn(
            "_c", SIM.nearest_centroid(F.col("embedding"), cents)
        ).collect()
    }
    assert rows[1] == 0 and rows[2] is None and rows[3] is None
    enc = {r["vec_id"]: r["d"] for r in SIM.pq_encode(df, books).select(
        "vec_id", SIM.adc_distance([1.0, 0.0], books).alias("d")).collect()}
    assert enc[1] is not None and enc[2] is None and enc[3] is None


def test_knn_join_warns_on_auto_block(emb):
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SIM.knn_join(emb, emb, k=2, block_col=None)
        assert any("approximate" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SIM.knn_join(emb, emb, k=2, block_col="label")
        assert not any("approximate" in str(x.message) for x in w)


# --- SemDeDup ---------------------------------------------------------------
def test_semdedup_drops_planted_neardups(spark):
    """Near-copies (cos >= threshold) of a lower id drop; survivors keep
    their cell; NULL embeddings are excluded entirely."""
    base1 = [1.0, 0.0, 0.0, 0.0]
    base2 = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, base1),
        (1, [1.0, 0.02, 0.0, 0.0]),      # near-dup of 0 -> dropped
        (2, base2),
        (3, [0.0, 2.0, 0.0, 0.0]),       # same direction as 2 -> dropped
        (4, None),                        # NULL -> excluded
        (5, [0.7, 0.74, 0.0, 0.0]),      # 46 deg from both -> kept (cell 0 or 1)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = np.array([base1, base2])
    kept = {r["vec_id"]: r["cell"] for r in SIM.semdedup(df, cents, threshold=0.95).collect()}
    assert set(kept) == {0, 2, 5}
    assert kept[0] == 0 and kept[2] == 1


def test_semdedup_dominator_chain_not_cc(spark):
    """Chain a~b, b~c with a!~c: the greedy dominator sweep drops BOTH b
    and c (b dominated by a, c by b) — per-cluster greedy semantics, not
    connected components."""
    import math

    def v(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    df = spark.createDataFrame(
        [(1, v(0)), (2, v(25)), (3, v(50))], "vec_id long, embedding array<double>"
    )
    cents = np.array([[1.0, 0.0]])  # single cell
    t = math.cos(math.radians(30))  # cos25 >= t > cos50
    kept = [r["vec_id"] for r in SIM.semdedup(df, cents, threshold=t).collect()]
    assert kept == [1]


# ---------------------------------------------------------------------------
# distributed Lloyd k-means
# ---------------------------------------------------------------------------
def _planted(spark, per=30, dim=8):
    """3 well-separated clusters at e0*10, e1*10, e2*10 + tiny offsets.
    Clusters are CONTIGUOUS id blocks so the deterministic stride
    seeding starts with one seed per planted cluster (interleaved ids
    would hand Lloyd three seeds in one cluster — a genuine local
    optimum, not a bug)."""
    rows = []
    for i in range(per * 3):
        c = i // per
        v = [0.0] * dim
        v[c] = 10.0
        v[(c + 3) % dim] = (i % 7) * 0.01  # deterministic jitter
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_planted_clusters(spark):
    from log_analysis_spark.operators.similarity import kmeans

    df = _planted(spark)
    assigned, cents = kmeans(df, k=3, iters=4, deterministic=False)
    rows = assigned.collect()
    # every planted cluster maps to exactly one k-means label
    by_true = {}
    for r in rows:
        by_true.setdefault(r["vec_id"] // 30, set()).add(r["_c"])
    assert all(len(s) == 1 for s in by_true.values())
    assert len({next(iter(s)) for s in by_true.values()}) == 3
    assert cents.shape == (3, 8)


def test_kmeans_det_equals_fast_assignments(spark):
    from log_analysis_spark.operators.similarity import kmeans

    df = _planted(spark)
    a_det, _ = kmeans(df, k=3, iters=3, deterministic=True)
    a_fast, _ = kmeans(df, k=3, iters=3, deterministic=False)
    d = {r["vec_id"]: r["_c"] for r in a_det.collect()}
    f = {r["vec_id"]: r["_c"] for r in a_fast.collect()}
    assert d == f  # separated data: summation order can't flip any argmin


def test_kmeans_empty_cluster_keeps_seed(spark):
    from log_analysis_spark.operators.similarity import kmeans

    # k=4 over 3 planted clusters: at least one centroid goes empty and
    # must keep its previous position instead of becoming NaN
    df = _planted(spark, per=20)
    assigned, cents = kmeans(df, k=4, iters=3, deterministic=True)
    import numpy as np

    assert not np.isnan(cents).any()
    assert assigned.filter("_c IS NULL").count() == 0


def test_kmeans_empty_input_raises(spark):
    import pytest as _pt

    from log_analysis_spark.operators.similarity import kmeans

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with _pt.raises(ValueError):
        kmeans(df, k=2)


def test_kmeans_arrow_equals_expression_path(spark):
    """arrow=True (BLAS partials + argmin) must produce the same
    assignments as the expression path on separated data."""
    from log_analysis_spark.operators.similarity import kmeans

    df = _planted(spark)
    a_fast, c_fast = kmeans(df, k=3, iters=3, deterministic=False)
    a_arrow, c_arrow = kmeans(df, k=3, iters=3, arrow=True)
    f = {r["vec_id"]: r["_c"] for r in a_fast.collect()}
    a = {r["vec_id"]: r["_c"] for r in a_arrow.collect()}
    assert a == f
    import numpy as np

    assert np.allclose(c_fast, c_arrow, rtol=1e-12)


def test_kmeans_det_and_arrow_exclusive(spark):
    import pytest as _pt

    from log_analysis_spark.operators.similarity import kmeans

    df = _planted(spark, per=5)
    with _pt.raises(ValueError):
        kmeans(df, k=2, deterministic=True, arrow=True)


def test_ann_rerank_improves_recall_over_raw_adc(spark):
    """Retrieve-then-rerank on a planted-neighbor fixture built to stress
    ADC ORDERING (not retrieval): 10 true neighbors at cos 0.90, 30
    decoys at cos 0.85 — a margin a single-subspace 8-code PQ cannot
    rank reliably — with k'=80 of 200 retrieved so the truth is always
    IN the candidate set. Raw ADC top-10 misplaces true neighbors below
    decoys; ann_rerank's exact cosine over the bounded candidate join
    recovers them: recall@10 never decreases per query and strictly
    improves summed over the three seeds (0.9 -> 1.0 on each, verified
    deterministic)."""
    raw_sum = rer_sum = 0.0
    for seed in (7, 77, 123):
        rng = np.random.default_rng(seed)
        dim = 64
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        rows, truth, vid = [], set(), 0

        def mix(cos):
            r = rng.standard_normal(dim)
            r -= (r @ base) * base
            r /= np.linalg.norm(r)
            v = cos * base + np.sqrt(1 - cos * cos) * r
            return [float(x) for x in v]

        for _ in range(10):
            rows.append((vid, mix(0.90)))
            truth.add(vid)
            vid += 1
        for _ in range(30):
            rows.append((vid, mix(0.85)))
            vid += 1
        for _ in range(160):
            v = rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = SIM.ivf_centroids(corpus, n_centroids=8, lloyd_iters=0)
        books = SIM.pq_codebooks(corpus, m=1, n_codes=8)
        q = [float(x) for x in base]
        cand = SIM.ivfpq_topk(corpus, q, cents, books, k=80, n_probe=8)
        raw10 = {r["vec_id"] for r in cand.limit(10).collect()}
        rer10 = {r["vec_id"] for r in SIM.ann_rerank(corpus, cand, q, k=10).collect()}
        raw_r, rer_r = len(raw10 & truth) / 10.0, len(rer10 & truth) / 10.0
        assert rer_r >= raw_r, (seed, raw_r, rer_r)
        raw_sum += raw_r
        rer_sum += rer_r
    assert rer_sum > raw_sum  # exact re-ranking strictly beats raw ADC
    assert rer_sum / 3 >= 0.9


def test_ann_rerank_equals_brute_force_when_candidates_cover(planted, spark):
    """With the candidate set = the whole corpus, ann_rerank IS
    brute_force_topk (same scores, same lowest-id tiebreak)."""
    corpus, vecs, _ = planted
    q = [float(x) for x in vecs[0]]
    all_ids = corpus.select("vec_id")
    got = [(r["vec_id"], r["cos_sim"]) for r in SIM.ann_rerank(corpus, all_ids, q, k=10).collect()]
    want = [(r["vec_id"], r["cos_sim"]) for r in SIM.brute_force_topk(corpus, q, k=10).collect()]
    assert got == want


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection
# --------------------------------------------------------------------------


def test_random_project_matches_python_fold_bitwise(spark, emb):
    """Each projected component equals the driver-side left-fold dot with
    the same matrix row, bit for bit (same IEEE order — np.dot would
    not be)."""
    m = SIM.projection_matrix(64, out_dim=4, seed=101)
    sample = emb.orderBy("vec_id").limit(5).collect()
    got = {
        r["vec_id"]: r["rp"]
        for r in SIM.random_project(
            emb.orderBy("vec_id").limit(5), m, vec_col="embedding"
        ).collect()
    }
    for row in sample:
        want = [SIM._fold_dot(row["embedding"], m[j]) for j in range(4)]
        assert got[row["vec_id"]] == want  # exact equality, not approx


def test_random_project_preserves_distances(spark, emb):
    """JL property on the real corpus: squared-distance ratios after a
    64 -> 32 projection stay within a loose (1 ± 0.5) band for every
    sampled pair (fixed seed -> deterministic draw; the theoretical eps
    at this out_dim is far tighter in expectation)."""
    m = SIM.projection_matrix(64, out_dim=32, seed=101)
    rows = (
        SIM.random_project(emb, m, vec_col="embedding")
        .orderBy("vec_id")
        .limit(20)
        .collect()
    )
    import numpy as np

    for i in range(0, 18, 3):
        a, b = rows[i], rows[i + 1]
        d_orig = float(
            np.sum((np.array(a["embedding"]) - np.array(b["embedding"])) ** 2)
        )
        d_proj = float(np.sum((np.array(a["rp"]) - np.array(b["rp"])) ** 2))
        assert d_orig > 0
        ratio = d_proj / d_orig
        assert 0.5 < ratio < 1.5, (a["vec_id"], b["vec_id"], ratio)


def test_random_project_topk_recall_on_planted(spark, planted):
    """Ranking survives the projection where there is real locality to
    preserve: on the planted-neighbor corpus (cos ~0.99 copies vs ~0.3
    random bulk) the projected-space 32-dim exact top-10 recovers >= 9
    of each base query's 10 planted neighbors. (On the UNPLANTED random
    corpus this is meaningless — the raw top-10 gaps are smaller than
    any projection's distortion, the same reason the LSH/IVF recall
    tests use this fixture.)"""
    corpus, vecs, truth = planted
    m = SIM.projection_matrix(64, out_dim=32, seed=101)
    proj = SIM.random_project(corpus, m, vec_col="embedding").select(
        "vec_id", "rp"
    )
    for b, want_ids in truth.items():
        q32 = [SIM._fold_dot(vecs[b], m[j]) for j in range(32)]
        got = {
            r["vec_id"]
            for r in SIM.brute_force_topk(proj, q32, k=11, vec_col="rp").collect()
        } - {b}
        assert len(got & want_ids) >= 9, (b, sorted(got))


# ---------------------------------------------------------------------------
# MMR diversified rerank
# ---------------------------------------------------------------------------
def _mmr_fixture(spark):
    """3 tight near-duplicate clusters near the query + singletons. Pure
    relevance ranking would fill top slots with clones of cluster A; MMR
    must interleave clusters."""
    import math

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    q = [1.0, 0.0, 0.0, 0.0]
    rows = []
    # cluster A: 4 clones, relevant, +y tilt (NOT at q: if clones sat on q,
    # sim(d, selected) ~ rel(d) for every candidate and MMR degenerates)
    for i in range(4):
        rows.append((10 + i, unit([0.90, 0.44, 0.001 * i, 0.0])))
    # cluster B: 3 clones, equally relevant, -y tilt (far from A)
    for i in range(3):
        rows.append((20 + i, unit([0.90, -0.44, 0.0, 0.001 * i])))
    # cluster C: 2 clones, z direction
    for i in range(2):
        rows.append((30 + i, unit([0.85, 0.0, 0.53, 0.001 * i])))
    # far-away noise
    rows.append((40, unit([0.0, 0.0, 0.0, 1.0])))
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], ["vec_id", "embedding"]
    ), q


def test_mmr_diversifies_across_clusters(spark):
    df, q = _mmr_fixture(spark)
    got = SIM.mmr_rerank(df, q, k=3, n_candidates=10, lam=0.5).collect()
    picked = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])]
    # rank 1 = most relevant (an A clone); ranks 2-3 must leave cluster A
    assert picked[0] == 10
    clusters = [p // 10 for p in picked]
    assert len(set(clusters)) == 3, f"expected 3 distinct clusters, got {picked}"


def test_mmr_lam1_is_pure_relevance(spark, emb):
    import math

    q = [r for r in emb.filter(F.col("vec_id") == 0).collect()][0]["embedding"]
    got = SIM.mmr_rerank(emb, q, k=5, n_candidates=20, lam=1.0).collect()
    rel = SIM.brute_force_topk(emb, q, k=5).collect()
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        r["vec_id"] for r in rel
    ]
    for r in got:
        assert math.isclose(r["mmr_score"], r["rel"], rel_tol=0, abs_tol=0)


def test_mmr_k_exceeds_candidates(spark):
    df, q = _mmr_fixture(spark)
    got = SIM.mmr_rerank(df, q, k=50, n_candidates=4, lam=0.5).collect()
    assert len(got) == 4  # bounded by the candidate set
    assert sorted(r["rank"] for r in got) == [1, 2, 3, 4]


def test_mmr_deterministic(spark, emb):
    q = [r for r in emb.filter(F.col("vec_id") == 0).collect()][0]["embedding"]
    a = [(r["vec_id"], r["mmr_score"]) for r in SIM.mmr_rerank(emb, q, k=6).collect()]
    b = [(r["vec_id"], r["mmr_score"]) for r in SIM.mmr_rerank(emb.repartition(7), q, k=6).collect()]
    assert a == b
