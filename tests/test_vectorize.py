"""Hashed TF-IDF vector tests (operators/vectorize.py): bit-exact vs a
serial replica, unit norms, NULL contract, bag-of-words invariance, and
the bridge into the similarity stack."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators.vectorize import hashed_tfidf_vectors

DOCS = [
    (0, "spark table join join table"),
    (1, "join table join spark table"),          # same bag, different order
    (2, "spark stream window state checkpoint"),
    (3, ""),                                      # empty -> NULL vec
    (4, "totally unrelated words entirely here"),
]


def _serial(docs, dim):
    def h(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim

    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    dfreq = {}
    for i, ts in toks.items():
        for j in {h(t) for t in ts}:
            dfreq[j] = dfreq.get(j, 0) + 1
    rarity = [float(n) / float(dfreq[j]) if j in dfreq else 0.0 for j in range(dim)]
    out = {}
    for i, ts in toks.items():
        if not ts:
            out[i] = None
            continue
        tf = [0.0] * dim
        for t in ts:
            tf[h(t)] += 1.0
        w = [tf[j] * rarity[j] for j in range(dim)]
        ss = 0.0
        for x in w:
            ss += x * x
        out[i] = [x / math.sqrt(ss) for x in w]
    return out


def test_bit_exact_vs_serial_replica(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (list(r["vec"]) if r["vec"] is not None else None)
        for r in hashed_tfidf_vectors(df, dim=16, hash_fn="md5").collect()
    }
    want = _serial(DOCS, 16)
    assert set(got) == set(want)
    for i in got:
        if want[i] is None:
            assert got[i] is None
        else:
            assert got[i] == want[i], i  # bit-exact contract


def test_unit_norm_and_bag_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    vecs = {
        r["doc_id"]: r["vec"]
        for r in hashed_tfidf_vectors(df, dim=16, hash_fn="md5").collect()
    }
    for i, v in vecs.items():
        if v is not None:
            assert abs(sum(x * x for x in v) - 1.0) < 1e-12
    assert vecs[0] == vecs[1]  # bag-of-words: token order irrelevant


def test_bridges_into_similarity_stack(spark):
    from log_analysis_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    vecs = hashed_tfidf_vectors(df, dim=32, hash_fn="md5").filter(
        F.col("vec").isNotNull()
    )
    qv = list(vecs.filter(F.col("doc_id") == 0).first()["vec"])
    top = brute_force_topk(vecs, qv, k=4, id_col="doc_id", vec_col="vec").collect()
    assert [r["doc_id"] for r in top[:2]] == [0, 1]  # self then identical bag
    assert top[0]["cos_sim"] == pytest.approx(1.0, abs=1e-12)
    assert top[1]["cos_sim"] == pytest.approx(1.0, abs=1e-12)
    sims = {r["doc_id"]: r["cos_sim"] for r in top}
    assert all(sims[j] < 0.5 for j in sims if j not in (0, 1))
