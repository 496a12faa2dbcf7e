"""Dedup operator tests: exact groups from the synth spec, sketch recall
vs the exact oracle, determinism of fingerprints."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from log_analysis_spark.operators import dedup as DD
from log_analysis_spark.synth import EXACT_DUP_MOD, gen_pages_local

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_df(spark):
    pdf = gen_pages_local(2000).reset_index().rename(columns={"index": "pid"})
    return spark.createDataFrame(pdf[["pid", "url", "text", "lang"]])


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_exact_dedup_finds_constructed_dups(spark, pages_df):
    """synth guarantees text(id) == text(id-1) when id % 41 == 40."""
    groups = DD.exact_dup_groups(pages_df, "pid", "text").collect()
    dup_keepers = {r["keep_id"] for r in groups}
    expected_pairs = [
        (i - 1, i) for i in range(1, 2000) if i % EXACT_DUP_MOD == EXACT_DUP_MOD - 1
    ]
    assert expected_pairs, "spec should place dups in 2000 rows"
    for a, _b in expected_pairs:
        # near-dup chains can merge groups; keeper must be <= a
        assert any(k <= a for k in dup_keepers)
    total = DD.exact_dedup(pages_df, "pid", "text").agg(F.sum("group_size")).first()[0]
    assert total == 2000  # partition of the input, nothing lost


def test_exact_dedup_survivors_distinct(spark, pages_df):
    d = DD.exact_dedup(pages_df, "pid", "text")
    assert d.count() == d.select("h").distinct().count()


def _exact_pairs_global(spark, docs, threshold):
    """Unblocked exact Jaccard oracle (single constant block)."""
    blocked = docs.withColumn("one", F.lit(1))
    return {
        (r["id_a"], r["id_b"])
        for r in DD.ngram_jaccard_pairs(
            blocked, "doc_id", "text", block_col="one", n=3, threshold=threshold
        ).collect()
    }


def test_minhash_lsh_recall_and_precision(spark, docs):
    exact = _exact_pairs_global(spark, docs, 0.8)
    lsh = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_pairs(
            docs, "doc_id", "text", num_perm=64, bands=16, n=3, threshold=0.8
        ).collect()
    }
    # exact-verification step => no false positives
    assert lsh <= exact
    # banding at r=4,b=16 catches s>=0.8 pairs with P ~ 1-(1-0.41)^16 ~ 1.0
    if exact:
        assert len(lsh & exact) / len(exact) >= 0.9


def test_minhash_signatures_deterministic(spark, docs):
    sig = DD.minhash_signatures(docs, "doc_id", "text", num_perm=16)
    a = {r["_id"]: r["_sig"] for r in sig.collect()}
    b = {r["_id"]: r["_sig"] for r in sig.collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())


def test_simhash_deterministic_and_discriminative(spark, docs):
    fp = docs.select("doc_id", DD.simhash(F.col("text")).alias("f"))
    vals = {r["doc_id"]: r["f"] for r in fp.collect()}
    assert len(set(vals.values())) > len(vals) // 2  # mostly distinct fingerprints
    again = {r["doc_id"]: r["f"] for r in fp.collect()}
    assert vals == again


def test_simhash_near_dup_hamming_small(spark):
    pdf = pd.DataFrame(
        {
            "pid": [0, 1, 2],
            "text": [
                "the quick brown fox jumps over the lazy dog again and again today",
                "the quick brown fox jumps over the lazy dog again and again tonight",
                "completely unrelated words about spark shuffle partitions and skew",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_pairs(
            df, "pid", "text", max_hamming=64, allow_partial_recall=True
        ).collect()
    }
    assert pairs[(0, 1)] < pairs.get((0, 2), 64)
    assert pairs[(0, 1)] < pairs.get((1, 2), 64)


def test_embedding_neardup_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in DD.embedding_neardup_pairs(
            emb, "vec_id", "embedding", block_col="label", threshold=0.3
        ).collect()
    }
    pdf = emb.toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples()}
    labels = {r.vec_id: r.label for r in pdf.itertuples()}
    expected = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if labels[a] != labels[b]:
                continue
            va, vb = vecs[a], vecs[b]
            c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if c >= 0.3:
                expected[(a, b)] = c
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == pytest.approx(expected[k], abs=1e-9)


def test_dup_clusters_multi_hop_chain(spark):
    """Connected components must merge A-B, B-C, C-D into one cluster
    labeled min(A) even though A and D share no pair (needs >1 propagation
    iteration), while singletons keep their own label."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 10, 20]})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [2, 3, 1], "id_b": [3, 4, 2]})
    )
    got = {
        r["_id"]: r["_label"]
        for r in DD.dup_clusters(docs, "doc_id", pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 20: 20}


def test_dedup_keep_best_picks_highest_score(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 9], "q": [0.1, 0.9, 0.9, 0.5]})
    )
    pairs = spark.createDataFrame(pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]}))
    clusters = DD.dup_clusters(docs, "doc_id", pairs)
    kept = {
        r["_id"]: r["_keep"]
        for r in DD.dedup_keep_best(docs, clusters, "doc_id", "q").collect()
    }
    # cluster {1,2,3}: best score 0.9 tie -> min id 2; singleton 9 keeps itself
    assert kept == {1: False, 2: True, 3: False, 9: True}


def test_dup_clusters_star_matches_plain_and_handles_deep_chains(spark):
    """large-star/small-star must (a) agree with min-propagation on random
    graphs and (b) resolve a 64-node path — diameter 63, far beyond plain
    propagation's round budget — in its O(log n) rounds."""
    # (b) deep chain: 0-1-2-...-63 in one component labeled 0
    chain_ids = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(64))}))
    chain_pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": list(range(63)), "id_b": list(range(1, 64))})
    )
    got = {
        r["_id"]: r["_label"]
        for r in DD.dup_clusters_star(chain_ids, "doc_id", chain_pairs, max_iter=10).collect()
    }
    assert got == {i: 0 for i in range(64)}

    # (a) random sparse graph: equality with the plain propagation result
    rng = np.random.default_rng(3)
    n = 60
    ids = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(n))}))
    a = rng.integers(0, n, size=40)
    b = rng.integers(0, n, size=40)
    mask = a != b
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": a[mask].tolist(), "id_b": b[mask].tolist()})
    )
    star = {
        r["_id"]: r["_label"] for r in DD.dup_clusters_star(ids, "doc_id", pairs).collect()
    }
    plain = {
        r["_id"]: r["_label"] for r in DD.dup_clusters(ids, "doc_id", pairs, max_iter=60).collect()
    }
    assert star == plain


def test_winnowing_guarantee_and_short_doc_domain(spark):
    """Winnowing's defining property (Schleimer 2003): any shared run of
    >= k+w-1 tokens produces at least one shared selected fingerprint.
    Docs shorter than k+w-1 tokens have an empty fingerprint set."""
    import pandas as pd

    from log_analysis_spark.operators.dedup import (
        winnow_pairs,
        winnowed_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = k+w-1
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    f"one unrelated prefix {shared} tail tokens here",
                    f"{shared} totally different suffix material now",
                    "no overlap with anything else at all whatsoever",
                    "tiny doc",  # < k+w-1 tokens -> empty fingerprint set
                ],
            }
        )
    )
    fps = {r["_id"]: list(r["_fps"]) for r in winnowed_fingerprints(df, "doc_id", "text").collect()}
    assert fps[4] == []
    assert set(fps[1]) & set(fps[2])  # the guarantee
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_pairs(df, "doc_id", "text", min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p and 4 not in p for p in pairs)


# --- incremental (cross-snapshot) dedup -------------------------------------
def _inc_fixture(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (2, "spark engines shuffle data between executors by key"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),        # exact dup
            (3, "the quick brown fox jumps over the lazy dog today"),  # jac 7/8
            (5, "a wholly novel document mentioning nothing seen before"),
            (7, "a wholly novel document mentioning nothing seen before"),  # batch-internal dup
        ],
        "doc_id long, text string",
    )
    return corpus, batch


def test_dedup_against_exact_and_near(spark):
    corpus, batch = _inc_fixture(spark)
    handles = []
    surv = DD.dedup_against(
        batch, corpus, "doc_id", "text", threshold=0.8, unpersist_handles=handles
    )
    ids = sorted(r["doc_id"] for r in surv.collect())
    # 1 dropped by exact hash; 3 dropped by near-dup (jaccard 7/8 = 0.875);
    # batch-internal dups 5 and 7 BOTH survive (ingest gate contract)
    assert ids == [5, 7]
    assert len(handles) == 2
    for h in handles:
        h.unpersist()


def test_dedup_against_exact_only(spark):
    corpus, batch = _inc_fixture(spark)
    surv = DD.dedup_against(batch, corpus, "doc_id", "text", threshold=None)
    ids = sorted(r["doc_id"] for r in surv.collect())
    assert ids == [3, 5, 7]  # near-dup survives the exact-only gate
    # all original columns ride through
    assert surv.columns == ["doc_id", "text"]


def test_dedup_against_bloom_prefilter_identical(spark):
    """The Bloom ingest-gate prefilter must not change the result set —
    no false negatives means definite-new rows really are new, and
    maybe-rows still pass the exact anti-join. Checked for both the
    exact-only and the near-dup gate."""
    corpus, batch = _inc_fixture(spark)
    for thr in (None, 0.5):
        plain = sorted(
            r["doc_id"]
            for r in DD.dedup_against(
                batch, corpus, "doc_id", "text", threshold=thr, hash_fn="md5"
            ).collect()
        )
        bloomed = sorted(
            r["doc_id"]
            for r in DD.dedup_against(
                batch, corpus, "doc_id", "text", threshold=thr, hash_fn="md5",
                bloom_m_bits=1 << 10, bloom_k=4,
            ).collect()
        )
        assert bloomed == plain


def test_containment_detects_quote_subset(spark):
    """A short doc embedded verbatim in a long one: high containment
    short->long, low Jaccard, low containment long->short."""
    short = "alpha beta gamma delta epsilon zeta eta theta"
    long = (
        "intro words before the quote begins now " + short +
        " and then a very long tail of unrelated filler tokens " +
        " ".join(f"w{i}" for i in range(60))
    )
    d = spark.createDataFrame(
        [(1, short, "b"), (2, long, "b"), (3, "totally different stuff here", "b")],
        "doc_id long, text string, blk string",
    )
    pairs = DD.containment_pairs(
        d, "doc_id", "text", block_col="blk", n=3, threshold=0.9
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["containment"] == 1.0
    jac = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", block_col="blk", n=3, threshold=0.5
    ).collect()
    assert jac == []  # Jaccard misses what containment catches


def test_containment_banded_recall_parity_and_cross_block(spark):
    """The block-key-free (posting-join) mode finds every pair the blocked
    form finds when the planted pairs share the block (recall parity), PLUS
    the cross-block quote the blocked form misses by construction."""
    quote = "alpha beta gamma delta epsilon zeta eta theta"
    container = (
        "intro words before the quote begins now " + quote +
        " and a long tail " + " ".join(f"w{i}" for i in range(40))
    )
    other_blk_container = (
        "different preamble here then " + quote + " closing remarks follow " +
        " ".join(f"x{i}" for i in range(40))
    )
    d = spark.createDataFrame(
        [
            (1, quote, "en"),
            (2, container, "en"),
            (3, other_blk_container, "de"),  # blocked-on-lang form CANNOT see 1->3
            (4, "totally unrelated filler content words", "en"),
        ],
        "doc_id long, text string, blk string",
    )
    blocked = {
        (r["id_a"], r["id_b"], r["containment"])
        for r in DD.containment_pairs(
            d, "doc_id", "text", block_col="blk", n=3, threshold=0.9
        ).collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["containment"])
        for r in DD.containment_pairs(
            d, "doc_id", "text", block_col=None, n=3, threshold=0.9
        ).collect()
    }
    assert blocked == {(1, 2, 1.0)}
    assert banded == {(1, 2, 1.0), (1, 3, 1.0)}  # superset: cross-block found
    assert blocked <= banded  # recall parity on within-block pairs


def test_containment_banded_max_posting_guard(spark):
    """max_posting drops only boilerplate-hot shingles from candidate
    generation: a pair whose shared shingles include a RARE one survives
    the guard; a pair whose ONLY shared shingle is the ubiquitous one is
    (deliberately, documentedly) pruned."""
    boiler = "one two three"  # one 3-shingle, planted in 7 docs -> hot
    rows = [(i, boiler + f" uniq{i} only{i} here{i}") for i in range(1, 6)]
    rows.append((10, boiler))  # doc 10's ENTIRE shingle set is the hot one
    rows.append((11, boiler + " plus a unique eleven tail"))  # contains 10
    quote = "rare alpha beta gamma delta epsilon"
    rows.append((6, quote))
    rows.append((7, quote + " with container tail words following"))
    d = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(**kw):
        return {
            (r["id_a"], r["id_b"])
            for r in DD.containment_pairs(
                d, "doc_id", "text", n=3, threshold=0.9, **kw
            ).collect()
        }

    full, guarded = pairs(), pairs(max_posting=3)
    assert (6, 7) in full and (10, 11) in full
    assert (6, 7) in guarded          # rare shared shingles -> still found
    assert (10, 11) not in guarded    # hot-shingle-only pair -> pruned
    assert guarded <= full            # guard only ever removes pairs


def test_hamming_join_and_fingerprint_gate(spark):
    """Cross-relation pigeonhole: batch fp within max_hamming of any
    corpus fp is matched (and gated); others survive. Planted: b1 == c1
    (hamming 0), b2 = c2 with 3 low bits flipped (hamming 3), b3 far
    from everything."""
    from log_analysis_spark.operators.dedup import fingerprint_gate, hamming_join

    c1, c2 = 0x0123456789ABCDEF, -6148914691236517206  # 0xAAAA... signed; ham(c1,c2)=32
    corpus = spark.createDataFrame(
        [("c1", c1), ("c2", c2)], "url string, fingerprint long"
    )
    batch = spark.createDataFrame(
        [("b1", c1), ("b2", c2 ^ 0b111), ("b3", 0x5555AAAA5555AAAA)],
        "url string, fingerprint long",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_join(
            batch, corpus, "url", "fingerprint", max_hamming=3, n_chunks=4
        ).collect()
    }
    assert pairs == {("b1", "c1"): 0, ("b2", "c2"): 3}
    kept = sorted(
        r["url"]
        for r in fingerprint_gate(
            batch, corpus, "url", "fingerprint", max_hamming=3, n_chunks=4
        ).collect()
    )
    assert kept == ["b3"]


def test_fp_index_gate_identity_and_pruning(spark, tmp_path):
    """The materialized chunk index gate is result-identical to the
    ad-hoc fingerprint_gate, and the index scan carries PartitionFilters
    on (ci, _b) — unprobed chunk-bucket directories are never read."""
    import numpy as np

    from log_analysis_spark.operators.dedup import (
        fingerprint_gate,
        fingerprint_gate_indexed,
        write_fp_index,
    )

    rng = np.random.default_rng(71)
    def fps(n, seed):
        r = np.random.default_rng(seed)
        return [int(x) for x in r.integers(-(2**63), 2**63, size=n, dtype=np.int64)]

    corpus_fps = fps(40, 1)
    batch_fps = fps(10, 2) + [corpus_fps[3] ^ 0b11, corpus_fps[7]]  # planted hits
    corpus = spark.createDataFrame(
        [(f"c{i}", v) for i, v in enumerate(corpus_fps)], "url string, fingerprint long"
    )
    batch = spark.createDataFrame(
        [(f"b{i}", v) for i, v in enumerate(batch_fps)], "url string, fingerprint long"
    )
    idx = str(tmp_path / "fp_idx")
    write_fp_index(corpus, idx, "url", "fingerprint", n_chunks=8, n_buckets=4)
    indexed = fingerprint_gate_indexed(
        spark, batch, idx, "url", "fingerprint", max_hamming=7, n_chunks=8, n_buckets=4
    )
    adhoc = fingerprint_gate(
        batch, corpus, "url", "fingerprint", max_hamming=7, n_chunks=8
    )
    got = sorted(r["url"] for r in indexed.collect())
    want = sorted(r["url"] for r in adhoc.collect())
    assert got == want and "b10" not in got and "b11" not in got
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ci" in plan and "_b" in plan


def test_duplicate_span_attributes_islands_and_offsets(spark):
    from log_analysis_spark.operators.dedup import duplicate_span_attributes

    rows = [
        (1, "a b c d e f g h"),
        (2, "x x a b c d y z c d e f zz"),  # two separated dup runs vs doc 1
        (3, "unrelated words only here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["start"], r["end"]): r["n_windows"]
        for r in duplicate_span_attributes(df, k=3, hash_fn="md5").collect()
    }
    # doc 1: windows 0..3 all duplicated -> one maximal span "a b c d e f"
    assert got == {
        (1, 0, 11): 4,
        (2, 4, 11): 2,   # "a b c d" at char 4 of the normalized text
        (2, 16, 23): 2,  # "c d e f" after the separating 'y z'
    }


def test_duplicate_span_attributes_adjacent_windows_merge(spark):
    from log_analysis_spark.operators.dedup import duplicate_span_attributes

    # dup windows at 0 and 3 touch exactly ([0,3) + [3,6)): one span
    rows = [(1, "p q r s t u"), (2, "p q r zz s t u")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["doc_id"], r["start"], r["end"])
        for r in duplicate_span_attributes(df, k=3, hash_fn="md5").collect()
    )
    # doc1: dup windows "p q r"(0) and "s t u"(3) merge into [0, 11)
    assert (1, 0, 11) in got


def test_duplicate_span_attributes_no_dups_is_empty(spark):
    from log_analysis_spark.operators.dedup import duplicate_span_attributes

    df = spark.createDataFrame(
        [(1, "all unique words here"), (2, "totally different content now")],
        ["doc_id", "text"],
    )
    assert duplicate_span_attributes(df, k=3, hash_fn="md5").count() == 0


def test_prefix_jaccard_exact_recall_vs_all_pairs(spark, docs):
    """PPJoin prefix filtering equals the unblocked all-pairs ground
    truth EXACTLY — same pairs AND same jaccard values (no LSH
    probability, no block key to get wrong)."""
    handles: list = []
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.prefix_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8, unpersist_handles=handles
        ).collect()
    }
    want = _exact_pairs_global(spark, docs, 0.8)
    assert set(got) == want and len(want) > 0
    for h in handles:
        h.unpersist()


def test_prefix_jaccard_hot_token_excluded_from_index(spark):
    """The prefix index keeps each doc's RAREST shingles: a boilerplate
    shingle present in every doc never enters any prefix (at t=0.8 and
    these sizes), so the candidate join stays skew-free — yet the pair
    that IS a near-dup is still found through its rare shared shingle."""
    import pandas as pd

    # every doc shares the 'accept all cookies' shingle; docs 1 and 2
    # additionally share almost everything else (J >= 0.8)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base + " accept all cookies"),
        (2, base + " accept all cookies"),  # exact dup of 1
        (3, "one two three four five six seven accept all cookies"),
        (4, "red green blue cyan teal plum gray accept all cookies"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.prefix_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    assert got == {(1, 2)}


def test_prefix_jaccard_threshold_one_and_short_docs(spark):
    """t=1.0 (prefix length exactly 1) still finds exact-set dups;
    docs shorter than n tokens never pair."""
    import pandas as pd

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "tiny doc"),
        (4, "tiny doc"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.prefix_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=1.0
        ).collect()
    }
    assert got == {(1, 2): 1.0}


# ---------------------------------------------------------------------------
# edit-distance pairs (Ed-Join prefix filtering)
# ---------------------------------------------------------------------------
def _ed_all_pairs(strings, d):
    """Unblocked ground truth via Python DP levenshtein."""
    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    ss = sorted(set(s for s in strings if s))
    out = set()
    for i, a in enumerate(ss):
        for b in ss[i + 1:]:
            dd = lev(a, b)
            if dd <= d:
                out.add((a, b, dd))
    return out


def test_edit_distance_pairs_full_recall_vs_all_pairs(spark):
    strings = [
        "paypal.com", "paypa1.com", "paypall.com", "google.com",
        "goggle.com", "g00gle.com", "example.net", "examp1e.net",
        "totally-unrelated.org", "a.io", "b.io", "",
    ]
    df = spark.createDataFrame([(s,) for s in strings], ["host"])
    got = {
        (r["str_a"], r["str_b"], r["dist"])
        for r in DD.edit_distance_pairs(df, "host", max_dist=1).collect()
    }
    assert got == _ed_all_pairs(strings, 1)
    assert ("paypa1.com", "paypal.com", 1) in got
    assert not any("totally-unrelated.org" in p[:2] for p in got)


def test_edit_distance_pairs_d2_and_short_strings(spark):
    strings = ["ab", "a", "b", "abcd", "abce", "abde", "x"]
    df = spark.createDataFrame([(s,) for s in strings], ["host"])
    got = {
        (r["str_a"], r["str_b"], r["dist"])
        for r in DD.edit_distance_pairs(df, "host", max_dist=2).collect()
    }
    assert got == _ed_all_pairs(strings, 2)
    assert ("a", "ab", 1) in got and ("a", "b", 1) in got


def test_edit_distance_pairs_dedups_input(spark):
    df = spark.createDataFrame([("x.com",)] * 5 + [("y.com",)] * 3, ["host"])
    got = DD.edit_distance_pairs(df, "host", max_dist=1).collect()
    assert len(got) == 1  # one DISTINCT pair, duplicates collapse first
    assert (got[0]["str_a"], got[0]["str_b"]) == ("x.com", "y.com")


def test_edit_distance_prefix_excludes_hot_grams(spark):
    """Every string shares the '.com' suffix grams; the rarest-first prefix
    must still find the one real pair without putting the hot suffix grams
    of DISSIMILAR strings into the same candidate bucket unnecessarily —
    recall stays exact regardless."""
    strings = [f"site{i:04d}.com" for i in range(200)] + ["site0000x.com"]
    df = spark.createDataFrame([(s,) for s in strings], ["host"])
    got = {
        (r["str_a"], r["str_b"])
        for r in DD.edit_distance_pairs(df, "host", max_dist=1).collect()
    }
    expect = {(a, b) for a, b, _ in _ed_all_pairs(strings, 1)}
    assert got == expect
    assert ("site0000.com", "site0000x.com") in got


def test_edit_distance_pairs_randomized_vs_ground_truth(spark):
    """Deterministic pseudo-random corpus over a tiny alphabet (maximizes
    collisions and short/degenerate shapes) vs the unblocked DP ground
    truth, at d=1 and d=2."""
    import random

    rng = random.Random(20260821)
    strings = list({
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
        for _ in range(120)
    })
    df = spark.createDataFrame([(s,) for s in strings], ["host"])
    for d in (1, 2):
        got = {
            (r["str_a"], r["str_b"], r["dist"])
            for r in DD.edit_distance_pairs(df, "host", max_dist=d).collect()
        }
        assert got == _ed_all_pairs(strings, d), f"mismatch at d={d}"
