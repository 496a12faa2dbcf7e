"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline; random-hyperplane LSH and an
IVF-style coarse quantizer are the scale paths (bucket-pruned search: the
query probes a handful of buckets instead of scanning 10^12 vectors).

All scoring is native Column math (deterministic double folds, bit-stable —
see dedup.cosine_sim); the only Python is driver-side constant generation
for hyperplanes/centroids (seeded numpy, shipped as literals/broadcast).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_sim


def _vec_lit(v) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _fold_dot(a, b) -> float:
    """Driver-side dot as a left-to-right IEEE double fold — bit-identical
    to the engine-side folds (Spark ``aggregate``, DuckDB ``list_reduce``).
    np.dot would NOT be: BLAS uses pairwise/SIMD summation whose rounding
    can differ, which would flip sign decisions near 0 and break oracle
    parity of bucket assignments."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def brute_force_topk(
    df: DataFrame, query_vec, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k vs one query vector.

    Map-side score + global ``ORDER BY ... LIMIT k``: Spark's TakeOrdered
    keeps a per-partition k-heap and merges k*partitions rows on the driver
    — no full sort, no full shuffle; scales linearly in rows scanned.
    """
    q = _vec_lit(query_vec)
    return (
        df.select(
            F.col(id_col),
            cosine_sim(F.col(vec_col), q).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def hyperplane_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id: bit i = 1 iff dot(plane_i, v) > 0. Native fold
    per plane; n_planes * dim multiplies per row, zero Python."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(vec, _vec_lit(p), lambda x, y: x.cast("double") * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_probe_set(query_vec, planes: np.ndarray, probe_hamming: int = 1) -> list[int]:
    """Bucket ids within ``probe_hamming`` bit flips of the query's sign-LSH
    bucket — the multi-probe recall knob (probe count grows as sum of
    C(n_planes, h) for h <= probe_hamming: 1, 1+n, 1+n+n(n-1)/2, ...).
    Sign decisions are driver-side left folds, so the probe set is
    replayable by an oracle."""
    n_planes = len(planes)
    qbucket = 0
    for i, p in enumerate(planes):
        if _fold_dot(query_vec, p) > 0:
            qbucket |= 1 << i
    probe = [qbucket]
    if probe_hamming >= 1:
        probe += [qbucket ^ (1 << i) for i in range(n_planes)]
    if probe_hamming >= 2:
        probe += [
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    if probe_hamming >= 3:
        raise ValueError("probe_hamming > 2 not supported (probe set explodes)")
    return probe


def lsh_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``probe_hamming`` bits of the query's bucket (``lsh_probe_set`` — the
    measured recall-vs-probes curve lives in tests/test_similarity.py).

    At 10^12 vectors the bucketed table is written partitioned by bucket id
    (partition pruning turns the probe into reading ~(1+n_planes) buckets);
    here the same pruning is a filter that Catalyst pushes to the scan.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    probe = lsh_probe_set(query_vec, planes, probe_hamming)
    bucketed = df.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    return (
        bucketed.filter(F.col("_bucket").isin(probe))
        .select(F.col(id_col), cosine_sim(F.col(vec_col), _vec_lit(query_vec)).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def write_lsh_index(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Materialize the sign-LSH index: embeddings written PARTITIONED BY
    bucket id. This is the scale form the ad-hoc ``lsh_topk`` docstring
    promises: at 10^12 vectors a probe reads (1 + n_planes) directories out
    of 2^n_planes instead of recomputing every bucket per query — the
    partition filter prunes at file-listing time, before any IO.
    Returns the hyperplanes (persist them with the index)."""
    dim_row = df.select(F.size(vec_col)).first()
    if dim_row is None:
        raise ValueError("write_lsh_index: empty input")
    planes = hyperplanes(int(dim_row[0]), n_planes, seed)
    bucketed = df.withColumn("_bucket", hyperplane_bucket(F.col(vec_col), planes))
    bucketed.write.mode("overwrite").partitionBy("_bucket").parquet(path)
    return planes


def lsh_topk_indexed(
    spark,
    index_path: str,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k over the materialized LSH index with partition
    pruning: the ``_bucket IN (probe set)`` filter is a partition filter —
    only the probed bucket directories are listed and scanned.
    ``probe_hamming`` (0-2) widens the probe set for recall at the cost of
    proportionally more bucket directories read."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    probe = lsh_probe_set(query_vec, planes, probe_hamming)
    return (
        spark.read.parquet(index_path)
        .filter(F.col("_bucket").isin(probe))
        .select(F.col(id_col), cosine_sim(F.col(vec_col), _vec_lit(query_vec)).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: embeddings written PARTITIONED BY their
    nearest-centroid cell. Probes then prune to n_probe directories."""
    assigned = df.withColumn("_c", nearest_centroid(F.col(vec_col), centroids))
    assigned.write.mode("overwrite").partitionBy("_c").parquet(path)


def ivf_topk_indexed(
    spark,
    index_path: str,
    query_vec,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search over the materialized cell-partitioned index (partition
    pruning on ``_c``), same probe ranking as ``ivf_topk``."""
    probe = probe_cells(query_vec, centroids, n_probe)
    return (
        spark.read.parquet(index_path)
        .filter(F.col("_c").isin(probe))
        .select(F.col(id_col), cosine_sim(F.col(vec_col), _vec_lit(query_vec)).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_centroids(
    df: DataFrame, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding",
    lloyd_iters: int = 1,
) -> np.ndarray:
    """IVF coarse quantizer: deterministic seed vectors (every id ≡ 0 mod
    stride) refined by ``lloyd_iters`` Lloyd iterations computed
    distributively (groupBy(assignment).avg per dimension). Driver holds
    only n_centroids * dim floats.

    ``lloyd_iters=0`` returns the raw seeds — the fully deterministic,
    SQL-replayable quantizer used by the driver's oracle-checked query
    (a Lloyd mean's summation order is partition-dependent, so refined
    centroids can't be replayed bit-exactly by another engine)."""
    n = df.count()
    stride = max(n // n_centroids, 1)
    seeds = (
        df.filter((F.col(id_col) % stride == 0) & (F.col(id_col) / stride < n_centroids))
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    cents = np.array([r[0] for r in seeds], dtype=np.float64)
    if lloyd_iters <= 0:
        return cents
    assigned = df.withColumn("_c", nearest_centroid(F.col(vec_col), cents))
    dim = cents.shape[1]
    sums = assigned.groupBy("_c").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(f"s{i}") for i in range(dim)],
    ).collect()
    out = cents.copy()
    for row in sums:
        c = row["_c"]
        out[c] = np.array([row[f"s{i}"] for i in range(dim)]) / row["_n"]
    return out


def _kmeans_partials_arrow(
    df: DataFrame, centroids: np.ndarray, vec_col: str
) -> list:
    """One Arrow pass: per-batch BLAS argmin assignment + per-cluster
    (count, vector-sum) partials — k*(dim+1) doubles per batch, merged
    on the driver (bounded: partitions x k rows). The large-n_centroids
    twin of the expression-path update, same shape as
    :func:`assign_centroids_arrow`."""
    import pyarrow as pa
    import pyspark.sql.types as T

    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    cc = (cents * cents).sum(axis=1)
    kk, dim = cents.shape

    def _partials(batches):
        for batch in batches:
            tbl = pa.table(batch)
            vecs = tbl[vec_col].to_pylist()
            if not vecs:
                continue
            mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
            a = np.argmin(cc[None, :] - 2.0 * (mat @ cents.T), axis=1)
            ns = np.bincount(a, minlength=kk)
            sums = np.zeros((kk, dim))
            np.add.at(sums, a, mat)
            present = np.nonzero(ns)[0]
            yield pa.record_batch(
                [
                    pa.array(present.astype(np.int32)),
                    pa.array(ns[present].astype(np.int64)),
                    pa.array(list(sums[present])),
                ],
                names=["_c", "_n", "_s"],
            )

    schema = T.StructType(
        [
            T.StructField("_c", T.IntegerType()),
            T.StructField("_n", T.LongType()),
            T.StructField("_s", T.ArrayType(T.DoubleType())),
        ]
    )
    return df.select(vec_col).mapInArrow(_partials, schema=schema).collect()


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    deterministic: bool = False,
    arrow: bool = False,
) -> tuple[DataFrame, np.ndarray]:
    """Distributed Lloyd k-means (fixed iterations) -> (assignments,
    centroids). Assignments are (id, _c) under the FINAL centroids;
    centroids is a (k, dim) float64 array (driver state is k*dim doubles
    — bounded, collected once per iteration like :func:`ivf_centroids`).

    Each iteration is ONE corpus pass: a map-side
    :func:`nearest_centroid` projection (codegen argmin over k literal
    score expressions) into a k-group aggregation. The iterative-ML
    sibling of ``graph.pagerank`` / ``dedup.dup_clusters``, with the
    same determinism contract:

    - ``deterministic=False`` (production): per-dimension associative
      ``sum`` — map-side partials collapse each cluster before the
      k-row shuffle; state is k*(dim+1) doubles per partition.
    - ``deterministic=True`` (the oracle-replay witness): each
      cluster's vector sum is a LEFT FOLD over its id-sorted members
      (zip-add with an exact all-zeros init), and each mean dimension is
      the single division sum/n — every intermediate is a deterministic
      IEEE step DuckDB replays bit-for-bit by unrolling the iterations.
      The fold materializes per-cluster member lists, so this mode is
      for replay/testing scale, not 10^12 rows.

    ``arrow=True`` (the large-k scale path, like ``write_ivfpq_index``'s
    Arrow mode): each iteration is ONE mapInArrow pass doing a BLAS
    argmin per batch plus per-cluster (count, vector-sum) partials —
    k*(dim+1) doubles per batch — merged on the driver; the final
    assignment is :func:`assign_centroids_arrow`. Expression-path argmin
    is codegen-hostile past ~64 centroids; BLAS is microseconds/row at
    4096. Mutually exclusive with ``deterministic`` (BLAS summation
    order is not the fold order); assignments are pinned equal on
    separated data in pytest.

    Seeding: the deterministic stride rule of :func:`ivf_centroids`
    (every id ≡ 0 mod n//k, first k, id-ordered) — replayable, no RNG.
    Empty clusters keep their previous centroid (the standard Lloyd
    convention, and the replay needs it stated: the oracle coalesces).
    Fixed ``iters`` rather than a convergence tolerance so a replay runs
    the identical computation; callers wanting convergence detection
    compare successive centroid arrays on the driver (k*dim doubles).
    """
    if deterministic and arrow:
        raise ValueError("kmeans: deterministic and arrow are exclusive")
    n = df.count()
    if n == 0:
        raise ValueError("kmeans: empty input")
    stride = max(n // k, 1)
    seeds = (
        df.filter((F.col(id_col) % stride == 0) & (F.col(id_col) / stride < k))
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    cents = np.array([r[0] for r in seeds], dtype=np.float64)
    dim = cents.shape[1]

    for _ in range(iters):
        if arrow:
            parts = _kmeans_partials_arrow(df, cents, vec_col)
            merged: dict[int, tuple[int, np.ndarray]] = {}
            for r in parts:
                c = int(r["_c"])
                cnt, sv = merged.get(c, (0, np.zeros(dim)))
                merged[c] = (cnt + int(r["_n"]), sv + np.asarray(r["_s"]))
            nxt = cents.copy()
            for c, (cnt, sv) in merged.items():
                nxt[c] = sv / cnt
            cents = nxt
            continue
        assigned = df.select(
            F.col(id_col),
            F.col(vec_col),
            nearest_centroid(F.col(vec_col), cents).alias("_c"),
        )
        if deterministic:
            zeros = F.array(*([F.lit(0.0).cast("double")] * dim))
            rows = assigned.groupBy("_c").agg(
                F.count(F.lit(1)).alias("_n"),
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(id_col).alias("i"), F.col(vec_col).alias("v")
                            )
                        )
                    ),
                    zeros,
                    lambda acc, s: F.zip_with(
                        acc, s["v"], lambda a, x: a + x.cast("double")
                    ),
                ).alias("_s"),
            ).collect()
            sums = {
                int(r["_c"]): (int(r["_n"]), list(r["_s"]))
                for r in rows
                if r["_c"] is not None  # NULL-vector group updates nothing
            }
        else:
            rows = assigned.groupBy("_c").agg(
                F.count(F.lit(1)).alias("_n"),
                *[
                    F.sum(F.element_at(F.col(vec_col), i + 1).cast("double")).alias(
                        f"s{i}"
                    )
                    for i in range(dim)
                ],
            ).collect()
            sums = {
                int(r["_c"]): (int(r["_n"]), [r[f"s{i}"] for i in range(dim)])
                for r in rows
                if r["_c"] is not None
            }
        nxt = cents.copy()
        for c, (cnt, svec) in sums.items():
            # plain Python division per dimension — the single IEEE step
            # the oracle replays as list_transform(s, x -> x / n)
            nxt[c] = np.array([s / cnt for s in svec], dtype=np.float64)
        cents = nxt

    if arrow:
        return assign_centroids_arrow(df, cents, id_col, vec_col), cents
    out = df.select(
        F.col(id_col), nearest_centroid(F.col(vec_col), cents).alias("_c")
    )
    return out, cents


def nearest_centroid(vec: Column, centroids: np.ndarray) -> Column:
    """argmin_c ||v - c||^2 as native expressions (expanded: c.c - 2 v.c;
    v.v is constant per row and drops out). Ties keep the lowest centroid
    index. c.c is a driver-side left fold (not np.dot) so the score — and
    therefore the assignment — is replayable bit-exactly in SQL.

    Shape matters: each score lives ONCE inside an array of (score, index)
    structs and a single fold picks the argmin. The naive alternative — a
    chain of nested ``when(score_i < best, ...)`` columns — re-inlines
    every score expression into every later branch, and with k centroids
    each scoring a fold over the vector the expression tree grows
    superlinearly (measured 27s -> 1.4s for pq_topk at sf0.1 from this
    change alone; same projection-collapse class as dedup's shingle
    barrier). Strict ``<`` in the fold keeps the FIRST minimal score, i.e.
    the lowest centroid index — identical tiebreak to the when-chain form
    and to the SQL oracle's row_number ordering.

    NULL vectors assign to NULL (not the -1 init sentinel): a NULL
    embedding folds every score to NULL, the fold keeps the init struct,
    and -1 would then flow into downstream 1-based ``element_at`` lookups
    as index 0 — a runtime error. Propagating NULL instead means NULL
    embeddings drop out of ``isin(probe)`` filters and PQ lut sums turn
    NULL, never raise; callers wanting them gone entirely filter
    ``vec IS NOT NULL`` before assignment."""
    pairs = F.array(*[
        F.struct(
            (
                F.lit(_fold_dot(c, c))
                - F.lit(2.0)
                * F.aggregate(
                    F.zip_with(vec, _vec_lit(c), lambda x, y: x.cast("double") * y),
                    F.lit(0.0).cast("double"),
                    lambda acc, v: acc + v,
                )
            ).alias("s"),
            F.lit(ci).alias("i"),
        )
        for ci, c in enumerate(centroids)
    ])
    init = F.struct(
        F.lit(float("inf")).cast("double").alias("s"), F.lit(-1).alias("i")
    )
    best = F.aggregate(
        pairs, init, lambda acc, p: F.when(p["s"] < acc["s"], p).otherwise(acc)
    )
    # best["i"] >= 0 also catches all-NaN vectors (every NaN score loses the
    # `<` comparison, leaving the -1 init) — mapped to NULL, same as NULL vecs
    return F.when(vec.isNotNull() & (best["i"] >= 0), best["i"])


def assign_centroids_arrow(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _c) nearest-centroid assignment via one Arrow-batched matrix
    multiply per batch — the scale path when n_centroids is large.

    ``nearest_centroid`` (Column expressions) is exact/fold-deterministic
    but expands to n_centroids folds per row: ideal at 8-64 cells,
    codegen-hostile at 4096. Here each Arrow batch does a single
    (batch x dim) @ (dim x n_centroids) BLAS multiply + argmin — ~1e9
    mults/s/core, so 4096 cells cost microseconds per row. np.argmin takes
    the FIRST minimum, matching nearest_centroid's lowest-index tiebreak
    (BLAS summation order can differ from the fold in the last ulp, so
    exact tie behavior on equidistant vectors may differ — irrelevant for
    real data, asserted equal on separated data in tests)."""
    import pyarrow as pa

    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    cc = (cents * cents).sum(axis=1)  # ||c||^2 per centroid

    def _assign(batches):
        for batch in batches:
            tbl = pa.table(batch)
            ids = tbl[id_col]
            mat = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in tbl[vec_col].to_pylist()]
            )
            scores = cc[None, :] - 2.0 * (mat @ cents.T)  # ||v-c||^2 - ||v||^2
            assign = np.argmin(scores, axis=1).astype(np.int32)
            yield pa.record_batch(
                [ids.combine_chunks(), pa.array(assign)], names=[id_col, "_c"]
            )

    import pyspark.sql.types as T

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [T.StructField(id_col, id_field.dataType, True), T.StructField("_c", T.IntegerType(), True)]
    )
    return df.select(id_col, vec_col).mapInArrow(_assign, schema=out_schema)


def ivf_topk(
    df: DataFrame,
    query_vec,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: score only vectors assigned to the n_probe centroids
    nearest the query. At scale the assignment is a partition column.
    Probe ranking uses the same c.c - 2 q.c score (q.q drops out) with the
    same fold arithmetic and index tiebreak as ``nearest_centroid``, so an
    oracle can reproduce the probe set exactly."""
    probe = probe_cells(query_vec, centroids, n_probe)
    assigned = df.withColumn("_c", nearest_centroid(F.col(vec_col), centroids))
    return (
        assigned.filter(F.col("_c").isin(probe))
        .select(F.col(id_col), cosine_sim(F.col(vec_col), _vec_lit(query_vec)).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, _q: array<int>, _scale: double) — symmetric int8 scalar
    quantization: q_i = floor(v_i * 127 / max|v| + 0.5).

    At 10^12 embeddings this is the 4x storage/IO compression step
    (float32 -> int8; the per-vector scale rides along as one double).
    floor(x + 0.5) — not round() — because round() half-way semantics
    differ across engines (HALF_UP vs banker's) while floor is universal;
    the whole transform is replayable bit-exactly in SQL. Cosine over
    quantized vectors needs NO dequantization: the per-vector scales cancel
    (cos(a*s1, b*s2) == cos(a, b)), so scoring is integer dots in double
    folds, exact up to 2^53."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(v, lambda x: F.floor(x * F.lit(127.0) / scale + F.lit(0.5)).cast("int"))
    return df.select(
        F.col(id_col).alias("_id"),
        F.when(scale > 0, q).otherwise(F.transform(v, lambda x: F.lit(0))).alias("_q"),
        scale.alias("_scale"),
    )


def quantized_topk(
    df: DataFrame,
    query_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k over int8-quantized vectors, query taken from the table
    by id (in-plan, so an oracle can replay everything). One broadcast of
    the single quantized query row; scoring is a map-side integer-dot
    cosine + TakeOrdered — same linear shape as brute_force_topk at a
    quarter of the scan bytes."""
    from .dedup import cosine_sim

    qz = quantize_vectors(df, id_col, vec_col)
    qrow = qz.filter(F.col("_id") == query_id).select(
        F.col("_q").alias("_qq")
    )
    return (
        qz.crossJoin(F.broadcast(qrow))
        .select(
            F.col("_id").alias(id_col),
            cosine_sim(F.col("_q"), F.col("_qq")).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 3,
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """For each left row, its k nearest right rows by cosine.

    Blocked equi-join when ``block_col`` given (the scale path — block =
    LSH bucket or IVF cell). With ``block_col=None`` a sign-LSH block is
    derived automatically (``hyperplane_bucket`` over ``n_planes`` seeded
    hyperplanes on both sides), which makes the result approximate-kNN but
    keeps the join an equi-join — there is NO cross-join path: a broadcast
    nested-loop over |L|x|R| pairs cannot survive real data sizes.
    Ranking via window over the join output (partial top-k per key).
    Vectors are unit-normalized once per side (aggregation-materialized),
    so each pair costs a single dot product.
    """
    from pyspark.sql.window import Window

    from .dedup import dot_product, normalized_vectors

    if block_col is None:
        # contract note: this makes the result APPROXIMATE kNN (true
        # neighbors hashed into other buckets are missed). Callers who had
        # relied on an exact unblocked path get a visible one-time signal.
        import warnings

        warnings.warn(
            "knn_join: block_col=None auto-derives a sign-LSH block — the "
            "result is approximate kNN (neighbors outside the shared bucket "
            "are missed). Pass an explicit block_col to silence this.",
            stacklevel=2,
        )
        dim_row = left.select(F.size(vec_col)).first()
        if dim_row is None:
            raise ValueError("knn_join: left side is empty; cannot derive LSH block")
        planes = hyperplanes(int(dim_row[0]), n_planes, seed)
        block_col = "_auto_blk"
        left = left.withColumn(block_col, hyperplane_bucket(F.col(vec_col), planes))
        right = right.withColumn(block_col, hyperplane_bucket(F.col(vec_col), planes))

    # block_col is always set past this point (auto-derived above when the
    # caller gave none) — there is deliberately no unblocked fallback, so no
    # refactor can resurrect a |L|x|R| broadcast nested-loop join here.
    extras = [block_col]
    l = normalized_vectors(left, left_id, vec_col, extra_cols=extras)
    l = l.select(F.col("_id").alias("qid"), F.col("_nv").alias("qv"),
                 F.col(block_col).alias("_blk"))
    r = normalized_vectors(right, right_id, vec_col, extra_cols=extras)
    r = r.select(F.col("_id").alias("nid"), F.col("_nv").alias("nv"),
                 F.col(block_col).alias("_blk2"))
    joined = l.join(r, on=[F.col("_blk") == F.col("_blk2"), F.col("qid") != F.col("nid")])
    scored = joined.select(
        "qid", "nid", dot_product(F.col("qv"), F.col("nv")).alias("cos_sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("nid"))
    # long rank: SQL engines type row_number() as BIGINT; int32 here would
    # break value-hash parity with the DuckDB oracle
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# --- product quantization (PQ) ----------------------------------------------
def pq_codebooks(
    df: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, n_codes, d_sub) PQ codebooks (Jegou, Douze, Schmid, "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the vector
    space splits into ``m`` subspaces; each gets its own ``n_codes``-entry
    codebook, so a D-dim float vector compresses to m log2(n_codes)-bit
    codes (m bytes at n_codes<=256) — a 64-dim float32 vector becomes 4
    bytes at m=4, a 64x scan-byte reduction.

    Codebooks are the deterministic stride seeds (the j-th code of every
    subspace is the slice of the ``j*stride``-id vector) — same
    SQL-replayable quantizer policy as ``ivf_centroids(lloyd_iters=0)``;
    k-means refinement is deliberately not applied here because a
    distributed Lloyd mean's summation order is partition-dependent and
    would break cross-engine replay. Driver holds m*n_codes*d_sub floats.
    """
    dim_row = df.select(F.size(vec_col)).first()
    if dim_row is None:
        raise ValueError("pq_codebooks: input is empty")
    dim = int(dim_row[0])
    if dim % m != 0:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    n = df.count()
    stride = max(n // n_codes, 1)
    seeds = (
        df.filter((F.col(id_col) % stride == 0) & (F.col(id_col) / stride < n_codes))
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    cents = np.array([r[0] for r in seeds], dtype=np.float64)  # (n_codes, dim)
    d_sub = dim // m
    return np.ascontiguousarray(
        cents.reshape(len(cents), m, d_sub).transpose(1, 0, 2)
    )


def pq_encode_expr(vec: Column, codebooks: np.ndarray) -> Column:
    """``array<int>`` of per-subspace nearest-code assignments, all native
    Column folds (same c.c - 2 v.c expansion and lowest-index tiebreak as
    ``nearest_centroid``, per subspace slice); the m * n_codes folds stay
    inside whole-stage codegen."""
    m, _n_codes, d_sub = codebooks.shape
    return F.array(*[
        nearest_centroid(F.slice(vec, s * d_sub + 1, d_sub), codebooks[s])
        for s in range(m)
    ])


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _codes: array<int>) — ``pq_encode_expr`` as a projection. At
    scale this is the write-path stage that materializes the code table."""
    return df.select(
        F.col(id_col), pq_encode_expr(F.col(vec_col), codebooks).alias("_codes")
    )


def adc_distance(query_vec, codebooks: np.ndarray, codes_col: str = "_codes") -> Column:
    """ADC distance expression over a PQ code column: sum of m lookup-table
    entries lut[s][code_s], where lut[s][j] = c_j.c_j - 2 q_s.c_j (the
    constant q.q drops out of the ranking). The luts are tiny driver-side
    constants shipped as literals; evaluation reads ONLY the code column.

    Determinism contract: lut entries are driver-side left folds
    (``_fold_dot``) and the m-term sum accumulates left-to-right from 0.0,
    so DuckDB replays the exact doubles (list_reduce over the same order).

    The lut index is NULL-guarded BEFORE element_at: in Spark 4.1.2,
    ``element_at(arr, idx)`` with a runtime-NULL idx (e.g. ``CASE WHEN ...
    THEN 2 END`` falling through) returns a garbage element instead of
    NULL — only a literal NULL idx behaves (verified this build; the
    when() guard keeps element_at from evaluating on NULL codes at all).
    NULL codes (from NULL embeddings) therefore yield NULL distance."""
    m, _n_codes, d_sub = codebooks.shape
    qv = [float(x) for x in query_vec]
    dist = F.lit(0.0).cast("double")
    for s in range(m):
        qs = qv[s * d_sub : (s + 1) * d_sub]
        lut = [
            _fold_dot(c, c) - 2.0 * _fold_dot(qs, c) for c in codebooks[s]
        ]
        idx = F.get(F.col(codes_col), s)
        term = F.when(
            idx.isNotNull(),
            F.element_at(F.array(*[F.lit(v).cast("double") for v in lut]), idx + 1),
        )
        dist = dist + term
    return dist


def pq_topk(
    df: DataFrame,
    query_vec,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ top-k by asymmetric distance (ADC): the query stays unquantized;
    rows rank by ``adc_distance`` over their codes. The scan reads only the
    m-byte code column — no float vectors move — which is the PQ scale win:
    at 10^12 rows the 64x smaller code table is what gets scanned, with the
    codebooks broadcast as literals. Ties break to the lowest vec_id."""
    enc = pq_encode(df, codebooks, id_col=id_col, vec_col=vec_col)
    return (
        enc.select(F.col(id_col), adc_distance(query_vec, codebooks).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    query_vec,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the standard trillion-scale ANN layout — the IVF coarse
    quantizer prunes the search to ``n_probe`` cells, PQ/ADC ranks inside
    them. Non-residual variant (codes quantize the raw vectors, not the
    per-cell residuals — the ``by_residual=False`` configuration in public
    PQ literature/implementations), which keeps one global code table and
    lets the oracle replay every step.

    This in-plan form computes the cell assignment over every row (the
    oracle-replayable exactness witness — fine at gate scale, a full scan
    at 10^12 rows). The scale path is the MATERIALIZED index:
    ``write_ivfpq_index`` + ``ivfpq_topk_indexed`` read only the code
    column of n_probe cell partitions — partition pruning x 64x
    column-byte reduction multiply. Probe ranking, cell assignment, code
    assignment, and the ADC sum all use the same fold-deterministic double
    arithmetic as ``ivf_topk``/``pq_topk``.
    """
    probe = probe_cells(query_vec, centroids, n_probe)
    probed = df.withColumn("_c", nearest_centroid(F.col(vec_col), centroids)).filter(
        F.col("_c").isin(probe)
    )
    return pq_topk(probed, query_vec, codebooks, k=k, id_col=id_col, vec_col=vec_col)


def probe_cells(query_vec, centroids: np.ndarray, n_probe: int) -> list[int]:
    """The n_probe coarse cells nearest the query, ranked by the same
    c.c - 2 q.c fold score (q.q drops out) and lowest-index tiebreak as
    ``nearest_centroid`` — so an oracle reproduces the probe set exactly."""
    scores = [
        (_fold_dot(c, c) - 2.0 * _fold_dot(query_vec, c), ci)
        for ci, c in enumerate(centroids)
    ]
    return [ci for _s, ci in sorted(scores)[:n_probe]]


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool = False,
) -> None:
    """Materialize the IVF-PQ index: rows land PARTITIONED BY their coarse
    cell ``_c`` carrying ONLY (id, _codes) — the trillion-scale layout the
    ad-hoc ``ivfpq_topk`` only simulates. A query then (a) prunes to
    n_probe cell directories at file-listing time and (b) reads just the
    m-byte code column — the partition-pruning x 64x column-byte reduction
    multiply. Full vectors deliberately do NOT ride along: re-ranking
    against exact vectors is a separate join back to the primary table by
    id (top-k ids only — bounded), keeping index bytes minimal.

    ``arrow=True`` switches cell assignment + encoding to the BLAS
    mapInArrow kernels (the write path for large n_centroids * n_codes);
    default stays on the fold-exact Column expressions so the index
    reproduces ``ivfpq_topk`` bit-for-bit (the two differ only on exact
    score ties — see ``assign_centroids_arrow``).

    One shuffle-free pass: assignment and encoding are both projections
    over the same scan, and ``partitionBy`` splits files per cell within
    each task (no repartition; at 10^12 rows insert a
    ``repartition(n_cells, "_c")`` first if small-files pressure matters
    more than the extra shuffle, or compact after — operators.route
    ``compact_sink``)."""
    if arrow:
        assigned = assign_centroids_arrow(df, centroids, id_col, vec_col)
        codes = pq_encode_arrow(df, codebooks, id_col, vec_col)
        out = assigned.join(codes, id_col)
    else:
        out = df.select(
            F.col(id_col),
            nearest_centroid(F.col(vec_col), centroids).alias("_c"),
            pq_encode_expr(F.col(vec_col), codebooks).alias("_codes"),
        )
    out.select(id_col, "_codes", "_c").write.mode("overwrite").partitionBy("_c").parquet(path)


def ivfpq_topk_indexed(
    spark,
    index_path: str,
    query_vec,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ search over the materialized index: ``_c IN (probe set)`` is
    a partition filter (unprobed cell directories are never listed or
    read) and ranking touches only the code column — the scan's ReadSchema
    contains no embedding at all. Same probe ranking, ADC arithmetic, and
    lowest-id tiebreak as ``ivfpq_topk``; identical results on an index
    written with the default fold-exact path."""
    probe = probe_cells(query_vec, centroids, n_probe)
    return (
        spark.read.parquet(index_path)
        .filter(F.col("_c").isin(probe))
        .select(F.col(id_col), adc_distance(query_vec, codebooks).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ann_rerank(
    primary_df: DataFrame,
    topk_df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Stage 2 of retrieve-then-rerank: exact-cosine re-ranking of an ANN
    stage's candidates against the PRIMARY table's full vectors.

    ``topk_df`` is any ANN result carrying ``id_col`` — ADC-ranked IVF-PQ
    (``ivfpq_topk`` / ``ivfpq_topk_indexed``, typically retrieved at
    k' = 3-10x the final k), LSH, or IVF. The candidate ids are BOUNDED
    (k' rows), so they broadcast; the primary table is probed by a
    broadcast semi-join (id-keyed, no shuffle of the big side — with the
    primary bucketed/partitioned by id hash this is a pruned point
    lookup), then exact cosine orders the survivors: TakeOrdered top-k,
    lowest-id tiebreak, same determinism contract as
    ``brute_force_topk``. This is the "separate join back by id" the
    IVF-PQ index layout was designed around (``write_ivfpq_index``):
    index bytes stay (id, codes)-minimal because exactness lives here."""
    cand_ids = F.broadcast(topk_df.select(id_col).distinct())
    q = _vec_lit(query_vec)
    return (
        primary_df.join(cand_ids, id_col)
        .select(F.col(id_col), cosine_sim(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def pq_encode_arrow(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, _codes) PQ encoding via one Arrow-batched BLAS pass — the
    write-path scale form of ``pq_encode`` for large m*n_codes, exactly as
    ``assign_centroids_arrow`` is to ``nearest_centroid``: per batch, one
    (rows*m, d_sub) x (d_sub, n_codes) multiply + argmin per subspace
    instead of m*n_codes codegen folds per row. np.argmin keeps the
    first/lowest-index minimum, matching the expression path's tiebreak
    (BLAS summation may differ from the fold in the last ulp on exact
    ties — asserted equal on separated data in tests; the gate query stays
    on the fold-exact ``pq_encode``)."""
    import pyarrow as pa

    books = np.ascontiguousarray(codebooks, dtype=np.float64)  # (m, k, d)
    m, _k, d_sub = books.shape
    cc = (books * books).sum(axis=2)  # (m, k)

    def _encode(batches):
        for batch in batches:
            tbl = pa.table(batch)
            ids = tbl[id_col]
            mat = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in tbl[vec_col].to_pylist()]
            )  # (n, dim)
            n = mat.shape[0]
            sub = mat.reshape(n, m, d_sub)  # (n, m, d)
            # scores[n, m, k] = cc[m, k] - 2 * sub @ books^T per subspace
            scores = cc[None, :, :] - 2.0 * np.einsum("nmd,mkd->nmk", sub, books)
            codes = np.argmin(scores, axis=2).astype(np.int32)  # (n, m)
            yield pa.record_batch(
                [ids.combine_chunks(), pa.array(list(codes))],
                names=[id_col, "_codes"],
            )

    import pyspark.sql.types as T

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, True),
            T.StructField("_codes", T.ArrayType(T.IntegerType(), False), True),
        ]
    )
    return df.select(id_col, vec_col).mapInArrow(_encode, schema=out_schema)


# --- SemDeDup (semantic deduplication) --------------------------------------
def semdedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings with a coarse quantizer and dropping, within each
    cluster, every vector that has a semantic duplicate of lower id.

    Survivor rule: x is DROPPED iff exists y in the same cell with
    cos(x, y) >= threshold and y.id < x.id — the paper's keep-one-per-
    epsilon-ball realized with a deterministic min-id tiebreak (the paper
    keeps the item of lowest centroid similarity; min-id is the
    engine-replayable equivalent). Note this is a dominator test, not
    connected components: in a chain a~b~c (a !~ c) both b and c drop —
    b dominated by a, c by b — matching the paper's per-cluster greedy
    sweep, which also removes transitively chained near-dups.

    Scale shape: one centroid-assignment pass (Column-expression argmin for
    <=64 cells; swap in ``assign_centroids_arrow`` for large codebooks),
    vectors unit-normalized ONCE behind an aggregation barrier
    (``dedup.normalized_vectors`` — projection-collapse guard), then a
    within-cell equi-join (never cross-cell, never all-pairs) and one
    LEFT ANTI join on the dominated ids. Pair count is bounded by the
    largest cell; size n_centroids so cells hold ~1e5-1e6 vectors
    (SemDeDup's own setting: 50k clusters over 5B LAION embeddings).
    NULL embeddings assign to NULL cells and are excluded (they cannot
    be similarity-scored).

    Returns kept rows ``(id_col, cell)``, one per surviving vector.
    """
    from .dedup import dot_product, normalized_vectors

    assigned = (
        df.select(F.col(id_col), F.col(vec_col))
        .withColumn("_c", nearest_centroid(F.col(vec_col), centroids))
        .filter(F.col("_c").isNotNull())
    )
    v = normalized_vectors(assigned, id_col, vec_col, extra_cols=["_c"])
    a, b = v.alias("a"), v.alias("b")
    dominated = (
        a.join(b, on=[F.col("a._c") == F.col("b._c"), F.col("b._id") < F.col("a._id")])
        .filter(dot_product(F.col("a._nv"), F.col("b._nv")) >= threshold)
        .select(F.col("a._id").alias("_id"))
        .distinct()
    )
    return v.join(dominated, on="_id", how="left_anti").select(
        F.col("_id").alias(id_col), F.col("_c").alias("cell")
    )


def projection_matrix(dim: int, out_dim: int = 16, seed: int = 101) -> np.ndarray:
    """Deterministic Rademacher JL projection rows (Achlioptas 2001,
    "Database-friendly random projections"): entries ±1/sqrt(out_dim).
    The ±1 alphabet (not Gaussian) keeps every engine-side product a
    sign flip + one correctly-rounded scale, and the Johnson-
    Lindenstrauss distortion guarantee holds with the same constants."""
    import math

    rng = np.random.default_rng(seed)
    signs = rng.integers(0, 2, size=(out_dim, dim)).astype(np.float64) * 2.0 - 1.0
    return signs / math.sqrt(out_dim)


def random_project(
    df: DataFrame,
    matrix: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: append ``out_col``
    = matrix @ vec as ``out_dim`` ordered-fold dot products (the same
    left-to-right IEEE fold as every other vector op here, so the result
    replays bit-exactly engine-side and oracle-side). The standard step
    BEFORE clustering/kNN/IVF when the source dimension is large:
    pairwise distances are preserved within (1±eps) for out_dim =
    O(log n / eps^2), so the downstream index works in out_dim at
    out_dim/dim of the FLOP and shuffle-byte cost — at 10^12 x 768-dim
    embeddings, projecting to 64 dims cuts vector bytes 12x before any
    shuffle. The matrix ships as literals (out_dim x dim doubles in the
    plan, same mechanism as the LSH hyperplanes); no Python, no shuffle,
    zero extra passes."""
    comps = [
        F.aggregate(
            F.zip_with(
                F.col(vec_col), _vec_lit(row), lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        for row in matrix
    ]
    return df.withColumn(out_col, F.array(*comps))


def mmr_rerank(
    df: DataFrame,
    query_vec,
    k: int = 10,
    n_candidates: int = 50,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
    1998): greedily pick the candidate maximizing
    ``lam * rel(d) - (1-lam) * max_{s in S} sim(d, s)`` — relevance traded
    against redundancy with what is already selected, the standard
    diversification pass behind search results and RAG context assembly
    (near-duplicate hits stop crowding out distinct ones).

    Two stages, split exactly like :func:`ann_rerank`:

    - RETRIEVE (distributed): exact-cosine top-``n_candidates`` over the
      corpus via the ``brute_force_topk`` TakeOrdered path (or swap in any
      ANN stage upstream) — per-partition k-heaps, no shuffle, linear scan.
    - GREEDY (bounded): the candidate set is ``n_candidates`` rows BY
      CONSTRUCTION, independent of corpus size, so the O(k*N) greedy runs
      on the driver over one bounded collect — the same "exactness lives in
      the bounded stage" contract as the IVF-PQ rerank. All similarities
      are left-to-right IEEE folds (``_fold_dot``), bit-identical to the
      engine folds, so the DuckDB oracle unrolls the k selection rounds in
      SQL and reproduces every score and rank exactly.

    Ties break on lowest id (both in retrieval and per greedy round).
    Returns (id, rel, mmr_score, rank), rank 1..k in selection order;
    round 1 has no selected set, so its diversity term is 0.0.
    """
    qn = [float(x) for x in query_vec]
    cand_rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(brute_force_topk(df, query_vec, k=n_candidates,
                                           id_col=id_col, vec_col=vec_col)
                          .select(id_col)), id_col)
        .collect()
    )

    def _cos(a, b) -> float:
        num = _fold_dot(a, b)
        return num / ((_fold_dot(a, a) ** 0.5) * (_fold_dot(b, b) ** 0.5))

    cands = sorted(
        (
            (r[id_col], _cos(r[vec_col], qn), [float(x) for x in r[vec_col]])
            for r in cand_rows
        ),
        key=lambda t: (-t[1], t[0]),
    )[:n_candidates]
    one_minus = 1.0 - lam
    selected: list = []
    out = []
    remaining = list(cands)
    for rank in range(1, min(k, len(cands)) + 1):
        best = None
        for cid, rel, vec in remaining:
            # true max over the selected set; 0.0 ONLY when it is empty —
            # mirrors the oracle's coalesce(max(...), 0.0) exactly (a
            # clamped max would diverge when every similarity is negative)
            ms = max((_cos(vec, svec) for _, _, svec in selected), default=0.0)
            score = lam * rel - one_minus * ms
            if best is None or score > best[0] or (score == best[0] and cid < best[1]):
                best = (score, cid, rel, vec)
        score, cid, rel, vec = best
        selected.append((cid, rel, vec))
        out.append((cid, rel, score, rank))
        remaining = [t for t in remaining if t[0] != cid]

    spark = df.sparkSession
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    id_type = dict(df.dtypes)[id_col]
    id_spark_type = LongType() if id_type in ("bigint", "long") else IntegerType()
    schema = StructType([
        StructField(id_col, id_spark_type),
        StructField("rel", DoubleType()),
        StructField("mmr_score", DoubleType()),
        StructField("rank", IntegerType()),
    ])
    return spark.createDataFrame(out, schema)
