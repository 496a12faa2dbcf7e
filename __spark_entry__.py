"""Driver contract for the spark-graft builder (PySpark target).

One ``queries()`` entry per operator family from SURVEY.md §2 plus the
training-data pipeline layer (dedup / similarity / text analysis /
multimodal). Every oracle SQL is written to be **bit-identical** to the
Spark result: integer counts, exact decimal sums cast to double once,
int/int IEEE divisions, and deterministic left-to-right double folds for
cosine/fingerprint math (probed equal across Spark 4.1 and DuckDB 1.0).

Spark implementations live in ``log_analysis_spark``; this module wires
them to the driver's testdata tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from log_analysis_spark.functions import textstats as TS
from log_analysis_spark.operators import dedup as DD
from log_analysis_spark.operators import similarity as SIM
from log_analysis_spark.operators.aggregate import salted_group_count

EVENT_WHITELIST = ["click", "view", "purchase", "error"]  # 'signup' = NONE analog
NEARDUP_COS = 0.35
JACCARD_T = 0.8


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# entry: flagship query (driver smoke check, sf0.001)
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference pipeline shape (parse → route → aggregate)
    over the events table — JSON field extraction, whitelist routing
    (ZeekProtocol::NONE drop analog), per-(type,hour) aggregation."""
    ev = _t(spark, "/root/testdata/sf0.001", "events")
    parsed = ev.select(
        "event_id",
        "event_type",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour"),
    )
    routed = parsed.filter(F.col("event_type").isin(EVENT_WHITELIST))
    return (
        routed.groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("k").alias("sum_k"),
        )
        .drop("n")
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# relational / pipeline operator families (events + TPC-H-ish tables)
# ---------------------------------------------------------------------------
def q_filter_eq(spark, sf_dir):
    """F1: equality predicate (src_ip analog), zeek_log.rs:191-221."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") == 42)
        .select("event_id", "event_type", "value")
    )


def q_filter_combo(spark, sf_dir):
    """F2: composed predicates replacing the bitmask dispatch
    (zeek_search_params.rs:38-57); Catalyst ANDs them into one scan filter."""
    ev = _t(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
        & (F.col("value") > 50.0)
    ).select("event_id", "user_id", "value")


def q_route_counts(spark, sf_dir):
    """R1: whitelist router fan-out counts (zeek_log.rs:383-397)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(EVENT_WHITELIST))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("event_type")
    )


def q_events_per_user_hour(spark, sf_dir):
    """R2 + north-rule agg: events per entity per hour."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", F.date_format("ts", "yyyy-MM-dd HH").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q_distinct_users(spark, sf_dir):
    """A1 rebuilt: full distinct (vs the reference's value[0] bug,
    zeek_log.rs:350)."""
    return _t(spark, sf_dir, "events").select("user_id").distinct()


def q_union_dedup_first_seen(spark, sf_dir):
    """A2: cross-date union + first-seen-wins merge (main.rs:321-330),
    order-insensitive min form."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    first_half = ev.filter(F.col("day") <= "2024-01-15")
    second_half = ev.filter(F.col("day") > "2024-01-15")
    return (
        first_half.unionByName(second_half)
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )


def q_topk_users(spark, sf_dir):
    """O4/top-k: partial-agg then tiny global sort-limit."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


def q_broadcast_enrich(spark, sf_dir):
    """E1: broadcast-hash-join enrichment (ip2location recast). Exact
    decimal sum -> double so the value is engine-independent."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_acctbal"),
        )
        .orderBy("r_name")
    )


def q_json_extract(spark, sf_dir):
    """E3: structured JSON decode (vs the reference's hand parser,
    ip2location.rs:138-167). avg as int/int IEEE division."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return (
        ev.groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
        .withColumn("avg_k", F.col("sum_k").cast("double") / F.col("n").cast("double"))
        .orderBy("event_type")
    )


def q_null_coalesce(spark, sf_dir):
    """E4: left-join miss -> coalesce default (main.rs:511-541)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    s = _t(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(s), c.c_custkey == s.s_suppkey, "left")
        .select("c_custkey", F.coalesce("s_name", F.lit("(none)")).alias("supplier_name"))
    )


def q_date_range_days(spark, sf_dir):
    """O3: date-range generation (main.rs:815-834) as sequence+explode,
    left-joined so zero-order days appear."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"), F.max(F.to_date("o_orderdate")).alias("d1")
    )
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    per_day = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return days.join(per_day, "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
    )


def q_window_topn(spark, sf_dir):
    """Window function: top order per customer (deterministic tiebreak)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q_rollup_agg(spark, sf_dir):
    """Rollup/grouping-sets aggregation."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary; decimal-exact sums -> double."""
    l = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2024-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order").cast("double"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_membership_antijoin(spark, sf_dir):
    """Golden membership shape (tests/zeek_search.rs:190-216): entities
    present on day 1 but absent on day 2 — anti-join."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    d1 = ev.filter(F.col("day") == "2024-01-01").select("user_id").distinct()
    d2 = ev.filter(F.col("day") == "2024-01-02").select("user_id").distinct()
    return d1.join(d2, "user_id", "left_anti")


def q_distinct_per_type(spark, sf_dir):
    """Exact COUNT(DISTINCT) per group (two-phase expansion, skew-safe)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_distinct_users"))
        .orderBy("event_type")
    )


def q_salted_count(spark, sf_dir):
    """Salted two-phase count == plain count (skew-handling template)."""
    return salted_group_count(
        _t(spark, sf_dir, "events"), "event_type", agg_col_name="n"
    ).orderBy("event_type")


def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (probed bit-identical to
    DuckDB quantile_cont)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .orderBy("event_type")
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization: lag + running-sum windows. 30-min gap,
    floor-second arithmetic and (ts, event_id) tiebreak on both engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(F.col("sec") - F.lag("sec").over(w) > 1800, 1).otherwise(
            F.when(F.lag("sec").over(w).isNull(), 1).otherwise(0)
        ),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("sec") - F.min("sec")).alias("duration_sec"),
        )
    )


def q_pivot_counts(spark, sf_dir):
    """Pivot-style conditional aggregation (counts per type as columns)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ["click", "view", "purchase", "error", "signup"]
    ]
    return ev.groupBy("day").agg(*aggs).orderBy("day")


def q_semi_join(spark, sf_dir):
    """Left-semi join (EXISTS): customers having at least one order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_intersect_users(spark, sf_dir):
    """Set intersection: users active in BOTH halves of the month."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    a = ev.filter(F.col("day") <= "2024-01-15").select("user_id").distinct()
    b = ev.filter(F.col("day") > "2024-01-15").select("user_id").distinct()
    return a.intersect(b)


def q_sample_mod(spark, sf_dir):
    """Deterministic 10% sample via key modulo (reproducible across
    engines/partitionings, unlike rand())."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 10 == 0)
        .select("event_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# text analysis (documents)
# ---------------------------------------------------------------------------
def q_regex_parse(spark, sf_dir):
    """S5 analog on documents: regex field extraction + token count."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        TS.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )


def q_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", TS.token_count(F.col("text")).cast("long").alias("nt"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("nt").alias("sum_tokens"))
        .withColumn(
            "avg_tokens", F.col("sum_tokens").cast("double") / F.col("n_docs").cast("double")
        )
        .orderBy("lang")
    )


def q_quality_scores(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TS.quality_score(F.col("text")).alias("quality"))


def q_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.col("lang").alias("lang_declared"), TS.langid(F.col("text")).alias("lang_pred"))
        .groupBy("lang_declared", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_declared", "lang_pred")
    )


def q_fingerprints(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TS.fingerprint(F.col("text")).alias("fp"))


def q_bpe_tokens(spark, sf_dir):
    """BPE-ish pre-tokenization counts (letter runs / digit runs / symbols)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", TS.bpe_ish_token_count(F.col("text")).cast("long").alias("nt"))
        .groupBy("lang")
        .agg(F.sum("nt").alias("sum_bpe_tokens"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# dedup family (documents)
# ---------------------------------------------------------------------------
def q_exact_dedup(spark, sf_dir):
    return DD.exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_ngram_jaccard(spark, sf_dir):
    """Exact-Jaccard near-dup pairs, blocked on (lang, length-bucket).

    The length bucket is a principled blocking key: j>=0.8 pairs have
    near-equal shingle counts, so near-equal length. Keeps the exact
    pairwise work O(block^2) with small blocks; q_minhash_lsh is the
    unblocked scale path.
    """
    d = _t(spark, sf_dir, "documents").withColumn(
        "blk",
        F.concat_ws("_", "lang", F.floor(F.col("n_chars") / F.lit(64)).cast("long")),
    )
    return DD.ngram_jaccard_pairs(
        d, "doc_id", "text", block_col="blk", n=3, threshold=JACCARD_T
    )


def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs (sketch-based; rows-only check — recall
    vs the exact q_ngram_jaccard is asserted in tests/test_dedup.py)."""
    return DD.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        num_perm=64, bands=16, n=3, threshold=JACCARD_T,
    )


def q_simhash(spark, sf_dir):
    """SimHash near-dup pairs (sketch-based; rows-only check)."""
    return DD.simhash_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=6
    )


def q_embedding_neardup(spark, sf_dir):
    return DD.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        block_col="label", threshold=NEARDUP_COS,
    )


# ---------------------------------------------------------------------------
# similarity search (embeddings)
# ---------------------------------------------------------------------------
def _query_vec(spark, sf_dir):
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select("embedding").first()
    )
    return list(row[0])


def q_cosine_topk(spark, sf_dir):
    return SIM.brute_force_topk(
        _t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10
    )


def q_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k (rows-only; recall vs exact asserted
    in tests/test_similarity.py)."""
    return SIM.lsh_topk(
        _t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10, n_planes=8
    )


def q_knn_join(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return SIM.knn_join(e, e, k=2, block_col="label")


def q_ivf_topk(spark, sf_dir):
    """IVF coarse-quantized ANN (rows-only; exactness bounds in
    tests/test_similarity.py)."""
    e = _t(spark, sf_dir, "embeddings")
    cents = SIM.ivf_centroids(e, n_centroids=8)
    return SIM.ivf_topk(e, _query_vec(spark, sf_dir), cents, k=10, n_probe=2)


# ---------------------------------------------------------------------------
# multimodal plumbing (binary payload metadata; kernel stubbed, see module)
# ---------------------------------------------------------------------------
def q_binary_meta(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return d.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "filter_eq": q_filter_eq,
        "filter_combo": q_filter_combo,
        "route_counts": q_route_counts,
        "events_per_user_hour": q_events_per_user_hour,
        "distinct_users": q_distinct_users,
        "union_dedup_first_seen": q_union_dedup_first_seen,
        "topk_users": q_topk_users,
        "broadcast_enrich": q_broadcast_enrich,
        "json_extract": q_json_extract,
        "null_coalesce": q_null_coalesce,
        "date_range_days": q_date_range_days,
        "window_topn": q_window_topn,
        "rollup_agg": q_rollup_agg,
        "tpch_q1": q_tpch_q1,
        "membership_antijoin": q_membership_antijoin,
        "distinct_per_type": q_distinct_per_type,
        "salted_count": q_salted_count,
        "percentiles": q_percentiles,
        "sessionize": q_sessionize,
        "pivot_counts": q_pivot_counts,
        "semi_join": q_semi_join,
        "intersect_users": q_intersect_users,
        "sample_mod": q_sample_mod,
        "regex_parse": q_regex_parse,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "langid": q_langid,
        "fingerprints": q_fingerprints,
        "bpe_tokens": q_bpe_tokens,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "embedding_neardup": q_embedding_neardup,
        "cosine_topk": q_cosine_topk,
        "lsh_topk": q_lsh_topk,
        "knn_join": q_knn_join,
        "ivf_topk": q_ivf_topk,
        "binary_meta": q_binary_meta,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB). Shared lexical building blocks keep the SQL forms in
# lockstep with the Spark Column expressions above.
# ---------------------------------------------------------------------------
_TOKENS = "list_filter(regexp_split_to_array(trim({t}), '\\s+'), t -> t != '')"


def _sql_stoplist(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in TS.STOPWORDS[lang]) + "]"


def _sql_hits(t: str, lang: str) -> str:
    return (
        f"len(list_filter({_TOKENS.format(t=t)}, "
        f"t -> list_contains({_sql_stoplist(lang)}, t)))"
    )


def _sql_dot(a: str, b: str) -> str:
    """Deterministic left-to-right double fold — mirrors dedup.cosine_sim."""
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE)), "
        f"(acc, v) -> acc + v)"
    )


def _sql_cos(a: str, b: str) -> str:
    return f"({_sql_dot(a, b)} / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)})))"


def _sql_normvec(v: str) -> str:
    """Unit-normalize — mirrors dedup.normalized_vectors element ops."""
    sumsq = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({v}, x -> x::DOUBLE * x::DOUBLE)), (acc, w) -> acc + w)"
    )
    return f"list_transform({v}, x -> x::DOUBLE / sqrt({sumsq}))"


def _sql_dot_plain(a: str, b: str) -> str:
    """Dot of already-double arrays — mirrors dedup.dot_product."""
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
        f"(acc, v) -> acc + v)"
    )


_SQL_SHINGLES3 = (
    "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
    "for i in range(1, len(w) - 1)])"
)


def _sql_quality(t: str) -> str:
    n_tok = f"len({_TOKENS.format(t=t)})::DOUBLE"
    n_chr = f"length({t})::DOUBLE"
    punct = f"(length({t}) - length(regexp_replace({t}, '[.,!?;:]', '', 'g')))::DOUBLE"
    stop_ratio = f"(CASE WHEN {n_tok} > 0 THEN {_sql_hits(t, 'en')}::DOUBLE / {n_tok} ELSE 0.0 END)"
    punct_ratio = f"(CASE WHEN {n_chr} > 0 THEN {punct} / {n_chr} ELSE 0.0 END)"
    len_fit = f"least({n_tok} / 20.0, 1.0)"
    return f"({len_fit} * 0.5 + {stop_ratio} * 0.3 + (1.0 - {punct_ratio}) * 0.2)"


def _sql_langid(t: str) -> str:
    hits = {lg: _sql_hits(t, lg) for lg in TS.LANGID_ORDER}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    whens = " ".join(
        f"WHEN {best} > 0 AND {hits[lg]} = {best} THEN '{lg}'" for lg in TS.LANGID_ORDER
    )
    return f"(CASE {whens} ELSE 'unknown' END)"


def oracle_sql() -> dict[str, str]:
    wl = ", ".join(f"'{t}'" for t in EVENT_WHITELIST)
    return {
        "filter_eq": (
            "SELECT event_id, event_type, value FROM events WHERE user_id = 42"
        ),
        "filter_combo": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-15' "
            "AND value > 50.0"
        ),
        "route_counts": (
            f"SELECT event_type, count(*) AS n_rows FROM events "
            f"WHERE event_type IN ({wl}) GROUP BY event_type ORDER BY event_type"
        ),
        "events_per_user_hour": (
            "SELECT user_id, strftime(ts, '%Y-%m-%d %H') AS hour, "
            "count(*) AS n_events FROM events GROUP BY user_id, hour"
        ),
        "distinct_users": "SELECT DISTINCT user_id FROM events",
        "union_dedup_first_seen": (
            "WITH ev AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events), "
            "u AS (SELECT * FROM ev WHERE day <= '2024-01-15' "
            "UNION ALL SELECT * FROM ev WHERE day > '2024-01-15') "
            "SELECT user_id, min(day) AS first_day FROM u GROUP BY user_id"
        ),
        "topk_users": (
            "SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id "
            "ORDER BY n_events DESC, user_id ASC LIMIT 10"
        ),
        "broadcast_enrich": (
            "SELECT r_name, count(*) AS n_customers, "
            "(sum(c_acctbal::DECIMAL(18,2)))::DOUBLE AS sum_acctbal "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name ORDER BY r_name"
        ),
        "json_extract": (
            "SELECT event_type, sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k, "
            "count(*) AS n, "
            "sum(json_extract_string(props, '$.k')::BIGINT)::DOUBLE / count(*)::DOUBLE AS avg_k "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "null_coalesce": (
            "SELECT c_custkey, coalesce(s_name, '(none)') AS supplier_name "
            "FROM customer LEFT JOIN supplier ON c_custkey = s_suppkey "
            "WHERE c_custkey <= 100"
        ),
        "date_range_days": (
            "WITH b AS (SELECT min(o_orderdate::DATE) AS d0, max(o_orderdate::DATE) AS d1 "
            "FROM orders), "
            "d AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b), "
            "c AS (SELECT o_orderdate::DATE AS day, count(*) AS n FROM orders GROUP BY 1) "
            "SELECT strftime(d.day, '%Y-%m-%d') AS day, "
            "coalesce(c.n, 0)::BIGINT AS n_orders FROM d LEFT JOIN c ON d.day = c.day"
        ),
        "window_topn": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders) "
            "WHERE rn = 1"
        ),
        "rollup_agg": (
            "SELECT coalesce(o_orderstatus, 'ALL') AS status, "
            "coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n "
            "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"
        ),
        "tpch_q1": (
            "SELECT l_returnflag, l_linestatus, "
            "(sum(l_quantity::DECIMAL(18,2)))::DOUBLE AS sum_qty, "
            "(sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS sum_base_price, "
            "count(*) AS count_order, "
            "(sum(l_quantity::DECIMAL(18,2)))::DOUBLE / count(*)::DOUBLE AS avg_qty "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-01' "
            "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
        ),
        "membership_antijoin": (
            "SELECT DISTINCT user_id FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-01' "
            "AND user_id NOT IN (SELECT user_id FROM events "
            "WHERE strftime(ts, '%Y-%m-%d') = '2024-01-02')"
        ),
        "distinct_per_type": (
            "SELECT event_type, count(DISTINCT user_id) AS n_distinct_users "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "salted_count": (
            "SELECT event_type, count(*) AS n FROM events "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "percentiles": (
            "SELECT event_type, quantile_cont(value, 0.5) AS p50, "
            "quantile_cont(value, 0.9) AS p90 FROM events "
            "GROUP BY event_type ORDER BY event_type"
        ),
        "sessionize": (
            "WITH ev AS (SELECT user_id, event_id, floor(epoch(ts))::BIGINT AS sec FROM events), "
            "flagged AS (SELECT user_id, event_id, sec, "
            "CASE WHEN lag(sec) OVER w IS NULL THEN 1 "
            "WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session "
            "FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)), "
            "sess AS (SELECT user_id, sec, "
            "(sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id "
            "ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id FROM flagged) "
            "SELECT user_id, session_id, count(*) AS n_events, "
            "max(sec) - min(sec) AS duration_sec "
            "FROM sess GROUP BY user_id, session_id"
        ),
        "pivot_counts": (
            "SELECT strftime(ts, '%Y-%m-%d') AS day, "
            + ", ".join(
                f"sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)::BIGINT AS n_{t}"
                for t in ["click", "view", "purchase", "error", "signup"]
            )
            + " FROM events GROUP BY day ORDER BY day"
        ),
        "semi_join": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
        ),
        "intersect_users": (
            "SELECT DISTINCT user_id FROM events WHERE strftime(ts, '%Y-%m-%d') <= '2024-01-15' "
            "INTERSECT "
            "SELECT DISTINCT user_id FROM events WHERE strftime(ts, '%Y-%m-%d') > '2024-01-15'"
        ),
        "sample_mod": (
            "SELECT event_id, event_type, value FROM events WHERE event_id % 10 = 0"
        ),
        "regex_parse": (
            "SELECT doc_id, regexp_extract(text, '^(\\w+)', 1) AS first_word, "
            f"len({_TOKENS.format(t='text')})::BIGINT AS n_tokens FROM documents"
        ),
        "token_stats": (
            f"WITH t AS (SELECT lang, len({_TOKENS.format(t='text')})::BIGINT AS nt "
            "FROM documents) "
            "SELECT lang, count(*) AS n_docs, sum(nt)::BIGINT AS sum_tokens, "
            "sum(nt)::DOUBLE / count(*)::DOUBLE AS avg_tokens "
            "FROM t GROUP BY lang ORDER BY lang"
        ),
        "quality_scores": (
            f"SELECT doc_id, {_sql_quality('text')} AS quality FROM documents"
        ),
        "langid": (
            f"WITH p AS (SELECT lang AS lang_declared, {_sql_langid('text')} AS lang_pred "
            "FROM documents) "
            "SELECT lang_declared, lang_pred, count(*) AS n FROM p "
            "GROUP BY lang_declared, lang_pred ORDER BY lang_declared, lang_pred"
        ),
        "fingerprints": (
            "SELECT doc_id, list_reduce(list_prepend(0::BIGINT, "
            "list_transform(list_filter(regexp_split_to_array("
            "regexp_replace(lower(text), '[^a-z ]', '', 'g'), ''), c -> c != ''), "
            "c -> ord(c))), (acc, c) -> (acc * 31 + c) % 2147483647) AS fp "
            "FROM documents"
        ),
        "bpe_tokens": (
            "WITH t AS (SELECT lang, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS nt "
            "FROM documents) "
            "SELECT lang, sum(nt)::BIGINT AS sum_bpe_tokens, count(*) AS n_docs "
            "FROM t GROUP BY lang ORDER BY lang"
        ),
        "exact_dedup": (
            "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS group_size "
            "FROM documents GROUP BY md5(text)"
        ),
        "ngram_jaccard": (
            "WITH tok AS (SELECT doc_id, lang || '_' || (n_chars // 64) AS blk, "
            f"{_TOKENS.format(t='text')} AS w FROM documents), "
            f"sh AS (SELECT doc_id, blk, CASE WHEN len(w) >= 3 THEN {_SQL_SHINGLES3} "
            "ELSE [] END AS s FROM tok) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s))::DOUBLE "
            "AS jaccard "
            "FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id "
            f"WHERE len(list_distinct(a.s || b.s)) > 0 AND "
            "len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s))::DOUBLE "
            f">= {JACCARD_T}"
        ),
        # minhash_lsh, simhash, lsh_topk: sketch/approximate — rows-only checks;
        # exact-recall assertions live in tests/test_dedup.py & test_similarity.py
        "embedding_neardup": (
            f"WITH nv AS (SELECT vec_id, label, {_sql_normvec('embedding')} AS v "
            "FROM embeddings) "
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            f"{_sql_dot_plain('a.v', 'b.v')} AS cos_sim "
            "FROM nv a JOIN nv b ON a.label = b.label AND a.vec_id < b.vec_id "
            f"WHERE {_sql_dot_plain('a.v', 'b.v')} >= {NEARDUP_COS}"
        ),
        "cosine_topk": (
            "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
            f"SELECT e.vec_id, {_sql_cos('e.embedding', 'q.qv')} AS cos_sim "
            "FROM embeddings e, q "
            "ORDER BY cos_sim DESC, e.vec_id ASC LIMIT 10"
        ),
        "knn_join": (
            f"WITH nv AS (SELECT vec_id, label, {_sql_normvec('embedding')} AS v "
            "FROM embeddings) "
            "SELECT qid, nid, cos_sim, rank FROM ("
            "SELECT a.vec_id AS qid, b.vec_id AS nid, "
            f"{_sql_dot_plain('a.v', 'b.v')} AS cos_sim, "
            "row_number() OVER (PARTITION BY a.vec_id ORDER BY "
            f"{_sql_dot_plain('a.v', 'b.v')} DESC, b.vec_id ASC) AS rank "
            "FROM nv a JOIN nv b "
            "ON a.label = b.label AND a.vec_id != b.vec_id) WHERE rank <= 2"
        ),
        "binary_meta": (
            "SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, "
            "md5(text) AS payload_md5 FROM documents"
        ),
    }
