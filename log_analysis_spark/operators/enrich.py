"""E1/E3 recast: broadcast-hash-join enrichment against offline dim tables.

The reference enriches each distinct IP with a blocking HTTP GET to
ip2location.io, thread-per-IP behind an Arc<Mutex>
(/root/reference/src/ip2location.rs:174-222, zeek_log.rs:416-458). Its
commented-out local-file cache (ip2location.rs:176-206) is the precedent for
this design: the lookup is a pre-materialized dimension table, and the
per-key fan-out becomes a broadcast hash join — no network, no mutex, no
shuffle of the fact side.

Enriched columns are nullable (left join), mirroring the 12 Option<String>
fields of IP2LocationResponse (/root/reference/src/ip2location.rs:9-24);
unknown keys yield NULLs, handled downstream with coalesce (E4,
/root/reference/src/main.rs:511-541).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import LANG_DIM_SCHEMA, TLD_DIM_SCHEMA

# deterministic dim contents (FIXTURES.md §2). The 'unknown' lang is
# deliberately absent -> exercises the left-join NULL case.
_TLD_ROWS = [
    ("com", "example.com", "NA"),
    ("org", "example.org", "NA"),
    ("net", "example.net", "NA"),
    ("de", "example.de", "EU"),
    ("fr", "example.fr", "EU"),
    ("io", "example.io", "EU"),
    ("edu", "example.edu", "NA"),
    ("cn", "example.cn", "APAC"),
]
_LANG_ROWS = [
    ("en", "Americas", "America/New_York"),
    ("de", "Europe", "Europe/Berlin"),
    ("fr", "Europe", "Europe/Paris"),
    ("es", "Americas", "America/Mexico_City"),
    ("zh", "Asia Pacific", "Asia/Shanghai"),
]


def tld_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_TLD_ROWS, TLD_DIM_SCHEMA)


def lang_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_LANG_ROWS, LANG_DIM_SCHEMA)


def enrich(df: DataFrame, spark: SparkSession, host_col: str = "host") -> DataFrame:
    """Left-join TLD + lang dims onto parsed records via broadcast, then
    decorate with the public-suffix registrable domain (the north star's
    'TLD/registrable-domain table' — full longest-match semantics in
    operators/domains.py, K more broadcast joins).

    All dims are tiny (<=100 rows); ``broadcast()`` pins the hash-join plan
    so the fact table never shuffles — at 10^12 rows a shuffle here would be
    the pipeline's dominant cost.
    """
    from .domains import registrable_domain

    tld = F.substring_index(F.col(host_col), ".", -1).alias("tld")
    out = df.withColumn("tld", tld)
    out = out.join(F.broadcast(tld_dim(spark)), on="tld", how="left")
    out = out.join(F.broadcast(lang_dim(spark)), on="lang", how="left")
    return registrable_domain(out, host_col=host_col)


def null_coalesced_view(df: DataFrame) -> DataFrame:
    """E4: Option-display defaults (unwrap_or("") / "0.0",
    /root/reference/src/main.rs:511-541) as coalesce columns."""
    return df.select(
        *[
            F.coalesce(F.col(c), F.lit("")).alias(c)
            if t == "string"
            else F.col(c)
            for c, t in df.dtypes
        ]
    )


# ---------------------------------------------------------------------------
# CIDR lookup (offline ip.db / geo / ASN enrichment)
# ---------------------------------------------------------------------------
def ip_to_long(ip):
    """Dotted-quad IPv4 -> int64 via pure split/cast arithmetic
    (((a*256+b)*256+c)*256+d) — replayable in any engine. Malformed
    addresses ('1.2.3', 'x.y.z.w') yield NULL, NEVER a task death:
    under ANSI mode (Spark 4's default) plain element_at/cast THROW on a
    short array or non-numeric part — one bad log line would kill a
    10^12-row stage — so this uses try_element_at + try_cast, whose NULL
    propagates through the arithmetic. Octets are range-guarded (0-255):
    '999.1.2.3' is malformed, not a wrapped number."""
    p = F.split(ip, "\\.")

    def oct_(i):
        o = F.try_element_at(p, F.lit(i)).try_cast("long")
        return F.when(o.between(0, 255), o)

    return F.when(
        F.size(p) == 4,
        ((oct_(1) * 256 + oct_(2)) * 256 + oct_(3)) * 256 + oct_(4),
    )


def cidr_dim(df: DataFrame, cidr_col: str = "cidr", bucket_bits: int = 16) -> DataFrame:
    """Expand a CIDR dimension table into bucketed int ranges: each
    'a.b.c.d/n' row becomes (start, end) int64 bounds plus ONE ROW PER
    COVERED /16 BUCKET (a /8 block fans to 256 rows, a /24 to one) —
    the standard prep that turns IP-in-range matching into an EQUI-join.
    The dim stays dim-sized: a full GeoIP/ASN table (~10^6 ranges, mostly
    /16-and-narrower) expands by a small constant."""
    parts = F.split(F.col(cidr_col), "/")
    base = ip_to_long(F.element_at(parts, 1))
    bits = F.element_at(parts, 2).cast("int")
    # the block size shift width is data-dependent (the /n suffix), so it
    # must be a SQL expression — the Python shiftleft binding only takes a
    # literal width
    tmp = df.withColumn("_cbase", base).withColumn("_cbits", bits).withColumn(
        "_csz", F.expr("shiftleft(1L, 32 - _cbits)")
    )
    start = F.col("_cbase") - F.pmod(F.col("_cbase"), F.col("_csz"))
    return (
        tmp.withColumn("_start", start)
        .withColumn("_end", F.col("_start") + F.col("_csz") - F.lit(1))
        .withColumn(
            "_bkt",
            F.explode(
                F.sequence(
                    F.shiftright(F.col("_start"), 32 - bucket_bits),
                    F.shiftright(F.col("_end"), 32 - bucket_bits),
                )
            ),
        )
        .drop("_cbase", "_cbits", "_csz")
    )


def cidr_enrich(
    facts: DataFrame,
    cidrs: DataFrame,
    ip_col: str,
    cidr_col: str = "cidr",
    bucket_bits: int = 16,
) -> DataFrame:
    """Left-enrich facts with their matching CIDR row (geo/ASN lookup,
    allow/deny audit) — the offline form of the reference's per-IP
    ip2location fan-out, at join scale.

    Shape: the fact side computes (ip_long, /16 bucket) map-side; the
    expanded dim (``cidr_dim``) broadcasts; the equi-join on the bucket
    plus a BETWEEN filter does the range match with NO nested-loop join
    and NO shuffle of the fact side.

    CONTRACT: the CIDR ranges must be DISJOINT (true of published
    GeoIP/ASN block tables), so each fact row matches at most one dim
    row and the left join is row-preserving with no dedup aggregate.
    Nested/overlapping CIDR sets must be flattened most-specific-wins on
    the DIM side first (dim-sized work) -- resolving overlap per fact
    row would force a fact-side shuffle, the thing this operator exists
    to avoid. Facts keep every original column plus ``ip_long``;
    unmatched IPs keep NULL dim fields (left join, the E1 contract).
    """
    dim_cols = [c for c in cidrs.columns if c != cidr_col]
    dim = F.broadcast(
        cidr_dim(cidrs, cidr_col, bucket_bits).select(
            "_bkt", "_start", "_end", *dim_cols
        )
    )
    keyed = facts.withColumn("_ipl", ip_to_long(F.col(ip_col))).withColumn(
        "_fbkt", F.shiftright(F.col("_ipl"), 32 - bucket_bits)
    )
    joined = keyed.join(
        dim,
        on=[
            keyed["_fbkt"] == dim["_bkt"],
            keyed["_ipl"].between(dim["_start"], dim["_end"]),
        ],
        how="left",
    )
    return joined.select(
        *[keyed[c] for c in facts.columns],
        F.col("_ipl").alias("ip_long"),
        *[F.col(c) for c in dim_cols],
    )


# special-use IPv4 ranges (RFC 1918, 1122, 3927, 5771, 6598) as
# (start, end, class) int64 literals, most-specific listed first; the
# ordered CASE is the contract, identical in the oracle's replay.
_IP_CLASSES: list[tuple[int, int, str]] = [
    (127 << 24, (127 << 24) + (1 << 24) - 1, "loopback"),       # 127/8
    ((169 << 24) + (254 << 16), (169 << 24) + (254 << 16) + (1 << 16) - 1,
     "link-local"),                                              # 169.254/16
    (10 << 24, (10 << 24) + (1 << 24) - 1, "private"),           # 10/8
    ((172 << 24) + (16 << 16), (172 << 24) + (32 << 16) - 1, "private"),
    ((192 << 24) + (168 << 16), (192 << 24) + (168 << 16) + (1 << 16) - 1,
     "private"),                                                 # 192.168/16
    ((100 << 24) + (64 << 16), (100 << 24) + (128 << 16) - 1, "cgnat"),
    (224 << 24, (240 << 24) - 1, "multicast"),                   # 224/4
]


def ip_class_from_long(n) -> "F.Column":
    """Class CASE over an ALREADY-COMPUTED int64 address column. Use this
    two-step form (``withColumn('_ipl', ip_to_long(ip))`` first) in real
    plans: the class chain references the address ~15 times, and feeding
    it the raw string would inline the whole parse tree per reference —
    a multi-second Janino compile for one projection (measured 6.8 s vs
    sub-second). A non-cheap alias referenced more than once survives
    CollapseProject, so the two-step form compiles the parse ONCE."""
    expr = F.lit("public")
    for start, end, cls in reversed(_IP_CLASSES):
        expr = F.when(n.between(F.lit(start), F.lit(end)), F.lit(cls)).otherwise(expr)
    return F.when(n.isNull(), F.lit(None).cast("string")).otherwise(expr)


def ip_class(ip) -> "F.Column":
    """Special-use classification of a dotted-quad IPv4 ('private',
    'loopback', 'link-local', 'cgnat', 'multicast', else 'public';
    malformed -> NULL) — the Zeek local_orig/local_resp analog, used to
    split internal from external traffic before any detection keyed on
    'external source'. Pure int-range CASE chain, zero shuffle.

    Convenience single-expression form; in a hot plan prefer
    ``ip_class_from_long`` over a pre-computed ``ip_to_long`` column
    (codegen-size note there)."""
    return ip_class_from_long(ip_to_long(ip))
