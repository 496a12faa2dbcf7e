"""Property-based cross-engine parity: the text functions must agree with
their DuckDB oracle fragments on ARBITRARY printable-ASCII inputs, not just
the synth corpus — randomized fuzz over tokenization edge cases (runs of
whitespace, leading/trailing separators, punctuation-only strings, empty
strings, digit/symbol boundaries)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from log_analysis_spark.functions import textstats as TS

# printable ASCII only: unicode case-mapping/whitespace classes can differ
# between Java regex and RE2/ICU — the engine contract is pinned on ASCII,
# and the corpus queries never rely on exotic-codepoint semantics
_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)

_TOKENS_SQL = "list_filter(regexp_split_to_array(trim(t), '\\s+'), x -> x != '')"
_FP_SQL = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(list_filter(regexp_split_to_array("
    "regexp_replace(lower(t), '[^a-z ]', '', 'g'), ''), c -> c != ''), "
    "c -> ord(c))), (acc, c) -> (acc * 31 + c) % 2147483647)"
)
_BPE_SQL = "len(regexp_extract_all(t, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT"


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=st.lists(_ASCII, min_size=1, max_size=6))
def test_token_fp_bpe_parity_on_random_ascii(spark, duck, texts):
    pdf = pd.DataFrame({"i": range(len(texts)), "t": texts})
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.select(
            "i",
            TS.token_count(F.col("t")).cast("long").alias("nt"),
            TS.fingerprint(F.col("t")).alias("fp"),
            TS.bpe_ish_token_count(F.col("t")).cast("long").alias("bpe"),
        )
        .orderBy("i")
        .collect()
    )
    duck.register("t_tbl", pdf)
    want = duck.execute(
        f"SELECT i, len({_TOKENS_SQL})::BIGINT AS nt, {_FP_SQL} AS fp, "
        f"{_BPE_SQL} AS bpe FROM t_tbl ORDER BY i"
    ).fetchall()
    duck.unregister("t_tbl")
    assert [(r["i"], r["nt"], r["fp"], r["bpe"]) for r in got] == [
        (int(i), int(nt), int(fp), int(bpe)) for i, nt, fp, bpe in want
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=st.lists(_ASCII, min_size=1, max_size=4))
def test_quality_chunking_parity_on_random_ascii(spark, duck, texts):
    """The round-4 operators (repetition stats, char-bigram familiarity,
    chunking, packing offsets) vs their OWN gate oracles — the exact SQL
    the driver runs — on arbitrary printable-ASCII corpora. Floats compare
    with ==: the determinism contract is bit-exact replay, and this fuzz
    hunts the inputs (whitespace runs, empties, punctuation-only) where an
    ordering or rounding assumption would crack first."""
    import __spark_entry__ as E

    from log_analysis_spark.operators.chunking import chunk_documents, pack_offsets
    from log_analysis_spark.operators.quality import (
        char_bigram_scores,
        repetition_stats,
    )

    sqls = E.oracle_sql()
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "lang": ["en"] * len(texts),
            "text": texts,
        }
    )
    sdf = spark.createDataFrame(pdf)
    duck.register("documents", pdf)
    try:
        pairs = [
            (repetition_stats(sdf), sqls["repetition_stats"]),
            (char_bigram_scores(sdf), sqls["char_bigram_scores"]),
            (
                chunk_documents(sdf, chunk_tokens=32, overlap=8),
                sqls["doc_chunks"],
            ),
            (
                pack_offsets(sdf, context_tokens=512, num_partitions=2),
                sqls["pack_offsets"],
            ),
        ]
        for got_df, sql in pairs:
            cols = sorted(got_df.columns)
            got = sorted(
                tuple(r[c] for c in cols) for r in got_df.collect()
            )
            want_pdf = duck.execute(sql).df()
            want = sorted(
                tuple(row[c] for c in cols)
                for _i, row in want_pdf.iterrows()
            )
            assert got == want, sql[:80]
    finally:
        duck.unregister("documents")


_URLISH = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=60
)
_CANON_SQL = (
    "CASE WHEN lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) = '' "
    "THEN u ELSE "
    "lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) || '://' || "
    "(CASE WHEN lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) = 'http' "
    "THEN regexp_replace(lower(regexp_extract(u, '^[^:/?]+://([^/?]*)', 1)), ':80$', '') "
    "WHEN lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) = 'https' "
    "THEN regexp_replace(lower(regexp_extract(u, '^[^:/?]+://([^/?]*)', 1)), ':443$', '') "
    "ELSE lower(regexp_extract(u, '^[^:/?]+://([^/?]*)', 1)) END) || "
    "(CASE WHEN regexp_extract(u, '^[^:/?]+://[^/?]*(/[^?]*)?', 1) = '' THEN '/' "
    "ELSE regexp_extract(u, '^[^:/?]+://[^/?]*(/[^?]*)?', 1) END) || "
    "(CASE WHEN array_to_string(list_sort(list_filter(str_split("
    "regexp_extract(u, '\\?(.*)$', 1), '&'), x -> x != '')), '&') <> '' "
    "THEN '?' || array_to_string(list_sort(list_filter(str_split("
    "regexp_extract(u, '\\?(.*)$', 1), '&'), x -> x != '')), '&') ELSE '' END) END"
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(urls=st.lists(_URLISH, min_size=1, max_size=6))
def test_canonical_url_parity_on_random_ascii(spark, duck, urls):
    """canonical_url vs the exact oracle fragment on arbitrary
    non-space printable-ASCII strings — most are NOT URLs, which is the
    point: the pass-through and partial-match branches must agree too.
    (Spaces excluded: a space cannot appear un-encoded in a URL and the
    anchored regexes treat it as an ordinary char in both engines —
    tested via the structured generator in the gate query instead.)"""
    from log_analysis_spark.functions.parse import canonical_url

    pdf = pd.DataFrame({"i": range(len(urls)), "u0": urls})
    sdf = spark.createDataFrame(pdf)
    got = [
        r["c"]
        for r in sdf.select(
            "i", canonical_url(F.col("u0")).alias("c")
        ).orderBy("i").collect()
    ]
    duck.register("u_tbl", pdf)
    want = [
        r[0]
        for r in duck.execute(
            "SELECT "
            + _CANON_SQL
            + " AS c FROM (SELECT i, regexp_replace(u0, '#.*', '') AS u "
            "FROM u_tbl) ORDER BY i"
        ).fetchall()
    ]
    duck.unregister("u_tbl")
    assert got == want


_C4_KEEP_SQL = (
    "list_filter(ls, x -> regexp_matches(x, '[.!?\"]$') AND "
    "len(list_filter(regexp_split_to_array(trim(x), '\\s+'), t -> t != '')) >= 3 "
    "AND NOT contains(lower(x), 'javascript') "
    "AND NOT contains(lower(x), 'lorem ipsum') "
    "AND NOT contains(lower(x), 'all rights reserved') "
    "AND NOT contains(lower(x), 'cookie policy') "
    "AND NOT contains(lower(x), 'terms of use'))"
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(_ASCII, min_size=0, max_size=5).map(lambda ls: "\n".join(ls)),
        min_size=1,
        max_size=4,
    )
)
def test_c4_line_filter_parity_on_random_ascii(spark, duck, docs):
    from log_analysis_spark.operators.quality import c4_line_filter

    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    sdf = spark.createDataFrame(pdf)
    got = [
        (r["n_lines"], r["n_kept"], r["page_dropped"], r["clean_text"])
        for r in c4_line_filter(sdf).orderBy("doc_id").collect()
    ]
    duck.register("d_tbl", pdf)
    want = duck.execute(
        "WITH l AS (SELECT doc_id, text, str_split(text, chr(10)) AS ls FROM d_tbl), "
        f"k AS (SELECT doc_id, text, len(ls)::BIGINT AS n_lines, {_C4_KEEP_SQL} AS kept FROM l) "
        "SELECT n_lines, len(kept)::BIGINT, "
        "(contains(text, '{') OR len(kept) < 1), "
        "CASE WHEN contains(text, '{') OR len(kept) < 1 THEN '' "
        "ELSE array_to_string(kept, chr(10)) END "
        "FROM k ORDER BY doc_id"
    ).fetchall()
    duck.unregister("d_tbl")
    assert got == [(int(a), int(b), bool(c), d) for a, b, c, d in want]


_HOSTISH = st.text(
    alphabet=st.sampled_from(list("abcz019.-CK")), max_size=24
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(hosts=st.lists(_HOSTISH, min_size=1, max_size=8))
def test_registrable_domain_parity_on_random_hosts(spark, duck, hosts):
    """PSL longest-match vs the oracle CTE chain on arbitrary dot/dash
    strings — degenerate label shapes ('', '.', 'a.', '..b', trailing
    dots, uppercase) must resolve identically through Spark's
    substring_index path and DuckDB's str_split/slice path."""
    from log_analysis_spark.operators.domains import (
        keyed_rules_sql_values,
        max_key_labels,
        registrable_domain,
    )

    pdf = pd.DataFrame({"i": range(len(hosts)), "host": hosts})
    sdf = spark.createDataFrame(pdf)
    got = [
        (r["public_suffix"], r["registrable_domain"])
        for r in registrable_domain(sdf).orderBy("i").collect()
    ]

    k = max_key_labels()
    cands = ", ".join(
        f"CASE WHEN n >= {i} THEN array_to_string(l[n-{i - 1}:n], '.') END AS c{i}"
        for i in range(1, k + 1)
    )
    joins = " ".join(
        f"LEFT JOIN dim d{i} ON cand.c{i} = d{i}.suffix_key" for i in range(1, k + 1)
    )
    msel = ", ".join(
        f"d{i}.p AS p{i}, d{i}.w AS w{i}, d{i}.e AS e{i}" for i in range(1, k + 1)
    )
    exc = ", ".join(f"e{i}" for i in range(k, 0, -1))
    prev = ", ".join(
        f"CASE WHEN p{i} IS NOT NULL THEN {i} END, "
        f"CASE WHEN w{i} IS NOT NULL AND n >= {i + 1} THEN {i + 1} END"
        for i in range(1, k + 1)
    )
    duck.register("h_tbl", pdf)
    want = duck.execute(
        f"WITH dim(suffix_key, p, w, e) AS (VALUES {keyed_rules_sql_values()}), "
        "lab AS (SELECT i, str_split(lower(host), '.') AS l, "
        "len(str_split(lower(host), '.')) AS n FROM h_tbl), "
        f"cand AS (SELECT *, {cands} FROM lab), "
        f"m AS (SELECT cand.*, {msel} FROM cand {joins}), "
        f"ps AS (SELECT i, l, n, coalesce({exc}, greatest({prev}, 1)) AS psn FROM m) "
        "SELECT array_to_string(l[n-psn+1:n], '.') AS public_suffix, "
        "CASE WHEN n > psn THEN array_to_string(l[n-psn:n], '.') END "
        "AS registrable_domain FROM ps ORDER BY i"
    ).fetchall()
    duck.unregister("h_tbl")
    assert got == [(a, b) for a, b in want]


# ---------------------------------------------------------------------------
# html_to_text: Spark chain vs the DuckDB oracle chain on tag-soup fuzz
# ---------------------------------------------------------------------------
_TAGGY = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=60,
).map(lambda s: s)
_FRAGMENTS = st.lists(
    st.one_of(
        _TAGGY,
        st.sampled_from(
            [
                "<script>x<y</script>",
                "<style>a{b}</style>",
                "<!--c-->",
                "<p>",
                "</p>",
                "<br/>",
                "<b>",
                "</b>",
                "&amp;",
                "&lt;",
                "&nbsp;",
                "&amp;lt;",
                "<",
                ">",
                "<div class='x'>",
                "\n",
                "  ",
            ]
        ),
    ),
    min_size=1,
    max_size=8,
).map("".join)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pages=st.lists(_FRAGMENTS, min_size=1, max_size=5))
def test_html_to_text_parity_on_tag_soup(spark, duck, pages):
    from log_analysis_spark.functions.html import html_to_text, html_to_text_oracle

    pdf = pd.DataFrame({"i": range(len(pages)), "h": pages})
    sdf = spark.createDataFrame(pdf)
    got = [
        (r["i"], r["t"])
        for r in sdf.select("i", html_to_text(F.col("h")).alias("t"))
        .orderBy("i")
        .collect()
    ]
    duck.register("h_tbl", pdf)
    want = duck.execute(
        f"SELECT i, {html_to_text_oracle('h')} AS t FROM h_tbl ORDER BY i"
    ).fetchall()
    duck.unregister("h_tbl")
    assert got == [(int(i), t) for i, t in want]


# ---------------------------------------------------------------------------
# robots segment-walk: Spark fold vs an independent Python wildcard matcher
# ---------------------------------------------------------------------------
def _py_robots_match(path: str, pattern: str) -> bool:
    """Independent reference: RFC 9309 path match with * and trailing $."""
    import re as _re

    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(_re.escape(seg) for seg in core.split("*")) + (
        "$" if anchored else ""
    )
    return _re.search(rx, path) is not None


_PATH_CH = st.text(alphabet=list("/ab.z123?=_-"), min_size=1, max_size=12)
_PATTERNS = st.lists(
    st.tuples(
        _PATH_CH.map(lambda s: "/" + s.lstrip("/")),
        st.sampled_from(["", "*", "$", "*$"]),
        st.booleans(),
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(paths=st.lists(_PATH_CH.map(lambda s: "/" + s.lstrip("/")), min_size=1, max_size=4), rules=_PATTERNS)
def test_robots_match_fuzz_vs_python_reference(spark, paths, rules):
    """robots_filter's verdict on fuzzed (path, rule) sets must equal an
    independent Python evaluation of RFC 9309 semantics (longest match
    wins, allow wins ties, no match -> allowed)."""
    from log_analysis_spark.operators.robots import robots_filter

    body = "User-agent: *\n" + "\n".join(
        ("Allow: " if allow else "Disallow: ")
        + (pat if deco in ("", "$") else pat + "*")
        + ("$" if deco in ("$", "*$") else "")
        for pat, deco, allow in rules
    )
    robots = spark.createDataFrame([("f.net", body)], "host string, robots_txt string")
    urls = spark.createDataFrame(
        [(f"https://f.net{p}",) for p in paths], "url string"
    )
    got = {
        r["url"]: r["blocked"]
        for r in robots_filter(urls, robots, agent="*", flag_col="blocked").collect()
    }
    for p in paths:
        best = (-1, True)
        for pat, deco, allow in rules:
            pattern = (pat if deco in ("", "$") else pat + "*") + (
                "$" if deco in ("$", "*$") else ""
            )
            if _py_robots_match(p, pattern):
                l = len(pattern)
                if l > best[0] or (l == best[0] and allow):
                    best = (l, allow)
        assert got[f"https://f.net{p}"] == (not best[1]), (p, rules)


# ---------------------------------------------------------------------------
# session-4 primitives: IP parse, UA classification, confusable skeleton,
# zorder keys — fuzzed over adversarial ASCII, both engines must agree
# ---------------------------------------------------------------------------
_IPISH = st.one_of(
    # well-formed and boundary-breaking dotted quads
    st.tuples(
        st.integers(-5, 300), st.integers(-5, 300),
        st.integers(-5, 300), st.integers(-5, 300),
    ).map(lambda t: ".".join(str(x) for x in t)),
    # arbitrary junk: wrong part counts, empties, words
    st.text(alphabet="0123456789.xab ", max_size=20),
)


def _sql_ipl_frag() -> str:
    def o(i: int) -> str:
        c = f"TRY_CAST(string_split(t, '.')[{i}] AS BIGINT)"
        return f"(CASE WHEN {c} BETWEEN 0 AND 255 THEN {c} END)"

    return (
        f"(CASE WHEN len(string_split(t, '.')) = 4 THEN "
        f"((({o(1)} * 256 + {o(2)}) * 256 + {o(3)}) * 256 + {o(4)}) END)"
    )


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ips=st.lists(_IPISH, min_size=1, max_size=8))
def test_ip_to_long_parity_on_adversarial_input(spark, duck, ips):
    from log_analysis_spark.operators.enrich import ip_to_long

    pdf = pd.DataFrame({"i": range(len(ips)), "t": ips})
    got = {
        r["i"]: r["n"]
        for r in spark.createDataFrame(pdf)
        .select("i", ip_to_long(F.col("t")).alias("n"))
        .collect()
    }
    duck.register("ip_tbl", pdf)
    want = {
        r[0]: r[1]
        for r in duck.sql(
            f"SELECT i, {_sql_ipl_frag()} AS n FROM ip_tbl"
        ).fetchall()
    }
    duck.unregister("ip_tbl")
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(uas=st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
), min_size=1, max_size=8))
def test_ua_family_parity_on_random_ascii(spark, duck, uas):
    from log_analysis_spark.functions.parse import UA_RULES, ua_family

    pdf = pd.DataFrame({"i": range(len(uas)), "t": uas})
    got = {
        r["i"]: r["f"]
        for r in spark.createDataFrame(pdf)
        .select("i", ua_family(F.col("t")).alias("f"))
        .collect()
    }
    fam = "CASE " + " ".join(
        f"WHEN contains(t, '{n.replace(chr(39), chr(39)*2)}') THEN '{f}'"
        for n, f, _b in UA_RULES
    ) + " ELSE 'other' END"
    duck.register("ua_tbl", pdf)
    want = {
        r[0]: r[1]
        for r in duck.sql(
            f"SELECT i, CASE WHEN t = '' THEN 'unknown' ELSE {fam} END "
            "FROM ua_tbl"
        ).fetchall()
    }
    duck.unregister("ua_tbl")
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(hosts=st.lists(st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-", max_size=30
), min_size=1, max_size=8))
def test_confusable_skeleton_parity(spark, duck, hosts):
    from log_analysis_spark.operators.detect import (
        CONFUSABLE_SEQS, CONFUSABLE_TRANSLATE, confusable_skeleton,
    )

    pdf = pd.DataFrame({"i": range(len(hosts)), "t": hosts})
    got = {
        r["i"]: r["s"]
        for r in spark.createDataFrame(pdf)
        .select("i", confusable_skeleton(F.col("t")).alias("s"))
        .collect()
    }
    sql = f"translate(t, '{CONFUSABLE_TRANSLATE[0]}', '{CONFUSABLE_TRANSLATE[1]}')"
    for a, b in CONFUSABLE_SEQS:
        sql = f"replace({sql}, '{a}', '{b}')"
    duck.register("h_tbl", pdf)
    want = {r[0]: r[1] for r in duck.sql(f"SELECT i, {sql} FROM h_tbl").fetchall()}
    duck.unregister("h_tbl")
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pairs=st.lists(st.tuples(
    st.integers(0, 255), st.integers(0, 255)
), min_size=1, max_size=16))
def test_zorder_key_parity_and_order_preservation(spark, duck, pairs):
    from log_analysis_spark.plans.bucketing import zorder_key

    pdf = pd.DataFrame(
        {"i": range(len(pairs)),
         "x": [a for a, _ in pairs], "y": [b for _, b in pairs]}
    )
    got = {
        r["i"]: r["z"]
        for r in spark.createDataFrame(pdf)
        .select("i", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z"))
        .collect()
    }
    terms = " + ".join(
        f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
        for b in range(8)
    )
    duck.register("z_tbl", pdf)
    want = {r[0]: r[1] for r in duck.sql(f"SELECT i, {terms} FROM z_tbl").fetchall()}
    duck.unregister("z_tbl")
    assert got == want
    # injectivity on the byte grid: same pair -> same z, distinct -> distinct
    by_pair = {}
    for idx, pair in enumerate(pairs):
        by_pair.setdefault(pair, set()).add(got[idx])
    assert all(len(zs) == 1 for zs in by_pair.values())
    assert len({next(iter(zs)) for zs in by_pair.values()}) == len(by_pair)
