"""html_to_text: rule matrix, DuckDB parity, plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from log_analysis_spark.functions.html import html_to_text, html_to_text_oracle


def _clean_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_text(F.col("html")).alias("t")).first()["t"]


CASES = [
    # script/style subtrees vanish entirely (incl. tag-like JS strings)
    (
        '<p>keep</p><script>if (1 < 2) { x = "</div>"; }</script><p>tail</p>',
        "keep\ntail",
    ),
    ("<style>p {color: red}</style><p>body</p>", "body"),
    # comments vanish
    ("a<!-- hidden <b>bold</b> -->b", "a b"),
    # block tags (open and close) become line breaks; runs collapse
    ("<div><h1>Title</h1><p>one</p><p>two</p></div>", "Title\none\ntwo"),
    ("<ul><li>x</li><li>y</li></ul>", "x\ny"),
    ("line one<br/>line two<br >line three", "line one\nline two\nline three"),
    # inline tags become spaces, never gluing words
    ("be<b>fore</b>after", "be fore after"),
    ("<span>a</span><em>b</em>", "a b"),
    # entities: named set + single-pass amp semantics
    ("A &amp; B &lt;ok&gt; &quot;q&quot; &#39;s&#39;&nbsp;end", "A & B <ok> \"q\" 's' end"),
    ("double &amp;lt; stays literal", "double &lt; stays literal"),
    # whitespace normalization around breaks and ends
    ("  <p>  padded\t text  </p>\n\n", "padded text"),
    # stray '<' without '>' survives (lexical, not parsed — documented)
    ("1 < 2 but <b>tagged</b>", "1 < 2 but tagged"),
    # empty / no-content pages
    ("<html><head><title></title></head><body></body></html>", ""),
]


@pytest.mark.parametrize("html,want", CASES)
def test_rule_matrix(spark, html, want):
    assert _clean_one(spark, html) == want


@pytest.mark.parametrize("html,_", CASES)
def test_duckdb_parity_on_cases(spark, html, _):
    got_spark = _clean_one(spark, html)
    got_duck = duckdb.execute(
        "SELECT " + html_to_text_oracle("?::VARCHAR") + " AS t", [html]
    ).fetchone()[0]
    assert got_spark == got_duck


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "html string")
    assert df.select(html_to_text(F.col("html")).alias("t")).first()["t"] is None


def test_feeds_c4_line_filter(spark):
    """The output's \\n lines are what c4_line_filter consumes: block
    structure must survive as line boundaries."""
    from log_analysis_spark.operators.quality import c4_line_filter

    html = (
        "<div><p>This line has enough words and ends properly.</p>"
        "<p>javascript required</p>"
        "<p>Another full sentence with plenty of words in it.</p></div>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string").select(
        "doc_id", html_to_text(F.col("html")).alias("text")
    )
    out = c4_line_filter(df, text_col="text", min_words=4).first()["clean_text"]
    assert "javascript" not in out
    assert "ends properly" in out and "plenty of words" in out


def test_single_projection_no_shuffle(spark):
    df = spark.createDataFrame([("x",)], "html string")
    plan = (
        df.select(html_to_text(F.col("html")).alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_page_directives(spark):
    """rel=canonical (attribute order + quote variants, first wins),
    robots meta token matching (noindex/nofollow as LIST TOKENS, not
    substrings), title trim, absent -> NULL/false defaults."""
    from log_analysis_spark.functions.html import page_directives

    cases = [
        ("both_orders", '<link rel="canonical" href="/a"><link href="/b" rel="canonical">'),
        ("href_first", "<link href='/c' rel='canonical'>"),
        ("robots_full", '<meta name="robots" content="noindex, nofollow">'),
        ("robots_partial", "<meta content='noindex,follow' name=robots>"),
        ("robots_token_trap", '<meta name="robots" content="noindexing">'),
        ("title", "<title>\n  A Page  \n</title><title>second</title>"),
        ("empty", "<p>nothing here</p>"),
        # minified real-world markup: UNQUOTED attribute values
        ("unq_href", "<link rel=canonical href=/x>"),
        ("unq_robots", "<meta name=robots content=noindex>"),
        ("unq_base", "<base href=/b/ target=_blank><link rel=canonical href=y>"),
    ]
    df = spark.createDataFrame(cases, "name string, html string")
    got = {
        r.name: r.d
        for r in df.select("name", page_directives(F.col("html")).alias("d")).collect()
    }
    assert got["both_orders"].canonical_href == "/a"  # first tag wins
    assert got["href_first"].canonical_href == "/c"
    assert got["robots_full"].noindex and got["robots_full"].nofollow
    assert got["robots_partial"].noindex and not got["robots_partial"].nofollow
    assert not got["robots_token_trap"].noindex  # 'noindexing' is not 'noindex'
    assert got["title"].title == "A Page"
    e = got["empty"]
    assert e.canonical_href is None and e.title is None and e.base_href is None
    assert not e.noindex and not e.nofollow
    assert got["unq_href"].canonical_href == "/x"
    assert got["unq_robots"].noindex and not got["unq_robots"].nofollow
    assert got["unq_base"].base_href == "/b/"
    assert got["unq_base"].canonical_href == "y"


def test_page_directives_base_href(spark):
    """<base href> extracted; the effective resolution base is the base
    element resolved against the fetched URL, and relative canonicals
    resolve against THAT (HTML spec resolution order)."""
    from log_analysis_spark.functions.html import page_directives
    from log_analysis_spark.functions.parse import resolve_url

    df = spark.createDataFrame(
        [("https://h.net/d/e1", '<base href="/b1/b2/"><link rel="canonical" href="../cx">')],
        "url string, html string",
    )
    d = df.select(
        "url", page_directives(F.col("html")).alias("d")
    ).select(
        F.col("d.base_href").alias("b"),
        resolve_url(
            resolve_url(F.col("url"), F.coalesce(F.col("d.base_href"), F.col("url"))),
            F.col("d.canonical_href"),
        ).alias("resolved"),
    ).collect()[0]
    assert d.b == "/b1/b2/"
    assert d.resolved == "https://h.net/b1/cx"


def test_jsonld_entities_matrix(spark):
    import pandas as pd

    from log_analysis_spark.functions.html import jsonld_blocks, jsonld_entities

    html = [
        '<script type="application/ld+json">{"@type": "Product", "name": "W 5"}</script>',
        "<SCRIPT TYPE='application/ld+json' async>{\"@type\": \"Article\"}</SCRIPT>",
        '<script type="application/ld+json">{"@type": "Broken", </script>',
        '<script type="application/ld+json">{"@type": ["A","B"], "name": "x"}</script>',
        "plain page, no structured data",
        # two blocks, document order must hold
        '<script type="application/ld+json">{"@type": "First"}</script>'
        '<p>mid</p>'
        '<script type="application/ld+json">{"@type": "Second"}</script>',
    ]
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(6), "html": html}))
    got = [
        tuple(r)
        for r in jsonld_entities(df).orderBy("doc_id", "pos").collect()
    ]
    assert got == [
        (0, 0, "Product", "W 5"),
        (1, 0, "Article", None),  # single-quoted attr, extra attr, caps tag
        (2, 0, None, None),  # malformed JSON nulls, never dies
        (3, 0, '["A","B"]', "x"),  # @type array -> raw JSON text (doc cap)
        (5, 0, "First", None),  # doc 4 dropped entirely (no block)
        (5, 1, "Second", None),
    ]
    # blocks column form: empty array, not null, for block-free pages
    n_empty = (
        df.select(jsonld_blocks(F.col("html")).alias("b"))
        .where(F.size("b") == 0)
        .count()
    )
    assert n_empty == 1


def test_extract_tables_matrix(spark):
    from log_analysis_spark.functions.html import extract_tables

    pages = [
        # uppercase tag, attrs, th+td, inner markup, padded cell, 2 rows
        (1, '<TABLE class="x"><tr><td> a </td><th><b>b</b></th></tr>'
            "<tr><td>c\n\td</td></tr></table>"),
        # two tables; second has an empty cell
        (2, "<table><tr><td>1</td></tr></table>"
            "<table><tr><td>2</td><td></td></tr></table>"),
        # unclosed table -> skipped entirely
        (3, "<table><tr><td>broken"),
        # no table at all -> no rows (relation, not inventory)
        (4, "<p>nothing</p>"),
        # row without cells -> empty cells array
        (5, "<table><tr>bare</tr></table>"),
    ]
    df = spark.createDataFrame(pages, ["doc_id", "html"])
    got = {
        (r["doc_id"], r["table_idx"], r["row_idx"]): r["cells"]
        for r in extract_tables(df).collect()
    }
    assert got[(1, 0, 0)] == ["a", "b"]
    assert got[(1, 0, 1)] == ["c d"]
    assert got[(2, 0, 0)] == ["1"]
    assert got[(2, 1, 0)] == ["2", ""]
    assert got[(5, 0, 0)] == []
    assert not any(k[0] in (3, 4) for k in got)


def test_extract_tables_no_shuffle(spark):
    from log_analysis_spark.functions.html import extract_tables

    df = spark.createDataFrame([(1, "<table><tr><td>x</td></tr></table>")],
                               ["doc_id", "html"])
    plan = extract_tables(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
