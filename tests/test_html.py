"""HTML -> text extraction (functions/html.py): hand-built pages pin
each rule (script/style content dropped, comments, block tags to
newlines, inline tags to spaces, single-pass entity decode order,
title/link stats); the cross-engine chain itself is hash-verified by
the html_extract staged oracle in test_rotated_contract.py."""

import pytest
from pyspark.sql import functions as F


def _extract(spark, html):
    from letsearch_spark.functions.html import html_to_text

    df = spark.createDataFrame([(html,)], "page string")
    return df.select(html_to_text(F.col("page")).alias("t")).first()["t"]


def test_script_style_content_dropped(spark):
    out = _extract(
        spark,
        "<p>keep</p><script>var x = 1 < 2;</script>"
        "<STYLE type='x'>p { color: red }</style><p>also</p>",
    )
    assert out == "keep\nalso"
    assert "color" not in out and "var" not in out


def test_comments_and_block_tags(spark):
    out = _extract(
        spark,
        "<!-- top\nsecret --><h1>Title</h1><ul><li>a</li><li>b</li></ul>",
    )
    assert out == "Title\na\nb"


def test_inline_tags_do_not_glue_words(spark):
    assert (
        _extract(spark, "hello<b>world</b> <em>x</em>y")
        == "hello world x y"
    )


def test_entity_decode_single_pass(spark):
    # &amp; decodes LAST: '&amp;lt;' must become the literal '&lt;',
    # never '<' (double-decode would re-open a tag)
    out = _extract(spark, "<p>a &amp;lt; b &amp; c &lt;tag&gt; &nbsp;d</p>")
    assert out == "a &lt; b & c <tag> d"


def test_null_and_empty(spark):
    from letsearch_spark.functions.html import html_link_count, html_to_text

    df = spark.createDataFrame([(None,), ("",)], "page string")
    rows = df.select(
        html_to_text(F.col("page")).alias("t"),
        html_link_count(F.col("page")).alias("n"),
    ).collect()
    assert [(r["t"], r["n"]) for r in rows] == [("", 0), ("", 0)]


def test_title_and_links(spark):
    from letsearch_spark.functions.html import (
        html_link_count,
        html_link_density,
        html_title,
    )

    page = (
        "<html><head><title> The &amp; Title \n here </title></head>"
        '<body>one two three four<a href="/a">a</a>'
        "<a class=x href='/b'>b</a><a name=no-href>c</a></body></html>"
    )
    df = spark.createDataFrame([(page,)], "page string")
    row = df.select(
        html_title(F.col("page")).alias("title"),
        html_link_count(F.col("page")).alias("n"),
        html_link_density(F.col("page")).alias("d"),
    ).first()
    assert row["title"] == "The & Title here"
    assert row["n"] == 2  # href-less anchor doesn't count
    # words: 'The & Title here one two three four a b c' -> density 2/11
    assert row["d"] == pytest.approx(round(2 / 11, 6))


def test_extraction_is_scan_only(spark, sf_dir):
    """Like c4_page_filter: the whole chain must stay inside the scan
    projection -- no exchange, no UDF (100 TB shape: extraction cost is
    per-byte, shuffle cost zero)."""
    from letsearch_spark.functions.html import html_to_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        docs.select("doc_id", html_to_text(F.col("text")).alias("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fuzz_cross_engine_parity(spark):
    """Adversarial fuzz of the extraction chain: 300 generated pages
    (nested/unclosed/attribute-laden tags, scripts, comments, entities,
    unicode, stray '>' ) must extract IDENTICALLY in Spark (Java regex)
    and DuckDB (RE2) -- the property the whole module stakes its oracle
    on. Entities that decode to angle brackets are excluded: decode is
    deliberately single-pass AFTER tag stripping, so '&lt;b&gt;' becomes
    the literal text '<b>' in both engines (covered by the example test)
    but would trip the no-tags scan here."""
    import random

    import duckdb

    from letsearch_spark.functions.html import html_to_text, oracle_sql_chain

    rng = random.Random(0)
    words = ["alpha", "bravo", "café", "世界", "x1", ">", "a.b", "tail"]
    tags = [
        "<p>", "</p>", "<div class='x y'>", "</div>", "<br/>", "<BR>",
        "<span>", "</span>", "<b>", "</b>", "<li>", "</li>",
        "<script>", "</script>", "<style>", "</style>",
        "<script type='text/js'>var a=1;</script>",
        "<!-- c -->", "<!--", "-->", "<div", "<h2 >", "</h2>",
        "<a href='/x'>", "</a>", "<td>", "</td>",
    ]
    entities = ["&amp;", "&nbsp;", "&quot;", "&#39;", "&amp;lt;"]
    pages = []
    for i in range(300):
        parts = []
        for _ in range(rng.randint(0, 30)):
            r = rng.random()
            if r < 0.45:
                parts.append(rng.choice(words))
            elif r < 0.85:
                parts.append(rng.choice(tags))
            else:
                parts.append(rng.choice(entities))
            if rng.random() < 0.3:
                parts.append(" ")
        pages.append((i, "".join(parts)))

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(pages, "i long, page string")
    got = {
        r["i"]: r["t"]
        for r in sdf.select("i", html_to_text(F.col("page")).alias("t")).collect()
    }

    con = duckdb.connect()
    con.register("pages_tbl", __import__("pandas").DataFrame(pages, columns=["i", "page"]))
    want = dict(
        con.sql(
            f"SELECT i, {oracle_sql_chain('page')} AS t FROM pages_tbl"
        ).fetchall()
    )
    mismatches = {i: (got[i], want[i]) for i in got if got[i] != want[i]}
    assert not mismatches, list(mismatches.items())[:3]


def test_fuzz_c4_cross_engine_parity(spark):
    """Same fuzz discipline for the C4 chain (functions/text.py
    c4_clean_lines + c4_flags vs the DuckDB replay inside the
    c4_page_filter oracle): 300 generated pages of sentences,
    fragments, javascript/lorem/brace tells, curly quotes, and unicode
    words must clean and judge identically. Generator excludes \\x0B:
    Java's \\s contains it, RE2's does not -- the same documented
    engine-class gap as \\b (functions/text.py scrub note)."""
    import random

    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from letsearch_spark.functions.text import c4_clean_lines, c4_flags

    rng = random.Random(1)
    enders = [".", "!", "?", '."', ".”", ".'", ".’", "", " .", ". "]
    fillers = [
        "the quick fox", "a line of prose here", "short", "深度 学习 语料",
        "click here to enable javascript", "JavaScript required",
        "lorem ipsum dolor", "code { braces }", "tail words go on and on",
    ]
    pages = []
    for i in range(300):
        lines = []
        for _ in range(rng.randint(0, 8)):
            lines.append(rng.choice(fillers) + rng.choice(enders))
        pages.append((i, "\n".join(lines)))

    sdf = spark.createDataFrame(pages, "i long, text string")
    cleaned = c4_clean_lines(F.col("text"), min_line_words=3)
    flags = c4_flags(cleaned, min_sentences=2)
    got = {
        r["i"]: (r["t"], r["n"], r["p"])
        for r in sdf.select(
            "i",
            cleaned.alias("t"),
            flags["n_sentences"].cast("long").alias("n"),
            flags["passes"].alias("p"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("fuzz_pages", pd.DataFrame(pages, columns=["i", "text"]))
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(r"""
            WITH cleaned AS (
                SELECT i,
                       coalesce(array_to_string(
                           list_filter(string_split(text, chr(10)), x ->
                               regexp_matches(x, '[.!?]["”''’]?\s*$')
                               AND len(regexp_split_to_array(trim(lower(x)), '\s+')) >= 3
                               AND NOT contains(lower(x), 'javascript')),
                           chr(10)), '') AS text
                FROM fuzz_pages
            ), judged AS (
                SELECT i, text,
                       CAST(len(regexp_extract_all(text, '[.!?]["”''’]?(\s|$)'))
                            AS BIGINT) AS n_sentences,
                       contains(lower(text), 'lorem ipsum') AS has_lorem,
                       contains(text, '{') AS has_brace
                FROM cleaned
            )
            SELECT i, text, n_sentences,
                   (n_sentences >= 2 AND NOT has_lorem AND NOT has_brace) AS passes
            FROM judged
        """).fetchall()
    }
    mismatches = {i: (got[i], want[i]) for i in got if got[i] != want[i]}
    assert not mismatches, list(mismatches.items())[:3]
