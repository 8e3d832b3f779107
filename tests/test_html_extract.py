"""HTML → text extraction tests: parser semantics (script/style
subtrees, entities, block vs inline boundaries, malformed markup,
titles, links) plus the Spark column API."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.html import (
    _parse,
    html_links,
    html_title,
    html_to_text,
)


def _text(doc):
    return _parse(doc).text()


def test_block_vs_inline_boundaries():
    doc = "<div>alpha <b>beta</b> gamma</div><p>delta</p><span>eps</span>"
    assert _text(doc) == "alpha beta gamma\ndelta\neps"


def test_script_style_head_dropped_entities_decoded():
    doc = (
        "<html><head><title>T &amp; t</title><style>p{a:1}</style>"
        "<script>if (x<3) y='<p>not text</p>';</script></head>"
        "<body><p>A &lt;tag&gt; &amp; &#39;quote&#39;</p></body></html>"
    )
    assert _text(doc) == "A <tag> & 'quote'"
    assert _parse(doc).title() == "T & t"


def test_nested_skip_and_unbalanced_end_tags():
    doc = "<noscript><div>hidden</div></noscript></script>visible"
    assert _text(doc) == "visible"


def test_br_and_selfclosing():
    assert _text("one<br>two<br/>three") == "one\ntwo\nthree"


def test_whitespace_collapse_and_blank_lines():
    doc = "<p>  a   b\t c </p>\n\n\n<p>   </p><p>d</p>"
    assert _text(doc) == "a b c\nd"


def test_links_in_document_order_and_missing_href():
    doc = (
        '<a href="/one">1</a><a name="x">no href</a>'
        '<a href="https://two.example/p?q=2#f">2</a><a href="">empty</a>'
    )
    assert _parse(doc).links == ["/one", "https://two.example/p?q=2#f"]


def test_attribute_with_gt_survives():
    # a regex tag-stripper breaks on '>' inside an attribute value
    doc = '<div title="a>b">content</div>'
    assert _text(doc) == "content"


def test_malformed_html_is_lenient():
    assert _text("<div><p>unclosed everything") == "unclosed everything"
    assert _text("") == ""
    assert _text("plain no tags") == "plain no tags"


def test_no_title_returns_none():
    assert _parse("<p>x</p>").title() is None


def test_spark_columns_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, "<html><head><title> Hi  there </title></head>"
                "<body><div>A</div><a href='u1'>l</a></body></html>"),
            (2, None),
        ],
        "k bigint, page string",
    )
    out = df.select(
        "k",
        html_to_text("page").alias("txt"),
        html_title(F.col("page")).alias("ttl"),
        html_links("page").alias("links"),
    ).orderBy("k").collect()
    assert out[0]["txt"] == "A\nl"
    assert out[0]["ttl"] == "Hi there"
    assert out[0]["links"] == ["u1"]
    assert out[1]["txt"] is None and out[1]["ttl"] is None
    assert out[1]["links"] is None


def test_html_extract_struct_single_parse(spark):
    from dataforge_spark.functions.html import html_extract

    df = spark.createDataFrame(
        [("<html><head><title>T</title></head><body><p>B</p>"
          "<a href='u'>l</a></body></html>",), (None,)],
        "page string",
    )
    ext = html_extract("page")
    out = df.select(
        ext["text"].alias("t"), ext["title"].alias("ti"),
        ext["links"].alias("l"),
    ).collect()
    assert out[0]["t"] == "B\nl" and out[0]["ti"] == "T" and out[0]["l"] == ["u"]
    assert out[1]["t"] is None and out[1]["ti"] is None and out[1]["l"] is None
    # the three field references collapse to ONE ArrowEvalPython call
    plan = (
        df.select(ext["text"], ext["title"], ext["links"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
