"""C4 cleaning rules: each line rule and page rule in isolation,
cleaned-text content, nulls, blocklist, pure-codegen plan shape."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.c4 import (
    c4_clean_text,
    c4_filter,
    c4_page_struct,
)

PAGE = "\n".join([
    "This is a proper sentence with enough words here.",   # kept
    "Another complete line that ends with punctuation!",   # kept
    "Does this line survive the cleaning pass too?",       # kept
    "short line.",                                         # <5 words
    "No terminal punctuation on this line at all",         # no terminal
    "Please enable JavaScript to view the comments.",      # javascript
    '"A quoted sentence can end with a quote mark."',      # kept
])


def _struct(spark, text, **kw):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(c4_page_struct(F.col("text"), **kw).alias("c"))
        .collect()[0]["c"]
    )


def test_line_rules(spark):
    c = _struct(spark, PAGE)
    assert c["n_lines_in"] == 7
    assert c["n_lines_kept"] == 4
    lines = c["text"].split("\n")
    assert len(lines) == 4
    assert "JavaScript" not in c["text"]
    assert "short line." not in c["text"]
    assert c["n_sentences"] == 4
    assert c["keep"] is True


def test_clean_text_column_matches_struct(spark):
    rows = (
        spark.createDataFrame([(PAGE,)], "text string")
        .select(
            c4_clean_text(F.col("text")).alias("t"),
            c4_page_struct(F.col("text"))["text"].alias("s"),
        )
        .collect()[0]
    )
    assert rows["t"] == rows["s"]


def test_page_rules(spark):
    two = ("One full sentence right here with words.\n"
           "A second full sentence with plenty of words.")
    c = _struct(spark, two)
    assert c["n_sentences"] == 2
    assert c["keep"] is False  # <3 sentences

    lorem = PAGE + "\nThe lorem ipsum dolor sit amet filler text sits here."
    assert _struct(spark, lorem)["keep"] is False

    brace = PAGE + "\nSome code like function() { return; } appears here."
    assert _struct(spark, brace)["keep"] is False

    blocked = _struct(spark, PAGE + "\nBuy cheap widgets online right now.",
                      blocklist=["cheap widgets"])
    assert blocked["keep"] is False

    # the block check runs on the RAW page (paper §2.2): a code line
    # with "{" has no terminal punctuation, so line cleaning strips it
    # — the page must still be dropped
    raw_brace = PAGE + "\nif (x) { y++ }"
    s = _struct(spark, raw_brace)
    assert "{" not in s["text"]  # line cleaning removed the code line
    assert s["keep"] is False  # …but the page is still blocked
    raw_block = _struct(spark, PAGE + "\nbad phrase",
                        blocklist=["bad phrase"])
    assert "bad phrase" not in raw_block["text"]
    assert raw_block["keep"] is False


def test_filter_rewrites_text(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, "too short."), (3, None)],
        "id bigint, text string",
    )
    out = c4_filter(df).collect()
    assert [r["id"] for r in out] == [1]
    assert out[0]["text"].count("\n") == 3  # the 4 kept lines


def test_thresholds_configurable(spark):
    c = _struct(spark, PAGE, min_line_words=2)
    assert c["n_lines_kept"] == 5  # 'short line.' now survives
    c = _struct(spark, PAGE, min_sentences=10)
    assert c["keep"] is False


def test_pure_codegen_plan(spark):
    df = spark.createDataFrame([(PAGE,)], "text string")
    plan = c4_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_filter_matches_r12_formulation(spark):
    """Differential pin (r13): the Generate-barrier c4_filter must be
    row-identical to the r12 withColumn+where formulation on every edge
    class (kept page, <3 sentences, blocked raw page, blocklist hit,
    null, empty string)."""
    rows = [
        (1, PAGE),
        (2, "too short."),
        (3, None),
        (4, ""),
        (5, PAGE + "\nif (x) { y++ }"),
        (6, PAGE + "\nBuy cheap widgets online right now."),
        (7, ("One full sentence right here with words.\n"
             "A second full sentence with plenty of words.")),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    for kw in ({}, {"blocklist": ["cheap widgets"]},
               {"min_line_words": 2, "min_sentences": 2}):
        s = c4_page_struct(F.col("text"), **kw)
        old = (
            df.withColumn("_c4", s)
            .where(F.coalesce(F.col("_c4")["keep"], F.lit(False)))
            .withColumn("text", F.col("_c4")["text"])
            .drop("_c4")
        )
        new = c4_filter(df, **kw)
        assert sorted(map(tuple, new.collect())) == \
            sorted(map(tuple, old.collect())), kw


def test_single_line_cleaning_evaluation(spark):
    """The r13 win itself: the line-cleaning machinery (its 'javascript'
    rule is a unique marker) must appear exactly ONCE in the physical
    plan — the keep-filter must reference the Generate's output instead
    of a pushed-down copy of the cleaning expression."""
    df = spark.createDataFrame([(PAGE,)], "text string")
    plan = c4_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan
    assert plan.count("javascript") == 1
