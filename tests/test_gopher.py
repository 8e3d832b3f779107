"""Gopher quality rules: each rule triggered in isolation against a
passing control document, Python cross-check of the statistics, null
and empty handling, pure-codegen plan shape."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.gopher import (
    REQUIRED_STOPWORDS,
    gopher_filter,
    gopher_quality_struct,
)

# 60 words, mean word length in range, stopwords present, no symbols
GOOD = (
    "The history of the river and the city is long and the people have "
    "lived with the water for many years . They built homes that stood "
    "beside the banks and the trade routes grew with the seasons . Many "
    "ships came to the port and the market was full of goods from far "
    "lands ."
)


def _stats(spark, text):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(gopher_quality_struct(F.col("text")).alias("g"))
        .collect()[0]["g"]
    )


def test_good_doc_passes_all(spark):
    g = _stats(spark, GOOD)
    assert g["keep"] is True
    n_words = len(GOOD.split())
    assert g["word_count"] == n_words
    assert g["mean_word_len"] == pytest.approx(
        sum(len(w) for w in GOOD.split()) / n_words, abs=1e-6
    )
    assert g["req_stopword_hits"] >= 2
    assert g["alpha_word_frac"] < 1.0  # the bare '.' tokens


def test_each_rule_fires_in_isolation(spark):
    short = "the quick brown fox has to be with that"  # <50 words
    g = _stats(spark, short)
    assert g["ok_word_count"] is False and g["keep"] is False
    assert g["ok_stopwords"] is True

    long_words = " ".join(["the with have that to be of and"] * 8 + [
        "pneumonoultramicroscopic" * 3] * 60)
    g = _stats(spark, long_words)
    assert g["ok_mean_word_len"] is False

    hashy = GOOD + " " + "# " * 20
    g = _stats(spark, hashy)
    assert g["ok_symbol_ratio"] is False
    assert g["symbol_word_ratio"] > 0.1

    bullets = "\n".join(["• item " + GOOD[:20]] * 19 + ["plain line"])
    g = _stats(spark, bullets)
    assert g["bullet_line_frac"] == pytest.approx(0.95)
    assert g["ok_bullet_lines"] is False

    dots = "\n".join([GOOD[:30] + " ..."] * 4 + [GOOD[:30]] * 6)
    g = _stats(spark, dots)
    assert g["ellipsis_line_frac"] == pytest.approx(0.4)
    assert g["ok_ellipsis_lines"] is False

    nums = " ".join(str(i) for i in range(80)) + " the of and to be"
    g = _stats(spark, nums)
    assert g["ok_alpha_words"] is False
    assert g["alpha_word_frac"] < 0.2

    nostop = " ".join(["apple banana cherry grape melon"] * 15)
    g = _stats(spark, nostop)
    assert g["req_stopword_hits"] == 0
    assert g["ok_stopwords"] is False


def test_stopword_hits_counts_distinct_required(spark):
    g = _stats(spark, "the " * 60)  # one stopword, many times
    assert g["req_stopword_hits"] == 1
    g = _stats(spark, " ".join(REQUIRED_STOPWORDS * 10))
    assert g["req_stopword_hits"] == 8


def test_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, GOOD)],
                               "id bigint, text string")
    rows = {r["id"]: r["g"] for r in df.select(
        "id", gopher_quality_struct(F.col("text")).alias("g")).collect()}
    assert rows[1] is None
    assert rows[2]["word_count"] == 0
    assert rows[2]["keep"] is False
    kept = gopher_filter(df).collect()
    assert [r["id"] for r in kept] == [3]


def test_pure_codegen_plan(spark):
    df = spark.createDataFrame([(GOOD,)], "text string")
    plan = (
        gopher_filter(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def _r12_struct(col):
    """Replica of the r12 formulation (interpreted HOFs + per-word /
    per-stopword regex scans) — the differential reference for the r13
    codegen'd single-pass rewrites."""
    words = F.filter(F.split(F.trim(col), r"\s+"), lambda w: F.length(w) > 0)
    n_w = F.size(words).cast("double")
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ).cast("double")
    mean_wl = F.when(n_w > 0, total_chars / n_w)
    n_sym = (
        F.regexp_count(col, F.lit("#"))
        + F.regexp_count(col, F.lit(r"(\.\.\.|…)"))
    ).cast("double")
    sym_ratio = F.when(n_w > 0, n_sym / n_w)
    alpha_frac = F.when(
        n_w > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / n_w,
    )
    low = F.lower(col)
    stop_hits = sum(
        (
            F.when(low.rlike(rf"\b{w}\b"), 1).otherwise(0)
            for w in REQUIRED_STOPWORDS
        ),
        F.lit(0),
    ).cast("int")
    return F.when(
        col.isNotNull(),
        F.struct(
            n_w.cast("bigint").alias("word_count"),
            F.round(mean_wl, 6).alias("mean_word_len"),
            F.round(sym_ratio, 6).alias("symbol_word_ratio"),
            F.round(alpha_frac, 6).alias("alpha_word_frac"),
            stop_hits.alias("req_stopword_hits"),
        ),
    )


def test_r13_rewrites_match_r12_formulation(spark):
    """The r13 single-pass rewrites (array_remove words, regexp_replace
    char count, merged symbol alternation, one-pass alpha words, one-pass
    stopword presence) must be cell-identical to the r12 HOF formulation
    on testdata documents plus adversarial edge strings."""
    edge = [
        (None,), ("",), ("   ",), ("\t\n",), ("a",), ("# # #...…..",),
        ("the the the be to of and that have with",),
        ("that theory bethe tothe ....",), ("x y the.be,to",),
        ("....... …… #",), ("123 456 !!! abc",),
    ]
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base = docs.select(F.col("text")).union(
        spark.createDataFrame(edge, "text string")
    )
    got = base.select(
        gopher_quality_struct(F.col("text")).alias("g"),
        _r12_struct(F.col("text")).alias("r"),
    )
    bad = got.where(
        ~(
            F.col("g.word_count").eqNullSafe(F.col("r.word_count"))
            & F.col("g.mean_word_len").eqNullSafe(F.col("r.mean_word_len"))
            & F.col("g.symbol_word_ratio").eqNullSafe(
                F.col("r.symbol_word_ratio"))
            & F.col("g.alpha_word_frac").eqNullSafe(
                F.col("r.alpha_word_frac"))
            & F.col("g.req_stopword_hits").eqNullSafe(
                F.col("r.req_stopword_hits"))
        )
    ).count()
    assert bad == 0
