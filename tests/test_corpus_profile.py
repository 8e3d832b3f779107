"""document_profile: exact numbers on a hand-built corpus (small
enough that the percentile sketch is exact), dup-rate math, language
mix, null handling, and the real documents table smoke."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.corpus import document_profile


def test_hand_corpus_numbers(spark):
    docs = [
        (1, "one two three", "en"),        # 3 tokens, 13 bytes
        (2, "one two three", "en"),        # exact dup of 1
        (3, "a b c d", "en"),              # 4 tokens
        (4, "uno dos", "es"),              # 2 tokens
        (5, None, "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, lang string")
    p = document_profile(df, lang_col="lang")
    assert p["n_docs"] == 5
    assert p["null_text"] == 1
    assert p["total_tokens"] == 3 + 3 + 4 + 2
    assert p["total_bytes"] == 13 + 13 + 7 + 7
    assert p["tokens"]["min"] == 0  # the null doc coalesces to 0
    assert p["tokens"]["max"] == 4
    assert p["tokens"]["p50"] == 3
    # 4 non-null docs, 3 distinct texts → dup rate 1/4
    assert p["exact_dup_rate"] == pytest.approx(0.25)
    assert p["languages"][0] == ("en", 3)
    assert ("es", 1) in p["languages"]
    assert 0.0 <= p["quality"]["mean"] <= 1.0


def test_derived_language(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs"),],
        "doc_id bigint, text string",
    )
    p = document_profile(df)
    assert p["languages"][0][0] == "en"


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id bigint, text string")
    p = document_profile(df)
    assert p["n_docs"] == 0
    assert p["exact_dup_rate"] == 0.0
    assert p["languages"] == []


def test_domain_profile(spark):
    from dataforge_spark.corpus import domain_profile

    rows = [
        (f"http://spamfarm.example/p{i}", "same boilerplate text here")
        for i in range(6)
    ] + [
        (f"http://good.example/a{i}", f"unique article number {i} with words")
        for i in range(4)
    ] + [
        ("not a url", "dropped row"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = domain_profile(df, "url", "text", k=5).collect()
    assert [r["domain"] for r in out] == ["spamfarm.example", "good.example"]
    spam, good = out
    assert spam["n_docs"] == 6
    # all six docs identical → 1 distinct of 6
    assert spam["dup_rate"] == pytest.approx(1 - 1 / 6, abs=1e-6)
    assert good["dup_rate"] == 0.0
    assert good["total_tokens"] > 0


def test_documents_table_smoke(spark, documents):
    p = document_profile(documents, lang_col="lang")
    assert p["n_docs"] == documents.count()
    assert p["total_tokens"] > 0
    assert p["tokens"]["p25"] <= p["tokens"]["p50"] <= p["tokens"]["p75"]
    assert len(p["languages"]) >= 1


def test_common_lines_boilerplate_miner(spark):
    from dataforge_spark.corpus import common_lines

    banner = "Accept our cookies to continue"
    footer = "  COPYRIGHT   2026 Example Corp  "
    docs = []
    for i in range(12):
        body = f"unique article text number {i} with several words"
        # banner appears TWICE in some docs — must count once per doc
        extra = (banner + "\n") if i % 2 else ""
        docs.append((i, f"{banner}\n{extra}{body}\n{footer}"))
    docs.append((99, "no shared lines in this document at all"))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")

    out = common_lines(df, min_docs=10, k=10).collect()
    got = {r["line"]: r["n_docs"] for r in out}
    assert got[banner.lower()] == 12  # per-doc distinct, not 18
    assert got["copyright 2026 example corp"] == 12  # normalized
    assert len(got) == 2  # unique bodies filtered by min_docs
