"""Differential tests pinning doc_metrics_struct (the fused Arrow pass,
r7) against the unfused expression/UDF forms it replaced — any
tokenization or math drift between the Python kernel and the JVM
expressions breaks the txt_metrics oracle, so every branch is pinned on
adversarial strings: NULL, empty, whitespace-only, tab-padded (Java
trim strips spaces only), repeated tokens, unicode (case folding,
non-ASCII whitespace must NOT split under Java-ASCII \\s), emoji, and
multi-language stopwords."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.text_analysis import (
    _stopword_hits_vec,
    doc_metrics_struct,
    language_id,
    quality_score,
    repetition_metrics,
    rolling_fingerprint,
    unigram_logprob,
    unigram_logprob_from_counts,
)

TRICKY = [
    None,
    "",
    " ",
    "\t",
    "  \t  ",
    "\tthe  quick\tbrown fox\t",
    "the the the the la le der",
    "a b a b a b a b",
    "single",
    "café Über 漢字 €uro",
    "a b nbsp stays one token",
    "\U0001f680 rocket emoji first",
    "der die das und la la la",
    "x " * 50 + "y",
]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRICKY)], "doc_id int, text string"
    )
    t = F.col("text")
    m = doc_metrics_struct(t, n=2)
    fused = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            m["swc"].alias("swc"),
            m["rfp"].alias("rfp"),
            m["n_ngrams"].alias("n_ngrams"),
            m["rep_top_frac"].alias("rep_top_frac"),
            m["rep_dup_frac"].alias("rep_dup_frac"),
            m["tc"].alias("tc"),
            language_id(t, hits=m["swc"]).alias("lang_hits"),
            quality_score(t, hits=m["swc"]).alias("quality_hits"),
        ).collect()
    }
    return df, fused


def test_fused_stopword_vector_matches_udf_form(spark, frames):
    df, fused = frames
    ref = {
        r["doc_id"]: r["swc"]
        for r in df.select(
            "doc_id", _stopword_hits_vec(F.col("text")).alias("swc")
        ).collect()
    }
    for i in ref:
        assert fused[i]["swc"] == ref[i], TRICKY[i]


def test_fused_rolling_fingerprint_matches_jvm_fold(spark, frames):
    df, fused = frames
    ref = {
        r["doc_id"]: r["rfp"]
        for r in df.select(
            "doc_id", rolling_fingerprint(F.col("text")).alias("rfp")
        ).collect()
    }
    for i in ref:
        assert fused[i]["rfp"] == ref[i], TRICKY[i]


def test_fused_repetition_matches_explode_form(spark, frames):
    df, fused = frames
    ref = {
        r["id"]: r.asDict()
        for r in repetition_metrics(df, text_col="text", id_col="doc_id", n=2)
        .collect()
    }
    for i in ref:
        assert fused[i]["n_ngrams"] == ref[i]["n_ngrams"], TRICKY[i]
        assert fused[i]["rep_top_frac"] == pytest.approx(
            ref[i]["rep_top_frac"]), TRICKY[i]
        assert fused[i]["rep_dup_frac"] == pytest.approx(
            ref[i]["rep_dup_frac"]), TRICKY[i]


def test_fused_langid_quality_match_unfused(spark, frames):
    df, fused = frames
    ref = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            language_id(F.col("text")).alias("lang"),
            quality_score(F.col("text")).alias("quality"),
        ).collect()
    }
    for i in ref:
        assert fused[i]["lang_hits"] == ref[i]["lang"], TRICKY[i]
        assert fused[i]["quality_hits"] == pytest.approx(
            ref[i]["quality"]), TRICKY[i]


def test_count_map_lm_matches_instance_lm(spark, frames):
    df, fused = frames
    t = F.col("text")
    m = doc_metrics_struct(t, n=2)
    entries = df.select(
        "doc_id", m["tc"].alias("tc")
    ).select("doc_id", F.explode_outer("tc").alias("w", "cnt"))
    got = {
        r["id"]: r.asDict()
        for r in unigram_logprob_from_counts(entries, id_col="doc_id").collect()
    }
    ref = {
        r["id"]: r.asDict()
        for r in unigram_logprob(df, text_col="text", id_col="doc_id").collect()
    }
    assert set(got) == set(ref)
    for i in ref:
        assert got[i]["n_tokens"] == ref[i]["n_tokens"], TRICKY[i]
        if ref[i]["avg_logprob"] is None:
            assert got[i]["avg_logprob"] is None, TRICKY[i]
        else:
            assert got[i]["avg_logprob"] == pytest.approx(
                ref[i]["avg_logprob"], abs=1e-9), TRICKY[i]


def test_fused_parity_on_random_adversarial_corpus(spark):
    """300 seeded random strings over a whitespace/unicode-heavy alphabet
    (ASCII ws, NBSP, ideographic space, CJK, emoji, accents, stopwords,
    punctuation, digits) — every fused field must match its unfused form
    on all of them. Broader net than the hand-picked TRICKY list; seeded
    so failures reproduce."""
    import random

    rng = random.Random(1234)
    atoms = (
        ["the", "la", "der", "el", "und", "que", "is"] * 3
        + [" ", "  ", "\t", "\n", "\r", "\x0b", "\x0c"] * 4
        + [" ", "　", "漢", "字", "🚀", "é", "Ü", "ß", "İ"]
        + [".", ",", "!", "a", "B", "zz", "42", "x7", ""]
    )
    texts = [
        "".join(rng.choice(atoms) for _ in range(rng.randrange(0, 60)))
        for _ in range(298)
    ] + [None, ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    t = F.col("text")
    m = doc_metrics_struct(t, n=2)
    fused = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id", m["swc"].alias("swc"), m["rfp"].alias("rfp"),
            m["n_ngrams"].alias("n_ngrams"),
            m["rep_top_frac"].alias("rep_top_frac"),
            m["rep_dup_frac"].alias("rep_dup_frac"),
        ).collect()
    }
    ref_base = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            _stopword_hits_vec(t).alias("swc"),
            rolling_fingerprint(t).alias("rfp"),
        ).collect()
    }
    ref_rep = {
        r["id"]: r.asDict()
        for r in repetition_metrics(df, text_col="text", id_col="doc_id", n=2)
        .collect()
    }
    mismatches = []
    for i in range(len(texts)):
        if fused[i]["swc"] != ref_base[i]["swc"]:
            mismatches.append((i, "swc", texts[i]))
        if fused[i]["rfp"] != ref_base[i]["rfp"]:
            mismatches.append((i, "rfp", texts[i]))
        if fused[i]["n_ngrams"] != ref_rep[i]["n_ngrams"]:
            mismatches.append((i, "n_ngrams", texts[i]))
        for frac in ("rep_top_frac", "rep_dup_frac"):
            a, b = fused[i][frac], ref_rep[i][frac]
            # None and 0.0 are DIFFERENT answers — don't conflate them
            if (a is None) != (b is None) or (
                a is not None and abs(a - b) > 1e-12
            ):
                mismatches.append((i, frac, texts[i]))
    assert not mismatches, mismatches[:5]


def test_lm_shuffle_join_path_equals_broadcast_path(spark, frames):
    """max_vocab below the vocabulary size forces the non-broadcast
    (AQE shuffle join) branch — results must be identical to the
    broadcast branch (it's a pure plan-strategy gate, not semantics)."""
    df, _ = frames
    t = F.col("text")
    m = doc_metrics_struct(t, n=2)
    entries = df.select("doc_id", m["tc"].alias("tc")).select(
        "doc_id", F.explode_outer("tc").alias("w", "cnt")
    )
    wide = {
        r["id"]: r.asDict()
        for r in unigram_logprob_from_counts(
            entries, id_col="doc_id", max_vocab=5_000_000
        ).collect()
    }
    narrow = {
        r["id"]: r.asDict()
        for r in unigram_logprob_from_counts(
            entries, id_col="doc_id", max_vocab=1
        ).collect()
    }
    assert set(wide) == set(narrow)
    for i in wide:
        assert wide[i]["n_tokens"] == narrow[i]["n_tokens"]
        if wide[i]["avg_logprob"] is None:
            assert narrow[i]["avg_logprob"] is None
        else:
            assert narrow[i]["avg_logprob"] == pytest.approx(
                wide[i]["avg_logprob"], abs=1e-9)


def test_fused_trigram_repetition_matches_explode_form(spark, frames):
    """The fused kernel is cached per (n, modulus); the n=3 instance
    must agree with repetition_metrics(n=3) just like n=2 does."""
    df, _ = frames
    m = doc_metrics_struct(F.col("text"), n=3)
    fused = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id", m["n_ngrams"].alias("n_ngrams"),
            m["rep_top_frac"].alias("rep_top_frac"),
            m["rep_dup_frac"].alias("rep_dup_frac"),
        ).collect()
    }
    ref = {
        r["id"]: r.asDict()
        for r in repetition_metrics(df, text_col="text", id_col="doc_id", n=3)
        .collect()
    }
    for i in ref:
        assert fused[i]["n_ngrams"] == ref[i]["n_ngrams"], TRICKY[i]
        assert fused[i]["rep_top_frac"] == pytest.approx(
            ref[i]["rep_top_frac"]), TRICKY[i]
        assert fused[i]["rep_dup_frac"] == pytest.approx(
            ref[i]["rep_dup_frac"]), TRICKY[i]
