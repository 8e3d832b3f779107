"""Byte-bigram LM tests: hand-computed probabilities, distributed
training vs a python twin, scoring vectorization equivalence, and the
separation property the filter exists for (in-domain text scores far
lower perplexity than gibberish)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.charlm import (
    CharLm,
    char_lm_logprob,
    char_lm_perplexity,
    filter_by_perplexity,
    train_char_lm,
)


def _twin_counts(texts):
    m = np.zeros((257, 256), dtype=np.int64)
    for t in texts:
        bs = t.encode("utf-8")
        if not bs:
            continue
        m[256, bs[0]] += 1
        for a, b in zip(bs, bs[1:]):
            m[a, b] += 1
    return m


def test_hand_computed_bigram_probability():
    # corpus "ab" x3: counts: BOS->a 3, a->b 3. add_k=0.5.
    m = _twin_counts(["ab"] * 3)
    lm = CharLm(m, add_k=0.5)
    p_b_given_a = (3 + 0.5) / (3 + 0.5 * 256)
    p_a_bos = (3 + 0.5) / (3 + 0.5 * 256)
    want = (math.log(p_a_bos) + math.log(p_b_given_a)) / 2
    assert lm.logprob_per_byte("ab") == pytest.approx(want)
    assert lm.perplexity("ab") == pytest.approx(math.exp(-want))


def test_empty_text_convention():
    lm = CharLm(np.zeros((257, 256)), add_k=1.0)
    assert lm.logprob_per_byte("") == 0.0
    assert lm.perplexity("") == 1.0


def test_counts_shape_guard():
    with pytest.raises(ValueError, match="257, 256"):
        CharLm(np.zeros((256, 256)))


def test_distributed_training_equals_twin(spark, documents):
    docs = documents.limit(100)
    lm = train_char_lm(docs, "text")
    texts = [r["text"] for r in docs.select("text").collect()]
    twin = CharLm(_twin_counts(texts))
    assert np.array_equal(lm.counts, twin.counts)


def test_column_scoring_matches_model(spark, documents):
    docs = documents.limit(40)
    lm = train_char_lm(docs, "text")
    rows = docs.select(
        "text",
        char_lm_logprob("text", lm).alias("lp"),
        char_lm_perplexity("text", lm).alias("ppl"),
    ).collect()
    for r in rows:
        assert r["lp"] == pytest.approx(lm.logprob_per_byte(r["text"]))
        assert r["ppl"] == pytest.approx(lm.perplexity(r["text"]))


def test_in_domain_beats_gibberish_and_filter(spark, documents):
    lm = train_char_lm(documents.limit(200), "text")
    sample = [r["text"] for r in documents.limit(20).collect()]
    in_ppl = max(lm.perplexity(t) for t in sample)
    garbage = "\x07q#Z\x91\xc4jW\x00\xfe!!zzQQ\x13\x84" * 8
    assert lm.perplexity(garbage) > 4 * in_ppl

    df = spark.createDataFrame(
        [(1, sample[0]), (2, garbage), (3, None)], "k bigint, text string"
    )
    kept = filter_by_perplexity(df, "text", lm, max_ppl=in_ppl * 2)
    assert [r["k"] for r in kept.collect()] == [1]


def test_null_and_empty_scoring(spark):
    lm = CharLm(np.zeros((257, 256)), add_k=1.0)
    df = spark.createDataFrame([(None,), ("",)], "t string")
    got = df.select(char_lm_logprob("t", lm).alias("lp")).collect()
    assert got[0]["lp"] is None
    assert got[1]["lp"] == 0.0
