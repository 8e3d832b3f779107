"""DSIR importance-resampling tests (functions/dsir.py): feature
hashing contract, fit validation, integer-exact weights under any
partitioning, selection semantics (determinism, without-replacement,
weight-responsiveness), and the published-recipe sanity check that
target-like documents up-weight."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.dsir import (
    MICRO,
    DsirModel,
    dsir_select,
    dsir_weights,
    fit_dsir,
    gram_buckets,
)
from dataforge_spark.functions.xxh64 import xxh64_str


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(200):
        if i % 2 == 0:
            rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
        else:
            rows.append((i, "der schnelle braune fuchs springt sehr hoch", "de"))
    rows.append((200, None, "en"))
    rows.append((201, "   ", "en"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).cache()


def test_gram_buckets_matches_pure_python(spark):
    df = spark.createDataFrame(
        [(0, "Alpha beta  GAMMA"), (1, ""), (2, None), (3, "one")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["b"] for r in df.select(
        "doc_id", gram_buckets(F.col("text"), 97, seed=5).alias("b")
    ).collect()}

    def py_buckets(text):
        ws = (text or "").lower().strip().split()
        grams = ws + [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]
        return [xxh64_str(f"5\x1f{g}") % 97 for g in grams]

    assert got[0] == py_buckets("Alpha beta  GAMMA")
    assert got[0][:3] == py_buckets("alpha beta gamma")[:3]  # lowercased
    assert got[1] == [] and got[2] == [] and got[3] == py_buckets("one")


def test_fit_rejects_empty(spark):
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty gram counts"):
        fit_dsir(empty, empty, n_buckets=64)


def test_weights_integer_exact_and_partitioning_invariant(corpus):
    target = corpus.where(F.col("lang") == "en")
    model = fit_dsir(target, corpus, n_buckets=512, seed=3)
    w1 = {r["doc_id"]: r["dsir_logw_micro"]
          for r in dsir_weights(corpus, model).collect()}
    w2 = {r["doc_id"]: r["dsir_logw_micro"]
          for r in dsir_weights(corpus.repartition(17), model).collect()}
    assert w1 == w2  # integer micro-nat sums: bit-identical by design
    assert len(w1) == 202
    assert w1[200] == 0 and w1[201] == 0  # no grams → weight 0
    # the published behavior: English docs (the target) score higher
    en = np.mean([w1[i] for i in range(0, 200, 2)])
    de = np.mean([w1[i] for i in range(1, 200, 2)])
    assert en > de
    # weights equal the hand-computed table lookup for one doc
    text = "the quick brown fox jumps over the lazy dog"
    ws = text.split()
    grams = ws + [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]
    expected = sum(
        int(model.ratio_micro[xxh64_str(f"3\x1f{g}") % 512]) for g in grams
    )
    assert w1[0] == expected


def test_select_deterministic_without_replacement(corpus):
    target = corpus.where(F.col("lang") == "en")
    model = fit_dsir(target, corpus, n_buckets=512, seed=3)
    a = dsir_select(corpus, model, 20, seed=9).collect()
    b = dsir_select(corpus.repartition(7), model, 20, seed=9).collect()
    assert [(r["doc_id"], r["rank"]) for r in a] == \
        [(r["doc_id"], r["rank"]) for r in b]
    ids = [r["doc_id"] for r in a]
    assert len(ids) == len(set(ids)) == 20
    assert sorted(r["rank"] for r in a) == list(range(1, 21))
    # keys strictly order the output
    keys = [r["key_micro"] for r in sorted(a, key=lambda r: r["rank"])]
    assert keys == sorted(keys, reverse=True)
    # a different seed reshuffles the Gumbel noise
    c = dsir_select(corpus, model, 20, seed=10).collect()
    assert {r["doc_id"] for r in c} != set(ids) or \
        [(r["doc_id"], r["rank"]) for r in c] != \
        [(r["doc_id"], r["rank"]) for r in a]


def test_select_follows_weights(spark):
    # two disjoint vocabularies; target matches vocab A → selection must
    # be dominated by A-docs despite Gumbel noise
    rows = [(i, "alpha bravo charlie delta echo", "t") for i in range(50)]
    rows += [(50 + i, "zulu yankee xray whiskey victor", "o") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = fit_dsir(df.where(F.col("lang") == "t"), df, n_buckets=256)
    sel = dsir_select(df, model, 30, seed=1).collect()
    n_target_like = sum(1 for r in sel if r["doc_id"] < 50)
    assert n_target_like >= 25


def test_model_shape(corpus):
    model = fit_dsir(corpus.limit(10), corpus, n_buckets=128, seed=0)
    assert isinstance(model, DsirModel)
    assert model.ratio_micro.shape == (128,)
    assert model.ratio_micro.dtype == np.int64
    assert model.n_raw_grams >= model.n_target_grams > 0
    # micro-nat quantization: |table| values are plausible log-ratios
    assert np.abs(model.ratio_micro).max() < 30 * MICRO
