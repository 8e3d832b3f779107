"""Hashed n-gram logistic quality classifier (GPT-3 Appendix-A shape):
train separability, distributed-vs-local-twin parity, featurization
determinism, null handling, derandomized Pareto sampling, plan shape.
"""

import math
import random
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.quality_classifier import (
    HashedTextClassifier,
    _doc_buckets,
    _doc_features,
    filter_by_quality,
    pareto_keep,
    quality_prob,
    train_quality_classifier,
)

DIM = 1 << 12  # small dim keeps partial gradients tiny in tests


def _corpora():
    """Deterministic toy corpora: English-ish sentences vs gibberish."""
    rng = random.Random(7)
    words = (
        "the of and to in is was for on that with as it by at from "
        "science history music water light people city river stone"
    ).split()
    pos = [
        " ".join(rng.choice(words) for _ in range(rng.randint(8, 20)))
        for _ in range(120)
    ]
    neg = [
        "".join(rng.choice("qxzjvkw#$%@0123456789") for _ in range(rng.randint(30, 90)))
        for _ in range(120)
    ]
    return pos, neg


def _train_local(pos, neg, dim, ngram, epochs, lr, l2):
    """Driver-side twin of train_quality_classifier's full-batch
    Adagrad loop."""
    docs = [(t, 1.0) for t in pos] + [(t, 0.0) for t in neg]
    w = np.zeros(dim)
    b = 0.0
    hist = np.zeros(dim + 1)
    for _ in range(epochs):
        g = np.zeros(dim + 1)
        for text, y in docs:
            idx, vals = _doc_features(text, dim, ngram)
            p = 1.0 / (1.0 + math.exp(-(w[idx] @ vals + b)))
            np.add.at(g, idx, (p - y) * vals)
            g[dim] += p - y
        g /= len(docs)
        g[:dim] += l2 * w
        hist += g * g
        step = lr * g / np.sqrt(hist + 1e-10)
        w = w - step[:dim]
        b = b - step[dim]
    return HashedTextClassifier(w, b, ngram=ngram)


@pytest.fixture(scope="module")
def model(spark):
    pos, neg = _corpora()
    pos_df = spark.createDataFrame([(t,) for t in pos], "text string").repartition(5)
    neg_df = spark.createDataFrame([(t,) for t in neg], "text string").repartition(3)
    return train_quality_classifier(
        pos_df, neg_df, dim=DIM, ngram=2, epochs=10, lr=1.0, l2=1e-6
    )


def test_featurization_deterministic_and_hashed():
    b = _doc_buckets("The cat. the CAT.", DIM, 2)
    # lowercased tokens: the cat . the cat . → 6 unigrams + 5 bigrams
    assert b.size == 11
    assert (_doc_buckets("The cat. the CAT.", DIM, 2) == b).all()
    # a specific gram lands at its crc32 bucket
    assert zlib.crc32(b"the") % DIM in b
    idx, vals = _doc_features("a b a", DIM, 1)
    assert vals.sum() == pytest.approx(1.0)
    assert idx.size == 2  # distinct buckets for {a, b}


def test_separates_trusted_from_gibberish(model):
    pos, neg = _corpora()
    # margins, not raw float equality: every doc on its own side
    assert all(model.prob(t) > 0.7 for t in pos[:40])
    assert all(model.prob(t) < 0.3 for t in neg[:40])
    # held-out docs from the same generators (different seed)
    assert model.prob("the people of the city on the river") > 0.7
    assert model.prob("qx#z9@@jv00wk$qqq###zzz") < 0.3


def test_distributed_matches_local_twin(model):
    pos, neg = _corpora()
    twin = _train_local(pos, neg, DIM, 2, epochs=10, lr=1.0, l2=1e-6)
    # the gradient is a sum → same model up to float-addition order
    assert np.abs(model.weights - twin.weights).max() < 1e-8
    assert abs(model.bias - twin.bias) < 1e-8
    assert model.meta["n_docs"] == 240
    assert model.meta["loss_curve"][-1] < model.meta["loss_curve"][0]


def test_scoring_column_and_nulls(spark, model):
    df = spark.createDataFrame(
        [(1, "the history of science"), (2, None), (3, "")],
        "id bigint, text string",
    )
    rows = {r["id"]: r["p"] for r in df.select(
        "id", quality_prob("text", model).alias("p")).collect()}
    assert rows[1] > 0.7
    assert rows[2] is None
    # empty text scores sigmoid(bias) exactly
    assert rows[3] == pytest.approx(1.0 / (1.0 + math.exp(-model.bias)))
    kept = filter_by_quality(df, "text", model, min_prob=0.5).collect()
    assert [r["id"] for r in kept] == [1]


def test_pareto_keep_deterministic_and_monotone(spark):
    df = spark.createDataFrame(
        [(i, i / 99.0) for i in range(100)], "id bigint, score double"
    )
    a = sorted(r["id"] for r in pareto_keep(df, "score", seed=1).collect())
    b = sorted(
        r["id"]
        for r in pareto_keep(df.repartition(7), "score", seed=1).collect()
    )
    assert a == b  # derandomized: layout- and retry-stable
    assert 99 in a  # score 1.0 always survives (pareto draw > 0)
    # keep-rate rises with score: split at the median score
    lo = sum(1 for i in a if i < 50)
    hi = sum(1 for i in a if i >= 50)
    assert hi > lo
    with pytest.raises(ValueError):
        pareto_keep(df, "score", alpha=0.0)


def test_scoring_plan_is_one_arrow_projection(spark, model):
    df = spark.createDataFrame([("x",)], "text string")
    plan = (
        df.select(quality_prob("text", model).alias("p"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_training_sample_cap(spark):
    pos, neg = _corpora()
    pos_df = spark.createDataFrame([(t,) for t in pos], "text string")
    neg_df = spark.createDataFrame([(t,) for t in neg], "text string")
    m = train_quality_classifier(
        pos_df, neg_df, dim=DIM, epochs=2, max_docs_per_class=50
    )
    # md5-bucket downsample keeps ≈50 of each 120; exactness isn't the
    # contract, boundedness is
    assert m.meta["n_docs"] < 240
    assert m.meta["n_docs"] > 20


def test_degenerate_one_label_sample_raises(spark):
    # a cap so tight the bounded sample empties a class must raise the
    # informative error, never silently train a one-label classifier
    # (pre-fix: frac_buckets floored to 0 and did exactly that)
    import pytest

    pos, neg = _corpora()
    pos_df = spark.createDataFrame([(t,) for t in pos], "text string")
    empty_neg = spark.createDataFrame([], "text string")
    with pytest.raises(ValueError, match="one class"):
        train_quality_classifier(
            pos_df, empty_neg, dim=DIM, epochs=1, max_docs_per_class=50
        )
