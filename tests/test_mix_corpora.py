"""mix_corpora: deterministic epoch-weight mixture semantics."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.curation import mix_corpora


@pytest.fixture(scope="module")
def corpora(spark, documents):
    base = documents.select("doc_id", "text")
    return {
        "web": (base.where(F.col("doc_id") % 3 == 0), 1.0),
        "books": (base.where(F.col("doc_id") % 3 == 1), 2.5),
        "code": (base.where(F.col("doc_id") % 3 == 2), 0.4),
        "junk": (base.where(F.col("doc_id") < 0), 0.0),
    }


def test_epoch_weights_and_determinism(spark, corpora):
    mixed = mix_corpora(corpora, key_cols=["doc_id"], seed=7)
    rows = [(r["doc_id"], r["mix_source"], r["mix_epoch"])
            for r in mixed.collect()]
    n = {k: corpora[k][0].count() for k in corpora}

    by_src = {}
    for _d, s, _e in rows:
        by_src[s] = by_src.get(s, 0) + 1
    # w=1.0 → exactly one appearance each
    assert by_src["web"] == n["web"]
    # w=2.5 → between 2n and 3n, and every doc appears 2 or 3 times
    assert 2 * n["books"] < by_src["books"] < 3 * n["books"]
    per_doc = {}
    for d, s, _e in rows:
        if s == "books":
            per_doc[d] = per_doc.get(d, 0) + 1
    assert set(per_doc.values()) == {2, 3}
    # w=0.4 → a strict deterministic subset, single epoch 0
    assert 0 < by_src["code"] < n["code"]
    assert all(e == 0 for _d, s, e in rows if s == "code")
    # w=0 → absent entirely
    assert "junk" not in by_src

    # epochs are 0..k-1 per source
    assert {e for _d, s, e in rows if s == "books"} == {0, 1, 2}

    # bitwise reproducible across invocations
    again = [(r["doc_id"], r["mix_source"], r["mix_epoch"])
             for r in mix_corpora(corpora, key_cols=["doc_id"], seed=7).collect()]
    assert sorted(rows) == sorted(again)
    # and seed-sensitive for the fractional subsets
    other = mix_corpora(corpora, key_cols=["doc_id"], seed=8)
    code_a = {d for d, s, _e in rows if s == "code"}
    code_b = {r["doc_id"] for r in other.collect() if r["mix_source"] == "code"}
    assert code_a != code_b


def test_mix_corpora_guards(spark, documents):
    base = documents.select("doc_id")
    with pytest.raises(ValueError, match="at least one source"):
        mix_corpora({}, key_cols=["doc_id"])
    with pytest.raises(ValueError, match="key_cols"):
        mix_corpora({"a": (base, 1.0)}, key_cols=[])
    with pytest.raises(ValueError, match="negative"):
        mix_corpora({"a": (base, -1.0)}, key_cols=["doc_id"])
    with pytest.raises(ValueError, match="zero weight"):
        mix_corpora({"a": (base, 0.0)}, key_cols=["doc_id"])


def test_mix_is_shuffle_free(spark, documents):
    base = documents.select("doc_id", "text")
    mixed = mix_corpora(
        {"a": (base, 1.5), "b": (base, 1.0)}, key_cols=["doc_id"]
    )
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_weights_closed_form():
    from dataforge_spark.curation import temperature_weights

    sizes = {"big": 9000, "small": 1000}
    # alpha=1: natural proportions → every weight is exactly 1.0
    w = temperature_weights(sizes, alpha=1.0)
    assert w == pytest.approx({"big": 1.0, "small": 1.0})
    # alpha=0: equal shares → small is upsampled 5x, big downsampled
    w0 = temperature_weights(sizes, alpha=0.0)
    assert w0["small"] == pytest.approx(5000 / 1000)
    assert w0["big"] == pytest.approx(5000 / 9000)
    # expected doc total always hits target_total
    for a in (0.0, 0.3, 0.7, 1.0):
        w = temperature_weights(sizes, alpha=a, target_total=2000)
        assert sum(w[k] * sizes[k] for k in sizes) == pytest.approx(2000)
    # intermediate alpha sits between the extremes for the small source
    w3 = temperature_weights(sizes, alpha=0.3)
    assert 1.0 < w3["small"] < w0["small"]
    # empty source gets weight 0, not a crash
    w = temperature_weights({"a": 10, "b": 0}, alpha=0.5)
    assert w["b"] == 0.0
    with pytest.raises(ValueError):
        temperature_weights({})
    with pytest.raises(ValueError):
        temperature_weights({"a": 0})


def test_temperature_mix_proportions(spark):
    from dataforge_spark.curation import temperature_mix

    big = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    small = spark.range(100000, 100300).select(F.col("id").alias("doc_id"))
    mixed, w = temperature_mix(
        {"big": big, "small": small}, key_cols=["doc_id"], alpha=0.0
    )
    counts = {
        r["mix_source"]: r["n"]
        for r in mixed.groupBy("mix_source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # alpha=0 → equal expected share: 1650 docs each; the fractional
    # epoch is a hash subset, so allow a small band
    assert counts["small"] == pytest.approx(1650, rel=0.1)
    assert counts["big"] == pytest.approx(1650, rel=0.1)
    assert w["small"] == pytest.approx(1650 / 300)
