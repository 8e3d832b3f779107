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
