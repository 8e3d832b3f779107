"""Misra–Gries heavy hitters: bracketing bounds vs exact counts,
φ-heavy recall, layout independence of the guarantees, merge-rule unit
math, hot_keys integration."""

import random
from collections import Counter

import pandas as pd
import pytest

from dataforge_spark.functions.heavy_hitters import (
    _mg_fold_batches,
    _mg_reduce,
    heavy_hitters,
    hot_keys,
)


def _zipf_rows(n=20_000, seed=3):
    """Deterministic skewed key stream: a few hot keys + a long tail."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.30:
            rows.append("hot_a")
        elif r < 0.45:
            rows.append("hot_b")
        elif r < 0.55:
            rows.append("hot_c")
        else:
            rows.append(f"tail_{rng.randint(0, 5000)}")
    return rows


def test_mg_reduce_rule():
    counts = {"a": 10, "b": 7, "c": 3, "d": 1}
    off = _mg_reduce(counts, 2)
    # 3rd-largest (3) subtracted from survivors, ≤3 dropped
    assert off == 3
    assert counts == {"a": 7, "b": 4}
    assert _mg_reduce(counts, 5) == 0  # already small enough


def test_fold_exact_when_capacity_ample():
    pdfs = [pd.DataFrame({"k": ["x", "y", "x", None]}),
            pd.DataFrame({"k": ["y", "x"]})]
    counts, err, n = _mg_fold_batches(iter(pdfs), "k", capacity=10)
    assert counts == {"x": 3, "y": 2}
    assert err == 0
    assert n == 5  # NULL not counted


def test_bounds_bracket_truth_and_topk(spark):
    rows = _zipf_rows()
    truth = Counter(rows)
    df = spark.createDataFrame([(v,) for v in rows], "k string").repartition(11)
    hh = heavy_hitters(df, "k", k=3, capacity=256)
    assert hh["n"] == len(rows)
    by_val = {v: (lo, hi) for v, lo, hi in hh["items"]}
    assert set(by_val) == {"hot_a", "hot_b", "hot_c"}
    for v, (lo, hi) in by_val.items():
        assert lo <= truth[v] <= hi
    # hot keys dwarf n/capacity ≈ 78 → provably top-3
    assert set(hh["guaranteed"]) == {"hot_a", "hot_b", "hot_c"}


def test_guarantees_layout_independent(spark):
    rows = _zipf_rows(n=8_000, seed=9)
    truth = Counter(rows)
    for parts in (2, 13):
        df = spark.createDataFrame([(v,) for v in rows], "k string").repartition(parts)
        hh = heavy_hitters(df, "k", k=3, capacity=200)
        assert [v for v, _, _ in hh["items"]] == ["hot_a", "hot_b", "hot_c"]
        for v, lo, hi in hh["items"]:
            assert lo <= truth[v] <= hi


def test_adversarial_uniform_discloses_uncertainty(spark):
    # near-uniform keys with a tiny sketch: bounds must still bracket,
    # and nothing should be falsely guaranteed
    rows = [f"u_{i % 500}" for i in range(5_000)]
    df = spark.createDataFrame([(v,) for v in rows], "k string").repartition(4)
    hh = heavy_hitters(df, "k", k=5, capacity=64)
    assert hh["error_bound"] > 0
    for v, lo, hi in hh["items"]:
        assert lo <= 10 <= hi  # every key is exactly 10
    assert hh["guaranteed"] == []


def test_numeric_keys_and_validation(spark):
    df = spark.createDataFrame(
        [(i % 4,) for i in range(100)], "k bigint"
    )
    hh = heavy_hitters(df, "k", k=2, capacity=64)
    assert {v for v, _, _ in hh["items"]} == {0, 1}
    assert all(lo == 25 for _, lo, _ in hh["items"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", k=10, capacity=5)


def test_hot_keys_integration(spark):
    rows = _zipf_rows(n=10_000, seed=5)
    df = spark.createDataFrame([(v,) for v in rows], "k string").repartition(6)
    hot = hot_keys(df, "k", min_share=0.05)
    assert set(hot) == {"hot_a", "hot_b", "hot_c"}
    with pytest.raises(ValueError):
        hot_keys(df, "k", min_share=0.0)
