"""exact_quantiles must be bit-identical to Spark's percentile() on
NaN-free input — it replaces percentile() in every operator stat job
(IQR/MAD bounds, robust scale, median fill, boundary scrub), so any
deviation would silently shift oracle-checked results."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.quantiles import exact_quantiles

PROBS = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]


def _reference(df, col, probs):
    arr = ",".join(map(str, probs))
    return df.agg(
        F.expr(f"percentile({col}, array({arr}))").alias("p")
    ).collect()[0]["p"]


@pytest.mark.parametrize(
    "maker",
    [
        lambda rng: rng.standard_normal(20_000) * 100,        # distinct-heavy
        lambda rng: rng.randint(0, 7, 20_000).astype(float),  # duplicate-heavy
        lambda rng: np.repeat(rng.standard_normal(50), 400),  # chunky dups
    ],
    ids=["distinct", "few_values", "chunky"],
)
def test_matches_percentile_bitwise(spark, maker):
    rng = np.random.RandomState(3)
    vals = maker(rng)
    rows = [(float(v),) if i % 11 else (None,) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "x double")
    # force the bracketed (scale) path — small in-memory frames would
    # otherwise take the single-pass percentile shortcut
    mine = exact_quantiles(df, ["x"], PROBS, small_input_bytes=None)["x"]
    ref = _reference(df, "x", PROBS)
    assert mine == [float(r) for r in ref]
    # the adaptive small-input shortcut must agree exactly
    fast = exact_quantiles(df, ["x"], PROBS)["x"]
    assert fast == mine


def test_small_and_empty_inputs(spark):
    for rows, expect in [([], [None]), ([(2.5,)], [2.5]),
                         ([(1.0,), (3.0,)], [2.0])]:
        df = spark.createDataFrame(rows, "x double")
        assert exact_quantiles(df, ["x"], [0.5])["x"] == expect


def test_multi_column_one_call(spark, lineitem):
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    for gate in (None, 64 << 20):  # bracketed path and adaptive shortcut
        mine = exact_quantiles(lineitem, cols, [0.25, 0.75],
                               small_input_bytes=gate)
        for c in cols:
            ref = _reference(lineitem, c, [0.25, 0.75])
            assert mine[c] == [float(r) for r in ref]


def test_refinement_path_still_exact(spark):
    # Force the recursion: cap the collect at 50 so every bracket
    # overflows and must narrow by rank before collecting.
    df = spark.createDataFrame(
        [(float(i),) for i in range(10_000)], "x double"
    )
    mine = exact_quantiles(df, ["x"], [0.25, 0.5], max_collect=50)["x"]
    ref = _reference(df, "x", [0.25, 0.5])
    assert mine == [float(r) for r in ref]
