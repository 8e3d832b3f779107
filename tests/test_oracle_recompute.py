"""Parity tests for the check-time oracle recomputation
(tools/oracle_recompute.py, VERDICT r5 task 3): the Spark-free second
implementations must agree with the engine's distributed paths.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataforge_spark.functions.xxh64 import xxh64_str


@pytest.fixture(scope="module")
def spark():
    from dataforge_spark.session import get_spark

    return get_spark("test_oracle_recompute")


SAMPLES = [
    "", "a", "abc", "hello world", "x" * 7, "x" * 8, "y" * 15, "z" * 31,
    "w" * 32, "long string with many words " * 10, "héllo wörld",
    "中文字符测试", "tab\tnewline\n", "trailing space ", " leading",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    assert {s: xxh64_str(s) for s in SAMPLES} == got


def test_py_simhash_matches_spark(spark):
    from dataforge_spark.dedup.simhash import simhash
    from tools.oracle_recompute import _py_simhash

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "  leading and trailing  ",
        "single",
        "",
        "tab\tseparated\ttokens and\nnewlines",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    cache: dict = {}
    for i, t in enumerate(texts):
        mine = _py_simhash(t, cache)
        mine_signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert mine_signed == got[i], f"doc {i}: {mine_signed} != {got[i]}"


def test_expected_values_match_engine_at_sf0001(spark, sf_dir):
    """The recomputed oracle rows equal the engine's own output at a SCALE
    the round-5 literals were never pinned for — the independence proof."""
    import __spark_entry__ as e
    from tools.oracle_recompute import iforest_expected, simhash_expected

    got = e.q_o4_isolation_forest(spark, sf_dir).collect()[0]
    assert (got["n_kept"], got["kept_id_sum"]) == iforest_expected(sf_dir)

    row = e.q_dedup_simhash_verified(spark, sf_dir).collect()[0]
    assert (
        row["n_pairs"], row["n_brute"], row["n_disagree"], row["n_planted"]
    ) == simhash_expected(sf_dir)
