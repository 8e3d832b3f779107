"""Plan-shape regression guards: the core operators must stay
zero-exchange projections and the join strategies must not degrade
(PLANS.md documents why each bound holds)."""

import re

from pyspark.sql import functions as F

from dataforge_spark.operators.missing_values import fix_missing_values
from dataforge_spark.operators.normalization import normalize_data
from dataforge_spark.operators.outliers import handle_outliers
from dataforge_spark.operators.text_cleaning import clean_text_columns


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fills_and_caps_are_projection_only(spark, lineitem):
    li = lineitem.select(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 7 == 0, None).otherwise(F.col("l_quantity")).alias("q"),
    )
    filled = fix_missing_values(li, "fill_mean", columns=["q"])
    assert _plan(filled).count("Exchange") == 0

    capped = handle_outliers(
        lineitem.select("l_orderkey", "l_extendedprice"),
        columns=["l_extendedprice"], method="iqr", action="cap",
    )
    assert _plan(capped).count("Exchange") == 0

    scaled, _ = normalize_data(
        lineitem.select("l_orderkey", "l_quantity"),
        columns=["l_quantity"], method="standard",
    )
    assert _plan(scaled).count("Exchange") == 0


def test_text_cleaning_is_single_stage_no_python(spark, documents):
    out = clean_text_columns(documents.select("doc_id", "text"), columns=["text"],
                             operations=["lowercase", "remove_extra_spaces"])
    plan = _plan(out)
    assert plan.count("Exchange") == 0
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_scans_prune_columns(spark, lineitem):
    out = handle_outliers(
        lineitem.select("l_orderkey", "l_extendedprice"),
        columns=["l_extendedprice"], method="iqr", action="cap",
    )
    scans = re.findall(r"ReadSchema: struct<([^>\n]*)", _plan(out))
    assert scans, "expected a parquet scan in the plan"
    for s in scans:
        assert "l_quantity" not in s and "l_shipdate" not in s


def test_frequency_encode_broadcasts(spark, customer):
    from dataforge_spark.operators.encoding import encode_frequency

    out = encode_frequency(customer.select("c_custkey", "c_mktsegment"),
                           columns=["c_mktsegment"])
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_bucket_join_carries_no_broadcast_hint(spark, documents):
    """Round-4 scale fix: the (band, bucket) sizes table is corpus-
    proportional, so the candidate join must NOT carry a mandatory
    broadcast hint — AQE decides at runtime. Guard the logical plan."""
    from dataforge_spark.dedup.minhash import candidate_pairs, minhash_signatures

    sigs = minhash_signatures(documents.limit(50), "text", "doc_id")
    cands = candidate_pairs(sigs)
    logical = cands._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in logical and "UnresolvedHint" not in logical
