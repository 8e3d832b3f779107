"""Scale toolkit: salted joins/aggregations must be result-identical to
their unsalted forms on skewed data; bucketed writes round-trip."""

from pyspark.sql import functions as F

from dataforge_spark.partitioning import (
    partition_stats,
    salted_aggregate_counts,
    salted_join,
    skew_metrics,
    with_salt,
)


def _skewed(spark):
    # 10k rows, 90% on one key — the classic straggler shape
    return spark.range(10000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("int").alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(100)], "k: int, name: string"
    )
    plain = big.join(small, "k").groupBy("name").count()
    salted = salted_join(big, small, on="k", salt=8).groupBy("name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["n"], round(r["s"], 4))
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        ).collect()
    }
    salted = {
        (r["k"]): (r["n"], round(r["sum_v"], 4))
        for r in salted_aggregate_counts(df, "k", salt=16, value="v").collect()
    }
    assert plain == salted


def test_skew_metrics_flags_hot_key(spark):
    m = skew_metrics(_skewed(spark), "k")
    assert m["total_rows"] == 10000
    assert m["top_keys"][0]["key"] == 7
    assert m["top_keys"][0]["share"] > 0.8


def test_with_salt_deterministic_and_bounded(spark):
    df = _skewed(spark)
    a = with_salt(df, 8).groupBy("_salt").count().collect()
    b = with_salt(df, 8).groupBy("_salt").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r["_salt"] < 8 for r in a)


def test_partition_stats(spark):
    df = spark.range(1000).repartition(4)
    s = partition_stats(df)
    assert s["rows"] == 1000 and s["partitions"] >= 1
