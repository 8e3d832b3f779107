"""ensure_parallelism: rebalances single-split inputs, no-ops on
already-parallel ones (so it can never add a shuffle at cluster scale),
and never changes results."""

from pyspark.sql import functions as F

from dataforge_spark.partitioning import ensure_parallelism


def test_rebalances_single_partition(spark, documents):
    assert documents.rdd.getNumPartitions() == 1  # single-row-group parquet
    par = ensure_parallelism(documents)
    assert par.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert par.count() == documents.count()


def test_noop_on_parallel_input(spark):
    df = spark.range(10_000)  # range splits to defaultParallelism already
    assert ensure_parallelism(df) is df


def test_minhash_results_unchanged_by_rebalance(spark, documents):
    # signatures are a per-row function — partitioning must not affect them
    from dataforge_spark.dedup.minhash import minhash_signatures

    sig_par = minhash_signatures(documents, "text", "doc_id")
    sig_one = minhash_signatures(documents.coalesce(1), "text", "doc_id")
    a = {(r["id"], tuple(r["sig"])) for r in sig_par.collect()}
    b = {(r["id"], tuple(r["sig"])) for r in sig_one.collect()}
    assert a == b
