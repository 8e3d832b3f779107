"""Scalar-quantization (SQ8) ANN tests: fit exactness/determinism,
encode contract, recall + exact-score parity on planted clusters vs the
brute-force top-k, persisted-index roundtrip, NULL/ragged robustness,
partitioning invariance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataforge_spark.similarity.brute_force import cosine_topk
from dataforge_spark.similarity.sq import (
    fit_sq,
    read_sq_params,
    sq_cosine_topk,
    sq_encode,
    write_sq_index,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """Same planted-cluster corpus shape as the PQ tests."""
    rng = np.random.RandomState(11)
    centers = rng.randn(32, 64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 50, axis=0) + 0.08 * rng.randn(1600, 64)
    return spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(1600, dtype=np.int64),
        "embedding": list(vecs.tolist()),
    })).cache()


def test_fit_sq_exact_and_partitioning_invariant(clustered):
    p1 = fit_sq(clustered)
    p2 = fit_sq(clustered.repartition(13))
    assert p1.shape == (2, 64)
    # min/max aggregates are order-free: bit-identical under any layout
    np.testing.assert_array_equal(p1, p2)
    assert (p1[1] >= p1[0]).all()
    # fit is over the unit-normalized corpus: ranges live in [-1, 1]
    assert p1[0].min() >= -1.0 - 1e-9 and p1[1].max() <= 1.0 + 1e-9


def test_sq_encode_contract(clustered, spark):
    params = fit_sq(clustered)
    rows = sq_encode(clustered, params).collect()
    assert len(rows) == 1600
    assert all(len(bytes(r["_sq_code"])) == 64 for r in rows)
    weird = spark.createDataFrame(
        [(1, None), (2, [1.0] * 3), (3, [0.0] * 64)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["_sq_code"]
           for r in sq_encode(weird, params).collect()}
    assert got[1] is None and got[2] is None and got[3] is None


def test_sq_recall_and_exact_scores(clustered):
    q = clustered.where(F.col("vec_id") % 80 == 0)  # 20 queries
    exact = cosine_topk(corpus=clustered, queries=q, k=5,
                        id_col="vec_id", vec_col="embedding").collect()
    ex_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ex_scores = {(r["query_id"], r["neighbor_id"]): r["cos_sim"]
                 for r in exact}
    # SQ8 keeps a byte PER DIMENSION — near-exact candidate ordering, so
    # a small refine already reproduces the exact top-k on clusters that
    # force PQ to refine=12
    out = sq_cosine_topk(clustered, q, k=5, refine=4).collect()
    got_pairs = {(r["query_id"], r["neighbor_id"]) for r in out}
    assert got_pairs == ex_pairs
    for r in out:
        assert ex_scores[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]


def test_sq_refine0_is_close_approximation(clustered):
    q = clustered.where(F.col("vec_id") == 0)
    exact = {r["neighbor_id"]: r["cos_sim"] for r in cosine_topk(
        corpus=clustered, queries=q, k=5,
        id_col="vec_id", vec_col="embedding").collect()}
    approx = sq_cosine_topk(clustered, q, k=5, refine=0).collect()
    # 8-bit linear quantization at 64 dims: |approx − exact| stays tiny
    for r in approx:
        if r["neighbor_id"] in exact:
            assert abs(r["cos_sim"] - exact[r["neighbor_id"]]) < 0.01


def test_sq_index_roundtrip(clustered, tmp_path):
    path = str(tmp_path / "sqidx")
    params = write_sq_index(clustered, path)
    spark = clustered.sparkSession
    got = read_sq_params(spark, path)
    np.testing.assert_array_equal(params, got)
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == 1600
    q = clustered.where(F.col("vec_id") % 160 == 0)
    via_index = sq_cosine_topk(
        clustered, q, k=5, refine=4, params=got, encoded=codes,
    ).collect()
    inline = sq_cosine_topk(clustered, q, k=5, refine=4).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"])  # noqa: E731
    assert sorted(map(key, via_index)) == sorted(map(key, inline))


def test_sq_partitioning_invariance(clustered):
    q = clustered.where(F.col("vec_id") == 400)
    a = sq_cosine_topk(clustered, q, k=5, refine=4).collect()
    b = sq_cosine_topk(clustered.repartition(17), q, k=5, refine=4).collect()
    key = lambda r: (r["query_id"], r["neighbor_id"], r["cos_sim"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
