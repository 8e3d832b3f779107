"""Product-quantization ANN tests (round 8): fit determinism and
validation, encode contract, ADC recall on planted clusters vs the
exact brute-force top-k, exact-score parity on the re-rank path, IVF-PQ
composition, NULL/ragged robustness, partitioning invariance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataforge_spark.similarity.brute_force import cosine_topk
from dataforge_spark.similarity.pq import (
    fit_pq,
    ivfpq_cosine_topk,
    pq_cosine_topk,
    pq_encode,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """32 tight planted clusters, 64-dim, seeded — the same corpus shape
    the bench recall block uses (real embedding corpora cluster)."""
    rng = np.random.RandomState(11)
    centers = rng.randn(32, 64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, 50, axis=0) + 0.08 * rng.randn(1600, 64)
    return spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(1600, dtype=np.int64),
        "embedding": list(vecs.tolist()),
    })).cache()


def test_fit_pq_shape_determinism_and_validation(clustered):
    b1 = fit_pq(clustered, m=8, ks=16, sample_rows=800, seed=7)
    b2 = fit_pq(clustered, m=8, ks=16, sample_rows=800, seed=7)
    assert b1.shape == (8, 16, 8)
    np.testing.assert_array_equal(b1, b2)
    with pytest.raises(ValueError, match="not divisible"):
        fit_pq(clustered, m=7)
    with pytest.raises(ValueError, match="256"):
        fit_pq(clustered, ks=512)


def test_pq_encode_contract(clustered, spark):
    books = fit_pq(clustered, m=8, ks=16)
    enc = pq_encode(clustered, books)
    rows = enc.collect()
    assert len(rows) == 1600
    assert all(len(bytes(r["_pq_code"])) == 8 for r in rows)
    # NULL / ragged / zero vectors yield NULL codes, not crashes
    weird = spark.createDataFrame(
        [(1, None), (2, [1.0] * 3), (3, [0.0] * 64)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["_pq_code"] for r in pq_encode(weird, books).collect()}
    assert got[1] is None and got[2] is None and got[3] is None


def test_pq_recall_and_exact_scores_on_clusters(clustered):
    q = clustered.where(F.col("vec_id") % 80 == 0)  # 20 queries
    exact = cosine_topk(corpus=clustered, queries=q, k=5,
                        id_col="vec_id", vec_col="embedding")
    ex_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ex_scores = {(r["query_id"], r["neighbor_id"]): r["cos_sim"]
                 for r in exact.collect()}

    # refine pool must cover the cluster size (50): ADC cannot rank
    # near-identical cluster-mates, it only needs to ADMIT them — the
    # exact re-rank does the ordering (refine is the recall knob, the
    # FAISS IndexRefineFlat pattern)
    out = pq_cosine_topk(clustered, q, k=5, m=8, ks=64, refine=12)
    rows = out.collect()
    got_pairs = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(ex_pairs & got_pairs) / len(ex_pairs)
    assert recall >= 0.9, recall
    # re-ranked scores are EXACT cosines: every overlapping pair matches
    # the brute-force score to the shared 6dp rounding
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in ex_scores:
            assert abs(r["cos_sim"] - ex_scores[key]) <= 1e-6, (key,)
    # per-query k rows max
    counts = {}
    for r in rows:
        counts[r["query_id"]] = counts.get(r["query_id"], 0) + 1
    assert all(c <= 5 for c in counts.values())


def test_ivfpq_recall_and_partitioning_invariance(clustered):
    q = clustered.where(F.col("vec_id") % 160 == 0)  # 10 queries
    exact = cosine_topk(corpus=clustered, queries=q, k=5,
                        id_col="vec_id", vec_col="embedding")
    ex_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    out = ivfpq_cosine_topk(clustered, q, k=5, n_centroids=16, nprobe=8,
                            m=8, ks=64, refine=12)
    a = {(r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in out.collect()}
    recall = len(ex_pairs & {(x, y) for x, y, _ in a}) / len(ex_pairs)
    assert recall >= 0.8, recall  # nprobe 8/16 on tight clusters

    out2 = ivfpq_cosine_topk(clustered.repartition(7), q, k=5,
                             n_centroids=16, nprobe=8, m=8, ks=64, refine=12)
    b = {(r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in out2.collect()}
    assert a == b  # deterministic across partitionings


def test_pq_adc_only_path_orders_plausibly(clustered):
    """refine=0 returns the raw ADC approximation — same schema, and on
    well-separated clusters the top-1 neighbor must still come from the
    query's own cluster (coarse quality bound; exactness is the refine
    path's contract)."""
    q = clustered.where(F.col("vec_id") == 0)
    out = pq_cosine_topk(clustered, q, k=3, m=8, ks=64, refine=0).collect()
    assert out and set(out[0].asDict()) == {"query_id", "neighbor_id", "cos_sim"}
    top = sorted(out, key=lambda r: -r["cos_sim"])[0]
    assert top["neighbor_id"] // 50 == 0  # same planted cluster as vec 0


def test_pq_index_persist_roundtrip(clustered, spark, tmp_path):
    """write_pq_index/read_pq_codebooks (r9): the persisted codes +
    codebook sidecar searched from disk must equal a fresh fit+encode
    search on the exact re-rank path (both are exact at covering refine),
    and the read-back codebooks must equal the fitted ones."""
    from dataforge_spark.similarity.pq import read_pq_codebooks, write_pq_index

    path = str(tmp_path / "pq_idx")
    books = write_pq_index(clustered, path, id_col="vec_id",
                           vec_col="embedding", m=8, ks=64)
    got = read_pq_codebooks(spark, path)
    np.testing.assert_allclose(got, books)

    codes = spark.read.parquet(f"{path}/codes").select(
        F.col("neighbor_id").alias("vec_id"), "_pq_code"
    )
    q = clustered.where(F.col("vec_id") % 160 == 0)
    from_idx = pq_cosine_topk(clustered, q, k=5, m=8, ks=64, refine=24,
                              codebooks=books, encoded=codes)
    fresh = pq_cosine_topk(clustered, q, k=5, m=8, ks=64, refine=24)
    a = {(r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in from_idx.collect()}
    b = {(r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in fresh.collect()}
    assert a == b


def test_pq_index_ivf_layout_partition_prunes(clustered, spark, tmp_path):
    """With centroids the persisted codes are hive-partitioned by
    _ivf_bucket — a probed-bucket filter must reach the scan as a
    PartitionFilter (the 100 TB pruning story for IVF-PQ)."""
    from dataforge_spark.similarity.ivf import fit_centroids
    from dataforge_spark.similarity.pq import write_pq_index

    cents = fit_centroids(clustered, "embedding", k=8)
    path = str(tmp_path / "ivfpq_idx")
    write_pq_index(clustered, path, id_col="vec_id", vec_col="embedding",
                   m=8, ks=64, centroids=cents)
    codes = spark.read.parquet(f"{path}/codes")
    q = codes.where(F.col("_ivf_bucket").isin([0, 3]))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_ivf_bucket" in plan.split("PartitionFilters")[1][:140]
    assert q.count() > 0


def test_fit_layout_independent_sampling(clustered):
    """Round 10 (VERDICT r9 task 3): the fitting sample is keyed on
    content hash, not partition layout — fitting on a repartitioned /
    reordered copy of the SAME corpus must produce bit-identical
    codebooks and centroids even when sample_rows < corpus size (the
    regime where per-partition Bernoulli sampling diverged)."""
    from dataforge_spark.similarity.ivf import fit_centroids

    shuffled = clustered.repartition(7, "vec_id").sortWithinPartitions(
        F.col("vec_id").desc()
    )
    b1 = fit_pq(clustered, m=8, ks=16, sample_rows=800, seed=7)
    b2 = fit_pq(shuffled, m=8, ks=16, sample_rows=800, seed=7)
    np.testing.assert_array_equal(b1, b2)

    c1 = fit_centroids(clustered, "embedding", k=8, sample_rows=800, seed=7)
    c2 = fit_centroids(shuffled, "embedding", k=8, sample_rows=800, seed=7)
    np.testing.assert_array_equal(c1, c2)
