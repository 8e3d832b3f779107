"""IVF ANN: full-probe equals brute force; small-probe recall is sane."""

from pyspark.sql import functions as F

from dataforge_spark.similarity.brute_force import cosine_topk
from dataforge_spark.similarity.ivf import fit_centroids, ivf_cosine_topk


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_full_probe_equals_brute_force(spark, embeddings):
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk(corpus=emb, queries=q, k=5)
    ivf = ivf_cosine_topk(corpus=emb, queries=q, k=5, n_centroids=8, nprobe=8)
    assert _pairs(exact) == _pairs(ivf)


def test_ivf_small_probe_recall(spark, embeddings):
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = emb.where(F.col("vec_id") < 5)
    exact = _pairs(cosine_topk(corpus=emb, queries=q, k=5))
    approx = _pairs(ivf_cosine_topk(corpus=emb, queries=q, k=5,
                                    n_centroids=8, nprobe=3))
    # probing 3/8 buckets must still recover a meaningful share of the
    # true neighbors (random data → weak clusters; keep the bar honest)
    assert len(approx & exact) / len(exact) >= 0.3


def test_fit_centroids_normalized(spark, embeddings):
    import numpy as np

    C = fit_centroids(embeddings, k=8)
    assert C.shape[1] == 64
    norms = np.linalg.norm(C, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-9)


def test_disk_index_equals_memory_and_prunes_partitions(spark, embeddings, tmp_path):
    from dataforge_spark.similarity.ivf import (
        read_ivf_centroids,
        search_ivf_index,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf_idx")
    centroids = write_ivf_index(embeddings, path, n_centroids=8, seed=42)
    assert read_ivf_centroids(spark, path).shape == centroids.shape

    queries = embeddings.orderBy("vec_id").limit(5)
    on_disk = search_ivf_index(spark, path, queries, k=5, nprobe=2)
    in_mem = ivf_cosine_topk(
        embeddings, queries, k=5, nprobe=2, centroids=centroids
    )
    assert sorted(map(tuple, on_disk.collect())) == sorted(
        map(tuple, in_mem.collect())
    )

    # the probed-bucket filter must reach the scan as a partition filter
    plan = on_disk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_ivf_bucket" in plan


def test_ivf_high_recall_on_clustered_data(spark):
    """On WELL-CLUSTERED vectors (16 tight planted clusters), tiny probe
    counts recover essentially all true neighbors (seeded → exact:
    nprobe=1 → 0.98, nprobe=2 → 1.0). The ~0.55 recall the bench
    measures at nprobe=4/16 on the uniform synthetic corpus is a data
    property — no cluster structure to exploit — not an indexing defect;
    real embedding corpora cluster."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(16, 32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in centers:
        for _ in range(200):
            v = c + 0.05 * rng.randn(32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") % 100 == 0)
    exact = _pairs(cosine_topk(corpus=df, queries=q, k=5))
    approx = _pairs(ivf_cosine_topk(corpus=df, queries=q, k=5,
                                    n_centroids=16, nprobe=2))
    assert len(approx & exact) / len(exact) >= 0.95
