"""SemDeDup-style cluster-scoped semantic dedup (dedup/semantic.py)."""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from dataforge_spark.dedup.semantic import semantic_dedup


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, embedding=[float(x) for x in v]) for i, v in rows],
        "doc_id long, embedding array<double>",
    )


def _brute_survivors(rows, threshold):
    """Single-cluster oracle: greedy min-id leader dedup in plain numpy."""
    rows = sorted(rows, key=lambda r: r[0])
    kept = []
    for i, v in rows:
        x = np.asarray(v) / max(np.linalg.norm(v), 1e-12)
        if all(float(np.dot(x, k)) < threshold for _, k in kept):
            kept.append((i, x))
    return {i for i, _ in kept}


def test_near_dup_groups_keep_min_id(spark):
    # two tight groups + one isolate; k=1 puts everything in one cluster
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.01, 0.999, 0.0]),  # near-dup of 3
        (5, [0.0, 0.0, 1.0]),
    ]
    out = semantic_dedup(_mk(spark, rows), threshold=0.99, k=1)
    got = {r.doc_id for r in out.collect()}
    assert got == _brute_survivors(rows, 0.99) == {1, 3, 5}


def test_threshold_above_one_drops_nothing(spark):
    rows = [(i, [float(i), 1.0]) for i in range(1, 8)]
    out = semantic_dedup(_mk(spark, rows), threshold=1.01, k=2)
    assert out.count() == 7


def test_identical_vectors_one_survivor(spark):
    rows = [(i, [0.6, 0.8]) for i in range(1, 6)] + [(9, [1.0, 0.0])]
    out = semantic_dedup(_mk(spark, rows), threshold=0.999, k=1)
    assert {r.doc_id for r in out.collect()} == {1, 9}


def test_matches_brute_oracle_multi_cluster(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(12, 8)
    rows = []
    rid = 0
    for b in base:
        for _ in range(rng.randint(1, 4)):  # jittered copies → near-dups
            rid += 1
            rows.append((rid, list(b + rng.randn(8) * 0.01)))
    df = _mk(spark, rows)
    # k=1 ⇒ single cluster ⇒ result must EQUAL the brute-force oracle
    got = {
        r.doc_id
        for r in semantic_dedup(df, threshold=0.98, k=1).collect()
    }
    assert got == _brute_survivors(rows, 0.98)
    # jitter at 0.01σ keeps copies ≥0.98-cosine: one survivor per base
    assert len(got) == 12


def test_precomputed_centroids_match_fitted(spark):
    # centroids= skips the fit and must reproduce the fitted result
    # exactly (same content-keyed sample → same C); it also accepts an
    # arbitrary valid centroid set without error
    from dataforge_spark.similarity.ivf import fit_centroids

    rng = np.random.RandomState(5)
    rows = [(i + 1, list(v)) for i, v in enumerate(rng.randn(40, 6))]
    rows += [(100 + i, list(np.array(r[1]) * 1.0001))
             for i, r in enumerate(rows[:8])]  # planted dups
    df = _mk(spark, rows)
    C = fit_centroids(df, "embedding", k=3, seed=42)
    fitted = {r.doc_id for r in
              semantic_dedup(df, threshold=0.99, k=3).collect()}
    pinned = {r.doc_id for r in
              semantic_dedup(df, threshold=0.99, centroids=C).collect()}
    assert fitted == pinned
    # a hand-made centroid set (k=1 equivalent) works too
    one = np.ones((1, 6)) / np.sqrt(6)
    got = {r.doc_id for r in
           semantic_dedup(df, threshold=0.99, centroids=one).collect()}
    assert got == _brute_survivors(rows, 0.99)


def test_far_from_centroid_keeps_least_prototypical(spark):
    # one cluster; 1↔2 are dups, 2 is farther from the group centroid
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.995, 0.0999]),
        (3, [0.9, 0.1]),
    ]
    out = semantic_dedup(
        _mk(spark, rows), threshold=0.999, k=1, keep="far_from_centroid"
    )
    got = {r.doc_id for r in out.collect()}
    assert 3 in got and len(got) == 2 and (got - {3}) <= {1, 2}


def test_layout_independence(spark):
    rng = np.random.RandomState(3)
    rows = [(i + 1, list(rng.randn(6))) for i in range(200)]
    rows += [(1000 + i, rows[i][1]) for i in range(50)]  # exact dups
    df = _mk(spark, rows)
    a = {r.doc_id for r in semantic_dedup(df, k=4).collect()}
    b = {
        r.doc_id
        for r in semantic_dedup(df.repartition(13).sortWithinPartitions(
            F.col("doc_id").desc()
        ), k=4).collect()
    }
    assert a == b
    assert all(i not in a for i in range(1000, 1050))  # dups dropped


def test_null_and_ragged_vectors_survive(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, embedding=[1.0, 0.0]),
            Row(doc_id=2, embedding=[1.0, 0.0]),
            Row(doc_id=3, embedding=None),
            Row(doc_id=4, embedding=[0.5]),  # ragged
            Row(doc_id=None, embedding=[1.0, 0.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    out = semantic_dedup(df, threshold=0.999, k=1)
    ids = [r.doc_id for r in out.collect()]
    assert sorted(i for i in ids if i is not None) == [1, 3, 4]
    assert ids.count(None) == 1


def test_max_cluster_split_bounds_group_and_reports(spark):
    rng = np.random.RandomState(11)
    rows = [(i + 1, list(rng.randn(4))) for i in range(300)]
    stats = {}
    out = semantic_dedup(
        _mk(spark, rows), threshold=0.999, k=1, max_cluster=50, stats=stats
    )
    assert stats["n_clusters"] == 1 and stats["split_clusters"] == 1
    # random gaussians at 0.999 threshold: essentially nothing dropped
    assert out.count() >= 295


def test_reserved_column_clash(spark):
    df = _mk(spark, [(1, [1.0, 0.0])]).withColumn("_sem_c", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        semantic_dedup(df)


def test_bad_keep_rule(spark):
    with pytest.raises(ValueError, match="keep"):
        semantic_dedup(_mk(spark, [(1, [1.0])]), keep="random")
