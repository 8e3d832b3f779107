"""SemDeDup-style cluster-scoped semantic deduplication (extension,
SURVEY §7.7; no reference counterpart — the reference engine has no
embedding surface at all, cf. reference/pipeline.py:142-152).

Public-knowledge basis: SemDeDup (Abbas et al., 2023, arXiv:2303.09540)
— k-means-cluster the embedding space, then remove near-duplicates
*within* each cluster only, turning the O(n²) all-pairs cosine problem
into k independent O((n/k)²) problems that never leave their executor.

Spark-first shape (one broadcast + two shuffles total):

1. Centroids are fitted on a content-keyed driver sample
   (``similarity.ivf.fit_centroids`` — deterministic under any
   partitioning) and broadcast: k·dim floats, ~64 KB at k=16, d=1024.
2. Cluster assignment is a pure Arrow projection
   (``with_ivf_bucket``) — no shuffle, no collect.
3. ONE shuffle moves (id, vector) keyed by (cluster, cell); each group
   is greedily deduped in numpy inside a single ``applyInPandas`` task.
4. Survivor ids flow back through ONE left-semi join keyed on id, so
   the full-width document rows are never shuffled by cluster.

Degenerate clusters (a mirror of ``minhash.candidate_pairs``'s
``max_bucket`` guard): a cluster larger than ``max_cluster`` is split
into ``ceil(n/max_cluster)`` deterministic id-hash cells so no single
task ever materializes an unbounded member matrix. Near-dup pairs that
land in different cells of a split cluster are not compared — the same
disclosed recall trade the banded-LSH path makes, and the split count
is surfaced via ``stats``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..similarity.ivf import fit_centroids, with_ivf_bucket


def _greedy_survivors(
    X: np.ndarray, order: np.ndarray, threshold: float
) -> list[int]:
    """Leader dedup: walk rows of ``X`` in ``order``; keep a row iff its
    cosine to every already-kept row is below ``threshold``. Returns
    positions (into X) of survivors. O(n·kept) vectorized flops."""
    norms = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    Xn = X / norms
    kept: list[int] = []
    K = np.empty((0, X.shape[1]))
    for i in order:
        if K.shape[0] == 0 or float(np.max(K @ Xn[i])) < threshold:
            kept.append(int(i))
            K = np.vstack([K, Xn[i]])
    return kept


def semantic_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    k: int = 16,
    sample_rows: int = 25_000,
    iters: int = 10,
    seed: int = 42,
    keep: str = "min_id",
    max_cluster: int = 4096,
    stats: dict | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Drop rows whose embedding is within ``threshold`` cosine of an
    earlier-kept row in the same k-means cluster; return survivors with
    the original schema.

    ``keep`` selects the greedy walk order (which row of a near-dup
    group survives):

    - ``"min_id"`` (default): ascending id — the repo-wide keep-first
      convention, comparable with ``dedup_exact``.
    - ``"far_from_centroid"``: ascending cosine-to-own-centroid, id
      tie-break — the SemDeDup paper's rule (keep the group's least
      prototypical member, maximizing retained diversity).

    ``centroids`` (optional, ``k×dim``, rows unit-normalized like
    :func:`~dataforge_spark.similarity.ivf.fit_centroids` output) skips
    the fit and reuses a precomputed set — the once-per-corpus
    amortization every persisted-index path uses, and the hook that
    lets an external oracle replicate cluster assignment exactly.

    Rows that cannot be scored survive unconditionally: NULL/ragged
    vectors (the assigner NULL-buckets them) and NULL ids (unjoinable).
    Determinism: centroids are content-keyed, the walk order is a total
    order, and cells are id-hash partitions — the survivor set is a
    pure function of (corpus content, parameters), independent of
    layout. ``stats`` (optional dict) receives ``n_clusters`` and
    ``split_clusters``.
    """
    if keep not in ("min_id", "far_from_centroid"):
        raise ValueError(f"unknown keep rule {keep!r}")
    clash = {"_sem_c", "_sem_cell", "_sem_n"} & set(df.columns)
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} are reserved by semantic_dedup"
        )

    spark = df.sparkSession
    keyed = df.where(F.col(id_col).isNotNull())
    unkeyed = df.where(F.col(id_col).isNull())

    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
    else:
        C = fit_centroids(
            keyed, vec_col, k=k, sample_rows=sample_rows,
            iters=iters, seed=seed,
        )
    if C.size == 0:
        return df  # no scorable vectors anywhere — nothing to drop
    bucketed = with_ivf_bucket(
        keyed.select(id_col, vec_col), C, vec_col, "_sem_c"
    )

    # NULL-bucket rows (NULL/ragged vectors) are unscorable: route their
    # ids straight into the survivor set — the inner size-join below
    # would silently drop them (NULL keys never match).
    nullb_ids = bucketed.where(F.col("_sem_c").isNull()).select(id_col)
    scorable = bucketed.where(F.col("_sem_c").isNotNull())

    # Oversized-cluster split: sizes is ≤k rows → broadcast join back.
    sizes = scorable.groupBy("_sem_c").agg(F.count("*").alias("_sem_n"))
    cells = (
        scorable.join(F.broadcast(sizes), "_sem_c")
        .withColumn(
            "_sem_cell",
            F.pmod(
                F.xxhash64(F.col(id_col), F.lit(seed)),
                F.greatest(
                    F.lit(1), F.ceil(F.col("_sem_n") / F.lit(max_cluster))
                ),
            ).cast("int"),
        )
        .select("_sem_c", "_sem_cell", id_col, vec_col)
    )
    if stats is not None:
        agg = sizes.agg(
            F.count("*").alias("nc"),
            F.sum((F.col("_sem_n") > max_cluster).cast("int")).alias("sp"),
        ).first()
        stats["n_clusters"] = agg["nc"]
        stats["split_clusters"] = int(agg["sp"] or 0)

    id_field = next(f for f in df.schema.fields if f.name == id_col)
    out_schema = f"`{id_col}` {id_field.dataType.simpleString()}"
    bc = spark.sparkContext.broadcast(C)
    thr, rule = float(threshold), keep

    def dedup_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col]
        dim = bc.value.shape[1]
        X = np.zeros((len(pdf), dim))
        for i, v in enumerate(pdf[vec_col]):
            X[i] = v  # assigner guarantees non-null, dim-length vectors
        if rule == "min_id":
            order = np.argsort(ids.to_numpy(), kind="stable")
        else:
            c = bc.value[int(key[0])]
            Xn = X / np.maximum(
                np.linalg.norm(X, axis=1, keepdims=True), 1e-12
            )
            cos_c = Xn @ c
            order = np.lexsort((ids.to_numpy(), cos_c))
        return pdf.iloc[_greedy_survivors(X, order, thr)][[id_col]]

    survivors = cells.groupBy("_sem_c", "_sem_cell").applyInPandas(
        dedup_group, out_schema
    ).unionByName(nullb_ids)
    return keyed.join(survivors, id_col, "leftsemi").unionByName(unkeyed)
