"""Brute-force cosine top-k — the exact ANN baseline.

Plan shape: collect the (small, bounded) query set to the driver once,
broadcast its normalized matrix, and score the WHOLE query set against
each corpus row in ONE Arrow-batched pandas-UDF matmul pass —
``(batch × dim) @ (dim × q)`` per batch. One scan of the corpus, no join
at all; the only shuffle is the per-query top-k window. (The previous
formulation — broadcast cross join + higher-order-function cosine per
pair — was correct but interpreted per-element: HOF expressions never
enter whole-stage codegen, and the measured cost at sf0.1 was ~100× the
matmul.)

At cluster scale the corpus side stays partition-parallel; k rows per
query survive the window. For 100 TB corpora the scale path is the
LSH-bucketed variant (dataforge_spark.similarity.lsh) or IVF
(similarity.ivf) — same output contract, approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import to_matrix


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
    max_queries: int = 65_536,
) -> DataFrame:
    """Top-k corpus neighbors per query row.

    Returns (query_id, neighbor_id, cos_sim) with cos_sim rounded to 6dp
    (cross-engine float stability) and deterministic tie-break on
    neighbor_id. The query side is collected/broadcast — bounded by
    ``max_queries`` (queries are the small side by contract; a
    corpus-sized query set should go through the LSH/IVF paths instead).
    """
    spark = corpus.sparkSession
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"cosine_topk broadcasts the query set; got > {max_queries} queries — "
            "use lsh_cosine_topk / ivf_cosine_topk for corpus-scale query sides"
        )
    q_rows = [r for r in q_rows if r[1] is not None]  # null-vector queries: no hits
    id_type = corpus.schema[id_col].dataType.simpleString()
    if not q_rows:
        return spark.createDataFrame(
            [], f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
        )
    qids = [r[0] for r in q_rows]
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn = np.divide(Q, qn, out=np.zeros_like(Q), where=qn > 0)
    bc = spark.sparkContext.broadcast(Qn)

    @F.pandas_udf("array<double>")
    def scores(v: pd.Series) -> pd.Series:
        Qm = bc.value
        # NULL / ragged corpus vectors score NULL (posexplode then drops
        # the row) — the Column-cosine this replaced degraded the same way.
        X, bad = to_matrix(v.tolist(), Qm.shape[1])
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        Xn = np.divide(X, norms, out=np.zeros_like(X), where=norms > 0)
        S = Xn @ Qm.T  # (batch, q)
        if bad is None:
            return pd.Series(list(S))
        return pd.Series(
            [None if bad[i] else row for i, row in enumerate(S.tolist())]
        )

    from ..partitioning import ensure_parallelism

    qid_arr = F.array(*[F.lit(q) for q in qids])
    # the matmul pass is CPU-bound: rebalance a single-row-group corpus
    # scan to cluster parallelism (gated no-op on multi-split inputs)
    corpus = ensure_parallelism(corpus.select(id_col, vec_col))
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(scores(F.col(vec_col))).alias("_qi", "_s"),
    ).select(
        F.element_at(qid_arr, F.col("_qi") + 1).alias("query_id"),
        "neighbor_id",
        F.round(F.col("_s"), 6).alias("cos_sim"),
    )
    if not include_self:
        scored = scored.where(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
