"""Brute-force cosine top-k — the exact ANN baseline.

Plan shape: broadcast the (small) query set against the corpus — one scan
of the corpus, no shuffle for the join; the only shuffle is the per-query
top-k (a groupBy-free window over query_id). At cluster scale the corpus
side stays partition-parallel; k rows per query survive.

For 100 TB corpora the scale path is the LSH-bucketed variant
(dataforge_spark.similarity.lsh) — same output contract, approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Top-k corpus neighbors per query row.

    Returns (query_id, neighbor_id, cos_sim) with cos_sim rounded to 6dp
    (cross-engine float stability) and deterministic tie-break on
    neighbor_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    joined = c.join(F.broadcast(q), how="cross")
    if not include_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
