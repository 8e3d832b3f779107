"""Embedding-cosine near-dup detection (extension, SURVEY §7.7).

Exact variant: bounded self-join with cosine ≥ threshold — quadratic, for
verification and small corpora. Scale variant: route through the
random-hyperplane LSH bucketer (similarity.lsh) so only same-bucket pairs
are scored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import batch_cosine_udf


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cos_sim ≥ threshold), id_a < id_b, rounded 6dp.
    Exact O(n²/2) — use lsh_neardup_pairs for large n."""
    cos = batch_cosine_udf()
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cos(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate: random-hyperplane bucket join then exact cosine on
    same-bucket pairs only."""
    from ..similarity.lsh import with_hyperplane_bucket

    bucketed = with_hyperplane_bucket(df, vec_col, num_planes=num_planes, seed=seed)
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("_bucket").alias("ba")
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("_bucket").alias("bb")
    )
    cos = batch_cosine_udf()
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            F.round(cos(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
