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
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate: multi-table random-hyperplane bucket join (candidates =
    pairs colliding in ANY table) then exact cosine on candidates only.

    Recall: a pair at cosine ``c`` collides in one table with probability
    ``(1 - acos(c)/π)^num_planes``; ``num_tables`` independent tables OR'd
    together drive the miss probability to ``(1-p)^T`` — at the defaults a
    0.99-cosine pair is missed with probability < 1e-6, while far pairs
    still almost never collide. Hashing is seeded/deterministic, so the
    recovered pair set is stable across runs."""
    from ..similarity.lsh import multi_bucket_udf, stacked_planes

    dim = len(df.select(vec_col).first()[0])
    assign_all = multi_bucket_udf(
        df.sparkSession, stacked_planes(dim, num_planes, num_tables, seed)
    )
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.posexplode(assign_all(F.col(vec_col))).alias("_t", "_b"),
    )
    a = keyed.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), "_t", "_b"
    )
    b = keyed.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), "_t", "_b"
    )
    cos = batch_cosine_udf()
    # Score and threshold-filter IMMEDIATELY after the bucket join (both
    # map-side on the join output), THEN dedup across tables: a pair
    # colliding in several tables is scored once per collision (cheap
    # vectorized dot), but the cross-table dropDuplicates shuffle moves
    # only the bare (id_a, id_b, cos_sim) triples of pairs that already
    # passed the threshold — not every candidate carrying both vectors.
    # Identical output: duplicate collisions score identically, so
    # filter-then-dedup ≡ dedup-then-filter.
    return (
        a.join(b, ["_t", "_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cos(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
