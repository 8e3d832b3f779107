"""Random-hyperplane (signed random projection) LSH for cosine ANN —
the scale path next to brute_force (extension, SURVEY §7.7; Charikar '02).

``num_planes`` seeded Gaussian hyperplanes are generated ONCE on the
driver (numpy, fixed seed → deterministic across runs) and folded into a
pure Column expression: bucket = Σ_p (dot(v, plane_p) > 0) << p. No UDF,
no shuffle to bucket; the only shuffle is the bucket equi-join.

Recall tuning: ``num_tables`` independent bucketings OR'd together —
probe the union of buckets (multi-table LSH); each extra table costs one
more join of the (tiny) query side.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def _planes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def bucket_expr(vec: Column, planes: np.ndarray) -> Column:
    """Signed-projection bucket id as one JVM-side expression."""
    b = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        # dot(v, plane) via zip_with against an array literal
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(dot > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        b = b.bitwiseOR(F.shiftleft(bit, p))
    return b


def with_hyperplane_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
    out_col: str = "_bucket",
) -> DataFrame:
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _planes(dim, num_planes, seed)
    return df.withColumn(out_col, bucket_expr(F.col(vec_col), planes))


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only same-bucket pairs, union over
    ``num_tables`` independent hashings. Same output contract as
    brute_force.cosine_topk (query_id, neighbor_id, cos_sim)."""
    dim = len(corpus.select(vec_col).first()[0])
    scored = None
    for t in range(num_tables):
        planes = _planes(dim, num_planes, seed + 1000 * t)
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cvec"),
            bucket_expr(F.col(vec_col), planes).alias("_b"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            bucket_expr(F.col(vec_col), planes).alias("_b"),
        )
        s = c.join(F.broadcast(q), "_b").where(
            F.col("neighbor_id") != F.col("query_id")
        )
        scored = s if scored is None else scored.unionByName(s)
    dedup = scored.dropDuplicates(["query_id", "neighbor_id"]).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        dedup.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
