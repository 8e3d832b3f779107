"""Shared pair-graph → survivors policy for every near-dup pair source
(minhash / simhash / n-gram jaccard / embedding cosine): the pair
functions stay pure candidate generators, and this module turns ANY
(id_a, id_b) frame into the deduped corpus.

Greedy: drop the larger id of every pair — one anti-join, no iteration.
Transitive: collapse each connected component of the pair graph to its
smallest id (dedup/components pointer-jumping) — stricter on star
shapes where spokes never pair directly; costs O(log diameter) extra
rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    transitive: bool = False,
) -> DataFrame:
    """Rows of ``df`` surviving dedup under the given near-dup pairs."""
    if transitive:
        from .components import connected_components

        comp = connected_components(pairs, id_a=id_a, id_b=id_b)
        losers = comp.where(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
    else:
        losers = pairs.select(F.col(id_b).alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
