"""Exact deduplication by content hash (extension, SURVEY §7.7).

Hash-groupBy: one shuffle on a 128-bit digest instead of the full text —
at 100 TB the shuffle moves ~36 bytes/row, not documents. Keep-min-id
makes the survivor deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text_analysis import fingerprint


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalized: bool = False,
) -> DataFrame:
    """Keep, per distinct content, the row with the smallest id.

    ``normalized=True`` dedups on the whitespace/case-normalized
    fingerprint instead of raw bytes.
    """
    h = fingerprint(F.col(text_col)) if normalized else F.md5(F.col(text_col))
    w = Window.partitionBy("_h").orderBy(F.asc(id_col))
    return (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(hash, n_copies, keeper_id) for every content group with >1 copy."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
        .where(F.col("n_copies") > 1)
    )
