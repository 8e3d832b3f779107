"""SimHash near-dup detection (extension, SURVEY §7.7; Charikar '02,
Manku et al. WWW'07).

64-bit simhash per document: each token votes ±1 on every bit of its
xxhash64; the signature's bit b is 1 iff the weighted sum is positive.
Near-dups = signatures within ``max_hamming`` bits.

Spark-first shape: token explode → ONE groupBy(doc) with 64 sum()
aggregates (bit votes) → signature as bigint; candidate generation via
the Manku trick — split the 64-bit signature into ``max_hamming + 1``
chunks; any pair within distance d must agree exactly on ≥1 chunk, so an
equi-join per chunk finds all candidates without n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash: bigint)."""
    from ..partitioning import ensure_parallelism

    # key=id (r14): the token explode preserves the hash partitioning,
    # so the 64-vote groupBy(id) reuses this rebalance exchange instead
    # of adding its own (same 2→1 Exchange move as minhash_signatures).
    toks = ensure_parallelism(df.select(id_col, text_col), key=id_col).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseOR(F.shiftleft(bit, b))  # shiftleft wraps bit 63 into the sign bit
    return votes.select("id", sig.alias("simhash"))


def hamming(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming), id_a < id_b."""
    return pairs_from_signatures(simhash(df, text_col, id_col), max_hamming)


def pairs_from_signatures(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """The Manku banded candidate join over an existing ``(id, simhash)``
    frame — split out of :func:`simhash_pairs` so a caller that needs the
    signatures AND the pairs (e.g. a verification sweep) can compute the
    signatures once instead of once per consumer."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    # two's-complement literal: at width 64 (max_hamming=0, exact match)
    # (1 << 64) - 1 overflows a Java Long; -1 is the same all-ones mask
    mask = (1 << width) - 1 if width < 64 else -1
    chunked = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("id", "simhash", "ck.chunk", "ck.key")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
