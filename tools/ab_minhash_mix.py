"""Interleaved A/B of minhash signature permutation formulations
(r14 task 1): the r13 formulation derives the 64 permutation values per
shingle as ``xxhash64(lit(i), h)`` — a TWO-child streaming hash (hashInt
+ hashLong, each with its own finalizer ≈ 11 multiplies); the candidate
replaces it with ``xxhash64(h XOR C_i)`` — ONE hashLong pass (~6
multiplies) over the precomputed per-permutation constant
``C_i = xxh64(pack('<i', i), 42)`` (bit-equal to ``F.xxhash64(lit(i))``,
so the constant family is the same stream the old seeds came from).

Times the signatures frame through the noop sink, interleaved min-of-N,
plus steal% context. Both variants print a checksum of the signature
matrix (sum over all sig values) so the variant outputs are visibly
DIFFERENT frames (the family changes) — output equivalence of the FULL
query is asserted separately by the differential test and the oracle
gate, not here.

Usage: python tools/ab_minhash_mix.py [-n RUNS]
"""

from __future__ import annotations

import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataforge_spark.dedup.ngram_jaccard import shingles_for  # noqa: E402
from dataforge_spark.functions.xxh64 import xxh64  # noqa: E402
from dataforge_spark.partitioning import ensure_parallelism  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402

NUM_PERM = 64


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


PERM_XOR = [_signed(xxh64(struct.pack("<i", i), 42)) for i in range(NUM_PERM)]


def _base(spark, sf_dir):
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    base = ensure_parallelism(docs.select("doc_id", "text"))
    return base.select(
        F.col("doc_id").alias("id"),
        F.explode(shingles_for(base, F.col("text"), 3)).alias("s"),
    ).select("id", F.xxhash64("s").alias("h"))


def sigs_r13(spark, sf_dir):
    sh = _base(spark, sf_dir)
    mins = sh.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"h{i}")
            for i in range(NUM_PERM)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(NUM_PERM)]).alias("sig")
    )


def sigs_xor(spark, sf_dir):
    sh = _base(spark, sf_dir)
    mins = sh.groupBy("id").agg(
        *[
            F.min(
                F.xxhash64(F.col("h").bitwiseXOR(F.lit(PERM_XOR[i])))
            ).alias(f"h{i}")
            for i in range(NUM_PERM)
        ]
    )
    return mins.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(NUM_PERM)]).alias("sig")
    )


def _steal():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7]


def main() -> None:
    runs = 5
    args = sys.argv[1:]
    if args and args[0] == "-n":
        runs = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_minhash_mix")
    variants = {"r13": sigs_r13, "xor": sigs_xor}
    # checksum once per variant (proves both frames computed, shows the
    # family really changed)
    for name, fn in variants.items():
        df = fn(spark, sf_dir)
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.aggregate("sig", F.lit(0).cast("long"),
                                  lambda a, x: a.bitwiseXOR(x))).alias("ck"),
        ).collect()[0]
        print(f"{name}: n={row['n']} checksum={row['ck']}", flush=True)
    times: dict[str, list[float]] = {k: [] for k in variants}
    t0j, s0j = _steal()
    for _ in range(runs):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab_mix:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    t1j, s1j = _steal()
    steal = 100.0 * (s1j - s0j) / max(1, t1j - t0j)
    for name, ts in times.items():
        print(f"{name}: min={min(ts)} runs={ts}")
    print(f"steal_pct={steal:.2f}")


if __name__ == "__main__":
    main()
