"""Decompose dedup_minhash_verified (r14): time each stage of the row
through the noop sink, interleaved min-of-N, to find where the ~2.1 s
actually goes before touching anything (guide §1).

Stages:
  words    — scan + split to words (explode)          [isolates shingling cost]
  shingles — scan + shingles_for + explode            [+ slide/distinct]
  hashed   — shingles + xxhash64(s)                   [+ string hash]
  sigs     — + 64-way min aggregate                   [+ agg & exchange]
  full     — the whole declared query (pairs+verify)

Usage: python tools/decompose_minhash.py [-n RUNS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataforge_spark.dedup.minhash import (  # noqa: E402
    minhash_dedup_pairs,
    minhash_signatures,
)
from dataforge_spark.dedup.ngram_jaccard import shingles_for  # noqa: E402
from dataforge_spark.partitioning import ensure_parallelism  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402


def main() -> None:
    runs = 4
    args = sys.argv[1:]
    if args and args[0] == "-n":
        runs = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("decompose_minhash")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )

    def base():
        return ensure_parallelism(docs.select("doc_id", "text"))

    def words():
        b = base()
        return b.select(
            F.col("doc_id").alias("id"),
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )

    def shingles():
        b = base()
        return b.select(
            F.col("doc_id").alias("id"),
            F.explode(shingles_for(b, F.col("text"), 3)).alias("s"),
        )

    def hashed():
        return shingles().select("id", F.xxhash64("s").alias("h"))

    def sigs():
        return minhash_signatures(docs, text_col="text", id_col="doc_id")

    def full():
        return minhash_dedup_pairs(
            docs, text_col="text", id_col="doc_id", n=3, num_perm=64,
            bands=16, threshold=0.9,
        )

    variants = {
        "words": words,
        "shingles": shingles,
        "hashed": hashed,
        "sigs": sigs,
        "full": full,
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(runs):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"decomp:{name}")
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 3))
    for name, ts in times.items():
        print(f"{name}: min={min(ts)} runs={ts}")


if __name__ == "__main__":
    main()
