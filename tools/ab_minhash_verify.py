"""Interleaved A/B of the verify-phase shape in minhash_dedup_pairs
(r14): HEAD repartitions the FULL corpus (ensure_parallelism round-robin
exchange) BEFORE the candidate-id semi-join prunes it to candidate docs
only — the exchange moves every document's text so that ~1% of them can
be shingled. Variants move the prune first (guide §3.2: reduce the big
side before shuffling it):

  head         — ensure_parallelism(docs) -> semi-join -> shingles (r13)
  prune_first  — semi-join -> shingles (no repartition; candidate set is
                 output-sized, shingling it rides the scan partitioning)
  prune_repart — semi-join -> repartition(defaultParallelism) ->
                 shingles (scale belt: a pathological candidate set on a
                 single-row-group input still spreads; exchange carries
                 candidate docs only)

All variants produce the identical pair set (partitioning never changes
results; checksum printed to prove it). Interleaved min-of-N through the
noop sink.

Usage: python tools/ab_minhash_verify.py [-n RUNS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataforge_spark.dedup.minhash import (  # noqa: E402
    candidate_pairs,
    minhash_signatures,
)
from dataforge_spark.dedup.ngram_jaccard import shingles_for  # noqa: E402
from dataforge_spark.partitioning import ensure_parallelism  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402


def pairs_variant(df, mode, text_col="text", id_col="doc_id", n=3,
                  num_perm=64, bands=16, threshold=0.9, max_bucket=1000):
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_perm)
    cands = candidate_pairs(sigs, bands, rows_per_band, max_bucket)
    cands = cands.localCheckpoint()
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    slim = df.select(F.col(id_col).alias("id"), text_col)
    if mode == "head":
        vbase = ensure_parallelism(slim).join(cand_ids, "id", "left_semi")
    elif mode == "prune_first":
        vbase = slim.join(cand_ids, "id", "left_semi")
    elif mode == "prune_repart":
        vbase = slim.join(cand_ids, "id", "left_semi").repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
    else:
        raise ValueError(mode)
    sh = vbase.select(
        "id", shingles_for(vbase, F.col(text_col), n).alias("sh")
    ).localCheckpoint()
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")), 6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def main() -> None:
    runs = 4
    args = sys.argv[1:]
    if args and args[0] == "-n":
        runs = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_minhash_verify")
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    modes = ["head", "prune_first", "prune_repart"]
    for m in modes:
        row = (
            pairs_variant(docs, m)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("id_a") + F.col("id_b")).alias("sid"),
                F.sum(F.round(F.col("jaccard") * 1e6)).alias("sj"),
            )
            .collect()[0]
        )
        print(f"{m}: n={row['n']} sid={row['sid']} sj={row['sj']}", flush=True)
    times: dict[str, list[float]] = {m: [] for m in modes}
    for _ in range(runs):
        for m in modes:
            spark.sparkContext.setJobDescription(f"ab_verify:{m}")
            t0 = time.time()
            pairs_variant(docs, m).write.format("noop").mode(
                "overwrite"
            ).save()
            times[m].append(round(time.time() - t0, 3))
    for m, ts in times.items():
        print(f"{m}: min={min(ts)} runs={ts}")


if __name__ == "__main__":
    main()
