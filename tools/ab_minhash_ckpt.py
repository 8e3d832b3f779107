"""Interleaved A/B of checkpoint placement in minhash_dedup_pairs.
Variants: full (HEAD: banded+cands+sh), nockpt, banded_only, cands_sh.
Usage: python tools/ab_minhash_ckpt.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402
from dataforge_spark.dedup.minhash import (  # noqa: E402
    banded_keys, minhash_signatures,
)
from dataforge_spark.dedup.ngram_jaccard import shingles_for  # noqa: E402
from dataforge_spark.partitioning import ensure_parallelism  # noqa: E402


def pairs_variant(df, ckpt_banded, ckpt_cands, ckpt_sh,
                  text_col="text", id_col="doc_id", n=3, num_perm=64,
                  bands=16, threshold=0.9, max_bucket=1000):
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_perm)
    banded = banded_keys(sigs, bands, rows_per_band)
    if ckpt_banded:
        banded = banded.localCheckpoint()
    sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    ok = banded.join(
        sizes.where((F.col("n") > 1) & (F.col("n") <= max_bucket)),
        ["band", "bucket"],
    )
    a0, b0 = ok.alias("a"), ok.alias("b")
    cands = (
        a0.join(
            b0,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if ckpt_cands:
        cands = cands.localCheckpoint()
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .unionByName(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    vbase = ensure_parallelism(
        df.select(F.col(id_col).alias("id"), text_col)
    ).join(cand_ids, "id", "left_semi")
    sh = vbase.select(
        "id", shingles_for(vbase, F.col(text_col), n).alias("sh")
    )
    if ckpt_sh:
        sh = sh.localCheckpoint()
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")), 6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


VARIANTS = {
    "full": (True, True, True),
    "nockpt": (False, False, False),
    "banded_only": (True, False, False),
    "cands_sh": (False, True, True),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_minhash_ckpt")
    docs = entrymod._t(spark, sf_dir, "documents")
    res: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    for r in range(rounds):
        for tag, (cb, cc, cs) in VARIANTS.items():
            spark.sparkContext.setJobDescription(f"mh:{tag}:r{r}")
            t0 = time.time()
            out = pairs_variant(docs, cb, cc, cs)
            out.write.format("noop").mode("overwrite").save()
            res.setdefault(tag, []).append(time.time() - t0)
            if r == 0:
                counts[tag] = pairs_variant(docs, cb, cc, cs).count()
    print("row counts per variant (must all match):", counts)
    for tag, runs in res.items():
        print(f"{tag:12s} min {min(runs):6.3f}  runs {[round(x,2) for x in runs]}")


if __name__ == "__main__":
    main()
