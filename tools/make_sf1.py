"""Generate an sf1-scale testdata directory by replicating sf0.1 10x.

The driver ships parquet at sf{0.001,0.01,0.1} only; BASELINE.md's own
crossover measurements show ~6M rows (sf1) is where engine design starts
to matter, so the bench needs an sf1 corpus. Each large table is
replicated ``FACTOR`` times with every intra-/inter-table KEY column
shifted by ``copy * OFFSET``: per-copy key spaces are disjoint, and
because both sides of every foreign key shift by the same amount
(o_custkey and c_custkey, l_orderkey and o_orderkey, ...), referential
integrity holds copy-by-copy. Small dimension FKs (nation/region keys)
are NOT shifted and their tables not replicated, so dimension joins keep
resolving. Value columns are copied verbatim — 10 identical value
distributions, which is exactly what a bench wants (results scale
predictably and stay oracle-checkable).

The output is cached under /tmp keyed on the source tables' fingerprint
(path+mtime+size); regeneration only happens when the driver's testdata
changes.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# tiny dimensions: copied once, keys untouched
NO_REPLICATE = {"region", "nation"}
# key columns that shift per copy (both FK sides always shift together)
SHIFT_COLS = {
    "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey",
    "c_custkey", "s_suppkey", "p_partkey",
    "ps_partkey", "ps_suppkey",
    "event_id", "user_id", "doc_id", "vec_id",
}
FACTOR = 10
OFFSET = 100_000_000
GENVER = 3  # bump when the generation logic changes (cache key)
# Replicated tables are written across this many files: the 10x
# crossJoin of a single-row-group source otherwise lands in ONE task →
# one file with ONE 6M-row row group, and parquet cannot split a row
# group — every sf1 scan then runs on a single core (measured: a
# 21-split lineitem scan where 20 splits read 0 rows). A real corpus at
# this size has many row groups; 32 files models that and matches the
# bench box's cores.
WRITE_PARTS = 32


def _fingerprint(src_dir: str) -> str:
    parts = []
    for t in TABLES:
        p = os.path.join(src_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append(f"{t}:absent")
    ident = "|".join([src_dir, str(FACTOR), str(OFFSET), str(GENVER)] + parts)
    return hashlib.md5(ident.encode()).hexdigest()[:16]


def ensure_sf1(spark, src_dir: str = "/root/testdata/sf0.1",
               base: str = "/tmp/dataforge_sf1") -> str:
    """Build (or reuse) the replicated corpus; returns its directory."""
    fp = _fingerprint(src_dir)
    dst = f"{base}_{fp}"
    marker = os.path.join(dst, "_SF1_DONE.json")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    copies = F.broadcast(
        spark.range(FACTOR).select(F.col("id").alias("__copy"))
    )
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        if t in NO_REPLICATE:
            out = df
        else:
            rep = df.crossJoin(copies)
            for c in df.columns:
                if c in SHIFT_COLS:
                    dt = dict(df.dtypes)[c]
                    rep = rep.withColumn(
                        c, (F.col(c) + F.col("__copy") * OFFSET).cast(dt)
                    )
            if t == "documents":
                # Verbatim text replication would make every doc a member
                # of a 10-copy exact/near-dup clique — the dedup queries'
                # pair count then grows QUADRATICALLY in the replication
                # factor, benchmarking the replication artifact instead of
                # the operator. Mutate ~1/5 of words per non-zero copy
                # (position+copy-keyed token swap) so cross-copy 3-gram
                # Jaccard falls well below the 0.5 near-dup threshold
                # while copy 0 keeps the original corpus intact.
                toks = F.split(F.trim(F.col("text")), r"\s+")
                mutated = F.concat_ws(
                    " ",
                    F.transform(
                        toks,
                        lambda w, i: F.when(
                            (i + F.col("__copy")) % 5 == 0,
                            F.concat(
                                F.lit("zq"),
                                F.col("__copy").cast("string"),
                                F.lit("x"),
                                (i % 97).cast("string"),
                            ),
                        ).otherwise(w),
                    ),
                )
                rep = rep.withColumn(
                    "text",
                    F.when(F.col("__copy") == 0, F.col("text")).otherwise(mutated),
                )
            out = rep.drop("__copy").repartition(WRITE_PARTS)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{t}.parquet"))
    with open(marker, "w") as f:
        json.dump({"src": src_dir, "factor": FACTOR, "offset": OFFSET}, f)
    return dst


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dataforge_spark.session import get_spark

    print(ensure_sf1(get_spark("make_sf1")))
