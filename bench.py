"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced through the noop sink (``format("noop")``) so the
FULL projection executes — ``count()`` would let Catalyst prune away the
computed columns and measure nothing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402

# Headline set: one per operator family + the scale-relevant extensions.
BENCH_QUERIES = [
    "s4_profile",
    "m5_fill_mean",
    "m8_forward_fill",
    "d1_dedup_keep_first",
    "o6_iqr_cap",
    "t2_auto_numeric",
    "x1_text_clean",
    "dt1_datetime_features",
    "e2_onehot_encode",
    "y1_common_typos",
    "n1_standard_scale",
    "dedup_exact_docs",
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "txt_metrics",
    "stream_sessionize",
    "pipeline_e2e",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    spark = get_spark("dataforge_bench")
    qs = entry.queries()

    # Warm-up: first job pays JVM/codegen/parquet-footer costs (~8 s);
    # keep it out of the per-query numbers. Touch both the lineitem and
    # the (nanos-timestamped) events read paths.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    ev = entry._events(spark, sf_dir)
    ev.write.format("noop").mode("overwrite").save()
    # also compile the hash-aggregate/exchange codegen paths once
    ev.groupBy("event_type").count().write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    t_all = time.time()
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    print(json.dumps({
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }), flush=True)


if __name__ == "__main__":
    main()
