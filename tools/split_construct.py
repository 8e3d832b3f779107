"""Per-query split of construction time (jobs run while building the
DataFrame: collects, checkpoints, samples) vs action time (the noop
write), plus the number of Spark jobs each phase ran — identifies
job-overhead-bound rows. One session, min-of-N per query.

Usage: python tools/split_construct.py [-n RUNS] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("split_construct")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = dict(entrymod.queries())
    names = args or [
        "x_text_suite", "dt1_datetime_features", "e2_onehot_encode",
        "y1_common_typos", "n1_n5_standard_roundtrip",
        "dedup_exact_intercorpus", "dedup_spans", "sim_cosine_topk",
        "sim_pq_topk", "sim_ivf_topk", "sim_ivf_disk_topk",
        "o4_isolation_forest", "curation_contamination", "curation_pack",
        "m8_m9_ordered_fill", "d1_dedup_keep_first", "join_asof",
        "m5_m6_fill_stats", "s4_profile", "t234_auto_convert",
    ]
    for name in names:
        if name not in qs:
            print(f"{name}: not a query")
            continue
        best = None
        for r in range(runs):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"split:{name}:r{r}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = len(tracker.getJobIdsForGroup(None) or [])
            row = (t2 - t0, t1 - t0, t2 - t1, j1 - j0, j2 - j1)
            if best is None or row[0] < best[0]:
                best = row
        tot, c, a, jc, ja = best
        print(f"{name:28s} total {tot:6.2f}  construct {c:6.2f} ({jc} jobs)"
              f"  action {a:6.2f} ({ja} jobs)")


if __name__ == "__main__":
    main()
