"""Isolated per-query timing: min-of-N through the noop sink, with
/proc/stat steal sampling around the block so co-tenant noise is visible
next to the number instead of silently inside it.

Usage: python tools/time_query.py [-n RUNS] query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402


def _stat() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return sum(vals), vals[7]  # total jiffies, steal jiffies


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_query")
    from bench import BENCH_QUERIES, _s4_profile_approx  # noqa: F401

    qs = dict(entrymod.queries())
    qs["s4_profile_approx"] = _s4_profile_approx
    qs["sim_cosine_topk"] = entrymod.q_sim_cosine_topk
    qs["stream_window_agg"] = entrymod.q_stream_wagg_only
    qs["stream_sjoin"] = entrymod.q_stream_sjoin_only
    out = {}
    for name in args:
        spark.sparkContext.setJobDescription(f"time_query:{name}")
        t_tot0, s0 = _stat()
        ts = []
        for _ in range(runs):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        t_tot1, s1 = _stat()
        steal_pct = 100.0 * (s1 - s0) / max(1, t_tot1 - t_tot0)
        out[name] = {"min": min(ts), "runs": ts, "steal_pct": round(steal_pct, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
