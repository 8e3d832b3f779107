"""Interleaved A/B of streaming state-store maintenance/retention knobs
on the stream_sjoin drain (r14 VERDICT task 7: floor probe). The row's
steady cost above the generic stream overhead is ~0.7 s at sf0.1; this
probes whether any of it is avoidable config overhead:

  head      — session defaults (maintenanceInterval 60s,
              minBatchesToRetain 100)
  maint600  — stateStore.maintenanceInterval = 600s (no maintenance
              wakeups inside the drain window)
  retain2   — minBatchesToRetain = 2 (minimal commit-log retention)
  both      — both overrides

All variants drain the identical query; outputs are read back and
checksummed once. Usage: python tools/ab_stream_floor.py [-n RUNS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402

VARIANTS = {
    "head": {},
    "maint600": {"spark.sql.streaming.stateStore.maintenanceInterval": "600s"},
    "retain2": {"spark.sql.streaming.minBatchesToRetain": "2"},
    "both": {
        "spark.sql.streaming.stateStore.maintenanceInterval": "600s",
        "spark.sql.streaming.minBatchesToRetain": "2",
    },
}


def main() -> None:
    runs = 4
    args = sys.argv[1:]
    if args and args[0] == "-n":
        runs = int(args[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_stream_floor")
    em._utc(spark)

    def run_once(name: str) -> float:
        overrides = VARIANTS[name]
        saved = {}
        for k, v in overrides.items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            spark.conf.set(k, v)
        try:
            spark.sparkContext.setJobDescription(f"ab_floor:{name}")
            t0 = time.time()
            em.q_stream_sjoin_only(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.time() - t0, 3)
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    # checksums once (variants must agree)
    for name in VARIANTS:
        df = em.q_stream_sjoin_only(spark, sf_dir)
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("op", "k", "n", "v")).alias("ck"),
        ).collect()[0]
        print(f"{name}: n={r['n']} ck={r['ck']}", flush=True)
    times: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for _ in range(runs):
        for name in VARIANTS:
            times[name].append(run_once(name))
    for name, ts in times.items():
        print(f"{name}: min={min(ts)} runs={ts}")


if __name__ == "__main__":
    main()
