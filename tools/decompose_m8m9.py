"""Decompose the m8_m9_ordered_fill sf1 row (VERDICT r12 task 2).

The row drifted 1.8-2.25 s (r6/r7 committed) -> 4.7-5.3 s (r12) with the
operator byte-unchanged since r10; the session carried a documented
~1.5-2x host elevation that explains part but not cleanly all of it.
This tool measures, isolated and calibration-bracketed (best-of-4):

- cal_pre / cal_post     host-speed reference (steady ~0.10-0.15 s)
- scan                   events read + null-inject projection, noop sink
- sketch                 the order-key quantile sketch aggregate alone
                         (the per-fill statistics job)
- ffill_only             ONE fill (forward) end to end
- full_row               the shipped q_m8_m9_ordered_fill (both fills)

so the drift can be pinned to a phase (or to the host). Run it on a
QUIET box: ``python tools/decompose_m8m9.py [sf_dir]``. Prints one JSON
line; paste the result into PLANS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402


def best_of(fn, n=4):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    import bench
    from dataforge_spark.functions.quantiles import sketch_quantiles
    from dataforge_spark.operators.missing_values import fix_missing_values

    spark = get_spark("m8m9_decompose")
    if len(sys.argv) > 1:
        sf1_dir = sys.argv[1]
    else:
        from tools.make_sf1 import ensure_sf1

        sf1_dir = ensure_sf1(spark, "/root/testdata/sf0.1")

    def both():
        ev = entry._events(spark, sf1_dir)
        return ev.select(
            "event_id",
            F.when(F.col("event_id") % 5 == 0, None)
            .otherwise(F.col("value")).alias("value"),
            F.when(F.col("event_id") % 7 == 0, None)
            .otherwise(F.col("value")).alias("value_bf"),
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the read path + plan shapes once, off the clock
    noop(both())
    entry.q_m8_m9_ordered_fill(spark, sf1_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {
        "sf1_dir": sf1_dir,
        "rows": both().count(),
        "cal_pre": bench._calibration_sec(spark),
        "scan": best_of(lambda: noop(both())),
        "sketch": best_of(
            lambda: sketch_quantiles(
                both().withColumn("_ord_key", F.col("event_id").cast("double"))
                .select("_ord_key"),
                ["_ord_key"],
                [i / 32 for i in range(1, 32)],
                0.001,
            )
        ),
        "ffill_only": best_of(
            lambda: noop(
                fix_missing_values(
                    both(), "forward_fill", columns=["value"],
                    order_col="event_id",
                )
            )
        ),
        "full_row": best_of(
            lambda: noop(entry.q_m8_m9_ordered_fill(spark, sf1_dir))
        ),
        "cal_post": bench._calibration_sec(spark),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
