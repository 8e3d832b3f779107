"""S5 sanitizer + partitioned-parquet pruning (the partition-pruning leg
of the scale story: a filtered read of a partitioned dataset must show
PartitionFilters at the scan, touching only matching directories)."""

import math

import numpy as np
from pyspark.sql import functions as F

from dataforge_spark.io import write_parquet
from dataforge_spark.sanitize import sanitize_for_json


def test_sanitize_for_json_handles_all_nonjson_scalars():
    obj = {
        "nan": float("nan"),
        "inf": float("inf"),
        "ninf": float("-inf"),
        "np_int": np.int64(7),
        "np_float": np.float32(2.5),
        "np_nan": np.float64("nan"),
        "nested": [{"x": float("nan")}, (np.int32(1), 2)],
        "ok": "text",
    }
    out = sanitize_for_json(obj)
    assert out["nan"] is None and out["inf"] is None and out["ninf"] is None
    assert out["np_int"] == 7 and isinstance(out["np_int"], int)
    assert math.isclose(out["np_float"], 2.5)
    assert out["np_nan"] is None
    assert out["nested"][0]["x"] is None
    assert list(out["nested"][1]) == [1, 2]
    import json

    json.dumps(out)  # must be fully serializable


def test_partitioned_write_prunes_at_scan(spark, events, tmp_path):
    path = str(tmp_path / "ev_part")
    write_parquet(events, path, partition_by=["event_type"])
    got = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]
    n_click = events.where(F.col("event_type") == "click").count()
    assert got.count() == n_click
