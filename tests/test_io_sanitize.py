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


def test_jsonl_roundtrip_and_compression(spark, tmp_path):
    """JSONL source/sink (r8): round-trip with explicit schema, gzip
    parts by default, partition_by layout, corrupt-line quarantine."""
    import gzip
    import json as _json
    import os

    from dataforge_spark.io import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", "fr"), (3, None, "en")],
        "doc_id long, text string, lang string",
    )
    p = str(tmp_path / "out_jsonl")
    write_jsonl(df, p, partition_by=["lang"])
    # gzip parts, hive layout
    parts = [
        os.path.join(r, f)
        for r, _, fs in os.walk(p) for f in fs if f.startswith("part-")
    ]
    assert parts and all(f.endswith(".gz") for f in parts)
    assert any("lang=en" in f for f in parts) and any("lang=fr" in f for f in parts)
    back = read_jsonl(spark, p, schema="doc_id long, text string")
    got = {(r["doc_id"], r["text"]) for r in back.collect()}
    assert got == {(1, "hello world"), (2, "bonjour"), (3, None)}

    # corrupt-line quarantine: malformed rows land in the corrupt col
    raw = str(tmp_path / "raw.jsonl")
    with open(raw, "w") as fh:
        fh.write(_json.dumps({"doc_id": 1, "text": "ok"}) + "\n")
        fh.write("{not valid json\n")
    q = read_jsonl(spark, raw, schema="doc_id long, text string",
                   corrupt_col="_bad")
    rows = {r["doc_id"]: r for r in q.collect()}
    assert rows[1]["_bad"] is None and rows[1]["text"] == "ok"
    bad = [r for r in rows.values() if r["_bad"] is not None]
    assert len(bad) == 1 and "{not valid json" in bad[0]["_bad"]

    # gzip input decompresses transparently by extension
    gz = str(tmp_path / "in.jsonl.gz")
    with gzip.open(gz, "wt") as fh:
        fh.write(_json.dumps({"doc_id": 9, "text": "zipped"}) + "\n")
    z = read_jsonl(spark, gz, schema="doc_id long, text string")
    assert [(r["doc_id"], r["text"]) for r in z.collect()] == [(9, "zipped")]

def test_orc_roundtrip_partition_pruning_and_pushdown(spark, tmp_path):
    """ORC source/sink (r9): round-trip with hive partition layout, scan
    partition-pruned, predicate pushed to the ORC reader, zstd parts."""
    import os

    from dataforge_spark.io import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "hello", "en", 10.5), (2, "bonjour", "fr", 2.0), (3, None, "en", -1.0)],
        "doc_id long, text string, lang string, score double",
    )
    p = str(tmp_path / "out_orc")
    write_orc(df, p, partition_by=["lang"])
    parts = [
        os.path.join(r, f)
        for r, _, fs in os.walk(p) for f in fs if f.startswith("part-")
    ]
    assert parts and all(f.endswith(".zstd.orc") for f in parts)
    assert any("lang=en" in f for f in parts) and any("lang=fr" in f for f in parts)

    back = read_orc(spark, p)
    got = {(r["doc_id"], r["text"]) for r in back.collect()}
    assert got == {(1, "hello"), (2, "bonjour"), (3, None)}

    # partition pruning + predicate pushdown reach the ORC scan
    q = back.where((F.col("lang") == "en") & (F.col("doc_id") > 1))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:120]
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters")[1][:120]
    assert [r["doc_id"] for r in q.collect()] == [3]

    # row_id attach mirrors the other sources
    assert "_row_id" in read_orc(spark, p, row_id=True).columns
