"""Compaction + manifest publish/verify: content equality and file
counts after compaction, shuffle-free plan for the coalesce path,
manifest round-trip, and detection of every tamper class."""

import os

import pytest
from pyspark.sql import functions as F

from dataforge_spark.maintenance import (
    compact_files,
    table_file_stats,
    verify_manifest,
    write_with_manifest,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    df.repartition(16).write.parquet(path)
    return path, df


def test_stats_and_compact_coalesce(spark, fragmented, tmp_path):
    path, df = fragmented
    before = table_file_stats(path)
    assert before["n_files"] == 16
    assert before["n_small_files"] == 16

    out = str(tmp_path / "compact")
    target = max(1, before["total_bytes"] // 2)  # aim for ~2 files
    rep = compact_files(spark, path, out, target_file_bytes=target)
    assert rep["after"]["n_files"] < before["n_files"]
    assert rep["after"]["n_files"] == rep["target_partitions"]
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_compact_coalesce_plan_has_no_shuffle(spark, fragmented, tmp_path):
    path, _df = fragmented
    stats = table_file_stats(path)
    n = max(1, stats["total_bytes"] // (stats["total_bytes"] // 2))
    plan = (
        spark.read.parquet(path).coalesce(int(n))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_compact_sorted(spark, fragmented, tmp_path):
    path, df = fragmented
    out = str(tmp_path / "sorted")
    rep = compact_files(
        spark, path, out,
        target_file_bytes=table_file_stats(path)["total_bytes"] + 1,
        sort_by=["k", "id"],
    )
    assert rep["after"]["n_files"] == 1
    back = spark.read.parquet(out)
    assert back.count() == 10_000
    # single sorted file: ids ascending within k
    rows = back.limit(0).collect()  # schema touch
    first = spark.read.parquet(out).collect()
    ks = [r["k"] for r in first]
    assert ks == sorted(ks)


def test_manifest_roundtrip_and_tampers(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(0, 500).select("id", (F.col("id") * 2).alias("v"))
    man = write_with_manifest(df.repartition(4), path)
    assert man["n_files"] == 4
    assert verify_manifest(spark, path)["ok"] is True
    assert verify_manifest(None, path)["ok"] is True  # driver-side twin

    parts = sorted(f for f in os.listdir(path) if f.startswith("part-"))
    # tamper 1: corrupt one byte (size unchanged) → hash mismatch
    victim = os.path.join(path, parts[0])
    data = bytearray(open(victim, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(data))
    v = verify_manifest(spark, path)
    assert v["ok"] is False and v["hash_mismatch"] == [parts[0]]
    # the corrupt file is LOCALIZED (ADVICE r12): the driver fallback
    # hashed it fine locally, so no residual per-file error remains
    assert v["hash_errors"] == {}
    # size-only mode misses it (documented trade)
    assert verify_manifest(spark, path, check_hashes=False)["ok"] is True

    # tamper 2: orphan file from a zombie writer
    orphan = os.path.join(path, "part-zombie.parquet")
    open(orphan, "wb").write(b"x")
    assert "part-zombie.parquet" in verify_manifest(spark, path)["orphans"]
    os.remove(orphan)

    # tamper 3: missing part
    os.remove(os.path.join(path, parts[1]))
    v = verify_manifest(spark, path, check_hashes=False)
    assert parts[1] in v["missing"]


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        compact_files(spark, str(tmp_path), str(tmp_path / "o"),
                      target_file_bytes=0)
    df = spark.range(3)
    with pytest.raises(ValueError):
        write_with_manifest(df, str(tmp_path / "t"), format="csv")


def test_verify_table_cli(spark, tmp_path, capsys):
    from dataforge_spark.__main__ import main

    path = str(tmp_path / "cli_tbl")
    df = spark.range(0, 50)
    write_with_manifest(df, path)
    assert main(["verify-table", "--path", path]) == 0
    parts = [f for f in os.listdir(path) if f.startswith("part-")]
    os.remove(os.path.join(path, parts[0]))
    assert main(["verify-table", "--path", path, "--no-hashes"]) == 1
