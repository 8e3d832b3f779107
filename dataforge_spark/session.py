"""SparkSession factory tuned for this engine.

The reference (/root/reference/pipeline.py:131) is a single-process pandas
pipeline; our engine targets a multi-executor cluster. Local settings below
(shuffle partitions = cores, AQE on) are overridable via env so the same
code runs on a real cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sentinel strings the reference's profiler treats as missing
# (/root/reference/pipeline.py:437-441).
MISSING_SENTINELS = [
    "nan", "null", "none", "na", "n/a", "missing", "unknown",
    "", " ", "nil", "undefined",
]


def get_spark(app_name: str = "dataforge_spark") -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are sized for local[{SPARK_GRAFT_CPUS}] single-JVM runs; on a
    real cluster the master/memory settings come from spark-submit and these
    builder calls are inert. AQE handles runtime coalescing and skew joins —
    essential at 100 TB where static partition counts are always wrong.
    """
    # Default core count is cgroup/affinity-aware (ADVICE r13 item 2):
    # os.cpu_count() reports HOST logical CPUs, so under a cpuset/
    # taskset restriction local[host_cpus] would oversubscribe the
    # actually-available cores. SPARK_GRAFT_CPUS still overrides.
    try:
        _avail = len(os.sched_getaffinity(0)) or (os.cpu_count() or 4)
    except (AttributeError, OSError):
        _avail = os.cpu_count() or 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(_avail))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet reader settings pinned at BUILD time so every read in
        # the session sees the same physical-type mapping: the testdata's
        # events.ts has shipped as INT64 TIMESTAMP(NANOS) (read as bigint
        # under nanosAsLong) and as naive micros (TIMESTAMP_NTZ unless
        # inferTimestampNTZ is off). Setting these per-read made the
        # dtype of OTHER naive-micros columns order-dependent.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Spill-awareness: input split size bounds per-task memory at the
        # scan; at 100 TB with wide rows, shrink so a partition's working
        # set fits the executor (default 128 MiB).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(128 * 1024 * 1024)),
        )
        # AQE target size for post-shuffle coalescing — the lever that
        # keeps reducer partitions spill-free regardless of the static
        # shuffle.partitions setting.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", str(64 * 1024 * 1024)),
        )
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
