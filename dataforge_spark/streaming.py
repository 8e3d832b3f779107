"""Structured Streaming variants of the engine's operators (extension,
SURVEY §7.4 — the reference has no streaming at all, SURVEY §2.11).

Patterns used:
- file-source ``readStream`` with an explicit schema (streaming sources
  cannot infer),
- ``withWatermark`` + ``dropDuplicates`` for exactly-once keyed dedup with
  bounded state — the state store evicts keys older than the watermark, so
  the job runs forever on an unbounded stream,
- windowed aggregation with late-data handling for the streaming profiler,
- ``trigger(availableNow=True)`` + memory sink for deterministic testing
  on the driver's parquet testdata.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory."""
    return spark.readStream.schema(schema).parquet(path)


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked exact dedup: keeps the first arrival per key; state for
    keys older than the watermark is evicted (bounded memory on unbounded
    input)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def profile_stream(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-window profile: row count, null count, min/max/avg —
    the streaming analogue of the batch profiler's single aggregation
    pass. Late rows within the watermark update their window; older rows
    are dropped."""
    v = F.col(value_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(v.isNull().cast("long")).alias("n_null"),
            F.min(v).alias("v_min"),
            F.max(v).alias("v_max"),
            F.avg(v).alias("v_avg"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_rows", "n_null", "v_min", "v_max", "v_avg",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str | None = None) -> DataFrame:
    """Drain a (bounded) stream with availableNow into a memory sink and
    return the materialized result as a batch DataFrame — the test/driver
    harness for the streaming operators above."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def run_aggregate_to_memory(stream_df: DataFrame, name: str | None = None) -> DataFrame:
    """Same as run_to_memory but for aggregate streams (complete mode)."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
