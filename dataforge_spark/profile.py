"""Dataset profiler (SURVEY §2.1 S4).

Mirrors ``get_dataset_info`` (/root/reference/pipeline.py:411-496): shape,
dtypes, per-column missing counts (max over null / empty / whitespace /
sentinel-word detection), duplicate-row count, memory estimate, 5-row
sample — but as ONE distributed aggregate pass instead of pandas loops
(/root/reference/pipeline.py:425-475 iterates per column per method).

Scale: the whole profile is a single job — one full scan, one shuffle-free
partial+final aggregation; duplicate counting rides the same pass via
``count_distinct(struct(*))``. Sample is a separate ``limit(5)`` job that
reads only the first partition.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .session import MISSING_SENTINELS


def _missing_expr(field: T.StructField):
    """Per-column missing predicate = union of the reference's 5 detectors
    (/root/reference/pipeline.py:425-450): isnull/isna, empty string,
    whitespace-only, sentinel vocabulary (case-insensitive)."""
    c = F.col(field.name)
    cond = c.isNull()
    if isinstance(field.dataType, (T.DoubleType, T.FloatType)):
        cond = cond | F.isnan(c)
    if isinstance(field.dataType, T.StringType):
        cond = cond | F.lower(F.trim(c)).isin([s.strip() for s in MISSING_SENTINELS])
    return cond


def missing_counts(df: DataFrame) -> dict[str, int]:
    """Per-column missing counts in one aggregate pass."""
    aggs = [
        F.sum(_missing_expr(f).cast("long")).alias(f.name) for f in df.schema.fields
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: int(row[name] or 0) for name in df.columns}


def dataset_info(df: DataFrame, sample_rows: int = 5) -> dict[str, Any]:
    """Full profile as a JSON-ready dict (reference report contract)."""
    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("__rows"),
            F.count_distinct(F.struct(*cols)).alias("__distinct_rows")]
    aggs += [F.sum(_missing_expr(f).cast("long")).alias(f"__miss_{f.name}")
             for f in df.schema.fields]
    aggs += [F.count_distinct(F.col(c)).alias(f"__uniq_{c}") for c in cols]
    row = df.agg(*aggs).collect()[0].asDict()

    n_rows = int(row["__rows"])
    missing = {c: int(row[f"__miss_{c}"] or 0) for c in cols}
    sample = [r.asDict() for r in df.limit(sample_rows).collect()]
    return {
        "shape": {"rows": n_rows, "columns": len(cols)},
        "columns": cols,
        "dtypes": {f.name: f.dataType.simpleString() for f in df.schema.fields},
        "missing_values": missing,
        "total_missing": sum(missing.values()),
        "unique_counts": {c: int(row[f"__uniq_{c}"] or 0) for c in cols},
        "duplicate_rows": n_rows - int(row["__distinct_rows"]),
        "sample_data": sample,
    }
