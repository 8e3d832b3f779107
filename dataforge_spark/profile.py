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

from .io import ROW_ID, qcol
from .session import MISSING_SENTINELS


def _user_fields(df: DataFrame) -> list[T.StructField]:
    """Profile the USER's columns — the internal ``_row_id`` order key is
    engine plumbing (it would make every row distinct and break the
    duplicate count)."""
    return [f for f in df.schema.fields if f.name != ROW_ID]


def _missing_expr(field: T.StructField):
    """Per-column missing predicate = union of the reference's 5 detectors
    (/root/reference/pipeline.py:425-450): isnull/isna, empty string,
    whitespace-only, sentinel vocabulary (case-insensitive)."""
    c = qcol(field.name)
    cond = c.isNull()
    if isinstance(field.dataType, (T.DoubleType, T.FloatType)):
        cond = cond | F.isnan(c)
    if isinstance(field.dataType, T.StringType):
        cond = cond | F.lower(F.trim(c)).isin([s.strip() for s in MISSING_SENTINELS])
    return cond


def missing_counts(df: DataFrame) -> dict[str, int]:
    """Per-column missing counts in one aggregate pass."""
    fields = _user_fields(df)
    aggs = [F.sum(_missing_expr(f).cast("long")).alias(f.name) for f in fields]
    row = df.agg(*aggs).collect()[0]
    return {f.name: int(row[f.name] or 0) for f in fields}


def profile_df(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """The profiler as a DataFrame (long format): one row per column with
    (col_name, n_missing, n_unique, n_rows, dup_rows). Same single
    aggregation pass as ``dataset_info`` but SQL-comparable for the
    correctness oracle.

    ``approx=True`` swaps the exact distinct counts for HyperLogLog++
    (``approx_count_distinct``, default 5% rsd): at 100 TB each exact
    count_distinct multiplies the aggregate's shuffled state by the
    column's cardinality, while the sketch is a fixed few KB per column —
    profiling dashboards should always run approx."""
    from .partitioning import ensure_parallelism

    cd = F.approx_count_distinct if approx else F.count_distinct
    # The exact-distinct partials are the expensive half of this job;
    # rebalance single-row-group inputs so they don't run on one core.
    df = ensure_parallelism(df)
    fields = [f for f in _user_fields(df) if columns is None or f.name in columns]
    cols = [f.name for f in fields]
    all_cols = [f.name for f in _user_fields(df)]
    aggs = [F.count(F.lit(1)).alias("__rows"),
            cd(F.struct(*[qcol(c) for c in all_cols])).alias("__distinct_rows")]
    aggs += [F.sum(_missing_expr(f).cast("long")).alias(f"__miss_{f.name}") for f in fields]
    aggs += [cd(qcol(c)).alias(f"__uniq_{c}") for c in cols]
    row = df.agg(*aggs).collect()[0].asDict()
    n_rows = int(row["__rows"])
    # HLL++ at 5% rsd can OVERestimate distincts; clamp so approx profiles
    # never report negative duplicate counts or n_unique > n_rows.
    dup = max(0, n_rows - int(row["__distinct_rows"]))
    data = [
        (c, int(row[f"__miss_{c}"] or 0), min(int(row[f"__uniq_{c}"] or 0), n_rows),
         n_rows, dup)
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        data, "col_name string, n_missing bigint, n_unique bigint, n_rows bigint, dup_rows bigint"
    )


def top_values(
    df: DataFrame, columns: list[str] | None = None, k: int = 10
) -> dict[str, list[tuple[Any, int]]]:
    """Approximate top-k most frequent values per column, ONE codegen'd
    aggregate pass for all columns (native ``approx_top_k`` sketch —
    fixed-size state per column, the 100 TB-safe alternative to an exact
    value-counts groupBy per column). Returns
    ``{col: [(value, count), ...]}`` ordered most-frequent first.
    Non-atomic columns (arrays/maps/structs/binary) are skipped —
    ``approx_top_k`` is defined over atomic comparable types."""
    atomic = (
        T.StringType, T.BooleanType, T.DateType, T.TimestampType,
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    fields = [
        f for f in _user_fields(df)
        if (columns is None or f.name in columns) and isinstance(f.dataType, atomic)
    ]
    if not fields:
        return {}
    row = df.agg(
        *[
            F.expr(
                f"approx_top_k(`{f.name.replace('`', '``')}`, {int(k)})"
            ).alias(f.name)
            for f in fields
        ]
    ).collect()[0]
    return {
        f.name: [(r["item"], int(r["count"])) for r in (row[f.name] or [])]
        for f in fields
    }


# Estimated in-memory bytes per value by Spark column type, for the T7
# memory report (informational parity with pandas memory_usage(deep=True),
# /root/reference/methods/dataTypeConversion.py:181-191 — the reference
# prints before/after deep memory; exact byte equality with pandas block
# layout is neither possible nor useful here).
_FIXED_WIDTHS: list[tuple[type, int]] = [
    (T.BooleanType, 1), (T.ByteType, 1), (T.ShortType, 2),
    (T.IntegerType, 4), (T.FloatType, 4),
    (T.LongType, 8), (T.DoubleType, 8),
    (T.TimestampType, 8), (T.DateType, 4),
]


def memory_report(df: DataFrame) -> dict[str, Any]:
    """T7: estimated bytes per column + total, from one aggregate pass
    (strings/binary use exact summed lengths; fixed-width types use
    count × width)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    var_cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.StringType, T.BinaryType)):
            var_cols.append(f.name)
            aggs.append(F.sum(F.octet_length(qcol(f.name))).alias(f"__len_{f.name}"))
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n"])
    per_col: dict[str, int] = {}
    for f in df.schema.fields:
        if f.name in var_cols:
            per_col[f.name] = int(row[f"__len_{f.name}"] or 0)
        else:
            width = next((w for t, w in _FIXED_WIDTHS if isinstance(f.dataType, t)), 8)
            per_col[f.name] = n * width
    return {"rows": n, "columns": per_col, "total_bytes": sum(per_col.values())}


def dataset_info(df: DataFrame, sample_rows: int = 5) -> dict[str, Any]:
    """Full profile as a JSON-ready dict (reference report contract)."""
    fields = _user_fields(df)
    cols = [f.name for f in fields]
    aggs = [F.count(F.lit(1)).alias("__rows"),
            F.count_distinct(F.struct(*[qcol(c) for c in cols])).alias("__distinct_rows")]
    aggs += [F.sum(_missing_expr(f).cast("long")).alias(f"__miss_{f.name}")
             for f in fields]
    aggs += [F.count_distinct(qcol(c)).alias(f"__uniq_{c}") for c in cols]
    row = df.agg(*aggs).collect()[0].asDict()

    n_rows = int(row["__rows"])
    missing = {c: int(row[f"__miss_{c}"] or 0) for c in cols}
    sample = [r.asDict() for r in df.select(*[qcol(c).alias(c) for c in cols]).limit(sample_rows).collect()]
    return {
        "shape": {"rows": n_rows, "columns": len(cols)},
        "columns": cols,
        "dtypes": {f.name: f.dataType.simpleString() for f in fields},
        "missing_values": missing,
        "total_missing": sum(missing.values()),
        "unique_counts": {c: int(row[f"__uniq_{c}"] or 0) for c in cols},
        "duplicate_rows": n_rows - int(row["__distinct_rows"]),
        "sample_data": sample,
    }
