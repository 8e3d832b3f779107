"""Datetime parsing DT1–DT2 (SURVEY §2.7) — the ADVERTISED contract.

Reference: /root/reference/methods/dateTimeParsing.py:3-28 (ratio-gated
``pd.to_datetime``) plus the advertised-but-unwired feature extraction
(/root/reference/main.py:290-298). NOTE the reference's wiring bug makes
this op a no-op in every recorded run (SURVEY §2.7); we implement what it
advertises: parse string columns whose parse-ratio over ALL rows exceeds
50%, optionally appending ``{col}_year/month/day/dayofweek/hour`` columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import ROW_ID
from .type_conversion import DATETIME_FORMATS, parse_timestamp_expr

FEATURES = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "dayofweek": F.dayofweek,  # 1=Sunday … 7=Saturday (Spark convention)
    "hour": F.hour,
}


def parse_datetime_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    date_format: str | None = None,
    auto_detect: bool = True,
    extract_features: bool = False,
    min_parse_ratio: float = 0.5,
    errors: str = "coerce",
) -> DataFrame:
    """``errors``: 'coerce' nulls unparseable values (pandas default in
    the reference, methods/dateTimeParsing.py:21); 'raise' errors when an
    adopted column still has unparseable non-null values; 'ignore' leaves
    such columns entirely unchanged (pandas astype semantics)."""
    if errors not in ("coerce", "raise", "ignore"):
        raise ValueError(f"errors must be coerce|raise|ignore, got {errors!r}")
    fmts = [date_format] if date_format else DATETIME_FORMATS
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType) and f.name != ROW_ID
        ]
    candidates = [c for c in columns if c in df.columns]
    ts_cols: list[str] = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (T.TimestampType, T.DateType)) and f.name in (columns or [])
    ]

    str_candidates = [c for c in candidates if c not in ts_cols]
    adopt: list[str] = []
    if str_candidates and auto_detect:
        # DT1 gate: parsed-count / TOTAL rows > ratio (reference :23 uses
        # all rows, not non-null rows). One aggregate job for all columns.
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.count(parse_timestamp_expr(F.col(c), fmts)).alias(c)
            for c in str_candidates
        ]
        row = df.agg(*aggs).collect()[0]
        n = row["__n"] or 1
        adopt = [c for c in str_candidates if row[c] / n > min_parse_ratio]
    elif str_candidates:
        adopt = str_candidates

    if adopt and errors in ("raise", "ignore"):
        bad = df.agg(
            *[
                F.sum(
                    (F.col(c).isNotNull() & parse_timestamp_expr(F.col(c), fmts).isNull())
                    .cast("long")
                ).alias(c)
                for c in adopt
            ]
        ).collect()[0]
        failing = [c for c in adopt if bad[c]]
        if failing and errors == "raise":
            raise ValueError(f"unparseable datetime values in columns {failing}")
        if failing:  # ignore: leave those columns untouched
            adopt = [c for c in adopt if c not in failing]

    out = df
    for c in adopt:
        out = out.withColumn(c, parse_timestamp_expr(F.col(c), fmts))
    if extract_features:
        for c in adopt + ts_cols:
            for feat, fn in FEATURES.items():
                out = out.withColumn(f"{c}_{feat}", fn(F.col(c)))
    return out
