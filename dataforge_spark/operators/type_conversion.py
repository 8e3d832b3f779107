"""Type conversion T1–T6 (SURVEY §2.5).

Reference: ``convert_data_types``
(/root/reference/methods/dataTypeConversion.py:17-191). Manual cast map
with errors∈{coerce,raise,ignore}, plus auto-detection passes over string
columns: numeric (>70% parse), datetime (>50% parse), boolean (value-set
⊆ truthy/falsy vocabulary), category (<50% unique & <100 distinct — a
storage hint only in Spark; Parquet dictionary-encodes for free).

Scale: all detection ratios for all candidate columns are computed in ONE
aggregate job; casts are pure projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import ROW_ID

_BOOL_TRUE = ["true", "1", "yes", "y", "t"]
_BOOL_FALSE = ["false", "0", "no", "n", "f"]
_BOOL_VOCAB = set(_BOOL_TRUE) | set(_BOOL_FALSE)

# Prioritized timestamp formats reproducing pandas' per-value inference
# deterministically (SURVEY §7.3 item 3).
DATETIME_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
    "dd/MM/yyyy",
    "yyyy/MM/dd",
    "MM-dd-yyyy",
    "dd-MM-yyyy",
]

_TYPE_ALIASES = {
    "int": "bigint", "int64": "bigint", "integer": "bigint",
    "float": "double", "float64": "double",
    "str": "string", "object": "string", "category": "string",
    "bool": "boolean", "datetime": "timestamp", "datetime64": "timestamp",
}


def parse_timestamp_expr(col, formats: list[str] | None = None):
    """First-match-wins timestamp parse over a fixed format list."""
    formats = formats or DATETIME_FORMATS
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in formats])


def convert_data_types(
    df: DataFrame,
    type_mapping: dict[str, str] | None = None,
    auto_detect: bool = True,
    errors: str = "coerce",
) -> DataFrame:
    out = df

    # T1 — manual cast map
    for col, target in (type_mapping or {}).items():
        if col not in out.columns:
            continue
        spark_type = _TYPE_ALIASES.get(target.lower(), target.lower())
        src = F.col(col)
        if spark_type == "timestamp":
            casted = parse_timestamp_expr(src)
        elif spark_type == "boolean":
            casted = (
                F.when(F.lower(F.trim(src)).isin(_BOOL_TRUE), F.lit(True))
                .when(F.lower(F.trim(src)).isin(_BOOL_FALSE), F.lit(False))
                .otherwise(F.lit(None).cast("boolean"))
            )
        else:
            casted = src.try_cast(spark_type)
        if errors in ("ignore", "raise"):
            # pandas astype(errors='ignore') leaves the column UNCHANGED when
            # any value fails (never a silent partial null-out); 'raise'
            # errors out. Both need the failure count first.
            n_bad = out.where(src.isNotNull() & casted.isNull()).count()
            if n_bad:
                if errors == "raise":
                    raise ValueError(f"{n_bad} values of {col!r} fail cast to {target}")
                continue  # ignore: skip this column entirely
        out = out.withColumn(col, casted)

    if not auto_detect:
        return out

    str_cols = [
        f.name
        for f in out.schema.fields
        if isinstance(f.dataType, T.StringType) and f.name != ROW_ID
    ]
    if not str_cols:
        return out

    # First aggregate pass: per column — non-null count, numeric-parse
    # count, integral count, distinct count, bool-vocab count. The
    # datetime probe (8 try_to_timestamp formats per value — by far the
    # most expensive detector) runs in a SECOND pass restricted to the
    # columns that failed the cheap detectors, so numeric/boolean tables
    # never pay for it.
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in str_cols:
        v = F.col(c)
        num = v.try_cast("double")
        aggs += [
            F.count(v).alias(f"nn_{c}"),
            F.count(num).alias(f"num_{c}"),
            F.sum(((num.isNotNull()) & (num == F.floor(num))).cast("long")).alias(f"int_{c}"),
            F.count_distinct(v).alias(f"uniq_{c}"),
            F.sum(F.lower(F.trim(v)).isin(sorted(_BOOL_VOCAB)).cast("long")).alias(f"bool_{c}"),
        ]
    s = out.agg(*aggs).collect()[0]

    dt_candidates = []
    for c in str_cols:
        nn = s[f"nn_{c}"]
        if not nn:
            continue
        v = F.col(c)
        # T4 auto-boolean: every non-null value in vocabulary, ≥2 distinct
        if s[f"bool_{c}"] == nn and s[f"uniq_{c}"] >= 2:
            out = out.withColumn(
                c,
                F.when(F.lower(F.trim(v)).isin(_BOOL_TRUE), True)
                .when(F.lower(F.trim(v)).isin(_BOOL_FALSE), False),
            )
        # T2 auto-numeric: >70% of non-null parse
        elif s[f"num_{c}"] / nn > 0.70:
            if s[f"int_{c}"] == s[f"num_{c}"]:
                out = out.withColumn(c, v.try_cast("double").try_cast("bigint"))
            else:
                out = out.withColumn(c, v.try_cast("double"))
        else:
            dt_candidates.append(c)
        # T5 auto-category: metadata-only in Spark (dictionary encoding is a
        # Parquet storage concern, not a logical type) — no-op.

    if dt_candidates:
        dts = out.agg(
            *[F.count(parse_timestamp_expr(F.col(c))).alias(c) for c in dt_candidates]
        ).collect()[0]
        for c in dt_candidates:
            # T3 auto-datetime: >50% of non-null parse
            if dts[c] / s[f"nn_{c}"] > 0.50:
                out = out.withColumn(c, parse_timestamp_expr(F.col(c)))
    return out
