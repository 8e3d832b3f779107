"""Categorical encoding E1–E3 (SURVEY §2.8).

Reference: ``Encoding.encode_categorical_data``
(/root/reference/methods/encoding.py:22-192).

* E1 label: codes assigned in sorted lexicographic order of unique values
  (sklearn LabelEncoder), nulls mapped to ``'__MISSING__'`` first.
* E2 onehot: ``pd.get_dummies`` semantics — one 0/1 column per category in
  SORTED order, ``_nan`` null-indicator column, skip columns with >50
  categories, optional ``drop_first``.
* E3 "target" is actually FREQUENCY encoding (no target variable exists,
  reference :167): relative frequency mapped to ``{col}_freq_encoded``.

Scale: category domains are bounded (≤50 for onehot by contract; label
domains assumed dictionary-sized) → collect distinct values to the driver
once, broadcast the mapping back as a literal expression — no shuffle on
the big table, no join. E3 avoids even the collect: a window-free
broadcast join of the tiny frequency table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import ROW_ID

MISSING_TOKEN = "__MISSING__"


def _categorical_cols(df: DataFrame, columns: list[str] | None) -> list[str]:
    if columns is not None:
        return [c for c in columns if c in df.columns]
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType) and f.name != ROW_ID
    ]


def label_mapping(df: DataFrame, col: str) -> dict[str, int]:
    """Sorted-lexicographic code map (sklearn LabelEncoder parity)."""
    vals = [
        r[0]
        for r in df.select(
            F.coalesce(F.col(col).cast("string"), F.lit(MISSING_TOKEN)).alias("v")
        )
        .distinct()
        .collect()
    ]
    return {v: i for i, v in enumerate(sorted(vals))}


def encode_label(
    df: DataFrame,
    columns: list[str] | None = None,
    max_literal_categories: int = 10_000,
) -> tuple[DataFrame, dict]:
    """E1. Returns (encoded df, {col: {value: code}}) for inverse_transform
    (reference keeps encoders, :242-264).

    Dictionary-sized domains become a literal ``create_map`` (no join, no
    shuffle). Above ``max_literal_categories`` a literal map would explode
    the plan/driver (think user-id columns at 100 TB), so the mapping is
    computed distributedly (dense_rank over sorted distincts — same sorted
    code assignment) and applied via broadcast join; the returned mapping
    dict is then empty for that column (too large to hold on the driver).
    """
    cols = _categorical_cols(df, columns)
    mappings: dict[str, dict[str, int]] = {}
    out = df
    for c in cols:
        val = F.coalesce(F.col(c).cast("string"), F.lit(MISSING_TOKEN))
        n_distinct = df.select(val.alias("v")).distinct().limit(
            max_literal_categories + 1
        ).count()
        if n_distinct <= max_literal_categories:
            m = label_mapping(df, c)
            mappings[c] = m
            mapping_expr = F.create_map(
                *[x for kv in m.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
            )
            out = out.withColumn(c, mapping_expr[val])
        else:
            codes = (
                df.select(val.alias("__v"))
                .distinct()
                .select(
                    "__v",
                    (F.dense_rank().over(Window.orderBy("__v")) - 1).alias("__code"),
                )
            )
            mappings[c] = {}
            out = (
                out.withColumn("__v", val)
                .join(codes, "__v", "left")
                .withColumn(c, F.col("__code"))
                .drop("__v", "__code")
            )
    return out, mappings


def decode_label(df: DataFrame, mappings: dict[str, dict[str, int]]) -> DataFrame:
    out = df
    for c, m in mappings.items():
        inv = F.create_map(*[x for k, v in m.items() for x in (F.lit(v), F.lit(k))])
        out = out.withColumn(c, inv[F.col(c)])
    return out


def encode_onehot(
    df: DataFrame,
    columns: list[str] | None = None,
    drop_first: bool = False,
    max_categories: int = 50,
) -> DataFrame:
    """E2, get_dummies parity: sorted category order, ``_nan`` indicator,
    original column dropped; columns with >max_categories skipped."""
    cols = _categorical_cols(df, columns)
    out = df
    for c in cols:
        cats = sorted(
            r[0]
            for r in df.select(F.col(c).cast("string")).where(F.col(c).isNotNull()).distinct().collect()
        )
        if len(cats) > max_categories:
            continue
        keep = cats[1:] if drop_first else cats
        dummies = [
            F.when(F.col(c).cast("string") == v, 1).otherwise(0).alias(f"{c}_{v}")
            for v in keep
        ] + [F.col(c).isNull().cast("int").alias(f"{c}_nan")]
        out = out.select(*[F.col(x) for x in out.columns if x != c], *dummies)
    return out


def encode_frequency(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """E3: ``value_counts(normalize=True, dropna=False)`` → new column
    ``{col}_freq_encoded``; original kept; unmapped→0 can't occur in a
    same-table fit/transform.

    ONE scan computes total row count AND every column's value counts
    (melt → single groupBy), instead of the naive count() + one groupBy per
    column (×N scans of the big table). The tiny per-column frequency
    tables are broadcast-joined back.
    """
    cols = _categorical_cols(df, columns)
    if not cols:
        return df
    pairs = []
    for c in cols:
        pairs += [F.lit(c), F.col(c).cast("string")]
    counts = (
        df.select(F.explode(F.create_map(*pairs)).alias("col", "val"))
        .groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()
    )
    n_total = counts.where(F.col("col") == cols[0]).agg(F.sum("n")).collect()[0][0]
    out = df
    for c in cols:
        key = f"__key_{c}"
        freqs = F.broadcast(
            counts.where(F.col("col") == c).select(
                F.col("val").alias(key),
                (F.col("n") / F.lit(float(n_total))).alias(f"{c}_freq_encoded"),
            )
        )
        out = out.join(
            freqs, on=F.col(c).cast("string").eqNullSafe(F.col(key)), how="left"
        ).drop(key)
    return out
