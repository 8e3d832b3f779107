"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (F.zip_with / F.aggregate), JVM-side, no UDFs. These are the
building blocks for similarity search and embedding near-dup detection."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


# ---------------------------------------------------------------------------
# Arrow-batched scoring — the HOT-PATH variants. The pure-Column versions
# above are the readable reference implementation (and stay exact for
# oracles), but higher-order-function expressions are interpreted, NOT
# whole-stage-codegen'd: per-element lambda dispatch on every pair. For
# similarity scoring over millions of pairs the measured fix (same pattern
# as similarity/lsh.py's bucket matmul) is one numpy matmul per Arrow
# batch.
# ---------------------------------------------------------------------------


def batch_cosine_udf():
    """Pairwise cosine(a, b) as an Arrow-batched pandas UDF: one
    vectorized row-wise dot + norm per batch (float64). Zero-norm inputs
    score 0.0, matching ``cosine`` above."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        X = np.array(a.tolist(), dtype=np.float64)
        Y = np.array(b.tolist(), dtype=np.float64)
        num = np.einsum("nd,nd->n", X, Y)
        den = np.linalg.norm(X, axis=1) * np.linalg.norm(Y, axis=1)
        return pd.Series(np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0))

    return cos
