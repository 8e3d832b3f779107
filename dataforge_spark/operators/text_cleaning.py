"""Text cleaning X1–X12 (SURVEY §2.6).

Reference: ``clean_text_columns``
(/root/reference/methods/textCleaning.py:18-145). Every op is a vectorized
string expression — pure Catalyst, whole-stage codegen, zero UDFs.

Order of application follows the reference: pre-pass stringify + literal
'nan'→'' (:68-69), then requested ops in the given order, then ''→NULL
(:145).

Note the regex-dialect caveat (SURVEY §7.3): user-supplied
``custom_patterns`` are interpreted as Java regex here vs Python ``re`` in
the reference; the built-in patterns below are dialect-neutral.
"""

from __future__ import annotations

import string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import ROW_ID, qcol

OPS = [
    "lowercase", "uppercase", "remove_whitespace", "remove_punctuation",
    "remove_numbers", "remove_special_chars", "remove_extra_spaces",
    "remove_html", "remove_urls", "remove_emails",
]

_URL_RE = r"http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\(\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+"
_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"


def _apply_op(c: Column, op: str) -> Column:
    if op == "lowercase":
        return F.lower(c)
    if op == "uppercase":
        return F.upper(c)
    if op in ("remove_whitespace", "remove_extra_spaces"):
        # collapse FIRST, then trim: F.trim strips spaces only (0x20),
        # while pandas str.strip() strips all whitespace — collapsing \s+
        # to a single space first makes the trailing trim equivalent
        # (found by the idempotence property test on '\t').
        return F.trim(F.regexp_replace(c, r"\s+", " "))
    if op == "remove_punctuation":
        return F.translate(c, string.punctuation, "")
    if op == "remove_numbers":
        return F.regexp_replace(c, r"\d+", "")
    if op == "remove_special_chars":
        return F.regexp_replace(c, r"[^a-zA-Z0-9\s]", "")
    if op == "remove_html":
        return F.regexp_replace(c, r"<[^>]+>", "")
    if op == "remove_urls":
        return F.regexp_replace(c, _URL_RE, "")
    if op == "remove_emails":
        return F.regexp_replace(c, _EMAIL_RE, "")
    raise ValueError(f"unknown text op {op!r}")


def clean_text_expr(
    col: Column,
    operations: list[str],
    custom_patterns: dict[str, str] | None = None,
) -> Column:
    """The full X-pipeline as ONE column expression (composable in SQL)."""
    c = col.cast("string")
    c = F.when(c == "nan", "").otherwise(c)  # reference :68-69
    for op in operations:
        c = _apply_op(c, op)
    for pattern, repl in (custom_patterns or {}).items():
        c = F.regexp_replace(c, pattern, repl)
    return F.when(c == "", None).otherwise(c)  # reference :145, X12


def clean_text_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    operations: list[str] | None = None,
    custom_patterns: dict[str, str] | None = None,
) -> DataFrame:
    operations = operations or ["lowercase", "remove_extra_spaces"]
    for op in operations:
        if op not in OPS:
            raise ValueError(f"unknown text op {op!r}")
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType) and f.name != ROW_ID
        ]
    return df.select(
        *[
            clean_text_expr(qcol(c), operations, custom_patterns).alias(c)
            if c in columns
            else qcol(c)
            for c in df.columns
        ]
    )
