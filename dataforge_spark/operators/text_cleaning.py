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

import pandas as pd
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


# Ops implemented as a JVM regexp_replace pass (each rescans the string).
_REGEX_OPS = {
    "remove_whitespace", "remove_extra_spaces", "remove_numbers",
    "remove_special_chars", "remove_html", "remove_urls", "remove_emails",
}
# Route to the Arrow kernel when the chain would otherwise pay this many
# full-string JVM regex rescans (VERDICT r5 task 2: the x_text_suite chain
# was 5.4x pandas at sf1 because ~10 chained regexp_replace passes each
# rescan + reallocate the whole string; one Arrow transfer applying the
# whole compiled chain per row costs ~1 scan + the serialization).
_KERNEL_MIN_REGEX_OPS = 2


def _compile_chain(operations: list[str]):
    """The op chain as compiled Python callables — SAME sequential
    semantics as ``_apply_op`` (patterns compiled with re.ASCII so \\s/\\d
    match Java's ASCII-only classes; the built-in patterns are the
    dialect-neutral subset, see module docstring)."""
    import re

    a = re.ASCII
    ws = re.compile(r"\s+", a)
    steps = []
    for op in operations:
        if op == "lowercase":
            steps.append(str.lower)
        elif op == "uppercase":
            steps.append(str.upper)
        elif op in ("remove_whitespace", "remove_extra_spaces"):
            # collapse first, then strip spaces — mirrors
            # trim(regexp_replace(c, '\s+', ' ')) exactly (F.trim strips
            # 0x20 only, sufficient after the collapse).
            steps.append(lambda x, _ws=ws: _ws.sub(" ", x).strip(" "))
        elif op == "remove_punctuation":
            tbl = str.maketrans("", "", string.punctuation)
            steps.append(lambda x, _t=tbl: x.translate(_t))
        elif op == "remove_numbers":
            p = re.compile(r"\d+", a)
            steps.append(lambda x, _p=p: _p.sub("", x))
        elif op == "remove_special_chars":
            p = re.compile(r"[^a-zA-Z0-9\s]", a)
            steps.append(lambda x, _p=p: _p.sub("", x))
        elif op == "remove_html":
            p = re.compile(r"<[^>]+>", a)
            steps.append(lambda x, _p=p: _p.sub("", x))
        elif op == "remove_urls":
            p = re.compile(_URL_RE, a)
            steps.append(lambda x, _p=p: _p.sub("", x))
        elif op == "remove_emails":
            p = re.compile(_EMAIL_RE, a)
            steps.append(lambda x, _p=p: _p.sub("", x))
        else:  # pragma: no cover - guarded by clean_text_columns
            raise ValueError(f"unknown text op {op!r}")
    return steps


def clean_text_kernel(col: Column, operations: list[str]) -> Column:
    """The full X-pipeline as ONE Arrow-batched pass: every op applied
    per row by compiled Python regexes inside a pandas UDF, so the string
    crosses the JVM↔Python boundary once instead of being rescanned and
    reallocated by each chained ``regexp_replace``. Semantics are
    identical to ``clean_text_expr`` for the built-in ops (pinned by the
    kernel-vs-expr property test); user ``custom_patterns`` are documented
    as Java regex and therefore never routed here."""
    steps = _compile_chain(operations)

    @F.pandas_udf("string")
    def kernel(s: pd.Series) -> pd.Series:
        out = []
        for x in s:
            if x is None or x is pd.NA or (isinstance(x, float)):
                out.append(None)
                continue
            if x == "nan":  # reference :68-69 pre-pass
                x = ""
            for step in steps:
                x = step(x)
            out.append(x if x != "" else None)  # reference :145, X12
        return pd.Series(out, dtype=object)

    return kernel(col.cast("string"))


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
    n_regex = sum(op in _REGEX_OPS for op in operations)
    use_kernel = n_regex >= _KERNEL_MIN_REGEX_OPS and not custom_patterns

    def clean(c: str) -> Column:
        if use_kernel:
            return clean_text_kernel(qcol(c), operations).alias(c)
        return clean_text_expr(qcol(c), operations, custom_patterns).alias(c)

    return df.select(
        *[clean(c) if c in columns else qcol(c) for c in df.columns]
    )
