"""PII redaction for training-data curation (extension, SURVEY §7.7
class — the scrub-before-train pass every large text pipeline runs).

Unlike ``operators/text_cleaning`` (which DELETES emails/urls while
normalizing), redaction REPLACES each entity with a typed placeholder
(``<EMAIL>``, ``<PHONE>``, …) so downstream tokenization keeps sentence
structure and redaction counts stay auditable.

Scale: a pure ``regexp_replace`` chain — whole-stage codegen, zero
shuffles, zero Python. Patterns are the standard public detectors
(emails, URLs, IPv4, international-ish phone numbers, US SSNs, 13-19
digit card numbers); precision-first variants (word-ish boundaries) so
prose survives. ``redaction_counts`` reports per-entity hit totals in
one aggregate pass for pipeline accounting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: cards before phones (a 16-digit card is also 10+ digits),
# and IP before PHONE — the phone regex matches the first two octets of a
# dotted-quad with 3-digit octets ('192.168.1.100' -> '<PHONE>.1.100')
# while the IP pattern requires all four dot-separated octets so it cannot
# misfire on dotted phones like 555.867.5309. Emails before generic hosts
# inside URLs is irrelevant because URL placeholders keep no host text.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("URL", r"http[s]?://[^\s<>\"]+"),
    # lookarounds stop a >19-digit run from partially redacting its tail
    # (plain \b would match the run's last 13-19 digits); like PHONE this
    # makes CARD Java-regex-only (RE2/DuckDB lacks lookarounds)
    ("CARD", r"(?<![\d-])(?:\d[ -]?){12,18}\d(?![\d-])"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("IP", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("PHONE", r"(?<![\d-])(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}(?:[ .-]\d{2,4})?(?![\d-])"),
]

_KINDS = [k for k, _ in PII_PATTERNS]


def redact_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace each detected entity with ``<KIND>``. ``kinds`` restricts
    (and orders by the canonical PII_PATTERNS priority regardless of the
    order given)."""
    want = set(kinds if kinds is not None else _KINDS)
    unknown = want - set(_KINDS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = col
    for kind, pat in PII_PATTERNS:
        if kind in want:
            out = F.regexp_replace(out, pat, f"<{kind}>")
    return out


def redaction_counts(
    df: DataFrame, text_col: str = "text", kinds: list[str] | None = None
) -> dict[str, int]:
    """Total occurrences per entity kind across the corpus, ONE aggregate
    pass (regexp_count per kind, map-side combined)."""
    want = [k for k in _KINDS if kinds is None or k in set(kinds)]
    pats = dict(PII_PATTERNS)
    row = df.agg(
        *[
            F.sum(
                F.coalesce(F.regexp_count(F.col(text_col), F.lit(pats[k])), F.lit(0))
            ).alias(k)
            for k in want
        ]
    ).collect()[0]
    return {k: int(row[k] or 0) for k in want}
