"""Gopher document-quality rules (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", Appendix A
— public paper) as PURE Catalyst expressions: the doc-level quality
half of the Gopher filter suite. The repetition half
(rep_top_frac/rep_dup_frac) lives in
:func:`..functions.text_analysis.repetition_metrics`.

No counterpart in the reference (single-process pandas cleaner); part
of the LLM-pipeline extension tier.

The seven rules, per the paper:

1. 50 ≤ word count ≤ 100,000
2. 3 ≤ mean word length ≤ 10
3. symbol-to-word ratio ≤ 0.1 (``#`` and ellipsis)
4. < 90% of lines start with a bullet point
5. < 30% of lines end with an ellipsis
6. ≥ 80% of words contain at least one alphabetic character
7. at least 2 of the 8 "required" English stop words appear
   (the, be, to, of, and, that, have, with)

Scale design: every rule is built-in higher-order-array / regexp
Catalyst expressions — whole-stage codegen, zero Python eval nodes,
zero shuffles (both plan-asserted in ``tests/test_gopher.py``). At
100 TB this is a single projection fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_RE = r"^[•‣▪●·\-\*⁃]"
_ELLIPSIS_END_RE = r"(\.\.\.|…)[ \t]*$"


def _words(col: Column) -> Column:
    """Whitespace-split words (Gopher's tokenization), empties dropped.
    ``array_remove(_, '')`` is codegen'd where the r12 lambda filter was
    an interpreted HOF; ``split`` only ever yields '' for the dropped
    empties, so the arrays are identical (differential-tested)."""
    return F.array_remove(F.split(F.trim(col), r"\s+"), "")


def gopher_quality_struct(col: Column) -> Column:
    """All seven rule statistics + per-rule booleans + overall ``keep``
    as one struct column (null text → null struct). Thresholds are the
    paper's; the raw statistics are surfaced so callers can retune
    without recomputation."""
    words = _words(col)
    n_w = F.size(words).cast("double")
    # sum of word lengths == count of non-whitespace chars (every
    # non-\s char lands in exactly one word): one codegen'd regex pass
    # where the r12 F.aggregate lambda interpreted per word.
    total_chars = F.length(F.regexp_replace(col, r"\s", "")).cast("double")
    mean_wl = F.when(n_w > 0, total_chars / n_w)

    # '#' and '...' / '…' matches can never overlap, so one alternation
    # scan counts exactly what the two separate scans counted.
    n_sym = F.regexp_count(col, F.lit(r"#|\.\.\.|…")).cast("double")
    sym_ratio = F.when(n_w > 0, n_sym / n_w)

    lines = F.filter(
        F.split(col, r"\n"), lambda l: F.length(F.trim(l)) > 0
    )
    n_l = F.size(lines).cast("double")
    bullet_frac = F.when(
        n_l > 0,
        F.size(
            F.filter(lines, lambda l: F.ltrim(l).rlike(_BULLET_RE))
        ).cast("double") / n_l,
    )
    ellipsis_frac = F.when(
        n_l > 0,
        F.size(
            F.filter(lines, lambda l: l.rlike(_ELLIPSIS_END_RE))
        ).cast("double") / n_l,
    )

    # Words are exactly the maximal \S runs, and \S*[A-Za-z]\S* matches
    # each such run iff it contains a letter (greedy + backtracking
    # consume the whole run), so this one pass counts the same words
    # the per-word interpreted rlike filter counted.
    alpha_frac = F.when(
        n_w > 0,
        F.size(
            F.regexp_extract_all(col, F.lit(r"\S*[A-Za-z]\S*"), 0)
        ).cast("double") / n_w,
    )

    # Presence count: distinct required stopwords appearing with \b
    # boundaries — one alternation pass replaces eight full-text rlike
    # scans; \b semantics are unchanged (a longer word like 'that'
    # never yields a bounded 'the' match).
    low = F.lower(col)
    stop_hits = F.size(
        F.array_distinct(
            F.regexp_extract_all(
                low,
                F.lit(r"\b(" + "|".join(REQUIRED_STOPWORDS) + r")\b"),
                1,
            )
        )
    ).cast("int")

    ok_wc = (n_w >= 50) & (n_w <= 100_000)
    ok_mwl = (mean_wl >= 3) & (mean_wl <= 10)
    ok_sym = F.coalesce(sym_ratio <= 0.1, F.lit(False))
    ok_bullet = F.coalesce(bullet_frac < 0.9, F.lit(True))
    ok_ellipsis = F.coalesce(ellipsis_frac < 0.3, F.lit(True))
    ok_alpha = F.coalesce(alpha_frac >= 0.8, F.lit(False))
    ok_stop = stop_hits >= 2

    keep = (
        ok_wc & ok_mwl & ok_sym & ok_bullet & ok_ellipsis & ok_alpha & ok_stop
    )
    struct = F.struct(
        n_w.cast("bigint").alias("word_count"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.alias("req_stopword_hits"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_bullet.alias("ok_bullet_lines"),
        ok_ellipsis.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        keep.alias("keep"),
    )
    return F.when(col.isNotNull(), struct)


def gopher_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep only documents passing all seven Gopher quality rules
    (null text is dropped — it passes nothing)."""
    col = F.col(text_col)
    return df.where(
        F.coalesce(gopher_quality_struct(col)["keep"], F.lit(False))
    )
