"""C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", §2.2 —
public paper) as PURE Catalyst expressions: the line-level companion
to the doc-level Gopher rules in :mod:`.gopher`.

No counterpart in the reference (single-process pandas cleaner); part
of the LLM-pipeline extension tier.

The rules, per the paper:

- keep only lines ending in a terminal punctuation mark (. ! ? ");
- drop lines with fewer than ``min_line_words`` (paper: 5) words;
- drop any line containing the word "javascript" (cookie/JS warnings);
- drop the whole page if it has fewer than ``min_sentences`` (paper: 3)
  sentences after line cleaning;
- drop the whole page if it contains "lorem ipsum" or a curly brace
  (``{`` — code), or any phrase from a caller-supplied blocklist
  (the paper's "List of Dirty, Naughty …" list is not shipped here;
  pass your own).

(The paper's other steps live elsewhere in this engine: 3-sentence
span dedup = ``dedup.spans``, language ID = ``text_analysis
.language_id``.)

Scale design: line filtering is ``split`` → higher-order ``filter`` →
``array_join`` — whole-stage codegen, zero Python, zero shuffles (both
plan-asserted in ``tests/test_c4.py``). At 100 TB this fuses into the
scan projection like every other row-local gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# terminal punctuation per C4: period, exclamation, question, end quote
_TERMINAL_RE = r'[.!?"”]\s*$'


def _kept_lines(col: Column, min_line_words: int) -> Column:
    """Array of lines surviving the three line-level rules."""
    return F.filter(
        F.split(col, r"\n"),
        lambda l: l.rlike(_TERMINAL_RE)
        & (F.size(F.filter(F.split(F.trim(l), r"\s+"),
                           lambda w: F.length(w) > 0))
           >= min_line_words)
        & ~F.lower(l).contains("javascript"),
    )


def c4_clean_text(col: Column, min_line_words: int = 5) -> Column:
    """The page's text after line-level cleaning (lines rejoined with
    ``\\n``; null in → null out)."""
    return F.array_join(_kept_lines(col, min_line_words), "\n")


def c4_page_struct(
    col: Column,
    min_line_words: int = 5,
    min_sentences: int = 3,
    blocklist: list[str] | None = None,
) -> Column:
    """Line-cleaned text + page-level verdict as one struct:
    ``(text, n_lines_in, n_lines_kept, n_sentences, keep)``.
    ``blocklist`` phrases are matched case-insensitively as substrings
    (the paper's dirty-word list matches on word boundaries; wrap your
    phrases accordingly if that is what you need)."""
    lines_in = F.filter(F.split(col, r"\n"),
                        lambda l: F.length(F.trim(l)) > 0)
    kept = _kept_lines(col, min_line_words)
    cleaned = F.array_join(kept, "\n")
    # sentences ≈ terminal-punctuation runs in the CLEANED text
    n_sent = F.regexp_count(cleaned, F.lit(r'[.!?]["”]?(\s|$)'))
    # page-level block check runs on the RAW page text (paper §2.2):
    # a code line containing "{" rarely ends in terminal punctuation, so
    # checking the line-cleaned text would miss exactly the pages the
    # rule exists to drop
    low = F.lower(col)
    blocked = low.contains("lorem ipsum") | low.contains("{")
    if blocklist:
        # one compiled alternation — a 400-phrase dirty-word list costs
        # one scan, not 400 contains passes
        from .textfix import contains_any

        blocked = blocked | contains_any(col, list(blocklist))
    keep = (n_sent >= min_sentences) & ~blocked
    struct = F.struct(
        cleaned.alias("text"),
        F.size(lines_in).alias("n_lines_in"),
        F.size(kept).alias("n_lines_kept"),
        n_sent.cast("int").alias("n_sentences"),
        keep.alias("keep"),
    )
    return F.when(col.isNotNull(), struct)


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Apply the full C4 page cleaning: REWRITES ``text_col`` to the
    line-cleaned text and keeps only pages passing the page-level
    rules (null text is dropped).

    The keep-filter and the text rewrite both need the line-cleaned
    text, and PushPredicateThroughNonJoin substitutes a projected
    expression into any filter above it — a plain ``withColumn`` +
    ``where`` evaluates the whole line-cleaning machinery twice per
    surviving page. Routing a slim ``(text, blocked)`` struct through
    a one-element ``explode`` pins it to a Generate node: filters on
    generator output cannot be pushed below the Generate, so the
    line cleaning runs exactly once per page (still zero Python,
    zero shuffles; the sentence count is a cheap ``regexp_count``
    over the already-cleaned text)."""
    col = F.col(text_col)
    low = F.lower(col)
    blocked = low.contains("lorem ipsum") | low.contains("{")
    if blocklist:
        from .textfix import contains_any

        blocked = blocked | contains_any(col, list(blocklist))
    slim = F.when(
        col.isNotNull(),
        F.struct(
            c4_clean_text(col, min_line_words).alias("text"),
            blocked.alias("blocked"),
        ),
    )
    n_sent = F.regexp_count(F.col("_c4")["text"], F.lit(r'[.!?]["”]?(\s|$)'))
    keep = (n_sent >= min_sentences) & ~F.col("_c4")["blocked"]
    return (
        df.select("*", F.explode(F.array(slim)).alias("_c4"))
        .where(F.coalesce(keep, F.lit(False)))
        .withColumn(text_col, F.col("_c4")["text"])
        .drop("_c4")
    )
