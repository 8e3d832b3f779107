"""Crawl-text repair and blocklist matching — the encoding-damage and
bad-content gates between HTML extraction and the quality filters.

No counterpart in the reference (its text_cleaning is
lowercase/punctuation-class ops, ported in ``operators/
text_cleaning.py``); part of the LLM-pipeline extension tier.

- ``contains_any`` / ``matches_any_word``: ONE compiled regexp
  alternation over the whole phrase list — pure Catalyst ``rlike``
  codegen, so a 500-phrase blocklist costs one scan of each string
  instead of 500 ``contains`` passes (the C4 paper's dirty-word list
  is ~400 entries). Phrases are regex-escaped: they are literals, not
  patterns.
- ``normalize_unicode``: NFC/NFKC/NFD/NFKD via ``unicodedata`` in one
  Arrow ``pandas_udf`` (Spark has no built-in normalizer); NFKC is the
  standard pre-tokenization cleanup (fullwidth forms, ligatures,
  compatibility dots).
- ``fix_mojibake``: repairs the classic UTF-8-read-as-CP1252 double
  encoding ("cafÃ©" → "café", "donâ€™t" → "don’t") — the most common
  encoding damage in web crawls. A candidate repair is accepted only
  when the reversal is valid UTF-8 AND strictly reduces the artifact
  count, so already-correct text (including real accented-alphabet
  languages, whose reversal is never valid UTF-8) passes through
  byte-identical. Arrow ``pandas_udf``, deterministic.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

_NORM_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

# CP1252's printable remappings of the 0x80-0x9F block (the browser
# default mis-decode is CP1252, not plain Latin-1) — built from the
# codec itself so the table cannot drift. The five undefined CP1252
# bytes (0x81 8D 8F 90 9D) decode to themselves under errors-replace
# behavior in the wild; Python raises, so they are simply absent.
_CP1252_REVERSE = {}
for _b in range(0x80, 0xA0):
    try:
        _CP1252_REVERSE[bytes([_b]).decode("cp1252")] = _b
    except UnicodeDecodeError:
        pass

# Artifact chars: what bytes 0x80-0xFF look like after a CP1252/Latin-1
# mis-decode — U+0080-U+00FF plus the CP1252 remap targets (euro sign,
# curly quotes, dagger, trademark, ...). The repair rule is RELATIVE
# (accept only when this count strictly drops), so legitimate accented
# text — whose reversal is not valid UTF-8 and therefore never repairs
# — is untouched even though its accented letters count here.
_MOJIBAKE_ARTIFACT_RE = re.compile(
    "[\u0080-\u00ff" + re.escape("".join(_CP1252_REVERSE)) + "]"
)


def _phrase_regex(phrases: list[str], word_boundary: bool) -> str:
    if not phrases:
        raise ValueError("phrase list is empty")
    # longest first so alternation never stops at a shorter prefix
    alts = "|".join(
        re.escape(p) for p in sorted(phrases, key=len, reverse=True)
    )
    return rf"(?i)\b(?:{alts})\b" if word_boundary else rf"(?i)(?:{alts})"


def contains_any(col: str | Column, phrases: list[str]) -> Column:
    """True when the string contains ANY listed phrase
    (case-insensitive substring; phrases are literals). One compiled
    alternation → one ``rlike`` codegen scan regardless of list size."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(_phrase_regex(phrases, word_boundary=False))


def matches_any_word(col: str | Column, phrases: list[str]) -> Column:
    """Like :func:`contains_any` but word-boundary anchored — the form
    a dirty-word blocklist needs ("ass" must not flag "associate")."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(_phrase_regex(phrases, word_boundary=True))


def strip_matching_lines(col: str | Column, phrases: list[str]) -> Column:
    """Remove every line containing any blocklisted phrase
    (case-insensitive literals; the consumer of
    ``corpus.common_lines``'s output). split → filter with ONE
    compiled alternation → array_join: pure codegen, like the C4 line
    rules. Null → null."""
    c = F.col(col) if isinstance(col, str) else col
    pat = _phrase_regex(phrases, word_boundary=False)
    return F.array_join(
        F.filter(F.split(c, r"\n"), lambda l: ~l.rlike(pat)), "\n"
    )


def normalize_unicode(col: str | Column, form: str = "NFKC") -> Column:
    """Unicode-normalize the string column (null → null)."""
    if form not in _NORM_FORMS:
        raise ValueError(f"form must be one of {_NORM_FORMS}, got {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm(s):
        return s.map(
            lambda t: unicodedata.normalize(form, t) if t is not None else None
        )

    return norm(F.col(col) if isinstance(col, str) else col)


def _demojibake_once(text: str) -> str | None:
    """One reversal pass: re-encode through CP1252/Latin-1 and decode
    as UTF-8. None when the text is not a valid candidate."""
    try:
        raw = bytes(
            _CP1252_REVERSE[ch] if ch in _CP1252_REVERSE else ord(ch)
            for ch in text
        )
    except ValueError:  # a codepoint above U+00FF outside the remap set
        return None
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return None


def fix_mojibake_str(text: str, max_passes: int = 2) -> str:
    """Driver-side twin of the column repair (used by the tests and
    usable on small strings): accept a reversal only when it strictly
    reduces artifact characters."""
    for _ in range(max_passes):
        before = len(_MOJIBAKE_ARTIFACT_RE.findall(text))
        if before == 0:
            return text
        fixed = _demojibake_once(text)
        if fixed is None:
            return text
        after = len(_MOJIBAKE_ARTIFACT_RE.findall(fixed))
        if after >= before:
            return text
        text = fixed
    return text


def fix_mojibake(col: str | Column, max_passes: int = 2) -> Column:
    """Repair UTF-8-as-CP1252 double encoding (null → null).
    ``max_passes=2`` also catches doubly-damaged text (mangled twice);
    correct text comes back byte-identical."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def fix(s):
        return s.map(
            lambda t: fix_mojibake_str(t, max_passes) if t is not None else None
        )

    return fix(F.col(col) if isinstance(col, str) else col)
