"""Typo fixing Y1–Y3 (SURVEY §2.9).

Reference: ``TypoFix.fix_typos``
(/root/reference/methods/spellingFix.py:52-268). Three methods:

* Y1 ``common_typos``: builtin 26-entry typo→fix dict (:22-50) ∪ custom
  dict, case-insensitive whole-word replace. The reference loops per cell
  in Python; here it is a chain of ``regexp_replace`` — fully vectorized,
  codegen'd, no Python in the hot path.
* Y2 ``fuzzy_match``: pairwise difflib ratio over UNIQUE values, unify to
  the more frequent spelling. Distinct domains are tiny relative to data →
  groupBy-count, collect to driver, reuse difflib for bit-exact ratios,
  broadcast the replacement map. (Scale path for huge domains: MinHashLSH
  over char n-grams — see dataforge_spark.dedup.minhash — approximate.)
* Y3 ``spell_check``: corpus-frequency dictionary + closest-match
  replacement of rare words; word frequencies via explode/groupBy, the
  small vocabulary corrected on the driver, applied as regexp chain.
"""

from __future__ import annotations

import difflib
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import ROW_ID

# Builtin dictionary, verbatim surface of the reference's
# (/root/reference/methods/spellingFix.py:22-50) common-typo concept.
COMMON_TYPOS = {
    "teh": "the", "adn": "and", "nad": "and", "hte": "the", "taht": "that",
    "recieve": "receive", "seperate": "separate", "definately": "definitely",
    "occured": "occurred", "untill": "until", "wich": "which",
    "thier": "their", "freind": "friend", "beleive": "believe",
    "acheive": "achieve", "begining": "beginning", "calender": "calendar",
    "cemetary": "cemetery", "changable": "changeable", "collegue": "colleague",
    "comming": "coming", "commitee": "committee", "completly": "completely",
    "concious": "conscious", "curiousity": "curiosity", "dissapoint": "disappoint",
}


def _text_cols(df: DataFrame, columns: list[str] | None) -> list[str]:
    if columns is not None:
        return [c for c in columns if c in df.columns]
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType) and f.name != ROW_ID
    ]


def replace_words_expr(col: Column, mapping: dict[str, str]) -> Column:
    """Case-insensitive whole-word replacement chain."""
    c = col
    for typo, fix in mapping.items():
        c = F.regexp_replace(c, f"(?i)\\b{re.escape(typo)}\\b", fix)
    return c


def _fuzzy_map(values_with_counts: list[tuple[str, int]], threshold: float) -> dict[str, str]:
    """Pairwise difflib over unique values; less frequent → more frequent
    (reference :145-199, incl. the 30% length-difference prefilter :172)."""
    mapping: dict[str, str] = {}
    vals = [(v, n) for v, n in values_with_counts if v]
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            a, na = vals[i]
            b, nb = vals[j]
            if min(len(a), len(b)) == 0:
                continue
            if abs(len(a) - len(b)) / max(len(a), len(b)) > 0.3:
                continue
            if difflib.SequenceMatcher(None, a.lower(), b.lower()).ratio() >= threshold:
                src, dst = (a, b) if na < nb else (b, a)
                mapping[src] = dst
    return mapping


def fix_typos(
    df: DataFrame,
    columns: list[str] | None = None,
    method: str = "common_typos",
    similarity_threshold: float = 0.8,
    custom_dict: dict[str, str] | None = None,
) -> DataFrame:
    cols = _text_cols(df, columns)
    out = df

    if method == "common_typos":
        mapping = {**COMMON_TYPOS, **(custom_dict or {})}
        for c in cols:
            out = out.withColumn(c, replace_words_expr(F.col(c), mapping))
        return out

    if method == "fuzzy_match":
        for c in cols:
            counts = [
                (r["v"], r["n"])
                for r in df.groupBy(F.col(c).alias("v"))
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("v").isNotNull())
                .collect()
            ]
            mapping = _fuzzy_map(counts, similarity_threshold)
            if not mapping:
                continue
            map_expr = F.create_map(
                *[x for kv in mapping.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
            )
            out = out.withColumn(c, F.coalesce(map_expr[F.col(c)], F.col(c)))
        return out

    if method == "spell_check":
        for c in cols:
            words = (
                df.select(F.explode(F.split(F.lower(F.col(c)), r"\W+")).alias("w"))
                .where(F.length("w") > 0)
                .groupBy("w")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            rows = words.collect()
            freq = {r["w"]: r["n"] for r in rows}
            dictionary = [w for w, n in freq.items() if n > 1]
            if not dictionary:
                dictionary = [w for w, _ in sorted(freq.items(), key=lambda x: -x[1])[:50]]
            corrections: dict[str, str] = {}
            for w, n in freq.items():
                if len(w) <= 2 or w in dictionary:
                    continue
                best = difflib.get_close_matches(w, dictionary, n=1, cutoff=similarity_threshold)
                if best and abs(len(best[0]) - len(w)) <= 2:
                    corrections[w] = best[0]
            if corrections:
                out = out.withColumn(c, replace_words_expr(F.col(c), corrections))
        return out

    raise ValueError(f"unknown typo method {method!r}")
