"""Span-level exact deduplication (extension, SURVEY §7.7) — the
C4 / RefinedWeb-style "remove globally repeated text spans" pass.

C4 (Raffel et al. 2020) removes all but one occurrence of any
three-sentence span across the corpus; RefinedWeb / Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") do exact
substring dedup with suffix arrays. A suffix array over 100 TB is its
own distributed build (and its removal granularity — arbitrary 50-token
substrings — is not SQL-oracle-checkable), so this operator implements
the span-granular variant both papers reduce to in practice: tokenize,
group into consecutive ``span_words``-word spans, keep the FIRST global
occurrence of each distinct span, and rebuild every document from its
surviving spans.

Semantics (all deterministic):
- "first occurrence" = smallest ``(id, span_idx)`` lexicographically —
  intra-document repeats beyond the first are removed too (as in C4);
- rebuilt text joins surviving spans (in original order) with single
  spaces, i.e. whitespace is normalized — the tokenizer's contract;
- documents whose every span was seen earlier survive as rows with
  empty text and ``n_spans_kept = 0`` (callers drop or keep them).

Scale: span extraction is pure whole-stage codegen (``split`` +
``transform``/``slice`` over a ``sequence`` — no per-word explode, no
Python). The keep-first decision is ONE shuffle, by ``md5(span)`` (the
same digest-window shape as ``dedup_exact`` — at 100 TB hot spans are
AQE skew-split), and the rebuild is one shuffle back by document id.
Span text travels through each exchange exactly once — there is no
all-pairs comparison anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 20,
) -> DataFrame:
    """(id, span_idx, span) — consecutive ``span_words``-word chunks of
    each document (last chunk may be shorter). NULL text yields no rows.
    Codegen-only: no shuffle, no Python."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    k = F.lit(span_words)
    spans = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / k).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * k + 1, span_words)),
    )
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.posexplode(spans).alias("span_idx", "span")
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 20,
) -> DataFrame:
    """Remove every repeated occurrence of any ``span_words``-word span
    across the corpus, keeping the first ``(id, span_idx)``; returns one
    row per input document: ``(id, text, n_spans_kept)`` with the text
    rebuilt from its surviving spans (single-space joined).
    """
    sp = explode_spans(df, text_col, id_col, span_words)
    # Keep-first over the 128-bit digest: the window shuffles
    # (id, span_idx, span) hashed by digest — ~36 bytes of key per row on
    # the exchange, and the span body rides along exactly once because
    # the rebuild below needs it anyway.
    w = Window.partitionBy(F.md5(F.col("span"))).orderBy(id_col, "span_idx")
    kept = sp.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_idx", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias(text_col),
        F.count(F.lit(1)).cast("long").alias("n_spans_kept"),
    )
    # Fully-deduplicated documents drop out of the groupBy; restore them
    # as empty rows so the output is total over the input id set.
    ids = df.where(F.col(text_col).isNotNull()).select(id_col)
    return (
        ids.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_spans_kept"), F.lit(0)).alias("n_spans_kept"),
        )
    )


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 20,
    min_occurrences: int = 2,
) -> DataFrame:
    """Audit view: (span, n_occurrences, n_docs, keeper_id) for every
    span repeated at least ``min_occurrences`` times — one digest-keyed
    aggregation, the diagnostic a curation run reports before committing
    to removal."""
    sp = explode_spans(df, text_col, id_col, span_words)
    return (
        sp.groupBy("span")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).cast("long").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
        .where(F.col("n_occurrences") >= min_occurrences)
    )
