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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _span_array(text_col: str, span_words: int):
    """Column expression: the document's consecutive ``span_words``-word
    chunks (last chunk may be shorter) — the ONE definition of span
    chunking shared by extraction, dedup and the audit view, so their
    keys can never drift."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    k = F.lit(span_words)
    return F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / k).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * k + 1, span_words)),
    )


def explode_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 20,
) -> DataFrame:
    """(id, span_idx, span) — consecutive ``span_words``-word chunks of
    each document (last chunk may be shorter). NULL text yields no rows.
    Pure codegen extraction — no Python anywhere; the only possible
    exchange is the GATED single-row-group rebalance
    (``ensure_parallelism``), a no-op on any input already at cluster
    parallelism (pinned by the no-shuffle pytest on such inputs)."""
    from ..partitioning import ensure_parallelism

    return ensure_parallelism(df.where(F.col(text_col).isNotNull())).select(
        F.col(id_col),
        F.posexplode(_span_array(text_col, span_words)).alias("span_idx", "span"),
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

    Shape (r6, was window + groupBy + restore-join = 3 exchanges with a
    per-span sort): TWO hash aggregates, both with map-side partial
    combine, nothing else.

    1. keep-first = ``groupBy(span-key).agg(min(struct(id, span_idx)))``
       — an aggregate, not a window: duplicate spans collapse map-side
       BEFORE the shuffle (a window must move every occurrence), the span
       text travels once as the grouping key, and no sort is needed.
    2. rebuild = ``groupBy(id)`` over the winners. The round-5 version
       needed a third exchange (left join against the input id set) to
       restore fully-deduplicated documents; instead every document now
       emits one SENTINEL row (span_idx = −1, key disjoint from every
       real span by construction) that always survives keep-first, so the
       rebuild aggregate sees every document and emits its ``(id, '', 0)``
       row directly.
    """
    # Sentinel prepended as span_idx −1: posexplode gives 0-based
    # positions over [sentinel, span_0, span_1, ...], shifted back by 1.
    # The grouping key is (is_sentinel, text) — a STRUCT, so sentinel keys
    # (true, id) can never collide with real span text.
    #
    # The keep-first winner is picked by min() over (id, span_idx) PACKED
    # into one decimal(33,0) = id·10¹⁰ + (span_idx+1): a min over a
    # fixed-width mutable buffer stays in whole-stage-codegen
    # HashAggregate — min(struct(id, span_idx)) has an immutable buffer
    # and silently degrades the whole stage to Sort + SortAggregate
    # (measured 8.0 s vs 4.4 s at sf1). Packing is order-preserving for
    # the FULL bigint id range (decimal headroom, no 2^k bound) and any
    # span count below 10¹⁰ − 1 per document.
    from ..partitioning import ensure_parallelism

    base = ensure_parallelism(df.where(F.col(text_col).isNotNull())).select(
        F.col(id_col),
        F.posexplode(
            F.concat(F.array(F.lit(None).cast("string")),
                     _span_array(text_col, span_words))
        ).alias("_pos", "span"),
    )
    gk = F.struct(
        F.col("span").isNull().alias("s"),
        F.coalesce(F.col("span"), F.col(id_col).cast("string")).alias("k"),
    ).alias("_gk")
    id_base = dict(df.dtypes)[id_col].split("(")[0]
    if id_base in ("tinyint", "smallint", "int", "bigint"):
        TEN10 = F.lit(10_000_000_000).cast("decimal(11,0)")
        sp = base.select(
            gk,
            (F.col(id_col).cast("decimal(20,0)") * TEN10
             + F.col("_pos").cast("decimal(20,0)")).alias("_packed"),
        )
        kept = sp.groupBy("_gk").agg(F.min("_packed").alias("_p"))
        rem = F.pmod(F.col("_p"), TEN10)
        winners = kept.select(
            "_gk",
            ((F.col("_p") - rem) / TEN10).cast(id_base).alias(id_col),
            (rem.cast("long") - 1).alias("span_idx"),
        )
    else:
        # Non-integral id (string/binary/decimal): min over
        # struct(id, span_idx) — correct for any orderable id type, but
        # the immutable struct buffer demotes the stage to SortAggregate;
        # the packed path above is the fast route for integral ids.
        sp = base.select(gk, F.col(id_col), (F.col("_pos") - 1).alias("_si"))
        winners = (
            sp.groupBy("_gk")
            .agg(F.min(F.struct(F.col(id_col), F.col("_si"))).alias("w"))
            .select(
                "_gk",
                F.col(f"w.{id_col}").alias(id_col),
                F.col("w._si").alias("span_idx"),
            )
        )
    rebuilt = winners.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("_gk.s"),
                            F.struct(F.col("span_idx"),
                                     F.col("_gk.k").alias("span")),
                        )
                    )
                ),
                lambda s: s["span"],
            ),
            " ",
        ).alias(text_col),
        F.sum(F.when(~F.col("_gk.s"), 1).otherwise(0)).cast("long").alias("n_spans_kept"),
    )
    return rebuilt.select(id_col, text_col, "n_spans_kept")


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
