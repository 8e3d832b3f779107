"""Word n-gram Jaccard near-dup detection (extension, SURVEY §7.7).

Exact Jaccard over word-shingle sets via an inverted-index self-join:
explode distinct shingles, join docs sharing a shingle, count shared
shingles per pair, Jaccard = |A∩B| / (|A| + |B| − |A∩B|).

Scale: the join key is the shingle — a pair of docs is joined once per
SHARED shingle only, so cost is Σ_shingle (docs_per_shingle choose 2),
not n². Hot shingles (boilerplate) are the skew risk: ``max_df`` drops
shingles occurring in more than that many docs (stopword-shingle pruning),
which bounds the blow-up and is standard practice for candidate
generation at corpus scale.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex parity: Spark's split(col, "\\s+") uses Java \s = ASCII
# [ \t\n\x0B\f\r]; Python must NOT use its default Unicode \s here.
_WS_ASCII = re.compile(r"\s+", re.ASCII)


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of ``col`` (array<string>); [] when < n
    words or NULL input.

    Arrow-batched pandas UDF, not the transform/slice/concat_ws
    higher-order-function formulation (kept as ``word_shingles_hof``):
    Spark HOFs are interpreted per element, and on 50k real documents the
    HOF explode measured 21 s vs 3 s for the Arrow batch — the same
    reason minhash_signatures avoids HOF transforms. Semantics replicate
    the HOF exactly (differential test pins it): F.trim strips spaces
    only, Java-ASCII whitespace split keeping leading/trailing empty
    tokens, first-occurrence-order distinct.
    """
    @F.pandas_udf("array<string>")
    def shingles(s: pd.Series) -> pd.Series:
        def sh(t):
            if t is None:
                return []
            toks = _WS_ASCII.split(t.strip(" "))
            if len(toks) < n:
                return []
            return list(dict.fromkeys(
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
            ))
        return s.map(sh)

    return shingles(col)


# Below this many documents the interpreted HOF beats the Arrow UDF
# (Python-worker startup + Arrow transfer dominate at a few thousand
# docs; the UDF wins ~7x from tens of thousands up). r13: the gate is
# now Catalyst's no-job size estimate (~51-56 estimated B/doc on the
# testdata → 1 MiB ≈ UDF_MIN_DOCS docs) instead of a bounded
# limit-count: the count, though bounded, was a whole extra Spark job
# at EVERY shingle site (minhash pays it twice per invocation), and
# the two implementations are differentially tested identical, so the
# only cost of a byte-proxy misclassification near the boundary is a
# small perf delta — while the job saving is paid on every call. An
# unavailable estimate (in-memory lineage) assumes BIG → UDF, the
# scale-safe side.
UDF_MIN_DOCS = 20_000
SHINGLE_UDF_MIN_BYTES = 1 << 20


def shingles_for(df: DataFrame, col: Column, n: int = 3) -> Column:
    """Size-adaptive shingles: the Arrow UDF for frames estimated past
    ``SHINGLE_UDF_MIN_BYTES``, the interpreted HOF below. Zero jobs.
    Both implementations produce identical arrays (differential test),
    so callers may switch freely."""
    from ..partitioning import plan_size_bytes

    est = plan_size_bytes(df)
    small = est is not None and 0 <= est <= SHINGLE_UDF_MIN_BYTES
    return word_shingles_hof(col, n) if small else word_shingles(col, n)


def word_shingles_hof(col: Column, n: int = 3) -> Column:
    """Pure-expression formulation of ``word_shingles`` — interpreted
    (HOFs don't codegen) and ~7x slower on real documents, retained as
    the semantic reference the UDF is differentially tested against.

    Guarded with ``when(size >= n)`` because ``sequence(0, -1)`` in Spark
    auto-descends to [0, -1] (never empty) and ``slice(toks, 0, n)`` then
    throws INVALID_PARAMETER_VALUE.START at execution.
    """
    toks = F.split(F.trim(col), r"\s+")
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with Jaccard ≥ threshold
    (id_a < id_b), jaccard rounded to 6dp."""
    from ..partitioning import ensure_parallelism

    base = ensure_parallelism(df.select(id_col, text_col))
    shingle_col = shingles_for(base, F.col(text_col), n)
    # NOTE: explode directly over the shingle EXPRESSION, never over an
    # intermediate array column — an `explode(attr)` whose attr resolves
    # to the shingle computation lets InferFiltersFromGenerate add a
    # `size(shingles(text)) > 0` predicate that pushdown then evaluates
    # row-at-a-time INTERPRETED inside the scan (measured: +5 s at
    # sf0.1, i.e. the whole interpreted-HOF cost a second time).
    sh = base.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_col).alias("s"),
    )
    # Set sizes come from the FULL (un-pruned) shingle sets: with the
    # denominator fixed, max_df pruning can only shrink the numerator, so
    # the reported Jaccard is a LOWER BOUND of the true score (pruning may
    # hide a true near-dup pair above threshold, never invent one).
    # Computing sizes after the prune inflated scores instead — two docs
    # sharing only rare shingles, with all their boilerplate pruned,
    # scored 1.0 and were falsely dropped.
    #
    # r13: sizes is ``size(shingles)`` — shingles are distinct within a
    # doc, so the array length equals the old count-of-exploded-rows
    # (a doc with zero shingles now gets an n_sh=0 row instead of no
    # row; it can never reach the inner joins below, so the output is
    # unchanged). This deletes the per-doc groupBy aggregate + exchange,
    # and the localCheckpoint stops the join's two size references from
    # re-running the shingle pass over the corpus — (id, int) rows,
    # negligible at any scale, recomputed per invocation.
    sizes = base.select(
        F.col(id_col).alias("id"), F.size(shingle_col).alias("n_sh")
    ).localCheckpoint(eager=False)  # materialized by the final job (r14)
    if max_df is not None:
        # Unhinted anti-join: the hot-shingle set is the head of the
        # corpus' shingle Zipf curve — usually tiny, but it GROWS with the
        # corpus, so the broadcast decision belongs to AQE, not a hint.
        hot = sh.groupBy("s").count().where(F.col("count") > max_df).select("s")
        sh = sh.join(hot, "s", "left_anti")
    # Inverted index WITHOUT a self-join: collect each shingle's posting
    # list (sorted doc ids), emit all in-list pairs with a nested
    # transform, count pair occurrences = |A ∩ B|. One groupBy(s) + one
    # groupBy(pair) instead of a |postings|×|postings| sort-merge join —
    # same asymptotics (Σ per-shingle C(df,2)), far fewer shuffled rows.
    postings = sh.groupBy("s").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    pairs = postings.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice("ids", i + 2, F.size("ids")), lambda y: F.struct(
                            x.alias("id_a"), y.alias("id_b")
                        )
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    common = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("common"))
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")  # AQE picks broadcast when sizes is small
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
