"""One-call corpus profile for LLM training data — the `documents`-
table sibling of the reference-parity dataset profiler
(``profile.dataset_profile``): what an operator looks at before and
after each curation gate. Composes the engine's existing column
metrics (``functions.text_analysis``) and the exact-dedup digest.

No counterpart in the reference (its profiler is generic tabular);
part of the LLM-pipeline extension tier.

Scale design: TWO jobs total —

1. one aggregate over a single projection computing every per-doc
   metric (token count, utf-8 bytes, quality score, digest) with
   map-side-combined aggregates; distribution stats use the
   ``percentile_approx`` sketch (disclosed: approximate at scale,
   exact on small inputs where the sketch holds all values);
2. one top-N language groupBy (languages are a tiny domain).

Nothing collects per-document rows to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PCTS = [0.25, 0.5, 0.75, 0.95]


def document_profile(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = None,
    top_langs: int = 10,
) -> dict:
    """Corpus-level report: doc/byte/token totals, token-count and
    quality distributions, exact-duplicate rate, language mix.

    ``lang_col=None`` derives language via
    :func:`..functions.text_analysis.language_id` (the n-gram
    heuristic); pass a real column when the corpus has one.
    """
    from .dedup.intercorpus import digest
    from .functions.text_analysis import language_id, quality_score, token_count

    text = F.col(text_col)
    lang = F.col(lang_col) if lang_col else language_id(text)
    proj = df.select(
        text.isNull().cast("int").alias("is_null"),
        F.coalesce(F.octet_length(text), F.lit(0)).alias("bytes"),
        F.coalesce(token_count(text), F.lit(0)).alias("toks"),
        quality_score(text).alias("q"),
        digest(text).alias("d"),
        lang.alias("lang"),
    )

    agg = proj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_null").alias("null_text"),
        F.sum("bytes").alias("total_bytes"),
        F.sum("toks").alias("total_tokens"),
        F.mean("toks").alias("mean_tokens"),
        F.min("toks").alias("min_tokens"),
        F.max("toks").alias("max_tokens"),
        F.percentile_approx("toks", _PCTS, 100_000).alias("tok_pcts"),
        F.mean("q").alias("mean_quality"),
        F.percentile_approx("q", _PCTS, 100_000).alias("q_pcts"),
        F.countDistinct("d").alias("distinct_docs"),
    ).collect()[0]

    langs = (
        proj.where(~F.col("is_null").cast("boolean"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "lang")
        .limit(top_langs)
        .collect()
    )

    n = int(agg["n_docs"])
    n_nonnull = n - int(agg["null_text"] or 0)
    distinct = int(agg["distinct_docs"])
    return {
        "n_docs": n,
        "null_text": int(agg["null_text"] or 0),
        "total_bytes": int(agg["total_bytes"] or 0),
        "total_tokens": int(agg["total_tokens"] or 0),
        "tokens": {
            "mean": (float(agg["mean_tokens"])
                     if agg["mean_tokens"] is not None else None),
            "min": (int(agg["min_tokens"])
                    if agg["min_tokens"] is not None else None),
            "max": (int(agg["max_tokens"])
                    if agg["max_tokens"] is not None else None),
            **dict(zip(("p25", "p50", "p75", "p95"),
                       [int(v) for v in agg["tok_pcts"] or []])),
        },
        "quality": {
            "mean": (float(agg["mean_quality"])
                     if agg["mean_quality"] is not None else None),
            **dict(zip(("p25", "p50", "p75", "p95"),
                       [float(v) for v in agg["q_pcts"] or []])),
        },
        # distinct counts NULL digests as 0 groups... NULL text has a
        # NULL digest, excluded by countDistinct — rate over non-null
        "exact_dup_rate": (
            round(1.0 - distinct / n_nonnull, 6) if n_nonnull else 0.0
        ),
        "languages": [(r["lang"], int(r["n"])) for r in langs],
    }


def common_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    min_docs: int = 10,
    k: int = 100,
    min_chars: int = 10,
) -> DataFrame:
    """Boilerplate miner: the normalized lines appearing in at least
    ``min_docs`` DISTINCT documents, most-shared first (top ``k``) —
    cookie banners, nav footers, subscription prompts. Feed the result
    into a :func:`..functions.textfix.contains_any` blocklist or strip
    the lines outright.

    Scale: explode(lines) → distinct per (doc, line) → one map-side-
    combined count per line. Shuffle rows are bounded by distinct
    (doc, line) pairs; the heavy tail of unique lines dies in the
    ``HAVING``-style filter before the top-k sort. Lines shorter than
    ``min_chars`` are ignored (punctuation rows share by accident).

    ``id_col`` keys the one-vote-per-document dedup; when absent (or
    None) the document's content hash is the key — identical full
    documents then share one vote, which is the right bias for a
    boilerplate count anyway. (NOT ``monotonically_increasing_id``:
    it is nondeterministic, so Spark re-evaluates it per exploded
    line and the per-doc dedup silently stops deduping.)
    """
    doc_key = (
        F.col(id_col)
        if id_col is not None and id_col in df.columns
        else F.xxhash64(F.col(text_col))
    )
    lines = (
        df.select(
            doc_key.alias("__doc"),
            F.explode(F.split(F.col(text_col), r"\n")).alias("raw"),
        )
        .select(
            "__doc",
            F.regexp_replace(F.trim(F.lower(F.col("raw"))), r"\s+", " ").alias(
                "line"
            ),
        )
        .where(F.length("line") >= min_chars)
        .distinct()  # one vote per document
    )
    return (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), "line")
        .limit(k)
    )


def domain_profile(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Per-registrable-domain curation stats — the table behind every
    "top crawl domains" review and domain-blocklist decision: doc
    count, token volume, mean heuristic quality, exact-dup rate WITHIN
    the domain (a boilerplate farm shows up as high ``dup_rate`` here
    long before corpus-wide dedup runs).

    Returns the top-``k`` domains by document count as a DataFrame
    (``domain, n_docs, total_tokens, mean_quality, dup_rate``) — one
    map-side-combined groupBy on the domain key; no driver collect, so
    compose it (write it, join a blocklist against it) at any scale.
    """
    from .dedup.intercorpus import digest
    from .functions.text_analysis import quality_score, token_count
    from .functions.urls import url_domain

    text = F.col(text_col)
    proj = df.select(
        url_domain(url_col).alias("domain"),
        F.coalesce(token_count(text), F.lit(0)).alias("toks"),
        quality_score(text).alias("q"),
        digest(text).alias("d"),
    ).where(F.col("domain").isNotNull())
    return (
        proj.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.round(F.mean("q"), 6).alias("mean_quality"),
            F.round(
                1.0
                - F.count_distinct(F.col("d")) / F.count(F.col("d")),
                6,
            ).alias("dup_rate"),
        )
        .orderBy(F.desc("n_docs"), "domain")
        .limit(k)
    )
