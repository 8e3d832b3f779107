"""Text-analysis functions for LLM training-data pipelines (extension
surface beyond the reference, SURVEY §7.7): token counting, language ID,
quality scoring, document fingerprinting.

Mostly pure Column expressions — JVM-side, whole-stage codegen — so they
run at 100 TB as a single scan-and-project with pushdown intact. The two
array-building ops (word_ngrams; compression_ratio's zlib) are
Arrow-batched pandas UDFs: Spark higher-order functions are interpreted
per element and measured ~4-7x slower than the Arrow batch on real
documents (see word_ngrams / dedup.word_shingles docstrings).
"""

from __future__ import annotations

import re as _re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# Deterministic and self-contained; not a real LID model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "de", "y", "es", "un", "una", "en", "por"],
}

# A BPE-ish word/number/punctuation splitter for token counting.
TOKEN_RE = r"\w+|[^\w\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokens (empty-string safe)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def regex_token_count(col: Column) -> Column:
    """BPE-ish token count: words + standalone punctuation."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), F.lit(0)))


_WS_ASCII = _re.compile(r"\s+", _re.ASCII)  # Java \s parity (not Unicode)
_LANG_ORDER = list(STOPWORDS)
# token -> indexes of languages that list it (a word can be a stopword in
# several languages, e.g. 'la' in fr+es)
_STOPWORD_LANGS: dict[str, list[int]] = {}
for _j, _l in enumerate(_LANG_ORDER):
    for _w in STOPWORDS[_l]:
        _STOPWORD_LANGS.setdefault(_w, []).append(_j)


_STOPWORD_UDF: list = []  # lazy singleton (pandas_udf needs a session)


def _stopword_hits_vec(col: Column) -> Column:
    """Per-row stopword hit counts for ALL languages in _LANG_ORDER, one
    tokenization pass (dict lookup per token). The UDF object is created
    once and cached so every element_at reference shares ONE PythonUDF
    expression and Spark evaluates it once per row. NULL text -> NULL
    (callers mask it, as they masked the old filter form's -1)."""
    if not _STOPWORD_UDF:
        @F.pandas_udf("array<int>")
        def vec(s: pd.Series) -> pd.Series:
            def h(t):
                if t is None:
                    return None
                counts = [0] * len(_LANG_ORDER)
                for tok in _WS_ASCII.split(t.lower().strip(" ")):
                    js = _STOPWORD_LANGS.get(tok)
                    if js:
                        for j in js:
                            counts[j] += 1
                return counts
            return s.map(h)
        _STOPWORD_UDF.append(vec)
    return _STOPWORD_UDF[0](col)


def stopword_hits(col: Column, lang: str, hits: Column | None = None) -> Column:
    """Number of tokens that are stopwords of ``lang`` (with multiplicity).

    element_at over the shared all-languages Arrow UDF, not ``F.filter``
    + isin over the token array: HOF filters are interpreted per token,
    and language_id references these counts ~16x per row (measured 3.5 s
    for 50k docs; one Arrow pass ~0.8 s — a lookaround regexp_count
    variant measured in between at 5 s). Tokenization in the UDF
    replicates the expression form exactly: lower, space-only trim,
    Java-ASCII whitespace split (differential test pins parity).

    ``hits`` — an already-materialized all-languages count array (e.g.
    the ``swc`` field of :func:`doc_metrics_struct`) — skips the UDF so
    fused callers pay ONE Python pass for every metric."""
    vec = hits if hits is not None else _stopword_hits_vec(col)
    return F.element_at(vec, _LANG_ORDER.index(lang) + 1)


def language_id(col: Column, hits: Column | None = None) -> Column:
    """Language guess: Han-script ratio first (space-delimited stopword
    votes cannot see CJK), then stopword vote with deterministic
    tie-break (first language in STOPWORDS order wins ties); 'unknown'
    when nothing fires. Both detectors are plain codegen'd expressions —
    the DuckDB oracle recomputes them verbatim (\\p{Han} is shared by
    Java regex and RE2)."""
    n_chars = F.length(col)
    han = F.regexp_count(col, F.lit(r"\p{IsHan}"))
    expr = F.when(
        (n_chars > 0) & (han.cast("double") / n_chars > 0.3), F.lit("zh")
    )
    scores = {lang: stopword_hits(col, lang, hits=hits) for lang in STOPWORDS}
    for lang in STOPWORDS:  # priority order = tie-break order (first wins)
        cond = scores[lang] > 0
        for other in STOPWORDS:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def quality_score(col: Column, hits: Column | None = None) -> Column:
    """Deterministic [0,1] quality heuristic: length band + alpha ratio +
    English-stopword presence (the classic Gopher/C4-style signals,
    simplified). ``hits`` as in :func:`stopword_hits`."""
    n_tok = token_count(col).cast("double")
    n_chars = F.length(col).cast("double")
    avg_word = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, stopword_hits(col, "en", hits=hits).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    word_ok = F.when((avg_word >= 3) & (avg_word <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
    stop_ok = F.least(F.lit(0.3), stop_ratio * 3)
    return F.round(len_ok + word_ok + stop_ok, 6)


def normalize_for_fingerprint(col: Column) -> Column:
    """Canonical form used by fingerprint(): lowercase, collapse
    whitespace, strip."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint (md5 of normalized text)."""
    return F.md5(normalize_for_fingerprint(col))


def rolling_fingerprint(col: Column, modulus: int = 1_000_000_007) -> Column:
    """Order-sensitive polynomial rolling hash over whitespace tokens
    (Karp-Rabin style): h = (h*31 + 7*len(tok) + ascii(tok[0])) mod M.
    Pure fold expression — JVM-side, and reproducible in ANSI SQL
    (list_reduce) for the oracle. Intermediate stays < 31*M + small, so
    no 64-bit overflow under ANSI mode."""
    toks = tokens(normalize_for_fingerprint(col))
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: (h * 31 + F.length(t) * 7 + F.ascii(F.substring(t, 1, 1)))
        % F.lit(modulus),
    )


def word_ngrams(col: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (unlike dedup's word_shingles,
    which dedups for set-Jaccard) — repetition signals need the counts.
    [] when the document has fewer than n words or is NULL.

    Arrow-batched UDF for the same reason as dedup.word_shingles: the
    transform/slice/concat_ws HOF is interpreted per gram (repetition
    metrics measured 3.7 s for 50k docs on it). Tokenization replicates
    the expression form exactly: space-only trim + Java-ASCII whitespace
    split keeping empty tokens."""
    import re as _re

    _ws = _re.compile(r"\s+", _re.ASCII)

    @F.pandas_udf("array<string>")
    def ngrams(s: pd.Series) -> pd.Series:
        def g(t):
            if t is None:
                return []
            toks = _ws.split(t.strip(" "))
            if len(toks) < n:
                return []
            return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        return s.map(g)

    return ngrams(col)


def repetition_metrics(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
):
    """Gopher-style repetition signals per document (Rae et al. 2021,
    appendix A1.1 'repetitious text' filters — public paper):

    - ``rep_top_frac``: fraction of all word n-grams taken by the single
      most frequent one (high → boilerplate/spam);
    - ``rep_dup_frac``: fraction of n-gram occurrences whose gram occurs
      more than once (high → templated/looping text).

    Returns (id, n_ngrams, rep_top_frac, rep_dup_frac); documents with
    fewer than ``n`` words get 0.0 fractions.

    Scale: explode → two map-side-combined aggregations keyed by
    (doc, gram) then (doc) — shuffle rows bounded by distinct grams per
    doc, never a cross-doc term dictionary.
    """
    from ..partitioning import ensure_parallelism

    grams = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.explode_outer(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    counts = grams.groupBy("id", "g").agg(F.count(F.col("g")).alias("cnt"))
    per_doc = counts.groupBy("id").agg(
        F.sum("cnt").alias("__total"),
        F.max("cnt").alias("__top"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("__dup"),
    )
    total = F.col("__total")
    return per_doc.select(
        "id",
        F.coalesce(total, F.lit(0)).cast("bigint").alias("n_ngrams"),
        F.when(total > 0, F.col("__top") / total).otherwise(0.0).alias("rep_top_frac"),
        F.when(total > 0, F.col("__dup") / total).otherwise(0.0).alias("rep_dup_frac"),
    )


_DOC_METRICS_UDF: dict = {}  # keyed by (ngram n, rfp modulus); lazy — pandas_udf needs a session

_DOC_METRICS_TYPE = (
    "struct<swc:array<int>,rfp:bigint,n_ngrams:bigint,"
    "rep_top_frac:double,rep_dup_frac:double,tc:map<string,bigint>>"
)


def doc_metrics_struct(col: Column, n: int = 2, modulus: int = 1_000_000_007) -> Column:
    """ONE Arrow pass computing every per-document text signal that
    needs Python: the all-languages stopword-hit vector (``swc``, feeds
    :func:`language_id` / :func:`quality_score` via their ``hits``
    param), the rolling fingerprint (``rfp``, bit-identical to
    :func:`rolling_fingerprint`'s JVM fold), the Gopher repetition
    fractions over word ``n``-grams (identical math to
    :func:`repetition_metrics`, but per-doc in a Counter — no explode,
    no two shuffles, no restore join), and the per-doc token-count map
    (``tc``, whitespace tokens WITH multiplicity — the sufficient
    statistic for :func:`unigram_logprob_from_counts`).

    Rationale (VERDICT r6 task 4): the unfused q_txt_metrics ran the
    corpus through two separate Python passes (stopwords, n-grams) plus
    two corpus-sized token explodes for the LM, and the JVM fold for
    rfp is CodegenFallback — dragging the whole metric projection out
    of whole-stage codegen. Fusing tokenizes each document ONCE and
    returns plain fixed-width columns + one small map.

    Tokenization parity is pinned by differential tests
    (tests/test_text_fused.py): space-only trim then Java-ASCII ``\\s+``
    split keeping empty tokens (= the ``F.split(F.trim(col))``
    expression form); ``swc`` lowers the text first; ``rfp`` uses the
    lowered tokens with empties dropped (= split of the
    whitespace-collapsed ``normalize_for_fingerprint`` form). NULL text
    → NULL swc/rfp/tc, zero n-grams, 0.0 fractions (matching
    ``explode_outer``'s treatment in the unfused forms)."""
    key = (n, modulus)
    if key not in _DOC_METRICS_UDF:

        @F.pandas_udf(_DOC_METRICS_TYPE)
        def fused(s: pd.Series) -> pd.DataFrame:
            from collections import Counter

            n_langs = len(_LANG_ORDER)
            out = {k: [] for k in
                   ("swc", "rfp", "n_ngrams", "rep_top_frac", "rep_dup_frac", "tc")}
            for t in s:
                if t is None:
                    out["swc"].append(None)
                    out["rfp"].append(None)
                    out["n_ngrams"].append(0)
                    out["rep_top_frac"].append(0.0)
                    out["rep_dup_frac"].append(0.0)
                    out["tc"].append(None)
                    continue
                raw = _WS_ASCII.split(t.strip(" "))
                low = _WS_ASCII.split(t.lower().strip(" "))
                # stopword hits (lowered tokens, multiplicity)
                counts = [0] * n_langs
                for tok in low:
                    js = _STOPWORD_LANGS.get(tok)
                    if js:
                        for j in js:
                            counts[j] += 1
                out["swc"].append(counts)
                # rolling fingerprint: lowered, whitespace-collapsed form
                # == lowered tokens minus empty tokens (an all-empty doc
                # folds the single "" token to the same 0)
                h = 0
                for tok in low:
                    if tok:
                        h = (h * 31 + 7 * len(tok) + ord(tok[0])) % modulus
                out["rfp"].append(h)
                # word-n-gram repetition (raw tokens, empties kept —
                # word_ngrams parity)
                if len(raw) < n:
                    out["n_ngrams"].append(0)
                    out["rep_top_frac"].append(0.0)
                    out["rep_dup_frac"].append(0.0)
                else:
                    grams = Counter(
                        " ".join(raw[i:i + n]) for i in range(len(raw) - n + 1)
                    )
                    total = len(raw) - n + 1
                    top = max(grams.values())
                    dup = sum(c for c in grams.values() if c > 1)
                    out["n_ngrams"].append(total)
                    out["rep_top_frac"].append(top / total)
                    out["rep_dup_frac"].append(dup / total)
                # token-count map: the F.split(F.trim(col)) form maps a
                # blank doc to array() (no tokens), not [""]
                out["tc"].append(dict(Counter(raw)) if t.strip(" ") != "" else {})
            return pd.DataFrame(out)

        _DOC_METRICS_UDF[key] = fused
    return _DOC_METRICS_UDF[key](col)


def unigram_logprob_from_counts(
    entries,
    id_col: str = "id",
    w_col: str = "w",
    cnt_col: str = "cnt",
    min_count: int = 1,
    max_vocab: int = 5_000_000,
    alpha: float = 1.0,
):
    """:func:`unigram_logprob` over pre-aggregated per-document token
    counts — ``entries`` has one row per (document, DISTINCT token) with
    multiplicity ``cnt`` (e.g. ``explode_outer`` of
    :func:`doc_metrics_struct`'s ``tc`` map; a NULL ``w`` row marks an
    empty document). Identical model and smoothing; the mean
    log-probability is computed as sum(cnt·lp)/sum(cnt), which equals
    the per-instance mean up to double re-association (both sides of
    the oracle already sum in different orders).

    Scale: the corpus token INSTANCES never materialize — the explode
    is bounded by distinct tokens per document, typically 2-5x smaller
    than instance count on natural text and far smaller on templated
    text. Same vocab-bounded shuffle + broadcast-gated join as the
    instance form."""
    import math

    w, cnt = F.col(w_col), F.col(cnt_col)
    # vocab feeds BOTH the stats collect below and the scoring join's
    # broadcast build: un-checkpointed, the explode + groupBy(w) vocab
    # aggregate executes twice per invocation. The checkpoint is
    # vocab-sized (distinct tokens, min_count-filtered), distributed,
    # and recomputed per call — no cross-run reuse.
    vocab = (
        entries.where(w.isNotNull())
        .groupBy(w_col)
        .agg(F.sum(cnt_col).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    ).localCheckpoint(eager=False)  # materialized by the stats collect (r14)
    stats = vocab.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    n_total, v_size = int(stats["n"]), int(stats["v"])
    denom = n_total + alpha * (v_size + 1)
    unseen = math.log(alpha / denom) if denom > 0 else 0.0

    scored_vocab = vocab.select(
        w_col, F.log((F.col("cnt") + alpha) / F.lit(denom)).alias("lp")
    )
    v = F.broadcast(scored_vocab) if v_size <= max_vocab else scored_vocab
    tok_cnt = F.when(w.isNotNull(), cnt)
    return (
        entries.join(v, w_col, "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum(tok_cnt), F.lit(0)).cast("bigint").alias("n_tokens"),
            (
                F.sum(tok_cnt * F.coalesce(F.col("lp"), F.lit(unseen)))
                / F.sum(tok_cnt)
            ).alias("avg_logprob"),
        )
        .withColumnRenamed(id_col, "id")
    )


def compression_ratio(col: Column, level: int = 6) -> Column:
    """Per-document zlib compression ratio (compressed bytes / raw
    bytes) — the classic redundancy signal for LLM data curation
    (CCNet/Gopher-adjacent quality heuristics, public work): repetitive
    or templated text compresses far below ~0.4, while natural prose
    sits around 0.5-0.7 and random/encrypted content near 1.0.

    Arrow-batched ``pandas_udf`` — zlib lives Python-side only, so this
    is one of the few deliberate Python stages in the engine (same class
    as the isolation-forest scorer). NULL/empty text → NULL ratio.
    """

    @F.pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(v):
            if v is None:
                return None
            raw = v.encode("utf-8", errors="replace")
            if not raw:
                return None
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(one)

    return _ratio(col)


def unigram_logprob(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    max_vocab: int = 5_000_000,
    alpha: float = 1.0,
):
    """CCNet-style unigram language-model score: per document, the mean
    log-probability of its whitespace tokens under a unigram LM fitted
    on the corpus itself (Wenzek et al. 2020 filter by LM perplexity;
    the unigram model is the join-friendly degenerate case — no
    KenLM-style n-gram state, so it distributes as one count aggregate
    plus one lookup join).

    Returns (id, n_tokens, avg_logprob): Laplace-``alpha`` smoothed,
    natural log; out-of-vocabulary tokens (below ``min_count``) score
    the smoothed-unseen probability ``log(alpha / (N + alpha*(V+1)))``.
    Documents with zero tokens get NULL avg_logprob. Lower (more
    negative) = less like the corpus — the filtering signal.

    Scale: token explode → ONE map-side-combined count aggregate
    (shuffle bounded by the distinct vocabulary, not corpus tokens);
    vocabulary joined back to the exploded tokens — broadcast when its
    (already-computed) size fits ``max_vocab``, AQE-planned shuffle
    join otherwise; one final per-document aggregate. The corpus text
    itself never shuffles.
    """
    import math

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.when(F.trim(F.col(text_col)) == "", F.array())
            .otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("w"),
    )
    vocab = (
        toks.where(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    stats = vocab.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    n_total, v_size = int(stats["n"]), int(stats["v"])
    denom = n_total + alpha * (v_size + 1)
    unseen = math.log(alpha / denom) if denom > 0 else 0.0

    scored_vocab = vocab.select(
        "w", F.log((F.col("cnt") + alpha) / F.lit(denom)).alias("lp")
    )
    # v_size from the stats aggregate above IS the exact vocabulary
    # count — no extra pass needed for the broadcast gate
    v = F.broadcast(scored_vocab) if v_size <= max_vocab else scored_vocab
    return (
        toks.join(v, "w", "left")
        .groupBy("id")
        .agg(
            F.count(F.col("w")).cast("bigint").alias("n_tokens"),
            F.avg(
                F.when(F.col("w").isNotNull(),
                       F.coalesce(F.col("lp"), F.lit(unseen)))
            ).alias("avg_logprob"),
        )
    )
