"""DSIR — Data Selection via Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023) — pick raw-corpus documents that look like a target
corpus, by importance weights over hashed n-gram features (extension;
no reference analogue — the reference is a CSV-cleaning pipeline).

The published recipe: featurize each document as a bag of hashed
unigrams + bigrams (10k buckets), fit two smoothed bag-of-words models
— one on the target corpus, one on the raw corpus — and weight each raw
document by the log-likelihood ratio of its features; then sample k
documents WITHOUT replacement with probability ∝ the importance weight,
via the Gumbel top-k trick.

Spark mapping, engineered for exactness and scale:
- **features**: words + bigrams and their ``xxhash64`` buckets are pure
  Catalyst expressions (``split``/``zip_with``/``xxhash64``/``pmod``) —
  no Python in the hot path, and the same bucket ids are reproducible
  anywhere xxhash64 exists.
- **fit**: two aggregation jobs (target, raw). ``explode`` + map-side
  partial count collapse each task to ≤ ``n_buckets`` rows, so the
  shuffle carries O(tasks × buckets), never O(corpus grams). The
  Laplace-smoothed per-bucket log-ratio is computed driver-side from
  the two tiny count tables and **quantized to 1e-6 fixed-point int64**
  ("micro-nats"): document scores become INTEGER sums — associative,
  order-free, bit-identical under any partitioning, engine, or
  float-summation order. (A float fold would tie the result to
  summation order; integer micro-nats cost < 1e-5 relative distortion
  at typical |logw| and buy exact reproducibility.)
- **weights**: explode the gram buckets, broadcast-join the ≤ n_buckets
  log-ratio table, ``groupBy(id).sum`` — partial aggregation keeps the
  shuffle at O(documents), and the join is a broadcast by construction.
- **select**: Gumbel top-k without replacement. The per-document Gumbel
  noise is DETERMINISTIC — ``u`` comes from ``xxhash64(seed, id)``
  mapped into (0,1), ``g = −ln(−ln u)`` — so selection is a pure
  function of (corpus content, seed), reproducible under retries; the
  noise is also quantized to micro-nats so the ranking key stays
  integer. Top-k itself is a global sort-limit (TakeOrdered at scale —
  k rows to the driver, never the corpus).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
MICRO = 1_000_000  # fixed-point scale: 1 micro-nat


def _words(col: Column) -> Column:
    """Lowercased whitespace tokens; '' → empty array (split would give
    [''])."""
    t = F.trim(F.lower(col))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def gram_buckets(
    col: Column, n_buckets: int = 10_000, seed: int = 0
) -> Column:
    """``array<int>`` of hashed-feature bucket ids: unigrams then
    bigrams, each ``pmod(xxhash64(seed ␟ gram), n_buckets)``. Pure
    Catalyst; NULL text → empty array."""
    w = _words(F.coalesce(col, F.lit("")))
    n = F.size(w)
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(w, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.xxhash64(F.concat(F.lit(str(seed)), F.lit(_SEP), g)),
            F.lit(n_buckets),
        ).cast("int"),
    )


@dataclass(frozen=True)
class DsirModel:
    """Fitted importance model: per-bucket log-probability-ratio
    (target over raw) in micro-nats, plus the fit parameters needed to
    featurize consistently at scoring time."""

    n_buckets: int
    seed: int
    alpha: float
    ratio_micro: np.ndarray  # int64, shape (n_buckets,)
    n_target_grams: int
    n_raw_grams: int


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, seed: int
) -> np.ndarray:
    rows = (
        df.select(
            F.explode(gram_buckets(F.col(text_col), n_buckets, seed))
            .alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    out = np.zeros(n_buckets, dtype=np.int64)
    for r in rows:
        out[r["b"]] = r["count"]
    return out


def fit_dsir(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    seed: int = 0,
    alpha: float = 1.0,
) -> DsirModel:
    """Fit the hashed-n-gram importance model. Two count jobs; the
    log-ratio table is driver-side numpy over two ≤ ``n_buckets``-long
    integer arrays. ``alpha`` is the Laplace smoothing count (1.0 keeps
    every log input an exact integer — deterministic libm calls)."""
    ct = _bucket_counts(target, text_col, n_buckets, seed)
    cr = _bucket_counts(raw, text_col, n_buckets, seed)
    nt, nr = int(ct.sum()), int(cr.sum())
    if nt == 0 or nr == 0:
        raise ValueError(
            f"fit_dsir: empty gram counts (target={nt}, raw={nr})"
        )
    # scalar math.log, not np.log: numpy's SIMD log can differ from libm
    # by an ulp, and the quantized table must be reproducible across any
    # process that recomputes it (10k scalar logs — driver-trivial)
    zt = math.log(nt + alpha * n_buckets)
    zr = math.log(nr + alpha * n_buckets)
    ratio_micro = np.fromiter(
        (
            math.floor(
                (math.log(ct[b] + alpha) - zt
                 - math.log(cr[b] + alpha) + zr) * MICRO
            )
            for b in range(n_buckets)
        ),
        dtype=np.int64,
        count=n_buckets,
    )
    return DsirModel(
        n_buckets=n_buckets,
        seed=seed,
        alpha=alpha,
        ratio_micro=ratio_micro,
        n_target_grams=nt,
        n_raw_grams=nr,
    )


def _ratio_table(spark, model: DsirModel) -> DataFrame:
    nz = np.flatnonzero(model.ratio_micro)
    # ship only nonzero buckets; absent buckets coalesce to 0 at scoring
    return spark.createDataFrame(
        [(int(b), int(model.ratio_micro[b])) for b in nz],
        "b int, lr long",
    )


# Above this many buckets the literal-array lookup ships too much with
# every task (8 B/bucket rides in the serialized expression tree) and
# scoring falls back to the explode → broadcast-join → re-aggregate
# plan. 2^17 buckets = 1 MiB — comparable to a small broadcast table.
_MAX_LITERAL_BUCKETS = 1 << 17


def _array_literal(spark, values: np.ndarray) -> Column:
    """ONE ``array<bigint>`` Literal built on the JVM from a ``long[]``.

    ``F.lit(list)`` instead expands to ``array(lit, lit, ...)`` — a
    CreateArray with one child per element, re-evaluated on every
    ``element_at`` call inside an interpreted higher-order function
    (measured 5.5 s vs 0.6 s for the 10k-bucket scoring pass at sf0.1).
    A true Literal is materialized once per task.

    The values cross py4j as ONE byte[] (big-endian int64) decoded by a
    LongBuffer bulk get — a per-element ``jarr[i] = v`` loop is 10k
    py4j round-trips ≈ 2.5 s of driver time per call."""
    from pyspark.sql.column import Column as _C

    gw = spark.sparkContext._gateway
    jvm = spark._jvm
    arr64 = np.ascontiguousarray(values, dtype=">i8")
    jarr = gw.new_array(jvm.long, int(arr64.shape[0]))
    jvm.java.nio.ByteBuffer.wrap(
        bytearray(arr64.tobytes())
    ).asLongBuffer().get(jarr)
    return _C(jvm.org.apache.spark.sql.functions.lit(jarr))


def dsir_weights(
    df: DataFrame,
    model: DsirModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dsir_logw_micro",
) -> DataFrame:
    """(id, log-importance-weight in micro-nats) for every document —
    integer-exact (see module docstring). Documents with no grams score
    0.

    Scoring is a PURE PROJECTION (r13 optimization): the quantized
    ratio table rides as one ``array<bigint>`` literal and the per-doc
    sum is ``aggregate(transform(buckets, element_at))`` — no explode
    (which multiplied rows by grams/doc), no join, no aggregation
    exchange; zero shuffles, and the scan's column pruning survives.
    The integer sum is associative, so the value is bit-identical to
    the former explode → broadcast-join → groupBy(id) plan (kept as
    the fallback for models too wide to ship as a literal). ``id_col``
    is assumed unique per document (the DSIR contract); the fallback
    path would merge duplicate ids where the projection keeps one row
    per input row."""
    if model.n_buckets <= _MAX_LITERAL_BUCKETS:
        from ..partitioning import ensure_parallelism

        arr = _array_literal(df.sparkSession, model.ratio_micro)
        w = F.aggregate(
            gram_buckets(F.col(text_col), model.n_buckets, model.seed),
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(arr, b + F.lit(1)),
        )
        # the gram hashing is CPU-bound; a single-row-group input would
        # otherwise run it on one core (same rationale as
        # minhash_signatures)
        base = ensure_parallelism(df.select(id_col, text_col))
        return base.select(F.col(id_col), w.alias(out_col))
    spark = df.sparkSession
    table = _ratio_table(spark, model)
    g = df.select(
        F.col(id_col),
        F.explode_outer(
            gram_buckets(F.col(text_col), model.n_buckets, model.seed)
        ).alias("b"),
    )
    return (
        g.join(F.broadcast(table), "b", "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("lr"), F.lit(0)).cast("long").alias(out_col)
        )
    )


def gumbel_micro(id_col: str, seed: int = 0) -> Column:
    """Deterministic per-row Gumbel(0,1) noise in micro-nats:
    ``u = (pmod(xxhash64('gumbel' ␟ seed ␟ id), 2^53) + 0.5) / 2^53``
    (strictly inside (0,1)), ``g = −ln(−ln u)``, floored to int64
    micro-nats. A pure function of (seed, id) — resampling is
    reproducible under retries and across engines."""
    h = F.pmod(
        F.xxhash64(
            F.concat_ws(
                _SEP, F.lit("gumbel"), F.lit(str(seed)),
                F.col(id_col).cast("string"),
            )
        ),
        F.lit(2 ** 53),
    )
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2 ** 53))
    g = -F.log(-F.log(u))
    return F.floor(g * MICRO).cast("long")


def dsir_select(
    df: DataFrame,
    model: DsirModel,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    temperature: float = 1.0,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Gumbel top-k importance resampling: k documents sampled without
    replacement with P(doc) ∝ exp(logw / temperature), deterministically
    (seeded noise). Returns (id, dsir_logw_micro, key_micro, rank) with
    rank 1..k by descending key, ties broken by id. ``temperature=1``
    is the paper's resampling; higher flattens toward uniform. The
    selection is a global sort-limit — only k rows ever leave the
    executors.

    ``weights`` (r14, guide §1.2 don't compute things twice): a caller
    that already holds the ``dsir_weights(df, model)`` frame — e.g. one
    that reports weights AND a selection from them — passes it here so
    the gram-hash scoring pass over the corpus runs once, not once per
    consumer. Must be exactly ``dsir_weights(df, model, text_col,
    id_col)`` for the same inputs; selection output is identical either
    way (the frame is the same relation)."""
    w = weights if weights is not None else dsir_weights(
        df, model, text_col, id_col
    )
    key = (
        F.floor(F.col("dsir_logw_micro") / F.lit(float(temperature)))
        .cast("long")
        + gumbel_micro(id_col, seed)
    )
    top = (
        w.withColumn("key_micro", key)
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    rk = Window.orderBy(F.desc("key_micro"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(rk).cast("int"))
