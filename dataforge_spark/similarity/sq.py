"""Scalar-quantization (SQ8) ANN — per-dimension 8-bit codes, the
accuracy/compression point between exact float scan and PQ (extension;
no reference analogue — the reference is a CSV-cleaning pipeline).

Scalar quantization (the FAISS ``IndexScalarQuantizer`` ``QT_8bit``
pattern; Jégou et al. TPAMI 2011 discuss it as the baseline PQ improves
on): store, per dimension, a linear [vmin_d, vmax_d] range fitted over
the corpus and encode each component as one byte
``round((x - vmin) / (vmax - vmin) * 255)``. A 64-dim float32 embedding
(256 B) becomes 64 B — 4× (8× vs float64), with far lower distortion
than PQ's 8-byte codes: SQ8 keeps one byte PER DIMENSION, PQ one byte
per 8-dim subspace. At 100 TB of embeddings the scan reads ~25 TB of
codes, and the candidate pool it produces is near-exact, so small
``refine`` factors already cover the true top-k.

Spark mapping (same shapes as ``pq.py``, deliberately):
- **fit**: per-dimension min/max over the UNIT-NORMALIZED corpus in ONE
  Catalyst aggregate — ``posexplode`` + ``groupBy(pos)`` with map-side
  partial min/max, so the shuffle carries O(tasks × dim) rows, never
  O(rows × dim). min/max are order-insensitive: the fit is exactly
  reproducible under any partitioning (no sampling, unlike k-means).
- **encode**: one Arrow ``mapInPandas`` pass, codes emitted as
  ``binary(dim)``; NULL/ragged/zero vectors → NULL code (excluded from
  search, mirroring the PQ/IVF NULL rule). Done once per corpus and
  persisted (``write_sq_index``), like the PQ codes.
- **search**: broadcast the queries + dequantization params; ONE
  ``mapInPandas`` pass over the CODES dequantizes each batch
  (``vmin + code * span/255``, a numpy broadcast) and scores all queries
  with one BLAS matmul — the float vectors never travel. Batch-local
  top candidates → global window → exact re-rank of only the
  ``refine × k`` pool via ``pq._exact_rerank`` (shared tail: the output
  carries EXACT cosines; quantization only picks the candidates).

Determinism: fit is aggregate-exact, encode is pure per-row arithmetic,
so the whole index is a function of corpus CONTENT alone — stronger than
PQ's stable-sample determinism. Approximate candidate ordering still has
no SQL oracle; the registry leg is held to the exact brute-force answer
through the re-rank (empirical pool coverage, like PQ refine=24), and
recall/determinism are pinned by pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import to_matrix
from .pq import _exact_rerank


def fit_sq(df: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """Per-dimension [vmin, vmax] over the unit-normalized corpus as an
    ``(2, dim)`` float64 array. One aggregation job; map-side combine
    keeps the shuffle at O(tasks × dim). Zero-norm / NULL vectors are
    skipped (they encode to NULL and never enter search)."""
    v = F.col(vec_col)
    nrm = F.sqrt(F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    normed = df.where(v.isNotNull()).select(
        F.transform(v, lambda x: x.cast("double") / nrm).alias("_nv")
    ).where(F.col("_nv").isNotNull())
    stats = (
        normed.select(F.posexplode("_nv").alias("pos", "val"))
        .where(~F.isnan("val"))  # zero-norm rows divide to NaN — drop
        .groupBy("pos")
        .agg(F.min("val").alias("vmin"), F.max("val").alias("vmax"))
        .collect()
    )
    if not stats:
        raise ValueError("fit_sq: no non-empty vectors in corpus")
    dim = max(r["pos"] for r in stats) + 1
    out = np.zeros((2, dim), dtype=np.float64)
    for r in stats:
        out[0, r["pos"]] = r["vmin"]
        out[1, r["pos"]] = r["vmax"]
    return out


def _spans(params: np.ndarray) -> np.ndarray:
    """Per-dim quantization step; constant dims get span 1 so they code
    to 0 and reconstruct exactly to vmin."""
    span = params[1] - params[0]
    return np.where(span > 0, span, 1.0)


def sq_encode(
    df: DataFrame,
    params: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, _sq_code binary(dim)) — each vector unit-normalized, then
    every component linearly coded into [0, 255] against the fitted
    per-dim range (values outside the range — possible only when
    encoding data the fit never saw — clip to the edge codes, the
    standard SQ rule). One Arrow pass."""
    dim = params.shape[1]
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((params[0], _spans(params)))
    id_type = df.schema[id_col].dataType.simpleString()

    def encode(it):
        vmin, span = bc.value
        scale = 255.0 / span
        for pdf in it:
            if pdf.empty:
                continue
            X, bad = to_matrix(pdf[vec_col].tolist(), dim)
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = np.divide(X, norms, out=np.zeros_like(X), where=norms > 0)
            codes = np.clip(
                np.rint((Xn - vmin[None, :]) * scale[None, :]), 0, 255
            ).astype(np.uint8)
            invalid = (norms[:, 0] == 0)
            if bad is not None:
                invalid |= np.asarray(bad, dtype=bool)
            yield pd.DataFrame({
                "__id": pdf[id_col].to_numpy(),
                "_sq_code": [
                    None if invalid[i] else codes[i].tobytes()
                    for i in range(len(Xn))
                ],
            })

    out = df.select(id_col, vec_col).mapInPandas(
        encode, f"__id {id_type}, _sq_code binary"
    )
    return out.select(F.col("__id").alias(id_col), "_sq_code")


def write_sq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    params: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the SQ index at rest: the one-byte-per-dim codes as
    parquet plus the per-dim [vmin, vmax] params as a tiny sidecar —
    codes must always be dequantized with the params they were encoded
    under, and reading both from one dir guarantees the pairing (same
    contract as ``write_pq_index``)."""
    spark = corpus.sparkSession
    if params is None:
        params = fit_sq(corpus, vec_col)
    codes = sq_encode(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cvec")),
        params, "_cvec", "neighbor_id",
    )
    codes.write.mode("overwrite").parquet(f"{path}/codes")
    spark.createDataFrame(
        [(d, float(params[0, d]), float(params[1, d]))
         for d in range(params.shape[1])],
        "pos int, vmin double, vmax double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
    return params


def read_sq_params(spark, path: str) -> np.ndarray:
    rows = spark.read.parquet(f"{path}/params").orderBy("pos").collect()
    out = np.zeros((2, len(rows)), dtype=np.float64)
    for r in rows:
        out[0, r["pos"]] = r["vmin"]
        out[1, r["pos"]] = r["vmax"]
    return out


def _sq_candidates(
    codes: DataFrame,
    q_rows: list,
    params: np.ndarray,
    n_cand: int,
) -> DataFrame:
    """Batch-local approx-cosine top-``n_cand`` per query over
    (neighbor_id, _sq_code) → global window. Only codes travel; each
    batch is dequantized once and scored for ALL queries with one
    matmul."""
    dim = params.shape[1]
    spark = codes.sparkSession
    qids = np.array([r[0] for r in q_rows])
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((qids, Qn, params[0], _spans(params)))
    id_type = codes.schema["neighbor_id"].dataType.simpleString()
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, sq_sim double"

    def score(it):
        qids_, Qn_, vmin, span = bc.value
        step = span / 255.0
        for pdf in it:
            if pdf.empty:
                continue
            ok = pdf["_sq_code"].notna().to_numpy()
            if not ok.any():
                continue
            sel_rows = np.flatnonzero(ok)
            raw = np.frombuffer(
                b"".join(pdf["_sq_code"].iloc[sel_rows]), dtype=np.uint8
            ).reshape(len(sel_rows), dim).astype(np.float64)
            ids = pdf["neighbor_id"].to_numpy()[sel_rows]
            Xh = vmin[None, :] + raw * step[None, :]
            # reconstruction is ≈ unit-norm but not exactly — normalize
            # so the approx score is an honest cosine at refine=0 too
            nh = np.linalg.norm(Xh, axis=1, keepdims=True)
            Xh = np.divide(Xh, nh, out=np.zeros_like(Xh), where=nh > 0)
            S_all = np.round(Xh @ Qn_.T, 6)  # (rows, nq)
            out = []
            for qi in range(len(qids_)):
                S = S_all[:, qi]
                okq = ids != qids_[qi]
                idx = np.flatnonzero(okq)
                if idx.size == 0:
                    continue
                sel = idx[np.lexsort((ids[idx], -S[idx]))[:n_cand]]
                out.append(pd.DataFrame({
                    "query_id": qids_[qi],
                    "neighbor_id": ids[sel],
                    "sq_sim": S[sel],
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = codes.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sq_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_cand)
        .drop("_rn")
    )


def sq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine: int = 4,
    params: np.ndarray | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """SQ8 top-k with exact re-rank: the code scan selects
    ``refine × k`` candidates per query, then the true vectors of only
    those candidates are re-scored with the exact cosine — the same
    (query_id, neighbor_id, cos_sim rounded 6dp) contract as
    ``brute_force.cosine_topk`` and ``pq_cosine_topk``. ``refine=0``
    returns the raw dequantized approximation as ``cos_sim``. Pass
    ``params``/``encoded`` to reuse a persisted index."""
    if params is None:
        params = fit_sq(corpus, vec_col)
    if encoded is None:
        encoded = sq_encode(corpus, params, vec_col, id_col)
    codes = encoded.select(
        F.col(id_col).alias("neighbor_id"), "_sq_code"
    ) if id_col in encoded.columns else encoded
    q_rows = [
        r for r in queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col)
        ).collect() if r[1] is not None
    ]
    spark = corpus.sparkSession
    id_type = corpus.schema[id_col].dataType.simpleString()
    if not q_rows:
        return spark.createDataFrame(
            [], f"query_id {id_type}, neighbor_id {id_type}, cos_sim double"
        )
    n_cand = max(k, refine * k) if refine else k
    cand = _sq_candidates(codes, q_rows, params, n_cand)
    if not refine:
        return cand.select(
            "query_id", "neighbor_id", F.col("sq_sim").alias("cos_sim")
        )
    return _exact_rerank(corpus, cand, q_rows, k, id_col, vec_col)
