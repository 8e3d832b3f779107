"""Product-quantization ANN (IVF-PQ / PQ-ADC) — the memory-compression
scale path for similarity search (extension; no reference analogue —
the reference is a CSV-cleaning pipeline).

Product quantization (Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; the FAISS ``IndexIVFPQ`` pattern):
split each (unit-normalized) vector into ``m`` contiguous subvectors,
k-means each subspace into ``ks ≤ 256`` codewords, and store each vector
as ``m`` one-byte codes. A 64-dim float32 embedding (256 B) becomes 8 B
— 32×, so a 100 TB embedding corpus scans as ~3 TB of codes. Queries
score candidates with ADC (asymmetric distance computation): one tiny
``m × ks`` lookup table of exact query-subvector · codeword dot products
per query, then a score is ``m`` table gathers instead of a ``dim``-wide
multiply-add.

Spark mapping (same shapes as ``ivf.py``, deliberately):
- **fit**: per-subspace Lloyd k-means on a bounded driver-side sample
  (numpy, seeded, deterministic) — the codebook is tiny (m × ks ×
  dim/m) and broadcast.
- **encode**: one Arrow ``mapInPandas`` pass — a batch matmul per
  subspace, codes emitted as ``binary(m)``. Done once per corpus and
  persisted alongside the data at scale, exactly like the IVF bucket
  column.
- **search**: broadcast per-query LUTs; ONE ``mapInPandas`` pass over
  the CODES (the vectors never travel) emits batch-local top
  candidates; a global window keeps the top ``refine × k`` per query;
  an optional exact re-rank joins the true vectors of only those
  ≤ refine·k·|queries| candidate ids and re-scores them with the exact
  cosine — the output then carries EXACT similarities, with PQ deciding
  only which candidates were considered.
- **IVF composition**: ``ivfpq_cosine_topk`` = coarse-quantizer bucket
  pruning (``ivf.with_ivf_bucket`` + per-query probe mask) over the
  encoded corpus, then the same ADC scorer — FAISS's IndexIVFPQ: probe
  ``nprobe`` of the coarse buckets, gather-score only their codes.

Approximate by construction (quantization error decides candidate
ordering), so there is no SQL oracle; correctness is pinned the same way
the LSH/IVF small-nprobe paths are: measured recall against the exact
brute-force top-k on planted-cluster corpora, determinism across
partitionings, and exact-score parity on the re-rank path (pytest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import to_matrix


def fit_pq(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 256,
    sample_rows: int = 25_000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace Lloyd k-means codebooks, shape ``(m, ks', dim/m)``
    with ``ks' = min(ks, sample size)``. Sampled rows are unit-normalized
    first so ADC inner products approximate cosine. One Arrow
    ``toPandas`` transfer like ``ivf.fit_centroids``. ``dim`` must be
    divisible by ``m`` (raise early — silently padding would make codes
    incompatible with any standard PQ layout).

    DETERMINISM (round 10, closes the ADVICE-r8 caveat for real): the
    sample is the ``sample_rows`` smallest-``xxhash64(vector, seed)``
    rows (``ivf.stable_sample``), so the same corpus CONTENT yields the
    same codebooks under ANY partitioning or row order — persisted PQ
    indexes are reproducible artifacts. Fits from pre-r10 per-partition
    Bernoulli sampling differ at the same seed on corpora over
    ``sample_rows``; persisted indexes keep working (codes ride with
    their codebooks)."""
    if ks > 256:
        raise ValueError(f"ks={ks}: one-byte codes hold at most 256 codewords")
    from .ivf import stable_sample

    pdf = stable_sample(df, vec_col, sample_rows, seed)
    vals = [v for v in pdf[pdf.columns[0]] if v is not None and len(v) > 0]
    if not vals:
        raise ValueError("fit_pq: no non-empty vectors in sample")
    lens: dict[int, int] = {}
    for v in vals:
        lens[len(v)] = lens.get(len(v), 0) + 1
    dim = max(lens, key=lambda d: (lens[d], -d))
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    X = np.array([v for v in vals if len(v) == dim], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        kj = min(ks, len(Xj))
        C = Xj[rng.choice(len(Xj), size=kj, replace=False)].copy()
        for _ in range(iters):
            # argmin ||x−c||² = argmin ||c||² − 2x·c: one BLAS matmul.
            # The r8 form materialized the (n, ks, sub) broadcast temp —
            # 328 MB per iteration at a 20k sample, 80 allocations per
            # fit — and cost ~69 s where this whole loop runs in ~3 s
            # (round 9, measured at the sf1 20k×64 corpus).
            a = ((C * C).sum(axis=1)[None, :] - 2.0 * (Xj @ C.T)).argmin(axis=1)
            counts = np.bincount(a, minlength=kj).astype(np.float64)
            # per-dimension weighted bincount beats np.add.at ~2.5x here
            sums = np.stack(
                [np.bincount(a, weights=Xj[:, d], minlength=kj)
                 for d in range(sub)], axis=1,
            )
            nz = counts > 0
            C[nz] = sums[nz] / counts[nz, None]
        books.append(C)
    kmax = max(len(b) for b in books)
    out = np.zeros((m, kmax, sub), dtype=np.float64)
    for j, b in enumerate(books):
        out[j, : len(b)] = b
        if len(b) < kmax:  # pad with the last codeword (never selected twice)
            out[j, len(b):] = b[-1]
    return out


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(id, _pq_code binary[, _ivf_bucket int]) — each vector
    unit-normalized and encoded as ``m`` one-byte nearest-codeword
    indices (L2 in each subspace, the standard PQ assignment). NULL /
    ragged / zero vectors → NULL code (excluded from search, mirroring
    the IVF NULL-bucket rule). One Arrow pass, batch matmuls per
    subspace. Pass ``centroids`` to ALSO emit the IVF coarse bucket from
    the same batch (round 9): assigning it in a separate chained
    pandas_udf + re-attach join shipped the vectors through Python twice
    and paid a corpus-sized id shuffle — the fused pass does neither
    (same double-Python finding as ``ivf._probe_and_score``)."""
    m, ks, sub = codebooks.shape
    dim = m * sub
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((codebooks, centroids))
    id_type = df.schema[id_col].dataType.simpleString()
    with_bucket = centroids is not None
    schema = f"__id {id_type}, _pq_code binary" + (
        ", _ivf_bucket int" if with_bucket else ""
    )

    def encode(it):
        B, C = bc.value
        # ||x - c||² = ||x||² − 2x·c + ||c||²; per-subspace argmin needs
        # only the cross and codeword terms
        cnorm = [(B[j] ** 2).sum(axis=1) for j in range(m)]
        for pdf in it:
            if pdf.empty:
                continue
            X, bad = to_matrix(pdf[vec_col].tolist(), dim)
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = np.divide(X, norms, out=np.zeros_like(X), where=norms > 0)
            codes = np.empty((len(Xn), m), dtype=np.uint8)
            for j in range(m):
                Xj = Xn[:, j * sub : (j + 1) * sub]
                d2 = cnorm[j][None, :] - 2.0 * (Xj @ B[j].T)
                codes[:, j] = d2.argmin(axis=1).astype(np.uint8)
            invalid = (norms[:, 0] == 0)
            if bad is not None:
                invalid |= np.asarray(bad, dtype=bool)
            payload = [
                None if invalid[i] else codes[i].tobytes()
                for i in range(len(Xn))
            ]
            cols = {"__id": pdf[id_col].to_numpy(), "_pq_code": payload}
            if C is not None:
                # same argmax as ivf.with_ivf_bucket (scale-invariant);
                # invalid vectors get a NULL bucket, never probed
                a = np.argmax(Xn @ C.T, axis=1)
                cols["_ivf_bucket"] = pd.array(
                    [None if invalid[i] else int(a[i]) for i in range(len(Xn))],
                    dtype="Int32",
                )
            yield pd.DataFrame(cols)

    out = df.select(id_col, vec_col).mapInPandas(encode, schema)
    keep = [F.col("__id").alias(id_col), "_pq_code"]
    if with_bucket:
        keep.append("_ivf_bucket")
    return out.select(*keep)


def write_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 256,
    codebooks: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> np.ndarray:
    """Materialize the PQ index AT REST (the "fit once, persist the
    codebooks alongside the codes" path the ``fit_pq`` docstring
    promises): the one-byte codes as parquet — partitioned by
    ``_ivf_bucket`` when ``centroids`` are given, the IVF-PQ layout whose
    probed buckets prune at the SCAN — and the codebooks as a tiny
    parquet sidecar, mirroring ``ivf.write_ivf_index``. At 100 TB the
    stored codes are ~1/32 of the vector bytes and fit/encode run once,
    not per query. Codes must always be searched with the codebooks they
    were encoded under — reading both from one index dir guarantees
    the pairing."""
    spark = corpus.sparkSession
    if codebooks is None:
        codebooks = fit_pq(corpus, vec_col, m=m, ks=ks, seed=seed)
    codes = pq_encode(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cvec")),
        codebooks, "_cvec", "neighbor_id", centroids=centroids,
    )
    if centroids is not None:
        # one task per bucket, same small-files argument as the IVF index
        codes.repartition(len(centroids), "_ivf_bucket").write.mode(
            "overwrite"
        ).partitionBy("_ivf_bucket").parquet(f"{path}/codes")
    else:
        codes.write.mode("overwrite").parquet(f"{path}/codes")
    mm, kk, sub = codebooks.shape
    spark.createDataFrame(
        [(j, c, [float(x) for x in codebooks[j, c]])
         for j in range(mm) for c in range(kk)],
        "subspace int, code int, codeword array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    return codebooks


def read_pq_codebooks(spark, path: str) -> np.ndarray:
    rows = (
        spark.read.parquet(f"{path}/codebooks")
        .orderBy("subspace", "code").collect()
    )
    m = rows[-1]["subspace"] + 1
    ks = rows[-1]["code"] + 1
    sub = len(rows[0]["codeword"])
    out = np.zeros((m, ks, sub), dtype=np.float64)
    for r in rows:
        out[r["subspace"], r["code"]] = r["codeword"]
    return out


def _adc_candidates(
    codes: DataFrame,
    q_rows: list,
    codebooks: np.ndarray,
    n_cand: int,
    bucket_mask: np.ndarray | None = None,
) -> DataFrame:
    """Batch-local ADC top-``n_cand`` per query over (neighbor_id,
    _pq_code [, _ivf_bucket]) → global window. Only codes travel."""
    m, ks, sub = codebooks.shape
    spark = codes.sparkSession
    qids = np.array([r[0] for r in q_rows])
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # per-query LUT of exact query-subvector · codeword inner products
    luts = np.stack(
        [
            np.stack([Qn[qi, j * sub : (j + 1) * sub] @ codebooks[j].T
                      for j in range(m)])
            for qi in range(len(qids))
        ]
    )  # (nq, m, ks)
    bc = spark.sparkContext.broadcast((qids, luts, bucket_mask))
    id_type = codes.schema["neighbor_id"].dataType.simpleString()
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, adc_sim double"
    has_bucket = "_ivf_bucket" in codes.columns

    def score(it):
        qids_, luts_, mask_ = bc.value
        nq = len(qids_)
        for pdf in it:
            if pdf.empty:
                continue
            ok_code = pdf["_pq_code"].notna().to_numpy()
            if not ok_code.any():
                continue
            sel_rows = np.flatnonzero(ok_code)
            raw = np.frombuffer(
                b"".join(pdf["_pq_code"].iloc[sel_rows]), dtype=np.uint8
            ).reshape(len(sel_rows), m)
            ids = pdf["neighbor_id"].to_numpy()[sel_rows]
            allowed = None
            if mask_ is not None and has_bucket:
                allowed = mask_[
                    pdf["_ivf_bucket"].to_numpy(dtype=np.int64)[sel_rows]
                ]  # (rows, nq)
            out = []
            cols = np.arange(m)
            for qi in range(nq):
                # S = Σ_j LUT[qi, j, code_j]  (m gathers, no matmul)
                S = luts_[qi][cols[None, :], raw].sum(axis=1)
                S = np.round(S, 6)
                okq = ids != qids_[qi]
                if allowed is not None:
                    okq &= allowed[:, qi]
                idx = np.flatnonzero(okq)
                if idx.size == 0:
                    continue
                sel = idx[np.lexsort((ids[idx], -S[idx]))[:n_cand]]
                out.append(pd.DataFrame({
                    "query_id": qids_[qi],
                    "neighbor_id": ids[sel],
                    "adc_sim": S[sel],
                }))
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = codes.mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_cand)
        .drop("_rn")
    )


def pq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 256,
    refine: int = 4,
    codebooks: np.ndarray | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC top-k with exact re-rank: ADC selects ``refine × k``
    candidates per query from the one-byte-per-subspace codes, then the
    TRUE vectors of only those candidates are re-scored with the exact
    cosine — output is (query_id, neighbor_id, cos_sim rounded 6dp,
    deterministic tie-break), the same contract as
    ``brute_force.cosine_topk``, with quantization affecting only which
    candidates were considered. ``refine=0`` skips the re-rank and
    returns the raw ADC approximation as ``cos_sim`` (cheapest, least
    accurate). Pass ``codebooks``/``encoded`` to reuse a persisted index
    (fit once per corpus, like the IVF centroid cache)."""
    if codebooks is None:
        codebooks = fit_pq(corpus, vec_col, m=m, ks=ks)
    if encoded is None:
        encoded = pq_encode(corpus, codebooks, vec_col, id_col)
    codes = encoded.select(
        F.col(id_col).alias("neighbor_id"), "_pq_code"
    )
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
    cand = _adc_candidates(codes, q_rows, codebooks, n_cand)
    if not refine:
        return cand.select(
            "query_id", "neighbor_id", F.col("adc_sim").alias("cos_sim")
        )
    # exact re-rank: join the true vectors of ≤ refine·k·|queries|
    # candidate ids (a broadcast-able frame by construction), rescore
    # JVM-side with the exact cosine, keep top-k per query
    return _exact_rerank(corpus, cand, q_rows, k, id_col, vec_col)


def ivfpq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ks: int = 256,
    refine: int = 4,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """FAISS-IndexIVFPQ shape: coarse-quantizer bucket pruning (only the
    ``nprobe`` probed buckets' CODES are gather-scored, a
    PartitionFilter on a bucket-partitioned layout) + ADC + exact
    re-rank. At 100 TB this scans nprobe/n_centroids of a 32×-compressed
    code table instead of the raw vectors."""
    from .ivf import fit_centroids

    if centroids is None:
        centroids = fit_centroids(corpus, vec_col, k=n_centroids)
    if codebooks is None:
        codebooks = fit_pq(corpus, vec_col, m=m, ks=ks)
    nprobe = min(nprobe, len(centroids))

    # ONE Arrow pass emits code + coarse bucket together (round 9): the
    # former with_ivf_bucket → pq_encode → id-join shape shipped the
    # vectors through Python twice and shuffled two corpus-sized frames
    # to re-attach a column the encoder could compute in place. At scale
    # this fused frame IS the persisted index layout (codes partitioned
    # by bucket), built in one map-only pass.
    codes = pq_encode(
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cvec")),
        codebooks, "_cvec", "neighbor_id", centroids=centroids,
    )

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
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(Qn @ centroids.T), axis=1)[:, :nprobe]
    mask = np.zeros((len(centroids), len(q_rows)), dtype=bool)
    for qi, row in enumerate(order):
        mask[row, qi] = True
    probed = sorted({int(b) for row in order for b in row})
    codes = codes.where(F.col("_ivf_bucket").isin(probed))

    n_cand = max(k, refine * k) if refine else k
    cand = _adc_candidates(codes, q_rows, codebooks, n_cand, bucket_mask=mask)
    if not refine:
        return cand.select(
            "query_id", "neighbor_id", F.col("adc_sim").alias("cos_sim")
        )
    return _exact_rerank(corpus, cand, q_rows, k, id_col, vec_col)


def _exact_rerank(corpus, cand, q_rows, k, id_col, vec_col):
    """Shared exact-cosine re-rank tail (see pq_cosine_topk)."""
    spark = corpus.sparkSession
    qids = np.array([r[0] for r in q_rows])
    Q = np.array([r[1] for r in q_rows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qdf = spark.createDataFrame(
        pd.DataFrame({"query_id": qids, "_qvec": [list(map(float, v)) for v in Qn]})
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nvec")
    )
    dot = F.aggregate(
        F.zip_with("_qvec", "_nvec", lambda a, b: a * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(F.aggregate(
        F.transform("_nvec", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ))
    rescored = (
        cand.join(vecs, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "cos_sim",
            F.round(dot / F.when(nrm > 0, nrm).otherwise(F.lit(None)), 6),
        )
        .where(F.col("cos_sim").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rescored.select("query_id", "neighbor_id", "cos_sim")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
