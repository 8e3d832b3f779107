"""Check-time recomputation of the two oracle rows whose expected values
are model/signature-derived rather than SQL-expressible (VERDICT r5
task 3): ``o4_isolation_forest`` and ``dedup_simhash_verified``.

Round 5 pinned these as literals computed once at sf0.01 — that proved
determinism/regression, not correctness, and broke at any other scale
factor. Here the expected values are derived FROM THE INPUT DATA at
oracle-construction time with a second, Spark-free implementation:

- simhash: pure-Python tokenize → xxh64 per token (``functions/xxh64.py``,
  bit-equal to ``F.xxhash64``) → bit votes → signature → O(n²) numpy
  hamming sweep. Independent of the JVM explode/aggregate/banded-join
  path end to end.
- isolation forest: DuckDB-fetched column → the same seeded
  ``NumpyIsolationForest`` fit (the model IS the operator's spec) but
  with scoring, thresholding, removal, and the kept-id checksum all
  recomputed in numpy — independent of the broadcast + Arrow-UDF
  distributed scoring path.

Both run over the driver's oracle scale (sf0.01: 600 docs / 10 k events),
milliseconds of work, memoized per sf_dir.
"""

from __future__ import annotations

import functools
import os
import re

import numpy as np


def oracle_sf_dir() -> str:
    """The sf dir the driver's DuckDB views point at (contract: sf0.01).
    Overridable so tools/check_correctness.py can verify at other SFs."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _src(sf_dir: str, table: str) -> str:
    p = os.path.join(sf_dir, f"{table}.parquet")
    return f"{p}/*.parquet" if os.path.isdir(p) else p


# Java/RE2-compatible ASCII \s — Spark's split("\\s+") (re.ASCII pins
# Python's \s to the same set; the corpora carry no \x0B either way).
_WS = re.compile(r"\s+", re.ASCII)
_POP_M1 = np.uint64(0x5555555555555555)
_POP_M2 = np.uint64(0x3333333333333333)
_POP_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_POP_H = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array (numpy<2 has no bit_count)."""
    x = x - ((x >> np.uint64(1)) & _POP_M1)
    x = (x & _POP_M2) + ((x >> np.uint64(2)) & _POP_M2)
    x = (x + (x >> np.uint64(4))) & _POP_M4
    return (x * _POP_H) >> np.uint64(56)


def _py_simhash(text: str, hash_cache: dict) -> int:
    """64-bit simhash exactly as dedup/simhash.py computes it:
    split(trim(text), '\\s+') with Spark's limit=-1 semantics (leading/
    trailing empties KEPT — F.trim strips 0x20 only), each token's
    xxh64(seed 42) votes ±1 per bit, bit = 1 iff vote sum > 0."""
    from dataforge_spark.functions.xxh64 import xxh64

    toks = _WS.split(text.strip(" "))
    hs = np.empty(len(toks), dtype=np.uint64)
    for i, tok in enumerate(toks):
        h = hash_cache.get(tok)
        if h is None:
            h = xxh64(tok.encode("utf-8"))
            hash_cache[tok] = h
        hs[i] = h
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little")
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(toks)
    sig = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
    return int(sig.view(np.uint64)[0])


@functools.lru_cache(maxsize=4)
def simhash_expected(sf_dir: str, max_hamming: int = 3) -> tuple[int, int, int, int]:
    """(n_pairs, n_brute, n_disagree, n_planted) for
    q_dedup_simhash_verified over ``sf_dir``'s documents (+the query's
    planted dups: doc_id % 5 == 0 copied to doc_id + 100000).

    n_pairs == n_brute by the Manku chunk-agreement guarantee (any pair
    within hamming d shares one of d+1 exact chunks), so both are the
    brute-force count; n_disagree is 0 by the same guarantee — the Spark
    side computes it from its own banded-vs-brute full join, so a banding
    bug shows up as a mismatch against this 0."""
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{_src(sf_dir, 'documents')}'"
    ).fetchall()
    docs = [(int(i), t) for i, t in rows]
    docs += [(int(i) + 100000, t) for i, t in rows if i % 5 == 0]

    hash_cache: dict = {}
    text_cache: dict[str, int] = {}
    ids, sigs = [], []
    for i, t in docs:
        if t is None:
            continue
        s = text_cache.get(t)
        if s is None:
            s = _py_simhash(t, hash_cache)
            text_cache[t] = s
        ids.append(i)
        sigs.append(s)
    order = np.argsort(np.asarray(ids))
    idv = np.asarray(ids, dtype=np.int64)[order]
    arr = np.asarray(sigs, dtype=np.uint64)[order]

    n_pairs = 0
    n_planted = 0
    for j in range(len(arr) - 1):
        ham = _popcount64(arr[j] ^ arr[j + 1:])
        close = ham <= max_hamming
        n_pairs += int(close.sum())
        n_planted += int(
            ((idv[j + 1:] - idv[j] == 100000) & (ham == 0)).sum()
        )
    return n_pairs, n_pairs, 0, n_planted


@functools.lru_cache(maxsize=4)
def iforest_expected(sf_dir: str) -> tuple[int, int]:
    """(n_kept, kept_id_sum) for q_o4_isolation_forest over ``sf_dir``'s
    events: fit the seeded numpy forest on the SORTED value multiset
    (operators/isolation_forest.py:93 — partition-order independence),
    flag predict() == -1, keep the rest (nulls keep), checksum event_id."""
    import duckdb

    from dataforge_spark.operators.iforest_numpy import NumpyIsolationForest

    pdf = duckdb.connect().execute(
        f"SELECT event_id, value FROM '{_src(sf_dir, 'events')}'"
    ).fetch_df()
    vals = pdf["value"].to_numpy(dtype=float)
    ok = ~np.isnan(vals)
    model = NumpyIsolationForest(contamination=0.1, random_state=42).fit(
        np.sort(vals[ok]).reshape(-1, 1)
    )
    flagged = np.zeros(len(vals), dtype=bool)
    flagged[ok] = model.predict(vals[ok].reshape(-1, 1)) == -1
    kept = ~flagged
    return int(kept.sum()), int(pdf["event_id"].to_numpy()[kept].sum())


# --- hashed-n-gram quality classifier twin (round 12, VERDICT r11 task 3) ---

# The EXACT hyperparameters q_txt_metrics trains with — pinned here so
# the twin and the Spark side cannot drift apart silently.
CLF_DIM = 1 << 15
CLF_NGRAM = 2
CLF_EPOCHS = 8
CLF_LR = 1.0
CLF_L2 = 1e-6
# the label rule: documents containing the standalone token "spark" are
# the "trusted" class (mid-frequency token → per-doc non-trivial margins)
_CLF_POS_RE = re.compile(r"\bspark\b")
# functions/quality_classifier._TOKEN_RE, replicated
_CLF_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def _clf_features(text: str, dim: int, ngram: int):
    """Sequential twin of quality_classifier._doc_features: word
    {1..ngram}-gram hashing (zlib.crc32 % dim), tf normalized."""
    import zlib

    toks = _CLF_TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    grams = []
    for n in range(1, ngram + 1):
        for i in range(len(toks) - n + 1):
            grams.append(
                zlib.crc32(" ".join(toks[i : i + n]).encode("utf-8")) % dim
            )
    b = np.asarray(grams, np.int64)
    idx, c = np.unique(b, return_counts=True)
    return idx, c / b.size


@functools.lru_cache(maxsize=4)
def classifier_expected(sf_dir: str) -> tuple[tuple[int, float], ...]:
    """((doc_id, prob), ...) for q_txt_metrics's classifier columns:
    a SEQUENTIAL pure-numpy twin of train_quality_classifier (full-batch
    Adagrad logistic regression, same features/steps/regularization) +
    scoring, independent of the mapInPandas gradient plumbing and the
    Arrow scoring UDF. Differences vs Spark are float-addition order
    only (~1e-12); the query rounds probs to 3 decimals and thresholds
    at 0.5 with measured min |margin| 0.0275, so verdicts are stable."""
    import math

    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{_src(sf_dir, 'documents')}' "
        "WHERE text IS NOT NULL ORDER BY doc_id"
    ).fetchall()
    docs = [
        (int(i), _clf_features(t, CLF_DIM, CLF_NGRAM),
         1.0 if _CLF_POS_RE.search(t.lower()) else 0.0)
        for i, t in rows
    ]
    n = len(docs)
    w = np.zeros(CLF_DIM)
    b = 0.0
    hist = np.zeros(CLF_DIM + 1)
    for _ in range(CLF_EPOCHS):
        g = np.zeros(CLF_DIM + 1)
        for _, (idx, vals), y in docs:
            m = w[idx] @ vals + b
            p = 1.0 / (1.0 + math.exp(-m))
            np.add.at(g, idx, (p - y) * vals)
            g[CLF_DIM] += p - y
        g /= n
        g[:CLF_DIM] += CLF_L2 * w
        hist += g * g
        step = CLF_LR * g / np.sqrt(hist + 1e-10)
        w -= step[:CLF_DIM]
        b -= step[CLF_DIM]
    out = []
    for i, (idx, vals), _ in docs:
        m = w[idx] @ vals + b
        out.append((i, float(1.0 / (1.0 + math.exp(-m)))))
    return tuple(out)
