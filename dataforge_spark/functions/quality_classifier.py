"""Hashed n-gram logistic-regression quality classifier — the
GPT-3/LLaMA-lineage document quality gate (Brown et al. 2020,
"Language Models are Few-Shot Learners", Appendix A; Joulin et al.
2016, "Bag of Tricks for Efficient Text Classification" [fastText];
Touvron et al. 2023): train a linear classifier to tell a trusted
corpus (Wikipedia/books) from raw crawl, score every crawl document,
and keep the high-scoring head — optionally by the Pareto-thresholded
importance sampling GPT-3 used rather than a hard cutoff.

No counterpart in the reference (a single-process pandas cleaner,
``/root/reference/pipeline.py``); this is part of the LLM-pipeline
extension tier next to `charlm` (perplexity gate) and
`text_analysis.quality_score` (heuristic gate).

Scale design:

- **Featurization** is the hashing trick over word {1..n}-grams into
  ``dim`` buckets — no vocabulary state, no shuffle, computed inside
  Arrow batches with ``zlib.crc32`` (C speed, stable across processes
  and runs, unlike builtin ``hash`` under PYTHONHASHSEED). tf-weights
  normalized per document (fastText's mean-of-embeddings shape).
- **Training** is full-batch gradient descent: each epoch is ONE
  ``mapInPandas`` scan emitting a single ``(dim+1)``-float64 partial
  gradient per Arrow batch; the driver sums partials and takes the
  step. No shuffle anywhere; the model is an ``8*dim``-byte vector
  that rides the closure broadcast. Train on a bounded SAMPLE of each
  corpus (a quality classifier needs ~1e5 docs, not the 100 TB it will
  score) — the sampled union is cached across epochs.
- **Scoring** broadcasts the weights into one Arrow ``pandas_udf``:
  hash + sparse dot + sigmoid, numpy per batch, zero shuffles — the
  plan shape is one ArrowEvalPython projection (asserted in
  ``tests/test_quality_classifier.py``).
- **Determinism**: the gradient is a SUM over documents, so training
  is layout-independent up to float-addition order; tests pin
  decisions by margin, never raw float equality. Scoring a given
  model is bit-deterministic per document.
"""

from __future__ import annotations

import math
import re
import zlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Same token shape as text_analysis.TOKEN_RE: words OR single
# punctuation marks, lowercased before hashing.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def _doc_buckets(text: str, dim: int, ngram: int) -> np.ndarray:
    """Hash a document's word {1..ngram}-grams into bucket ids
    (int64 array, one entry per gram occurrence)."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, dtype=np.int64)
    grams: list[int] = []
    for n in range(1, ngram + 1):
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            grams.append(zlib.crc32(g.encode("utf-8")) % dim)
    return np.asarray(grams, dtype=np.int64)


def _doc_features(text: str, dim: int, ngram: int):
    """(bucket ids, tf weights) for one document: counts over distinct
    buckets, normalized to sum 1 (fastText's averaged-bag shape)."""
    b = _doc_buckets(text, dim, ngram)
    if b.size == 0:
        return b, np.empty(0, dtype=np.float64)
    idx, counts = np.unique(b, return_counts=True)
    return idx, counts / b.size


class HashedTextClassifier:
    """Trained model: ``dim`` hashed-gram weights + bias. Picklable,
    content-deterministic given the training set and hyperparameters."""

    def __init__(
        self,
        weights: np.ndarray,
        bias: float,
        ngram: int = 2,
        meta: dict | None = None,
    ):
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = float(bias)
        self.ngram = int(ngram)
        self.meta = dict(meta or {})

    @property
    def dim(self) -> int:
        return int(self.weights.shape[0])

    def margin(self, text: str) -> float:
        """Raw decision value w·x + b (empty text scores bias only)."""
        idx, vals = _doc_features(text, self.dim, self.ngram)
        return float(self.weights[idx] @ vals + self.bias)

    def prob(self, text: str) -> float:
        """P(document is from the trusted corpus)."""
        return 1.0 / (1.0 + math.exp(-self.margin(text)))


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    dim: int = 1 << 18,
    ngram: int = 2,
    epochs: int = 10,
    lr: float = 1.0,
    l2: float = 1e-6,
    max_docs_per_class: int = 200_000,
) -> HashedTextClassifier:
    """Train trusted-vs-crawl logistic regression with full-batch
    Adagrad (Duchi et al. 2011) — per-coordinate step sizes, which
    plain GD needs hundreds of epochs to match on hashed sparse
    features whose frequencies span orders of magnitude (measured:
    Adagrad lr=1 reaches full separation on the test corpora in 8
    epochs; GD lr=2 is still at p≈0.51 after 10). Full-batch, so every
    epoch is deterministic given the training set — no minibatch
    ordering anywhere.

    ``positive`` = trusted corpus, ``negative`` = raw crawl. Each class
    is capped at ``max_docs_per_class`` by a deterministic hash sample
    (never a full 100 TB scan per epoch), the union is cached, and each
    epoch is one shuffle-free ``mapInPandas`` gradient pass.
    """
    from pyspark.sql import types as T

    from ..curation import SPLIT_BUCKETS, split_bucket

    def bounded(df: DataFrame, label: float) -> DataFrame:
        out = df.select(
            F.col(text_col).cast("string").alias("_text"),
            F.lit(label).alias("_y"),
        ).where(F.col("_text").isNotNull())
        n = out.count()
        if n > max_docs_per_class:
            # keep ≈max_docs_per_class rows by the curation module's
            # deterministic md5 bucket on the text itself — stable
            # across retries and layouts.
            # max(1, ...): at n > SPLIT_BUCKETS*max_docs_per_class the
            # floor would hit 0 and silently empty the class — keep at
            # least one bucket (the sample overshoots the cap by at most
            # n/SPLIT_BUCKETS per bucket, which is the sampling grain).
            frac_buckets = max(
                1, int(SPLIT_BUCKETS * max_docs_per_class / n)
            )
            out = out.where(split_bucket(["_text"]) < frac_buckets)
        return out

    pos = bounded(positive, 1.0)
    neg = bounded(negative, 0.0)
    train = pos.unionByName(neg).cache()
    n_docs = train.count()  # materializes the cache
    if n_docs == 0:
        raise ValueError("training set is empty")
    n_pos = train.where(F.col("_y") == 1.0).count()
    if n_pos == 0 or n_pos == n_docs:
        raise ValueError(
            "one class's bounded sample is empty — a one-label training "
            "set would fit a degenerate classifier; widen "
            "max_docs_per_class or check the inputs"
        )

    schema = T.StructType(
        [
            T.StructField("grad", T.BinaryType()),
            T.StructField("loss", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    hist = np.zeros(dim + 1, dtype=np.float64)  # Adagrad accumulator
    losses: list[float] = []
    for _ in range(epochs):
        w_c, b_c = w, b  # ride the task closure (8*dim bytes)

        def grad_fold(batches, w_c=w_c, b_c=b_c):
            import pandas as pd

            for pdf in batches:
                g = np.zeros(dim + 1, dtype=np.float64)
                loss = 0.0
                n = 0
                for text, y in zip(pdf["_text"], pdf["_y"]):
                    idx, vals = _doc_features(text, dim, ngram)
                    m = w_c[idx] @ vals + b_c
                    p = 1.0 / (1.0 + math.exp(-m))
                    # d(logloss)/dm = p - y; sparse chain rule onto w.
                    np.add.at(g, idx, (p - y) * vals)
                    g[dim] += p - y
                    # numerically-stable logloss: log(1+e^m) - y*m
                    loss += (math.log1p(math.exp(-abs(m))) + max(m, 0.0)) - y * m
                    n += 1
                yield pd.DataFrame(
                    {"grad": [g.tobytes()], "loss": [loss], "n": [n]}
                )

        parts = train.mapInPandas(grad_fold, schema=schema).collect()
        g = np.zeros(dim + 1, dtype=np.float64)
        total_loss = 0.0
        for r in parts:
            g += np.frombuffer(bytes(r["grad"]), dtype=np.float64)
            total_loss += r["loss"]
        g /= n_docs
        g[:dim] += l2 * w
        hist += g * g
        step = lr * g / np.sqrt(hist + 1e-10)
        w = w - step[:dim]
        b = b - step[dim]
        losses.append(total_loss / n_docs + 0.5 * l2 * float(w @ w))

    train.unpersist()
    return HashedTextClassifier(
        w,
        b,
        ngram=ngram,
        meta={
            "dim": dim,
            "epochs": epochs,
            "lr": lr,
            "l2": l2,
            "n_docs": n_docs,
            "loss_curve": losses,
        },
    )


def quality_prob(col, model: HashedTextClassifier) -> Column:
    """P(trusted | document) as a column — one Arrow ``pandas_udf``
    carrying the weights in its closure. Null in → null out; empty
    text → sigmoid(bias)."""
    from pyspark.sql.functions import pandas_udf

    w, bias, dim, ngram = model.weights, model.bias, model.dim, model.ngram

    @pandas_udf("double")
    def score(s):
        def one(text):
            if text is None:
                return None
            idx, vals = _doc_features(text, dim, ngram)
            m = w[idx] @ vals + bias
            return float(1.0 / (1.0 + math.exp(-m)))

        return s.map(one)

    return score(F.col(col) if isinstance(col, str) else col)


def filter_by_quality(
    df: DataFrame,
    text_col: str,
    model: HashedTextClassifier,
    min_prob: float = 0.5,
) -> DataFrame:
    """Hard-threshold gate: keep rows the classifier scores at least
    ``min_prob`` trusted."""
    return df.where(quality_prob(text_col, model) >= F.lit(min_prob))


def pareto_keep(
    df: DataFrame,
    score_col: str,
    alpha: float = 9.0,
    seed: int = 0,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """GPT-3's quality importance sampling (Brown et al. 2020, App. A):
    keep a document iff ``pareto(alpha) > 1 - score``, so high-scoring
    docs are (almost) always kept yet low-scoring ones retain a
    diversity tail instead of being cut at a cliff.

    The Pareto draw is DERANDOMIZED: ``u`` comes from a JVM-side
    ``xxhash64`` of ``key_cols`` (default: all columns) salted with
    ``seed``, then inverted through the Lomax CDF
    ``x = (1-u)^(-1/alpha) - 1``. Same rows survive on every retry,
    every layout, every engine — and the whole gate is a pure-codegen
    filter, zero Python."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    cols = [F.col(c) for c in (key_cols or df.columns)]
    # pmod(hash, 2^32) / 2^32 → u uniform on [0, 1); 1-u is in (0, 1]
    # so the pow never divides by zero.
    m = F.lit(float(2**32))
    u = F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(2**32)).cast("double") / m
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return df.where(pareto > (F.lit(1.0) - F.col(score_col)))
