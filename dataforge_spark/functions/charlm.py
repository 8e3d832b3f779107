"""Byte-bigram language-model perplexity scoring — the CCNet-style
quality gate (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"): train a tiny LM on a
trusted corpus, score candidate documents, filter the high-perplexity
tail. CCNet uses 5-gram KenLM; with no external model files in scope,
this module trains a byte-BIGRAM model — the same decision shape
(in-domain text scores low, boilerplate/garbled text scores high) with
a 256x256 table that broadcasts for free.

Scale design:

- **Training** is one ``mapInPandas`` pass emitting ONE partial
  256x256 count matrix per ARROW BATCH (not per row), plus a final
  512 KB-per-partition driver sum — no shuffle at all, corpus size
  only bounds the scan.
- **Scoring** broadcasts the log-prob table into an Arrow
  ``pandas_udf`` that vectorizes the whole batch through numpy
  fancy-indexing (``logp[a, b].sum()`` over byte pairs) — no Python
  per-character loop.
- Smoothing is add-k over the 256-way alphabet, so unseen bytes score
  harshly but finitely; the model dict is plain numpy + floats,
  picklable and content-deterministic.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class CharLm:
    """Trained byte-bigram model: ``logp[a, b] = log P(b | a)`` with
    add-k smoothing; row 256 is the BOS context."""

    def __init__(self, counts: np.ndarray, add_k: float = 0.5):
        if counts.shape != (257, 256):
            raise ValueError("counts must be (257, 256) [BOS row last]")
        self.add_k = float(add_k)
        self.counts = counts.astype(np.float64)
        smoothed = self.counts + self.add_k
        self.logp = np.log(smoothed / smoothed.sum(axis=1, keepdims=True))

    def logprob_per_byte(self, text: str) -> float:
        """Mean log-probability per byte (BOS-conditioned first byte);
        empty text scores 0.0 by convention."""
        bs = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        if bs.size == 0:
            return 0.0
        total = self.logp[256, bs[0]]
        if bs.size > 1:
            total += self.logp[bs[:-1].astype(np.intp), bs[1:].astype(np.intp)].sum()
        return float(total / bs.size)

    def perplexity(self, text: str) -> float:
        return math.exp(-self.logprob_per_byte(text))


def train_char_lm(df: DataFrame, text_col: str, add_k: float = 0.5) -> CharLm:
    """One shuffle-free scan: each Arrow batch folds its texts into a
    single partial count matrix; the driver sums the partials."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("counts", T.BinaryType())])

    def fold(batches):
        import pandas as pd

        for pdf in batches:
            m = np.zeros((257, 256), dtype=np.int64)
            for text in pdf[text_col]:
                if text is None:
                    continue
                bs = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if bs.size == 0:
                    continue
                m[256, bs[0]] += 1
                if bs.size > 1:
                    np.add.at(
                        m, (bs[:-1].astype(np.intp), bs[1:].astype(np.intp)), 1
                    )
            yield pd.DataFrame({"counts": [m.tobytes()]})

    parts = df.select(text_col).mapInPandas(fold, schema=schema).collect()
    total = np.zeros((257, 256), dtype=np.int64)
    for r in parts:
        total += np.frombuffer(bytes(r["counts"]), dtype=np.int64).reshape(
            257, 256
        )
    return CharLm(total, add_k=add_k)


def char_lm_logprob(col, model: CharLm) -> Column:
    """Mean per-byte log-prob column (higher = more in-domain). The
    log-prob table rides the closure as one 512 KB broadcast; scoring
    is numpy fancy-indexing per batch. Null in → null out."""
    from pyspark.sql.functions import pandas_udf

    logp = model.logp

    @pandas_udf("double")
    def score(s):
        import pandas as pd

        def one(text):
            if text is None:
                return None
            bs = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
            if bs.size == 0:
                return 0.0
            t = logp[256, bs[0]]
            if bs.size > 1:
                t += logp[bs[:-1].astype(np.intp), bs[1:].astype(np.intp)].sum()
            return float(t / bs.size)

        return s.map(one)

    return score(F.col(col) if isinstance(col, str) else col)


def char_lm_perplexity(col, model: CharLm) -> Column:
    """``exp(-mean log-prob)`` — the CCNet filtering statistic."""
    return F.exp(-char_lm_logprob(col, model))


def filter_by_perplexity(
    df: DataFrame, text_col: str, model: CharLm, max_ppl: float
) -> DataFrame:
    """Keep rows whose perplexity under the trusted-corpus model is at
    most ``max_ppl`` (CCNet keeps the head/middle of the distribution;
    pick the threshold from a quantile of scores on a sample)."""
    return df.where(char_lm_perplexity(text_col, model) <= F.lit(max_ppl))
