"""Multimodal (binary) column support — extension surface beyond the
reference (the reference is CSV-only, /root/reference/main.py:94-95).

Design for a 100 TB training-data pipeline: image/audio/video payloads are
opaque ``binary`` columns travelling WITH typed metadata columns, processed
by Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-by-row. Real decode needs codec libraries this container does
not ship, so the decode step is a clearly-marked deterministic stub
(``fake_decode=True``) / ``NotImplementedError`` — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("prefix", T.StringType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """UTF-8-encode a string column into a ``binary`` payload column —
    stand-in for reading real media bytes (`spark.read.format("binaryFile")`
    on a cluster)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def binary_meta(df: DataFrame, bin_col: str = "payload", prefix_len: int = 8) -> DataFrame:
    """Typed metadata for a binary column, JVM-side only: byte length and a
    decoded head — no Python in the loop."""
    b = F.col(bin_col)
    return df.withColumn("n_bytes", F.octet_length(b).cast("long")).withColumn(
        "prefix", F.substring(F.decode(b, "UTF-8"), 1, prefix_len)
    )


def sample_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    every: int = 4,
) -> DataFrame:
    """Frame sampling over a binary payload — the video-pipeline pattern
    with a byte-chunk stand-in for codec frame extraction: split the
    payload into fixed ``frame_bytes`` chunks, keep every ``every``-th,
    emit one row per sampled frame. Arrow-batched ``mapInPandas``; at
    scale this is a map-only explosion whose output is partitioned by the
    source row, exactly like real frame extraction."""
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                buf = bytes(payload)
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every):
                    rows.append(
                        {
                            "id": int(rid),
                            "frame_idx": fi,
                            "frame": buf[fi * frame_bytes:(fi + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame"])

    return df.select(id_col, bin_col).mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    fake_decode: bool = True,
) -> DataFrame:
    """Decode + feature-extract over Arrow batches via ``mapInPandas``.

    The produced schema is ``(id, n_bytes, features array<float>)``. With
    ``fake_decode`` the "features" are a deterministic byte-histogram
    projection (no codec needed); with ``fake_decode=False`` this raises
    ``NotImplementedError`` where a real image/audio decoder would plug in.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; run with fake_decode=True"
                )
            rows: list[dict[str, Any]] = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                # Deterministic stand-in for decode→resize→embed: a
                # feature_dim-bucket byte histogram, L1-normalized.
                hist = np.bincount(buf % feature_dim, minlength=feature_dim).astype("float32")
                total = hist.sum() or 1.0
                rows.append(
                    {
                        "id": int(rid),
                        "n_bytes": int(buf.size),
                        "features": (hist / total).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["id", "n_bytes", "features"])

    return df.select(id_col, bin_col).mapInPandas(run, schema=out_schema)
