"""Multimodal (binary) column support — extension surface beyond the
reference (the reference is CSV-only, /root/reference/main.py:94-95).

Design for a 100 TB training-data pipeline: image/audio/video payloads are
opaque ``binary`` columns travelling WITH typed metadata columns, processed
by Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-by-row. Since round 8 the decode step is REAL for the
containers pure stdlib+numpy can parse — BMP / P6-PPM / PNG (round 9,
stdlib zlib) images and RIFF PCM WAV audio (``dataforge_spark.codecs``)
— exercised end-to-end by
``media_meta`` and ``extract_features(fake_decode=False)``. Containers
needing codec libraries this environment does not ship still raise
``NotImplementedError``; ``fake_decode=True`` remains for synthetic
byte-payload fixtures.
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
    projection over the RAW payload (no codec needed — synthetic-fixture
    mode). With ``fake_decode=False`` the payload is REALLY decoded via
    the pure-stdlib codecs (BMP / P6-PPM / PNG images, RIFF PCM WAV
    audio — ``dataforge_spark.codecs``):

    - image → L1-normalized ``feature_dim``-bucket histogram of the
      decoded pixel bytes (container header and BMP row padding
      excluded — the observable difference from the raw-byte path);
    - audio → L1-normalized mean-absolute-amplitude over ``feature_dim``
      equal time segments (a downsampled envelope).

    Containers outside those four still raise ``NotImplementedError``
    (the advertised guard for codecs this environment cannot host).
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

        from dataforge_spark import codecs

        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(payload)
                if fake_decode:
                    buf = np.frombuffer(raw, dtype=np.uint8)
                    # Deterministic stand-in for decode→resize→embed: a
                    # feature_dim-bucket byte histogram, L1-normalized.
                    hist = np.bincount(
                        buf % feature_dim, minlength=feature_dim
                    ).astype("float32")
                    total = hist.sum() or 1.0
                    feats = hist / total
                else:
                    m = codecs.decode_media(raw)  # raises on unknown container
                    if m["kind"] == "wav":
                        amp = np.abs(
                            m["content"].astype(np.float64, copy=False)
                        ).mean(axis=1)
                        segs = np.array_split(amp, feature_dim)
                        env = np.array(
                            [s.mean() if s.size else 0.0 for s in segs],
                            dtype="float32",
                        )
                        feats = env / (env.sum() or 1.0)
                    else:
                        px = m["content"].reshape(-1)
                        hist = np.bincount(
                            px % feature_dim, minlength=feature_dim
                        ).astype("float32")
                        feats = hist / (hist.sum() or 1.0)
                rows.append(
                    {
                        "id": int(rid),
                        "n_bytes": int(len(raw)),
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["id", "n_bytes", "features"])

    return df.select(id_col, bin_col).mapInPandas(run, schema=out_schema)


MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("content_sum", T.LongType()),
    ]
)


def media_meta(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL container decode → typed per-payload metadata (schema
    ``MEDIA_META_SCHEMA``): kind, image dims / audio rate, decoded scalar
    count, and the exact integer sum of the decoded scalars
    (``content_sum`` — headers and BMP row padding excluded, so the value
    proves the decoder ran rather than a raw byte pass). Arrow-batched
    ``mapInPandas``, map-only: at scale this is the schema a media-lake
    profiling stage writes. Unknown containers raise (codec guard)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dataforge_spark import codecs

        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                m = codecs.decode_media(bytes(payload))
                rows.append(
                    {
                        "id": int(rid),
                        "kind": m["kind"],
                        "width": m["width"],
                        "height": m["height"],
                        "channels": m["channels"],
                        "sample_rate": m["sample_rate"],
                        "n_samples": m["n_samples"],
                        "content_sum": m["content_sum"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)
