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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _resize_plane(px, out_h: int, out_w: int, method: str):
    """(h, w, ch) ndarray → (out_h, out_w, ch), vectorized numpy.
    'nearest' picks the center-aligned source pixel; 'bilinear' blends
    the 4 neighbors with edge clamping (the standard align-corners=False
    convention both major DL frameworks default to)."""
    import numpy as np

    h, w, _ = px.shape
    sy = h / out_h
    sx = w / out_w
    if method == "nearest":
        yi = np.minimum(((np.arange(out_h) + 0.5) * sy).astype(np.int64), h - 1)
        xi = np.minimum(((np.arange(out_w) + 0.5) * sx).astype(np.int64), w - 1)
        return px[yi][:, xi]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    fy = (np.arange(out_h) + 0.5) * sy - 0.5
    fx = (np.arange(out_w) + 0.5) * sx - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    info = np.iinfo(px.dtype)
    return np.clip(np.round(out), info.min, info.max).astype(px.dtype)


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    method: str = "bilinear",
    on_error: str = "raise",
) -> DataFrame:
    """REAL decode → resize → re-encode for image payloads — the
    thumbnail/normalize stage of a multimodal training pipeline, now
    genuine end-to-end (round 10; it was a comment inside the
    fake-decode path before the codecs landed). Arrow-batched
    ``mapInPandas``, map-only: at 100 TB this runs embarrassingly
    parallel over whatever partitioning the payload table already has,
    no shuffle.

    Decodes any container ``codecs.decode_media`` knows (BMP / PPM /
    PNG incl. 16-bit + palette / baseline JPEG), resizes with
    ``method`` ('bilinear' default, 'nearest'), and re-encodes as PNG —
    lossless, so tests can pin exact bytes, and 16-bit sources stay
    16-bit. Audio payloads (WAV) and unknown containers follow
    ``on_error``: 'raise' (default — the codec guard) or 'null' (emit
    the row with a NULL payload so the pipeline can quarantine it
    downstream, mirroring the JSONL corrupt-line pattern)."""
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dataforge_spark import codecs

        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                try:
                    m = codecs.decode_media(bytes(payload))
                    if m["sample_rate"]:
                        raise NotImplementedError(
                            "resize_images got an audio payload"
                        )
                except (NotImplementedError, ValueError):
                    if on_error == "raise":
                        raise
                    rows.append({"id": int(rid), "width": 0, "height": 0,
                                 "channels": 0, "payload": None})
                    continue
                content = m["content"]
                if content.ndim == 4:  # animated (GIF): resize frame 0
                    content = content[0]
                px = _resize_plane(content, height, width, method)
                rows.append(
                    {
                        "id": int(rid),
                        "width": width,
                        "height": height,
                        "channels": px.shape[2],
                        "payload": codecs.encode_png(px),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=RESIZED_SCHEMA)


MEDIA_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def sample_media_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    every: int = 1,
) -> DataFrame:
    """REAL frame extraction (round 10) — the genuine version of what
    ``sample_frames`` stands in for with byte chunks: decode an ANIMATED
    container (GIF; single-image containers count as one frame), keep
    every ``every``-th composed frame, re-encode each losslessly as PNG,
    and emit one row per sampled frame. Arrow-batched ``mapInPandas``,
    map-only — output partitioning follows the source rows, exactly like
    a production frame-extraction stage; no shuffle at any scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dataforge_spark import codecs

        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                m = codecs.decode_media(bytes(payload))
                content = m["content"]
                if m["sample_rate"]:
                    raise NotImplementedError(
                        "sample_media_frames got an audio payload"
                    )
                frames = content if content.ndim == 4 else content[None]
                for fi in range(0, len(frames), every):
                    px = frames[fi]
                    rows.append(
                        {
                            "id": int(rid),
                            "frame_idx": fi,
                            "width": px.shape[1],
                            "height": px.shape[0],
                            "channels": px.shape[2],
                            "payload": codecs.encode_png(px),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FRAME_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=MEDIA_FRAME_SCHEMA)
