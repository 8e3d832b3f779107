"""WARC source/sink — the web-archive container behind Common Crawl
(WARC/WET/WAT files), implemented from the PUBLIC ISO 28500 / IIPC
WARC 1.1 specification. Extension surface: the reference engine
(``SURVEY.md §2`` S1/S2) reads CSV only; WARC is the ingestion tier a
100 TB web-crawl training-data pipeline starts from.

Record wire shape::

    WARC/1.1\\r\\n
    WARC-Type: conversion\\r\\n
    WARC-Record-ID: <urn:uuid:...>\\r\\n
    WARC-Date: 2026-01-01T00:00:00Z\\r\\n
    Content-Length: N\\r\\n
    ...\\r\\n
    \\r\\n
    <N payload bytes>\\r\\n\\r\\n

Storage convention (Common Crawl's): each record is its OWN gzip
member and members are concatenated, so a reader can stream records
without decompressing the whole file and writers can append. This
module reads both that form and plain ``.warc``.

Scale design (mirrors ``avro.py`` / ``tfrecord.py``):

- **Read**: ``binaryFile`` ships each ``.warc(.gz)`` part to one task;
  an Arrow-batched ``mapInPandas`` stage walks gzip members with
  ``zlib.decompressobj`` (member-at-a-time via ``unused_data`` — peak
  memory is ONE record, not the file) and parses headers under hard
  caps (header block ≤ 1 MiB, Content-Length ≤ 1 GiB) so a malformed
  or adversarial member raises ValueError instead of allocating.
- **Write**: one ``part-NNNNN.warc.gz`` per partition via
  ``mapPartitionsWithIndex``; each record gzip'd and flushed
  individually (bounded memory, CC-compatible member framing). A
  ``warcinfo`` head record is written per file, per the spec's
  convention.
- Record IDs are deterministic (md5 of URI + payload) so runs are
  reproducible and the correctness oracle can recompute them.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import zlib
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GZIP_MAGIC = b"\x1f\x8b"
_MAX_HEADER_BYTES = 1 << 20  # 1 MiB header block cap
_MAX_CONTENT_BYTES = 1 << 30  # 1 GiB payload sanity bound
_CRLF = b"\r\n"

_WARC_FIELDS = [
    ("record_id", "WARC-Record-ID"),
    ("warc_type", "WARC-Type"),
    ("warc_date", "WARC-Date"),
    ("target_uri", "WARC-Target-URI"),
    ("content_type", "Content-Type"),
    ("language", "WARC-Identified-Content-Language"),
]

WARC_SCHEMA = T.StructType(
    [T.StructField(n, T.StringType()) for n, _ in _WARC_FIELDS]
    + [
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
    ]
)


# ----------------------------------------------------------- record parse


def _parse_record(
    block: bytes, start: int = 0
) -> tuple[dict[str, str], bytes, int]:
    """One record at ``block[start:]`` → (headers, payload, end offset).
    Trailing bytes beyond the record are permitted (plain-file mode);
    parsing at an offset avoids re-slicing the whole buffer per record."""
    hdr_end = block.find(_CRLF + _CRLF, start, start + _MAX_HEADER_BYTES + 4)
    if hdr_end < 0:
        raise ValueError(
            "WARC header block missing blank-line terminator "
            f"(or exceeds {_MAX_HEADER_BYTES} bytes)"
        )
    lines = block[start:hdr_end].split(_CRLF)
    version = lines[0].strip()
    if version not in (b"WARC/1.0", b"WARC/1.1"):
        raise ValueError(f"bad WARC version line {version[:40]!r}")
    headers: dict[str, str] = {}
    for raw in lines[1:]:
        if not raw.strip():
            continue
        if raw[:1] in (b" ", b"\t") and headers:
            # obs-fold continuation per the grammar
            headers[last] += " " + raw.strip().decode("utf-8", "replace")  # noqa: F821
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            raise ValueError(f"malformed WARC header line {raw[:60]!r}")
        last = name.strip().decode("ascii", "replace")
        headers[last] = value.strip().decode("utf-8", "replace")
    try:
        length = int(headers["Content-Length"])
    except KeyError:
        raise ValueError("WARC record missing Content-Length") from None
    except ValueError:
        raise ValueError(
            f"bad Content-Length {headers['Content-Length']!r}"
        ) from None
    if not 0 <= length <= _MAX_CONTENT_BYTES:
        raise ValueError(f"Content-Length {length} outside sanity bounds")
    body_start = hdr_end + 4
    body_end = body_start + length
    if body_end + 4 > len(block):
        raise ValueError("truncated WARC payload")
    if block[body_end : body_end + 4] != _CRLF + _CRLF:
        raise ValueError("WARC record missing CRLF CRLF trailer")
    return headers, block[body_start:body_end], body_end + 4


def iter_warc_records(buf: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk a ``.warc`` or ``.warc.gz`` byte string, yielding
    (headers, payload) per record. Gzip files are read member-at-a-time
    (``unused_data`` advance), so a corrupt member or truncated stream
    raises ValueError without scanning past it."""
    if buf[:2] == _GZIP_MAGIC:
        pos = 0
        cap = _MAX_HEADER_BYTES + _MAX_CONTENT_BYTES + 64
        chunk_out = 1 << 20
        while pos < len(buf):
            d = zlib.decompressobj(wbits=47)
            parts = []
            total = 0
            try:
                out = d.decompress(buf[pos:], chunk_out)
                while True:
                    parts.append(out)
                    total += len(out)
                    if total > cap:
                        raise ValueError(
                            "gzip member inflates past the record size bound"
                        )
                    if d.eof:
                        break
                    if not d.unconsumed_tail:
                        raise ValueError("truncated gzip member")
                    out = d.decompress(d.unconsumed_tail, chunk_out)
            except zlib.error as exc:
                raise ValueError(f"bad gzip member: {exc}") from exc
            headers, payload, _ = _parse_record(b"".join(parts))
            yield headers, payload
            consumed = len(buf) - pos - len(d.unused_data)
            if consumed <= 0:
                raise ValueError("gzip member consumed no bytes")
            pos += consumed
    else:
        pos = 0
        while pos < len(buf):
            headers, payload, pos = _parse_record(buf, pos)
            yield headers, payload


# ----------------------------------------------------------- record build


def _build_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    out = bytearray(b"WARC/1.1\r\n")
    for name, value in headers:
        if "\r" in value or "\n" in value:
            raise ValueError(f"WARC header {name} value contains CR/LF")
        out += f"{name}: {value}\r\n".encode("utf-8")
    out += f"Content-Length: {len(payload)}\r\n\r\n".encode("ascii")
    out += payload
    out += _CRLF + _CRLF
    return bytes(out)


def _record_id(*parts: bytes) -> str:
    h = hashlib.md5(b"\x00".join(parts)).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


# --------------------------------------------------------------- public API


def write_warc(
    df: DataFrame,
    path: str,
    payload_col: str = "payload",
    uri_col: str | None = None,
    language_col: str | None = None,
    warc_type: str = "conversion",
    content_type: str = "text/plain",
    warc_date: str = "2026-01-01T00:00:00Z",
    extra_header_cols: dict[str, str] | None = None,
    compress: bool = True,
) -> None:
    """WARC sink: one ``part-NNNNN.warc(.gz)`` per partition; each
    record its own gzip member (Common Crawl convention) written as
    produced — peak executor memory is one record. ``payload_col`` may
    be binary or string (UTF-8 encoded); null payloads are rejected
    (a WARC record always has a body — filter first). A ``warcinfo``
    head record is emitted per file. ``warc_date`` is a fixed ISO
    timestamp: deterministic output is an engine convention (record
    IDs are md5 of URI + payload for the same reason).
    ``extra_header_cols`` maps WARC header name → column name for
    custom ``X-``/``WARC-`` headers."""
    extra = extra_header_cols or {}
    cols = [payload_col] + [c for c in (uri_col, language_col) if c]
    cols += list(extra.values())
    proj = df.select(*cols)
    is_str = isinstance(proj.schema[payload_col].dataType, T.StringType)
    os.makedirs(path, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def _member(rec: bytes) -> bytes:
        return gzip.compress(rec, mtime=0) if compress else rec

    def write_partition(idx: int, rows) -> Any:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return iter(())
        import itertools

        tmp = f"{path}/.part-{idx:05d}{ext}.tmp"
        with open(tmp, "wb") as fh:
            info_payload = (
                b"software: dataforge_spark.warc\r\n"
                b"format: WARC File Format 1.1\r\n"
            )
            fh.write(
                _member(
                    _build_record(
                        [
                            ("WARC-Type", "warcinfo"),
                            ("WARC-Record-ID", _record_id(b"warcinfo", str(idx).encode())),
                            ("WARC-Date", warc_date),
                            ("Content-Type", "application/warc-fields"),
                        ],
                        info_payload,
                    )
                )
            )
            for row in itertools.chain([first], it):
                payload = row[payload_col]
                if payload is None:
                    raise ValueError(
                        f"null {payload_col!r} cell — a WARC record "
                        "always has a body; filter nulls first"
                    )
                if is_str:
                    payload = payload.encode("utf-8")
                else:
                    payload = bytes(payload)
                uri = row[uri_col] if uri_col else None
                headers = [
                    ("WARC-Type", warc_type),
                    (
                        "WARC-Record-ID",
                        _record_id(
                            (uri or "").encode("utf-8"), payload
                        ),
                    ),
                    ("WARC-Date", warc_date),
                ]
                if uri is not None:
                    headers.append(("WARC-Target-URI", uri))
                if language_col and row[language_col] is not None:
                    headers.append(
                        (
                            "WARC-Identified-Content-Language",
                            row[language_col],
                        )
                    )
                headers.append(("Content-Type", content_type))
                for hname, cname in extra.items():
                    if row[cname] is not None:
                        headers.append((hname, str(row[cname])))
                fh.write(_member(_build_record(headers, payload)))
        os.replace(tmp, f"{path}/part-{idx:05d}{ext}")
        return iter(())

    proj.rdd.mapPartitionsWithIndex(write_partition).count()
    open(os.path.join(path, "_SUCCESS"), "w").close()


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC scan: ``binaryFile`` ships each ``.warc(.gz)`` part to one
    task (per-record gzip members make records streamable WITHIN the
    task; the file stays the split unit, matching how Common Crawl
    segments are sized for exactly this layout), an Arrow-batched
    ``mapInPandas`` stage parses records. Well-known headers are
    promoted to columns; the full raw header map rides along in
    ``headers``. ``warcinfo`` records appear as rows — filter on
    ``warc_type`` (e.g. ``== 'conversion'`` for WET text)."""
    pattern = os.path.join(path, "*.warc*") if os.path.isdir(path) else path
    files = spark.read.format("binaryFile").load(pattern)
    cols = [f.name for f in WARC_SCHEMA.fields]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                rows: dict[str, list] = {c: [] for c in cols}
                for headers, payload in iter_warc_records(bytes(content)):
                    for out_name, hdr_name in _WARC_FIELDS:
                        rows[out_name].append(headers.get(hdr_name))
                    rows["content_length"].append(len(payload))
                    rows["payload"].append(payload)
                    rows["headers"].append(headers)
                data = {c: pd.Series(rows[c], dtype=object) for c in cols}
                data["content_length"] = pd.array(
                    rows["content_length"], dtype="Int64"
                )
                yield pd.DataFrame(data, columns=cols)

    return files.select("content").mapInPandas(run, schema=WARC_SCHEMA)


def read_wet_text(spark: SparkSession, path: str) -> DataFrame:
    """Convenience WET view: conversion records decoded as UTF-8 text
    with URI + language — the shape an LLM-corpus pipeline ingests."""
    recs = read_warc(spark, path)
    return recs.filter(F.col("warc_type") == "conversion").select(
        F.col("target_uri"),
        F.col("language"),
        F.col("payload").cast("string").alias("text"),
        F.col("content_length"),
    )
