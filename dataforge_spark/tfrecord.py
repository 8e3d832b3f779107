"""TFRecord source/sink — the training-data interchange format of the
TensorFlow ecosystem, implemented from the PUBLIC wire specification
(TensorFlow ``tensorflow/core/lib/io/record_writer.h`` framing doc and
the ``tensorflow/core/example/example.proto`` / ``feature.proto``
message definitions — both Apache-2.0 public documents; no TensorFlow
code is used or required).

Extension surface: the reference engine (see ``SURVEY.md §2`` S1/S2,
reference ``data_io.py``) reads/writes CSV only; TFRecord is part of
this engine's LLM-training-data I/O tier alongside the Avro OCF
source/sink (``avro.py``).

Wire format (each record)::

    uint64  length        (little-endian)
    uint32  masked_crc32c(length bytes)
    byte    data[length]              -- a serialized tf.Example
    uint32  masked_crc32c(data)

where ``masked_crc32c(x) = rotr15(crc32c(x)) + 0xa282ead8 (mod 2^32)``
and crc32c is the Castagnoli CRC (reflected poly ``0x82F63B78``).

tf.Example is a tiny fixed protobuf shape::

    Example  { Features features = 1; }
    Features { map<string, Feature> feature = 1; }
    Feature  { oneof { BytesList bytes_list = 1;
                       FloatList float_list = 2;   // packed float
                       Int64List int64_list = 3; } }  // packed varint

so this module carries a ~150-line purpose-built protobuf codec rather
than a dependency: varints are bounds-checked (≤10 bytes), unknown
fields are skipped by wire type, deprecated group types reject, and
repeated numeric fields decode in BOTH packed and unpacked encodings
(the spec requires readers to accept either).

Scale design mirrors ``avro.py``:

- **Read**: ``spark.read.format("binaryFile")`` ships each
  ``.tfrecord`` part to one task; an Arrow-batched ``mapInPandas``
  stage walks the framing and decodes Examples. TFRecord has no
  internal sync marker, so the file is the split unit — writers
  (including this one) keep parts at partition granularity.
- **Write**: one ``part-NNNNN.tfrecord`` per partition via
  ``mapPartitionsWithIndex``, streamed record-by-record — peak
  executor memory is ONE encoded record, never the partition.
- Nulls use the standard TF convention: a null cell simply OMITS the
  feature from that row's Example; absent features read back as null.

Type mapping (Spark → Feature):

- string → bytes_list (UTF-8); binary → bytes_list
- byte/short/int/long/boolean/timestamp → int64_list
  (timestamps as epoch micros, the engine's convention)
- float → float_list
- double → ``double_mode="float"`` (default; float_list, the
  ecosystem-standard 32-bit narrowing) or ``double_mode="bytes"``
  (8-byte little-endian IEEE754 inside bytes_list — exact, for
  round-trip-critical engine use; documented convention)
- array<T> of any of the above → the same list with N values
"""

from __future__ import annotations

import gzip
import io as _io
import os
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ------------------------------------------------------------- crc32c

_CRC32C_POLY = 0x82F63B78


def _make_crc_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _CRC32C_POLY if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _make_crc_table()


def crc32c(data: bytes) -> int:
    """Castagnoli CRC-32 (reflected), e.g. crc32c(b"123456789") ==
    0xE3069283."""
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) & 0xFFFFFFFF) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------- protobuf core

_MAX_VARINT_BYTES = 10


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    start = pos
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        if pos - start >= _MAX_VARINT_BYTES:
            raise ValueError("varint longer than 10 bytes")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        value &= 0xFFFFFFFFFFFFFFFF  # two's complement, 10-byte form
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _to_int64(u: int) -> int:
    return u - (1 << 64) if u >= 1 << 63 else u


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == 1:
        if pos + 8 > len(buf):
            raise ValueError("truncated fixed64")
        return pos + 8
    if wire == 5:
        if pos + 4 > len(buf):
            raise ValueError("truncated fixed32")
        return pos + 4
    if wire == 2:
        ln, pos = _read_varint(buf, pos)
        if ln < 0 or pos + ln > len(buf):
            raise ValueError("truncated length-delimited field")
        return pos + ln
    raise ValueError(f"unsupported protobuf wire type {wire}")


def _read_len_prefixed(buf: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = _read_varint(buf, pos)
    if pos + ln > len(buf):
        raise ValueError("truncated length-delimited field")
    return buf[pos : pos + ln], pos + ln


# ------------------------------------------------------ Feature codec


def _decode_bytes_list(buf: bytes) -> list[bytes]:
    vals: list[bytes] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            v, pos = _read_len_prefixed(buf, pos)
            vals.append(v)
        else:
            pos = _skip_field(buf, pos, wire)
    return vals


def _decode_float_list(buf: bytes) -> list[float]:
    vals: list[float] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # packed
            chunk, pos = _read_len_prefixed(buf, pos)
            if len(chunk) % 4:
                raise ValueError("packed float_list not a multiple of 4 bytes")
            vals.extend(struct.unpack(f"<{len(chunk) // 4}f", chunk))
        elif field == 1 and wire == 5:  # unpacked
            if pos + 4 > len(buf):
                raise ValueError("truncated float")
            vals.append(struct.unpack_from("<f", buf, pos)[0])
            pos += 4
        else:
            pos = _skip_field(buf, pos, wire)
    return vals


def _decode_int64_list(buf: bytes) -> list[int]:
    vals: list[int] = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # packed
            chunk, pos = _read_len_prefixed(buf, pos)
            cp = 0
            while cp < len(chunk):
                u, cp = _read_varint(chunk, cp)
                vals.append(_to_int64(u))
        elif field == 1 and wire == 0:  # unpacked
            u, pos = _read_varint(buf, pos)
            vals.append(_to_int64(u))
        else:
            pos = _skip_field(buf, pos, wire)
    return vals


_KIND_BYTES, _KIND_FLOAT, _KIND_INT64 = 1, 2, 3


def _decode_feature(buf: bytes) -> tuple[int, list]:
    """Feature message → (kind, values). Last oneof member wins, per
    protobuf semantics."""
    kind, vals = 0, []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field in (1, 2, 3) and wire == 2:
            body, pos = _read_len_prefixed(buf, pos)
            if field == _KIND_BYTES:
                kind, vals = field, _decode_bytes_list(body)
            elif field == _KIND_FLOAT:
                kind, vals = field, _decode_float_list(body)
            else:
                kind, vals = field, _decode_int64_list(body)
        else:
            pos = _skip_field(buf, pos, wire)
    return kind, vals


def decode_example(data: bytes) -> dict[str, tuple[int, list]]:
    """Serialized tf.Example → {feature_name: (kind, values)} with kind
    in {1: bytes, 2: float, 3: int64}."""
    feats: dict[str, tuple[int, list]] = {}
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # Features
            fbuf, pos = _read_len_prefixed(data, pos)
            fpos = 0
            while fpos < len(fbuf):
                ftag, fpos = _read_varint(fbuf, fpos)
                ffield, fwire = ftag >> 3, ftag & 7
                if ffield == 1 and fwire == 2:  # map entry
                    entry, fpos = _read_len_prefixed(fbuf, fpos)
                    name, feat = None, None
                    epos = 0
                    while epos < len(entry):
                        etag, epos = _read_varint(entry, epos)
                        efield, ewire = etag >> 3, etag & 7
                        if efield == 1 and ewire == 2:
                            kb, epos = _read_len_prefixed(entry, epos)
                            name = kb.decode("utf-8")
                        elif efield == 2 and ewire == 2:
                            fb, epos = _read_len_prefixed(entry, epos)
                            feat = _decode_feature(fb)
                        else:
                            epos = _skip_field(entry, epos, ewire)
                    if name is not None and feat is not None:
                        feats[name] = feat
                else:
                    fpos = _skip_field(fbuf, fpos, fwire)
        else:
            pos = _skip_field(data, pos, wire)
    return feats


def _tag(field: int, wire: int) -> bytes:
    out = bytearray()
    _write_varint(out, (field << 3) | wire)
    return bytes(out)


def _len_prefixed(field: int, body: bytes) -> bytes:
    out = bytearray(_tag(field, 2))
    _write_varint(out, len(body))
    out += body
    return bytes(out)


def _encode_feature(kind: int, vals: list) -> bytes:
    body = bytearray()
    if kind == _KIND_BYTES:
        for v in vals:
            body += _len_prefixed(1, v)
    elif kind == _KIND_FLOAT:
        body += _len_prefixed(1, struct.pack(f"<{len(vals)}f", *vals))
    elif kind == _KIND_INT64:
        packed = bytearray()
        for v in vals:
            _write_varint(packed, v)
        body += _len_prefixed(1, bytes(packed))
    else:  # pragma: no cover - internal invariant
        raise ValueError(f"bad feature kind {kind}")
    return _len_prefixed(kind, bytes(body))


def encode_example(feats: dict[str, tuple[int, list]]) -> bytes:
    """{name: (kind, values)} → serialized tf.Example bytes.
    Deterministic: features are emitted in sorted-name order."""
    features_body = bytearray()
    for name in sorted(feats):
        kind, vals = feats[name]
        entry = _len_prefixed(1, name.encode("utf-8")) + _len_prefixed(
            2, _encode_feature(kind, vals)
        )
        features_body += _len_prefixed(1, bytes(entry))
    return _len_prefixed(1, bytes(features_body))


# ---------------------------------------------------- record framing

_GZIP_MAGIC = b"\x1f\x8b"
_MAX_RECORD_BYTES = 256 << 20  # framing sanity bound (memory-bomb class)


def write_record(fh, data: bytes) -> None:
    header = struct.pack("<Q", len(data))
    fh.write(header)
    fh.write(struct.pack("<I", masked_crc32c(header)))
    fh.write(data)
    fh.write(struct.pack("<I", masked_crc32c(data)))


def iter_records(buf: bytes, verify: bool = True) -> Iterator[bytes]:
    """Walk TFRecord framing over ``buf`` (transparently gunzipping a
    whole-file-gzip part first), yielding each record's data bytes.
    Raises ValueError on truncation, oversized lengths, or (when
    ``verify``) CRC mismatch — never hangs, never over-reads."""
    if buf[:2] == _GZIP_MAGIC:
        try:
            buf = gzip.decompress(buf)
        except OSError as exc:
            raise ValueError(f"bad gzip stream: {exc}") from exc
    pos = 0
    n = len(buf)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated TFRecord header")
        (length,) = struct.unpack_from("<Q", buf, pos)
        (hcrc,) = struct.unpack_from("<I", buf, pos + 8)
        if length > _MAX_RECORD_BYTES:
            raise ValueError(f"TFRecord length {length} exceeds sanity bound")
        if verify and masked_crc32c(buf[pos : pos + 8]) != hcrc:
            raise ValueError("TFRecord length CRC mismatch")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError("truncated TFRecord payload")
        data = buf[pos : pos + length]
        (dcrc,) = struct.unpack_from("<I", buf, pos + length)
        if verify and masked_crc32c(data) != dcrc:
            raise ValueError("TFRecord data CRC mismatch")
        pos += length + 4
        yield data


# ------------------------------------------------------ Spark mapping

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _col_spec(field: T.StructField, double_mode: str) -> tuple[str, str, bool]:
    """StructField → (feature kind tag, scalar spark kind, is_array)."""
    dt = field.dataType
    is_array = isinstance(dt, T.ArrayType)
    if is_array:
        dt = dt.elementType
    if isinstance(dt, _INT_TYPES):
        return "int64", "int", is_array
    if isinstance(dt, T.BooleanType):
        return "int64", "bool", is_array
    if isinstance(dt, T.TimestampType):
        return "int64", "ts", is_array
    if isinstance(dt, T.FloatType):
        return "float", "float", is_array
    if isinstance(dt, T.DoubleType):
        if double_mode == "bytes":
            return "bytes", "double8", is_array
        return "float", "double", is_array
    if isinstance(dt, T.StringType):
        return "bytes", "str", is_array
    if isinstance(dt, T.BinaryType):
        return "bytes", "bin", is_array
    raise NotImplementedError(
        f"tfrecord: unsupported Spark type {field.dataType.simpleString()} "
        f"for column {field.name!r}"
    )


_KIND_OF = {"bytes": _KIND_BYTES, "float": _KIND_FLOAT, "int64": _KIND_INT64}

_EPOCH = None


def _epoch():
    global _EPOCH
    if _EPOCH is None:
        import datetime as _dt

        _EPOCH = _dt.datetime(1970, 1, 1)
    return _EPOCH


def _cell_to_values(cell: Any, kind: str, scalar: str) -> list:
    vals = cell if isinstance(cell, (list, tuple)) else [cell]
    out = []
    for v in vals:
        if v is None:
            raise ValueError("tfrecord: null ELEMENT inside an array cell")
        if scalar == "bool":
            out.append(1 if v else 0)
        elif scalar == "ts":
            out.append(
                int(v.timestamp() * 1_000_000)
                if v.tzinfo
                else (v - _epoch()) // __import__("datetime").timedelta(
                    microseconds=1
                )
            )
        elif scalar == "str":
            out.append(v.encode("utf-8"))
        elif scalar == "double8":
            out.append(struct.pack("<d", v))
        elif scalar in ("float", "double"):
            out.append(float(v))
        elif scalar == "bin":
            out.append(bytes(v))
        else:
            out.append(int(v))
    return out


def _values_to_cell(vals: list, kind_got: int, kind_want: str, scalar: str,
                    is_array: bool) -> Any:
    if kind_got != _KIND_OF[kind_want]:
        raise ValueError(
            f"tfrecord: feature kind {kind_got} does not match declared "
            f"schema kind {kind_want!r}"
        )
    out = []
    for v in vals:
        if scalar == "bool":
            out.append(bool(v))
        elif scalar == "ts":
            import datetime as _dt

            out.append(_dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=v))
        elif scalar == "str":
            out.append(v.decode("utf-8"))
        elif scalar == "double8":
            if len(v) != 8:
                raise ValueError("tfrecord: double8 bytes cell not 8 bytes")
            out.append(struct.unpack("<d", v)[0])
        elif scalar == "double":
            out.append(float(v))
        else:
            out.append(v)
    if is_array:
        return out
    if len(out) != 1:
        raise ValueError(
            f"tfrecord: scalar column decoded {len(out)} values"
        )
    return out[0]


# --------------------------------------------------------- public API


def write_tfrecord(
    df: DataFrame,
    path: str,
    compression: str | None = None,
    double_mode: str = "float",
) -> None:
    """TFRecord sink: one ``part-NNNNN.tfrecord[.gz]`` per partition,
    streamed record-by-record (peak executor memory = one Example).
    ``compression="gzip"`` gzips the whole part (the TF ecosystem
    convention, ``TFRecordOptions(compression_type="GZIP")``).
    ``double_mode``: "float" narrows doubles to float32 (interop
    default), "bytes" stores exact 8-byte IEEE754 (engine convention).
    Null cells omit the feature (standard TF sparse convention); null
    elements INSIDE an array cell raise. Encoding is Python
    row-at-a-time — prefer parquet for hot-path sinks, this for
    training-data interchange."""
    if compression not in (None, "gzip"):
        raise ValueError(f"unsupported tfrecord compression {compression!r}")
    if double_mode not in ("float", "bytes"):
        raise ValueError(f"double_mode must be 'float' or 'bytes'")
    schema = df.schema
    specs = [(f.name, *_col_spec(f, double_mode)) for f in schema.fields]
    os.makedirs(path, exist_ok=True)
    ext = ".tfrecord.gz" if compression == "gzip" else ".tfrecord"

    def write_partition(idx: int, rows) -> Any:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return iter(())
        import itertools

        tmp = f"{path}/.part-{idx:05d}{ext}.tmp"
        raw = open(tmp, "wb")
        fh = gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) if (
            compression == "gzip"
        ) else raw
        try:
            for row in itertools.chain([first], it):
                feats = {}
                for name, kind, scalar, _is_arr in specs:
                    cell = row[name]
                    if cell is None:
                        continue  # omitted feature == null
                    feats[name] = (
                        _KIND_OF[kind], _cell_to_values(cell, kind, scalar)
                    )
                write_record(fh, encode_example(feats))
        finally:
            if fh is not raw:
                fh.close()
            raw.close()
        os.replace(tmp, f"{path}/part-{idx:05d}{ext}")
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_partition).count()
    open(os.path.join(path, "_SUCCESS"), "w").close()


def read_tfrecord(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    double_mode: str = "float",
    verify_crc: bool = True,
) -> DataFrame:
    """TFRecord scan: ``binaryFile`` ships each part file to one task
    (TFRecord has no sync marker — the file is the split unit), an
    Arrow-batched ``mapInPandas`` stage walks the framing and decodes
    tf.Examples against the DECLARED schema (TFRecord files carry no
    schema; pass the one you wrote with). Absent features → null.
    ``double_mode`` must match the writer's choice for double columns."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if double_mode not in ("float", "bytes"):
        raise ValueError(f"double_mode must be 'float' or 'bytes'")
    specs = [(f.name, *_col_spec(f, double_mode)) for f in schema.fields]
    pattern = (
        os.path.join(path, "*.tfrecord*") if os.path.isdir(path) else path
    )
    files = spark.read.format("binaryFile").load(pattern)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                rows: dict[str, list] = {n: [] for n, *_ in specs}
                for rec in iter_records(bytes(content), verify=verify_crc):
                    feats = decode_example(rec)
                    for name, kind, scalar, is_arr in specs:
                        got = feats.get(name)
                        if got is None:
                            rows[name].append(None)
                        else:
                            rows[name].append(
                                _values_to_cell(
                                    got[1], got[0], kind, scalar, is_arr
                                )
                            )
                data = {}
                for name, kind, scalar, is_arr in specs:
                    if kind == "int64" and scalar == "int" and not is_arr:
                        data[name] = pd.array(rows[name], dtype="Int64")
                    else:
                        data[name] = pd.Series(rows[name], dtype=object)
                yield pd.DataFrame(data, columns=[n for n, *_ in specs])

    return files.select("content").mapInPandas(run, schema=schema)
