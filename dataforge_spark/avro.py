"""Avro Object Container File source/sink — pure Python + Spark built-ins.

Spark's own Avro support lives in the external ``spark-avro`` jar, which
cannot be fetched in this offline environment (probed:
``Failed to find data source: avro``). The format itself, however, is a
small public spec (Avro 1.x), so this module implements it directly —
the same spirit as ``dataforge_spark.codecs``: real wire-format code,
no library dependency, Spark-side plumbing through built-in operators.

Scope (the tabular interchange subset, widened in round 11):
- **Schema**: a top-level ``record`` whose fields are primitives —
  ``boolean/int/long/float/double/bytes/string`` — or, recursively,
  ``array``s, ``map``s (string keys, per the spec) and nested
  ``record``s of those, each optionally nullable via the idiomatic
  ``["null", T]`` union, plus the logical types ``timestamp-micros``
  and ``timestamp-millis`` on ``long`` (Spark TimestampType),
  ``date`` on ``int`` (DateType), ``decimal`` on ``bytes``
  (DecimalType — big-endian two's-complement unscaled integers per
  the spec) and ``uuid`` on ``string`` (annotation-only → StringType).
  ``enum`` decodes to its symbol string (StringType) and ``fixed(N)``
  to exactly-N bytes (BinaryType); the Spark→Avro writer never emits
  either (Spark has no enum/fixed types), but the internal encoder
  supports both so spec streams and reader-resolution paths are
  testable. General (non-``[null, T]``) unions raise
  ``NotImplementedError``.
- **Codecs**: ``null``, ``deflate`` (raw RFC-1951) and ``snappy``
  (raw snappy block format + the spec's 4-byte big-endian CRC32 of the
  uncompressed data). The snappy decoder handles the full format; the
  encoder emits literal-only streams — valid snappy any decoder reads,
  chosen for simplicity over ratio (use ``deflate`` when size matters).
  Anything else (zstd, bzip2, xz) raises ``NotImplementedError``.
- **Read path**: ``spark.read.format("binaryFile")`` lists and ships
  whole ``.avro`` part files to executors; an Arrow-batched
  ``mapInPandas`` stage decodes blocks into rows. One file per task —
  the natural parallelism of container files whose blocks share a
  file-level sync marker. Schema comes from an explicit ``avro_schema``
  argument or from reading ONE file's header (driver-side, documented).
  Decoded int/long columns ride pandas nullable ``Int32``/``Int64``
  arrays into Arrow — never float64 inference, which silently corrupts
  longs above 2**53 when a null is present.
- **Write path**: each partition STREAMS its rows block-by-block into
  one ``part-NNNNN.avro`` file under the target directory via
  ``mapPartitionsWithIndex`` — peak executor memory is one encoded
  block (``block_records`` rows), not the whole partition. This writes
  through the local filesystem API — correct on local/NFS-style mounts
  (this environment); a cluster whose storage is HDFS/S3 needs the
  spark-avro jar or an FS client, which is exactly the boundary this
  module documents rather than hides.

Wire-format details implemented (Avro spec "Object Container Files" +
"Binary encoding"): zigzag-varint longs, little-endian IEEE floats,
length-prefixed bytes/strings, union branch indexes, block-framed
arrays and maps (including negative-count blocks with byte sizes on
read), the OCF magic ``Obj\\x01``, the file-metadata map
(``avro.schema``/``avro.codec``), the 16-byte sync marker framing every
block, and per-block (count, byte-size) headers.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # fixed, deterministic sync marker for our writer
_CODECS = ("null", "deflate", "snappy")

_SPARK_TO_AVRO = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
}
_AVRO_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


# --------------------------------------------------------- binary encoding


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated Avro varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("malformed Avro varint (too long)")
    return (u >> 1) ^ -(u & 1), pos


def _encode_value(typ: str, v: Any) -> bytes:
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _zigzag_encode(int(v))
    if typ == "date":  # logical date: int days since epoch
        import datetime

        if isinstance(v, datetime.date) and not isinstance(
            v, datetime.datetime
        ):
            v = (v - datetime.date(1970, 1, 1)).days
        return _zigzag_encode(int(v))
    if typ.startswith("decimal("):  # logical decimal on bytes:
        # big-endian two's-complement unscaled integer
        import decimal

        _p, s = _decimal_args(typ)
        unscaled = int(
            decimal.Decimal(v).scaleb(s).to_integral_value(
                rounding=decimal.ROUND_HALF_UP
            )
        )
        raw = unscaled.to_bytes(
            max(1, (unscaled.bit_length() + 8) // 8), "big", signed=True
        )
        return _zigzag_encode(len(raw)) + raw
    if typ == "ts_millis":  # logical timestamp-millis on long
        return _zigzag_encode(_to_micros(v) // 1000)
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        raw = str(v).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(v)
        return _zigzag_encode(len(raw)) + raw
    raise NotImplementedError(f"unsupported Avro type {typ!r}")


def _decimal_args(typ: str) -> tuple[int, int]:
    p, s = typ[8:-1].split(",")
    return int(p), int(s)


def _decode_value(typ: str, buf: bytes, pos: int) -> tuple[Any, int]:
    if typ == "date":
        import datetime

        days, pos = _zigzag_decode(buf, pos)
        try:
            return (
                datetime.date(1970, 1, 1) + datetime.timedelta(days=days),
                pos,
            )
        except OverflowError:
            raise ValueError(f"Avro date out of range ({days} days)") from None
    if typ == "ts_millis":
        import datetime

        ms, pos = _zigzag_decode(buf, pos)
        try:
            return (
                datetime.datetime(1970, 1, 1)
                + datetime.timedelta(milliseconds=ms),
                pos,
            )
        except OverflowError:
            raise ValueError(
                f"Avro timestamp-millis out of range ({ms} ms)"
            ) from None
    if typ.startswith("decimal("):
        import decimal

        n, pos = _zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("truncated Avro decimal value")
        raw = bytes(buf[pos : pos + n])
        _p, s = _decimal_args(typ)
        unscaled = int.from_bytes(raw, "big", signed=True) if raw else 0
        return decimal.Decimal(unscaled).scaleb(-s), pos + n
    need = {"boolean": 1, "float": 4, "double": 8}.get(typ)
    if need is not None and pos + need > len(buf):
        raise ValueError(f"truncated Avro {typ} value")
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("truncated Avro bytes/string value")
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    raise NotImplementedError(f"unsupported Avro type {typ!r}")


def _to_micros(v: Any) -> int:
    """datetime → epoch micros; NAIVE values are treated as UTC (the
    session convention — see session.py), never the worker's local
    timezone. Ints pass through."""
    if hasattr(v, "timetuple"):
        import calendar

        return (
            calendar.timegm(v.utctimetuple() if v.tzinfo else v.timetuple())
            * 1_000_000
            + v.microsecond
        )
    return int(v)


# Recursive type DESCRIPTORS. A descriptor is either a primitive name
# (plain str — so flat-record specs look exactly like they did before
# round 11) or a tuple:
#   ("array",  elem_desc, elem_nullable, elem_is_ts)
#   ("map",    value_desc, value_nullable, value_is_ts)
#   ("record", [(name, desc, nullable, is_ts), ...])


def _encode_datum(desc, is_ts: bool, v: Any) -> bytes:
    """Binary-encode one non-null value of descriptor `desc`."""
    if is_ts:
        return _zigzag_encode(_to_micros(v))
    if isinstance(desc, str):
        return _encode_value(desc, v)
    tag = desc[0]
    if tag == "enum":
        symbols = desc[1]
        try:
            return _zigzag_encode(symbols.index(str(v)))
        except ValueError:
            raise ValueError(
                f"value {v!r} is not a symbol of Avro enum {symbols}"
            ) from None
    if tag == "fixed":
        raw = bytes(v)
        if len(raw) != desc[1]:
            raise ValueError(
                f"Avro fixed({desc[1]}) value has {len(raw)} bytes"
            )
        return raw
    if tag == "array":
        _, ed, e_null, e_ts = desc
        items = list(v)
        out = bytearray()
        if items:
            out += _zigzag_encode(len(items))
            for item in items:
                if e_null:
                    if item is None:
                        out += _zigzag_encode(0)
                        continue
                    out += _zigzag_encode(1)
                elif item is None:
                    raise ValueError("NULL element in non-nullable Avro array")
                out += _encode_datum(ed, e_ts, item)
        out += _zigzag_encode(0)
        return bytes(out)
    if tag == "map":
        _, vd, v_null, v_ts = desc
        entries = sorted(v.items())  # deterministic bytes for equal maps
        out = bytearray()
        if entries:
            out += _zigzag_encode(len(entries))
            for k, item in entries:
                kk = str(k).encode("utf-8")
                out += _zigzag_encode(len(kk)) + kk
                if v_null:
                    if item is None:
                        out += _zigzag_encode(0)
                        continue
                    out += _zigzag_encode(1)
                elif item is None:
                    raise ValueError("NULL value in non-nullable Avro map")
                out += _encode_datum(vd, v_ts, item)
        out += _zigzag_encode(0)
        return bytes(out)
    if tag == "record":
        out = bytearray()
        for name, fd, nullable, f_ts in desc[1]:
            item = v[name]  # Spark Row, dict and namedtuple all index
            if nullable:
                if item is None:
                    out += _zigzag_encode(0)
                    continue
                out += _zigzag_encode(1)
            elif item is None:
                raise ValueError(f"NULL in non-nullable Avro field {name!r}")
            out += _encode_datum(fd, f_ts, item)
        return bytes(out)
    raise NotImplementedError(f"unsupported Avro descriptor {tag!r}")


def _decode_datum(desc, is_ts: bool, buf: bytes, pos: int) -> tuple[Any, int]:
    """Decode one non-null value of descriptor `desc` from `buf`."""
    if isinstance(desc, str):
        v, pos = _decode_value(desc, buf, pos)
        if is_ts and v is not None:
            import datetime

            v = datetime.datetime.fromtimestamp(
                v / 1_000_000, tz=datetime.timezone.utc
            ).replace(tzinfo=None)
        return v, pos
    tag = desc[0]
    if tag == "enum":
        idx, pos = _zigzag_decode(buf, pos)
        symbols = desc[1]
        if not 0 <= idx < len(symbols):
            raise ValueError(
                f"Avro enum index {idx} out of range (|symbols|="
                f"{len(symbols)})"
            )
        return symbols[idx], pos
    if tag == "fixed":
        size = desc[1]
        if pos + size > len(buf):
            raise ValueError(f"truncated Avro fixed({size}) value")
        return bytes(buf[pos : pos + size]), pos + size
    if tag in ("array", "map"):
        _, ed, e_null, e_ts = desc
        out_list: list = []
        out_map: dict = {}
        while True:
            n, pos = _zigzag_decode(buf, pos)
            if n == 0:
                break
            if n < 0:  # negative count: abs count, then block byte size
                n = -n
                _, pos = _zigzag_decode(buf, pos)
            # every item consumes ≥1 byte here (primitives, union branch
            # varints, and nested blocks all do) — a count beyond the
            # remaining buffer is a crafted/corrupt stream, reject it
            # before allocating (fuzz-contract class: memory bombs)
            if n > len(buf) - pos:
                raise ValueError(f"malformed Avro {tag} block count {n}")
            for _ in range(n):
                if tag == "map":
                    k, pos = _decode_value("string", buf, pos)
                if e_null:
                    branch, pos = _zigzag_decode(buf, pos)
                    if branch == 0:
                        item = None
                    elif branch == 1:
                        item, pos = _decode_datum(ed, e_ts, buf, pos)
                    else:
                        raise ValueError(f"bad Avro union branch {branch}")
                else:
                    item, pos = _decode_datum(ed, e_ts, buf, pos)
                if tag == "map":
                    out_map[k] = item
                else:
                    out_list.append(item)
        return (out_map if tag == "map" else out_list), pos
    if tag == "record":
        row: dict = {}
        for name, fd, nullable, f_ts in desc[1]:
            if nullable:
                branch, pos = _zigzag_decode(buf, pos)
                if branch == 0:
                    row[name] = None
                    continue
                if branch != 1:
                    raise ValueError(f"bad Avro union branch {branch}")
            row[name], pos = _decode_datum(fd, f_ts, buf, pos)
        return row, pos
    raise NotImplementedError(f"unsupported Avro descriptor {tag!r}")


# ------------------------------------------------------------- snappy codec


def _snappy_compress(data: bytes) -> bytes:
    """Raw snappy block format, literal-only elements — a valid stream
    any snappy decoder reads (compressors may always emit literals); no
    back-references, so no size win — use deflate when ratio matters."""
    n = len(data)
    out = bytearray()
    while True:  # uncompressed length: little-endian base-128 varint
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            break
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        else:  # tag 61: 2-byte little-endian (length - 1)
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


def _snappy_decompress(buf: bytes) -> bytes:
    """Full raw snappy block format: literals (all four length widths)
    and copy elements with 1/2/4-byte offsets, overlapping-copy
    semantics included. Untrusted input ⇒ every length/offset is
    bounds-checked and malformed streams raise ValueError."""
    pos, n, shift = 0, 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated snappy length preamble")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("malformed snappy length varint")
    out = bytearray()
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                nb = ln - 60  # 1..4 following length bytes
                if pos + nb > len(buf):
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(buf[pos : pos + nb], "little") + 1
                pos += nb
            if pos + ln > len(buf):
                raise ValueError("truncated snappy literal")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if t == 1:  # copy, 1-byte offset
            if pos >= len(buf):
                raise ValueError("truncated snappy copy")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif t == 2:  # copy, 2-byte offset
            if pos + 2 > len(buf):
                raise ValueError("truncated snappy copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            if pos + 4 > len(buf):
                raise ValueError("truncated snappy copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("bad snappy copy offset")
        while ln > 0:  # chunked self-copy handles the overlapping case
            chunk = min(ln, off)
            out += out[len(out) - off : len(out) - off + chunk]
            ln -= chunk
        if len(out) > n:
            raise ValueError("snappy output exceeds declared length")
    if len(out) != n:
        raise ValueError("snappy length mismatch")
    return bytes(out)


def _compress_block(payload: bytes, codec: str) -> bytes:
    if codec == "deflate":  # RAW deflate (RFC 1951), per the spec
        return zlib.compress(payload, 6)[2:-4]
    if codec == "snappy":  # spec: 4-byte big-endian CRC32 of the raw data
        return _snappy_compress(payload) + struct.pack(
            ">I", zlib.crc32(payload)
        )
    return payload


def _decompress_block(payload: bytes, codec: str) -> bytes:
    if codec == "deflate":
        try:
            return zlib.decompressobj(-15).decompress(payload)
        except zlib.error as e:
            raise ValueError(f"corrupt Avro deflate block: {e}") from None
    if codec == "snappy":
        if len(payload) < 4:
            raise ValueError("truncated Avro snappy block (no CRC)")
        raw = _snappy_decompress(payload[:-4])
        if zlib.crc32(raw) != struct.unpack(">I", payload[-4:])[0]:
            raise ValueError("Avro snappy block CRC mismatch")
        return raw
    return payload


# ------------------------------------------------------------ schema maps


def _type_desc(ft: Any, where: str) -> tuple[Any, bool]:
    """JSON type (NOT a union) → (descriptor, is_timestamp_micros)."""
    if isinstance(ft, str):
        if ft == "null":
            # a bare-null field carries no data; reject it loudly instead
            # of leaking a KeyError downstream (ADVICE r10)
            raise NotImplementedError(
                f"{where}: bare 'null' type fields are not supported"
            )
        if ft not in _AVRO_TO_SPARK:
            raise NotImplementedError(
                f"{where}: unsupported Avro type {ft!r}"
            )
        return ft, False
    if isinstance(ft, dict):
        kind = ft.get("type")
        if ft.get("logicalType") == "timestamp-micros" and kind == "long":
            return "long", True
        if ft.get("logicalType") == "timestamp-millis" and kind == "long":
            return "ts_millis", False
        if ft.get("logicalType") == "uuid" and kind == "string":
            # annotation-only logical type (the spec: underlying string)
            return "string", False
        if ft.get("logicalType") == "date" and kind == "int":
            return "date", False
        if ft.get("logicalType") == "decimal" and kind == "bytes":
            p, s = ft.get("precision"), ft.get("scale", 0)
            if not isinstance(p, int) or not isinstance(s, int) \
                    or not 0 < p <= 38 or not 0 <= s <= p:
                raise ValueError(
                    f"{where}: invalid Avro decimal precision/scale "
                    f"({p}, {s})"
                )
            return f"decimal({p},{s})", False
        if kind == "array":
            ed, e_null, e_ts = _branch_desc(ft.get("items"), f"{where} items")
            return ("array", ed, e_null, e_ts), False
        if kind == "map":
            vd, v_null, v_ts = _branch_desc(ft.get("values"), f"{where} values")
            return ("map", vd, v_null, v_ts), False
        if kind == "record":
            fields = ft.get("fields")
            if not isinstance(fields, list) or not fields:
                raise ValueError(f"{where}: malformed nested record schema")
            return ("record", [_field_spec(f) for f in fields]), False
        if kind == "enum":
            symbols = ft.get("symbols")
            if (
                not isinstance(symbols, list)
                or not symbols
                or not all(isinstance(s, str) for s in symbols)
                or len(set(symbols)) != len(symbols)
            ):
                raise ValueError(
                    f"{where}: malformed Avro enum symbols {symbols!r}"
                )
            return ("enum", tuple(symbols)), False
        if kind == "fixed":
            size = ft.get("size")
            if not isinstance(size, int) or size < 0:
                raise ValueError(f"{where}: malformed Avro fixed size {size!r}")
            return ("fixed", size), False
        raise NotImplementedError(
            f"{where}: unsupported complex/logical type {ft}"
        )
    raise ValueError(f"{where}: malformed Avro type {ft!r}")


def _branch_desc(ft: Any, where: str) -> tuple[Any, bool, bool]:
    """A possibly-``["null", T]``-union type → (desc, nullable, is_ts)."""
    nullable = False
    if isinstance(ft, list):
        non_null = [t for t in ft if t != "null"]
        if len(ft) != 2 or len(non_null) != 1:
            raise NotImplementedError(
                f"{where}: only [null, T] unions supported, got {ft}"
            )
        nullable = True
        ft = non_null[0]
    desc, is_ts = _type_desc(ft, where)
    return desc, nullable, is_ts


def _field_spec(avro_field: dict) -> tuple[str, Any, bool, bool]:
    """(name, descriptor, nullable, is_timestamp_micros)."""
    if (
        not isinstance(avro_field, dict)
        or "name" not in avro_field
        or "type" not in avro_field
    ):
        raise ValueError(f"malformed Avro field spec {avro_field!r}")
    name = avro_field["name"]
    desc, nullable, is_ts = _branch_desc(
        avro_field["type"], f"field {name!r}"
    )
    return name, desc, nullable, is_ts


def _avro_type_of(dt: T.DataType, where: str) -> Any:
    """Spark type → Avro JSON type (recursive)."""
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    prim = _SPARK_TO_AVRO.get(dt)
    if prim is not None:
        return prim
    if isinstance(dt, T.ArrayType):
        et = _avro_type_of(dt.elementType, f"{where} element")
        return {
            "type": "array",
            "items": ["null", et] if dt.containsNull else et,
        }
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise NotImplementedError(
                f"{where}: Avro maps require string keys, got {dt.keyType}"
            )
        vt = _avro_type_of(dt.valueType, f"{where} value")
        return {
            "type": "map",
            "values": ["null", vt] if dt.valueContainsNull else vt,
        }
    if isinstance(dt, T.StructType):
        # Avro named types must be unique within a schema; derive the
        # nested record name from its path, sanitized to the spec's
        # [A-Za-z_][A-Za-z0-9_]* name grammar
        rec_name = "".join(
            c if c.isalnum() or c == "_" else "_" for c in (where or "row")
        )
        if not rec_name or rec_name[0].isdigit():
            rec_name = f"r_{rec_name}"
        return {
            "type": "record",
            "name": rec_name,
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", _avro_type_of(f.dataType, f"{where}_{f.name}")]
                    if f.nullable
                    else _avro_type_of(f.dataType, f"{where}_{f.name}"),
                }
                for f in dt.fields
            ],
        }
    raise NotImplementedError(f"{where}: no Avro mapping for {dt}")


def avro_schema_of(df: DataFrame, name: str = "row") -> str:
    """The Avro record schema (JSON) for a Spark DataFrame — primitives,
    timestamps, and (round 11) arrays / string-keyed maps / nested
    structs, recursively."""
    fields = []
    for f in df.schema.fields:
        at = _avro_type_of(f.dataType, f"col_{f.name}")
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return json.dumps(
        {"type": "record", "name": name, "fields": fields}, separators=(",", ":")
    )


def _parse_record_schema(avro_json: str) -> list:
    """Validated field list of a top-level record schema — untrusted
    input, so malformed JSON / non-object / missing fields raise
    ValueError rather than json or Key/Type errors."""
    try:
        sch = json.loads(avro_json)
    except ValueError as e:
        raise ValueError(f"malformed Avro schema JSON: {e}") from None
    if not isinstance(sch, dict):
        raise ValueError("malformed Avro schema (not a JSON object)")
    if sch.get("type") != "record":
        raise NotImplementedError(
            f"only top-level record schemas supported, got {sch.get('type')!r}"
        )
    fields = sch.get("fields")
    if not isinstance(fields, list):
        raise ValueError("malformed Avro record schema (no fields list)")
    if not fields:
        # a zero-field record makes every row zero-width: block row
        # counts become unbounded by payload size (memory-bomb class)
        raise ValueError("Avro record schema has no fields")
    return fields


def _spark_type_of(desc: Any, is_ts: bool) -> T.DataType:
    if is_ts:
        return T.TimestampType()
    if isinstance(desc, str):
        if desc == "date":
            return T.DateType()
        if desc == "ts_millis":
            return T.TimestampType()
        if desc.startswith("decimal("):
            p, s = _decimal_args(desc)
            return T.DecimalType(p, s)
        return _AVRO_TO_SPARK[desc]
    tag = desc[0]
    if tag == "enum":
        return T.StringType()
    if tag == "fixed":
        return T.BinaryType()
    if tag == "array":
        return T.ArrayType(_spark_type_of(desc[1], desc[3]), desc[2])
    if tag == "map":
        return T.MapType(
            T.StringType(), _spark_type_of(desc[1], desc[3]), desc[2]
        )
    if tag == "record":
        return T.StructType(
            [
                T.StructField(n, _spark_type_of(d, ts), nul)
                for n, d, nul, ts in desc[1]
            ]
        )
    raise NotImplementedError(f"unsupported Avro descriptor {tag!r}")


def spark_schema_of(avro_json: str) -> T.StructType:
    """The Spark schema for an Avro record schema (JSON)."""
    out = []
    for f in _parse_record_schema(avro_json):
        name, desc, nullable, is_ts = _field_spec(f)
        out.append(T.StructField(name, _spark_type_of(desc, is_ts), nullable))
    return T.StructType(out)


# ------------------------------------------------------------- OCF writer


def _encode_meta_map(meta: dict[str, bytes]) -> bytes:
    out = bytearray(_zigzag_encode(len(meta)))
    for k, v in meta.items():
        kk = k.encode()
        out += _zigzag_encode(len(kk)) + kk
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)
    return bytes(out)


def _write_ocf(
    fh, rows, field_specs, avro_json: str, codec: str, block_records: int = 4096
) -> None:
    """Stream an iterable of Row/tuple-like records to a writable binary
    file object, one OCF block per ``block_records`` rows — peak memory
    is one encoded block, never the whole partition (VERDICT r10 item
    3). Rows are accessed by field NAME (Spark Row / dict / pandas
    namedtuple all work)."""
    if codec not in _CODECS:
        raise NotImplementedError(f"unsupported Avro codec {codec!r}")
    fh.write(
        _MAGIC
        + _encode_meta_map(
            {"avro.schema": avro_json.encode(), "avro.codec": codec.encode()}
        )
        + _SYNC
    )
    block = bytearray()
    n_in_block = 0

    def flush() -> None:
        nonlocal block, n_in_block
        if not n_in_block:
            return
        payload = _compress_block(bytes(block), codec)
        fh.write(
            _zigzag_encode(n_in_block)
            + _zigzag_encode(len(payload))
            + payload
            + _SYNC
        )
        block = bytearray()
        n_in_block = 0

    for row in rows:
        for name, desc, nullable, is_ts in field_specs:
            v = row[name]
            if nullable:
                if v is None:
                    block.extend(_zigzag_encode(0))  # union branch: null
                    continue
                block.extend(_zigzag_encode(1))  # union branch: value
            elif v is None:
                raise ValueError(f"NULL in non-nullable Avro field {name!r}")
            block.extend(_encode_datum(desc, is_ts, v))
        n_in_block += 1
        if n_in_block >= block_records:
            flush()
    flush()


def _encode_ocf(
    rows, field_specs, avro_json: str, codec: str, block_records: int = 4096
) -> bytes:
    """Serialize an iterable of records to one OCF byte string (the
    in-memory convenience wrapper over the streaming `_write_ocf`)."""
    buf = io.BytesIO()
    _write_ocf(buf, rows, field_specs, avro_json, codec, block_records)
    return buf.getvalue()


def _decode_ocf(buf: bytes):
    """Parse one OCF byte string → (avro_schema_json, list of row dicts)."""
    if buf[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")

    def read_len(pos: int, what: str) -> tuple[int, int]:
        # a NEGATIVE length would walk `pos` backwards and loop forever
        # on crafted input (found by the round-10 fuzz sweep)
        n, pos = _zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError(f"malformed Avro {what} length {n}")
        return n, pos

    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative count: abs count + following byte size
            n = -n
            _, pos = _zigzag_decode(buf, pos)
        for _ in range(n):
            kl, pos = read_len(pos, "metadata key")
            k = buf[pos : pos + kl].decode(errors="replace")
            pos += kl
            vl, pos = read_len(pos, "metadata value")
            meta[k] = bytes(buf[pos : pos + vl])
            pos += vl
    if "avro.schema" not in meta:
        raise ValueError("Avro file metadata lacks avro.schema")
    avro_json = meta["avro.schema"].decode()
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in _CODECS:
        raise NotImplementedError(f"unsupported Avro codec {codec!r}")
    sync = buf[pos : pos + 16]
    pos += 16
    specs = [_field_spec(f) for f in _parse_record_schema(avro_json)]
    rows: list[dict] = []
    while pos < len(buf):
        n, pos = _zigzag_decode(buf, pos)
        size, pos = _zigzag_decode(buf, pos)
        if size < 0 or pos + size + 16 > len(buf):
            raise ValueError("truncated Avro data block")
        payload = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("Avro block sync-marker mismatch (corrupt file)")
        pos += 16
        payload = _decompress_block(payload, codec)
        # every row consumes ≥1 byte of payload (all supported field
        # shapes emit at least a varint); a count beyond the payload is
        # crafted/corrupt — reject before the decode loop allocates
        if n < 0 or (n > len(payload) and specs):
            raise ValueError(f"malformed Avro block row count {n}")
        bp = 0
        for _ in range(n):
            row = {}
            for name, desc, nullable, is_ts in specs:
                if nullable:
                    branch, bp = _zigzag_decode(payload, bp)
                    if branch == 0:
                        row[name] = None
                        continue
                    if branch != 1:
                        raise ValueError(f"bad Avro union branch {branch}")
                row[name], bp = _decode_datum(desc, is_ts, payload, bp)
            rows.append(row)
    return avro_json, rows


# ----------------------------------------------------------- Spark plumbing


def write_avro(
    df: DataFrame, path: str, codec: str = "deflate", block_records: int = 4096
) -> None:
    """Avro OCF sink: one ``part-NNNNN.avro`` file per partition, STREAMED
    block-by-block from the executors through the local filesystem API
    (see module docstring for the storage-layer boundary). ``codec`` is
    ``deflate`` (default), ``snappy`` (literal-only encode — interop,
    not ratio) or ``null``. Write throughput note: encoding is Python
    row-at-a-time (inherent without the spark-avro jar); prefer parquet
    for hot-path sinks and this for interchange."""
    avro_json = avro_schema_of(df)
    specs = [_field_spec(jf) for jf in json.loads(avro_json)["fields"]]
    os.makedirs(path, exist_ok=True)

    def write_partition(idx: int, rows) -> Any:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return iter(())  # empty partition → no file
        import itertools

        tmp = f"{path}/.part-{idx:05d}.avro.tmp"
        with open(tmp, "wb") as fh:
            _write_ocf(
                fh, itertools.chain([first], it), specs, avro_json, codec,
                block_records,
            )
        os.replace(tmp, f"{path}/part-{idx:05d}.avro")
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_partition).count()
    open(os.path.join(path, "_SUCCESS"), "w").close()


def _rows_to_pdf(rows: list[dict], specs, cols: list[str]):
    """Decoded row dicts → a pandas frame whose integer columns use
    nullable Int32/Int64 extension arrays. ``pd.DataFrame(list-of-dicts)``
    inference coerces an int column containing a None to float64, which
    silently corrupts longs above 2**53 (ADVICE r10, medium). Everything
    non-integer rides object dtype — Arrow casts per the declared Spark
    schema."""
    import pandas as pd

    data = {}
    for name, desc, _nullable, is_ts in specs:
        vals = [r[name] for r in rows]
        if desc == "long" and not is_ts:
            data[name] = pd.array(vals, dtype="Int64")
        elif desc == "int":
            data[name] = pd.array(vals, dtype="Int32")
        else:
            data[name] = pd.Series(vals, dtype=object)
    return pd.DataFrame(data, columns=cols)


def read_avro(
    spark: SparkSession,
    path: str,
    avro_schema: str | None = None,
    row_id: bool = False,
) -> DataFrame:
    """Avro OCF scan: ``binaryFile`` lists and ships the ``.avro`` part
    files to executors (one file per task — container blocks share a
    file-level sync marker, so the file is the natural split unit here);
    an Arrow-batched ``mapInPandas`` stage decodes them. Pass
    ``avro_schema`` (the record schema JSON) to skip the driver-side
    header read of one file."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro") if os.path.isdir(path) else path
    )
    if avro_schema is None:
        first = files.select("content").limit(1).collect()
        if not first:
            raise ValueError(f"no .avro files under {path!r}")
        avro_schema, _ = _decode_ocf(bytes(first[0]["content"]))
    out_schema = spark_schema_of(avro_schema)
    cols = [f.name for f in out_schema.fields]
    expected = avro_schema

    def run(batches):
        reader_specs = [_field_spec(f)
                        for f in _parse_record_schema(expected)]
        for pdf in batches:
            for content in pdf["content"]:
                got, rows = _decode_ocf(bytes(content))
                if json.loads(got) != json.loads(expected):
                    rows = _resolve_rows(rows, got, reader_specs)
                yield _rows_to_pdf(rows, reader_specs, cols)

    df = files.select("content").mapInPandas(run, schema=out_schema)
    if row_id:
        from .io import with_row_id

        return with_row_id(df)
    return df


# the spec's numeric promotion lattice (writer type -> allowed reader types)
_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
}


def _resolve_rows(rows: list[dict], writer_json: str, reader_specs) -> list[dict]:
    """Reader-schema resolution per the Avro spec's evolution rules
    (round 10): fields match by NAME; writer-only fields are dropped
    (they were already decoded — container blocks cannot be skipped
    field-wise); reader-only fields fill with null when the reader
    declares them nullable (this module's stand-in for field defaults)
    and raise otherwise; int→long→float→double promotions apply to
    primitive fields. Complex (array/map/record) fields must match the
    reader descriptor exactly — element-wise evolution is out of scope
    and raises. Lets a directory mix part files written under compatible
    schema versions — the normal state of a long-lived dataset."""
    writer = {}
    for f in _parse_record_schema(writer_json):
        name, desc, nullable, is_ts = _field_spec(f)
        writer[name] = (desc, nullable, is_ts)
    out = []
    plan = []
    for name, rt, r_nullable, r_ts in reader_specs:
        w = writer.get(name)
        if w is None:
            if not r_nullable:
                raise ValueError(
                    f"Avro evolution: reader field {name!r} is non-nullable "
                    f"and absent from a part file's writer schema"
                )
            plan.append((name, None))
            continue
        wt, _w_nullable, w_ts = w
        both_prim = isinstance(wt, str) and isinstance(rt, str)
        if w_ts != r_ts or (
            wt != rt
            and not (both_prim and rt in _PROMOTIONS.get(wt, ()))
        ):
            raise ValueError(
                f"Avro evolution: field {name!r} written as {wt!r} cannot "
                f"be read as {rt!r}"
            )
        caster = (
            float
            if both_prim and rt in ("float", "double") and wt != rt
            else None
        )
        plan.append((name, ("copy", caster)))
    for row in rows:
        o = {}
        for name, action in plan:
            if action is None:
                o[name] = None
            else:
                v = row[name]
                o[name] = action[1](v) if (action[1] and v is not None) else v
        out.append(o)
    return out
