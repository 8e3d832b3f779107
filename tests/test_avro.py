"""Avro OCF source/sink tests (round 10): Spark round-trips through the
pure-Python wire-format implementation, a FORWARD-built spec stream (the
decoder is tested against hand-assembled bytes, not our own encoder),
and the malformed-input / unsupported-feature guards."""

import datetime
import json

import pytest

from dataforge_spark.avro import (
    _MAGIC,
    _decode_ocf,
    _zigzag_decode,
    _zigzag_encode,
    read_avro,
    spark_schema_of,
    write_avro,
)


def test_zigzag_varint_roundtrip():
    for n in (0, 1, -1, 2, -2, 63, 64, -64, -65, 2**31, -(2**31),
              2**62, -(2**62), 12345678901234):
        buf = _zigzag_encode(n)
        got, pos = _zigzag_decode(buf, 0)
        assert got == n and pos == len(buf)
    with pytest.raises(ValueError, match="truncated"):
        _zigzag_decode(b"\xff", 0)  # continuation bit set, no next byte


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_spark_roundtrip(spark, tmp_path, codec):
    """All supported types incl. nullable columns, timestamps (naive,
    UTC convention) and binary, through write_avro -> read_avro."""
    rows = [
        (1, "alpha", 1.5, True, bytearray(b"\x00\xff"),
         datetime.datetime(2024, 1, 2, 3, 4, 5, 123456), 7),
        (2, None, -2.25, False, bytearray(b""),
         datetime.datetime(2024, 6, 1, 0, 0, 0), None),
    ]
    ddl = ("id bigint, name string, score double, flag boolean, "
           "blob binary, ts timestamp, maybe bigint")
    df = spark.createDataFrame(rows, ddl)
    path = str(tmp_path / f"avro_{codec}")
    write_avro(df, path, codec=codec)
    back = read_avro(spark, path)
    assert [f.simpleString() for f in back.schema.fields] == [
        f.simpleString() for f in df.schema.fields
    ]
    got = sorted(back.collect(), key=lambda r: r["id"])
    exp = sorted(df.collect(), key=lambda r: r["id"])
    for g, e in zip(got, exp):
        assert g["name"] == e["name"] and g["maybe"] == e["maybe"]
        assert g["score"] == e["score"] and g["flag"] == e["flag"]
        assert bytes(g["blob"] or b"") == bytes(e["blob"] or b"")
        assert g["ts"] == e["ts"]


def test_avro_multi_partition_and_schema_arg(spark, tmp_path):
    """One part file per non-empty partition; explicit avro_schema skips
    the driver-side header read; empty partitions write nothing."""
    df = spark.range(0, 1000).withColumnRenamed("id", "n").repartition(8)
    path = str(tmp_path / "avro_parts")
    write_avro(df, path, codec="deflate")
    import glob
    import os

    parts = glob.glob(os.path.join(path, "part-*.avro"))
    assert 1 <= len(parts) <= 8
    schema = json.dumps({
        "type": "record", "name": "row",
        "fields": [{"name": "n", "type": "long"}],
    })
    back = read_avro(spark, path, avro_schema=schema)
    assert back.count() == 1000
    assert back.agg({"n": "sum"}).collect()[0][0] == 999 * 1000 // 2


def test_avro_forward_built_spec_stream(spark, tmp_path):
    """Hand-assembled OCF bytes (spec, not our encoder): 2-field record,
    null codec, one block of two rows. zigzag: 1→0x02, -2→0x03,
    len 2→0x04, len 1→0x02."""
    schema = b'{"type":"record","name":"r","fields":[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    sync = bytes(range(100, 116))
    meta = (
        _zigzag_encode(2)
        + _zigzag_encode(len(b"avro.schema")) + b"avro.schema"
        + _zigzag_encode(len(schema)) + schema
        + _zigzag_encode(len(b"avro.codec")) + b"avro.codec"
        + _zigzag_encode(4) + b"null"
        + _zigzag_encode(0)
    )
    payload = b"\x02\x04hi" + b"\x03\x02x"  # (1,"hi"), (-2,"x")
    buf = (
        _MAGIC + meta + sync
        + _zigzag_encode(2) + _zigzag_encode(len(payload)) + payload + sync
    )
    got_schema, rows = _decode_ocf(buf)
    assert json.loads(got_schema)["name"] == "r"
    assert rows == [{"a": 1, "b": "hi"}, {"a": -2, "b": "x"}]

    # and through the full Spark read path
    f = tmp_path / "fwd" ; f.mkdir()
    (f / "part-00000.avro").write_bytes(buf)
    back = read_avro(spark, str(f))
    assert sorted((r["a"], r["b"]) for r in back.collect()) == [(-2, "x"), (1, "hi")]


def test_avro_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="bad magic"):
        _decode_ocf(b"NOPE" + b"\x00" * 32)

    # corrupt sync marker between blocks
    df = spark.range(0, 10).withColumnRenamed("id", "n").coalesce(1)
    path = str(tmp_path / "sync")
    write_avro(df, path, codec="null")
    import glob

    part = glob.glob(f"{path}/part-*.avro")[0]
    raw = bytearray(open(part, "rb").read())
    raw[-1] ^= 0xFF  # last byte of the trailing block sync
    with pytest.raises(ValueError, match="sync-marker mismatch"):
        _decode_ocf(bytes(raw))

    # unsupported codec in metadata (patch "null" -> "zstd", same length
    # so the zigzag prefix 0x08 stays valid; snappy is SUPPORTED as of
    # round 11)
    buf = bytearray(open(part, "rb").read())
    buf = buf.replace(b"\x08null", b"\x08zstd", 1)
    with pytest.raises(NotImplementedError, match="zstd"):
        _decode_ocf(bytes(buf))

    # enum is SUPPORTED as of round 11 (decodes to its symbol string);
    # an unknown logical type still fails loudly
    enum = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "x", "type": {"type": "enum", "name": "e",
                                          "symbols": ["A", "B"]}}],
    })
    assert spark_schema_of(enum)["x"].dataType.simpleString() == "string"
    tm = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "x", "type": {"type": "long",
                                          "logicalType": "time-micros"}}],
    })
    with pytest.raises(NotImplementedError, match="complex"):
        spark_schema_of(tm)

    # bare-null field type: clean error, not a KeyError (ADVICE r10)
    bare_null = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "x", "type": "null"}],
    })
    with pytest.raises(NotImplementedError, match="null"):
        spark_schema_of(bare_null)



def test_avro_null_in_non_nullable_raises(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "a bigint")
    # forge a non-nullable schema but feed a NULL through the writer path
    from dataforge_spark.avro import _encode_ocf

    with pytest.raises(ValueError, match="non-nullable"):
        _encode_ocf([{"a": None}], [("a", "long", False, False)],
                    '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}',
                    "null")


def test_avro_cli_e2e(tmp_path):
    """CLI: clean a CSV into .avro, then profile the .avro back."""
    import subprocess
    import sys

    src = tmp_path / "in.csv"
    src.write_text("a,b\n1,x\n2,\n2,\n,y\n")
    out = str(tmp_path / "out.avro")
    r = subprocess.run(
        [sys.executable, "-m", "dataforge_spark", "clean",
         "--input", str(src),
         "--ops", '{"duplicates": {"enabled": true}}',
         "--output", out],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "dataforge_spark", "profile", "--input", out],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    prof = json.loads(r2.stdout)
    assert prof["shape"]["rows"] == 3  # one duplicate dropped


def test_avro_fuzz_contract():
    """Untrusted-input contract: _decode_ocf raises only ValueError /
    NotImplementedError on malformed bytes — and TERMINATES. The
    round-10 fuzz sweep found a genuine non-termination class (negative
    varint lengths walking the cursor backwards through the metadata
    map), plus Key/Index/zlib.error leaks via mutated-but-valid-JSON
    schemas, truncated fixed-width values and corrupt deflate blocks;
    all fixed, this pins them (seeded, 300 mutations per codec)."""
    import numpy as np

    from dataforge_spark.avro import _encode_ocf

    specs = [("a", "long", False, False), ("b", "string", True, False),
             ("c", "double", False, False), ("e", "boolean", False, False),
             ("xs", ("array", "float", True, False), True, False)]
    schema = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "b", "type": ["null", "string"]},
                   {"name": "c", "type": "double"},
                   {"name": "e", "type": "boolean"},
                   {"name": "xs", "type": ["null", {
                       "type": "array", "items": ["null", "float"]}]}],
    })
    rows = [{"a": i, "b": None if i % 3 == 0 else f"s{i}", "c": i * 1.5,
             "e": bool(i % 2),
             "xs": None if i % 5 == 0 else [float(j) if j % 2 else None
                                            for j in range(i % 4)]}
            for i in range(20)]
    r = np.random.default_rng(7)
    for codec in ("null", "deflate", "snappy"):
        seed = _encode_ocf(rows, specs, schema, codec)
        for _ in range(300):
            m = bytearray(seed)
            for _ in range(r.integers(1, 4)):
                op = r.integers(0, 3)
                if op == 0 and len(m) > 1:
                    m[r.integers(0, len(m))] = r.integers(0, 256)
                elif op == 1 and len(m) > 4:
                    m = m[: r.integers(1, len(m))]
                else:
                    i = r.integers(0, len(m))
                    m[i:i] = bytes(r.integers(0, 256, size=r.integers(1, 5),
                                              dtype=np.uint8).tolist())
            try:
                _decode_ocf(bytes(m))
            except (ValueError, NotImplementedError):
                pass  # the contract


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_avro_wire_roundtrip_property(data):
    """Property: any flat record of supported primitives (with random
    nullability and values, both codecs) survives _encode_ocf →
    _decode_ocf bit-exactly — pure wire-format check, no Spark."""
    from dataforge_spark.avro import _decode_ocf, _encode_ocf

    types = {
        "long": st.integers(-(2**63), 2**63 - 1),
        "int": st.integers(-(2**31), 2**31 - 1),
        "double": st.floats(allow_nan=False, width=64),
        "float": st.floats(allow_nan=False, width=32),
        "boolean": st.booleans(),
        "string": st.text(max_size=20),
        "bytes": st.binary(max_size=20),
    }
    n_fields = data.draw(st.integers(1, 5))
    specs = []
    fields_json = []
    for i in range(n_fields):
        t = data.draw(st.sampled_from(sorted(types)))
        nullable = data.draw(st.booleans())
        specs.append((f"f{i}", t, nullable, False))
        fields_json.append(
            {"name": f"f{i}", "type": ["null", t] if nullable else t}
        )
    schema = json.dumps({"type": "record", "name": "r", "fields": fields_json})
    n_rows = data.draw(st.integers(0, 8))
    rows = []
    for _ in range(n_rows):
        row = {}
        for name, t, nullable, _ in specs:
            if nullable and data.draw(st.booleans()):
                row[name] = None
            else:
                row[name] = data.draw(types[t])
        rows.append(row)
    codec = data.draw(st.sampled_from(["null", "deflate"]))
    got_schema, got = _decode_ocf(_encode_ocf(rows, specs, schema, codec))
    assert json.loads(got_schema) == json.loads(schema)
    assert len(got) == len(rows)
    for g, e in zip(got, rows):
        for name, t, _n, _ts in specs:
            if t == "float" and e[name] is not None:
                import struct as _struct

                assert g[name] == _struct.unpack("<f", _struct.pack("<f", e[name]))[0]
            else:
                assert g[name] == e[name], (name, t)


def test_avro_schema_evolution_across_part_files(spark, tmp_path):
    """Round 10: a directory mixing part files from compatible schema
    versions reads under the newest (reader) schema — old files'
    missing nullable column fills with NULL, int widens to long, and
    writer-only columns are dropped; a non-nullable reader field absent
    from a writer raises."""
    import glob
    import os
    import shutil

    v1 = spark.createDataFrame([(1, 10), (2, 20)], "a int, extra int")
    v2 = spark.createDataFrame([(3, "x")], "a bigint, b string")
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "dataset")
    write_avro(v1.coalesce(1), p1, codec="null")
    write_avro(v2.coalesce(1), p2, codec="null")
    shutil.copy(glob.glob(f"{p1}/part-*.avro")[0],
                os.path.join(p2, "part-00009.avro"))

    reader = json.dumps({
        "type": "record", "name": "row",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "b", "type": ["null", "string"]}],
    })
    got = sorted(
        (r["a"], r["b"]) for r in read_avro(spark, p2, avro_schema=reader).collect()
    )
    assert got == [(1, None), (2, None), (3, "x")]

    # non-nullable reader field absent from the v1 writer: loud failure
    strict = json.dumps({
        "type": "record", "name": "row",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "b", "type": "string"}],
    })
    with pytest.raises(Exception, match="non-nullable"):
        read_avro(spark, p2, avro_schema=strict).collect()

    # incompatible change (long -> int narrowing) is rejected
    narrow = json.dumps({
        "type": "record", "name": "row",
        "fields": [{"name": "a", "type": "int"},
                   {"name": "b", "type": ["null", "string"]}],
    })
    with pytest.raises(Exception, match="cannot"):
        read_avro(spark, p2, avro_schema=narrow).collect()


# ---------------------------------------------------------------- round 11


def test_avro_complex_types_spark_roundtrip(spark, tmp_path):
    """Arrays (incl. nullable elements), string-keyed maps and nested
    records round-trip through write_avro -> read_avro with schema
    fidelity (VERDICT r10 task 2)."""
    import pyspark.sql.functions as F

    rows = [
        (1, [1.5, -2.25], {"a": 10, "b": None}, (7, "x"), [None, "s"]),
        (2, [], {}, (8, None), []),
        (3, None, None, None, None),
    ]
    ddl = (
        "id bigint, emb array<float>, m map<string,bigint>, "
        "rec struct<p: bigint, q: string>, tags array<string>"
    )
    df = spark.createDataFrame(rows, ddl)
    path = str(tmp_path / "complex")
    write_avro(df, path, codec="deflate")
    back = read_avro(spark, path)
    assert back.schema == df.schema
    got = sorted(back.collect(), key=lambda r: r["id"])
    exp = sorted(df.collect(), key=lambda r: r["id"])
    assert got == exp
    # and an explicit-reader pass over the same schema JSON
    from dataforge_spark.avro import avro_schema_of

    back2 = read_avro(spark, path, avro_schema=avro_schema_of(df))
    assert back2.count() == 3


def test_avro_embeddings_table_roundtrip(spark, tmp_path):
    """The driver's embeddings table (vec_id bigint, embedding
    array<float>, label int) round-trips value-identically — the VERDICT
    r10 'done =' criterion for the Avro array work."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "emb_avro")
    write_avro(emb, path, codec="snappy")
    back = read_avro(spark, path)
    assert back.schema == emb.schema

    def fingerprint(df):
        return sorted(
            (r["vec_id"], r["label"], tuple(r["embedding"]))
            for r in df.collect()
        )

    assert fingerprint(back) == fingerprint(emb)


def test_avro_long_precision_with_nulls(spark, tmp_path):
    """ADVICE r10 (medium): a nullable long column must not round-trip
    through float64 — 2**53 + 1 must survive exactly when a None is
    present in the same column."""
    big = 9007199254740993  # 2**53 + 1: float64 rounds it to ...992
    df = spark.createDataFrame(
        [(1, big), (2, None), (3, -big)], "id bigint, v bigint"
    )
    path = str(tmp_path / "precision")
    write_avro(df, path, codec="null")
    got = {r["id"]: r["v"] for r in read_avro(spark, path).collect()}
    assert got == {1: big, 2: None, 3: -big}


def test_avro_snappy_roundtrip_and_wire(spark, tmp_path):
    """snappy codec (VERDICT r10 task 7): Spark round-trip, a
    hand-assembled raw-snappy stream exercising copy elements (incl.
    the overlapping-copy rule), and the CRC guard."""
    from dataforge_spark.avro import (
        _snappy_compress,
        _snappy_decompress,
        _encode_ocf,
    )

    # literal-only encoder output decodes back bit-exactly
    for data in (b"", b"x", b"hello snappy" * 1000, bytes(range(256)) * 300):
        assert _snappy_decompress(_snappy_compress(data)) == data

    # hand-built stream: literal "ab" then an overlapping copy
    # (offset 2, length 6) => "ab" + "ababab" = "abababab"
    stream = bytes([8]) + bytes([(2 - 1) << 2]) + b"ab" + bytes(
        [((6 - 4) << 2) | 1, 2]  # tag-1 copy: len 6, offset 2
    )
    assert _snappy_decompress(stream) == b"abababab"

    # malformed: offset beyond output
    bad = bytes([4]) + bytes([(1 - 1) << 2]) + b"a" + bytes([(0 << 2) | 1, 9])
    with pytest.raises(ValueError):
        _snappy_decompress(bad)

    # Spark round-trip under codec="snappy"
    df = spark.createDataFrame(
        [(i, f"s{i}" * 20) for i in range(500)], "id bigint, s string"
    )
    path = str(tmp_path / "snappy")
    write_avro(df, path, codec="snappy")
    back = read_avro(spark, path)
    assert back.count() == 500
    assert back.agg({"id": "sum"}).collect()[0][0] == 499 * 500 // 2

    # CRC guard: flip a byte inside the block payload
    import glob

    part = glob.glob(f"{path}/part-*.avro")[0]
    raw = bytearray(open(part, "rb").read())
    raw[-30] ^= 0xFF  # inside the final block's compressed payload
    with pytest.raises(ValueError):
        _decode_ocf(bytes(raw))


def test_avro_sink_streams_blocks(tmp_path, monkeypatch):
    """VERDICT r10 task 3: the sink writes block-by-block — the largest
    single write is ~one encoded block, not the whole partition."""
    from dataforge_spark.avro import _write_ocf

    class SpyFile:
        def __init__(self):
            self.writes = []
            self.parts = []

        def write(self, b):
            self.writes.append(len(b))
            self.parts.append(bytes(b))
            return len(b)

    rows = [{"a": i, "b": "x" * 50} for i in range(1000)]
    specs = [("a", "long", False, False), ("b", "string", False, False)]
    schema = json.dumps({
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "b", "type": "string"}],
    })
    fh = SpyFile()
    _write_ocf(fh, rows, specs, schema, codec="null", block_records=100)
    # header + 10 block writes; no write holds more than one block
    assert len(fh.writes) == 11
    one_row = 1 + 52  # varint(a) ≈1 + len-prefixed 50-char string
    assert max(fh.writes[1:]) < 100 * (one_row + 4) + 64
    # and the concatenated stream is a valid OCF
    _, got = _decode_ocf(b"".join(fh.parts))
    assert len(got) == 1000 and got[0] == {"a": 0, "b": "x" * 50}


def test_avro_nested_record_forward_built_stream():
    """Hand-assembled OCF bytes for a NESTED record (spec, not our
    encoder): outer record {id long, inner {p long, q string}} —
    the decoder maps it to nested dicts."""
    schema = (
        b'{"type":"record","name":"o","fields":['
        b'{"name":"id","type":"long"},'
        b'{"name":"inner","type":{"type":"record","name":"i","fields":['
        b'{"name":"p","type":"long"},{"name":"q","type":"string"}]}}]}'
    )
    sync = bytes(range(50, 66))
    meta = (
        _zigzag_encode(2)
        + _zigzag_encode(len(b"avro.schema")) + b"avro.schema"
        + _zigzag_encode(len(schema)) + schema
        + _zigzag_encode(len(b"avro.codec")) + b"avro.codec"
        + _zigzag_encode(4) + b"null"
        + _zigzag_encode(0)
    )
    # row: id=5, inner=(p=-3, q="hi") => zigzag(5)=0x0a, zigzag(-3)=0x05,
    # len2=0x04
    payload = b"\x0a" + b"\x05" + b"\x04hi"
    buf = (
        _MAGIC + meta + sync
        + _zigzag_encode(1) + _zigzag_encode(len(payload)) + payload + sync
    )
    got_schema, rows = _decode_ocf(buf)
    assert rows == [{"id": 5, "inner": {"p": -3, "q": "hi"}}]


def test_avro_array_forward_built_stream():
    """Hand-assembled array encoding including a NEGATIVE-count block
    with a byte size (writers may emit those; ours doesn't)."""
    schema = (
        b'{"type":"record","name":"o","fields":['
        b'{"name":"xs","type":{"type":"array","items":"long"}}]}'
    )
    sync = bytes(range(16, 32))
    meta = (
        _zigzag_encode(2)
        + _zigzag_encode(len(b"avro.schema")) + b"avro.schema"
        + _zigzag_encode(len(schema)) + schema
        + _zigzag_encode(len(b"avro.codec")) + b"avro.codec"
        + _zigzag_encode(4) + b"null"
        + _zigzag_encode(0)
    )
    # array in two blocks: [1,2] then negative-count block [-3] then end
    items1 = _zigzag_encode(1) + _zigzag_encode(2)
    items2 = _zigzag_encode(-3)
    payload = (
        _zigzag_encode(2) + items1
        + _zigzag_encode(-1) + _zigzag_encode(len(items2)) + items2
        + _zigzag_encode(0)
    )
    buf = (
        _MAGIC + meta + sync
        + _zigzag_encode(1) + _zigzag_encode(len(payload)) + payload + sync
    )
    _, rows = _decode_ocf(buf)
    assert rows == [{"xs": [1, 2, -3]}]


def test_avro_date_and_decimal_logical_types(spark, tmp_path):
    """Round 11: `date` (int days) and `decimal` (bytes, big-endian
    two's-complement unscaled int) logical types round-trip through
    Spark DateType/DecimalType — the common lake-interchange column
    types beyond timestamps."""
    import datetime
    from decimal import Decimal

    rows = [
        (1, datetime.date(2024, 3, 1), Decimal("12345.67")),
        (2, datetime.date(1969, 12, 31), None),
        (3, None, Decimal("-0.01")),
    ]
    df = spark.createDataFrame(rows, "id bigint, d date, m decimal(10,2)")
    path = str(tmp_path / "logical")
    write_avro(df, path, codec="deflate")
    back = read_avro(spark, path)
    assert back.schema == df.schema
    assert sorted(back.collect(), key=lambda r: r["id"]) == sorted(
        df.collect(), key=lambda r: r["id"]
    )

    # wire-level (no encoder trust): hand-assembled date + decimal bytes.
    # date 2024-03-01 = 19783 days; decimal 1234567 unscaled -> 3 bytes
    # 0x12 0xD6 0x87
    schema = (
        b'{"type":"record","name":"r","fields":['
        b'{"name":"d","type":{"type":"int","logicalType":"date"}},'
        b'{"name":"m","type":{"type":"bytes","logicalType":"decimal",'
        b'"precision":10,"scale":2}}]}'
    )
    sync = bytes(range(32, 48))
    meta = (
        _zigzag_encode(2)
        + _zigzag_encode(len(b"avro.schema")) + b"avro.schema"
        + _zigzag_encode(len(schema)) + schema
        + _zigzag_encode(len(b"avro.codec")) + b"avro.codec"
        + _zigzag_encode(4) + b"null"
        + _zigzag_encode(0)
    )
    payload = (
        _zigzag_encode(19783)
        + _zigzag_encode(3) + bytes([0x12, 0xD6, 0x87])
    )
    buf = (
        _MAGIC + meta + sync
        + _zigzag_encode(1) + _zigzag_encode(len(payload)) + payload + sync
    )
    _, got = _decode_ocf(buf)
    assert got == [{"d": datetime.date(2024, 3, 1), "m": Decimal("12345.67")}]

    # crafted out-of-range date raises ValueError, not OverflowError
    bad_payload = _zigzag_encode(10**9) + _zigzag_encode(1) + b"\x00"
    bad = (
        _MAGIC + meta + sync
        + _zigzag_encode(1) + _zigzag_encode(len(bad_payload))
        + bad_payload + sync
    )
    with pytest.raises(ValueError, match="date out of range"):
        _decode_ocf(bad)


def _ocf(schema: bytes, payloads: list[bytes], sync=bytes(range(48, 64))):
    meta = (
        _zigzag_encode(2)
        + _zigzag_encode(len(b"avro.schema")) + b"avro.schema"
        + _zigzag_encode(len(schema)) + schema
        + _zigzag_encode(len(b"avro.codec")) + b"avro.codec"
        + _zigzag_encode(4) + b"null"
        + _zigzag_encode(0)
    )
    body = b"".join(
        _zigzag_encode(1) + _zigzag_encode(len(p)) + p + sync
        for p in payloads
    )
    return _MAGIC + meta + sync + body


def test_avro_enum_fixed_millis_uuid(spark, tmp_path):
    """Round 11: hand-assembled wire bytes for the remaining interchange
    types — enum (int index -> symbol string), fixed(N) (raw N bytes),
    timestamp-millis (long ms -> TimestampType) and the annotation-only
    uuid logical type on string."""
    schema = (
        b'{"type":"record","name":"r","fields":['
        b'{"name":"c","type":{"type":"enum","name":"col",'
        b'"symbols":["RED","GREEN","BLUE"]}},'
        b'{"name":"f","type":{"type":"fixed","name":"md5","size":4}},'
        b'{"name":"t","type":{"type":"long",'
        b'"logicalType":"timestamp-millis"}},'
        b'{"name":"u","type":{"type":"string","logicalType":"uuid"}}]}'
    )
    uuid = b"00000000-0000-4000-8000-000000000001"
    # 2024-03-01T00:00:00.250 = 19783 days * 86400_000 + 250 ms
    ms = 19783 * 86_400_000 + 250
    payload = (
        _zigzag_encode(2)                       # enum index 2 -> BLUE
        + b"\xde\xad\xbe\xef"                   # fixed(4), no length prefix
        + _zigzag_encode(ms)
        + _zigzag_encode(len(uuid)) + uuid
    )
    buf = _ocf(schema, [payload])
    _, rows = _decode_ocf(buf)
    assert rows == [{
        "c": "BLUE",
        "f": b"\xde\xad\xbe\xef",
        "t": datetime.datetime(2024, 3, 1, 0, 0, 0, 250000),
        "u": uuid.decode(),
    }]

    # Spark-read path end-to-end on the crafted file: schema mapping
    # (enum->string, fixed->binary, millis->timestamp, uuid->string)
    # and values survive the mapInPandas decode + Arrow cast.
    d = tmp_path / "crafted"
    d.mkdir()
    (d / "part-00000.avro").write_bytes(buf)
    back = read_avro(spark, str(d))
    assert [f.simpleString() for f in back.schema.fields] == [
        "c:string", "f:binary", "t:timestamp", "u:string"
    ]
    r = back.collect()[0]
    assert r["c"] == "BLUE" and bytes(r["f"]) == b"\xde\xad\xbe\xef"
    assert r["t"] == datetime.datetime(2024, 3, 1, 0, 0, 0, 250000)
    assert r["u"] == uuid.decode()

    # guards: out-of-range enum index; truncated fixed; malformed schemas
    bad_idx = _ocf(schema, [
        _zigzag_encode(7) + b"\xde\xad\xbe\xef" + _zigzag_encode(ms)
        + _zigzag_encode(len(uuid)) + uuid
    ])
    with pytest.raises(ValueError, match="enum index"):
        _decode_ocf(bad_idx)
    short_fixed = _ocf(schema, [_zigzag_encode(0) + b"\xde\xad"])
    with pytest.raises(ValueError, match="truncated Avro fixed"):
        _decode_ocf(short_fixed)
    for bad in (
        b'{"type":"record","name":"r","fields":[{"name":"c","type":'
        b'{"type":"enum","name":"e","symbols":[]}}]}',
        b'{"type":"record","name":"r","fields":[{"name":"c","type":'
        b'{"type":"enum","name":"e","symbols":["A","A"]}}]}',
        b'{"type":"record","name":"r","fields":[{"name":"f","type":'
        b'{"type":"fixed","name":"x","size":-1}}]}',
    ):
        with pytest.raises(ValueError, match="malformed Avro"):
            spark_schema_of(bad.decode())


def test_avro_enum_fixed_encoder_roundtrip():
    """The internal encoder writes enum indexes / raw fixed bytes that
    its own decoder (already pinned against hand bytes above) reads
    back; unknown symbols and wrong-length fixed values error."""
    from dataforge_spark.avro import _decode_datum, _encode_datum

    enum_desc = ("enum", ("A", "B", "C"))
    for sym in ("A", "C"):
        buf = _encode_datum(enum_desc, False, sym)
        got, pos = _decode_datum(enum_desc, False, buf, 0)
        assert got == sym and pos == len(buf)
    with pytest.raises(ValueError, match="not a symbol"):
        _encode_datum(enum_desc, False, "Z")

    fixed_desc = ("fixed", 3)
    buf = _encode_datum(fixed_desc, False, b"\x01\x02\x03")
    assert buf == b"\x01\x02\x03"
    assert _decode_datum(fixed_desc, False, buf, 0) == (b"\x01\x02\x03", 3)
    with pytest.raises(ValueError, match="fixed"):
        _encode_datum(fixed_desc, False, b"\x01")

    # timestamp-millis: pre-epoch datetimes floor-divide consistently
    pre = datetime.datetime(1969, 12, 31, 23, 59, 59, 999000)
    buf = _encode_datum("ts_millis", False, pre)
    got, _ = _decode_datum("ts_millis", False, buf, 0)
    assert got == pre
