"""TFRecord source/sink tests: CRC32C public vectors, hand-assembled
protobuf/framing wire bytes (decoder tested against the SPEC, not our
encoder), Spark round-trips for every supported type incl. nulls and
arrays, gzip parts, corrupt-stream guards, and a mutation-fuzz
contract (decode always terminates with ValueError or a clean result,
never hangs)."""

import glob
import gzip
import os
import random
import struct
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataforge_spark.tfrecord import (
    crc32c,
    decode_example,
    encode_example,
    iter_records,
    masked_crc32c,
    read_tfrecord,
    write_record,
    write_tfrecord,
)


def _tmp(name):
    return f"/tmp/tfrec_test_{name}_{uuid.uuid4().hex[:8]}"


# ------------------------------------------------------------- crc32c


def test_crc32c_public_vectors():
    # RFC 3720 / public Castagnoli check values
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_masked_crc_formula():
    crc = crc32c(b"123456789")
    expect = ((((crc >> 15) | (crc << 17)) & 0xFFFFFFFF) + 0xA282EAD8) & 0xFFFFFFFF
    assert masked_crc32c(b"123456789") == expect


# ------------------------------------- forward-built wire-spec streams


def _varint(v):
    out = bytearray()
    if v < 0:
        v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field, body):
    return _varint((field << 3) | 2) + _varint(len(body)) + body


def test_decode_example_hand_assembled_unpacked():
    """The spec requires readers to accept UNPACKED repeated numeric
    encodings; our encoder always packs, so build the unpacked form by
    hand: int64_list {value: 7 value: -2} and float_list unpacked."""
    i64_body = _varint((1 << 3) | 0) + _varint(7) + _varint((1 << 3) | 0) + _varint(-2)
    feat_i = _ld(3, i64_body)
    f_body = (
        _varint((1 << 3) | 5) + struct.pack("<f", 1.5)
        + _varint((1 << 3) | 5) + struct.pack("<f", -0.25)
    )
    feat_f = _ld(2, f_body)
    entry_a = _ld(1, b"a") + _ld(2, feat_i)
    entry_b = _ld(1, b"b") + _ld(2, feat_f)
    example = _ld(1, _ld(1, entry_a) + _ld(1, entry_b))
    feats = decode_example(example)
    assert feats["a"] == (3, [7, -2])
    kind, vals = feats["b"]
    assert kind == 2 and vals == [1.5, -0.25]


def test_decode_example_skips_unknown_fields():
    # unknown field 9 (varint) inside Feature, unknown field 5 at top level
    feat = _varint((9 << 3) | 0) + _varint(300) + _ld(3, _ld(1, _varint(42)))
    entry = _ld(1, b"x") + _ld(2, feat)
    example = _ld(1, _ld(1, entry)) + _varint((5 << 3) | 0) + _varint(1)
    assert decode_example(example)["x"] == (3, [42])


def test_decode_example_rejects_group_wiretype():
    bad = _varint((1 << 3) | 3)  # deprecated start-group
    with pytest.raises(ValueError, match="wire type"):
        decode_example(bad)


def test_encode_decode_example_all_kinds():
    feats = {
        "s": (1, [b"hi", b""]),
        "f": (2, [0.5, 2.0]),
        "i": (3, [-1, 0, 2**62]),
    }
    assert decode_example(encode_example(feats)) == feats


def test_framing_hand_assembled_and_crc_guards():
    data = b"payload"
    header = struct.pack("<Q", len(data))
    rec = (
        header
        + struct.pack("<I", masked_crc32c(header))
        + data
        + struct.pack("<I", masked_crc32c(data))
    )
    assert list(iter_records(rec + rec)) == [data, data]
    # corrupt the data CRC
    bad = bytearray(rec)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="data CRC"):
        list(iter_records(bytes(bad)))
    # corrupt the length CRC
    bad = bytearray(rec)
    bad[8] ^= 0xFF
    with pytest.raises(ValueError, match="length CRC"):
        list(iter_records(bytes(bad)))
    # truncation mid-payload
    with pytest.raises(ValueError, match="truncated"):
        list(iter_records(rec[:14]))
    # absurd length bound
    bomb = struct.pack("<Q", 1 << 40)
    bomb += struct.pack("<I", masked_crc32c(bomb))
    with pytest.raises(ValueError, match="sanity bound"):
        list(iter_records(bomb + b"x" * 16))


def test_iter_records_verify_false_skips_crc():
    import io

    buf = io.BytesIO()
    write_record(buf, b"abc")
    raw = bytearray(buf.getvalue())
    raw[-1] ^= 0xFF
    assert list(iter_records(bytes(raw), verify=False)) == [b"abc"]


# ------------------------------------------------------ Spark round-trips


@pytest.fixture(scope="module")
def typed_df(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.FloatType()),
            T.StructField("exact", T.DoubleType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("blob", T.BinaryType()),
            T.StructField("vec", T.ArrayType(T.FloatType())),
            T.StructField("ids", T.ArrayType(T.LongType())),
        ]
    )
    import datetime as dt

    rows = [
        Row(
            id=1, name="alpha", score=1.5, exact=1.0000000001,
            flag=True, ts=dt.datetime(2024, 5, 1, 12, 30, 0, 123456),
            blob=b"\x00\xff", vec=[0.5, 1.5], ids=[1, 2, 3],
        ),
        Row(
            id=None, name=None, score=None, exact=None, flag=None,
            ts=None, blob=None, vec=None, ids=None,
        ),
        Row(
            id=-(2**62), name="β-utf8", score=-0.25, exact=-2.5,
            flag=False, ts=dt.datetime(1969, 12, 31, 23, 59, 59),
            blob=b"", vec=[], ids=[-(2**40)],
        ),
    ]
    return spark.createDataFrame(rows, schema)


def test_spark_roundtrip_all_types_bytes_mode(spark, typed_df):
    path = _tmp("rt_bytes")
    write_tfrecord(typed_df, path, double_mode="bytes")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    back = read_tfrecord(spark, path, typed_df.schema, double_mode="bytes")
    got = sorted(
        [r.asDict() for r in back.collect()],
        key=lambda r: (r["id"] is None, r["id"]),
    )
    want = sorted(
        [r.asDict() for r in typed_df.collect()],
        key=lambda r: (r["id"] is None, r["id"]),
    )
    assert got == want  # doubles exact under bytes mode


def test_spark_roundtrip_double_float_mode_narrows(spark):
    df = spark.createDataFrame(
        [(1, 1.0000000001)], "id bigint, exact double"
    )
    path = _tmp("rt_float")
    write_tfrecord(df, path, double_mode="float")
    back = read_tfrecord(spark, path, "id bigint, exact double").collect()[0]
    assert back["exact"] == pytest.approx(1.0, abs=1e-7)
    assert back["exact"] != 1.0000000001  # narrowing is real and documented


def test_spark_roundtrip_gzip(spark, typed_df):
    path = _tmp("rt_gz")
    write_tfrecord(typed_df.select("id", "name"), path, compression="gzip")
    parts = glob.glob(f"{path}/part-*.tfrecord.gz")
    assert parts
    with open(parts[0], "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"
    back = read_tfrecord(spark, path, "id bigint, name string")
    assert sorted(
        [(r["id"], r["name"]) for r in back.collect()],
        key=lambda t: (t[0] is None, t[0]),
    ) == [(-(2**62), "β-utf8"), (1, "alpha"), (None, None)]


def test_events_table_roundtrip_checksum(spark, events):
    ev = events.select("event_id", "event_type", "value", "props").limit(500)
    path = _tmp("events")
    write_tfrecord(ev, path, double_mode="bytes")
    back = read_tfrecord(
        spark, path,
        "event_id bigint, event_type string, value double, props string",
        double_mode="bytes",
    )
    a = ev.agg(
        F.count("*").alias("n"), F.sum("value").alias("s"),
        F.count_distinct("props").alias("p"),
    ).collect()[0]
    b = back.agg(
        F.count("*").alias("n"), F.sum("value").alias("s"),
        F.count_distinct("props").alias("p"),
    ).collect()[0]
    assert (a["n"], a["p"]) == (b["n"], b["p"])
    assert a["s"] == pytest.approx(b["s"], rel=0, abs=1e-9)


def test_schema_kind_mismatch_raises(spark):
    df = spark.createDataFrame([(1, "x")], "id bigint, name string")
    path = _tmp("mismatch")
    write_tfrecord(df, path)
    bad = read_tfrecord(spark, path, "id string, name string")
    with pytest.raises(Exception, match="does not match declared"):
        bad.collect()


def test_unsupported_type_and_args_raise(spark):
    df = spark.createDataFrame([(1,)], "id bigint").withColumn(
        "m", F.create_map(F.lit("a"), F.lit(1))
    )
    with pytest.raises(NotImplementedError, match="unsupported Spark type"):
        write_tfrecord(df, _tmp("unsup"))
    with pytest.raises(ValueError, match="compression"):
        write_tfrecord(df.select("id"), _tmp("badc"), compression="lz4")
    with pytest.raises(ValueError, match="double_mode"):
        write_tfrecord(df.select("id"), _tmp("baddm"), double_mode="exact")


def test_null_array_element_raises(spark):
    df = spark.createDataFrame(
        [(1, [1.0, None])], "id bigint, vec array<double>"
    )
    with pytest.raises(Exception, match="null ELEMENT"):
        write_tfrecord(df, _tmp("nullel"))


def test_empty_partition_writes_no_file(spark):
    df = spark.createDataFrame([(1,)], "id bigint").repartition(8)
    path = _tmp("emptyparts")
    write_tfrecord(df, path)
    parts = glob.glob(f"{path}/part-*.tfrecord")
    assert len(parts) == 1


# --------------------------------------------------------- fuzz contract


def test_decode_fuzz_contract():
    """Mutated framing/protobuf streams must always terminate with
    ValueError or a clean decode — no hangs, no non-ValueError leaks."""
    import io

    base = io.BytesIO()
    for i in range(5):
        write_record(
            base,
            encode_example(
                {"a": (3, [i, -i]), "b": (1, [b"x" * i]), "c": (2, [i / 2])}
            ),
        )
    base = base.getvalue()
    rng = random.Random(0xC0FFEE)
    for _ in range(3000):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            if len(buf) < 8:
                break
            op = rng.random()
            if op < 0.5:
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            elif op < 0.75 and len(buf) > 4:
                del buf[rng.randrange(len(buf) - 2) :]
            else:
                buf[rng.randrange(len(buf)) :] = bytes(
                    rng.randrange(256) for _ in range(rng.randint(1, 9))
                )
        try:
            for rec in iter_records(bytes(buf)):
                decode_example(rec)
        except ValueError:
            pass


def test_gzip_corrupt_stream_raises():
    blob = gzip.compress(b"not a tfrecord stream")
    mangled = blob[:-4] + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        list(iter_records(mangled))
