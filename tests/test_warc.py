"""WARC source/sink tests: hand-assembled spec records (decoder tested
against ISO 28500 wire bytes, not our writer), gzip member framing,
Spark round-trips on the documents table, malformed-input guards
(truncation, bad version, header bombs, inflate bombs) and a mutation
fuzz contract."""

import glob
import gzip
import os
import random
import uuid
import zlib

import pytest
from pyspark.sql import functions as F

from dataforge_spark.warc import (
    iter_warc_records,
    read_warc,
    read_wet_text,
    write_warc,
)


def _tmp(name):
    return f"/tmp/warc_test_{name}_{uuid.uuid4().hex[:8]}"


def _record(headers, payload, version=b"WARC/1.1"):
    out = bytearray(version + b"\r\n")
    for k, v in headers:
        out += f"{k}: {v}\r\n".encode()
    out += f"Content-Length: {len(payload)}\r\n\r\n".encode()
    out += payload + b"\r\n\r\n"
    return bytes(out)


BASIC = _record(
    [
        ("WARC-Type", "conversion"),
        ("WARC-Record-ID", "<urn:uuid:0000>"),
        ("WARC-Date", "2026-01-01T00:00:00Z"),
        ("WARC-Target-URI", "http://example.com/a"),
        ("WARC-Identified-Content-Language", "eng"),
        ("Content-Type", "text/plain"),
    ],
    b"hello world",
)


# ------------------------------------------------- hand-assembled parsing


def test_parse_plain_multi_record():
    second = _record(
        [("WARC-Type", "resource"), ("WARC-Record-ID", "<urn:uuid:1>")],
        b"\x00\xffbinary\r\n\r\nwith separators inside",
        version=b"WARC/1.0",  # 1.0 accepted too
    )
    got = list(iter_warc_records(BASIC + second))
    assert len(got) == 2
    h0, p0 = got[0]
    assert p0 == b"hello world"
    assert h0["WARC-Type"] == "conversion"
    assert h0["WARC-Identified-Content-Language"] == "eng"
    h1, p1 = got[1]
    # payload bytes containing CRLFCRLF must not confuse the framing
    assert p1.endswith(b"separators inside") and h1["WARC-Type"] == "resource"


def test_parse_gzip_members():
    blob = gzip.compress(BASIC, mtime=0) + gzip.compress(BASIC, mtime=0)
    got = list(iter_warc_records(blob))
    assert len(got) == 2 and got[0][1] == b"hello world"


def test_header_obs_fold_continuation():
    rec = (
        b"WARC/1.1\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:uuid:2>\r\n"
        b"X-Long: part one\r\n"
        b"   and part two\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    (h, p), = iter_warc_records(rec)
    assert h["X-Long"] == "part one and part two" and p == b"ok"


@pytest.mark.parametrize(
    "mutant,err",
    [
        (b"WARC/2.0" + BASIC[8:], "version"),
        (BASIC[:-4], "trailer|truncated"),
        (BASIC[: len(BASIC) // 2], "truncated|trailer|terminator"),
        (
            BASIC.replace(b"Content-Length: 11", b"Content-Length: ten"),
            "bad Content-Length",
        ),
        (
            BASIC.replace(b"Content-Length: 11", b"Content-Length: -4"),
            "sanity bounds",
        ),
        (
            b"WARC/1.1\r\nNoColonHere\r\nContent-Length: 0\r\n\r\n\r\n\r\n",
            "malformed WARC header",
        ),
        (
            b"WARC/1.1\r\nWARC-Type: x\r\n\r\n\r\n\r\n",
            "missing Content-Length",
        ),
    ],
)
def test_malformed_records_raise(mutant, err):
    with pytest.raises(ValueError, match=err):
        list(iter_warc_records(mutant))


def test_header_block_bomb_bounded():
    bomb = b"WARC/1.1\r\n" + b"X: y\r\n" * 300_000  # > 1 MiB, no terminator
    with pytest.raises(ValueError, match="terminator"):
        list(iter_warc_records(bomb))


def test_gzip_inflate_bomb_bounded(monkeypatch):
    # a member expanding far past the record bound must hit the
    # incremental size cap during inflation, not allocate it all
    import dataforge_spark.warc as warcmod

    monkeypatch.setattr(warcmod, "_MAX_CONTENT_BYTES", 1 << 20)
    d = zlib.compressobj(9, zlib.DEFLATED, 31)
    blob = b""
    chunk = b"\x00" * (1 << 22)
    for _ in range(16):
        blob += d.compress(chunk)
    blob += d.flush()
    with pytest.raises(ValueError, match="size bound"):
        list(iter_warc_records(blob))


def test_fuzz_contract():
    base = gzip.compress(BASIC, mtime=0) + gzip.compress(BASIC, mtime=0)
    rng = random.Random(0xABCD)
    for _ in range(2500):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            if len(buf) < 8:
                break
            op = rng.random()
            if op < 0.5:
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            elif op < 0.75:
                del buf[rng.randrange(len(buf) - 2) :]
            else:
                buf[rng.randrange(len(buf)) :] = bytes(
                    rng.randrange(256) for _ in range(rng.randint(1, 9))
                )
        try:
            for _h, _p in iter_warc_records(bytes(buf)):
                pass
        except ValueError:
            pass


# ------------------------------------------------------ Spark round-trips


def test_documents_roundtrip_wet(spark, documents):
    docs = documents.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.concat(F.lit("http://example.com/doc/"), F.col("doc_id")).alias("uri"),
    )
    path = _tmp("docs")
    write_warc(
        docs,
        path,
        payload_col="text",
        uri_col="uri",
        language_col="lang",
        extra_header_cols={"X-DataForge-Source": "source"},
    )
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    parts = glob.glob(f"{path}/part-*.warc.gz")
    assert parts
    with open(parts[0], "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"

    back = read_warc(spark, path)
    n_info = back.filter(F.col("warc_type") == "warcinfo").count()
    assert n_info == len(parts)  # one warcinfo head per file

    conv = back.filter(F.col("warc_type") == "conversion")
    a = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.length("text")).alias("chars"),
        F.count_distinct("lang").alias("langs"),
    ).collect()[0]
    b = conv.agg(
        F.count("*").alias("n"),
        F.sum("content_length").alias("chars"),
        F.count_distinct("language").alias("langs"),
    ).collect()[0]
    assert (a["n"], a["chars"], a["langs"]) == (b["n"], b["chars"], b["langs"])

    # text recovers exactly, custom header round-trips, IDs deterministic
    wet = read_wet_text(spark, path)
    pair = (
        wet.select(
            F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("text").alias("wet_text"),
        )
        .join(documents.select("doc_id", "text"), "doc_id")
        .filter(F.col("wet_text") != F.col("text"))
        .count()
    )
    assert pair == 0
    src = (
        back.filter(F.col("warc_type") == "conversion")
        .select(F.col("headers")["X-DataForge-Source"].alias("src"))
        .filter(F.col("src").isNull())
        .count()
    )
    assert src == 0


def test_write_warc_deterministic_ids(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id bigint, text string"
    ).coalesce(1)
    p1, p2 = _tmp("det1"), _tmp("det2")
    write_warc(df, p1, payload_col="text")
    write_warc(df, p2, payload_col="text")
    ids1 = sorted(r["record_id"] for r in read_warc(spark, p1).collect())
    ids2 = sorted(r["record_id"] for r in read_warc(spark, p2).collect())
    assert ids1 == ids2


def test_write_warc_null_payload_raises(spark):
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    with pytest.raises(Exception, match="null 'text'"):
        write_warc(df, _tmp("nullpay"), payload_col="text")


def test_write_warc_header_crlf_injection_rejected(spark):
    df = spark.createDataFrame(
        [("evil\r\nWARC-Type: smuggled", "x")], "uri string, text string"
    )
    with pytest.raises(Exception, match="CR/LF"):
        write_warc(df, _tmp("inj"), payload_col="text", uri_col="uri")


def test_binary_payload_and_plain_file(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01\xff" * 10))], "k bigint, payload binary"
    )
    path = _tmp("bin")
    write_warc(df, path, compress=False, content_type="application/octet-stream")
    parts = glob.glob(f"{path}/part-*.warc")
    assert parts and open(parts[0], "rb").read(5) == b"WARC/"
    row = (
        read_warc(spark, path)
        .filter(F.col("warc_type") != "warcinfo")
        .collect()[0]
    )
    assert bytes(row["payload"]) == b"\x00\x01\xff" * 10
    assert row["content_type"] == "application/octet-stream"
