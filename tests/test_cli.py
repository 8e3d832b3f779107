"""In-process tests for the `python -m dataforge_spark` CLI surface
(previously exercised only by the manual verify-skill smoke): clean,
profile, and info run through the real argparse entry point; `serve` is
covered live by test_http_server.py."""

import json
import os

import pytest

from dataforge_spark.__main__ import main


@pytest.fixture()
def csv_in(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("a,b\n1,x\n2,\n2,\n,y\n")
    return str(p)


def test_cli_clean_csv_roundtrip(spark, csv_in, tmp_path, capsys):
    out_dir = str(tmp_path / "out.csv")
    rc = main([
        "clean", "--input", csv_in,
        "--ops", json.dumps({
            "missing_values": {"enabled": True, "strategy": "drop_rows"},
            "duplicates": {"enabled": True},
        }),
        "--output", out_dir, "--single-file",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["operations"]["missing_values"]["rows_after"] == 1
    assert report["order"] == ["missing_values", "duplicates"]
    parts = [f for f in os.listdir(out_dir) if f.endswith(".csv")]
    assert len(parts) == 1
    body = open(os.path.join(out_dir, parts[0])).read().strip().splitlines()
    assert body == ["a,b", "1,x"]


def test_cli_clean_parquet_output(spark, csv_in, tmp_path, capsys):
    out = str(tmp_path / "out.parquet")
    rc = main([
        "clean", "--input", csv_in,
        "--ops", json.dumps({"duplicates": {"enabled": True}}),
        "--output", out,
    ])
    assert rc == 0
    json.loads(capsys.readouterr().out)  # report is valid JSON
    got = spark.read.parquet(out)
    assert got.count() == 3  # one duplicate row dropped, nulls kept


def test_cli_profile_and_info(spark, csv_in, capsys):
    assert main(["profile", "--input", csv_in]) == 0
    prof = json.loads(capsys.readouterr().out)
    assert prof["shape"]["rows"] == 4
    assert prof["duplicate_rows"] == 1  # the repeated "2," line
    assert set(prof["missing_values"]) >= {"a", "b"}

    assert main(["info"]) == 0
    info = json.loads(capsys.readouterr().out)
    # the manifest drives the web UI form — operations must be present
    assert info["status"] == "active" or info["status"]
    assert "missing_values" in info["operations"]


def test_cli_clean_jsonl_roundtrip(spark, tmp_path, capsys):
    """r8: .jsonl input and output route through read_jsonl/write_jsonl
    (schema inferred, dedup applied, plain-text parts out)."""
    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n{"a": 2, "b": "y"}\n'
    )
    out = str(tmp_path / "out.jsonl")
    rc = main([
        "clean", "--input", str(src),
        "--ops", json.dumps({"duplicates": {"enabled": True}}),
        "--output", out,
    ])
    assert rc == 0
    json.loads(capsys.readouterr().out)
    rows = [json.loads(l) for f in os.listdir(out) if f.startswith("part-")
            for l in open(os.path.join(out, f)) if l.strip()]
    assert sorted((r["a"], r["b"]) for r in rows) == [(1, "x"), (2, "y")]

def test_cli_clean_orc_roundtrip(spark, tmp_path, capsys):
    """r9: .orc input and output route through read_orc/write_orc
    (dedup applied, zstd multi-part out)."""
    src = str(tmp_path / "in.orc")
    spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y")], "a long, b string"
    ).write.orc(src)
    out = str(tmp_path / "out.orc")
    rc = main([
        "clean", "--input", src,
        "--ops", json.dumps({"duplicates": {"enabled": True}}),
        "--output", out,
    ])
    assert rc == 0
    json.loads(capsys.readouterr().out)
    got = spark.read.orc(out)
    assert sorted((r["a"], r["b"]) for r in got.collect()) == [(1, "x"), (2, "y")]
    assert "_row_id" not in got.columns  # order key dropped at the sink
