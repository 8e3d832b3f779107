"""Persisted exact-digest index: write → incremental dedup → append →
self-dedup refresh loop, meta guards, distinctness of the stored
table."""

import uuid

import pytest
from pyspark.sql import functions as F

from dataforge_spark.dedup.intercorpus import (
    append_to_digest_index,
    dedup_against_digest_index,
    write_digest_index,
)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("digidx") / "snap")
    base = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, "beta doc")],
        "doc_id bigint, text string",
    )
    info = write_digest_index(base, path)
    return path, info


def test_write_dedups_digests(idx):
    _path, info = idx
    assert info["n_digests"] == 2  # 'beta doc' stored once


def test_incremental_dedup_and_append(spark, idx):
    path, _ = idx
    batch = spark.createDataFrame(
        [(10, "alpha doc"), (11, "gamma doc"), (12, "delta doc")],
        "doc_id bigint, text string",
    )
    fresh = dedup_against_digest_index(batch, path)
    assert sorted(r["doc_id"] for r in fresh.collect()) == [11, 12]
    assert fresh.columns == ["doc_id", "text"]

    out = append_to_digest_index(fresh, path)
    assert out["appended"] == 2
    assert out["n_digests"] == 4
    # refresh loop: the accepted batch now self-matches
    assert dedup_against_digest_index(batch, path).count() == 0
    # appending the same rows again adds nothing (stored table distinct)
    again = append_to_digest_index(batch, path)
    assert again["appended"] == 0


def test_meta_guard(spark, tmp_path):
    with pytest.raises(Exception):
        dedup_against_digest_index(
            spark.createDataFrame([(1, "x")], "doc_id bigint, text string"),
            str(tmp_path / "nonexistent"),
        )
