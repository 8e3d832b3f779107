"""Persisted MinHash index / incremental fuzzy inter-corpus dedup
(dedup/index.py)."""

import pytest
from pyspark.sql import Row

from dataforge_spark.dedup.index import (
    append_to_index,
    dedup_against_index,
    match_against_index,
    write_minhash_index,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm sunny windowsill in the late afternoon light"
)
OTHER = (
    "completely different content about distributed query engines and "
    "shuffle partitioning strategies for large scale analytics clusters"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mhidx") / "idx")
    corpus = _docs(
        spark,
        [(1, BASE), (2, OTHER), (3, "unrelated text about gardens and trees and flowers blooming in spring")],
    )
    meta = write_minhash_index(corpus, path)
    assert meta["dropped_buckets"] == 0
    return path


def test_exact_dup_matches_at_one(spark, index_path):
    batch = _docs(spark, [(101, BASE)])
    m = match_against_index(batch, index_path, threshold=0.7).collect()
    assert [(r.new_id, r.ref_id, r.est_jaccard) for r in m] == [(101, 1, 1.0)]


def test_broadcast_probe_same_results_and_plan(spark, index_path):
    # broadcast_probe=True must return the identical pair set, and its
    # plan must broadcast the probe side (the stored bands/sigs tables
    # are scanned, never shuffled — the incremental-batch plan shape)
    near = BASE.replace("lazy dog", "sleepy dog")
    batch = _docs(spark, [(101, BASE), (102, near)])
    plain = sorted(
        (r.new_id, r.ref_id, r.est_jaccard)
        for r in match_against_index(batch, index_path, threshold=0.5).collect()
    )
    bcast_df = match_against_index(
        batch, index_path, threshold=0.5, broadcast_probe=True
    )
    assert sorted(
        (r.new_id, r.ref_id, r.est_jaccard) for r in bcast_df.collect()
    ) == plain
    plan = bcast_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # pass-through on the dedup wrapper returns the same survivors
    a = {r.doc_id for r in dedup_against_index(
        batch, index_path, threshold=0.5).collect()}
    b = {r.doc_id for r in dedup_against_index(
        batch, index_path, threshold=0.5, broadcast_probe=True).collect()}
    assert a == b


def test_near_dup_matches_fresh_and_short_survive(spark, index_path):
    near = BASE.replace("lazy dog", "sleepy dog")  # one shingle region off
    batch = _docs(
        spark,
        [(101, near), (102, "entirely novel document text about oceans currents and tides rising"), (103, "too short")],
    )
    out = dedup_against_index(batch, index_path, threshold=0.5)
    assert {r.doc_id for r in out.collect()} == {102, 103}
    m = match_against_index(batch, index_path, threshold=0.5).collect()
    assert {r.new_id for r in m} == {101}
    assert all(r.est_jaccard < 1.0 for r in m)


def test_append_then_self_match(spark, index_path, tmp_path):
    import shutil

    path = str(tmp_path / "idx2")
    shutil.copytree(index_path, path)
    novel = "entirely novel document text about ocean currents and tides rising with the moon each night"
    batch = _docs(spark, [(500, novel)])
    accepted = dedup_against_index(batch, path, threshold=0.5)
    assert accepted.count() == 1
    append_to_index(accepted, path)
    again = match_against_index(
        _docs(spark, [(600, novel)]), path, threshold=0.9
    ).collect()
    assert [(r.new_id, r.ref_id) for r in again] == [(600, 500)]
    # and the original corpus is still indexed
    assert match_against_index(
        _docs(spark, [(601, BASE)]), path, threshold=0.9
    ).count() == 1


def test_append_param_mismatch_raises(spark, index_path):
    with pytest.raises(ValueError, match="parameter mismatch"):
        write_minhash_index(
            _docs(spark, [(9, BASE)]), index_path,
            num_perm=32, bands=8, rows_per_band=4, mode="append",
        )


def test_bad_banding_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="bands"):
        write_minhash_index(
            _docs(spark, [(1, BASE)]), str(tmp_path / "x"),
            num_perm=64, bands=10, rows_per_band=4,
        )


def test_missing_meta_raises(spark, tmp_path):
    with pytest.raises(Exception):
        match_against_index(
            _docs(spark, [(1, BASE)]), str(tmp_path / "nope")
        )


def test_write_time_bucket_prune_disclosed(spark, tmp_path):
    path = str(tmp_path / "boiler")
    boiler = _docs(spark, [(i, BASE) for i in range(1, 9)])
    meta = write_minhash_index(boiler, path, max_bucket=4)
    # 8 identical docs share every band bucket; all 16 buckets dropped
    assert meta["dropped_buckets"] == 16
    assert meta["dropped_members"] == 16 * 8
    # disclosed recall trade: the boilerplate text no longer matches
    assert match_against_index(
        _docs(spark, [(99, BASE)]), path, threshold=0.5
    ).count() == 0
