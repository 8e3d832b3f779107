"""BFD whole-document packing: hand-verifiable perfect packing, the
never-split/never-overflow invariants, layout determinism, oversize
policies, and fill-rate accounting."""

import random

import pytest
from pyspark.sql import functions as F

from dataforge_spark.curation import pack_documents_bfd, packing_stats


def _df(spark, sizes, parts=1):
    return spark.createDataFrame(
        [(i, int(n)) for i, n in enumerate(sizes)], "doc_id bigint, n bigint"
    ).repartition(parts)


def test_perfect_packing_single_group(spark):
    # BFD on [6,5,4,3,2,1] with budget 7 → exactly {6,1},{5,2},{4,3}
    df = _df(spark, [6, 5, 4, 3, 2, 1])
    packed = pack_documents_bfd(
        df, budget=7, token_col="n", n_groups=1
    )
    rows = packed.collect()
    assert len(rows) == 6
    fills = {}
    for r in rows:
        fills.setdefault(r["pack_id"], 0)
        fills[r["pack_id"]] += r["n_tokens"]
    assert sorted(fills.values()) == [7, 7, 7]
    stats = packing_stats(packed, 7)
    assert stats["packs"] == 3 == stats["lower_bound_packs"]
    assert stats["fill_rate"] == 1.0
    assert stats["oversize_packs"] == 0


def test_invariants_and_determinism(spark):
    rng = random.Random(5)
    sizes = [rng.randint(1, 100) for _ in range(2000)]
    a = pack_documents_bfd(
        _df(spark, sizes, parts=3), budget=256, token_col="n", n_groups=8
    )
    b = pack_documents_bfd(
        _df(spark, sizes, parts=17), budget=256, token_col="n", n_groups=8
    )
    ra = sorted((r["id"], r["pack_id"]) for r in a.collect())
    rb = sorted((r["id"], r["pack_id"]) for r in b.collect())
    assert ra == rb  # layout-independent assignment

    per_pack = (
        a.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).collect()
    )
    assert all(r["t"] <= 256 for r in per_pack)  # never overflow
    stats = packing_stats(a, 256)
    # 8-way grouping costs at most ~a partial bin per group over LB
    assert stats["packs"] <= stats["lower_bound_packs"] + 8
    assert stats["fill_rate"] > 0.9


def test_oversize_policies(spark):
    df = _df(spark, [10, 300, 20])
    with pytest.raises(Exception) as ei:
        pack_documents_bfd(df, budget=256, token_col="n", n_groups=1).collect()
    assert "chunk_documents" in str(ei.value)

    packed = pack_documents_bfd(
        df, budget=256, token_col="n", n_groups=1, oversize="own_pack"
    )
    rows = {r["id"]: r for r in packed.collect()}
    big_pack = rows[1]["pack_id"]
    others = {rows[0]["pack_id"], rows[2]["pack_id"]}
    assert big_pack not in others  # the oversize doc packs alone
    stats = packing_stats(packed, 256)
    assert stats["oversize_packs"] == 1


def test_validation(spark):
    df = _df(spark, [1])
    with pytest.raises(ValueError):
        pack_documents_bfd(df, budget=0, token_col="n")
    with pytest.raises(ValueError):
        pack_documents_bfd(df, budget=8, token_col="n", oversize="drop")
    with pytest.raises(ValueError):
        pack_documents_bfd(df, budget=8, text_col=None, token_col=None)
