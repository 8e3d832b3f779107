"""tools/make_sf1 must write replicated tables across multiple files:
the round-6 corpus was one file with ONE 6M-row row group per table, and
parquet cannot split a row group — every sf1 scan ran on a single core
(a 21-split lineitem scan had 20 splits reading 0 rows). This pins the
fix so a future writer change can't silently reintroduce the cliff."""

import glob
import os

import pytest

from tools.make_sf1 import NO_REPLICATE, OFFSET, TABLES, ensure_sf1


@pytest.fixture(scope="module")
def sf1_dir(spark, tmp_path_factory):
    # generated once for the module — both tests read the same corpus
    base = str(tmp_path_factory.mktemp("sf1_layout") / "sf")
    return ensure_sf1(spark, "/root/testdata/sf0.001", base=base)


def test_replicated_tables_are_multi_file(spark, sf1_dir):
    dst = sf1_dir
    checked = 0
    for t in TABLES:
        d = os.path.join(dst, f"{t}.parquet")
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "part-*.parquet"))
        if t in NO_REPLICATE:
            continue
        assert len(files) >= 2, f"{t} written as {len(files)} file(s)"
        checked += 1
    assert checked >= 5  # the big tables all exist in the source


def test_replication_shifts_keys_disjointly(spark, sf1_dir):
    dst = sf1_dir
    li = spark.read.parquet(os.path.join(dst, "lineitem.parquet"))
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    assert li.count() == 10 * src.count()
    # copy key spaces are disjoint: every copy's keys sit in its own
    # OFFSET-sized band
    from pyspark.sql import functions as F

    bands = (
        li.select((F.col("l_orderkey") / OFFSET).cast("int").alias("b"))
        .distinct()
        .count()
    )
    assert bands == 10
