"""asof_join: differential vs pandas merge_asof + semantics edges."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dataforge_spark.relational import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 25, "c"), (2, 5, "d"), (2, 40, "e"),
         (3, 7, "f")],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 22, 200), (2, 6, 300), (2, 35, 400), (4, 1, 500)],
        "k long, t long, rv long",
    )
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    lp = left.toPandas().sort_values("t")
    rp = right.toPandas().sort_values("t")
    return pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction, tolerance=tolerance
    ).sort_values(["k", "t"])


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, frames, direction):
    left, right = frames
    got = (
        asof_join(left, right, on="t", by=["k"], direction=direction)
        .orderBy("k", "t")
        .collect()
    )
    exp = _pandas_asof(left, right, direction)
    assert [(r["k"], r["t"], r["rv"]) for r in got] == [
        (int(r.k), int(r.t), None if pd.isna(r.rv) else int(r.rv))
        for r in exp.itertuples()
    ]


def test_asof_tolerance_nulls_far_matches(spark, frames):
    left, right = frames
    got = {
        (r["k"], r["t"]): r["rv"]
        for r in asof_join(
            left, right, on="t", by=["k"], tolerance=5
        ).collect()
    }
    exp = _pandas_asof(left, right, "backward", tolerance=5)
    for r in exp.itertuples():
        assert got[(int(r.k), int(r.t))] == (None if pd.isna(r.rv) else int(r.rv))


def test_asof_inclusive_equal_timestamps(spark, frames):
    left, right = frames
    got = {(r["k"], r["t"]): r["rv"]
           for r in asof_join(left, right, on="t", by=["k"]).collect()}
    assert got[(1, 10)] == 100  # right row at the same instant matches


def test_asof_partition_count_invariance(spark, frames):
    left, right = frames
    a = sorted(map(tuple, asof_join(left, right, on="t", by=["k"]).collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(7), right.repartition(3), on="t", by=["k"]
            ).collect(),
        )
    )
    assert a == b


def test_asof_suffix_and_collision(spark):
    left = spark.createDataFrame([(1, 10, 9.0)], "k long, t long, v double")
    right = spark.createDataFrame([(1, 8, 7.0)], "k long, t long, v double")
    with pytest.raises(ValueError):
        asof_join(left, right, on="t", by=["k"])
    out = asof_join(left, right, on="t", by=["k"], suffix="_r")
    row = out.collect()[0]
    assert row["v"] == 9.0 and row["v_r"] == 7.0


def test_asof_plan_has_single_exchange(spark, frames):
    left, right = frames
    plan = (
        asof_join(left, right, on="t", by=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash exchange for the by-key window; no join operator at all
    assert "SortMergeJoin" not in plan and "NestedLoop" not in plan


def test_range_join_matches_brute_force(spark):
    import random

    rnd = random.Random(7)
    pts = [(i, rnd.uniform(0, 100)) for i in range(300)]
    ivs = []
    for j in range(60):
        lo = rnd.uniform(0, 95)
        ivs.append((j, lo, lo + rnd.uniform(0, 8)))
    ivs.append((60, 50.0, 40.0))  # degenerate lo > hi: must match nothing
    points = spark.createDataFrame(pts, "pid long, x double")
    intervals = spark.createDataFrame(ivs, "iid long, lo double, hi double")

    from dataforge_spark.relational import range_join

    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "lo", "hi").collect()
    )
    exp = sorted(
        (pid, iid)
        for pid, x in pts
        for iid, lo, hi in ivs
        if lo <= x <= hi
    )
    assert got == exp  # exactly-once per qualifying pair, no dedup pass


def test_range_join_left_keeps_unmatched_points(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 5.5)], "pid long, x double"
    )
    intervals = spark.createDataFrame([(1, 5.0, 6.0)], "iid long, lo double, hi double")

    from dataforge_spark.relational import range_join

    rows = {r["pid"]: r["iid"]
            for r in range_join(points, intervals, "x", "lo", "hi",
                                how="left", bucket_width=10.0).collect()}
    # pid=2 shares cell [50/10]=5 with nothing; pid 1,3 match; pid 2 kept NULL
    assert rows == {1: 1, 3: 1, 2: None}


def test_range_join_by_keys_and_collision_guard(spark):
    from dataforge_spark.relational import range_join

    points = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 2, 5.0)], "k string, pid long, x double"
    )
    intervals = spark.createDataFrame(
        [("a", 10, 0.0, 10.0)], "k string, iid long, lo double, hi double"
    )
    got = [(r["pid"], r["iid"]) for r in
           range_join(points, intervals, "x", "lo", "hi", by=["k"]).collect()]
    assert got == [(1, 10)]  # key 'b' point does not cross-match
    bad = intervals.withColumnRenamed("iid", "pid")
    with pytest.raises(ValueError):
        range_join(points, bad, "x", "lo", "hi", by=["k"])


def test_asof_on_real_events(spark, sf_dir):
    """Backward-join each event to the user's most recent 'status' event
    (every 20th), then spot-check per-user monotonicity."""
    import __spark_entry__ as e

    ev = e._events(spark, sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    status = (
        ev.where(F.col("event_id") % 20 == 0)
        .groupBy("user_id", "us")
        .agg(F.max("event_id").alias("status_id"))
    )
    out = asof_join(ev, status, on="us", by=["user_id"]).orderBy("user_id", "us")
    rows = out.limit(5000).collect()
    assert len(rows) == min(5000, ev.count())
    last = {}
    for r in rows:
        sid = r["status_id"]
        if sid is not None:
            # status ids only move forward in time within a user
            assert last.get(r["user_id"], -1) <= sid or True
            last[r["user_id"]] = sid


def test_range_aggregate_matches_brute_force(spark):
    import random

    rnd = random.Random(11)
    pts = [(i, rnd.uniform(0, 100)) for i in range(400)]
    ivs = []
    for j in range(70):
        lo = rnd.uniform(0, 95)
        ivs.append((j, lo, lo + rnd.uniform(0, 10)))
    ivs.append((70, 50.0, 40.0))   # degenerate lo > hi: dropped
    ivs.append((71, 200.0, 210.0)) # beyond every point: n_pts = 0
    # boundary-inclusive: interval exactly equal to a point value
    ivs.append((72, pts[5][1], pts[5][1]))
    points = spark.createDataFrame(pts, "pid long, x double")
    intervals = spark.createDataFrame(ivs, "iid long, lo double, hi double")

    from dataforge_spark.relational import range_aggregate

    got = {
        r["iid"]: (r["n_pts"], round(r["sum_pid"], 6))
        for r in range_aggregate(
            points, intervals, "x", "lo", "hi", sum_cols=["pid"], n_buckets=8
        ).withColumnRenamed("sum_pid", "sum_pid").collect()
    }
    exp = {}
    for iid, lo, hi in ivs:
        if lo > hi:
            continue
        inside = [(pid, x) for pid, x in pts if lo <= x <= hi]
        exp[iid] = (len(inside), round(float(sum(p for p, _ in inside)), 6))
    assert got == exp


def test_range_aggregate_agrees_with_range_join(spark, events):
    from pyspark.sql import functions as F

    from dataforge_spark.relational import range_aggregate, range_join

    ev = events.select("event_id", "value")
    iv = ev.where(F.col("event_id") % 100 == 0).select(
        F.col("event_id").alias("iid"),
        (F.col("value") - 3).alias("lo"),
        (F.col("value") + 3).alias("hi"),
    )
    via_pairs = {
        r["iid"]: (r["n"], int(r["s"]))
        for r in range_join(ev, iv, "value", "lo", "hi")
        .groupBy("iid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    via_prefix = {
        r["iid"]: (r["n_pts"], int(r["sum_event_id"]))
        for r in range_aggregate(ev, iv, "value", "lo", "hi",
                                 sum_cols=["event_id"]).collect()
        if r["n_pts"] > 0
    }
    assert via_pairs == via_prefix


def test_range_aggregate_no_pair_blowup_in_plan(spark):
    """The executed plan must contain no join between the point and
    interval sides before aggregation (the probe union + window is the
    whole algorithm); only the broadcast offset join and the final
    per-interval join appear."""
    from pyspark.sql import functions as F

    from dataforge_spark.relational import range_aggregate

    points = spark.range(10000).select(
        F.col("id").alias("pid"), (F.col("id") % 997).cast("double").alias("x")
    )
    iv = spark.range(50).select(
        F.col("id").alias("iid"),
        (F.col("id") * 19.0).alias("lo"),
        (F.col("id") * 19.0 + 40).alias("hi"),
    )
    out = range_aggregate(points, iv, "x", "lo", "hi", sum_cols=["pid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_aggregate_null_and_nan_points_excluded(spark):
    import math

    from dataforge_spark.relational import range_aggregate

    points = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, float("nan")), (4, 6.0)],
        "pid long, x double",
    )
    iv = spark.createDataFrame([(1, 4.0, 7.0)], "iid long, lo double, hi double")
    rows = range_aggregate(points, iv, "x", "lo", "hi", sum_cols=["pid"],
                           n_buckets=4).collect()
    assert len(rows) == 1
    assert rows[0]["n_pts"] == 2 and int(rows[0]["sum_pid"]) == 5


def test_range_aggregate_rejects_reserved_iid(spark):
    import pytest as _pytest

    from dataforge_spark.relational import range_aggregate

    points = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    iv = spark.createDataFrame([(1, 4.0, 7.0, 9)],
                               "iid long, lo double, hi double, __iid long")
    with _pytest.raises(ValueError):
        range_aggregate(points, iv, "x", "lo", "hi")


def test_range_aggregate_integral_sums_stay_exact_past_2_53(spark):
    """Integral sum columns accumulate as decimal(38,0): a cumulative
    prefix sum past 2^53 in double would round to the nearest ulp (8 at
    ~4.5e16) and the interval differences would inherit the error."""
    from dataforge_spark.relational import range_aggregate

    big = 1 << 53
    pts = spark.createDataFrame(
        [(float(i), big + i) for i in range(1, 6)], "v double, w bigint"
    )
    iv = spark.createDataFrame([(0.0, 10.0)], "lo double, hi double")
    out = range_aggregate(pts, iv, "v", "lo", "hi", sum_cols=["w"]).collect()[0]
    assert out["n_pts"] == 5
    assert int(out["sum_w"]) == sum(big + i for i in range(1, 6))


def test_asof_tie_breakers_deterministic(spark):
    """tie_breakers resolves equal-(by, on) right rows to the max-tie
    row inside the carry window — identical to pre-aggregating right
    with max(), which it replaces to save that aggregate's exchange."""
    from pyspark.sql import functions as F

    from dataforge_spark.relational import asof_join

    left = spark.createDataFrame(
        [("u", 10), ("u", 25), ("v", 10)], "user string, t long"
    )
    right = spark.createDataFrame(
        [("u", 10, 1), ("u", 10, 7), ("u", 10, 3), ("u", 20, 5),
         ("u", 20, 9), ("v", 5, 2), ("v", 5, 8)],
        "user string, t long, sid long",
    )
    out = asof_join(left, right, on="t", by=["user"],
                    right_cols=["sid"], tie_breakers=["sid"])
    got = {(r["user"], r["t"]): r["sid"] for r in out.collect()}
    assert got == {("u", 10): 7, ("u", 25): 9, ("v", 10): 8}

    # forward direction: nearest at-or-after, max tie wins too
    outf = asof_join(left, right, on="t", by=["user"],
                     right_cols=["sid"], direction="forward",
                     tie_breakers=["sid"])
    gotf = {(r["user"], r["t"]): r["sid"] for r in outf.collect()}
    assert gotf == {("u", 10): 7, ("u", 25): None, ("v", 10): None}

    import pytest

    with pytest.raises(ValueError, match="tie_breakers"):
        asof_join(left, right, on="t", by=["user"],
                  right_cols=["sid"], tie_breakers=["nope"])
