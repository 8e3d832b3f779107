"""Adversarial-cardinality tests for the driver-side-collect gates
(VERDICT round-1 item 6): each operator that ever collects must stay
bounded — or bail out — when the domain is near-unique."""

from pyspark.sql import functions as F

from dataforge_spark.operators.encoding import encode_label
from dataforge_spark.operators.typo_fix import fix_typos


def test_fuzzy_match_near_unique_column_takes_lsh_path(spark):
    # 5000 distinct values, gate at 100 → the O(u²) driver matcher must
    # NOT run. Instead of the old silent skip, the LSH candidate path
    # runs, stays bounded (only candidate pairs reach the driver), and the
    # report labels the column approximate.
    df = spark.range(5000).select(
        F.md5(F.col("id").cast("string")).alias("name")
    )
    rep: dict = {}
    out = fix_typos(
        df, columns=["name"], method="fuzzy_match", max_distinct=100, report=rep
    )
    assert rep["name"]["method"] == "lsh_approx"
    assert rep["name"]["truncated"] is False
    assert out.count() == 5000
    # random hex values are nowhere near 0.8 difflib-similar → no merges
    assert rep["name"]["corrections"] == 0


def test_fuzzy_match_lsh_path_recovers_planted_typo(spark):
    # 300 random-hex distinct values push the domain past the gate; a
    # planted frequent/rare spelling pair must still be unified by the
    # approximate path, with the same difflib verification as the exact
    # path.
    base = spark.range(300).select(F.md5(F.col("id").cast("string")).alias("et"))
    planted = spark.createDataFrame(
        [("spark",)] * 50 + [("sparkk",)] * 3, "et: string"
    )
    df = base.unionByName(planted)
    rep: dict = {}
    out = fix_typos(
        df, columns=["et"], method="fuzzy_match", max_distinct=100, report=rep
    )
    assert rep["et"]["method"] == "lsh_approx"
    assert rep["et"]["corrections"] >= 1
    assert out.where(F.col("et") == "sparkk").count() == 0
    assert out.where(F.col("et") == "spark").count() == 53


def test_fuzzy_match_exact_path_reports(spark):
    rows = [("click",)] * 50 + [("clickk",)] * 3
    df = spark.createDataFrame(rows, "et: string")
    rep: dict = {}
    fix_typos(df, columns=["et"], method="fuzzy_match", max_distinct=100,
              report=rep)
    assert rep["et"]["method"] == "exact"
    assert rep["et"]["n_distinct"] == 2
    assert rep["et"]["corrections"] == 1


def test_fuzzy_match_still_runs_under_gate(spark):
    rows = [("click",)] * 50 + [("clickk",)] * 3
    df = spark.createDataFrame(rows, "et: string")
    out = fix_typos(df, columns=["et"], method="fuzzy_match",
                    similarity_threshold=0.8, max_distinct=100)
    assert out.where(F.col("et") == "clickk").count() == 0
    assert out.where(F.col("et") == "click").count() == 53


def test_spell_check_vocab_stays_bounded(spark):
    # 20k distinct words, caps at 500: dictionary and rare sets are
    # limited Spark-side; the op completes without a full-vocab collect.
    df = spark.range(20000).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("t")
    )
    out = fix_typos(df, columns=["t"], method="spell_check", max_vocab=500)
    assert out.count() == 20000


def test_encode_label_high_cardinality_broadcast_path(spark):
    # force the distributed dense_rank path with a tiny literal cap;
    # codes must still be the sorted-lexicographic assignment.
    df = spark.createDataFrame([("b",), ("a",), ("c",), ("a",)], "k: string")
    out, mappings = encode_label(df, columns=["k"], max_literal_categories=2)
    assert mappings["k"] == {}  # too large to retain driver-side
    got = [r["k"] for r in out.orderBy("k").collect()]
    # a→0 (×2), b→1, c→2 in sorted order
    assert sorted(got) == [0, 0, 1, 2]


def test_encode_label_literal_and_broadcast_paths_agree(spark, customer):
    small = customer.select("c_custkey", "c_mktsegment")
    lit_out, _ = encode_label(small, columns=["c_mktsegment"])
    bc_out, _ = encode_label(small, columns=["c_mktsegment"], max_literal_categories=1)
    a = {(r["c_custkey"], r["c_mktsegment"]) for r in lit_out.collect()}
    b = {(r["c_custkey"], r["c_mktsegment"]) for r in bc_out.collect()}
    assert a == b


def test_numpy_isolation_forest_algorithm():
    import numpy as np

    from dataforge_spark.operators.iforest_numpy import NumpyIsolationForest

    rng = np.random.RandomState(0)
    X = np.concatenate([rng.normal(0, 1, 950), rng.uniform(8, 12, 50)])
    m = NumpyIsolationForest(contamination=0.05, random_state=42).fit(X)
    pred = m.predict(X)
    flagged = np.where(pred == -1)[0]
    # ~5% flagged, and the planted far cluster dominates the flags
    assert 25 <= len(flagged) <= 75
    assert (flagged >= 950).sum() >= 40  # most of the 50 planted outliers
    scores = m.score_samples(np.array([0.0, 10.0]))
    assert scores[0] > scores[1]  # center scores as more normal


def _timed(df) -> float:
    import time

    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def test_minhash_banding_bounded_under_90pct_hot_key(spark):
    """90% of docs share one text → every band bucket for that text holds
    0.9·N members. The max_bucket prune must keep the self-join bounded
    (no 0.81·N² pair blow-up): wall-time stays within a small factor of
    the uniform-key run and the prune is REPORTED, not silent."""
    from dataforge_spark.dedup.minhash import minhash_dedup_pairs

    n_docs = 20_000
    base = spark.range(n_docs)
    words = "w{} x{} y{} z{} p{} q{}"
    uniform = base.select(
        F.col("id").alias("doc_id"),
        F.format_string(words, "id", "id", "id", "id", "id", "id").alias("text"),
    )
    hot = base.select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 < 9, F.lit("the same boilerplate text repeated here")
        ).otherwise(
            F.format_string(words, "id", "id", "id", "id", "id", "id")
        ).alias("text"),
    )
    t_uniform = _timed(minhash_dedup_pairs(uniform, threshold=0.5))
    stats: dict = {}
    t_hot = _timed(minhash_dedup_pairs(hot, threshold=0.5, stats=stats))
    # the degenerate 18k-member buckets were pruned and reported
    assert stats["dropped_buckets"] >= 1
    assert stats["dropped_members"] >= 10_000
    assert t_hot < t_uniform * 6 + 5, (t_hot, t_uniform)


def test_ordered_fill_bucketed_path_bounded_under_90pct_hot_key(spark, monkeypatch):
    """90% of rows share one order value → they land in ONE literal
    bucket, so a single window task sorts 90% of the data. At 100 TB the
    cure is upstream (salting ties is semantically free: fill among equal
    order keys is tie-ambiguous anyway); here we pin that the plan
    completes within a small factor of the uniform-key run instead of
    cliffing. Fast path is disabled to exercise the bucketed plan."""
    from dataforge_spark.operators import missing_values

    monkeypatch.setattr(missing_values, "FAST_FILL_MAX_BYTES", -1)
    n = 2_000_000
    base = spark.range(n).select(
        "id",
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id").cast("double")).alias("v"),
    )
    uniform = base.withColumn("k", F.col("id"))
    hot = base.withColumn(
        "k", F.when(F.col("id") % 10 < 9, F.lit(42)).otherwise(F.col("id"))
    )
    t_uniform = _timed(
        missing_values.fix_missing_values(
            uniform, "forward_fill", columns=["v"], order_col="k"
        )
    )
    t_hot = _timed(
        missing_values.fix_missing_values(
            hot, "forward_fill", columns=["v"], order_col="k"
        )
    )
    assert t_hot < t_uniform * 6 + 5, (t_hot, t_uniform)


def test_per_query_topk_window_bounded_under_hot_query(spark):
    """The per-query top-k row_number window (similarity/ivf.py
    _probe_and_score tail): a hot query with a huge candidate set makes
    one window partition giant. AQE + the rows-to-sort bound must keep
    wall-time within a small factor of the uniform distribution on the
    SAME total row count."""
    from pyspark.sql import Window

    n = 2_000_000
    scored = spark.range(n).select(
        F.col("id"),
        (F.rand(seed=7)).alias("cos_sim"),
    )
    uniform = scored.withColumn("query_id", F.col("id") % 2000)
    hot = scored.withColumn(
        "query_id", F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 2000)
    )

    def topk(df):
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("id")
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= 10)
            .drop("_rn")
        )

    t_uniform = _timed(topk(uniform))
    t_hot = _timed(topk(hot))
    assert t_hot < t_uniform * 6 + 5, (t_hot, t_uniform)
    # correctness under skew: the hot query still returns exactly k rows
    assert topk(hot).where(F.col("query_id") == 0).count() == 10


def test_bfill_single_bucket_is_linear_not_quadratic(spark, monkeypatch):
    """Regression gate for the round-5 scale-killer: backward fill
    expressed as first_value over (currentRow, unboundedFollowing) makes
    Spark re-evaluate the aggregate per row — O(rows²) per window
    partition (500k rows in one bucket ran for MINUTES). The DESC-ordered
    running-frame formulation must stay linear: one 500k-row bucket
    completes in seconds."""
    import time

    from dataforge_spark.operators import missing_values

    n = 500_000
    df = spark.range(n).select(
        "id",
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id").cast("double")).alias("v"),
    ).coalesce(1)
    t0 = time.time()
    out = missing_values.fix_missing_values(
        df, "backward_fill", columns=["v"], order_col="id"
    )
    out.write.format("noop").mode("overwrite").save()
    took = time.time() - t0
    assert took < 60, f"single-bucket bfill took {took:.0f}s — quadratic frame?"
    # spot semantic check: id=0 (null) backfills from id=1
    row = out.where(F.col("id") == 0).collect()[0]
    assert row["v"] == 1.0


def test_iforest_searchsorted_fast_path_bit_identical_to_walk():
    """1-D scoring via interval searchsorted must be BIT-identical to the
    generic level-walk — the o4 oracle pins the flagged set's checksum, so
    any float drift here breaks the correctness gate."""
    import numpy as np

    from dataforge_spark.operators.iforest_numpy import NumpyIsolationForest

    rng = np.random.RandomState(7)
    X = np.concatenate(
        [rng.normal(0, 1, 20_000), rng.normal(50, 3, 500),
         np.array([1e12, -1e12, 0.0, 0.0])]  # far points + exact duplicates
    ).reshape(-1, 1)
    m = NumpyIsolationForest(random_state=3).fit(X)
    assert all(t.bounds is not None for t in m.trees)
    fast_scores = m.score_samples(X)
    fast_pred = m.predict(X)
    for t in m.trees:  # disable the fast path -> generic walk
        t.bounds = None
    assert np.array_equal(fast_scores, m.score_samples(X))
    assert np.array_equal(fast_pred, m.predict(X))


def test_range_aggregate_bounded_under_hot_value(spark):
    """90% of points share ONE value: quantile boundaries cannot split an
    equal-value run, so one bucket holds the hot mass — but the running
    frame is incremental (linear, not quadratic), so the hot run must
    stay within a small factor of the uniform run and the answer exact."""
    import time

    from pyspark.sql import functions as F

    from dataforge_spark.relational import range_aggregate

    n = 2_000_000
    uniform = spark.range(n).select(
        F.col("id").alias("pid"), (F.col("id") % 9973).cast("double").alias("x")
    )
    hot = spark.range(n).select(
        F.col("id").alias("pid"),
        F.when(F.col("id") % 10 != 0, 42.0)
        .otherwise((F.col("id") % 9973).cast("double"))
        .alias("x"),
    )
    iv = spark.range(40).select(
        F.col("id").alias("iid"),
        (F.col("id") * 250.0).alias("lo"),
        (F.col("id") * 250.0 + 400.0).alias("hi"),
    )

    def run(points):
        t0 = time.time()
        rows = range_aggregate(points, iv, "x", "lo", "hi",
                               sum_cols=["pid"]).collect()
        return time.time() - t0, rows

    t_u, _ = run(uniform)
    t_h, rows_h = run(hot)
    # exactness under the hot value: interval 0 covers [0, 400] ∋ 42
    got = {r["iid"]: r["n_pts"] for r in rows_h}
    want_hot = spark.range(n).where(
        (F.when(F.col("id") % 10 != 0, 42.0)
         .otherwise((F.col("id") % 9973).cast("double"))).between(0.0, 400.0)
    ).count()
    assert got[0] == want_hot
    assert t_h < max(4.0 * t_u, t_u + 20.0), (t_u, t_h)
