"""SimHash must behave like a locality-sensitive fingerprint: identical
docs collide exactly, heavily-overlapping docs sit within the hamming
radius, and the planted near-dups in the testdata are recovered."""

from pyspark.sql import functions as F

from dataforge_spark.dedup.ngram_jaccard import jaccard_pairs
from dataforge_spark.dedup.simhash import simhash, simhash_pairs


def test_identical_docs_have_equal_simhash(spark, documents):
    docs = documents.select("doc_id", "text").limit(50)
    dup = docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    sigs = simhash(docs.unionByName(dup))
    joined = (
        sigs.alias("a")
        .join(sigs.alias("b"), F.col("a.id") + 1000 == F.col("b.id"))
        .where(F.col("a.simhash") != F.col("b.simhash"))
    )
    assert joined.count() == 0


def test_simhash_recovers_planted_near_dups(spark, documents):
    # ground truth: pairs with word-3-shingle jaccard >= 0.9 (the planted
    # near-dups; verified 25 pairs at sf0.01 via the minhash oracle)
    truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(documents, threshold=0.9, max_df=None).collect()
    }
    if not truth:
        return  # tiny sf may plant none
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(documents, max_hamming=12).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"simhash recall {recall} over {len(truth)} true pairs"


def test_minhash_reports_dropped_degenerate_buckets(spark):
    """Planted degenerate bucket: many docs sharing one text collide in
    every band; with max_bucket below the clone count the bucket is
    pruned and MUST be reported, while distinct docs still pair up."""
    from dataforge_spark.dedup.minhash import minhash_dedup_pairs

    clones = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(30)]
    near = [
        (100, "one two three four five six seven eight nine ten"),
        (101, "one two three four five six seven eight nine eleven"),
    ]
    df = spark.createDataFrame(clones + near, "doc_id: bigint, text: string")
    stats: dict = {}
    pairs = minhash_dedup_pairs(
        df, threshold=0.5, max_bucket=10, stats=stats
    ).collect()
    # every band-bucket holding the 30 clones (30 > max_bucket) is pruned
    assert stats["dropped_buckets"] >= 1
    assert stats["dropped_members"] >= 30
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in got
    assert not any(a < 30 and b < 30 for a, b in got)  # clone pairs pruned


def test_minhash_dedup_transitive_collapses_star_clusters(spark):
    """Star shape: hub ~ spokes but spokes dissimilar to each other —
    greedy keeps both spokes, transitive collapses the whole component."""
    from dataforge_spark.dedup.minhash import minhash_dedup

    hub = " ".join(f"w{i}" for i in range(40))
    spoke_a = " ".join(f"w{i}" for i in range(30)) + " xa ya za qa ra sa ta ua va wa"
    spoke_b = " ".join(f"w{i}" for i in range(10, 40)) + " xb yb zb qb rb sb tb ub vb wb"
    other = "completely different words entirely here nothing shared at all today"
    df = spark.createDataFrame(
        [(1, spoke_a), (2, hub), (3, spoke_b), (9, other)],
        "doc_id: bigint, text: string",
    )
    greedy = {r["doc_id"] for r in
              minhash_dedup(df, threshold=0.3).select("doc_id").collect()}
    trans = {r["doc_id"] for r in
             minhash_dedup(df, threshold=0.3, transitive=True)
             .select("doc_id").collect()}
    assert 9 in greedy and 9 in trans           # unrelated doc survives
    assert trans <= greedy                       # transitive is stricter
    assert trans == {1, 9}                       # component collapses to min id


def test_drop_near_duplicates_works_for_any_pair_source(spark, documents):
    """The shared survivor policy plugs into a simhash pair frame the
    same way minhash uses it."""
    from dataforge_spark.dedup.drop import drop_near_duplicates
    from dataforge_spark.dedup.simhash import simhash_pairs

    docs = documents.select("doc_id", "text").limit(60)
    dup = docs.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 5000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    pairs = simhash_pairs(corpus, max_hamming=0)  # identical docs only
    out = drop_near_duplicates(corpus, pairs, id_col="doc_id")
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not any(k >= 5000 for k in kept)  # every planted clone dropped
    assert kept >= {r["doc_id"] for r in docs.select("doc_id").collect()}


def test_pairs_from_signatures_matches_simhash_pairs(spark, documents):
    """r13 seam: the banded join split out of simhash_pairs must produce
    the identical pair set when fed precomputed (and checkpointed)
    signatures — the shape q_dedup_simhash_verified relies on to compute
    signatures once per invocation instead of once per count."""
    from dataforge_spark.dedup.simhash import (
        pairs_from_signatures,
        simhash,
        simhash_pairs,
    )

    docs = documents.select("doc_id", "text").limit(80)
    dup = docs.where(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    direct = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs(corpus, max_hamming=3).collect()
    }
    via_sigs = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in pairs_from_signatures(
            simhash(corpus).localCheckpoint(), max_hamming=3
        ).collect()
    }
    assert direct == via_sigs and len(direct) >= 8
