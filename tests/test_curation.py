"""Curation operators: deterministic splits, contamination, packing."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.curation import (
    SPLIT_BUCKETS,
    contamination,
    hash_split,
    pack_sequences,
    split_bucket,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(documents):
    return documents


def test_hash_split_is_deterministic_and_partition_invariant(spark, docs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = hash_split(docs, w, key_cols=["doc_id"], seed=7)
    b = hash_split(docs.repartition(13), w, key_cols=["doc_id"], seed=7)
    merged = a.select("doc_id", "split").join(
        b.select("doc_id", F.col("split").alias("split2")), "doc_id"
    )
    assert merged.where(F.col("split") != F.col("split2")).count() == 0
    # complete partition: every row gets exactly one split
    assert a.where(F.col("split").isNull()).count() == 0
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert 0.7 * n < counts["train"] < 0.9 * n  # md5 uniformity at n=50
    assert set(counts) <= {"train", "val", "test"}


def test_hash_split_group_keys_keep_groups_together(spark, docs):
    out = hash_split(docs, {"a": 0.5, "b": 0.5}, key_cols=["source"], seed=1)
    # every source maps to exactly one split
    assert (
        out.groupBy("source")
        .agg(F.count_distinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
        == 0
    )


def test_hash_split_rejects_bad_weights(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.2}, key_cols=["doc_id"])
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 1.0}, key_cols=[])


def test_stratified_sample_deterministic_subset_and_strata(spark, docs):
    fr = {"en": 0.5, "de": 1.0}
    s1 = stratified_sample(docs, fr, "lang", key_cols=["doc_id"], seed=3)
    s2 = stratified_sample(docs.repartition(9), fr, "lang", key_cols=["doc_id"], seed=3)
    assert sorted(r["doc_id"] for r in s1.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in s2.select("doc_id").collect()
    )
    langs = {r["lang"] for r in s1.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # unlisted strata dropped
    # de fraction 1.0 keeps every de doc
    assert (
        s1.where(F.col("lang") == "de").count()
        == docs.where(F.col("lang") == "de").count()
    )
    # global-fraction form needs no strata_col
    g = stratified_sample(docs, 1.0, None, key_cols=["doc_id"])
    assert g.count() == docs.count()


def test_split_bucket_null_key_parts_do_not_collide(spark):
    """concat_ws drops NULL args; the sentinel must keep ("a", NULL) and
    (NULL, "a") in (generally) different buckets and all-NULL stable."""
    df = spark.createDataFrame(
        [("a", None), (None, "a"), (None, None), ("a", "a")],
        "x string, y string",
    )
    rows = df.withColumn("b", split_bucket(["x", "y"], seed=0)).collect()
    b = {(r["x"], r["y"]): r["b"] for r in rows}
    assert b[("a", None)] != b[(None, "a")]
    assert all(v is not None for v in b.values())


def test_split_and_sample_use_the_same_bucket(spark, docs):
    """sample(f) == split rows whose bucket < f·BUCKETS — one hash family."""
    got = stratified_sample(docs, 0.3, None, key_cols=["doc_id"], seed=5)
    manual = docs.withColumn("__bkt", split_bucket(["doc_id"], seed=5)).where(
        F.col("__bkt") < int(0.3 * SPLIT_BUCKETS)
    )
    assert got.count() == manual.count()


def test_contamination_flags_exactly_the_planted_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # contains eval 5-gram
            (2, "one two three four five six"),            # clean
            (3, "tiny doc"),                               # < n words
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in contamination(corpus, eval_set, n=5).collect()}
    assert rows[1]["contaminated"] and rows[1]["n_hits"] == 1
    assert rows[1]["n_grams"] == 2
    assert not rows[2]["contaminated"] and rows[2]["n_hits"] == 0
    assert rows[3]["n_grams"] == 0 and not rows[3]["contaminated"]  # kept


def test_contamination_bloom_fallback_exact_and_map_only(spark, docs):
    """broadcast_grams=0 forces the oversized-eval bloom fallback: results
    must EQUAL the broadcast path (false positives die in the exact
    confirm semi-join), and the full exploded corpus must reach its
    per-doc aggregate without a join — only bloom-surviving candidate
    grams enter the semi-join."""
    eval_set = docs.where(F.col("doc_id") % 50 == 0)
    want = sorted(
        map(tuple, contamination(docs, eval_set, n=5).collect())
    )
    got_df = contamination(docs, eval_set, n=5, broadcast_grams=0)
    got = sorted(map(tuple, got_df.collect()))
    assert got == want

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    # the bloom probe (Arrow-evaled python UDF) gates the semi-join side
    assert "bloom_probe" in plan
    # planted contamination still found through the bloom path
    flagged = got_df.join(eval_set.select(F.col("doc_id").alias("id")), "id")
    assert flagged.where(~F.col("contaminated")).count() == 0


def test_contamination_planted_docs_via_bloom_fallback(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
            (3, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    rows = {
        r["id"]: r
        for r in contamination(corpus, eval_set, n=5, broadcast_grams=0).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["n_hits"] == 1
    assert rows[1]["n_grams"] == 2
    assert not rows[2]["contaminated"] and rows[2]["n_hits"] == 0
    assert rows[3]["n_grams"] == 0 and not rows[3]["contaminated"]


def test_contamination_self_overlap_on_real_docs(spark, docs):
    """Eval set drawn from the corpus: every eval doc (≥ n words) must be
    flagged when checked against itself."""
    eval_set = docs.where(F.col("doc_id") % 50 == 0)
    out = contamination(docs, eval_set, n=5)
    flagged = out.join(eval_set.select(F.col("doc_id").alias("id")), "id")
    assert flagged.where(~F.col("contaminated")).count() == 0


def test_pack_sequences_matches_serial_cumsum(spark, docs):
    out = pack_sequences(docs, budget=128, n_buckets=7).collect()
    got = {r["id"]: r for r in out}
    pdf = sorted(
        docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("t")
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    acc = 0
    for r in pdf:
        g = got[r["doc_id"]]
        assert g["start_offset"] == acc
        assert g["n_tokens"] == r["t"]
        assert g["pack_id"] == acc // 128
        acc += r["t"]


def test_pack_sequences_bucket_count_invariance(spark, docs):
    a = pack_sequences(docs, budget=64, n_buckets=2).collect()
    b = pack_sequences(docs, budget=64, n_buckets=31).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_sequences_empty_input(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty, budget=10).count() == 0


def test_intercorpus_dedup_drops_exactly_the_seen_docs(spark, docs):
    from dataforge_spark.dedup.intercorpus import intercorpus_dedup

    seen = docs.where(F.col("doc_id") % 3 == 0).select("text")
    out = intercorpus_dedup(docs, seen)
    assert out.count() == docs.where(F.col("doc_id") % 3 != 0).count()
    assert out.where(F.col("doc_id") % 3 == 0).count() == 0
    assert set(out.columns) == set(docs.columns)  # digest col dropped
    # broadcast path for a small reference: no shuffle of the new corpus
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_intercorpus_dedup_shuffle_path_same_result(spark, docs, monkeypatch):
    """All three physical routes agree: the r8 estimate-gated broadcast
    fast path (no count probe, no distinct), the exact count-gated
    broadcast, and the digests-only shuffle anti-join. The estimate gate
    is disabled via monkeypatch — every in-memory test frame estimates
    tiny, so broadcast_rows alone can no longer reach the slow paths."""
    from dataforge_spark import partitioning
    from dataforge_spark.dedup.intercorpus import intercorpus_dedup

    seen = docs.where(F.col("doc_id") % 3 == 0).select("text")
    a = sorted(r["doc_id"] for r in
               intercorpus_dedup(docs, seen).select("doc_id").collect())

    monkeypatch.setattr(partitioning, "plan_size_bytes", lambda df: None)
    b = sorted(r["doc_id"] for r in
               intercorpus_dedup(docs, seen, broadcast_rows=1)
               .select("doc_id").collect())  # shuffle anti-join
    c = sorted(r["doc_id"] for r in
               intercorpus_dedup(docs, seen)
               .select("doc_id").collect())  # count-gated broadcast
    assert a == b == c


def test_intercorpus_fast_path_rowcount_backstop(spark, docs, monkeypatch):
    """ADVICE r8: a byte-small reference can still hold more distinct
    digests than the broadcast budget (short texts store smaller than
    their md5s), so the no-distinct-probe fast path must verify the RAW
    row count before broadcasting. With the budget shrunk below the
    reference's row count, the byte estimate alone must not broadcast —
    the anti-join has to fall through to the probed (shuffle) path and
    still return the exact result."""
    from dataforge_spark import partitioning
    from dataforge_spark.dedup import intercorpus

    seen = docs.where(F.col("doc_id") % 3 == 0).select("text")
    n_ref = seen.count()
    assert n_ref > 2
    monkeypatch.setattr(partitioning, "plan_size_bytes", lambda df: 1024)
    monkeypatch.setattr(intercorpus, "_DEFAULT_BROADCAST_ROWS", 2)
    # byte estimate says tiny, but the raw row count exceeds the budget:
    # the no-probe broadcast must be refused ...
    assert intercorpus._fast_broadcast_ok(seen, broadcast_rows=2) is False
    # ... and accepted again once the budget covers the rows
    assert intercorpus._fast_broadcast_ok(seen, broadcast_rows=n_ref) is True
    # end-to-end through the refused path stays exact
    out = intercorpus.intercorpus_dedup(docs, seen, broadcast_rows=2)
    assert out.count() == docs.where(F.col("doc_id") % 3 != 0).count()


def test_repetition_metrics_flags_templated_text(spark):
    from dataforge_spark.functions.text_analysis import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),   # one bigram repeated 5x
            (2, "a b c d e f g"),                    # all bigrams unique
            (3, "x"),                                # < n words
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in repetition_metrics(df, n=2).collect()}
    assert rows[1]["rep_top_frac"] == 1.0 and rows[1]["rep_dup_frac"] == 1.0
    assert rows[2]["rep_top_frac"] == pytest.approx(1 / 6)
    assert rows[2]["rep_dup_frac"] == 0.0
    assert rows[3]["n_ngrams"] == 0 and rows[3]["rep_top_frac"] == 0.0


def test_stopword_regex_matches_token_filter_reference(spark):
    """stopword_hits' lookaround regexp_count must count exactly the
    whitespace-delimited tokens the old F.filter+isin formulation
    counted: punctuation-attached words don't hit, substrings don't hit,
    multiplicity counts, case-insensitive, NBSP is not a delimiter."""
    from pyspark.sql import functions as F

    from dataforge_spark.functions.text_analysis import (
        STOPWORDS, stopword_hits, tokens,
    )

    rows = [
        (1, "the cat and the hat"),          # 'the' x2, 'and' x1
        (2, "The THE the,"),                 # case folds; 'the,' is no hit
        (3, "weather lather bandit"),        # substrings never hit
        (4, "the\tand\nof to"),              # tab/newline delimit
        (5, "the cat"),                 # NBSP glues: zero hits
        (6, ""),
        (7, None),
        (8, "  the  "),                      # leading/trailing spaces
    ]
    df = spark.createDataFrame(rows, "id long, text string")

    def reference(col, lang):  # the pre-round-5 interpreted formulation
        return F.size(F.filter(tokens(F.lower(col)), lambda x: x.isin(STOPWORDS[lang])))

    for lang in STOPWORDS:
        got = {r["id"]: r["h"] for r in df.select(
            "id", stopword_hits(F.col("text"), lang).alias("h")).collect()}
        want = {r["id"]: r["h"] for r in df.select(
            "id", reference(F.col("text"), lang).alias("h")).collect()}
        # NULL text: new form yields NULL where old yielded -1; both are
        # masked by every caller — normalize for the comparison
        norm = lambda v: None if v in (None, -1) else v  # noqa: E731
        assert {k: norm(v) for k, v in got.items()} == \
               {k: norm(v) for k, v in want.items()}, lang
    # spot values
    en = {r["id"]: r["h"] for r in df.select(
        "id", stopword_hits(F.col("text"), "en").alias("h")).collect()}
    assert en[1] == 3 and en[2] == 2 and en[3] == 0 and en[4] == 4
    assert en[5] == 0 and en[6] == 0 and en[8] == 1


def test_compression_ratio_orders_redundancy(spark):
    """Repetitive text must compress well below natural-ish prose, and
    high-entropy text must barely compress; NULL/empty stay NULL."""
    from pyspark.sql import functions as F

    from dataforge_spark.functions.text_analysis import compression_ratio

    rows = [
        (1, "spam spam spam spam " * 50),
        (2, "the quick brown fox jumps over the lazy dog and then wanders "
            "through seventeen different meadows describing each in turn"),
        (3, __import__("hashlib").sha512(b"entropy").hexdigest() * 1),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = {r["doc_id"]: r["ratio"] for r in df.select(
        "doc_id", compression_ratio(F.col("text")).alias("ratio")).collect()}
    assert got[4] is None and got[5] is None
    assert got[1] < 0.1          # pure repetition compresses near nothing
    assert 0.3 < got[2] < 1.0    # prose sits mid-range
    assert got[3] > 0.5          # high-entropy hex barely compresses
    assert got[1] < got[2] and got[1] < got[3]


def test_pii_redaction_replaces_typed_placeholders(spark):
    from pyspark.sql import functions as F

    from dataforge_spark.functions.pii import redact_pii, redaction_counts

    rows = [
        (1, "mail a.b@ex.com or visit https://ex.com/x?q=1 today"),
        (2, "call 555-867-5309 or +1 415 555 1234 from 10.0.0.1"),
        (3, "ssn 123-45-6789 card 4111 1111 1111 1111 end"),
        (4, "no pii here, just 7 words and the year 2024"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "mail <EMAIL> or visit <URL> today"
    assert "<PHONE>" in got[2] and "555-867-5309" not in got[2]
    assert "<IP>" in got[2] and "10.0.0.1" not in got[2]
    assert "<SSN>" in got[3] and "<CARD>" in got[3]
    assert "123-45-6789" not in got[3] and "4111" not in got[3]
    assert got[4] == rows[3][1]  # untouched prose, year survives
    assert got[5] is None

    counts = redaction_counts(df, "text")
    assert counts["EMAIL"] == 1 and counts["URL"] == 1
    assert counts["SSN"] == 1 and counts["CARD"] == 1
    assert counts["PHONE"] >= 2 and counts["IP"] == 1

    # kinds restriction: only emails touched
    only = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", redact_pii(F.col("text"), kinds=["EMAIL"]).alias("red")).collect()}
    assert only[1] == "mail <EMAIL> or visit https://ex.com/x?q=1 today"
    assert only[2] == rows[1][1]


def test_pii_ip_with_3_digit_octets_beats_phone(spark):
    """IP must be ordered before PHONE: the phone regex matches the first
    two octets of a dotted-quad with 3-digit octets, which used to yield
    '<PHONE>.1.100' and leave the tail unredacted."""
    from pyspark.sql import functions as F

    from dataforge_spark.functions.pii import redact_pii

    rows = [
        (1, "server at 192.168.001.100 responded"),
        (2, "host 203.120.113.195 port 80"),
        # dotted phone must still redact as PHONE (IP needs 4 octets)
        (3, "call 555.867.5309 now"),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "server at <IP> responded"
    assert got[2] == "host <IP> port 80"
    assert got[3] == "call <PHONE> now"


def test_chunk_documents_covers_and_overlaps(spark):
    from dataforge_spark.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(1, text), (2, "a b c"), (3, ""), (4, "solo")],
        "doc_id: bigint, text: string",
    )
    out = chunk_documents(df, max_tokens=10, overlap=2).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1: stride 8 → chunks at 0,8,16 → ceil((25-2)/8)=3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk_id"] for r in c1] == [0, 1, 2]
    assert c1[0]["chunk_text"].split() == [f"w{i}" for i in range(10)]
    assert c1[1]["chunk_text"].split() == [f"w{i}" for i in range(8, 18)]
    assert c1[2]["chunk_text"].split() == [f"w{i}" for i in range(16, 25)]
    # consecutive chunks share exactly `overlap` tokens
    assert c1[0]["chunk_text"].split()[-2:] == c1[1]["chunk_text"].split()[:2]
    # short doc → one whole chunk; empty doc → no chunks; 1-token doc ok
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert 3 not in by_doc
    assert by_doc[4][0]["chunk_n_tokens"] == 1
    # reconstruction: dropping the overlap prefix of chunks 1+ rebuilds doc 1
    rebuilt = c1[0]["chunk_text"].split()
    for r in c1[1:]:
        rebuilt += r["chunk_text"].split()[2:]
    assert rebuilt == text.split()


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from dataforge_spark.curation import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id: bigint, text: string")
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=0)
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=5, overlap=5)


def test_sample_n_per_group_exact_deterministic(spark, docs):
    from dataforge_spark.curation import sample_n_per_group

    out1 = sample_n_per_group(docs, 5, "lang", key_cols=["doc_id"], seed=2)
    out2 = sample_n_per_group(
        docs.repartition(11), 5, "lang", key_cols=["doc_id"], seed=2
    )
    a = sorted(r["doc_id"] for r in out1.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in out2.select("doc_id").collect())
    assert a == b  # partition-invariant
    per = {r["lang"]: r["n"] for r in
           out1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, cnt in totals.items():
        assert per.get(lang, 0) == min(5, cnt)  # exactly n (or whole group)


def test_sample_n_per_group_null_group_and_undershoot(spark):
    from dataforge_spark.curation import sample_n_per_group

    rows = [(i, "g" if i % 2 == 0 else None) for i in range(40)]
    df = spark.createDataFrame(rows, "id: bigint, grp: string")
    out = sample_n_per_group(df, 3, "grp", key_cols=["id"])
    per: dict = {}
    for r in out.collect():
        per[r["grp"]] = per.get(r["grp"], 0) + 1
    assert per == {"g": 3, None: 3}
    # tiny groups below n come back whole
    small = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                                  "id: bigint, grp: string")
    got = sample_n_per_group(small, 5, "grp", key_cols=["id"]).count()
    assert got == 3


def test_quality_filter_flags_spam_keeps_prose(spark):
    from dataforge_spark.curation import quality_filter

    prose = ("the quick brown fox jumps over the lazy dog and it runs "
             "through the field while the sun is high in the sky today "
             "and the birds are singing in the trees near the old river")
    rows = [
        (1, prose),
        (2, "buy now " * 60),          # repetition: rep_top/dup ≈ 1
        (3, "xz"),                      # too short: quality < 0.5
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = {r["doc_id"]: r for r in quality_filter(
        df, compression_band=(0.25, 0.95)).collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["rep_dup_frac"] > 0.9
    assert got[3]["keep"] is False
    assert 0.25 <= got[1]["zlib_ratio"] <= 0.95
