"""Span-level exact dedup (dedup/spans.py) — planted-case semantics plus
a differential check against a serial reimplementation."""

import pytest
from pyspark.sql import functions as F

from dataforge_spark.dedup.spans import explode_spans, repeated_spans, span_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repeated_span_removed_globally_keep_first(spark):
    shared = "a b c d e"
    df = _df(
        spark,
        [
            (1, f"{shared} one two three four five"),
            (2, f"zero nine eight seven six {shared}"),
        ],
    )
    out = {r["doc_id"]: r for r in span_dedup(df, span_words=5).collect()}
    # doc 1 keeps both spans; doc 2 loses the shared span (its span_idx 1)
    assert out[1]["text"] == f"{shared} one two three four five"
    assert out[1]["n_spans_kept"] == 2
    assert out[2]["text"] == "zero nine eight seven six"
    assert out[2]["n_spans_kept"] == 1


def test_intra_document_repeat_removed(spark):
    df = _df(spark, [(1, "a b c d e a b c d e tail")])
    row = span_dedup(df, span_words=5).collect()[0]
    # second occurrence of the 5-gram inside the SAME doc is removed;
    # the short tail span survives
    assert row["text"] == "a b c d e tail"
    assert row["n_spans_kept"] == 2


def test_fully_deduplicated_doc_survives_as_empty_row(spark):
    df = _df(spark, [(1, "a b c d e"), (2, "a b c d e")])
    out = {r["doc_id"]: r for r in span_dedup(df, span_words=5).collect()}
    assert out[1]["text"] == "a b c d e"
    assert out[2]["text"] == "" and out[2]["n_spans_kept"] == 0


def test_null_text_dropped_short_doc_kept(spark):
    df = _df(spark, [(1, None), (2, "xy")])
    out = span_dedup(df, span_words=5).collect()
    assert [r["doc_id"] for r in out] == [2]
    assert out[0]["text"] == "xy" and out[0]["n_spans_kept"] == 1


def test_whitespace_normalized_on_rebuild(spark):
    df = _df(spark, [(1, "  a   b \t c  ")])
    row = span_dedup(df, span_words=2).collect()[0]
    assert row["text"] == "a b c"
    assert row["n_spans_kept"] == 2  # 'a b' + 'c'


def test_repeated_spans_audit(spark):
    df = _df(
        spark,
        [(1, "a b c d e f"), (2, "a b c x y z"), (3, "a b c d e f")],
    )
    rows = {r["span"]: r for r in repeated_spans(df, span_words=3).collect()}
    assert rows["a b c"]["n_occurrences"] == 3
    assert rows["a b c"]["n_docs"] == 3
    assert rows["a b c"]["keeper_id"] == 1
    assert rows["d e f"]["n_occurrences"] == 2
    assert "x y z" not in rows


def _serial_span_dedup(rows, k):
    seen = set()
    out = {}
    for doc_id, text in sorted(rows):
        words = text.split()
        spans = [" ".join(words[i : i + k]) for i in range(0, len(words), k)]
        kept = []
        for s in spans:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        out[doc_id] = (" ".join(kept), len(kept))
    return out


@pytest.mark.parametrize("k", [3, 7])
def test_differential_vs_serial_on_documents(spark, documents, k):
    df = documents.select("doc_id", "text").limit(120)
    got = {
        r["doc_id"]: (r["text"], r["n_spans_kept"])
        for r in span_dedup(df, span_words=k).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in df.collect()]
    want = _serial_span_dedup(rows, k)
    assert got == want


def test_explode_spans_no_shuffle(spark):
    """Extraction over an ALREADY-PARALLEL input must not shuffle — the
    gated rebalance (for single-row-group files) has to be a no-op here.
    The input is explicitly repartitioned to cluster parallelism so this
    actually exercises the gate's no-op branch (a 1-row createDataFrame
    happens to satisfy it too, but not by intent)."""
    df = _df(spark, [(1, "a b c d e f g")]).repartition(
        spark.sparkContext.defaultParallelism
    )
    plan = explode_spans(df, span_words=3)._jdf.queryExecution().executedPlan().toString()
    # the only exchange is the input repartition this test itself added
    assert plan.count("Exchange") == 1


def test_span_dedup_string_ids(spark):
    """Non-integral ids take the struct-min keep-first path; semantics
    must match the integral fast path (keep-first by (id, span_idx))."""
    from dataforge_spark.dedup.spans import span_dedup

    rows = [
        ("a", "one two three four five six"),
        ("b", "one two three four five six"),  # exact dup of a
        ("c", "something else entirely here now ok"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: (r["text"], r["n_spans_kept"])
           for r in span_dedup(df, span_words=3).collect()}
    assert got["a"] == ("one two three four five six", 2)
    assert got["b"] == ("", 0)          # fully deduplicated, restored row
    assert got["c"][1] == 2
    assert "d" not in got               # NULL text excluded, as before
