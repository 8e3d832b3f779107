"""End-to-end crawl → training-data pipeline test: a hand-built WARC
with planted defects (foreign-language doc, URL spelling duplicate,
low-quality repetition, near-duplicate text, an HTML page needing
boilerplate strip) must come out the other side as tokenized,
chunked, TFRecord-packed samples with every gate's removal visible in
the report and every sample decodable back to its source text."""

import glob
import gzip
import os
import uuid

import pytest
from pyspark.sql import functions as F

from dataforge_spark.crawl import crawl_to_training_data
from dataforge_spark.tfrecord import read_tfrecord


def _record(headers, payload: bytes) -> bytes:
    out = bytearray(b"WARC/1.1\r\n")
    for k, v in headers:
        out += f"{k}: {v}\r\n".encode()
    out += f"Content-Length: {len(payload)}\r\n\r\n".encode()
    out += payload + b"\r\n\r\n"
    return bytes(out)


@pytest.fixture(scope="module")
def crawl_dir(spark, documents):
    docs = [
        (r["doc_id"], r["text"], r["lang"])
        for r in documents.limit(25).collect()
    ]
    path = f"/tmp/crawl_e2e_{uuid.uuid4().hex[:8]}"
    os.makedirs(path)
    recs = []

    def add(uri, text, lang="en", ctype="text/plain"):
        recs.append(
            _record(
                [
                    ("WARC-Type", "conversion"),
                    ("WARC-Record-ID", f"<urn:uuid:{len(recs)}>"),
                    ("WARC-Date", "2026-01-01T00:00:00Z"),
                    ("WARC-Target-URI", uri),
                    ("WARC-Identified-Content-Language", lang),
                    ("Content-Type", ctype),
                ],
                text.encode("utf-8"),
            )
        )

    for doc_id, text, lang in docs:
        add(f"http://corpus.example/doc/{doc_id}", text, "en")
    base_id, base_text, _ = docs[0]
    # planted: URL spelling duplicate of doc 0 (same canonical URL)
    # lowercase spelling variant: sorts AFTER the original URI, so
    # keep-first retains the original record's text
    add(f"http://corpus.example:80/doc/{base_id}?utm_source=x", "spam copy")
    # planted: near-duplicate of doc 1's text
    add("http://other.example/neardup", docs[1][1] + " tail", "en")
    # planted: foreign-language doc
    add("http://xx.example/x", "texto extranjero repetido", "xx")
    # planted: low-quality repetition (fails the Gopher-style gate)
    add("http://junk.example/rep", "aa bb " * 200, "en")
    # planted: HTML page; visible body = doc 2's words REVERSED (so the
    # near-dup gate cannot link it to doc 2 itself)
    html_body = " ".join(reversed(docs[2][1].split()))
    add(
        "http://html.example/page",
        "<html><head><title>t</title><style>nav{}</style></head>"
        f"<body><script>var menu = 'menu';</script>"
        f"<div>{html_body}</div></body></html>",
        "en",
        ctype="text/html",
    )
    with open(os.path.join(path, "part-00000.warc.gz"), "wb") as fh:
        for r in recs:
            fh.write(gzip.compress(r, mtime=0))
    return path, docs


def test_crawl_pipeline_end_to_end(spark, crawl_dir):
    path, docs = crawl_dir
    out = f"/tmp/crawl_out_{uuid.uuid4().hex[:8]}"
    report, tok = crawl_to_training_data(
        spark,
        path,
        out,
        vocab_size=400,
        seq_len=64,
        keep_langs=["en"],
        min_quality=0.3,
        minhash_threshold=0.7,
    )
    n_docs = len(docs)
    assert report["records_in"] == n_docs + 5
    # language gate removes exactly the 'xx' record
    assert report["after_lang_filter"] == n_docs + 4
    # URL dedup removes the spelling duplicate (keep-first = the
    # lexicographically smaller raw URI, which is the original record)
    assert report["after_url_dedup"] == n_docs + 3
    # quality gate removes the "aa bb" repetition page
    assert report["after_quality"] == n_docs + 2
    # near-dedup removes AT LEAST one of {doc 1, neardup} (the corpus
    # itself may contain organic near-pairs at this threshold; the
    # planted pair is verified precisely below via survivorship)
    assert report["after_near_dedup"] < report["after_quality"]
    # tiny corpus may exhaust mergeable pairs before the target size
    assert 256 < report["vocab_size"] <= 400
    assert report["samples_out"] >= report["after_near_dedup"]
    assert report["tokens_out"] > 0

    back = read_tfrecord(
        spark, out,
        "doc_id bigint, chunk_idx bigint, input_ids array<bigint>, n_tokens bigint",
    )
    rows = back.collect()
    assert len(rows) == report["samples_out"]
    assert all(1 <= len(r["input_ids"]) <= 64 for r in rows)
    assert sum(r["n_tokens"] for r in rows) == report["tokens_out"]

    # map every source URI to its pipeline doc_id in one shot
    from dataforge_spark.functions.urls import canonicalize_url

    uris = [f"http://corpus.example/doc/{d}" for d, _t, _l in docs] + [
        "http://other.example/neardup", "http://html.example/page",
    ]
    id_of = {
        r["u"]: r["h"]
        for r in spark.createDataFrame([(u,) for u in uris], "u string")
        .select("u", F.xxhash64(canonicalize_url("u")).alias("h"))
        .collect()
    }
    present = {r["doc_id"] for r in rows}

    # exactly one of the planted near-dup pair survives
    pair = {
        id_of[f"http://corpus.example/doc/{docs[1][0]}"],
        id_of["http://other.example/neardup"],
    }
    assert len(pair & present) == 1

    # every surviving original doc decodes back EXACTLY from its
    # ordered chunks (check them all — ids are exact byte round-trips)
    checked = 0
    for (doc_id, text, _lang) in docs:
        did = id_of[f"http://corpus.example/doc/{doc_id}"]
        if did not in present:
            continue
        mine = sorted(
            (r for r in rows if r["doc_id"] == did),
            key=lambda r: r["chunk_idx"],
        )
        ids = [t for r in mine for t in r["input_ids"]]
        assert tok.decode(ids) == text
        checked += 1
    assert checked >= 15  # most of the corpus survives the gates

    # the HTML page survived as EXTRACTED text (title/nav dropped):
    # its decoded text contains doc 2's text but not 'menu'
    hid = (
        spark.createDataFrame([("http://html.example/page",)], "u string")
        .select(F.xxhash64(canonicalize_url("u")).alias("h"))
        .collect()[0]["h"]
    )
    hrows = sorted(
        (r for r in rows if r["doc_id"] == hid), key=lambda r: r["chunk_idx"]
    )
    assert hrows, "expected chunks for the HTML page"
    htext = tok.decode([t for r in hrows for t in r["input_ids"]])
    html_body = " ".join(reversed(docs[2][1].split()))
    assert html_body in htext and "menu" not in htext


def test_gopher_and_classifier_gates(spark, tmp_path):
    """The optional Gopher + GPT-3-classifier stages slot into the
    pipeline: stage counts appear in order, each gate removes exactly
    its planted victims, and the classifier (trained good-vs-gibberish)
    keeps the real docs."""
    import random

    from dataforge_spark.functions.quality_classifier import (
        train_quality_classifier,
    )

    rng = random.Random(11)
    vocab = (
        "the of and to in is was for on that with as it by at river "
        "city stone light history people trade harvest winter summer"
    ).split()
    def sentences():
        # ~70 words as 5 period-terminated sentences (so the page also
        # passes C4's terminal-punctuation and ≥3-sentence rules)
        return " ".join(
            " ".join(rng.choice(vocab) for _ in range(14)) + "."
            for _ in range(5)
        )

    good = [sentences() for _ in range(10)]
    # passes the cheap heuristic gate (length band alone scores 0.4)
    # but fails Gopher's ≥80%-alphabetic-words rule
    numeric_junk = (
        " ".join(str(rng.randint(0, 9999)) for _ in range(60))
        + " the and of that"
    )
    recs = []
    for i, t in enumerate(good):
        recs.append(_record(
            [("WARC-Type", "conversion"),
             ("WARC-Record-ID", f"<urn:uuid:g{i}>"),
             ("WARC-Date", "2026-01-01T00:00:00Z"),
             ("WARC-Target-URI", f"http://good.example/{i}"),
             ("WARC-Identified-Content-Language", "en"),
             ("Content-Type", "text/plain")],
            t.encode(),
        ))
    recs.append(_record(
        [("WARC-Type", "conversion"),
         ("WARC-Record-ID", "<urn:uuid:junk>"),
         ("WARC-Date", "2026-01-01T00:00:00Z"),
         ("WARC-Target-URI", "http://junk.example/nums"),
         ("WARC-Identified-Content-Language", "en"),
         ("Content-Type", "text/plain")],
        numeric_junk.encode(),
    ))
    path = str(tmp_path / "warc")
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.warc.gz"), "wb") as fh:
        for r in recs:
            fh.write(gzip.compress(r, mtime=0))

    gibberish = [
        "".join(rng.choice("qxzjvk#@%0123456789") for _ in range(60))
        for _ in range(40)
    ]
    model = train_quality_classifier(
        spark.createDataFrame([(t,) for t in good], "text string"),
        spark.createDataFrame([(t,) for t in gibberish], "text string"),
        dim=1 << 12, epochs=6,
    )

    out = f"/tmp/crawl_gates_{uuid.uuid4().hex[:8]}"
    report, _tok = crawl_to_training_data(
        spark, path, out,
        vocab_size=300, seq_len=64, keep_langs=["en"],
        gopher=True, quality_model=model, quality_min_prob=0.5,
        minhash_threshold=0.7,
    )
    assert report["after_quality"] == 11  # heuristic keeps the junk...
    assert report["after_gopher"] == 10   # ...Gopher's alpha rule drops it
    assert report["after_classifier"] == 10  # classifier keeps real docs
    assert report["samples_out"] > 0

    # C4 leg: the numeric junk page has no terminal punctuation, so
    # the C4 line rules empty it and the ≥3-sentence rule drops it
    out_c4 = f"/tmp/crawl_gates_{uuid.uuid4().hex[:8]}"
    r_c4, _ = crawl_to_training_data(
        spark, path, out_c4,
        vocab_size=300, seq_len=64, keep_langs=["en"],
        fix_text=True, c4=True, gopher=True, minhash_threshold=0.7,
    )
    assert r_c4["after_c4"] == 10
    assert r_c4["after_gopher"] == 10
    assert r_c4["samples_out"] > 0

    # pareto mode is derandomized: two runs agree exactly
    outs = []
    for _ in range(2):
        o = f"/tmp/crawl_gates_{uuid.uuid4().hex[:8]}"
        r, _ = crawl_to_training_data(
            spark, path, o,
            vocab_size=300, seq_len=64, keep_langs=["en"],
            quality_model=model, quality_pareto_alpha=9.0,
            quality_seed=3, minhash_threshold=0.7,
        )
        outs.append(r["after_classifier"])
    assert outs[0] == outs[1]


def test_pretrained_tokenizer_reused(spark, crawl_dir):
    path, _docs = crawl_dir
    from dataforge_spark.functions.bpe import BpeTokenizer, _merge_loop

    pre = BpeTokenizer(_merge_loop({"the": 10, "and": 5}, 10))
    out = f"/tmp/crawl_out_{uuid.uuid4().hex[:8]}"
    report, tok = crawl_to_training_data(
        spark, path, out, tokenizer=pre, seq_len=32, keep_langs=["en"],
    )
    assert tok is pre
    assert report["vocab_size"] == pre.vocab_size


def test_cli_crawl_and_tokenizer_save_load(spark, crawl_dir, tmp_path):
    from dataforge_spark.__main__ import main
    from dataforge_spark.functions.bpe import BpeTokenizer

    path, _docs = crawl_dir
    out = f"/tmp/crawl_cli_{uuid.uuid4().hex[:8]}"
    merges = str(tmp_path / "merges.json")
    rc = main([
        "crawl", "--warc", path, "--out", out,
        "--seq-len", "48", "--vocab-size", "320", "--langs", "en",
        "--save-tokenizer", merges,
    ])
    assert rc == 0
    assert glob.glob(f"{out}/part-*.tfrecord.gz")
    tok = BpeTokenizer.load(merges)
    assert tok.vocab_size > 256
    # saved merge table reloads byte-identically
    tok.save(str(tmp_path / "again.json"))
    assert BpeTokenizer.load(str(tmp_path / "again.json")).merges == tok.merges
    # and drives a second run without retraining
    out2 = f"/tmp/crawl_cli_{uuid.uuid4().hex[:8]}"
    rc2 = main([
        "crawl", "--warc", path, "--out", out2,
        "--seq-len", "48", "--langs", "en", "--tokenizer", merges,
    ])
    assert rc2 == 0
