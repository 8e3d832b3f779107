"""Byte-level BPE tests: hand-computed merges on the classic corpus,
merge-priority encoding vs a naive reference, exact round-trip
properties (incl. multi-byte UTF-8), distributed-vs-local training
equivalence, domain gates, and the Spark column API."""

import re

import pytest
from pyspark.sql import functions as F

from dataforge_spark.functions.bpe import (
    PRETOKEN_RE,
    BpeTokenizer,
    _merge_loop,
    bpe_encode,
    bpe_token_count,
    pretokenize,
    train_bpe,
)

from hypothesis import given, settings
from hypothesis import strategies as st


def test_merge_loop_hand_computed():
    """Sennrich's worked example shape: {low:5, lower:2, newest:6,
    widest:3}. Pair counts: es=9 (newest+widest), st=9, we=8(new6+wid?)…
    recompute exactly: l-o:7, o-w:7, w-e:8? newest = n,e,w,e,s,t —
    pairs ne,ew,we,es,st; widest = w,i,d,e,s,t. es: 6+3=9, st: 6+3=9,
    first merge must be (e,s) — count 9 tie with (s,t), (b'e',b's') <
    (b's',b't') lexicographically."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _merge_loop(wc, 3)
    assert merges[0] == (b"e", b"s")
    assert merges[1] == (b"es", b"t")  # es+t now counts 9
    # third: lo (5+2=7) vs ow (7) — lo < ow lexicographically? l<o yes
    assert merges[2] == (b"l", b"o")


def test_merge_determinism_any_dict_order():
    wc = {"abab": 10, "baba": 10, "abba": 5}
    m1 = _merge_loop(dict(wc), 5)
    m2 = _merge_loop(dict(reversed(list(wc.items()))), 5)
    assert m1 == m2


def _naive_encode(word: str, merges):
    """Reference: apply merges in rank order, full rescan each time."""
    parts = [bytes([b]) for b in word.encode("utf-8")]
    for a, b in merges:
        i = 0
        while i < len(parts) - 1:
            if parts[i] == a and parts[i + 1] == b:
                parts[i : i + 2] = [a + b]
            else:
                i += 1
    return parts


def test_encode_matches_rank_order_reference():
    wc = {"the": 50, "then": 20, "them": 20, "theme": 10, "he": 40}
    tok = BpeTokenizer(_merge_loop(wc, 10))
    for w in list(wc) + ["themes", "xthex", "t", ""]:
        got = [tok.token_of[i] for i in tok.encode_word(w)]
        assert got == _naive_encode(w, tok.merges), w


def test_roundtrip_multibyte_utf8():
    tok = BpeTokenizer(_merge_loop({"héllo": 3, "wörld": 2, "日本語": 4}, 20))
    for s in ["héllo wörld", "日本語 héllo!", "mixed ascii 日本語 123"]:
        assert tok.decode(tok.encode(s)) == s


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_roundtrip_property_any_text(s):
    tok = BpeTokenizer(_merge_loop({"the": 5, "and": 3}, 8))
    assert tok.decode(tok.encode(s)) == s


def test_pretoken_re_covers_everything():
    for s in ["a  b", " leading", "tab\there", "né 12x!!", "", "\n\n"]:
        assert "".join(re.findall(PRETOKEN_RE, s)) == s


def test_serialization_roundtrip():
    tok = BpeTokenizer(_merge_loop({"seri": 4, "alize": 4}, 12))
    tok2 = BpeTokenizer.from_dict(tok.to_dict())
    assert tok2.merges == tok.merges
    assert tok2.encode("serialize") == tok.encode("serialize")


def test_vocab_ids_convention():
    tok = BpeTokenizer(_merge_loop({"aa": 9}, 1))
    assert tok.merges == [(b"a", b"a")]
    assert tok.vocab_size == 257
    assert tok.encode_word("aa") == [256]
    assert tok.encode_word("ab") == [ord("a"), ord("b")]


# ------------------------------------------------------------ Spark


def test_train_bpe_distributed_equals_local(spark, documents):
    docs = documents.limit(120)
    tok = train_bpe(docs, "text", vocab_size=300)
    # local twin: same word counts computed in pandas
    texts = [r["text"] for r in docs.select("text").collect()]
    wc: dict[str, int] = {}
    for t in texts:
        for m in re.finditer(PRETOKEN_RE, t):
            wc[m.group(0)] = wc.get(m.group(0), 0) + 1
    local = _merge_loop(wc, 300 - 256)
    assert tok.merges == local


def test_train_gates(spark, documents):
    with pytest.raises(ValueError, match="must exceed 256"):
        train_bpe(documents, "text", vocab_size=100)
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(documents.limit(50), "text", vocab_size=300, max_words=3)


def test_bpe_encode_column_roundtrip(spark, documents):
    docs = documents.limit(60).cache()
    tok = train_bpe(docs, "text", vocab_size=400)
    out = docs.select(
        "doc_id", "text",
        bpe_encode("text", tok).alias("ids"),
        bpe_token_count("text", tok).alias("n_tok"),
    ).collect()
    for r in out:
        assert tok.decode(r["ids"]) == r["text"]
        assert r["n_tok"] == len(r["ids"])
        # compression is real: BPE tokens <= raw bytes
        assert r["n_tok"] <= len(r["text"].encode("utf-8"))
    # and the vocab genuinely compresses common words
    total_tok = sum(r["n_tok"] for r in out)
    total_bytes = sum(len(r["text"].encode()) for r in out)
    assert total_tok < 0.6 * total_bytes


def test_bpe_encode_null_in_null_out(spark):
    tok = BpeTokenizer(_merge_loop({"x": 1}, 1))
    df = spark.createDataFrame([(1, None)], "k bigint, t string")
    row = df.select(bpe_encode("t", tok).alias("ids")).collect()[0]
    assert row["ids"] is None


def test_pretokenize_column_matches_python(spark):
    df = spark.createDataFrame(
        [("the cat, 42 dogs!  ok",)], "t string"
    )
    got = df.select(pretokenize("t").alias("p")).collect()[0]["p"]
    assert got == re.findall(PRETOKEN_RE, "the cat, 42 dogs!  ok")


def test_gpt2_format_roundtrip(tmp_path):
    from dataforge_spark.functions.bpe import (
        BpeTokenizer,
        _bytes_to_unicode,
        _merge_loop,
    )

    # the mapping is the GPT-2 bijection: 256 distinct printable chars,
    # printable ASCII maps to itself, space/control shift high
    b2u = _bytes_to_unicode()
    assert len(set(b2u.values())) == 256
    assert b2u[ord("A")] == "A"
    assert ord(b2u[ord(" ")]) >= 256

    tok = BpeTokenizer(
        _merge_loop({"the": 50, "then": 20, "banana": 9, "καφέ": 4}, 40)
    )
    vocab_p = str(tmp_path / "vocab.json")
    merges_p = str(tmp_path / "merges.txt")
    tok.save_gpt2(vocab_p, merges_p)
    back = BpeTokenizer.load_gpt2(vocab_p, merges_p)
    assert back.merges == tok.merges
    for s in ("the banana then", "καφέ the", ""):
        assert back.encode(s) == tok.encode(s)
        assert back.decode(back.encode(s)) == s

    # a vocab/merges mismatch fails loudly
    import json

    v = json.load(open(vocab_p))
    k = next(key for key, i in v.items() if i == 256)
    v[k] = 999
    json.dump(v, open(vocab_p, "w"))
    with pytest.raises(ValueError):
        BpeTokenizer.load_gpt2(vocab_p, merges_p)
