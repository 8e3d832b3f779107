"""Byte-level BPE tokenizer — train on a corpus DataFrame, encode as
an Arrow-batched column op. Implements the PUBLIC algorithm (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units", and the GPT-2 byte-level variant) from scratch; extension
surface over the reference engine, whose text tier (``SURVEY.md §2``
X1-X12) has no tokenizer. The engine's earlier token COUNTING
(``functions/text_analysis.py``) stays the cheap path; this module is
the real vocabulary-building tokenizer an LLM data pipeline trains.

Scale design — the industrial shape, not a toy:

- **Pre-tokenize + count distributed**: one ``explode`` +
  ``groupBy(word)`` shuffle turns a 100 TB corpus into a word-frequency
  table whose size is bounded by the LANGUAGE (distinct words), not the
  corpus. All heavy lifting happens on that compressed representation.
- **Driver-side merge loop on the word-freq table**: classic BPE with
  incremental pair-count maintenance (only words containing the merged
  pair are touched). The collect is gated by ``max_words`` — the same
  domain-size-gate pattern as ``operators/encoding.py``; beyond the
  gate, raise instead of OOM (callers pass ``min_count`` to shrink the
  tail first — Zipf makes this cheap).
- **Encode as a broadcast + pandas_udf**: the merge table (a rank
  dict) broadcasts to executors; encoding caches per DISTINCT
  pre-token (Zipf again: the cache hit rate on natural text is ~99%).
  Decode is exact byte concatenation — ``decode(encode(x)) == x`` for
  any UTF-8 input, the property tests pin.

Determinism: merge selection breaks count ties by the lexicographically
smallest pair (bytes order), so a given word-frequency table always
yields the same merge list on any cluster layout.

Vocabulary convention: ids 0-255 are the raw bytes; id ``256 + i`` is
the ``i``-th merge. (GPT-2 additionally remaps bytes to printable
glyphs for display; that cosmetic bijection is omitted.)
"""

from __future__ import annotations

import re
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GPT-2-flavoured pre-tokenizer, lookahead-free (RE2/ICU portable):
# optional leading space glued to the run it precedes, letter runs,
# digit runs, other-symbol runs, residual whitespace.
PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def pretokenize(col) -> Column:
    """Split text into BPE pre-tokens JVM-side (``regexp_extract_all``,
    no UDF) — the unit BPE merges never cross."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(PRETOKEN_RE), 0)


class BpeTokenizer:
    """A trained tokenizer: ``merges`` is an ordered list of byte-string
    pairs; rank = merge priority. Plain-dict state → trivially
    (de)serializable and broadcastable."""

    def __init__(self, merges: list[tuple[bytes, bytes]]):
        self.merges = merges
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.id_of: dict[bytes, int] = {bytes([b]): b for b in range(256)}
        for i, (a, b) in enumerate(merges):
            self.id_of[a + b] = 256 + i
        self.token_of = {v: k for k, v in self.id_of.items()}

    # ------------------------------------------------------------ core

    def encode_word(self, word: str) -> list[int]:
        parts = [bytes([b]) for b in word.encode("utf-8")]
        ranks = self.ranks
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return [self.id_of[p] for p in parts]

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for m in re.finditer(PRETOKEN_RE, text):
            out.extend(self.encode_word(m.group(0)))
        return out

    def decode(self, ids: Iterable[int]) -> str:
        return b"".join(self.token_of[i] for i in ids).decode(
            "utf-8", errors="replace"
        )

    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    # ------------------------------------------------------ persistence

    def to_dict(self) -> dict:
        return {
            "merges": [
                [a.decode("latin-1"), b.decode("latin-1")]
                for a, b in self.merges
            ]
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BpeTokenizer":
        return cls(
            [
                (a.encode("latin-1"), b.encode("latin-1"))
                for a, b in d["merges"]
            ]
        )

    def save(self, path: str) -> None:
        """Persist the merge table as JSON (latin-1 byte mapping —
        every possible byte pair survives the round-trip)."""
        import json

        with open(path, "w") as fh:
            json.dump(self.to_dict(), fh)

    @classmethod
    def load(cls, path: str) -> "BpeTokenizer":
        import json

        with open(path) as fh:
            return cls.from_dict(json.load(fh))

    def save_gpt2(self, vocab_path: str, merges_path: str) -> None:
        """Export in the GPT-2 interchange format (Radford et al. 2019
        reference release — public): ``vocab.json`` token→id and
        ``merges.txt`` ordered pair lines, bytes rendered through the
        standard byte-to-printable-unicode mapping. Ids keep THIS
        tokenizer's scheme (byte value 0-255, merge i → 256+i); the
        files are format-compatible with common BPE tooling."""
        import json

        b2u = _bytes_to_unicode()

        def render(bs: bytes) -> str:
            return "".join(b2u[x] for x in bs)

        vocab = {render(bytes([i])): i for i in range(256)}
        for i, (a, b) in enumerate(self.merges):
            vocab[render(a + b)] = 256 + i
        with open(vocab_path, "w", encoding="utf-8") as fh:
            json.dump(vocab, fh, ensure_ascii=False)
        with open(merges_path, "w", encoding="utf-8") as fh:
            fh.write("#version: 0.2\n")
            for a, b in self.merges:
                fh.write(f"{render(a)} {render(b)}\n")

    @classmethod
    def load_gpt2(cls, vocab_path: str, merges_path: str) -> "BpeTokenizer":
        """Load the GPT-2 interchange files back. The merge list alone
        reconstructs the tokenizer; ``vocab.json`` is cross-checked
        (every merged token must map to ``256 + rank`` and spell the
        concatenation of its pair) so a mismatched file pair fails
        loudly instead of silently mis-tokenizing."""
        import json

        u2b = {u: b for b, u in _bytes_to_unicode().items()}

        def unrender(s: str) -> bytes:
            try:
                return bytes(u2b[c] for c in s)
            except KeyError as exc:
                raise ValueError(
                    f"merges.txt token {s!r} contains a character outside "
                    "the GPT-2 byte alphabet"
                ) from exc

        merges: list[tuple[bytes, bytes]] = []
        with open(merges_path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                parts = line.split(" ")
                if len(parts) != 2:
                    raise ValueError(f"malformed merges.txt line: {line!r}")
                merges.append((unrender(parts[0]), unrender(parts[1])))
        with open(vocab_path, encoding="utf-8") as fh:
            vocab = json.load(fh)
        for i, (a, b) in enumerate(merges):
            tok = a + b
            b2u = _bytes_to_unicode()
            rendered = "".join(b2u[x] for x in tok)
            if vocab.get(rendered) != 256 + i:
                raise ValueError(
                    f"vocab.json does not match merges.txt at rank {i}: "
                    f"expected {rendered!r} -> {256 + i}"
                )
        return cls(merges)


_B2U_CACHE: dict[int, str] = {}


def _bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 reference byte↔printable-unicode bijection (public
    algorithm): printable latin ranges map to themselves, every other
    byte shifts into the 256+ plane — so merges.txt never contains
    whitespace/control bytes that would break its space-separated
    format."""
    if _B2U_CACHE:
        return _B2U_CACHE
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    _B2U_CACHE.update({b: chr(c) for b, c in zip(bs, cs)})
    return _B2U_CACHE


# ----------------------------------------------------------- training


def _merge_loop(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[bytes, bytes]]:
    """Classic BPE over a word-frequency table with incremental pair
    bookkeeping: a merge touches only the words that contain its pair.
    Ties break on the lexicographically smaller pair — deterministic
    for any traversal order."""
    words: list[list[bytes]] = []
    counts: list[int] = []
    for w, c in word_counts.items():
        words.append([bytes([b]) for b in w.encode("utf-8")])
        counts.append(c)

    pair_counts: dict[tuple[bytes, bytes], int] = {}
    pair_words: dict[tuple[bytes, bytes], set[int]] = {}
    for wi, parts in enumerate(words):
        c = counts[wi]
        for i in range(len(parts) - 1):
            p = (parts[i], parts[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(num_merges):
        best = None
        best_n = 0
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None or best_n < 1:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            parts = words[wi]
            c = counts[wi]
            # remove this word's contribution to all its pairs
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]
            # apply the merge within the word
            i = 0
            while i < len(parts) - 1:
                if parts[i] == best[0] and parts[i + 1] == best[1]:
                    parts[i : i + 2] = [merged]
                else:
                    i += 1
            # re-add contributions
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 1024,
    min_count: int = 1,
    max_words: int = 1_000_000,
) -> BpeTokenizer:
    """Train byte-level BPE on a corpus column. The distributed part is
    ONE explode+groupBy shuffle producing the word-frequency table; the
    merge loop runs on that table driver-side (bounded by the language's
    distinct-word count, NOT corpus size — gated at ``max_words`` after
    the ``min_count`` floor, the encoding.py domain-gate pattern)."""
    if vocab_size <= 256:
        raise ValueError("vocab_size must exceed 256 (the byte alphabet)")
    wc = (
        df.select(
            F.explode(pretokenize(F.col(text_col))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
    )
    n_words = wc.count()
    if n_words > max_words:
        raise ValueError(
            f"word-frequency table has {n_words} entries > max_words="
            f"{max_words}; raise min_count (Zipf: the tail is cheap to "
            f"drop) or max_words"
        )
    table = {r["w"]: int(r["c"]) for r in wc.collect()}
    return BpeTokenizer(_merge_loop(table, vocab_size - 256))


# ----------------------------------------------------- column encoding


def bpe_encode(col, tokenizer: BpeTokenizer) -> Column:
    """``array<int>`` token ids for a text column. The rank/id tables
    ride the closure (broadcast once per stage); encoding caches per
    distinct pre-token, so Zipf-distributed text decodes mostly from
    cache. Null in → null out."""
    from pyspark.sql.functions import pandas_udf

    state = tokenizer.to_dict()

    @pandas_udf("array<int>")
    def enc(s):
        import pandas as pd

        tok = BpeTokenizer.from_dict(state)
        cache: dict[str, list[int]] = {}

        def one(text):
            if text is None:
                return None
            out = []
            for m in re.finditer(PRETOKEN_RE, text):
                w = m.group(0)
                ids = cache.get(w)
                if ids is None:
                    ids = tok.encode_word(w)
                    cache[w] = ids
                out.extend(ids)
            return out

        return s.map(one)

    return enc(F.col(col) if isinstance(col, str) else col)


def bpe_token_count(col, tokenizer: BpeTokenizer) -> Column:
    """Token count under a trained vocab — the number that matters for
    context-window packing and per-token cost estimates."""
    return F.size(bpe_encode(col, tokenizer))
