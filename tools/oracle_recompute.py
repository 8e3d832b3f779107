"""Check-time recomputation of the two oracle rows whose expected values
are model/signature-derived rather than SQL-expressible (VERDICT r5
task 3): ``o4_isolation_forest`` and ``dedup_simhash_verified``.

Round 5 pinned these as literals computed once at sf0.01 — that proved
determinism/regression, not correctness, and broke at any other scale
factor. Here the expected values are derived FROM THE INPUT DATA at
oracle-construction time with a second, Spark-free implementation:

- simhash: pure-Python tokenize → xxh64 per token (``functions/xxh64.py``,
  bit-equal to ``F.xxhash64``) → bit votes → signature → O(n²) numpy
  hamming sweep. Independent of the JVM explode/aggregate/banded-join
  path end to end.
- isolation forest: DuckDB-fetched column → the same seeded
  ``NumpyIsolationForest`` fit (the model IS the operator's spec) but
  with scoring, thresholding, removal, and the kept-id checksum all
  recomputed in numpy — independent of the broadcast + Arrow-UDF
  distributed scoring path.

Both run over the driver's oracle scale (sf0.01: 600 docs / 10 k events),
milliseconds of work, memoized per sf_dir.
"""

from __future__ import annotations

import functools
import os
import re

import numpy as np


def oracle_sf_dir() -> str:
    """The sf dir the driver's DuckDB views point at (contract: sf0.01).
    Overridable so tools/check_correctness.py can verify at other SFs."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _src(sf_dir: str, table: str) -> str:
    p = os.path.join(sf_dir, f"{table}.parquet")
    return f"{p}/*.parquet" if os.path.isdir(p) else p


# Java/RE2-compatible ASCII \s — Spark's split("\\s+") (re.ASCII pins
# Python's \s to the same set; the corpora carry no \x0B either way).
_WS = re.compile(r"\s+", re.ASCII)
_POP_M1 = np.uint64(0x5555555555555555)
_POP_M2 = np.uint64(0x3333333333333333)
_POP_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_POP_H = np.uint64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over a uint64 array (numpy<2 has no bit_count)."""
    x = x - ((x >> np.uint64(1)) & _POP_M1)
    x = (x & _POP_M2) + ((x >> np.uint64(2)) & _POP_M2)
    x = (x + (x >> np.uint64(4))) & _POP_M4
    return (x * _POP_H) >> np.uint64(56)


def _py_simhash(text: str, hash_cache: dict) -> int:
    """64-bit simhash exactly as dedup/simhash.py computes it:
    split(trim(text), '\\s+') with Spark's limit=-1 semantics (leading/
    trailing empties KEPT — F.trim strips 0x20 only), each token's
    xxh64(seed 42) votes ±1 per bit, bit = 1 iff vote sum > 0."""
    from dataforge_spark.functions.xxh64 import xxh64

    toks = _WS.split(text.strip(" "))
    hs = np.empty(len(toks), dtype=np.uint64)
    for i, tok in enumerate(toks):
        h = hash_cache.get(tok)
        if h is None:
            h = xxh64(tok.encode("utf-8"))
            hash_cache[tok] = h
        hs[i] = h
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little")
    votes = 2 * bits.sum(axis=0, dtype=np.int64) - len(toks)
    sig = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
    return int(sig.view(np.uint64)[0])


@functools.lru_cache(maxsize=4)
def simhash_expected(sf_dir: str, max_hamming: int = 3) -> tuple[int, int, int, int]:
    """(n_pairs, n_brute, n_disagree, n_planted) for
    q_dedup_simhash_verified over ``sf_dir``'s documents (+the query's
    planted dups: doc_id % 5 == 0 copied to doc_id + 100000).

    n_pairs == n_brute by the Manku chunk-agreement guarantee (any pair
    within hamming d shares one of d+1 exact chunks), so both are the
    brute-force count; n_disagree is 0 by the same guarantee — the Spark
    side computes it from its own banded-vs-brute full join, so a banding
    bug shows up as a mismatch against this 0."""
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{_src(sf_dir, 'documents')}'"
    ).fetchall()
    docs = [(int(i), t) for i, t in rows]
    docs += [(int(i) + 100000, t) for i, t in rows if i % 5 == 0]

    hash_cache: dict = {}
    text_cache: dict[str, int] = {}
    ids, sigs = [], []
    for i, t in docs:
        if t is None:
            continue
        s = text_cache.get(t)
        if s is None:
            s = _py_simhash(t, hash_cache)
            text_cache[t] = s
        ids.append(i)
        sigs.append(s)
    order = np.argsort(np.asarray(ids))
    idv = np.asarray(ids, dtype=np.int64)[order]
    arr = np.asarray(sigs, dtype=np.uint64)[order]

    n_pairs = 0
    n_planted = 0
    for j in range(len(arr) - 1):
        ham = _popcount64(arr[j] ^ arr[j + 1:])
        close = ham <= max_hamming
        n_pairs += int(close.sum())
        n_planted += int(
            ((idv[j + 1:] - idv[j] == 100000) & (ham == 0)).sum()
        )
    return n_pairs, n_pairs, 0, n_planted


@functools.lru_cache(maxsize=4)
def iforest_expected(sf_dir: str) -> tuple[int, int]:
    """(n_kept, kept_id_sum) for q_o4_isolation_forest over ``sf_dir``'s
    events: fit the seeded numpy forest on the SORTED value multiset
    (operators/isolation_forest.py:93 — partition-order independence),
    flag predict() == -1, keep the rest (nulls keep), checksum event_id."""
    import duckdb

    from dataforge_spark.operators.iforest_numpy import NumpyIsolationForest

    pdf = duckdb.connect().execute(
        f"SELECT event_id, value FROM '{_src(sf_dir, 'events')}'"
    ).fetch_df()
    vals = pdf["value"].to_numpy(dtype=float)
    ok = ~np.isnan(vals)
    model = NumpyIsolationForest(contamination=0.1, random_state=42).fit(
        np.sort(vals[ok]).reshape(-1, 1)
    )
    flagged = np.zeros(len(vals), dtype=bool)
    flagged[ok] = model.predict(vals[ok].reshape(-1, 1)) == -1
    kept = ~flagged
    return int(kept.sum()), int(pdf["event_id"].to_numpy()[kept].sum())


# --- hashed-n-gram quality classifier twin (round 12, VERDICT r11 task 3) ---

# The EXACT hyperparameters q_txt_metrics trains with — pinned here so
# the twin and the Spark side cannot drift apart silently.
CLF_DIM = 1 << 15
CLF_NGRAM = 2
CLF_EPOCHS = 8
CLF_LR = 1.0
CLF_L2 = 1e-6
CLF_MAX_PER_CLASS = 1000
# the label rule: documents containing the standalone token "spark" are
# the "trusted" class (mid-frequency token → per-doc non-trivial margins)
_CLF_POS_RE = re.compile(r"\bspark\b")
# functions/quality_classifier._TOKEN_RE, replicated
_CLF_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def _clf_features(text: str, dim: int, ngram: int):
    """Sequential twin of quality_classifier._doc_features: word
    {1..ngram}-gram hashing (zlib.crc32 % dim), tf normalized."""
    import zlib

    toks = _CLF_TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    grams = []
    for n in range(1, ngram + 1):
        for i in range(len(toks) - n + 1):
            grams.append(
                zlib.crc32(" ".join(toks[i : i + n]).encode("utf-8")) % dim
            )
    b = np.asarray(grams, np.int64)
    idx, c = np.unique(b, return_counts=True)
    return idx, c / b.size


@functools.lru_cache(maxsize=4)
def classifier_expected(sf_dir: str) -> tuple[tuple[int, float], ...]:
    """((doc_id, prob), ...) for q_txt_metrics's classifier columns:
    a SEQUENTIAL pure-numpy twin of train_quality_classifier (full-batch
    Adagrad logistic regression, same features/steps/regularization) +
    scoring, independent of the mapInPandas gradient plumbing and the
    Arrow scoring UDF. Differences vs Spark are float-addition order
    only (~1e-12); the query rounds probs to 3 decimals and thresholds
    at 0.5 with measured min |margin| 0.0275, so verdicts are stable."""
    import math

    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM '{_src(sf_dir, 'documents')}' "
        "WHERE text IS NOT NULL ORDER BY doc_id"
    ).fetchall()
    labeled = [
        (int(i), t, 1.0 if _CLF_POS_RE.search(t.lower()) else 0.0)
        for i, t in rows
    ]

    def _split_bucket(text: str) -> int:
        # curation.split_bucket(["_text"], seed=0), sequentially: md5 of
        # "0\x1f" + text, first 8 hex digits mod SPLIT_BUCKETS
        import hashlib

        key = "0\x1f" + text
        return int(
            hashlib.md5(key.encode("utf-8")).hexdigest()[:8], 16
        ) % 1_000_000

    def _bounded(cls: list) -> list:
        # train_quality_classifier's per-class cap: past
        # CLF_MAX_PER_CLASS docs, keep the md5-bucket head (>=1 bucket)
        n_cls = len(cls)
        if n_cls <= CLF_MAX_PER_CLASS:
            return cls
        frac = max(1, int(1_000_000 * CLF_MAX_PER_CLASS / n_cls))
        return [d for d in cls if _split_bucket(d[1]) < frac]

    train = _bounded([d for d in labeled if d[2] == 1.0]) + _bounded(
        [d for d in labeled if d[2] == 0.0]
    )
    docs = [
        (i, _clf_features(t, CLF_DIM, CLF_NGRAM), y) for i, t, y in train
    ]
    n = len(docs)
    w = np.zeros(CLF_DIM)
    b = 0.0
    hist = np.zeros(CLF_DIM + 1)
    for _ in range(CLF_EPOCHS):
        g = np.zeros(CLF_DIM + 1)
        for _, (idx, vals), y in docs:
            m = w[idx] @ vals + b
            p = 1.0 / (1.0 + math.exp(-m))
            np.add.at(g, idx, (p - y) * vals)
            g[CLF_DIM] += p - y
        g /= n
        g[:CLF_DIM] += CLF_L2 * w
        hist += g * g
        step = CLF_LR * g / np.sqrt(hist + 1e-10)
        w -= step[:CLF_DIM]
        b -= step[CLF_DIM]
    out = []
    for i, t, _y in labeled:  # score EVERY doc, not just the sample
        idx, vals = _clf_features(t, CLF_DIM, CLF_NGRAM)
        m = w[idx] @ vals + b
        out.append((i, float(1.0 / (1.0 + math.exp(-m)))))
    return tuple(out)


# --- crawl_e2e pipeline twin (round 12, VERDICT r11 tasks 5+6) --------------

_EN_STOP = {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"}
_PRETOKEN_RE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")


def _ws_tokens(text: str) -> list[str]:
    t = text.strip()
    return _WS.split(t) if t else []


def _quality_keep(text: str, min_quality: float) -> bool:
    """curation.quality_filter's keep rule, sequentially: quality_score
    >= min_quality AND rep_top <= 0.3 AND rep_dup <= 0.5 (the same
    formulas the llm_prep/txt_metrics SQL oracles replicate)."""
    toks = _ws_tokens(text)
    n = len(toks)
    q = 0.0
    if 10 <= n <= 100_000:
        q += 0.4
    if n > 0 and 3 <= len(text) / n <= 12:
        q += 0.3
    hits = sum(1 for w in _ws_tokens(text.lower()) if w in _EN_STOP)
    if n > 0:
        q += min(0.3, hits / n * 3)
    if q < min_quality:
        return False
    if n >= 2:
        grams: dict[str, int] = {}
        for i in range(n - 1):
            g = toks[i] + " " + toks[i + 1]
            grams[g] = grams.get(g, 0) + 1
        total = n - 1
        top = max(grams.values()) / total
        dup = sum(c for c in grams.values() if c > 1) / total
        if top > 0.3 or dup > 0.5:
            return False
    return True


# q_crawl_e2e's Gopher planting (round 13, VERDICT r12 task 6): this
# suffix is appended to every doc_id % 3 == 0 document when the WET
# fixture is built (BEFORE the duplicate copies are derived, so dup
# pairs stay byte-identical). 45 DISTINCT words — no repeated bigrams,
# so the quality filter's repetition rules are untouched — carrying all
# 8 Gopher required stopwords and mean word length ≈ 6.5, which lifts a
# suffixed doc past every Gopher rule (word count ≥ 10+45, mean word
# length in [3,10], no symbols/bullets/ellipses, all-alpha words,
# stopword hits 8 ≥ 2) while the unsuffixed synthetic docs keep failing
# the required-stopword rule (their vocabulary has only "the"). The
# engine fixture (q_crawl_e2e) imports THIS constant, so twin and
# engine cannot drift.
CRAWL_GOPHER_SUFFIX = (
    " the archive of curated shards and that modern pipelines have"
    " grown to be resilient with careful layout planning every"
    " deduplicated corpus keeps tokens flowing while explicit manifests"
    " certify durable partitions under steady compaction pressure"
    " ensuring reproducible sampled batches remain balanced across"
    " executors during training runs"
)

_GOPHER_REQ = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_BULLET = re.compile(r"^[•‣▪●·\-\*⁃]")
_GOPHER_ELLIPSIS_END = re.compile(r"(\.\.\.|…)[ \t]*$")
_GOPHER_SYM = re.compile(r"(\.\.\.|…)")


def _gopher_keep(text: str) -> bool:
    """Sequential replica of functions/gopher.gopher_quality_struct's
    overall ``keep`` (the seven Rae et al. rules), for the crawl twin's
    gopher stage — same tokenization (trimmed ``\\s+`` split, empties
    dropped), same regexes, same thresholds as the Catalyst form."""
    words = _ws_tokens(text)
    n_w = len(words)
    if not (50 <= n_w <= 100_000):
        return False
    mean_wl = sum(len(w) for w in words) / n_w
    if not (3 <= mean_wl <= 10):
        return False
    n_sym = text.count("#") + len(_GOPHER_SYM.findall(text))
    if n_sym / n_w > 0.1:
        return False
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if lines:
        n_l = len(lines)
        if sum(1 for ln in lines if _GOPHER_BULLET.match(ln.lstrip())) / n_l >= 0.9:
            return False
        if sum(1 for ln in lines if _GOPHER_ELLIPSIS_END.search(ln)) / n_l >= 0.3:
            return False
    if sum(1 for w in words if re.search("[A-Za-z]", w)) / n_w < 0.8:
        return False
    low = text.lower()
    hits = sum(1 for w in _GOPHER_REQ if re.search(rf"\b{w}\b", low))
    return hits >= 2


def _canon_planted_url(uri: str) -> str:
    """functions/urls.canonicalize_url restricted to the URL shapes
    q_crawl_e2e plants (http scheme, example.com host with optional
    case / :80 default port, plain path, no query/fragment/www)."""
    rest = uri.split("://", 1)[1]
    host_port, _, path = rest.partition("/")
    host = host_port.lower()
    if host.endswith(":80"):
        host = host[:-3]
    return f"http://{host}/{path}"


def _bpe_train_twin(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[bytes, bytes]]:
    """INDEPENDENT BPE trainer: full pair recount each iteration (no
    incremental bookkeeping — the machinery where the engine's bugs
    would hide), same selection rule (max count, ties to the
    lexicographically smaller pair)."""
    words = [
        ([bytes([b]) for b in w.encode("utf-8")], c)
        for w, c in word_counts.items()
    ]
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(num_merges):
        counts: dict[tuple[bytes, bytes], int] = {}
        for parts, c in words:
            for i in range(len(parts) - 1):
                p = (parts[i], parts[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for parts, _c in words:
            i = 0
            while i < len(parts) - 1:
                if parts[i] == best[0] and parts[i + 1] == best[1]:
                    parts[i : i + 2] = [merged]
                else:
                    i += 1
    return merges


def _bpe_encode_twin(
    text: str, ranks: dict[tuple[bytes, bytes], int],
    ids: dict[bytes, int],
) -> list[int]:
    out: list[int] = []
    for m in _PRETOKEN_RE.finditer(text):
        parts = [bytes([b]) for b in m.group(0).encode("utf-8")]
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
        out.extend(ids[p] for p in parts)
    return out


def _minhash_survivors_twin(
    docs: list,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.8,
    max_bucket: int = 1000,
) -> list:
    """Sequential twin of the FULL dedup/minhash pipeline with the
    engine's defaults: distinct word 3-shingles -> xxhash64(shingle)
    -> num_perm permutations via xxhash64(lit(i), h) -> min per perm ->
    16x4 banding (bucket = chained xxhash64 over the band's sig rows)
    -> candidate pairs in non-degenerate buckets -> EXACT Jaccard
    verification (round 6) -> greedy larger-id drop. All hashes are the
    bit-equal pure-Python xxh64 (hashInt for the INT permutation index,
    hashLong chain for longs — probed against F.xxhash64), so the twin
    is deterministic and assumption-free about LSH recall."""
    import struct

    from dataforge_spark.functions.xxh64 import xxh64, xxh64_str

    def signed(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    def hash_long(v: int, seed_signed: int) -> int:
        return signed(
            xxh64(struct.pack("<q", v), seed_signed & ((1 << 64) - 1))
        )

    # F.xxhash64(F.lit(i), h): the INT literal takes the 4-byte path
    perm_seeds = [
        signed(xxh64(struct.pack("<i", i), 42)) for i in range(num_perm)
    ]

    shset: dict = {}
    sigs: dict = {}
    perm_cache: dict = {}
    for i, t in docs:
        toks = _ws_tokens(t)
        ss = sorted({" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)})
        if not ss:
            continue  # < n words: dropped from signatures, never a candidate
        shset[i] = frozenset(ss)
        hs = [xxh64_str(s) for s in ss]
        sig = []
        for p in range(num_perm):
            best = None
            sp = perm_seeds[p]
            for h in hs:
                key = (p, h)
                v = perm_cache.get(key)
                if v is None:
                    v = hash_long(h, sp)
                    perm_cache[key] = v
                if best is None or v < best:
                    best = v
            sig.append(best)
        sigs[i] = sig

    buckets: dict = {}
    for i, sig in sigs.items():
        for b in range(bands):
            h = 42
            for r in range(rows_per_band):
                h = hash_long(sig[b * rows_per_band + r], h)
            buckets.setdefault((b, h), []).append(i)

    cands = set()
    for members in buckets.values():
        if 1 < len(members) <= max_bucket:
            ms = sorted(members)
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    cands.add((ms[x], ms[y]))

    losers = set()
    for a, b in cands:
        sa, sb = shset[a], shset[b]
        un = len(sa | sb)
        j = round(len(sa & sb) / un, 6) if un else 0.0
        if j >= threshold:
            losers.add(b)
    return [(i, t) for i, t in docs if i not in losers]


@functools.lru_cache(maxsize=4)
def crawl_expected(sf_dir: str) -> tuple[tuple[str, int], ...]:
    """((stage, n), ...) for q_crawl_e2e: the whole crawl pipeline
    recomputed sequentially — the planted-URL/Gopher-suffix fixture
    reconstructed from the parquet rows, then every gate re-derived
    with independent code: quality and gopher from the rule formulas,
    near-dedup by a FULL minhash simulation (signatures, banding and
    exact-Jaccard verification re-run on bit-equal pure-Python xxh64 —
    ``_minhash_survivors_twin``; no closed-form shortcut), and BPE by
    an O(n²)-recount trainer + encoder. See q_crawl_e2e's docstring
    for the planted structure."""
    import duckdb

    from dataforge_spark.functions.xxh64 import xxh64_str

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text, lang FROM '{_src(sf_dir, 'documents')}' "
        "ORDER BY doc_id"
    ).fetchall()
    # Gopher planting (round 13): suffix applied on the ORIGINAL id
    # before duplication, exactly like the engine fixture
    rows = [
        (int(i), t + CRAWL_GOPHER_SUFFIX if int(i) % 3 == 0 else t, lang)
        for i, t, lang in rows
    ]
    records = []  # (raw_uri, lang, text)
    for i, t, lang in rows:
        records.append((f"http://Example.com/doc/{i}", lang, t))
    for i, t, lang in rows:
        if i % 5 == 0:
            nid = i + 100000
            if nid % 10 == 0:
                records.append((f"http://example.com:80/doc/{i}", lang, t))
            else:
                records.append((f"http://example.com/copy/{nid}", lang, t))
    stages = [("records_in", len(records))]

    keep_langs = {"en", "de", "fr", "es"}
    records = [r for r in records if r[1] in keep_langs]
    stages.append(("after_lang_filter", len(records)))

    groups: dict[str, list[tuple[str, str]]] = {}
    for uri, _lang, t in records:
        groups.setdefault(_canon_planted_url(uri), []).append((uri, t))
    docs = []  # (new_id, text)
    for canon, members in groups.items():
        members.sort()  # keep-first by raw uri string
        docs.append((xxh64_str(canon), members[0][1]))
    stages.append(("after_url_dedup", len(docs)))

    docs = [(i, t) for i, t in docs if _quality_keep(t, 0.75)]
    stages.append(("after_quality", len(docs)))

    docs = [(i, t) for i, t in docs if _gopher_keep(t)]
    stages.append(("after_gopher", len(docs)))

    survivors = sorted(_minhash_survivors_twin(docs))
    stages.append(("after_near_dedup", len(survivors)))

    wc: dict[str, int] = {}
    for _i, t in survivors:
        for m in _PRETOKEN_RE.finditer(t):
            w = m.group(0)
            wc[w] = wc.get(w, 0) + 1
    merges = _bpe_train_twin(wc, 512 - 256)
    stages.append(("vocab_size", 256 + len(merges)))
    ranks = {p: r for r, p in enumerate(merges)}
    ids_of: dict[bytes, int] = {bytes([b]): b for b in range(256)}
    for r, (a, b) in enumerate(merges):
        ids_of[a + b] = 256 + r

    samples = tokens = ids_sum = 0
    for _i, t in survivors:
        ids = _bpe_encode_twin(t, ranks, ids_of)
        if len(ids) < 1:
            continue
        for s in range(0, max(len(ids) - 1, 0) + 1, 64):
            chunk = ids[s : s + 64]
            if len(chunk) < 1:
                continue
            samples += 1
            tokens += len(chunk)
            ids_sum += sum(chunk)
    stages += [
        ("samples_out", samples),
        ("tokens_out", tokens),
        ("tfr_samples", samples),
        ("tfr_tokens", tokens),
        ("tfr_ids_sum", ids_sum),
    ]
    return tuple(stages)


# ---------------------------------------------------------------------------
# DSIR importance resampling (round 13): sequential twin of
# functions/dsir.py — independent gram counting (dict loop vs Spark
# explode/groupBy), independent per-doc scoring (Python sum vs
# broadcast-join + partial agg), same published formulas. All heavy
# arithmetic is INTEGER micro-nats (the engine quantizes the per-bucket
# log-ratio driver-side before any distributed sum), so twin and engine
# agree bit-exactly by construction; the only floats are the per-bucket
# log-ratio and per-doc Gumbel noise, both evaluated by CPython math.log
# here and floor-quantized identically.

DSIR_BUCKETS = 10_000
DSIR_SEED = 0


def _dsir_grams(text: str) -> list[str]:
    t = (text or "").lower().strip()
    ws = _WS.split(t) if t else []
    return ws + [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]


@functools.lru_cache(maxsize=4)
def dsir_expected(
    sf_dir: str,
) -> tuple[tuple[tuple[int, int], ...], tuple[tuple[int, int], ...]]:
    """(weights, selected) for the registry's DSIR legs: target = docs
    with lang='en', raw = all docs, k = ceil(n/10), seed 0, temp 1.
    weights = ((doc_id, logw_micro), ...) for EVERY doc; selected =
    ((doc_id, rank), ...) for the Gumbel top-k."""
    import duckdb
    import math

    from dataforge_spark.functions.xxh64 import xxh64_str

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text, lang FROM '{_src(sf_dir, 'documents')}' "
        "ORDER BY doc_id"
    ).fetchall()

    def bucket(g: str) -> int:
        return xxh64_str(f"{DSIR_SEED}\x1f{g}") % DSIR_BUCKETS

    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for doc_id, text, lang in rows:
        bs = [bucket(g) for g in _dsir_grams(text)]
        doc_buckets[doc_id] = bs
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    nt = sum(ct.values())
    nr = sum(cr.values())
    alpha, B = 1.0, DSIR_BUCKETS
    lr_micro = {
        b: math.floor(
            (
                math.log(ct.get(b, 0) + alpha)
                - math.log(nt + alpha * B)
                - math.log(cr.get(b, 0) + alpha)
                + math.log(nr + alpha * B)
            )
            * 1_000_000
        )
        for b in set(ct) | set(cr)
    }
    # every scored gram bucket has cr ≥ 1 (raw = all docs), so lr_micro
    # always covers it; docs with no grams score 0 like the engine's
    # explode_outer + coalesce
    weights = tuple(
        (doc_id, sum(lr_micro[b] for b in bs) if bs else 0)
        for doc_id, bs in sorted(doc_buckets.items())
    )
    wmap = dict(weights)
    k = math.ceil(len(rows) / 10)
    keyed = []
    for doc_id, _bs in sorted(doc_buckets.items()):
        h = xxh64_str(f"gumbel\x1f{DSIR_SEED}\x1f{doc_id}") % (2 ** 53)
        u = (h + 0.5) / float(2 ** 53)
        g = -math.log(-math.log(u))
        key = int(math.floor(wmap[doc_id] / 1.0)) + math.floor(g * 1_000_000)
        keyed.append((key, doc_id))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    selected = tuple(
        (doc_id, rank + 1) for rank, (_k, doc_id) in enumerate(keyed[:k])
    )
    return weights, selected
