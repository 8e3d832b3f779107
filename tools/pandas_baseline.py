"""Pandas baseline: the reference's implementation style (pandas, single
process, eager) executing the SAME operator specs as bench.py's headline
queries at sf0.1. Measured numbers go into BASELINE.md; the driver's 2×
gate compares BENCH_r{N}.json against them.

Faithful to the reference where it has an implementation (per-cell loops
for typo fixing, methods/spellingFix.py:121-139; vectorized .str for text
cleaning, methods/textCleaning.py); for the extension surface (minhash,
jaccard, cosine top-k) the baseline is an idiomatic single-node
numpy/pure-python implementation of the same algorithm.

Usage: python tools/pandas_baseline.py [sf_dir] [runs_per_query]

``runs_per_query`` defaults to 2 (the sf0.1 contract); bench.py's sf1
paired block passes 3 so BOTH engines take the min over the same number
of samples — min-of-3 vs min-of-2 under this host's documented noise
would systematically favor whichever side drew more samples (ADVICE r8).
"""

from __future__ import annotations

import hashlib
import json
import re
import string
import sys
import time

import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def load(name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/{name}.parquet")


def li_nulls() -> pd.DataFrame:
    # column-pruned read (round 9): only 5 of lineitem's 11 columns are
    # used, and read_parquet(columns=...) is the idiomatic pandas way to
    # prune — loading all columns inflated the baseline ~0.2 s/call at
    # sf1, unfairly flattering the Spark ratio
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_returnflag"],
    )
    df = li[["l_orderkey", "l_linenumber"]].copy()
    df["qty"] = li["l_quantity"].where(li["l_orderkey"] % 7 != 0)
    df["price"] = li["l_extendedprice"].where(li["l_orderkey"] % 11 != 0)
    df["flag"] = li["l_returnflag"].where(li["l_orderkey"] % 13 != 0)
    return df


def b_s4_profile():
    ev = load("events")
    ev["value"] = ev["value"].where(ev["event_id"] % 7 != 0)
    ev.loc[ev["event_id"] % 11 == 0, "props"] = "unknown"
    sentinels = {"nan", "null", "none", "na", "n/a", "missing", "unknown", "", "nil", "undefined"}
    out = {}
    for c in ("value", "props"):
        s = ev[c]
        missing = int(s.isna().sum())
        if s.dtype == object:
            missing += int(s.dropna().astype(str).str.strip().str.lower().isin(sentinels).sum())
        out[c] = {"missing": missing, "unique": int(s.nunique())}
    out["dup_rows"] = int(ev.duplicated().sum())
    return out


def b_m5_m6_fill_stats():
    a = li_nulls()
    for c in ("qty", "price"):
        a[c] = a[c].fillna(a[c].mean())
    b = li_nulls()
    for c in ("qty", "price"):
        b[c] = b[c].fillna(b[c].median())
    for d in (a, b):
        mode = d["flag"].mode().iloc[0]
        d["flag"] = d["flag"].fillna(mode)
    return (a.shape[0] + b.shape[0], a.shape[1])


def b_m8_m9_ordered_fill():
    ev = load("events")[["event_id", "value"]].sort_values("event_id")
    ev["value_bf"] = ev["value"].where(ev["event_id"] % 7 != 0).bfill()
    ev["value"] = ev["value"].where(ev["event_id"] % 5 != 0).ffill()
    return ev.shape


def b_d1_dedup():
    o = load("orders").sort_values("o_orderkey")
    return o.drop_duplicates(subset=["o_custkey"], keep="first").shape


def b_o6_o7_outlier_actions():
    li = load("lineitem")
    s = li["l_extendedprice"]
    q1, q3 = s.quantile(0.25), s.quantile(0.75)
    iqr = q3 - q1
    capped = s.clip(q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    logt = s.where(s <= 0, np.log1p(s))
    return (capped.sum(), logt.sum())


def b_t234_auto_convert():
    ev = load("events")
    out = {}
    for c, src in (("num_str", ev["value"]), ("int_str", ev["user_id"])):
        s = src.astype(str)
        num = pd.to_numeric(s, errors="coerce")
        if num.notna().mean() > 0.7:
            if (num.dropna() == num.dropna().astype("int64")).all():
                out[c] = num.astype("Int64")
            else:
                out[c] = num
    dt = pd.to_datetime(ev["ts"].dt.strftime("%Y-%m-%d"), errors="coerce")
    out["dt_str"] = dt
    b = ev["event_id"] % 2 == 0
    out["b_str"] = b.map({True: "yes", False: "no"}).map(
        {"yes": True, "no": False}
    )
    return pd.DataFrame(out).shape


def b_x_text_suite():
    d = load("documents")
    s = ("  <b>Hello " + d["text"] + "</b> visit https://ex.com/a?b=1 mail a.b@ex.com 42 cats!  ")
    s = s.str.lower()
    s = s.str.replace(r"<[^>]+>", "", regex=True)
    s = s.str.replace(r"http[s]?://(?:[a-zA-Z]|[0-9]|[$-_@.&+]|[!*\(\),]|(?:%[0-9a-fA-F][0-9a-fA-F]))+", "", regex=True)
    s = s.str.replace(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "", regex=True)
    s = s.str.replace(r"\d+", "", regex=True)
    s = s.str.translate(str.maketrans("", "", string.punctuation))
    s = s.str.strip().str.replace(r"\s+", " ", regex=True)
    t = ("  a-1 " + d["text"] + " z*9  ").str.upper()
    t = t.str.replace(r"[^a-zA-Z0-9\s]", "", regex=True)
    t = t.str.strip().str.replace(r"\s+", " ", regex=True)
    x = d["text"].str.lower().str.replace(r"\bspark\b", "SPARK", regex=True)
    return (s.replace("", None).shape, t.shape, x.shape)


def b_dt1_features():
    o = load("orders")
    s = pd.to_datetime(o["o_orderdate"].dt.strftime("%Y-%m-%d"))
    return pd.DataFrame({
        "y": s.dt.year, "m": s.dt.month, "d": s.dt.day,
    }).shape


def b_e2_onehot():
    c = load("customer")
    c["seg2"] = c["c_mktsegment"]
    full = pd.get_dummies(c, columns=["c_mktsegment"], dummy_na=True)
    return pd.get_dummies(full, columns=["seg2"], dummy_na=True,
                          drop_first=True).shape


def b_y1_common_typos():
    # Reference loops per cell applying each regex (methods/spellingFix.py:121-139).
    d = load("documents")
    msg = "Teh goverment will recieve the managment report. " + d["text"]
    typos = {"teh": "the", "goverment": "government", "recieve": "receive",
             "managment": "management"}
    pats = {re.compile(rf"\b{re.escape(t)}\b", re.IGNORECASE): f for t, f in typos.items()}
    out = []
    for cell in msg:
        for pat, fix in pats.items():
            cell = pat.sub(fix, cell)
        out.append(cell)
    return (len(out),)


def b_n1_n5_roundtrip():
    li = load("lineitem")
    params = {}
    for c in ("l_quantity", "l_extendedprice"):
        s = li[c]
        params[c] = (s.mean(), s.std(ddof=0))
        li[c] = (s - params[c][0]) / params[c][1]
    for c, (m, sd) in params.items():
        li[c + "_inv"] = li[c] * sd + m
    return li.shape


def b_dedup_exact_docs():
    d = load("documents")[["doc_id", "text"]]
    dups = d[d["doc_id"] % 5 == 0].copy()
    dups["doc_id"] += 100000
    full = pd.concat([d, dups])
    full["h"] = [hashlib.md5(t.encode()).hexdigest() for t in full["text"]]
    return full.sort_values("doc_id").drop_duplicates(subset=["h"], keep="first").shape


def _shingles(text: str, n: int = 3) -> set[str]:
    w = text.split()
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


def b_minhash_pairs():
    d = load("documents")
    sh = {i: _shingles(t) for i, t in zip(d["doc_id"], d["text"])}
    rng = np.random.RandomState(42)
    num_perm, bands = 64, 16
    rows = num_perm // bands
    a = rng.randint(1, 2**61 - 1, num_perm, dtype=np.int64)
    b = rng.randint(0, 2**61 - 1, num_perm, dtype=np.int64)
    P = (1 << 61) - 1
    sigs = {}
    for i, s in sh.items():
        if not s:
            continue
        hs = np.array([int.from_bytes(hashlib.md5(x.encode()).digest()[:8], "big") for x in s],
                      dtype=np.uint64).astype(np.int64)
        sigs[i] = ((a[:, None] * hs[None, :] + b[:, None]) % P).min(axis=1)
    buckets: dict[tuple, list] = {}
    for i, sig in sigs.items():
        for bi in range(bands):
            key = (bi, tuple(sig[bi * rows:(bi + 1) * rows]))
            buckets.setdefault(key, []).append(i)
    cands = set()
    for ids in buckets.values():
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                cands.add((min(ids[x], ids[y]), max(ids[x], ids[y])))
    out = []
    for ia, ib in cands:
        inter = len(sh[ia] & sh[ib])
        union = len(sh[ia] | sh[ib])
        if union and inter / union >= 0.9:
            out.append((ia, ib, inter / union))
    return (len(out),)


def b_jaccard_pairs():
    d = load("documents")
    sh = {i: _shingles(t) for i, t in zip(d["doc_id"], d["text"])}
    sizes = {i: len(s) for i, s in sh.items()}
    inv: dict[str, list] = {}
    for i, s in sh.items():
        for x in s:
            inv.setdefault(x, []).append(i)
    common: dict[tuple, int] = {}
    for ids in inv.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                common[(ids[x], ids[y])] = common.get((ids[x], ids[y]), 0) + 1
    out = [
        (a, b, c / (sizes[a] + sizes[b] - c))
        for (a, b), c in common.items()
        if c / (sizes[a] + sizes[b] - c) >= 0.05
    ]
    return (len(out),)


def b_cosine_topk():
    e = load("embeddings")
    M = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    ids = e["vec_id"].to_numpy()
    qmask = ids < 10
    Q = M[qmask]
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    sims = Qn @ Mn.T
    top = np.argsort(-sims, axis=1)[:, :6]  # self + 5
    return top.shape


def b_txt_metrics():
    d = load("documents")
    s = d["text"]
    n_tok = s.str.split().str.len()
    stop = {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"}
    hits = s.str.lower().str.split().map(lambda t: sum(1 for x in t if x in stop))
    quality = (
        ((n_tok >= 10) & (n_tok <= 100000)).astype(float) * 0.4
        + ((s.str.len() / n_tok).between(3, 12)).astype(float) * 0.3
        + np.minimum(0.3, hits / n_tok * 3)
    )
    fp = [hashlib.md5(re.sub(r"\s+", " ", t.lower().strip()).encode()).hexdigest() for t in s]
    return (len(fp), float(quality.sum()))


_PQ_TWIN_INDEX: dict[str, tuple] = {}  # SF -> (books, codes)


def build_pq_twin_index() -> float:
    """Fit the m=8/ks=256 per-subspace codebooks and one-byte-encode the
    corpus ONCE per SF, cached in a module global — mirroring the Spark
    side's ``build_pq_index`` amortization (ADVICE r9: the paired Spark
    row reads a prebuilt persisted index with the build cost excluded
    from the timed loop and reported separately, so the twin paying the
    full fit+encode inside every timed run inflated the ratio in
    Spark's favor). Returns the build seconds (0.0 when already
    cached); ``main`` runs this before the timed loop and records it as
    ``pq_fit_build_sec`` next to the Spark side's
    ``pq_index_build_sec``."""
    if SF in _PQ_TWIN_INDEX:
        return 0.0
    t0 = time.time()
    e = load("embeddings")
    M = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    n, dim = Mn.shape
    m, ks = 8, 256
    sub = dim // m
    rng = np.random.RandomState(42)
    X = Mn if n <= 25_000 else Mn[rng.choice(n, 25_000, replace=False)]
    books = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        kk = min(ks, len(S))
        C = S[rng.choice(len(S), kk, replace=False)].copy()
        for _ in range(10):
            # argmin ||s-c||^2 == argmin |c|^2 - 2 s.c (dot-trick, no n*ks*sub temp)
            assign = np.argmin((C * C).sum(1)[None, :] - 2.0 * (S @ C.T), axis=1)
            counts = np.bincount(assign, minlength=kk).astype(np.float64)
            sums = np.stack(
                [np.bincount(assign, weights=S[:, d], minlength=kk)
                 for d in range(sub)], axis=1,
            )
            nz = counts > 0
            C[nz] = sums[nz] / counts[nz, None]
        books.append(C)
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        S = Mn[:, j * sub : (j + 1) * sub]
        C = books[j]
        codes[:, j] = np.argmin(
            (C * C).sum(1)[None, :] - 2.0 * (S @ C.T), axis=1
        ).astype(np.uint8)
    _PQ_TWIN_INDEX[SF] = (books, codes)
    return round(time.time() - t0, 3)


def b_pq_topk():
    """Single-node twin of q_sim_pq_topk's pq leg: ADC scoring of the
    queries (vec_id < 10) over prebuilt one-byte codes, exact re-rank
    of the refine·k pool, top-(k+1); plus the exact brute-force leg,
    since the Spark row is the tagged union of both. Codebooks + codes
    come from the per-SF cache (``build_pq_twin_index``) exactly like
    the Spark row reads its persisted index — the timed run measures
    search, with the build cost a separate JSON field on both sides."""
    build_pq_twin_index()
    books, codes = _PQ_TWIN_INDEX[SF]
    e = load("embeddings")
    M = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    n, dim = Mn.shape
    m, k, refine = 8, 5, 24
    sub = dim // m
    ids = e["vec_id"].to_numpy()
    out = 0
    for qi in np.where(ids < 10)[0]:
        # ADC: per-subspace inner-product LUTs, summed by code
        adc = np.zeros(n)
        for j in range(m):
            lut = books[j] @ Mn[qi, j * sub : (j + 1) * sub]
            adc += lut[codes[:, j]]
        pool = np.argpartition(-adc, min(refine * k, n - 1))[: refine * k]
        sims = Mn[pool] @ Mn[qi]
        out += len(pool[np.argsort(-sims)][: k + 1])
        # exact leg of the union row
        out += len(np.argsort(-(Mn @ Mn[qi]))[: k + 1])
    return (out,)


def b_ivf_topk():
    e = load("embeddings")
    M = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    rng = np.random.RandomState(42)
    C = Mn[rng.choice(len(Mn), 16, replace=False)]
    for _ in range(10):
        assign = np.argmax(Mn @ C.T, axis=1)
        for j in range(16):
            m = Mn[assign == j]
            if len(m):
                c = m.mean(axis=0)
                C[j] = c / np.linalg.norm(c)
    assign = np.argmax(Mn @ C.T, axis=1)
    ids = e["vec_id"].to_numpy()
    qm = ids < 10
    out = 0
    for qi in np.where(qm)[0]:
        probes = np.argsort(-(Mn[qi] @ C.T))[:4]
        cand = np.isin(assign, probes)
        sims = Mn[cand] @ Mn[qi]
        out += len(np.argsort(-sims)[:6])
    return (out,)


def b_sessionize():
    ev = load("events")[["user_id", "ts"]].sort_values(["user_id", "ts"])
    gap = pd.Timedelta(minutes=30)
    brk = (ev.groupby("user_id")["ts"].diff() > gap) | ev.groupby("user_id")["ts"].diff().isna()
    ev["session_id"] = brk.groupby(ev["user_id"]).cumsum()
    return ev.groupby(["user_id", "session_id"]).agg(
        n=("ts", "size"), start=("ts", "min"), end=("ts", "max")
    ).shape


def b_pipeline_e2e():
    df = li_nulls()
    for c in ("qty", "price"):
        df[c] = df[c].fillna(df[c].median())
    df["flag"] = df["flag"].fillna(df["flag"].mode().iloc[0])
    df = df.drop_duplicates()
    s = df["price"]
    q1, q3 = s.quantile(0.25), s.quantile(0.75)
    iqr = q3 - q1
    df["price"] = s.clip(q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    q = df["qty"]
    df["qty"] = (q - q.min()) / (q.max() - q.min())
    return df.shape


def b_join_asof():
    ev = load("events")[["event_id", "user_id", "ts"]]
    ev["us"] = ev["ts"].astype("int64") // 1000 if ev["ts"].dtype.kind == "i" else (
        ev["ts"].astype("datetime64[us]").astype("int64")
    )
    ev = ev.drop(columns=["ts"])
    st = (
        ev[ev["event_id"] % 20 == 0]
        .groupby(["user_id", "us"], as_index=False)["event_id"].max()
        .rename(columns={"event_id": "status_id"})
    )
    out = pd.merge_asof(
        ev.sort_values("us"), st.sort_values("us"),
        on="us", by="user_id", direction="backward",
    )
    return out.shape


def b_join_range():
    ev = load("events")[["event_id", "value"]]
    iv = ev[ev["event_id"] % 50 == 0]
    v = np.sort(ev["value"].to_numpy())
    order = np.argsort(ev["value"].to_numpy())
    pid_sorted = ev["event_id"].to_numpy()[order]
    csum = np.concatenate([[0], np.cumsum(pid_sorted, dtype=np.int64)])
    lo = np.searchsorted(v, iv["value"].to_numpy() - 2, side="left")
    hi = np.searchsorted(v, iv["value"].to_numpy() + 2, side="right")
    return (int((hi - lo).sum()), int((csum[hi] - csum[lo]).sum()))


def b_curation_split():
    d = load("documents")
    sep = "\x1f"

    def bucket(seed: str, key) -> int:
        h = hashlib.md5(f"{seed}{sep}{key}".encode()).hexdigest()
        return int(h[:8], 16) % 1_000_000

    b = d["doc_id"].map(lambda k: bucket("42", k))
    split = np.where(b < 900_000, "train", np.where(b < 950_000, "val", "test"))
    sb = d["source"].map(lambda k: bucket("7", k))
    thr = d["lang"].map({"en": 500_000, "de": 250_000, "fr": 1_000_000}).fillna(0)
    kept = d[sb < thr]
    return (pd.Series(split).value_counts().to_dict(), len(kept))


def b_curation_contamination():
    d = load("documents")
    grams = {
        row.doc_id: {
            " ".join(w[i : i + 5])
            for w in [row.text.split()]
            for i in range(max(0, len(w) - 4))
        }
        for row in d.itertuples()
    }
    ev = set().union(*(g for i, g in grams.items() if i % 97 == 0)) if grams else set()
    hits = {
        i: len(g & ev) for i, g in grams.items() if i % 97 != 0
    }
    return (len(hits), sum(1 for v in hits.values() if v))


def b_curation_pack():
    d = load("documents").sort_values("doc_id")
    n_tok = d["text"].str.split().str.len().astype("int64")
    start = n_tok.cumsum() - n_tok
    return (int(start.iloc[-1]), int((start // 512).nunique()))


def b_dedup_intercorpus():
    docs = load("documents")[["doc_id", "text"]]
    ref = set(
        hashlib.md5(t.encode()).hexdigest()
        for t in docs.loc[docs["doc_id"] % 5 == 0, "text"]
    )
    dig = docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    return (int((~dig.isin(ref)).sum()),)


def b_sessionize_native():
    # native session_window semantics: strict >= gap breaks; exclusive end
    ev = load("events")[["user_id", "ts"]].sort_values(["user_id", "ts"])
    gap = pd.Timedelta(minutes=30)
    d = ev.groupby("user_id")["ts"].diff()
    brk = (d >= gap) | d.isna()
    ev["session_id"] = brk.groupby(ev["user_id"]).cumsum()
    agg = ev.groupby(["user_id", "session_id"]).agg(
        n=("ts", "size"), start=("ts", "min"), end=("ts", "max")
    )
    agg["end"] = agg["end"] + gap
    return agg.shape


def b_dedup_exact_intercorpus():
    return (b_dedup_exact_docs(), b_dedup_intercorpus())


def b_dedup_spans():
    # C4-style span dedup: global keep-first of consecutive 5-word spans
    d = load("documents")[["doc_id", "text"]].sort_values("doc_id")
    seen: set[str] = set()
    kept_counts = []
    texts = []
    for t in d["text"]:
        w = t.split()
        kept = []
        for i in range(0, len(w), 5):
            s = " ".join(w[i:i + 5])
            if s not in seen:
                seen.add(s)
                kept.append(s)
        kept_counts.append(len(kept))
        texts.append(" ".join(kept))
    return (len(texts), int(np.sum(kept_counts)))


def b_stream_window_agg():
    # sliding 1h/30min keyed window counts: two-shift expansion
    ev = load("events")[["ts", "event_type", "value"]]
    # normalize to epoch seconds regardless of the loaded datetime unit
    sec = ev["ts"].astype("datetime64[us]").astype("int64") // 10**6
    grid = (sec // 1800) * 1800
    a = pd.DataFrame({"ws": grid, "event_type": ev["event_type"], "value": ev["value"]})
    b = pd.DataFrame({"ws": grid - 1800, "event_type": ev["event_type"], "value": ev["value"]})
    both = pd.concat([a, b])
    agg = both.groupby(["ws", "event_type"]).agg(
        n=("value", "size"), sv=("value", "sum")
    )
    return agg.shape


def b_stream_sjoin():
    # r10 twin of the stream-stream interval join row: impressions x
    # clicks per user within [imp_ts, imp_ts + 30 min], per-user summary
    ev = load("events")[["event_id", "ts", "user_id", "value"]]
    imp = ev.loc[ev["event_id"] % 10 == 0, ["user_id", "ts"]]
    clk = ev.loc[ev["event_id"] % 10 == 5, ["user_id", "ts", "value"]]
    m = imp.merge(clk, on="user_id", suffixes=("_i", "_c"))
    m = m[(m["ts_c"] >= m["ts_i"])
          & (m["ts_c"] <= m["ts_i"] + pd.Timedelta(minutes=30))]
    sj = m.groupby("user_id").agg(n=("value", "size"), v=("value", "sum"))
    return sj.shape


def b_o4_isolation_forest():
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from dataforge_spark.operators.iforest_numpy import NumpyIsolationForest

    ev = load("events")
    vals = ev["value"].dropna().sort_values().to_numpy().reshape(-1, 1)
    m = NumpyIsolationForest(contamination=0.1, random_state=42).fit(vals)
    flags = m.predict(ev["value"].fillna(0.0).to_numpy().reshape(-1, 1))
    keep = (flags == 1) | ev["value"].isna().to_numpy()
    return (int(keep.sum()),)


def b_ivf_disk_topk():
    import tempfile

    e = load("embeddings")
    M = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    rng = np.random.RandomState(42)
    C = Mn[rng.choice(len(Mn), 16, replace=False)]
    for _ in range(10):
        assign = np.argmax(Mn @ C.T, axis=1)
        for j in range(16):
            m = Mn[assign == j]
            if len(m):
                c = m.mean(axis=0)
                C[j] = c / np.linalg.norm(c)
    assign = np.argmax(Mn @ C.T, axis=1)
    with tempfile.TemporaryDirectory() as d:
        idx = e.assign(bucket=assign)
        idx.to_parquet(f"{d}/vectors.parquet", index=False)
        back = pd.read_parquet(f"{d}/vectors.parquet")
    Mb = np.stack(back["embedding"].to_numpy()).astype(np.float64)
    Mb = Mb / np.linalg.norm(Mb, axis=1, keepdims=True)
    ids = back["vec_id"].to_numpy()
    out = 0
    for qi in np.where(ids < 10)[0]:
        sims = Mb @ Mb[qi]
        out += len(np.argsort(-sims)[:6])
    return (out,)


BENCHES = {
    "s4_profile": b_s4_profile,
    "m5_m6_fill_stats": b_m5_m6_fill_stats,
    "m8_m9_ordered_fill": b_m8_m9_ordered_fill,
    "d1_dedup_keep_first": b_d1_dedup,
    "o6_o7_outlier_actions": b_o6_o7_outlier_actions,
    "t234_auto_convert": b_t234_auto_convert,
    "x_text_suite": b_x_text_suite,
    "dt1_datetime_features": b_dt1_features,
    "e2_onehot_encode": b_e2_onehot,
    "y1_common_typos": b_y1_common_typos,
    "n1_n5_standard_roundtrip": b_n1_n5_roundtrip,
    "dedup_exact_intercorpus": b_dedup_exact_intercorpus,
    "dedup_spans": b_dedup_spans,
    "dedup_minhash_verified": b_minhash_pairs,
    "dedup_jaccard_pairs": b_jaccard_pairs,
    "sim_cosine_topk": b_cosine_topk,
    "sim_pq_topk": b_pq_topk,
    "sim_ivf_topk": b_ivf_topk,
    "txt_metrics": b_txt_metrics,
    # r10 (VERDICT r9 task 1): the sessionize row is split like the
    # Spark side — the native (session_window-semantics) twin pairs with
    # the JVM headline leg, the ordinal-carrying twin with the stateful
    # leg. r9's "stream_sessionize" twin was b_sessionize_both (= the
    # sum of these two).
    "stream_sessionize_native": b_sessionize_native,
    "stream_sessionize_stateful": b_sessionize,
    "stream_window_agg": b_stream_window_agg,
    "stream_sjoin": b_stream_sjoin,
    "pipeline_e2e": b_pipeline_e2e,
    "join_asof": b_join_asof,
    "join_range": b_join_range,
    "curation_split": b_curation_split,
    "curation_contamination": b_curation_contamination,
    "curation_pack": b_curation_pack,
    "o4_isolation_forest": b_o4_isolation_forest,
    "sim_ivf_disk_topk": b_ivf_disk_topk,
}


def _calibration_sec() -> float:
    """Single-threaded numpy reference job (fixed work, no I/O), the
    pandas-side twin of bench._calibration_sec: steady ~0.65 s on a
    quiet host (measured best-of-3). Recorded [pre, post] so a contended
    baseline run (this shared box swings 3-100x under co-tenant load) is
    visible in the JSON — much above ~1.3 s means the per-query numbers
    are inflated — instead of silently poisoning the Spark-vs-pandas
    ratio."""
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        a = np.arange(50_000_000, dtype=np.int64)
        ((a % 97) * (a % 89)).sum()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _micro_cal_sec() -> float:
    """~40 ms numpy reference, run after EVERY query: the r8 third
    paired run showed the [pre, post] edge calibrations can both be
    steady while a mid-phase co-tenant burst inflates the long string
    rows 2-2.5x — a per-query trace localizes such a burst to the rows
    it actually poisoned instead of leaving the whole phase deniable."""
    t0 = time.time()
    a = np.arange(3_000_000, dtype=np.int64)
    ((a % 97) * (a % 89)).sum()
    return round(time.time() - t0, 4)


def main() -> None:
    times = {}
    micro = {}
    cal_pre = _calibration_sec()
    # `value` times ONLY the query loop — the edge calibrations sit
    # outside the window, and the per-query micro-cals (which must run
    # INSIDE the loop to localize mid-phase bursts) are summed and
    # subtracted so they don't inflate the recorded wall (ADVICE r8).
    # prebuild the PQ twin index OUTSIDE the timed window (same
    # amortization as the Spark side's build_pq_index; ADVICE r9)
    pq_build = build_pq_twin_index()
    t_all = time.time()
    # best-of-RUNS per query (bench.py passes the Spark side's count so
    # both engines' minima come from the same number of samples) — a
    # single sample under co-tenant load recorded 28 s for a query
    # whose steady state is 0.16 s, poisoning the paired ratio.
    micro_total = 0.0
    for name, fn in BENCHES.items():
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        t_m = time.time()
        micro[name] = _micro_cal_sec()
        micro_total += time.time() - t_m
    value = round(time.time() - t_all - micro_total, 3)
    cal_post = _calibration_sec()
    print(json.dumps({
        "metric": "pandas_baseline_total_sec",
        "value": value,
        "queries": times,
        "runs_per_query": RUNS,
        "pq_fit_build_sec": pq_build,
        "calibration_sec": [cal_pre, cal_post],
        # per-query host-speed trace (~40 ms steady each): a row whose
        # neighboring micro-cals spike was measured under a burst
        "micro_cal_sec": micro,
        "sf_dir": SF,
    }))


if __name__ == "__main__":
    main()
