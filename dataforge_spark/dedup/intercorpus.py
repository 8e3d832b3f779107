"""Inter-corpus dedup: drop documents already present in a REFERENCE
corpus (extension, SURVEY §7.7 class — the pattern behind "dedup this
crawl against the last N training snapshots").

Formulation: anti-join on a 128-bit content digest, declared so Catalyst
can pick the physical strategy per scale:

- reference digests below ``broadcast_rows`` → explicit ``broadcast()``:
  the new corpus is filtered MAP-ONLY, zero shuffles (the common case —
  a benchmark/eval snapshot is tiny next to a crawl);
- larger references → shuffle anti-join of digests only (16 bytes + id
  per row, never document bodies). Spark ≥3.3's runtime bloom-filter
  injection (``spark.sql.optimizer.runtime.bloomFilter.enabled``) prunes
  the probe side at the scan/shuffle boundary when the build side is
  selective — the engine inserts the bloom pass this module would
  otherwise hand-roll, which is exactly the declare-don't-schedule bet
  this repo makes everywhere.

Only digests travel: the wide document columns stay on the new corpus'
side of a semi/anti join and are never shuffled by digest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# fast-path gate constants (round 9, ADVICE r8): the byte estimate is a
# no-job check, the raw-rowcount probe is a scan-only short job that
# soundly bounds the distinct digest count the broadcast will hold
_FAST_PATH_EST_BYTES = 64 * 1024 * 1024
_DEFAULT_BROADCAST_ROWS = 10_000_000


def digest(col: str | Column) -> Column:
    """128-bit content digest (md5 hex) — collision-safe for exact dedup
    at corpus scale, portable to every oracle engine."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def intercorpus_dedup(
    new: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    ref_text_col: str | None = None,
    broadcast_rows: int = _DEFAULT_BROADCAST_ROWS,
) -> DataFrame:
    """Rows of ``new`` whose ``text_col`` content does NOT appear in
    ``reference`` (exact content match by md5 digest). Keeps every column
    of ``new``; ``reference`` contributes only its digest set.

    ``broadcast_rows`` gates the explicit broadcast: 1e7 digests ≈ 500 MB
    broadcast — at or below this the anti-join is map-only; above it the
    digests shuffle (with runtime bloom pruning where the optimizer
    applies it).

    The fast path avoids the expensive probe in the common case (round
    8 — an exact ``distinct().limit(n+1).count()`` probe was a separate
    shuffle-bearing 0.3-0.4 s Spark job on the hot path): when
    Catalyst's footer-stat estimate of the reference plan is ≤ 64 MB AND
    the caller left ``broadcast_rows`` at (or above) its default, the
    digests broadcast after only a RAW-rowcount backstop probe (a plain
    ``count()`` — no distinct, no shuffle, one job, and the scan it
    counts is already byte-bounded by the estimate gate). The
    byte estimate alone is NOT a sound row bound (round 9, ADVICE r8):
    it bounds the reference's stored TEXT bytes, and many small distinct
    texts — short IDs, dict/RLE-friendly values — can store far smaller
    than their md5 digests, so a ≤ 64 MB reference can hide tens of
    millions of distinct digests and OOM the broadcast. The raw row
    count bounds the distinct digest count from above, closing that
    hole for the cost of a scan-only limit job (~0.1-0.3 s here —
    bounded and cheap relative to a driver/executor OOM). The broadcast
    side still ``distinct()``s (folded into the broadcast-build job). A
    caller that tightened ``broadcast_rows`` below the default, an
    estimate-unavailable / estimate-large reference, or a raw count
    over budget (the reference may still be duplicate-heavy with few
    DISTINCT digests) pays the exact ``distinct().limit(n+1).count()``
    probe (which never pays a full count) and may take the digests-only
    shuffle path.
    """
    from ..partitioning import plan_size_bytes

    ref_text_col = ref_text_col or text_col
    tagged = new.withColumn("__d", digest(text_col))
    ref_digests = reference.select(digest(ref_text_col).alias("__d")).distinct()

    if _fast_broadcast_ok(reference, broadcast_rows):
        return tagged.join(F.broadcast(ref_digests), "__d", "left_anti").drop("__d")

    small = ref_digests.limit(broadcast_rows + 1).count() <= broadcast_rows
    right = F.broadcast(ref_digests) if small else ref_digests
    return tagged.join(right, "__d", "left_anti").drop("__d")


def write_digest_index(
    df: DataFrame, path: str, text_col: str = "text"
) -> dict:
    """Persist a corpus' DISTINCT content digests so later batches can
    exact-dedup against it WITHOUT rescanning its text — the exact-hash
    sibling of ``dedup.index.write_minhash_index`` (same layout
    convention: ``digests/`` parquet + ``_meta/`` params json). 16
    bytes/doc: a 100 TB corpus of ~1e11 docs is a ~3 TB digest table —
    scanned, never collected; the broadcast gate below decides the join
    strategy per batch."""
    spark = df.sparkSession
    digs = df.select(digest(text_col).alias("digest")).distinct()
    digs.write.mode("errorifexists").parquet(f"{path}/digests")
    n = spark.read.parquet(f"{path}/digests").count()
    spark.createDataFrame(
        [(1, "md5", n)], "version int, digest_fn string, n_digests long"
    ).coalesce(1).write.mode("errorifexists").json(f"{path}/_meta")
    return {"path": path, "n_digests": n}


def _read_digest_meta(spark, path: str) -> dict:
    row = spark.read.json(f"{path}/_meta").first()
    if row is None or "digest_fn" not in row:
        raise ValueError(f"no digest-index meta at {path}/_meta")
    meta = row.asDict()
    if meta["digest_fn"] != "md5":
        raise ValueError(
            f"digest index at {path} uses digest_fn={meta['digest_fn']!r}; "
            "this build computes md5"
        )
    return meta


def dedup_against_digest_index(
    new: DataFrame,
    path: str,
    text_col: str = "text",
    broadcast_rows: int = _DEFAULT_BROADCAST_ROWS,
) -> DataFrame:
    """Rows of ``new`` whose content digest is NOT in the persisted
    index — the incremental form of :func:`intercorpus_dedup` (same
    gated broadcast-vs-shuffle anti-join, but the reference side is the
    stored digest table, so the snapshot's text is never rescanned)."""
    spark = new.sparkSession
    _read_digest_meta(spark, path)
    ref = spark.read.parquet(f"{path}/digests").select(
        F.col("digest").alias("__d")
    )
    tagged = new.withColumn("__d", digest(text_col))
    if _fast_broadcast_ok(ref, broadcast_rows):
        right = F.broadcast(ref)
    else:
        small = ref.limit(broadcast_rows + 1).count() <= broadcast_rows
        right = F.broadcast(ref) if small else ref
    return tagged.join(right, "__d", "left_anti").drop("__d")


def append_to_digest_index(
    df: DataFrame, path: str, text_col: str = "text"
) -> dict:
    """Grow the index with ``df``'s digests that are not already
    present (anti-join before the append keeps the stored table
    distinct, so the per-batch join side never accumulates duplicate
    rows). Typical loop: ``dedup_against_digest_index`` → accept →
    ``append_to_digest_index`` on the accepted rows."""
    spark = df.sparkSession
    meta = _read_digest_meta(spark, path)
    existing = spark.read.parquet(f"{path}/digests")
    fresh = (
        df.select(digest(text_col).alias("digest"))
        .distinct()
        .join(existing, "digest", "left_anti")
    )
    fresh.write.mode("append").parquet(f"{path}/digests")
    n = spark.read.parquet(f"{path}/digests").count()
    spark.createDataFrame(
        [(1, "md5", n)], "version int, digest_fn string, n_digests long"
    ).coalesce(1).write.mode("overwrite").json(f"{path}/_meta")
    return {"path": path, "n_digests": n, "appended": n - meta["n_digests"]}


def _fast_broadcast_ok(reference: DataFrame, broadcast_rows: int) -> bool:
    """True when the reference may broadcast WITHOUT the exact
    distinct-digest probe: footer-stat byte estimate small, default-or-
    larger budget, and — the round-9 backstop (ADVICE r8) — a raw
    ``count()`` at or under budget. Raw rows ≥ distinct digests, so
    this soundly bounds the broadcast; the byte estimate alone bounds
    stored TEXT bytes, which dict/RLE compression and short-ID corpora
    decouple from digest count. A PLAIN count, not ``limit(n+1).count()``:
    the byte gate already bounds the scan, and when the limit is never
    reached (the common small-reference case) CollectLimit escalates
    through several incremental jobs — measured 0.23 s vs 0.14 s for
    one count job on a 12k-row reference at 32-task granularity. The
    fallthrough distinct probe keeps the limit form because no byte
    bound holds there."""
    from ..partitioning import plan_size_bytes

    est = plan_size_bytes(reference)
    return (
        est is not None
        and est <= _FAST_PATH_EST_BYTES
        and broadcast_rows >= _DEFAULT_BROADCAST_ROWS
        and reference.count() <= broadcast_rows
    )
