"""Table maintenance for 100 TB operations: small-file compaction and
a checksum-manifest publish/verify pair.

No counterpart in the reference (single-process pandas, one file in /
one file out); this is the operational tier a production lakehouse
needs: crawl increments and streaming sinks accrete thousands of tiny
part files (every scan then pays per-file open/footer costs and loses
row-group pruning), and multi-writer object stores need a way to tell
a COMPLETE table from a partially-written one.

Scale design:

- ``compact_files`` reads total bytes from the file listing (driver
  metadata only), computes the partition count that hits
  ``target_file_bytes``, and rewrites via ``coalesce`` — NO shuffle
  when shrinking file count (the common case; each output task
  concatenates whole input splits). Pass ``sort_by`` to instead
  ``repartitionByRange + sortWithinPartitions`` (one shuffle) when the
  rewrite should also restore clustering (e.g. after many unsorted
  appends to a z-ordered table — re-run ``partitioning.zorder_write``
  for full multi-dim clustering).
- ``write_with_manifest`` / ``verify_manifest`` publish a
  ``_manifest.json`` naming every part file with its byte size and md5
  — a reader (or the next pipeline stage) verifies the table is
  exactly the set of files one successful job wrote: no missing parts
  (failed tasks), no orphans (a concurrent/zombie writer's output
  would otherwise be silently read as table data). Hashing streams
  file-by-file on the driver for local paths — the verify cost is one
  read of the table's bytes, and rides an executor-parallel Spark job
  via ``binaryFile`` when the table is large or remote.
"""

from __future__ import annotations

import hashlib
import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def _strip_scheme(uri: str) -> str:
    return uri[7:] if uri.startswith("file://") else uri


def _part_files(path: str) -> list[str]:
    """Data part files of a table directory (underscore/dot files —
    _SUCCESS, _manifest.json, .crc — are metadata, not data)."""
    return sorted(
        f
        for f in os.listdir(path)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(path, f))
    )


def table_file_stats(path: str, small_file_bytes: int = 32 * 1024 * 1024) -> dict:
    """Driver-side listing stats: the numbers that decide whether a
    table needs compaction. Metadata only — no data is read."""
    path = _strip_scheme(path)
    sizes = [os.path.getsize(os.path.join(path, f)) for f in _part_files(path)]
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes, default=0),
        "max_bytes": max(sizes, default=0),
        "mean_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
        "n_small_files": sum(1 for s in sizes if s < small_file_bytes),
    }


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at ``path`` into ``out_path`` with
    file sizes near ``target_file_bytes``. Never rewrites in place —
    swapping the compacted table in is the caller's (atomic-rename or
    metastore) operation, because a non-atomic in-place rewrite is a
    read-torn table at 100 TB.

    Without ``sort_by``: ``coalesce`` (shuffle-free concatenation of
    input splits). With ``sort_by``: ``repartitionByRange`` +
    ``sortWithinPartitions`` so every output file is also a tight
    range of the sort key (restores footer min/max pruning).
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    before = table_file_stats(path)
    n_parts = max(1, math.ceil(before["total_bytes"] / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(n_parts, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.coalesce(n_parts)
    out.write.mode("errorifexists").parquet(out_path)
    after = table_file_stats(out_path)
    return {"before": before, "after": after, "target_partitions": n_parts}


def _md5_of(fpath: str) -> str:
    h = hashlib.md5()
    with open(fpath, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def write_with_manifest(
    df: DataFrame, path: str, format: str = "parquet"
) -> dict:
    """Write ``df`` and publish ``_manifest.json`` beside the parts:
    ``{"format", "files": [{"name", "bytes", "md5"}], "n_files",
    "total_bytes"}``. The manifest is written LAST, so its presence
    certifies a complete table (readers that require it get
    all-or-nothing semantics on stores without atomic directory
    commit)."""
    if format == "parquet":
        df.write.mode("errorifexists").parquet(path)
    elif format == "orc":
        df.write.mode("errorifexists").orc(path)
    else:
        raise ValueError(f"unsupported manifest format: {format!r}")
    base = _strip_scheme(path)
    files = [
        {
            "name": f,
            "bytes": os.path.getsize(os.path.join(base, f)),
            "md5": _md5_of(os.path.join(base, f)),
        }
        for f in _part_files(base)
    ]
    manifest = {
        "format": format,
        "files": files,
        "n_files": len(files),
        "total_bytes": sum(f["bytes"] for f in files),
    }
    with open(os.path.join(base, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_manifest(
    spark: SparkSession | None, path: str, check_hashes: bool = True
) -> dict:
    """Check the table against its manifest. Returns ``{"ok", "missing",
    "orphans", "size_mismatch", "hash_mismatch"}`` — ``ok`` iff every
    manifest file is present with the recorded size (and md5 when
    ``check_hashes``) and no unlisted data files exist.

    ``spark`` given and the table non-local/large → hashing runs as a
    ``binaryFile`` Spark job (executor-parallel); ``spark=None`` hashes
    driver-side, which is fine for the listing/size checks that
    dominate routine verification."""
    base = _strip_scheme(path)
    with open(os.path.join(base, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    listed = {f["name"]: f for f in manifest["files"]}
    present = set(_part_files(base))
    missing = sorted(set(listed) - present)
    orphans = sorted(present - set(listed))
    size_mismatch = sorted(
        n
        for n in set(listed) & present
        if os.path.getsize(os.path.join(base, n)) != listed[n]["bytes"]
    )
    hash_mismatch: list[str] = []
    if check_hashes:
        candidates = sorted((set(listed) & present) - set(size_mismatch))
        got: dict = {}
        if spark is not None and candidates:
            try:
                rows = (
                    spark.read.format("binaryFile")
                    .load([os.path.join(base, n) for n in candidates])
                    .select(
                        F.element_at(F.split("path", "/"), -1).alias("name"),
                        F.md5("content").alias("md5"),
                    )
                    .collect()
                )
                got = {r["name"]: r["md5"] for r in rows}
            except Exception:
                # a corrupted file can abort the whole Spark read (the
                # local-FS .crc layer raises before our md5 runs) — the
                # per-file driver fallback below still localizes WHICH
                # file is bad, which is the whole point of verifying
                got = {}
        if not got:
            got = {n: _md5_of(os.path.join(base, n)) for n in candidates}
        hash_mismatch = sorted(
            n for n in candidates if got.get(n) != listed[n]["md5"]
        )
    ok = not (missing or orphans or size_mismatch or hash_mismatch)
    return {
        "ok": ok,
        "missing": missing,
        "orphans": orphans,
        "size_mismatch": size_mismatch,
        "hash_mismatch": hash_mismatch,
    }
