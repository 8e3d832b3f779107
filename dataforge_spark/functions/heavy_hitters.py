"""One-pass heavy-hitters sketch — mergeable Misra–Gries summaries
(Misra & Gries 1982; merge rule per Agarwal et al. 2012, "Mergeable
Summaries"): find the hot keys of a 100 TB column WITHOUT the
groupBy-count shuffle `partitioning.skew_metrics` pays.

No counterpart in the reference (single-process pandas,
``/root/reference/pipeline.py``); this is the skew-diagnosis tier of
the LLM-pipeline extensions — its output feeds
``partitioning.salted_join`` / ``salted_aggregate_counts``.

Scale design:

- ONE ``mapInPandas`` scan; each task folds its whole partition into a
  single ≤``capacity``-entry summary (exact ``value_counts`` per Arrow
  batch, then the Misra–Gries decrement — vectorized, no per-row
  Python). The driver collects one tiny summary per partition and
  merges them with the same rule. Zero shuffles; driver traffic is
  ``partitions × capacity`` rows, independent of data size.
- Deterministic: summaries depend only on partition contents, and the
  GUARANTEES (bracketing bounds, φ-heavy recall) are layout-independent
  even though tie-order details are not.

Guarantees (standard MG, surfaced per item instead of hidden):

- every returned item carries ``[count_lo, count_hi]`` with
  ``count_lo ≤ true ≤ count_hi``; ``count_hi - count_lo ≤ n/capacity``.
- any value with true frequency > n/capacity is PRESENT in the merged
  summary (φ-heavy recall) — so with ``capacity ≥ k/φ`` no hot key is
  missed; an item is flagged ``guaranteed`` for top-k when its lower
  bound clears every excluded item's upper bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counts: dict, capacity: int) -> int:
    """Shrink ``counts`` to ≤ capacity entries by the Misra–Gries rule:
    subtract the (capacity+1)-th largest count from everything, drop
    non-positives. Returns the subtracted offset (the error added)."""
    if len(counts) <= capacity:
        return 0
    cut = sorted(counts.values(), reverse=True)[capacity]
    for v in [v for v, c in counts.items() if c <= cut]:
        del counts[v]
    for v in counts:
        counts[v] -= cut
    return cut


def _mg_fold_batches(batches, col: str, capacity: int):
    """(counts dict, err, n_nonnull) over an iterator of pandas frames."""
    counts: dict = {}
    err = 0
    n = 0
    for pdf in batches:
        vc = pdf[col].value_counts(dropna=True)  # exact within the batch
        n += int(vc.sum())
        for v, c in vc.items():
            counts[v] = counts.get(v, 0) + int(c)
        err += _mg_reduce(counts, capacity)
    return counts, err, n


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int | None = None
) -> dict:
    """Top-k hot values of ``col`` with deterministic error brackets,
    in one shuffle-free pass.

    Returns ``{"n", "capacity", "error_bound", "items", "guaranteed"}``
    where ``items`` is ``[(value, count_lo, count_hi), ...]`` sorted by
    ``count_lo`` descending (ties by value string for stable output)
    and ``guaranteed`` marks the items whose lower bound beats the
    upper bound of everything excluded — i.e. provably in the true
    top-k. NULLs are not counted (they are their own skew signal;
    check ``df.where(col.isNull()).count()`` separately).
    """
    if capacity is None:
        capacity = max(8 * k, 64)
    if capacity < k:
        raise ValueError(f"capacity {capacity} must be ≥ k {k}")
    from pyspark.sql import types as T

    field = df.schema[col]
    schema = T.StructType(
        [
            T.StructField("value", field.dataType),
            T.StructField("cnt", T.LongType()),
            T.StructField("err", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def fold(batches):
        import pandas as pd

        counts, err, n = _mg_fold_batches(batches, col, capacity)
        # one NULL-valued header row carries the summary's (err, n) —
        # unambiguous because NULL data values are never counted.
        yield pd.DataFrame(
            {
                "value": [None] + list(counts.keys()),
                "cnt": [0] + list(counts.values()),
                "err": err,
                "n": n,
            }
        )

    partials = df.select(col).mapInPandas(fold, schema=schema).collect()

    merged: dict = {}
    total_err = 0
    total_n = 0
    for r in partials:
        if r["value"] is None:
            total_err += r["err"]
            total_n += r["n"]
        else:
            merged[r["value"]] = merged.get(r["value"], 0) + r["cnt"]
    total_err += _mg_reduce(merged, capacity)

    items = sorted(
        ((v, c, c + total_err) for v, c in merged.items()),
        key=lambda t: (-t[1], str(t[0])),
    )[:k]
    kth_excluded_hi = (
        max(
            (c + total_err for v, c in merged.items()
             if (v, c, c + total_err) not in items),
            default=total_err,  # an untracked value can hide ≤ err rows
        )
    )
    guaranteed = [v for v, lo, _ in items if lo > kth_excluded_hi]
    return {
        "n": total_n,
        "capacity": capacity,
        "error_bound": total_err,
        "items": items,
        "guaranteed": guaranteed,
    }


def hot_keys(df: DataFrame, col: str, min_share: float = 0.01) -> list:
    """Values provably holding at least ``min_share`` of the non-null
    rows (by their LOWER bound — no false positives; φ-heavy recall
    needs ``capacity ≥ 1/min_share``, which is set here). The output
    list plugs straight into a salting decision for
    ``partitioning.salted_join``."""
    if not 0 < min_share < 1:
        raise ValueError(f"min_share must be in (0,1), got {min_share}")
    capacity = max(int(2.0 / min_share), 64)
    hh = heavy_hitters(df, col, k=capacity, capacity=capacity)
    thresh = hh["n"] * min_share
    return [v for v, lo, _ in hh["items"] if lo >= thresh]
