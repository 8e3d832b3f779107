"""Final-line byte-budget contract for bench.py.

The driver captures only the last ~2 KB of bench stdout; rounds 9 and 10
both overflowed it (VERDICT r10 nit 1, `parsed: null`). These tests pin
the enforcer: an r10-shaped oversized dict must be trimmed under budget
while keeping the contract keys (metric/value/unit/queries/sf) and the
sf1 ratio, and a small dict must pass through untouched.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enforce_line_budget  # noqa: E402


def _r10_shaped_out() -> dict:
    """Reconstruct (approximately) the dict whose encoding overflowed the
    r10 tail capture: 32 query rows plus every optional section."""
    queries = {
        f"some_longish_query_name_{i:02d}": round(0.123 + i * 0.37, 3)
        for i in range(32)
    }
    return {
        "metric": "bench_total_sec",
        "value": 43.784,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "runs_per_query": 2,
        "wall_sec": 99.706,
        "headline_attempts": 1,
        "ivf_index_build_sec": 0.0,
        "pq_index_build_sec": 0.0,
        "calibration_sec": [0.172, 0.117],
        "stream_setup_sec": 6.485,
        "stream_overhead_sec": 2.132,
        "stream_sessionize_stateful_steady_sec": -0.026,
        "stream_window_agg_steady_sec": -0.815,
        "recall": {
            "ivf@5": {"nprobe4": 0.628, "nprobe8": 0.844},
            "ivf_cl@5": {"nprobe4": 1.0, "nprobe8": 1.0},
            "pq@5": {"r12": 0.896, "r24": 1.0, "ivfpq8_r12": 0.896},
            "mh_t.9": 1.0,
        },
        "jsonl": {"spark_sec": 0.287, "pandas_sec": 0.238},
        "crossover": {
            "rows": 6000000,
            "spark_total_sec": 5.291,
            "pandas_total_sec": 4.021,
        },
        "crossover_60m": {
            "rows": 60000000,
            "spark_total_sec": 11.098,
            "pandas_total_sec": 135.641,
        },
        "sf1": {
            "spark_total_sec": 60.569,
            "pandas_total_sec": 130.034,
            "ratio": 0.466,
            "fold_checks_pass": 13,
            "fold_checks_total": 13,
            "calibration_sec": [0.136, 0.153],
            "pandas_calibration_sec": [0.672, 0.713],
            "spark_attempts": 1,
            "pandas_attempts": 1,
            "runs": [3, 3],
            "wagg_steady_sec": 0.034,
            "sess_stateful_steady_sec": 0.722,
        },
        "detail_file": "bench_detail.json",
    }


def test_oversized_line_is_trimmed_under_budget():
    out = _r10_shaped_out()
    assert len(json.dumps(out)) > 1900  # the r10 failure precondition
    trimmed = enforce_line_budget(out, budget=1900)
    line = json.dumps(trimmed)
    assert len(line) <= 1900
    # Contract keys survive.
    for key in ("metric", "value", "unit", "queries", "sf", "detail_file"):
        assert key in trimmed, key
    assert len(trimmed["queries"]) == 32
    # The sf1 gate summary (the judge's headline ratio) survives.
    assert trimmed["sf1"]["ratio"] == 0.466
    assert trimmed["sf1"]["fold_checks_pass"] == 13
    assert trimmed["trimmed_keys"] >= 1
    json.loads(line)  # round-trips


def test_small_line_passes_through_untouched():
    out = {
        "metric": "bench_total_sec",
        "value": 1.0,
        "unit": "sec",
        "queries": {"q1": 0.5},
        "sf": 0.1,
    }
    before = json.loads(json.dumps(out))
    trimmed = enforce_line_budget(out, budget=1900)
    assert trimmed == before
    assert "trimmed_keys" not in trimmed


def test_pathological_budget_rounds_query_times():
    out = _r10_shaped_out()
    # A budget small enough that every optional key must go AND query
    # times fall back to 2 decimals; the dict still holds the contract.
    trimmed = enforce_line_budget(out, budget=1100)
    assert "recall" not in trimmed and "crossover_60m" not in trimmed
    assert all(
        round(v, 2) == v for v in trimmed["queries"].values()
    )
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in trimmed
