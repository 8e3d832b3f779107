"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 (or
$SPARK_GRAFT_SF_DIR) and, when an ``oracle_sql()`` entry exists, the
equivalent DuckDB SQL on the same parquet tables; compares row count,
sorted column names, and order-insensitive values (columns sorted by name,
rows sorted, exact cell equality after canonicalization). Queries without
an oracle get a rows-only check.

Usage: python tools/check_correctness.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dataforge_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # collapse -0.0 vs 0.0 and represent exactly
        return repr(v + 0.0)
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "item"):  # numpy scalar
        return canon_cell(v.item())
    return v


def canon(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    # Recomputed oracles (tools/oracle_recompute.py) must derive their
    # expected values from the SAME data the queries run on.
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    only = {a for a in args if not a.startswith("--")}
    if vanilla:
        # Simulate the driver: a bare session with stock confs (ansi on,
        # 200 shuffle partitions, no AQE tweaks, default timezone).
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("vanilla").getOrCreate()
    else:
        spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver testdata is a single file; generated corpora (tools/
        # make_sf1.py) are Spark directory-parquet — glob those
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name} (rows-only: {len(got)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        ec, er = canon(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} != {len(er)}")
            n_fail += 1
            continue
        bad = next((i for i, (a, b) in enumerate(zip(gr, er)) if a != b), None)
        if bad is not None:
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark: {gr[bad]}")
            print(f"  duck : {er[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gr)} rows) [{time.time()-t0:.1f}s]")
        n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed")
    # Auto-log FULL (unfiltered) gate runs so commits can cite a green
    # gate that demonstrably postdates them (GATE_RUNS.jsonl carries
    # UTC timestamp + HEAD; see tools/log_gate_run.py).
    if not only:
        try:
            import subprocess

            mode = "vanilla" if vanilla else "tuned"
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "log_gate_run.py"),
                 f"--{'vanilla' if vanilla else 'gate'}",
                 f"{n_pass} passed, {n_fail} failed",
                 "--note", f"auto: check_correctness full run ({mode}, {sf_dir})"],
                check=False, capture_output=True,
            )
        except Exception:
            pass
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
