"""Append a full-gate run record to GATE_RUNS.jsonl (VERDICT r6 task 2:
the round's last commit must demonstrably postdate a green full-gate
run). Usage, immediately after running the gates:

    python tools/log_gate_run.py \
        --pytest "231 passed" --gate "50 passed, 0 failed" \
        --vanilla "50 passed, 0 failed"

Records UTC timestamp + current HEAD, so `git log` ordering vs the
record is checkable by anyone.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pytest", default=None)
    ap.add_argument("--gate", default=None)
    ap.add_argument("--vanilla", default=None)
    ap.add_argument("--note", default=None)
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=root, capture_output=True, text=True
    ).stdout.strip()
    # A gate run against uncommitted edits tests code HEAD doesn't have —
    # flag it so "commit X postdates a green gate" stays auditable.
    # Driver-owned telemetry (PROGRESS.jsonl, appended in the background
    # every ~15 min) and this log itself are excluded: neither is code,
    # and both made every long gate run read as dirty.
    _NON_CODE = {"PROGRESS.jsonl", "GATE_RUNS.jsonl"}
    dirty = bool([
        line
        for line in subprocess.run(
            ["git", "status", "--porcelain"], cwd=root,
            capture_output=True, text=True,
        ).stdout.splitlines()
        if line.strip() and line[3:].strip() not in _NON_CODE
    ])
    # Explicit machine-checkable pass/fail (ADVICE r7): a red run must
    # not land in the log in the same shape as a green one. ok=True only
    # when every provided result string reports zero failures.
    def _ok(s: str | None) -> bool | None:
        if s is None:
            return None
        import re

        # '3 xfailed' must not count as failed (needs whitespace directly
        # before 'failed'); collection 'errors' count as red.
        counts = [
            int(m.group(1))
            for m in re.finditer(r"(\d+)\s(?:failed|errors?)\b", s)
        ]
        if counts:
            return all(c == 0 for c in counts)
        return bool(re.search(r"\d+\s+passed", s)) and not re.search(
            r"\berror", s, re.I
        )

    oks = [o for o in (_ok(args.pytest), _ok(args.gate), _ok(args.vanilla))
           if o is not None]
    rec = {
        "ts_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "head": head,
        "ok": bool(oks) and all(oks),
        "dirty_tree": dirty or None,
        "pytest": args.pytest,
        "gate_tuned": args.gate,
        "gate_vanilla": args.vanilla,
        "note": args.note,
    }
    with open(os.path.join(root, "GATE_RUNS.jsonl"), "a") as fh:
        fh.write(json.dumps({k: v for k, v in rec.items() if v is not None}) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
