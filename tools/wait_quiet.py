"""Block until the host looks quiet: steal% below a threshold for a
consecutive number of sample windows. Prints the observed samples.

Usage: python tools/wait_quiet.py [max_wait_sec] [steal_pct] [windows]
Exits 0 when quiet, 1 on timeout (caller decides what to do).
"""

from __future__ import annotations

import sys
import time


def sample(dt: float = 5.0) -> float:
    def read():
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7]

    t0, s0 = read()
    time.sleep(dt)
    t1, s1 = read()
    return 100.0 * (s1 - s0) / max(1, t1 - t0)


def main() -> None:
    max_wait = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    need = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    t_start = time.time()
    streak = 0
    while time.time() - t_start < max_wait:
        s = sample()
        print(f"steal {s:.2f}%", flush=True)
        streak = streak + 1 if s < thr else 0
        if streak >= need:
            print("QUIET")
            sys.exit(0)
    print("TIMEOUT")
    sys.exit(1)


if __name__ == "__main__":
    main()
