#!/usr/bin/env python
"""Hardware scaling controls for BENCH/BASELINE.md.

Measures what THIS host physically gives N parallel workers,
independent of Spark, so engine scaling numbers can be judged against
the machine's own ceilings:

- ``cpu``: tight integer loop per process, zero shared state — the
  pure-CPU ceiling (exposes the SMT cliff above the physical-core
  count).
- ``mem``: per-process streaming sum over a private 256 MiB numpy
  array — the memory-bandwidth ceiling (what columnar scan/decode
  workloads actually hit).

Usage: python tools/cpu_control.py            # both controls at 2/8/32
Prints one JSON line with per-level seconds and N→4N efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

LEVELS = (2, 8, 32)
REPS = 3


def _cpu_work(_):
    t0 = time.time()
    s = 0
    for i in range(30_000_000):
        s += i & 7
    return time.time() - t0


def _mem_work(_):
    import numpy as np

    a = np.arange(32_000_000, dtype=np.float64)  # 256 MiB, private
    float(a.sum())  # touch every page before timing
    t0 = time.time()
    s = 0.0
    for _ in range(8):
        s += float(a.sum())
    return time.time() - t0


def run_control(fn, n_procs: int) -> float:
    """Max in-worker loop time (allocation/scheduling excluded): how
    much each worker's throughput degrades when n of them run."""
    best = float("inf")
    for _ in range(REPS):
        with mp.Pool(n_procs) as p:
            worker_times = p.map(fn, range(n_procs))
        best = min(best, max(worker_times))
    return best


def main() -> None:
    out: dict = {}
    for name, fn in (("cpu", _cpu_work), ("mem", _mem_work)):
        secs = {n: round(run_control(fn, n), 3) for n in LEVELS}
        # per-worker work is fixed → total work scales with n; perfect
        # scaling keeps wall time flat.  efficiency(N→4N) = t_N / t_4N
        out[name] = {
            **{f"sec_{n}": secs[n] for n in LEVELS},
            "eff_2_8": round(secs[2] / secs[8], 3),
            "eff_8_32": round(secs[8] / secs[32], 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
