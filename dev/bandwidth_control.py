"""Memory-bandwidth control for the scaling protocol.

The CPU control in BENCH_SCALING.md (pure integer arithmetic) shows the
sandbox's 16 physical cores scale near-perfectly to 16 procs.  But the KG
kernel is numpy/string STREAMING work — bound by memory bandwidth, not
ALU throughput.  This control measures how aggregate bandwidth-bound
throughput scales with pinned process count: each process runs a STREAM-
triad-like loop (y = a*x + y over a 128 MiB float64 array) on its own
CPUs via sched_setaffinity, zero IPC.

Usage: python dev/bandwidth_control.py [procs ...]   (default: 2 4 8 16)
Prints one JSON line: aggregate GiB/s per level + efficiency vs 4x fewer
procs where available.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N = 16 * 1024 * 1024  # 128 MiB of float64 per process
REPS = 20


def worker(cpu: int, q) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    x = np.random.default_rng(cpu).random(N)
    y = np.zeros(N)
    # warm
    y += x * 1.0001
    t0 = time.time()
    for _ in range(REPS):
        y += x * 1.0001
    dt = time.time() - t0
    # triad moves 3 arrays per rep (read x, read y, write y)
    gib = REPS * 3 * N * 8 / (1024**3)
    q.put(gib / dt)


def run(procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(i, q)) for i in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(rates), 2)


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16]
    agg = {}
    for lv in levels:
        best = 0.0
        for _ in range(3):
            best = max(best, run(lv))
        agg[lv] = best
    eff = {
        f"{s}->{l}": round((agg[l] / agg[s]) / (l / s), 3)
        for s in levels
        for l in levels
        if l == 4 * s and s in agg and l in agg
    }
    print(json.dumps({"aggregate_gib_s": agg, "efficiency_n_to_4n": eff}))


if __name__ == "__main__":
    main()
