#!/usr/bin/env python
"""Pure-CPU parallel-capacity probe (no Spark): run K busy worker
processes for a fixed window and report aggregate throughput, for
K ∈ {N, 4N}. The ratio bounds what ANY software can achieve on this
host between those parallelism levels (SMT, shared memory bus, and —
on shared tenancy — neighbor load all cap it below 1.0), which is the
context for reading BENCH/BASELINE.md's engine efficiency.

Usage: python scripts/cpu_ceiling_probe.py [--n 4] [--seconds 20]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import time


def _burn(stop_at: float, out):
    s, i = 0, 0
    while time.time() < stop_at:
        for _ in range(100_000):
            s += i * i
            i += 1
    out.put(i)


def rate(k: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    stop_at = time.time() + seconds
    procs = [mp.Process(target=_burn, args=(stop_at, q)) for _ in range(k)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / seconds


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=20.0)
    args = ap.parse_args()
    r_n = rate(args.n, args.seconds)
    r_4n = rate(4 * args.n, args.seconds)
    eff = (r_4n / r_n) / 4
    print(
        f"procs={args.n}: {r_n:.3e} ops/s | procs={4 * args.n}: {r_4n:.3e} ops/s"
        f" | hardware ceiling eff({args.n}->{4 * args.n}) = {eff:.3f}"
    )
    return 0


if __name__ == "__main__":
    main()
