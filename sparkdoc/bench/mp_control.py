#!/usr/bin/env python
"""Hardware-ceiling control for scaling measurements: raw multiprocessing
(zero Spark) at two parallelism levels over EQUAL TOTAL WORK, for two kernel
classes:

  * cpu — md5 over a cache-resident 4 KiB buffer, pure compute: measures the
    host's best-case core scaling (SMT / shared-tenancy ceiling).
  * mem — strided reads over a per-process 256 MiB numpy array: measures the
    memory-bandwidth ceiling, the binding resource for shuffle-heavy /
    hash-heavy kernels like MinHash dedup.

    python -m sparkdoc.bench.mp_control --low 2 --high 8 --reps 3

No job can scale better than these controls on this host; a pipeline whose
efficiency matches the relevant control is AT the hardware ceiling, not
leaving parallelism on the table. Results belong in BENCH/BASELINE.md next
to the measurement they qualify.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import time

import numpy as np

TOTAL_MD5 = 6_000_000  # total md5 calls across all workers
TOTAL_MEM_PASSES = 48  # total passes over a 256 MiB array


def _cpu_worker(n: int) -> int:
    buf = b"x" * 4096
    h = 0
    for _ in range(n):
        h ^= hashlib.md5(buf).digest()[0]
    return h


def _mem_worker(n_passes: int) -> float:
    # allocation + first-touch page faults happen OUTSIDE the timed region —
    # the kernel times steady-state DRAM streaming only
    a = np.arange(256 * 1024 * 1024 // 8, dtype=np.int64)  # 256 MiB
    float(a[::8].sum())  # touch every page once, untimed
    t0 = time.monotonic()
    s = 0.0
    for _ in range(n_passes):
        s += float(a[::8].sum())  # strided: defeats cache, streams DRAM
    return time.monotonic() - t0


def run_level(kernel: str, procs: int, reps: int) -> dict:
    worker = _cpu_worker if kernel == "cpu" else _mem_worker
    per = (TOTAL_MD5 if kernel == "cpu" else TOTAL_MEM_PASSES) // procs
    walls = []
    for _ in range(reps):
        with mp.Pool(procs) as pool:
            t0 = time.monotonic()
            res = pool.map(worker, [per] * procs)
            wall = time.monotonic() - t0
        # mem workers report their steady-state streaming time; the slowest
        # concurrent worker is the level's wall (allocation excluded)
        walls.append(max(res) if kernel == "mem" else wall)
    return {"procs": procs, "wall_best": round(min(walls), 3),
            "walls": [round(w, 2) for w in walls]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    out = {}
    for kernel in ("cpu", "mem"):
        lo = run_level(kernel, args.low, args.reps)
        hi = run_level(kernel, args.high, args.reps)
        eff = lo["wall_best"] / (hi["wall_best"] * (args.high / args.low))
        out[kernel] = {"low": lo, "high": hi,
                       "scaling_efficiency": round(eff, 3)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
