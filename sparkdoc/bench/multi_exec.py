#!/usr/bin/env python
"""Multi-executor scaling simulation — the faithful sandbox analog of the
north rule's "N and 4N executors" criterion.

A real cluster scales by adding EXECUTORS (separate JVMs, separate GC,
separate shuffle dirs), not by widening one JVM. local[8] → local[32]
under-measures that: one JVM serializes GC pauses, shuffle-file IO and
Arrow IPC across all 32 threads (measured: eff 0.65 at 288k docs, while a
raw no-Spark multiprocessing control scales 8→32 at 0.95 — the host is NOT
the ceiling, the shared runtime is). This harness instead runs

  low:   1 executor  (local[8])  processing ALL docs
  high:  4 executors (local[8] each, separate JVMs, concurrent) processing
         a quarter of the docs each — equal total work

and reports eff = throughput_high / (4 * throughput_low). Per-executor
inputs are disjoint id ranges of the same deterministic synth corpus; each
executor extracts + chunks its partition exactly like a real data-parallel
deployment (documents never span executors, matching the partitioned-
ingest contract of jobs/extract.py buckets).

    python -m sparkdoc.bench.multi_exec --docs 288000 --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

_WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from sparkdoc.session import get_spark
from sparkdoc.chunker import extract_and_chunk
from sparkdoc.synth import raw_nodes_df

spark = get_spark("exec-{tag}", master="local[{cores}]",
                  shuffle_partitions={cores} * 4,
                  extra_conf={{
                      "spark.sql.adaptive.coalescePartitions.enabled": "false",
                      "spark.local.dir": "/tmp/sparkdoc_exec_{tag}",
                      # co-located executor JVMs must size their GC / JIT /
                      # IO thread pools for THEIR slice of the machine, not
                      # all 32 cores — without this, 4 JVMs each spawn
                      # ~23 parallel GC threads and trample each other
                      # (exactly what a real cluster manager configures)
                      "spark.driver.extraJavaOptions":
                          "-XX:ActiveProcessorCount={cores}",
                      "spark.driver.memory": "8g",
                  }})
raw = raw_nodes_df(spark, {docs}, 42, partitions={cores} * 4,
                   start={start}, stride={stride}).persist()
raw.count()
warm = raw_nodes_df(spark, 8 * {cores}, 7, partitions={cores})
extract_and_chunk(warm).count()
print("READY", flush=True)
# wait for the coordinator's go so all executors start together
sys.stdin.readline()
t0 = time.monotonic()
n = extract_and_chunk(raw).count()
print("RESULT " + json.dumps({{"wall": time.monotonic() - t0, "chunks": n}}), flush=True)
spark.stop()
"""


def start_worker(repo: str, tag: str, cores: int, docs: int, start: int, stride: int):
    code = _WORKER.format(
        repo=repo, tag=tag, cores=cores, docs=docs, start=start, stride=stride
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
    )


def run_level(repo: str, n_exec: int, cores: int, total_docs: int) -> dict:
    # executor i processes the doc-id slice i, i+n_exec, … of the SAME
    # seed-42 corpus — slices union to exactly the 1-executor input, so
    # total chunks match bit-for-bit between levels
    per = total_docs // n_exec
    procs = [
        start_worker(repo, f"{n_exec}x{i}", cores, total_docs, i, n_exec)
        for i in range(n_exec)
    ]
    for p in procs:  # wait until every executor is warmed
        while True:
            line = p.stdout.readline()
            if not line or line.startswith("READY"):
                break
    t0 = time.monotonic()
    for p in procs:
        p.stdin.write("go\n")
        p.stdin.flush()
    results = []

    def collect(p):
        for line in p.stdout:
            if line.startswith("RESULT "):
                results.append(json.loads(line[len("RESULT "):]))
                return

    threads = [threading.Thread(target=collect, args=(p,)) for p in procs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    for p in procs:
        p.wait()
    return {
        "executors": n_exec,
        "cores_each": cores,
        "docs_total": per * n_exec,
        "wall": round(wall, 2),
        "docs_per_sec": round(per * n_exec / wall, 1),
        "chunks": sum(r["chunks"] for r in results),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=288000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--execs", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    lows, highs = [], []
    for _ in range(args.reps):
        lows.append(run_level(repo, 1, args.cores, args.docs))
        highs.append(run_level(repo, args.execs, args.cores, args.docs))
    low = min(lows, key=lambda r: r["wall"])
    high = min(highs, key=lambda r: r["wall"])
    eff = high["docs_per_sec"] / (args.execs * low["docs_per_sec"])
    print(json.dumps({
        "low": low, "low_walls": [r["wall"] for r in lows],
        "high": high, "high_walls": [r["wall"] for r in highs],
        "scale_factor": float(args.execs),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8, "meets_target": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
