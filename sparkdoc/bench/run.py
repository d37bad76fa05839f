#!/usr/bin/env python
"""Two-parallelism throughput harness (north-rule scaling evidence).

Runs the identical extract(+chunk) job on the same synthetic input at two
parallelism levels (default local[8] vs local[32]) in SEPARATE JVMs and
reports docs/sec at both plus scaling efficiency
``eff = (T_N * cores_N) / (T_4N * cores_4N) ... `` expressed as
``eff = throughput_4N / (scale * throughput_N)``.

    python -m sparkdoc.bench.run --docs 8000 --low 8 --high 32
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparkdoc.session import get_spark
from sparkdoc.spans import extract_documents
from sparkdoc.chunker import chunk_documents
from sparkdoc.synth import raw_nodes_df

cores = {cores}
n_docs = {docs}
spark = get_spark("scaling-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=max(cores, 8))
raw = raw_nodes_df(spark, n_docs, 42, partitions=max(cores * 4, 16)).persist()
raw.count()
spark.range(1000).select(F.sum("id")).collect()  # warm python workers
t0 = time.monotonic()
docs = extract_documents(raw)
n_chunks = chunk_documents(docs).count()
wall = time.monotonic() - t0
print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 3),
      "docs_per_sec": round(n_docs / wall, 2), "n_chunks": n_chunks}}))
spark.stop()
"""


def run_level(repo: str, cores: int, docs: int) -> dict:
    code = _WORKER.format(repo=repo, cores=cores, docs=docs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker local[{cores}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=8000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    lo = run_level(repo, args.low, args.docs)
    hi = run_level(repo, args.high, args.docs)
    scale = args.high / args.low
    eff = hi["docs_per_sec"] / (scale * lo["docs_per_sec"])
    result = {
        "n_docs": args.docs,
        "low": lo,
        "high": hi,
        "scale_factor": scale,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
