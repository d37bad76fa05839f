#!/usr/bin/env python
"""Two-parallelism throughput harness for DSIR data selection
(sparkdoc/selection.py): fit the hashed-ngram bucket model on a target
slice, weight the whole pool, Gumbel-top-k select — the same N→4N scaling
evidence sparkdoc.bench.run provides for extract+chunk.

    python -m sparkdoc.bench.dsir_scaling --docs 100000 --low 2 --high 8

Separate JVMs per level; corpus generated JVM-side (synth_text_documents)
and persisted+counted before timing, so the timed region is fit + weight +
select only. The target is a deterministic 1-in-17 slice of the pool (the
gate entries' convention). Wall = best-of-reps (noisy shared host);
throughput is pool docs/sec through the full selection chain.
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
from sparkdoc.synth import synth_text_documents
from sparkdoc.selection import dsir_select, fit_dsir_model

cores = {cores}
n_docs = {docs}
spark = get_spark("dsir-scaling-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores * 4,
                  extra_conf={{"spark.sql.adaptive.coalescePartitions.enabled": "false"}})
docs = synth_text_documents(spark, n_docs, 42, partitions=cores * 4).persist()
n_input = docs.count()
target = docs.filter(F.col("doc_id") % 17 == 0)
k = max(1, n_input // 10)
# warm the JVM + codegen paths on a tiny corpus
warm = synth_text_documents(spark, 8 * cores, 7, partitions=cores)
m = fit_dsir_model(warm.filter(F.col("doc_id") % 3 == 0), warm)
dsir_select(warm, m, k=8).count()
walls = []
n_sel = 0
for _ in range({reps}):
    model = fit_dsir_model(target, docs)
    sel = dsir_select(docs, model, k=k, seed=7)
    t0 = time.monotonic()
    n_sel = sel.count()
    walls.append(time.monotonic() - t0)
wall = min(walls)
print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 3),
      "walls": [round(w, 2) for w in walls], "n_input": n_input,
      "k": k, "n_selected": n_sel,
      "docs_per_sec": round(n_input / wall, 2)}}))
spark.stop()
"""


def run_level(repo: str, cores: int, docs: int, reps: int = 3) -> dict:
    code = _WORKER.format(repo=repo, cores=cores, docs=docs, reps=reps)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker local[{cores}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    lo = run_level(repo, args.low, args.docs, args.reps)
    hi = run_level(repo, args.high, args.docs, args.reps)
    scale = args.high / args.low
    eff = hi["docs_per_sec"] / (scale * lo["docs_per_sec"])
    print(
        json.dumps(
            {
                "pipeline": "dsir (fit + weight + gumbel-top-k select)",
                "n_docs": args.docs,
                "low": lo,
                "high": hi,
                "scale_factor": scale,
                "scaling_efficiency": round(eff, 3),
                "target": 0.8,
                "meets_target": eff >= 0.8,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
