#!/usr/bin/env python
"""Two-parallelism throughput harness for the CURATION pipeline (the same
N→4N scaling evidence sparkdoc.bench.run provides for extract+chunk, over
the full filter chain: PII redaction → quality/repetition gates → exact
dedup → MinHash near-dup).

    python -m sparkdoc.bench.curate_scaling --docs 40000 --low 2 --high 8

Separate JVMs per level; the corpus is generated JVM-side
(synth.synth_text_documents) and persisted+counted before timing, so the
timed region is the pipeline only. Wall = best-of-reps (noisy shared host);
throughput is input docs/sec through the whole split.
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
from sparkdoc.session import get_spark
from sparkdoc.synth import synth_text_documents
from sparkdoc.filters import curate_split

cores = {cores}
n_docs = {docs}
spark = get_spark("curate-scaling-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores * 4,
                  extra_conf={{"spark.sql.adaptive.coalescePartitions.enabled": "false"}})
docs = synth_text_documents(spark, n_docs, 42, partitions=cores * 4).persist()
n_input = docs.count()
# warm every python worker through the Arrow n-gram UDF path
warm = synth_text_documents(spark, 8 * cores, 7, partitions=cores)
kw, rw = curate_split(warm, near_dup=True)
kw.count(); rw.count()
spark.catalog.clearCache(); docs.persist(); docs.count()
walls = []
n_kept = n_rej = 0
for _ in range({reps}):
    kept, rejected = curate_split(docs, near_dup=True)
    t0 = time.monotonic()
    n_kept = kept.count()
    n_rej = rejected.count()
    walls.append(time.monotonic() - t0)
    spark.catalog.clearCache(); docs.persist(); docs.count()
wall = min(walls)
print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 3),
      "walls": [round(w, 2) for w in walls], "n_input": n_input,
      "n_kept": n_kept, "n_rejected": n_rej,
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
    ap.add_argument("--docs", type=int, default=40000)
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
                "pipeline": "curate (pii+quality+repetition+exact_dup+near_dup)",
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
