#!/usr/bin/env python
"""Two-parallelism throughput harness for EXACT SUBSTRING DEDUP (the
heaviest new curation stage: ~n_words-k+1 gram rows per doc through a
min-struct agg + equi-join + per-doc interval merge).

    python -m sparkdoc.bench.substr_scaling --docs 40000 --low 2 --high 8

Same methodology as curate_scaling: separate JVM per level, corpus
generated and persisted before timing, wall = best-of-reps. A slice of the
corpus is duplicated (every 8th doc repeats an earlier doc's text with a
fresh prefix) so the dup-detection join carries real traffic, not an empty
winner set.
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
from sparkdoc.dedup_text import substring_dedup

cores = {cores}
n_docs = {docs}
spark = get_spark("substr-scaling-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores * 4,
                  extra_conf={{"spark.sql.adaptive.coalescePartitions.enabled": "false"}})
base = synth_text_documents(spark, n_docs, 42, partitions=cores * 4)
# every 8th doc re-uses the text of doc_id-1 behind a fresh 3-word prefix ->
# a guaranteed cross-doc duplicated passage per pair
lagged = base.select((F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("_prev"))
docs = (
    base.join(lagged, "doc_id", "left")
    .select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 8 == 0) & F.col("_prev").isNotNull(),
            F.concat(F.lit("copy marker token "), F.col("_prev")),
        ).otherwise(F.col("text")).alias("text"),
    )
    .persist()
)
n_input = docs.count()
warm = substring_dedup(docs.limit(32 * cores))
warm.count()
walls = []
n_trimmed = 0
for _ in range({reps}):
    out = substring_dedup(docs)
    t0 = time.monotonic()
    n_trimmed = out.filter(F.col("n_dup_words") > 0).count()
    walls.append(time.monotonic() - t0)
wall = min(walls)
print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 3),
      "walls": [round(w, 2) for w in walls], "n_input": n_input,
      "n_trimmed": n_trimmed,
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
                "pipeline": "substring_dedup (k=12 gram winners + trim)",
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
