#!/usr/bin/env python
"""Two-parallelism throughput harness for the FULL curation CLI — the
production path end-to-end: parquet in → url-dedup → mojibake fix →
substring dedup → PII/quality/repetition/exact-dup gates → parquet out.

    python -m sparkdoc.bench.curate_cli_scaling --docs 30000 --low 2 --high 8

Unlike curate_scaling (which times curate_split in-process), this drives
`sparkdoc/jobs/curate.py` as a subprocess per level and reads the job's own
`wall_s` (measured AFTER session creation, so JVM boot is excluded but
parquet reads/writes and the reject-stats pass are included). The input
corpus is synthesized ONCE with url + source columns (every 4th doc is an
alternate spelling of another doc's URL, so url-dedup carries real traffic)
and shared by both levels. Wall = best-of-reps.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_MAKE_CORPUS = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparkdoc.session import get_spark
from sparkdoc.synth import synth_text_documents

spark = get_spark("curate-cli-corpus", master="local[8]", shuffle_partitions=32)
docs = synth_text_documents(spark, {docs}, 42, partitions=64)
did = F.col("doc_id")
# urls: doc_id % 4 == 1 re-spells the previous doc's URL (utm + case + slash)
base_url = F.concat(F.lit("http://site"), ((did - (did % 4 == 1).cast("long")) % 5000).cast("string"), F.lit(".com/p/"), ((did - (did % 4 == 1).cast("long")) % 97).cast("string"))
url = F.when(
    did % 4 == 1,
    F.concat(F.lit("HTTP://Site"), ((did - 1) % 5000).cast("string"), F.lit(".COM/p/"), ((did - 1) % 97).cast("string"), F.lit("/?utm_source=x")),
).otherwise(base_url)
out = docs.select("doc_id", "text", url.alias("url"), F.concat(F.lit("src"), (did % 20).cast("string")).alias("source"))
out.write.mode("overwrite").parquet({corpus!r})
print("rows", out.count())
spark.stop()
"""


def run_level(repo: str, corpus: str, cores: int, reps: int) -> dict:
    walls, summary = [], None
    for i in range(reps):
        out_dir = tempfile.mkdtemp(prefix=f"curate_cli_{cores}_")
        r = subprocess.run(
            [
                sys.executable, os.path.join(repo, "sparkdoc/jobs/curate.py"),
                "--input", corpus, "--out", out_dir,
                "--master", f"local[{cores}]",
                "--shuffle-partitions", str(cores * 4),
                "--url-dedup", "--fix-encoding", "--substr-dedup",
            ],
            capture_output=True, text=True, timeout=3600,
        )
        if r.returncode != 0:
            raise RuntimeError(f"curate CLI failed:\n{r.stderr[-2000:]}")
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        walls.append(summary["wall_s"])
    return {
        "cores": cores,
        "wall_sec": min(walls),
        "walls": walls,
        "n_input": summary["n_input"],
        "n_kept": summary["n_kept"],
        "rejected_by_reason": summary["rejected_by_reason"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=30000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    corpus = tempfile.mkdtemp(prefix="curate_cli_corpus_")
    mk = subprocess.run(
        [sys.executable, "-c", _MAKE_CORPUS.format(repo=repo, docs=args.docs, corpus=corpus)],
        capture_output=True, text=True, timeout=1800,
    )
    if mk.returncode != 0:
        raise RuntimeError(f"corpus synth failed:\n{mk.stderr[-2000:]}")

    lo = run_level(repo, corpus, args.low, args.reps)
    hi = run_level(repo, corpus, args.high, args.reps)
    scale = args.high / args.low
    tput_lo = lo["n_input"] / lo["wall_sec"]
    tput_hi = hi["n_input"] / hi["wall_sec"]
    eff = tput_hi / (scale * tput_lo)
    print(
        json.dumps(
            {
                "pipeline": "curate CLI e2e (url-dedup + fix-encoding + substr-dedup + gates, parquet io)",
                "n_docs": args.docs,
                "low": lo,
                "high": hi,
                "docs_per_sec": {"low": round(tput_lo, 1), "high": round(tput_hi, 1)},
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
