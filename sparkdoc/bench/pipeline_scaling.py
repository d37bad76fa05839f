#!/usr/bin/env python
"""Two-parallelism throughput harness for the FULL web pipeline CLI — the
whole production path in one command: mixed-format crawl blobs in →
sniff/route/parse → resumable bucket-committed documents → markdown
serialization → curation gates → token counts → packed training shards out.

    python -m sparkdoc.bench.pipeline_scaling --docs 6000 --low 2 --high 8

Drives `sparkdoc/jobs/web_pipeline.py` as a subprocess per level (fresh JVM,
fresh out dir per rep — stage guards must never let level B inherit level
A's committed work) and reads the job's own `wall_s` (measured after session
creation: JVM boot excluded, all parquet io + both stages included). The
mixed corpus is synthesized ONCE and shared by both levels. Wall =
best-of-reps (the host is noisy-neighbor throttled; see BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

_MAKE_CORPUS = """
import sys
sys.path.insert(0, {repo!r})
from sparkdoc.session import get_spark
from sparkdoc.synth import mixed_corpus_df

spark = get_spark("pipeline-corpus", master="local[8]", shuffle_partitions=32)
mixed_corpus_df(spark, {docs}, 42, partitions=64).write.mode("overwrite").parquet({corpus!r})
spark.stop()
"""


def run_level(repo: str, corpus: str, cores: int, reps: int) -> dict:
    walls, best = [], None
    for _ in range(reps):
        out_dir = tempfile.mkdtemp(prefix=f"webpipe_{cores}_")
        try:
            r = subprocess.run(
                [
                    sys.executable, os.path.join(repo, "sparkdoc/jobs/web_pipeline.py"),
                    "--input", f"mixed:{corpus}", "--out", out_dir,
                    "--buckets", "16", "--group-size", "16",
                    "--master", f"local[{cores}]",
                    "--shuffle-partitions", str(cores * 4),
                ],
                capture_output=True, text=True, timeout=3600,
            )
            if r.returncode != 0:
                raise RuntimeError(f"web_pipeline CLI failed:\n{r.stderr[-2000:]}")
            summary = json.loads(r.stdout.strip().splitlines()[-1])
            walls.append(summary["wall_s"])
            # stage walls must come from the SAME rep as the reported best
            # wall, or per-stage numbers can disagree with (even exceed) it
            if best is None or summary["wall_s"] < best["wall_s"]:
                best = summary
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "cores": cores,
        "wall_sec": min(walls),
        "walls": walls,
        "extract_wall_best": best["extract_wall_s"],
        "mix_wall_best": best["mix_wall_s"],
        "n_docs": best["extract"]["docs"],
        "n_kept": best["mix"]["n_kept"],
        "n_shards": best["mix"]["n_shards"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=6000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--record", action="store_true",
                    help="write the result into BENCH/scaling.json")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    corpus = tempfile.mkdtemp(prefix="webpipe_corpus_")
    mk = subprocess.run(
        [sys.executable, "-c", _MAKE_CORPUS.format(repo=repo, docs=args.docs, corpus=corpus)],
        capture_output=True, text=True, timeout=1800,
    )
    if mk.returncode != 0:
        raise RuntimeError(f"corpus synth failed:\n{mk.stderr[-2000:]}")

    try:
        lo = run_level(repo, corpus, args.low, args.reps)
        hi = run_level(repo, corpus, args.high, args.reps)
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
    scale = args.high / args.low
    tput_lo = lo["n_docs"] / lo["wall_sec"]
    tput_hi = hi["n_docs"] / hi["wall_sec"]
    eff = tput_hi / (scale * tput_lo)
    print(
        json.dumps(
            {
                "pipeline": "web_pipeline CLI e2e (mixed blobs -> extract -> "
                            "curate -> packed shards, parquet io + manifests)",
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
    if args.record:
        from sparkdoc.bench.record import record_scaling

        record_scaling(
            "web_pipeline_e2e",
            {
                "eff": round(eff, 3),
                "low_cores": args.low,
                "high_cores": args.high,
                "n_docs": args.docs,
                "docs_per_sec_high": round(tput_hi, 1),
                "harness": "python -m sparkdoc.bench.pipeline_scaling --docs %d --low %d --high %d --reps %d"
                % (args.docs, args.low, args.high, args.reps),
            },
        )


if __name__ == "__main__":
    main()
