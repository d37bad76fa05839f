#!/usr/bin/env python
"""spark-submit entrypoint: the full web-scale path in ONE resumable command —
crawl containers → extracted interleaved documents → curated, rebalanced,
token-packed training shards.

    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/web_pipeline.py \
        --input warc-synth:8 --out /data/run1 \
        [--buckets 16 --group-size 4 --seed 42 --chunk] \
        [--target-per-source N --budget 4194304 --groups 1024 \
         --near-dup --min-words 10]

Stage 1 — extract: any jobs/extract.py --input spec (WARC containers,
mixed-format blob tables, raw HTML/PDF/Office tables, raw_nodes parquet …)
through checkpoint.run_resumable under ``<out>/extract``: per-bucket-group
manifest commits with lineage + metrics; kill the job and rerun the same
command to resume — completed buckets are never re-parsed.

Stage 2 — mix: the extracted documents table is serialized to full-document
markdown (serialize.documents_markdown — zero-shuffle, the spans arrays are
already co-located per row) and fed to build_mix.mix_documents under
``<out>/mix``: PII redaction → quality/repetition gates → exact (+ optional
near-) dedup → optional per-source rebalance → token counts → fixed-budget
shard packing. The detected-format column ``fmt`` (mixed/WARC ingests)
becomes the mix's ``source`` dimension, so the manifest reports per-format
doc/token totals. The stage is guarded by its own manifest: a rerun that
finds ``<out>/mix/manifest.json`` skips the stage (delete the directory to
force a rebuild).

Prints ONE JSON line with both stage summaries and end-to-end docs/sec.
Every stage is deterministic, so the whole run is reproducible bit-for-bit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="any jobs/extract.py --input spec")
    ap.add_argument("--out", required=True)
    # stage-1 knobs (extract)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--chunk", action="store_true",
        help="also write the chunks table during extraction (the mix stage "
        "does not need it; off by default to keep the shard path lean)",
    )
    # stage-2 knobs (mix)
    ap.add_argument("--target-per-source", type=int, default=None)
    ap.add_argument("--budget", type=int, default=4_194_304, help="tokens per shard")
    ap.add_argument("--groups", type=int, default=1024, help="packing groups")
    ap.add_argument("--near-dup", action="store_true")
    ap.add_argument("--min-words", type=int, default=10)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkdoc.checkpoint import run_resumable
    from sparkdoc.io import read_text_file
    from sparkdoc.jobs.build_mix import mix_documents
    from sparkdoc.jobs.extract import resolve_input
    from sparkdoc.serialize import documents_markdown
    from sparkdoc.session import get_spark

    spark = get_spark(
        "sparkdoc-web-pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()

    extract_dir = os.path.join(args.out, "extract")
    raw, documents_fn, raw_for_group = resolve_input(
        spark, args.input, args.seed, n_buckets=args.buckets
    )
    s1 = run_resumable(
        spark,
        raw,
        extract_dir,
        n_buckets=args.buckets,
        group_size=args.group_size,
        chunk=args.chunk,
        documents_fn=documents_fn,
        raw_for_group=raw_for_group,
    )
    t1 = time.monotonic()

    mix_dir = os.path.join(args.out, "mix")
    prior = read_text_file(spark, os.path.join(mix_dir, "manifest.json"))
    if prior is not None:
        s2 = json.loads(prior)
        mix_skipped = True
    else:
        docs = spark.read.parquet(os.path.join(extract_dir, "documents"))
        # the bucket-committed documents dir holds many small part files
        # (one+ per bucket per group); scanned as-is the markdown Arrow
        # stage runs one MICRO-task per file and pays the per-task Python
        # turnaround (~73 ms/task measured, OPTIMIZATION_r06.md) — a narrow
        # coalesce to the core count keeps the stage's task count at one
        # wave with no shuffle. mix_documents' granularity guard then
        # repartitions the (already serialized) markdown rows for the
        # Python-heavy gate chain
        n_parts = docs.rdd.getNumPartitions()
        cores = spark.sparkContext.defaultParallelism
        if n_parts > cores * 2:
            docs = docs.coalesce(cores)
        text = documents_markdown(docs, out_col="_md").select(
            "doc_id",
            F.col("_md").alias("text"),
            *(
                [F.col("fmt").alias("source")]
                if "fmt" in docs.columns
                else []
            ),
        )
        s2 = mix_documents(
            spark,
            text,
            mix_dir,
            target_per_source=args.target_per_source,
            budget=args.budget,
            groups=args.groups,
            near_dup=args.near_dup,
            min_words=args.min_words,
            input_label=f"{args.input} via {extract_dir}",
        )
        mix_skipped = False
    t2 = time.monotonic()

    n_docs = s1.get("docs") or 0  # docs extracted THIS run (0 on a full resume)
    wall = t2 - t0
    summary = {
        "job": "web_pipeline",
        "input": args.input,
        "out": args.out,
        "extract": s1,
        "mix": s2,
        "mix_skipped": mix_skipped,
        "extract_wall_s": round(t1 - t0, 3),
        "mix_wall_s": round(t2 - t1, 3),
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1) if wall > 0 and n_docs else None,
    }
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
