#!/usr/bin/env python
"""Read-amplification bench for the container-bucketed warcdir path.

    python -m sparkdoc.bench.warcdir_once --files 192 --buckets 16 --group-size 4

The r3 shape bucketed warcdir ingest on hash(doc_id): the bucket filter sat
DOWNSTREAM of the Python data source, so every resumable bucket group
re-listed, re-read and re-record-split the WHOLE crawl — with 16 buckets /
group-size 4 the dominant IO+gzip cost ran 4x. The r4 shape buckets by
CONTAINER (crc32 of the container name, applied as a planning-time listing
filter inside the source), so each container is opened exactly once per run
(structure pinned by test_file_bucket_planning_filter_partitions_exactly_once;
output equality by test_warcdir_file_bucketed_resumable_run).

This harness measures the WALL consequence: the same synthetic crawl dir
ingested by run_resumable under both shapes (fresh out dir each), same
session, warm caches. Wall = best-of-reps. Expected: the doc-hash shape's
wall grows with the group COUNT (whole-crawl read per group) while the
container-bucketed shape stays ~flat — the ratio approaches the group count
as container IO dominates. Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=192)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkdoc.checkpoint import run_resumable
    from sparkdoc.ingest import mixed_to_documents
    from sparkdoc.session import get_spark
    from sparkdoc.synth import synth_warc_file
    from sparkdoc.warcsource import register_warc_source

    spark = get_spark(
        "warcdir-once", master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 4,
    )
    register_warc_source(spark)

    crawl = tempfile.mkdtemp(prefix="warcdir_once_")
    total_bytes = 0
    for i in range(args.files):
        f = synth_warc_file(i, 42)
        total_bytes += len(f["content"])
        with open(os.path.join(crawl, f["warc_name"]), "wb") as fh:
            fh.write(f["content"])

    def raw_for_group(group):
        return (
            spark.read.format("warc")
            .option("buckets", str(args.buckets))
            .option("bucketGroup", ",".join(str(b) for b in group))
            .load(crawl)
            .select(
                "doc_id", "blob",
                F.pmod(
                    F.crc32(F.encode(F.col("warc_name"), "utf-8")),
                    F.lit(args.buckets),
                ).cast("int").alias("bucket"),
            )
        )

    def run(shape: str) -> tuple[float, int]:
        best, n_docs = None, 0
        for _ in range(args.reps):
            out = tempfile.mkdtemp(prefix=f"wo_{shape}_")
            try:
                t0 = time.monotonic()
                if shape == "container":
                    s = run_resumable(
                        spark, None, out,
                        n_buckets=args.buckets, group_size=args.group_size,
                        chunk=False,
                        documents_fn=lambda p: mixed_to_documents(
                            p, passthrough=["bucket"]
                        ),
                        raw_for_group=raw_for_group,
                    )
                else:  # doc-hash: the r3 shape — source scanned once per group
                    raw = (
                        spark.read.format("warc").load(crawl)
                        .select("doc_id", "blob")
                    )
                    s = run_resumable(
                        spark, raw, out,
                        n_buckets=args.buckets, group_size=args.group_size,
                        chunk=False, documents_fn=mixed_to_documents,
                    )
                w = time.monotonic() - t0
                n_docs = s["docs"]
                best = w if best is None or w < best else best
            finally:
                shutil.rmtree(out, ignore_errors=True)
        return best, n_docs

    wall_doc, n1 = run("dochash")
    wall_cont, n2 = run("container")
    shutil.rmtree(crawl, ignore_errors=True)
    n_groups = -(-args.buckets // args.group_size)
    print(json.dumps({
        "bench": "warcdir_once",
        "n_files": args.files,
        "crawl_mb": round(total_bytes / 1e6, 1),
        "buckets": args.buckets,
        "group_size": args.group_size,
        "n_groups": n_groups,
        "docs_dochash": n1,
        "docs_container": n2,
        "docs_match": n1 == n2,
        "wall_dochash_s": round(wall_doc, 3),
        "wall_container_s": round(wall_cont, 3),
        "speedup": round(wall_doc / wall_cont, 2) if wall_cont else None,
        "read_amplification_removed": f"{n_groups}x container split -> 1x",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
