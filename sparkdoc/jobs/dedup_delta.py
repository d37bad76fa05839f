#!/usr/bin/env python
"""spark-submit entrypoint: incremental (delta) dedup — ingest a new batch
of documents against a persisted dedup index without re-scanning the corpus.

    # one-time: build the indexes from the existing corpus
    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/dedup_delta.py \
        --build-index --corpus /data/corpus.parquet --index /data/dedup_index

    # per ingest: dedup the delta, write survivors + updated indexes
    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/dedup_delta.py \
        --delta /data/new_batch.parquet --corpus /data/corpus.parquet \
        --index /data/dedup_index --out /data/ingest_0042 [--near-dup] \
        [--jaccard 0.85]

Outputs under --out:
  kept/        parquet: delta docs that survived (doc_id, text)
  dups/        parquet: doc_id, dup_of, kind ('exact'|'near'), jaccard
  index update: the updated exact/band indexes are written to --index-out
  (default: <index>_next) — atomic-swap or versioned-table mechanics are
  deployment concerns; the job never overwrites the input index in place.

Prints ONE JSON summary line. Deterministic: same inputs -> same split.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="curated corpus parquet (doc_id, text)")
    ap.add_argument("--index", required=True, help="index directory (exact/, bands/)")
    ap.add_argument("--build-index", action="store_true", help="build indexes from --corpus and exit")
    ap.add_argument("--delta", default=None, help="new batch parquet (doc_id, text)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--index-out", default=None, help="where to write updated indexes (default <index>_next)")
    ap.add_argument("--near-dup", action="store_true")
    ap.add_argument("--jaccard", type=float, default=0.85)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkdoc.incremental import (
        build_band_index,
        build_exact_index,
        delta_exact_dups_full,
        delta_near_dups,
        update_band_index,
        update_exact_index,
    )
    from sparkdoc.io import write_text_file
    from sparkdoc.session import get_spark

    spark = get_spark(
        "sparkdoc-dedup-delta",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    corpus = spark.read.parquet(args.corpus).select("doc_id", "text")
    exact_path = os.path.join(args.index, "exact")
    bands_path = os.path.join(args.index, "bands")

    if args.build_index:
        build_exact_index(corpus).write.mode("overwrite").parquet(exact_path)
        build_band_index(corpus, k=args.k, bands=args.bands).write.mode("overwrite").parquet(bands_path)
        summary = {
            "job": "dedup_delta",
            "mode": "build_index",
            "index": args.index,
            "exact_rows": spark.read.parquet(exact_path).count(),
            "band_rows": spark.read.parquet(bands_path).count(),
        }
        print(json.dumps(summary, sort_keys=True))
        spark.stop()
        return

    if not args.delta or not args.out:
        ap.error("--delta and --out are required unless --build-index")
    delta = spark.read.parquet(args.delta).select("doc_id", "text")
    exact_idx = spark.read.parquet(exact_path)
    band_idx = spark.read.parquet(bands_path)

    # _full: also collapses duplicates INSIDE the delta batch (two identical
    # new docs -> one keeper), not just delta-vs-corpus hits
    exact = delta_exact_dups_full(delta, exact_idx).withColumn("kind", F.lit("exact")).withColumn("jaccard", F.lit(1.0))
    dups = exact
    if args.near_dup:
        survivors0 = delta.join(exact.select("doc_id"), "doc_id", "left_anti")
        near = (
            delta_near_dups(
                survivors0, corpus, band_idx, threshold=args.jaccard,
                k=args.k, bands=args.bands,
            )
            .withColumn("kind", F.lit("near"))
        )
        dups = exact.unionByName(near.select("doc_id", "dup_of", "kind", "jaccard"))

    dups.write.mode("overwrite").parquet(os.path.join(args.out, "dups"))
    dups_w = spark.read.parquet(os.path.join(args.out, "dups"))
    kept = delta.join(dups_w.select("doc_id"), "doc_id", "left_anti")
    kept.write.mode("overwrite").parquet(os.path.join(args.out, "kept"))
    kept_w = spark.read.parquet(os.path.join(args.out, "kept"))

    index_out = args.index_out or (args.index.rstrip("/") + "_next")
    update_exact_index(exact_idx, kept_w).write.mode("overwrite").parquet(os.path.join(index_out, "exact"))
    update_band_index(band_idx, kept_w, k=args.k, bands=args.bands).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_out, "bands"))

    by_kind = {
        r["kind"]: r["n"]
        for r in dups_w.groupBy("kind").agg(F.count("*").alias("n")).collect()
    }
    summary = {
        "job": "dedup_delta",
        "mode": "ingest",
        "delta": args.delta,
        "n_delta": delta.count(),
        "n_kept": kept_w.count(),
        "dups_by_kind": dict(sorted(by_kind.items())),
        "index_out": index_out,
        "knobs": {"near_dup": bool(args.near_dup), "jaccard": args.jaccard,
                  "k": args.k, "bands": args.bands},
    }
    write_text_file(spark, os.path.join(args.out, "stats.json"), json.dumps(summary, indent=2, sort_keys=True))
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
