#!/usr/bin/env python
"""spark-submit entrypoint: durable BM25 inverted index build + query — the
full-text twin of jobs/ann_index.py (sparkdoc/retrieval.py).

    # one-time: tokenize + shuffle the corpus ONCE, postings partitioned by
    # md5 term-bucket, corpus stats to the manifest
    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/search_index.py \
        --build --corpus /data/documents.parquet --index /data/bm25_index \
        --buckets 256

    # per query batch: enumerate the probed terms' buckets driver-side,
    # partition-pruned postings read, broadcast scoring, top-k
    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/search_index.py \
        --query /data/queries.parquet --index /data/bm25_index \
        --k 10 --out /data/search_results

    # incremental ingest: append a delta corpus (disjoint doc_ids) into the
    # same bucket partitions; manifest stats accumulate
    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/search_index.py \
        --update --corpus /data/new_docs.parquet --index /data/bm25_index

Index layout under --index:
  postings/bucket=K/  parquet (term, doc_id, tf, dl) — every posting of one
                      term lives in exactly one bucket, so per-term df at
                      query time is exact from the pruned read alone
  manifest.json       n_docs + total corpus length (N / avgdl are manifest
                      literals at query time — no corpus scan, ever)

Results are bit-identical to the in-memory bm25_topk over the same corpus
(same integer micro-unit quantization, same doc_id tie-break). Prints ONE
JSON summary line. --max-df-frac applies the common-term pruning knob
(BENCH/BASELINE.md: 6.8x on stopword-heavy probes, rank-neutral for
discriminative queries)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None, help="documents parquet (doc_id, text)")
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--update", action="store_true",
                    help="append --corpus as a delta to an existing --index "
                         "(doc_ids must be disjoint from the indexed corpus)")
    ap.add_argument("--query", default=None, help="queries parquet (query_id, text)")
    ap.add_argument("--out", default=None, help="results parquet dir (query mode)")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--max-df-frac", type=float, default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    if sum([args.build, args.update, bool(args.query)]) != 1:
        ap.error("exactly one of --build / --update / --query is required")
    if (args.build or args.update) and not args.corpus:
        ap.error("--build/--update require --corpus")
    if args.query and not args.out:
        ap.error("--query requires --out")

    from sparkdoc.retrieval import (
        bm25_query_index,
        bm25_update_index,
        bm25_write_index,
    )
    from sparkdoc.session import get_spark

    spark = get_spark(
        "sparkdoc-search-index",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()
    if args.update:
        docs = spark.read.parquet(args.corpus).select("doc_id", "text")
        manifest = bm25_update_index(docs, args.index)
        print(
            json.dumps(
                {
                    "job": "search_index_update",
                    "index": args.index,
                    "n_docs": manifest["n_docs"],
                    "n_buckets": manifest["n_buckets"],
                    "wall_sec": round(time.monotonic() - t0, 3),
                },
                sort_keys=True,
            )
        )
        spark.stop()
        return
    if args.build:
        docs = spark.read.parquet(args.corpus).select("doc_id", "text")
        manifest = bm25_write_index(docs, args.index, n_buckets=args.buckets)
        # footer-metadata-only job (parquet count reads no data pages), not
        # a second pass over the index
        n_posts = spark.read.parquet(os.path.join(args.index, "postings")).count()
        print(
            json.dumps(
                {
                    "job": "search_index_build",
                    "index": args.index,
                    "n_docs": manifest["n_docs"],
                    "n_postings": n_posts,
                    "n_buckets": manifest["n_buckets"],
                    "wall_sec": round(time.monotonic() - t0, 3),
                },
                sort_keys=True,
            )
        )
    else:
        queries = spark.read.parquet(args.query)
        res = bm25_query_index(
            spark,
            args.index,
            queries,
            k=args.k,
            k1=args.k1,
            b=args.b,
            max_df_frac=args.max_df_frac,
        )
        res.write.mode("overwrite").parquet(args.out)
        for c in getattr(res, "_sparkdoc_caches", []):
            c.unpersist()
        got = spark.read.parquet(args.out)
        n_res = got.count()
        n_q = got.select("query_id").distinct().count()
        print(
            json.dumps(
                {
                    "job": "search_index_query",
                    "index": args.index,
                    "n_queries_with_hits": n_q,
                    "n_results": n_res,
                    "k": args.k,
                    "out": args.out,
                    "wall_sec": round(time.monotonic() - t0, 3),
                },
                sort_keys=True,
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
