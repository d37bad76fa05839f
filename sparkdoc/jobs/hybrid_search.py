#!/usr/bin/env python
"""spark-submit entrypoint: hybrid retrieval against the two persisted
indexes — BM25 (jobs/search_index.py layout) ⊕ trained IVF-PQ ANN
(jobs/ann_index.py layout), reciprocal-rank-fused (sparkdoc/retrieval.py
rrf_fuse).

    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/hybrid_search.py \
        --bm25-index /data/bm25_index --ann-index /data/ann_index \
        --queries /data/queries.parquet --out /data/hits \
        --k 10 --nprobe 4 --rescore-factor 32 --k-rrf 60

``--queries`` carries one row per query: (query_id, text, embedding) —
the text probes the inverted index, the embedding probes the ANN index.
Contract: both indexes were built over the SAME item id space (the
corpus doc_id doubles as its embedding's vec_id), so fused doc_ids are
meaningful. Each retriever returns its top-k; the fusion is the integer
nano-unit RRF sum (engine-exact ranks, n_systems = how many retrievers
surfaced each hit). Neither retriever rescans its corpus: the lexical
side reads only the probed terms' bucket partitions, the dense side only
the probed cells' partitions. Prints ONE JSON summary line."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bm25-index", required=True, help="jobs/search_index.py index dir")
    ap.add_argument("--ann-index", required=True, help="jobs/ann_index.py index dir")
    ap.add_argument("--queries", required=True, help="parquet (query_id, text, embedding)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10, help="fused top-k (also each retriever's k)")
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--max-df-frac", type=float, default=None)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--rescore-factor", type=int, default=32)
    ap.add_argument("--exclude-self", action="store_true")
    ap.add_argument("--k-rrf", type=int, default=60)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkdoc.cluster import ivfpq_topk
    from sparkdoc.retrieval import bm25_query_index, rrf_fuse
    from sparkdoc.session import get_spark

    spark = get_spark(
        "sparkdoc-hybrid-search",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t0 = time.monotonic()
    queries = spark.read.parquet(args.queries)

    # --exclude-self must bind on BOTH retrievers (the dense side drops
    # neighbor_id == query_id inside ivfpq_topk; without the lexical twin
    # the query's own document — whose lead terms dominate its BM25 score —
    # would re-enter the fused list through lex). Fetch k+1 lexically, drop
    # the self hit, re-rank by the original order so ranks stay 1..k dense.
    lex_res = bm25_query_index(
        spark,
        args.bm25_index,
        queries.select("query_id", "text"),
        k=args.k + (1 if args.exclude_self else 0),
        k1=args.k1,
        b=args.b,
        max_df_frac=args.max_df_frac,
    )
    lex = lex_res.select("query_id", "doc_id", "rank")
    if args.exclude_self:
        from pyspark.sql import Window

        lex = (
            lex.filter(F.col("query_id") != F.col("doc_id"))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(F.col("rank").asc())
                ),
            )
            .filter(F.col("rank") <= args.k)
        )

    from sparkdoc.io import hadoop_read_text

    man = json.loads(
        hadoop_read_text(spark, os.path.join(args.ann_index, "manifest.json"))
    )
    cells = spark.read.parquet(os.path.join(args.ann_index, "cells"))
    codes = spark.read.parquet(os.path.join(args.ann_index, "codes"))
    dense = ivfpq_topk(
        cells,
        codes,
        queries.select(F.col("query_id").alias("vec_id"), "embedding"),
        man["centroids"],
        man["codebooks"],
        k=args.k,
        nprobe=args.nprobe,
        rescore_factor=args.rescore_factor,
        exclude_self=args.exclude_self,
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")

    fused = rrf_fuse([lex, dense], k_rrf=args.k_rrf, topk=args.k)
    fused.write.mode("overwrite").parquet(args.out)
    for c in getattr(lex_res, "_sparkdoc_caches", []):
        c.unpersist()
    got = spark.read.parquet(args.out)
    n_res = got.count()
    n_q = got.select("query_id").distinct().count()
    n_both = got.filter(F.col("n_systems") >= 2).count()
    print(
        json.dumps(
            {
                "job": "hybrid_search",
                "n_queries_with_hits": n_q,
                "n_results": n_res,
                "n_consensus_hits": n_both,
                "k": args.k,
                "k_rrf": args.k_rrf,
                "out": args.out,
                "wall_sec": round(time.monotonic() - t0, 3),
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
