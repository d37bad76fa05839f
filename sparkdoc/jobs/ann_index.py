#!/usr/bin/env python
"""spark-submit entrypoint: trained ANN index build + query (the IVF-PQ
production path over an embeddings table).

    # one-time: train quantizers on a hash sample, encode + bucket the corpus
    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/ann_index.py \
        --build --corpus /data/embeddings.parquet --index /data/ann_index \
        --cells 256 --m 8 --ksub 256 --train-mod 64

    # per query batch: probe cells, ADC-score codes, exact-rescore the head
    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/ann_index.py \
        --query /data/queries.parquet --index /data/ann_index \
        --k 10 --nprobe 8 --out /data/knn_results

Index layout under --index:
  cells/       parquet (vec_id, cell, v) written PARTITIONED BY cell — a
               probe reads only its nprobe partitions (partition pruning is
               the single biggest lever at corpus scale)
  codes/       parquet (vec_id, codes array<int>) — m bytes/vector payload
  manifest.json  centroids + codebooks + params (the trained state is a few
               hundred KB of plan literals; queries never refit)

Query path: centroid probe (plan literals) → cell-pruned candidate read →
ADC over codes → top (rescore_factor · k) by approximate score → exact
cosine rescore of that head only → top-k. Prints ONE JSON summary line.
Deterministic end to end (integer-exact fits, fixed tie-breaks)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None, help="embeddings parquet (vec_id, embedding)")
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--query", default=None, help="queries parquet (vec_id, embedding)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cells", type=int, default=16)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--ksub", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--train-mod", type=int, default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=4)
    # default inherited from cluster.ivfpq_topk, where the measured
    # recall/rf curve is documented (bench/vq_ops.py: rf=4 → 0.28-0.34,
    # rf=32 → 0.74, rf=128 → 1.00 on the 50k hierarchical corpus)
    ap.add_argument("--rescore-factor", type=int, default=32)
    ap.add_argument("--exclude-self", action="store_true",
                    help="drop candidates whose vec_id equals the query_id (for corpus-member probes)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from sparkdoc.cluster import kmeans_assign, kmeans_fit, pq_encode, pq_fit
    from sparkdoc.session import get_spark

    spark = get_spark(
        "sparkdoc-ann-index",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )

    manifest_path = os.path.join(args.index, "manifest.json")

    if args.build:
        if not args.corpus:
            raise SystemExit("--build requires --corpus")
        corpus = spark.read.parquet(args.corpus)
        from pyspark.sql import functions as F

        # fail fast on a --dim / corpus mismatch: a wider corpus would be
        # silently TRUNCATED by the PQ subspace slices, a narrower one
        # null-poisons the zip_with dot products
        bad = corpus.filter(F.size("embedding") != args.dim).limit(1).collect()
        if bad:
            raise SystemExit(
                f"--dim {args.dim} does not match the corpus embedding width "
                f"(e.g. vec_id={bad[0]['vec_id']} has "
                f"{len(bad[0]['embedding'])} dims)"
            )
        cents = kmeans_fit(
            corpus,
            k=args.cells,
            iters=args.iters,
            dim=args.dim,
            seed=args.seed,
            train_mod=args.train_mod,
        )
        cb = pq_fit(
            corpus,
            m=args.m,
            ksub=args.ksub,
            iters=max(1, args.iters - 1),
            dim=args.dim,
            seed=args.seed,
            train_mod=args.train_mod,
        )
        assigned = kmeans_assign(corpus, cents)
        assigned.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(args.index, "cells")
        )
        pq_encode(corpus, cb).write.mode("overwrite").parquet(
            os.path.join(args.index, "codes")
        )
        # count the WRITTEN parquet (metadata-only), not `assigned` — that
        # would re-run the full-corpus normalize + argmin assignment
        # (checkpoint.py documents the same pattern for chunks)
        n = spark.read.parquet(os.path.join(args.index, "cells")).count()
        # manifest through the Hadoop FS API so the index dir can live on
        # any Spark-reachable filesystem, like its parquet parts
        from sparkdoc.io import hadoop_write_text

        hadoop_write_text(
            spark,
            manifest_path,
            json.dumps(
                {
                    "n_vectors": n,
                    "cells": args.cells,
                    "m": args.m,
                    "ksub": args.ksub,
                    "dim": args.dim,
                    "seed": args.seed,
                    "iters": args.iters,
                    "train_mod": args.train_mod,
                    "centroids": cents,
                    "codebooks": cb,
                }
            ),
        )
        print(
            json.dumps(
                {
                    "job": "ann_index_build",
                    "n_vectors": n,
                    "cells": args.cells,
                    "m": args.m,
                    "code_bytes_per_vec": args.m,
                }
            )
        )
        spark.stop()
        return

    if not args.query or not args.out:
        raise SystemExit("query mode requires --query and --out")
    from sparkdoc.io import hadoop_read_text

    man = json.loads(hadoop_read_text(spark, manifest_path))
    cents = man["centroids"]
    cb = man["codebooks"]

    cells = spark.read.parquet(os.path.join(args.index, "cells"))
    codes = spark.read.parquet(os.path.join(args.index, "codes"))
    queries = spark.read.parquet(args.query)
    from pyspark.sql import functions as F

    # query embeddings must match the index dim: zip_with pads the shorter
    # side with NULLs, so a mismatch degenerates every probe score and
    # cosine to NULL and the job would "succeed" over garbage rankings
    dim = len(cents[0])
    badq = queries.filter(F.size("embedding") != dim).limit(1).collect()
    if badq:
        raise SystemExit(
            f"query embedding width {len(badq[0]['embedding'])} != index dim "
            f"{dim} (e.g. vec_id={badq[0]['vec_id']}) — re-embed the queries "
            "with the index's model"
        )

    from sparkdoc.cluster import ivfpq_topk

    # probe nprobe trained cells (partition pruning on the cells table), ADC
    # over the candidates' codes (m array lookups each, per-query LUT built
    # once on the tiny query side), exact rescore of the rescore_factor*k
    # ADC head only — scoring shared with cluster.ivfpq_topk
    topk = ivfpq_topk(
        cells,
        codes,
        queries,
        cents,
        cb,
        k=args.k,
        nprobe=args.nprobe,
        rescore_factor=args.rescore_factor,
        exclude_self=args.exclude_self,
    )
    topk.write.mode("overwrite").parquet(args.out)
    n_q = queries.count()
    n_res = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "job": "ann_index_query",
                "queries": n_q,
                "results": n_res,
                "k": args.k,
                "nprobe": args.nprobe,
                "rescore_factor": args.rescore_factor,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
