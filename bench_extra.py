#!/usr/bin/env python
"""Round-6 noop-sink isolation probes (guide §1.4) — NOT the frozen bench.

Times individual headline kernels with the noop sink so the computation is
measured without collect/sink effects, at $SPARK_GRAFT_SF_DIR. Each probe is
labelled (setJobDescription) for UI/event-log attribution.

    python bench_extra.py [probe ...]   # default: all probes
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from sparkdoc.session import get_spark

    spark = get_spark("sparkdoc-bench-extra")
    sel = set(sys.argv[1:])
    out: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, reps=2):
        if sel and name.split(":")[0] not in sel:
            return
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            fn()
            w = time.monotonic() - t0
            best = w if best is None or w < best else best
            spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)

    # warm
    spark.range(1000).select(F.sum("id")).collect()
    for t in ("documents", "embeddings", "lineitem", "orders"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # --- bm25 decomposition ---
    from sparkdoc.retrieval import bm25_postings, bm25_topk
    from sparkdoc.textops import words

    docs = entrymod._docs(spark, sf_dir).select("doc_id", "text")
    timed("bm25:tokenize_scan", lambda: noop(
        docs.select("doc_id", words(F.col("text")).alias("_w"))
    ))
    timed("bm25:postings_full", lambda: noop(bm25_postings(docs)))

    def lexq():
        emb = entrymod._emb(spark, sf_dir)
        return (
            docs.join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi")
            .filter(F.col("doc_id") % 100 == 0)
            .select(
                F.col("doc_id").alias("query_id"),
                F.array_join(F.slice(words(F.col("text")), 1, 8), " ").alias("text"),
            )
        )

    timed("bm25:lex_topk", lambda: noop(bm25_topk(docs, lexq(), k=10)))
    timed("bm25:rrf_full", lambda: noop(entrymod._doc_rrf_hybrid(spark, sf_dir)))

    # --- dense ---
    timed("knn:full", lambda: noop(entrymod._emb_knn(spark, sf_dir)))

    # --- relational ---
    timed("q3:full", lambda: noop(entrymod._q3_unshipped(spark, sf_dir)))
    timed("q5:full", lambda: noop(entrymod._q5_local_supplier(spark, sf_dir)))

    out["_load"] = os.getloadavg()[0]
    print(json.dumps({"sf_dir": sf_dir, "probes": out}))
    spark.stop()


if __name__ == "__main__":
    main()
