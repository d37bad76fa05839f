#!/usr/bin/env python
"""Two-parallelism throughput harness for hybrid retrieval
(sparkdoc/retrieval.py): BM25 postings build + broadcast query scoring +
reciprocal-rank fusion of two ranker variants — the same N→4N scaling
evidence sparkdoc.bench.run provides for extract+chunk.

    python -m sparkdoc.bench.retrieval_scaling --docs 100000 --low 2 --high 8

Separate JVMs per level; corpus generated JVM-side (synth_text_documents)
and persisted+counted before timing, so the timed region is the retrieval
chain only: postings (the corpus-side shuffle), per-query scoring against a
1-in-100 probe set, a second BM25 variant (k1/b detuned — the standard
"two lexical systems" fusion shape), and the RRF merge. Wall = best-of-reps
(noisy shared host); throughput is corpus docs/sec through the full chain —
the postings build dominates, exactly as it would at 100 TB where the index
is built once and queries touch only probed term buckets.
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
from sparkdoc.retrieval import bm25_postings, bm25_topk, rrf_fuse
from sparkdoc.textops import words

cores = {cores}
n_docs = {docs}
spark = get_spark("retrieval-scaling-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores * 4,
                  extra_conf={{"spark.sql.adaptive.coalescePartitions.enabled": "false"}})
docs = (synth_text_documents(spark, n_docs, 42, partitions=cores * 4)
        .select("doc_id", "text").persist())
n_input = docs.count()

def probes(d, dfreq):
    # FIXED 128-query probe set regardless of corpus size (query volume is
    # independent of corpus scale in a real deployment), each probe mixing
    # the doc's 4 RAREST + 4 most COMMON terms — the realistic query shape:
    # discriminative terms that pinpoint the doc plus stopword-class terms
    # that the max_df_frac knob exists to prune. Lead-of-doc words alone
    # won't do: in this synthetic corpus every lead word sits at df ≈ 0.74
    # while the overall vocab is Zipf-ish (median df ~1e-5).
    from pyspark.sql import Window
    # probe window scales down with tiny corpora but the REPORTED n_queries
    # makes any shrink visible; documented runs (48k/100k docs) always get
    # the full 128
    limit = 100 * min(128, max(1, n_docs // 100))
    qd = d.filter((F.col("doc_id") % 100 == 0) & (F.col("doc_id") < limit))
    t = qd.select("doc_id", F.explode(F.array_distinct(words(F.col("text")))).alias("term"))
    j = t.join(F.broadcast(dfreq), "term")
    w_rare = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("term").asc())
    w_comm = Window.partitionBy("doc_id").orderBy(F.col("df").desc(), F.col("term").asc())
    picked = (
        j.withColumn("r", F.row_number().over(w_rare)).filter(F.col("r") <= 4)
        .unionByName(j.withColumn("r", F.row_number().over(w_comm)).filter(F.col("r") <= 4))
    )
    return picked.groupBy("doc_id").agg(
        F.array_join(F.collect_set("term"), " ").alias("text")
    ).select(F.col("doc_id").alias("query_id"), "text")

max_df = {max_df!r}

# probe construction is SETUP, not the measured chain: queries arrive from
# outside in a real deployment (the df join here only picks realistic terms)
_setup_post = bm25_postings(docs)
_setup_dfreq = _setup_post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
qprobes = probes(docs, _setup_dfreq).persist()
n_queries = qprobes.count()

def chain(d):
    # index ONCE (the corpus-side stage), score both variants against it —
    # the production shape: at 100 TB the postings are written bucketed by
    # term and every scoring pass reads the same index
    p = bm25_postings(d).persist()
    a = bm25_topk(d, qprobes, k=10, postings=p, max_df_frac=max_df)
    b = bm25_topk(d, qprobes, k=10, k1=1.6, b=0.6, postings=p, max_df_frac=max_df)
    fused = rrf_fuse([a.select("query_id", "doc_id", "rank"),
                      b.select("query_id", "doc_id", "rank")], topk=10)
    return fused, p

# warm the JVM + codegen paths on a tiny corpus
warm = synth_text_documents(spark, 50 * cores, 7, partitions=cores).select("doc_id", "text")
wf, wp = chain(warm)
wf.count(); wp.unpersist()
walls = []
n_out = 0
for _ in range({reps}):
    t0 = time.monotonic()
    fused, p = chain(docs)
    n_out = fused.count()
    walls.append(time.monotonic() - t0)
    p.unpersist()
wall = min(walls)
print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 3),
      "walls": [round(w, 2) for w in walls], "n_input": n_input,
      "n_queries": n_queries, "n_fused_rows": n_out,
      "docs_per_sec": round(n_input / wall, 2)}}))
spark.stop()
"""


def run_level(
    repo: str, cores: int, docs: int, reps: int = 3, max_df: float | None = None
) -> dict:
    code = _WORKER.format(repo=repo, cores=cores, docs=docs, reps=reps, max_df=max_df)
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
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--max-df-frac",
        type=float,
        default=None,
        help="common-term pruning fraction (production knob; default exact BM25)",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    lo = run_level(repo, args.low, args.docs, args.reps, args.max_df_frac)
    hi = run_level(repo, args.high, args.docs, args.reps, args.max_df_frac)
    scale = args.high / args.low
    eff = hi["docs_per_sec"] / (scale * lo["docs_per_sec"])
    print(
        json.dumps(
            {
                "pipeline": "hybrid retrieval (bm25 postings + scoring x2 + rrf fuse)",
                "max_df_frac": args.max_df_frac,
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
