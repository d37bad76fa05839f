#!/usr/bin/env python
"""BM25 delta-update corpus-size-independence rehearsal (r4 verdict #8).

Protocol mirrors the r3 delta-dedup probe: a FIXED 25k-doc delta is
appended (jobs/search_index.py --update) into indexes built over base
corpora of 125k → 1M docs. The update tokenizes and bucket-appends ONLY
the delta and rewrites only the manifest, so its wall must stay ~flat in
the base corpus size; the build wall (scanned once per base, shown for
contrast) grows linearly. Correctness: on the largest base, 20 probe
queries against the updated index must equal a from-scratch rebuild over
base+delta row-for-row (same integer micro-unit scores, same tie-break).

    python -m sparkdoc.bench.bm25_delta [--bases 125000,250000,500000,1000000]
        [--delta 25000] [--cores 8] [--record]
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


def synth_docs(spark, lo: int, hi: int):
    """Deterministic (doc_id, text) rows for ids [lo, hi): ~40 pseudo-words
    from md5 material + a few high-df common words so the postings carry
    realistic df skew. Pure JVM exprs — generation never bottlenecks the
    measurement."""
    from pyspark.sql import functions as F

    n = hi - lo
    return (
        spark.range(lo, hi)
        .select(F.concat(F.lit("doc"), F.col("id").cast("string")).alias("doc_id"), "id")
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.lit("the data of and"),
                F.expr(
                    "concat_ws(' ', transform(sequence(1, 36), "
                    "i -> substr(md5(concat(id, ':', i)), 1, 5 + pmod(hash(id, i), 4))))"
                ),
            ),
        )
        .drop("id")
        .repartition(max(8, n // 50_000))
    )


def run_cli(repo: str, args: list[str]) -> dict:
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.join(repo, "sparkdoc/jobs/search_index.py"), *args],
        capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"search_index failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", default="125000,250000,500000,1000000")
    ap.add_argument("--delta", type=int, default=25_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    bases = [int(x) for x in args.bases.split(",")]
    delta_lo = max(bases)  # delta ids disjoint from every base
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(args.cores))

    from sparkdoc.session import get_spark

    spark = get_spark("bm25-delta-synth", master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores * 4)
    work = tempfile.mkdtemp(prefix="bm25delta_")
    delta_path = os.path.join(work, "delta.parquet")
    synth_docs(spark, delta_lo, delta_lo + args.delta).write.parquet(delta_path)
    base_paths = {}
    for n in bases:
        p = os.path.join(work, f"base_{n}.parquet")
        synth_docs(spark, 0, n).write.parquet(p)
        base_paths[n] = p
    # probe queries: md5-material terms + common words (mixed df)
    from pyspark.sql import functions as F

    q = spark.range(20).select(
        F.concat(F.lit("q"), F.col("id").cast("string")).alias("query_id"),
        F.expr(
            "concat_ws(' ', 'data', substr(md5(concat(id, ':qa')), 1, 6), "
            "substr(md5(concat(id, ':qb')), 1, 7))"
        ).alias("text"),
    )
    q_path = os.path.join(work, "queries.parquet")
    q.write.parquet(q_path)
    spark.stop()

    results = []
    for n in bases:
        idx = os.path.join(work, f"idx_{n}")
        t0 = time.monotonic()
        b = run_cli(repo, ["--build", "--corpus", base_paths[n], "--index", idx,
                           "--buckets", str(args.buckets)])
        build_wall = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        u = run_cli(repo, ["--update", "--corpus", delta_path, "--index", idx])
        update_wall = round(time.monotonic() - t0, 1)
        results.append({
            "base_docs": n,
            "build_wall_s": build_wall,
            "update_wall_s": update_wall,
            "postings": b.get("n_postings"),
            "postings_after_update": u.get("n_postings", None),
        })
        print(json.dumps(results[-1]), flush=True)

    # correctness on the largest base: updated index == from-scratch rebuild
    n = max(bases)
    idx_upd = os.path.join(work, f"idx_{n}")
    idx_full = os.path.join(work, "idx_full")
    spark = get_spark("bm25-delta-union", master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores * 4)
    full_path = os.path.join(work, "full.parquet")
    spark.read.parquet(base_paths[n]).unionByName(
        spark.read.parquet(delta_path)
    ).write.parquet(full_path)
    spark.stop()
    run_cli(repo, ["--build", "--corpus", full_path, "--index", idx_full,
                   "--buckets", str(args.buckets)])
    out_upd = os.path.join(work, "hits_upd")
    out_full = os.path.join(work, "hits_full")
    run_cli(repo, ["--query", q_path, "--index", idx_upd, "--out", out_upd, "--k", "10"])
    run_cli(repo, ["--query", q_path, "--index", idx_full, "--out", out_full, "--k", "10"])
    import duckdb

    con = duckdb.connect()
    h = lambda p: con.execute(
        "select md5(string_agg(query_id || '|' || doc_id || '|' || score_e6, ',' "
        "order by query_id, score_e6 desc, doc_id)) from parquet_scan(?)",
        [os.path.join(p, "*.parquet")],
    ).fetchone()[0]
    match = h(out_upd) == h(out_full)
    summary = {
        "metric": "bm25_delta_update",
        "delta_docs": args.delta,
        "runs": results,
        "update_flat": max(r["update_wall_s"] for r in results)
        <= 1.5 * min(r["update_wall_s"] for r in results),
        "query_equals_rebuild": bool(match),
    }
    print(json.dumps(summary))
    if args.record:
        from sparkdoc.bench.record import record_scaling

        record_scaling("bm25_delta_update", {
            "delta_docs": args.delta,
            "update_walls_s": {str(r["base_docs"]): r["update_wall_s"] for r in results},
            "query_equals_rebuild": bool(match),
            "harness": "python -m sparkdoc.bench.bm25_delta",
        })
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
