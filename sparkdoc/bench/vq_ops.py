#!/usr/bin/env python
"""Walls for the round-3 operator families: trained vector quantization
(k-means fit / assign / PQ encode / ADC search vs brute force) and the
as-of join (union+window) vs the naive theta-join it replaces.

    python -m sparkdoc.bench.vq_ops --vectors 200000 --queries 64 --reps 2
    python -m sparkdoc.bench.vq_ops --asof --left 20000 --right 80000 --keys 200

Prints ONE JSON line per mode. Deterministic synthetic inputs (md5-seeded),
no external data. The as-of mode also runs both joins at 2x the rows to
expose the scaling LAW (asof ~linear, naive ~quadratic per key), not just a
single wall."""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F


def _timeit(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def _synth_vectors(
    spark,
    n: int,
    dim: int,
    clusters: int = 64,
    group: int = 16,
    group_amp: float = 0.3,
    noise: float = 0.05,
):
    """n deterministic pseudo-random vectors with HIERARCHICAL cluster
    structure (engine-side exprs only): row i belongs to tight group
    g = i // group, groups scatter around coarse center g mod clusters.

        v(i) = coarse(g mod clusters) + 0.3·u(g) + 0.05·u(i)

    Every row's exact top-(group-1) neighbors are its group-mates, clearly
    separated from the rest — so recall@k measures whether the index FINDS
    the true neighbors, not how it breaks near-ties. Uniform random vectors
    (no structure) are the degenerate case for every VQ method: all cosines
    ≈ 0 and top-k is pure noise; real embedding corpora are clustered, which
    is the regime IVF/PQ exist for."""
    cols = []
    gid = (F.col("id") - F.col("id") % group) / group
    cid = (gid.cast("long") % clusters).cast("string")
    gstr = gid.cast("long").cast("string")
    for c in range(dim // 8):
        hn = F.md5(F.concat(F.col("id").cast("string"), F.lit(f":v{c}")))
        hg = F.md5(F.concat(F.lit("grp:"), gstr, F.lit(f":v{c}")))
        hc = F.md5(F.concat(F.lit("ctr:"), cid, F.lit(f":v{c}")))
        for b in range(8):
            u = lambda h: (
                F.conv(F.substring(h, b * 4 + 1, 4), 16, 10).cast("double")
                / F.lit(65536.0)
                - F.lit(0.5)
            )
            cols.append(
                (u(hc) + F.lit(group_amp) * u(hg) + F.lit(noise) * u(hn)).alias(
                    f"x{c * 8 + b}"
                )
            )
    df = spark.range(n).select(F.col("id").alias("vec_id"), *cols)
    return df.select(
        "vec_id", F.array(*[F.col(f"x{j}") for j in range(dim)]).alias("embedding")
    )


def vq_mode(args) -> None:
    """Measures the PRODUCTION shape (jobs/ann_index.py): the index — trained
    cells + PQ codes — is built ONCE and persisted; queries run against the
    persisted tables via cluster.ivfpq_topk (probe → ADC shortlist → exact
    rescore). Build cost and query cost are reported separately because at
    100 TB they amortize completely differently (one build, endless queries).
    adc_only recall shows why the rescore stage exists."""
    import shutil
    import tempfile

    from sparkdoc.cluster import ivfpq_topk, kmeans_assign, kmeans_fit, pq_encode, pq_fit, pq_topk
    from sparkdoc.session import get_spark
    from sparkdoc.similarity import ann_recall, brute_force_topk

    spark = get_spark("bench-vq", shuffle_partitions=32)
    n, dim, k = args.vectors, 64, 10
    corpus = _synth_vectors(spark, n, dim).persist()
    corpus.count()  # materialize + warm
    # max(1, ...): --queries > --vectors would make the step 0 (ANSI
    # divide-by-zero); report the ACTUAL query count, which differs from
    # --queries when n is not an exact multiple of the step
    step = max(1, n // max(1, args.queries))
    queries = corpus.filter(F.col("vec_id") % step == 0)
    n_queries = queries.count()

    idx = tempfile.mkdtemp(prefix="vq_idx_")
    try:
        t0 = time.monotonic()
        cents = kmeans_fit(corpus, k=16, iters=2, dim=dim, train_mod=16)
        fit_s = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        cb = pq_fit(corpus, m=8, ksub=16, iters=1, dim=dim, train_mod=16)
        pq_fit_s = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        kmeans_assign(corpus, cents).write.mode("overwrite").partitionBy("cell").parquet(
            f"{idx}/cells"
        )
        assign_s = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        pq_encode(corpus, cb).write.mode("overwrite").parquet(f"{idx}/codes")
        encode_s = round(time.monotonic() - t0, 3)

        cells = spark.read.parquet(f"{idx}/cells")
        codes = spark.read.parquet(f"{idx}/codes")

        rf = args.rescore_factor
        bf_s = _timeit(lambda: brute_force_topk(corpus, queries, k=k).count(), args.reps)
        ivfpq_s = _timeit(
            lambda: ivfpq_topk(
                cells, codes, queries, cents, cb,
                k=k, nprobe=4, rescore_factor=rf, exclude_self=True,
            ).count(),
            args.reps,
        )

        exact = brute_force_topk(corpus, queries, k=k)
        rec = {
            r["method"]: r["mean_recall_at_k"]
            for r in ann_recall(
                exact,
                {
                    "ivfpq": ivfpq_topk(
                        cells, codes, queries, cents, cb,
                        k=k, nprobe=4, rescore_factor=rf, exclude_self=True,
                    ),
                    "adc_only": pq_topk(corpus, queries, cb, k=k),
                },
            ).collect()
        }
        print(
            json.dumps(
                {
                    "mode": "vq",
                    "vectors": n,
                    "queries": n_queries,
                    "kmeans_fit_s": fit_s,
                    "pq_fit_s": pq_fit_s,
                    "index_assign_write_s": assign_s,
                    "index_encode_write_s": encode_s,
                    "brute_force_s": bf_s,
                    "ivfpq_query_s": ivfpq_s,
                    "recall": rec,
                    "code_bytes_per_vec": 8,
                    "raw_bytes_per_vec": dim * 8,
                }
            )
        )
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


def _synth_events(spark, n: int, keys: int, tag: str):
    h = F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{tag}")))
    us = F.conv(F.substring(h, 1, 10), 16, 10).cast("bigint") % F.lit(86_400_000_000)
    return spark.range(n).select(
        F.col("id").alias(f"{tag}_id"),
        (F.col("id") % keys).alias("k"),
        F.timestamp_micros(us + F.lit(1_700_000_000_000_000)).alias("ts"),
        (F.col("id") % 1000).cast("double").alias("val"),
    )


def asof_mode(args) -> None:
    from sparkdoc.session import get_spark
    from sparkdoc.temporal import asof_join

    spark = get_spark("bench-asof", shuffle_partitions=32)

    def run_pair(scale: int):
        left = _synth_events(spark, args.left * scale, args.keys, "l").persist()
        right = _synth_events(spark, args.right * scale, args.keys, "r").persist()
        left.count(), right.count()
        asof_s = _timeit(
            lambda: asof_join(
                left, right, ["k"], right_vals=["val"], tiebreak="r_id"
            ).count(),
            args.reps,
        )

        def naive():
            # the join asof replaces: per-key theta join on ts, then keep the
            # max-(ts, id) right row per left row
            j = left.join(
                right.select(
                    "k",
                    F.col("ts").alias("rts"),
                    F.col("r_id").alias("rid"),
                    F.col("val").alias("rval"),
                ),
                "k",
            ).filter(F.col("rts") <= F.col("ts"))
            best = j.groupBy("l_id").agg(
                F.max(F.struct("rts", "rid", "rval")).alias("m")
            )
            return best.count()

        naive_s = _timeit(naive, args.reps)
        left.unpersist(), right.unpersist()
        return asof_s, naive_s

    a1, n1 = run_pair(1)
    a2, n2 = run_pair(2)
    print(
        json.dumps(
            {
                "mode": "asof",
                "left": args.left,
                "right": args.right,
                "keys": args.keys,
                "asof_s@1x": a1,
                "naive_s@1x": n1,
                "asof_s@2x": a2,
                "naive_s@2x": n2,
                "asof_growth": round(a2 / a1, 2) if a1 else None,
                "naive_growth": round(n2 / n1, 2) if n1 else None,
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--asof", action="store_true")
    ap.add_argument("--vectors", type=int, default=200_000)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--left", type=int, default=20_000)
    ap.add_argument("--right", type=int, default=80_000)
    ap.add_argument("--keys", type=int, default=200)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--rescore-factor", type=int, default=32)
    args = ap.parse_args()
    if args.asof:
        asof_mode(args)
    else:
        vq_mode(args)


if __name__ == "__main__":
    main()
