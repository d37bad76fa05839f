#!/usr/bin/env python
"""Measure the ANN candidate-pair cosine VERIFY path at scale: interpreted
HOF fold (current production path) vs an Arrow-batched numpy pandas-UDF —
the one open question from the similarity plan audit (VERDICT r2: "at
billions of candidate pairs a batched numpy verify may win — measure before
switching").

    python -m sparkdoc.bench.ann_verify --pairs 500000 --dim 64 --reps 3

Prints ONE JSON line with best-of-N walls for both paths and the winner.
Deterministic input: md5-seeded pseudo-random unit vectors, pairs = corpus
zipped against a shifted copy (exactly --pairs rows, no join variance)."""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import pandas as pd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=500_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    from sparkdoc.session import get_spark

    spark = get_spark(
        "ann-verify-bench",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")

    dim = args.dim
    # deterministic vectors: hash-mixed, generated distributed (no driver data)
    base = spark.range(0, args.pairs, 1, args.cores * 2)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.hash(F.col("id") * dim + j), F.lit(1000)) - 500.0) / 500.0,
    )
    vec2 = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.hash(F.col("id") * dim + j + 7919), F.lit(1000)) - 500.0) / 500.0,
    )
    pairs = base.select(F.col("id"), vec.alias("a"), vec2.alias("b")).persist()
    pairs.count()  # materialize input off the timed path

    def dot_hof(x, y):
        return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v)

    norm = lambda x: F.sqrt(dot_hof(x, x))  # noqa: E731
    cos_hof = dot_hof(F.col("a"), F.col("b")) / (norm(F.col("a")) * norm(F.col("b")))

    @F.pandas_udf(DoubleType())
    def cos_np(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.to_numpy())
        bm = np.stack(b.to_numpy())
        dots = np.einsum("ij,ij->i", am, bm)
        na = np.linalg.norm(am, axis=1)
        nb = np.linalg.norm(bm, axis=1)
        return pd.Series(dots / (na * nb))

    def timed(col, label):
        walls = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            # checksum forces full evaluation of every row's cosine
            pairs.select(F.sum(col).alias("s")).collect()
            walls.append(time.monotonic() - t0)
        return min(walls)

    # warm both code paths with a FULL untimed pass: limit(1000) evaluates a
    # single partition and spawns only one Python worker, leaving the timed
    # numpy reps to pay worker+Arrow cold start on every other partition
    # (run.py warms every worker for the same reason) — that asymmetry can
    # flip the winner at --reps 1
    pairs.select(F.sum(cos_hof)).collect()
    pairs.select(F.sum(cos_np(F.col("a"), F.col("b")))).collect()

    hof_wall = timed(cos_hof, "hof")
    np_wall = timed(cos_np(F.col("a"), F.col("b")), "numpy")
    winner = "hof" if hof_wall <= np_wall else "numpy_pandas_udf"
    print(
        json.dumps(
            {
                "bench": "ann_verify_path",
                "pairs": args.pairs,
                "dim": dim,
                "reps": args.reps,
                "cores": args.cores,
                "hof_fold_sec": round(hof_wall, 3),
                "numpy_pandas_udf_sec": round(np_wall, 3),
                "winner": winner,
                "pairs_per_sec_best": round(args.pairs / min(hof_wall, np_wall), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
