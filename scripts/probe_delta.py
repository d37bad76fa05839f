#!/usr/bin/env python
"""Scale probe for incremental dedup and paragraph dedup.

A: delta ingest vs full re-dedup — corpus of N docs, delta of N/10 (half
   dups). Incremental = exact-index join + delta-only signatures vs band
   index; full = near_dup_pairs over corpus ∪ delta (what you'd pay without
   the index). Index build time is reported separately (paid once, amortized
   over every future delta).
B: paragraph_dedup wall over N docs × 6 paragraphs (~20% boilerplate).

    python scripts/probe_delta.py --docs 250000 --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdoc.session import get_spark


def synth_docs(spark, n: int, offset: int = 0, tail: str = ""):
    words = [
        F.concat(
            F.lit(f"w{j}_"),
            F.conv(
                F.substring(
                    F.md5(F.concat((F.col("id") + offset).cast("string"), F.lit(f"_{j}"))), 1, 6
                ),
                16,
                10,
            ),
        )
        for j in range(40)
    ]
    return spark.range(n).select(
        (F.col("id") + offset).alias("doc_id"),
        F.concat(F.concat_ws(" ", *words), F.lit(tail)).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=250000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--delta-docs", type=int, default=None)
    args = ap.parse_args()
    spark = get_spark("probe_delta")
    n = args.docs
    out: dict = {"docs": n}

    def best(fn, prep=None):
        walls = []
        r = None
        for _ in range(args.reps):
            spark.catalog.clearCache()
            if prep:
                prep()
            t0 = time.monotonic()
            r = fn()
            walls.append(round(time.monotonic() - t0, 2))
        return min(walls), walls, r

    # --- A: delta ingest vs full re-dedup -------------------------------
    # everything lands on parquet first (production shape: the corpus and its
    # indexes are TABLES, not cached plans — clearCache between reps must not
    # silently turn index reads back into index builds)
    from sparkdoc.dedup_text import near_dup_pairs
    from sparkdoc.incremental import (
        build_band_index,
        build_exact_index,
        delta_exact_dups,
        delta_near_dups,
    )

    base = "/tmp/probe_delta"
    synth_docs(spark, n).write.mode("overwrite").parquet(f"{base}/corpus")
    d10 = args.delta_docs or (n // 10)
    # delta: half exact dups of corpus docs, half fresh
    (
        synth_docs(spark, d10 // 2, offset=0)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .unionByName(
            synth_docs(spark, d10 - d10 // 2, offset=20_000_000)
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        )
        .write.mode("overwrite")
        .parquet(f"{base}/delta")
    )
    corpus = spark.read.parquet(f"{base}/corpus")
    delta = spark.read.parquet(f"{base}/delta")

    t0 = time.monotonic()
    build_exact_index(corpus).write.mode("overwrite").parquet(f"{base}/idx_exact")
    build_band_index(corpus).write.mode("overwrite").parquet(f"{base}/idx_bands")
    out["index_build_once"] = {"wall": round(time.monotonic() - t0, 2)}
    eidx = spark.read.parquet(f"{base}/idx_exact")
    bidx = spark.read.parquet(f"{base}/idx_bands")

    w, walls, nd = best(
        lambda: delta_exact_dups(delta, eidx).count()
        + delta_near_dups(delta, corpus, bidx, threshold=0.8).count()
    )
    out["delta_ingest"] = {"delta_docs": d10, "dups": nd, "best": w, "walls": walls}

    w, walls, np_ = best(lambda: near_dup_pairs(corpus.unionByName(delta), 0.8).count())
    out["full_rededup"] = {"pairs": np_, "best": w, "walls": walls}

    # --- B: paragraph dedup ---------------------------------------------
    from sparkdoc.dedup_text import paragraph_dedup

    boiler = ["subscribe now", "all rights reserved", "follow us on social media"]
    paras = [
        F.when(
            (F.col("doc_id") + i) % 5 == 0, F.lit(boiler[i % 3])
        ).otherwise(
            F.concat(
                F.lit(f"para{i} "),
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"p{i}"))), 1, 8
                    ),
                    16,
                    10,
                ),
            )
        )
        for i in range(6)
    ]
    pdocs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws("\n\n", *paras).alias("text")
    ).persist()
    pdocs.count()
    w, walls, kept = best(
        lambda: paragraph_dedup(pdocs).agg(
            F.sum("n_paras").cast("long"), F.sum("n_kept").cast("long")
        ).collect()[0]
    )
    out["paragraph_dedup"] = {
        "paras": int(kept[0]), "kept": int(kept[1]), "best": w, "walls": walls,
        "paras_per_sec": round(kept[0] / w, 0),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
