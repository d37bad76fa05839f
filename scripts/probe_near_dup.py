#!/usr/bin/env python
"""Cold-wall A/B probe for the near-dup verify stage: OLD (re-shingle the
whole corpus on both join sides, no persist) vs NEW (left-semi reduce the
corpus to candidate-pair ids first + persist the shared shingle frame —
sparkdoc/dedup_text.py near_dup_pairs). Caches cleared between reps so every
wall is a genuine cold run.

    python scripts/probe_near_dup.py --docs 60000 --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkdoc.dedup_text import minhash_lsh_candidates, ngram_jaccard, near_dup_pairs
from sparkdoc.session import get_spark


def build_docs(spark, n: int):
    # deterministic corpus with a 3% near-dup tail: dup docs share the base
    # text of doc (i - n*97//100) with one word changed
    base = (
        spark.range(n)
        .withColumn("doc_id", F.col("id"))
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}_"), F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_{j}"))), 1, 6), 16, 10))
                    for j in range(40)
                ],
            ),
        )
        .select("doc_id", "text")
    )
    cut = n * 97 // 100
    dups = (
        base.filter(F.col("doc_id") < n - cut)
        .select(
            (F.col("doc_id") + cut).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail_edit")).alias("text"),
        )
    )
    return base.filter(F.col("doc_id") < cut).unionByName(dups)


def old_path(df, threshold):
    cands = minhash_lsh_candidates(df, "text", "doc_id", 16, 4, 3)
    # pre-fix ngram_jaccard: full corpus shingled on BOTH join sides
    from sparkdoc.dedup_text import with_shingles

    sh = with_shingles(df.select("doc_id", "text"), "text", 3, out="sh").select("doc_id", "sh")
    a = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = (inter / union).alias("jaccard")
    return joined.select("a", "b", jac).filter(F.col("jaccard") >= threshold)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("probe_near_dup")
    docs = build_docs(spark, args.docs).persist()
    n = docs.count()

    out = {"docs": n}
    for name, fn in (
        ("old_full_corpus_verify", lambda: old_path(docs, 0.8)),
        ("new_candidate_bounded", lambda: near_dup_pairs(docs, 0.8)),
    ):
        walls, pairs = [], None
        for _ in range(args.reps):
            spark.catalog.clearCache()
            docs.persist().count()
            t0 = time.monotonic()
            pairs = fn().count()
            walls.append(round(time.monotonic() - t0, 2))
        out[name] = {"pairs": pairs, "walls": walls, "best": min(walls)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
