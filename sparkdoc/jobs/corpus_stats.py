#!/usr/bin/env python
"""spark-submit entrypoint: corpus statistics report — one profiling sweep
over a documents table, rendering stats.json + report.md.

    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/corpus_stats.py \
        --input /data/documents.parquet --out /data/stats_v1 \
        [--top-terms 25] [--top-domains 20]

What it measures (and the per-100 TB cost shape):
  * size: docs, chars, tokens                    one map-side pass
  * language distribution                        same pass (expr features)
  * quality-gate pass rate                       same pass
  * mojibake incidence                           same pass
  * exact-duplicate rate                         one 16-byte-key shuffle
  * vocabulary size                              HLL++ sketch (no distinct
                                                 shuffle; sketches.approx_distinct_by)
  * top terms                                    exact word-count top-N (one
                                                 map-side-combined shuffle)
  * heavy hitters (freq > n/(k+1))               Misra-Gries + exact verify
                                                 (bounded state; sketches.heavy_hitters)
  * per-source doc counts                        one group shuffle
  * top registrable domains + url-dup rate       (with a url column)

All per-doc features ride ONE persisted frame, so the corpus is scanned a
bounded number of times regardless of how many stats are on. Deterministic;
prints ONE JSON summary line."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text[, url, source])")
    ap.add_argument("--out", required=True)
    ap.add_argument("--top-terms", type=int, default=25)
    ap.add_argument("--top-domains", type=int, default=20)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkdoc.io import write_text_file
    from sparkdoc.report import run_report_markdown
    from sparkdoc.session import get_spark
    from sparkdoc.sketches import approx_distinct_by, heavy_hitters
    from sparkdoc.textops import (
        doc_fingerprint,
        fix_mojibake,
        quality_filter,
        token_count,
        with_language,
        words,
    )

    spark = get_spark(
        "sparkdoc-corpus-stats",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    raw = spark.read.parquet(args.input)
    has_url = "url" in raw.columns
    has_source = "source" in raw.columns

    feats = quality_filter(with_language(raw.select("doc_id", "text")))
    feats = feats.select(
        "doc_id",
        "text",
        "lang_pred",
        "quality_keep",
        "n_words",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        (~F.col("text").eqNullSafe(fix_mojibake(F.col("text")))).cast("int").alias("had_mojibake"),
        doc_fingerprint(F.col("text")).alias("fp"),
    ).persist()

    totals = feats.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("quality_keep").alias("n_quality_keep"),
        F.sum("had_mojibake").alias("n_mojibake"),
        # doc-length distribution via the Greenwald-Khanna quantile sketch
        # (constant state per executor; exact at small corpora)
        F.percentile_approx("n_tokens", [0.5, 0.9, 0.99], 10000).alias("tok_pcts"),
    ).collect()[0]
    n_docs = totals["n_docs"]

    by_lang = {
        r["lang_pred"]: r["n"]
        for r in feats.groupBy("lang_pred").agg(F.count("*").alias("n")).collect()
    }
    # exact-dup rate: docs beyond the first of each fingerprint group
    dup_row = (
        feats.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.count("*").alias("n"))
        .agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_dup_docs"),
            F.count("*").alias("n_distinct_texts"),
        )
        .collect()[0]
    )
    terms = feats.select(F.explode(words(F.col("text"))).alias("w")).persist()
    vocab = approx_distinct_by(
        terms.withColumn("_all", F.lit(1)), "_all", "w"
    ).collect()
    vocab_estimate = vocab[0]["n_estimate"] if vocab else 0
    # top_terms: exact top-N word count (map-side-combined shuffle on the
    # word key — the classic bounded-result word-count; always populated).
    top_terms = [
        (r["w"], r["n"])
        for r in terms.groupBy("w").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w").limit(args.top_terms).collect()
    ]
    # heavy_hitters: the streaming-shape Misra-Gries set (freq > n/(k+1),
    # exact counts, bounded executor state) — empty on near-uniform corpora.
    mg_hitters = sorted(
        [(r["item"], r["cnt"]) for r in heavy_hitters(terms, "w", k=args.top_terms).collect()],
        key=lambda t: (-t[1], t[0]),
    )
    terms.unpersist()

    by_source = {}
    if has_source:
        by_source = {
            r["source"]: r["n"]
            for r in raw.groupBy("source").agg(F.count("*").alias("n")).collect()
        }

    domains, url_dup_rate = [], None
    if has_url:
        from sparkdoc.urlops import url_dedup, url_host, registered_domain

        dom = raw.select(
            registered_domain(url_host(F.col("url"))).alias("domain")
        ).filter(F.col("domain") != "")
        domains = sorted(
            [
                (r["domain"], r["n"])
                for r in dom.groupBy("domain").agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "domain").limit(args.top_domains).collect()
            ],
            key=lambda t: (-t[1], t[0]),
        )
        url_groups = url_dedup(raw)
        ur = url_groups.agg(
            F.coalesce(F.sum(F.col("n_rows") - 1), F.lit(0)).alias("dups"),
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("total"),
        ).collect()[0]
        url_dup_rate = (ur["dups"] / ur["total"]) if ur["total"] else 0.0

    feats.unpersist()

    stats = {
        "n_docs": n_docs,
        "total_chars": totals["total_chars"],
        "total_tokens": totals["total_tokens"],
        "quality_pass_rate": round((totals["n_quality_keep"] or 0) / n_docs, 6) if n_docs else None,
        "mojibake_rate": round((totals["n_mojibake"] or 0) / n_docs, 6) if n_docs else None,
        "exact_dup_rate": round(dup_row["n_dup_docs"] / n_docs, 6) if n_docs else None,
        "n_distinct_texts": dup_row["n_distinct_texts"],
        "tokens_p50": totals["tok_pcts"][0] if totals["tok_pcts"] else None,
        "tokens_p90": totals["tok_pcts"][1] if totals["tok_pcts"] else None,
        "tokens_p99": totals["tok_pcts"][2] if totals["tok_pcts"] else None,
        "vocab_estimate_hll": vocab_estimate,
        "by_lang": dict(sorted(by_lang.items())),
        "by_source": dict(sorted(by_source.items())),
        "top_terms": top_terms,
        "heavy_hitters": mg_hitters,
        "top_domains": domains,
        "url_dup_rate": round(url_dup_rate, 6) if url_dup_rate is not None else None,
    }
    report = run_report_markdown(
        "corpus_stats",
        counts={"documents": n_docs, "distinct_texts": dup_row["n_distinct_texts"]},
        stats={k: v for k, v in stats.items() if not isinstance(v, (dict, list))},
        config={"input": args.input, "top_terms": args.top_terms, "top_domains": args.top_domains},
        extra_tables=[
            ("Language distribution", sorted(by_lang.items())),
            ("Docs by source", sorted(by_source.items())),
            ("Top terms", top_terms),
            ("Heavy hitters (freq > n/(k+1))", mg_hitters),
            ("Top registrable domains", domains),
        ],
    )
    write_text_file(spark, os.path.join(args.out, "stats.json"), json.dumps(stats, indent=2, sort_keys=True))
    write_text_file(spark, os.path.join(args.out, "report.md"), report)
    print(json.dumps({"job": "corpus_stats", "out": args.out, **stats}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
