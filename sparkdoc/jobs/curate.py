#!/usr/bin/env python
"""spark-submit entrypoint: the corpus-curation job — chain every
training-data filter over a documents table and split it into kept /
rejected with full per-gate attribution.

    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/curate.py \
        --input /data/documents.parquet --out /data/curated \
        [--benchmark /data/benchmark.parquet] [--near-dup] \
        [--min-words 10] [--jaccard 0.85] [--sample 0.01 --sample-salt dev] \
        [--para-dedup] [--substr-dedup --substr-k 12] [--max-per-source 100000] \
        [--classifier /data/model] [--dsir-target /data/target.parquet --dsir-k 1000000]

Gate order (each doc gets the FIRST reason that rejects it — later, more
expensive gates only ever see survivors, so the cheap map-side gates also
bound the shuffle volume of the dedup gates):

  1. PII redaction        (never rejects — rewrites text, counts per kind)
  2. quality              (C4-style word/symbol/distinct gates)
  3. repetition           (Gopher dup-line / top-bigram / dup-trigram gates)
  4. exact_dup            (normalized-md5 groups, min-id representative kept)
  5. near_dup             (optional: MinHash-LSH candidates + exact Jaccard
                           verify; lowest-id shadow rule, same convention as
                           similarity.semantic_dedup)
  6. contaminated         (optional: word-8-gram overlap with --benchmark)
  7. classifier           (optional: trained hashed-linear model from
                           jobs/train_classifier.py; label-0 survivors of
                           every cheaper gate are rejected)
  8. dsir                 (optional: DSIR importance resampling — keep the
                           --dsir-k survivors whose hashed-ngram distribution
                           best matches --dsir-target; see selection.py)

Pre-gate stages (in order): --url-dedup (drop all but the min-id doc per
canonical URL, reason 'url_dup' — requires a 'url' column), --max-per-source,
--fix-encoding (cp1252 mojibake repair, rewrite only), --sample,
--para-dedup (corpus-first paragraphs) and --substr-dedup (exact substring
dedup — corpus-duplicated k-word passages trimmed, keep-first).

Outputs under --out (all on the data filesystem, hdfs/s3a-safe):
  kept/        parquet: doc_id, text (REDACTED), quality + language features
  rejected/    parquet: doc_id, reject_reason
  stats.json   per-gate counts + knobs (written via the Hadoop FS API)

Prints ONE JSON summary line. Deterministic end-to-end: every gate is a
pure function of the input table, so re-running the job reproduces the
same split bit-for-bit (idempotent overwrite writes).

Accounting contract: ``n_input`` is the document count ENTERING the gate
chain, derived from the written outputs (kept + every reject reason except
``url_dup``), so ``n_kept + Σ gate rejects == n_input`` balances by
construction. ``url_dup`` rejects are attributed in ``rejected/`` but
happen BEFORE the gate input (their denominator is the raw table);
``--max-per-source`` caps and ``--sample`` are subsampling, not rejects —
dropped docs appear in neither table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--benchmark", default=None, help="parquet of benchmark texts to decontaminate against")
    ap.add_argument("--near-dup", action="store_true", help="also drop MinHash near-duplicates")
    ap.add_argument("--min-words", type=int, default=10)
    ap.add_argument("--jaccard", type=float, default=0.85)
    ap.add_argument("--decontam-n", type=int, default=8)
    ap.add_argument(
        "--sample", type=float, default=None,
        help="deterministic hash-sample fraction applied to the input first "
        "(stable across runs/partitionings; see filters.hash_sample)",
    )
    ap.add_argument("--sample-salt", default="", help="salt for --sample draws")
    ap.add_argument(
        "--para-dedup", action="store_true",
        help="rewrite each doc to its corpus-first paragraphs before the "
        "gates (boilerplate removal; see dedup_text.paragraph_dedup)",
    )
    ap.add_argument(
        "--max-per-source", type=int, default=None,
        help="deterministic per-source cap applied to the input (requires a "
        "'source' column; see filters.cap_per_group)",
    )
    ap.add_argument(
        "--substr-dedup", action="store_true",
        help="trim corpus-duplicated k-word passages from each doc before "
        "the gates (exact substring dedup; see dedup_text.substring_dedup)",
    )
    ap.add_argument("--substr-k", type=int, default=12, help="window size for --substr-dedup")
    ap.add_argument(
        "--fix-encoding", action="store_true",
        help="repair cp1252 mojibake in text before any other stage "
        "(map-side replace chain; see textops.fix_mojibake)",
    )
    ap.add_argument(
        "--url-dedup", action="store_true",
        help="drop all but the min-id doc per canonical URL before the "
        "gates (requires a 'url' column; rejects get reason 'url_dup'; "
        "see urlops)",
    )
    ap.add_argument(
        "--classifier", default=None,
        help="model dir written by jobs/train_classifier.py; kept docs "
        "scoring label 0 are rejected with reason 'classifier'",
    )
    ap.add_argument(
        "--dsir-target", default=None,
        help="parquet of target-domain documents (doc_id, text); after every "
        "gate, keep only the --dsir-k survivors whose hashed-ngram "
        "distribution best matches this target (DSIR importance resampling, "
        "see selection.py; non-selected docs get reason 'dsir')",
    )
    ap.add_argument("--dsir-k", type=int, default=None, help="number of docs DSIR keeps (required with --dsir-target)")
    ap.add_argument("--dsir-seed", type=int, default=7, help="Gumbel sampling seed for --dsir-target")
    ap.add_argument("--dsir-buckets", type=int, default=4096, help="hashed-ngram bucket count for --dsir-target")
    ap.add_argument(
        "--dsir-temperature", type=float, default=1.0,
        help="0 = deterministic top-k by importance weight; 1 = the paper's "
        "sampling-without-replacement",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkdoc.filters import curate_split
    from sparkdoc.io import write_text_file
    from sparkdoc.session import get_spark

    spark = get_spark(
        "sparkdoc-curate",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    t_start = time.monotonic()  # post-session: pipeline wall, not JVM boot
    _release: list = []  # frames persisted for multi-consumer stages
    raw = spark.read.parquet(args.input)
    url_rejected = None
    if args.url_dedup:
        # cheapest dedup first: pure string canonicalization + one keep-min
        # shuffle on the canonical key, before any text-heavy stage (and
        # before the per-source cap, which drops the url column)
        from sparkdoc.urlops import url_dedup, with_canonical_url

        wc = with_canonical_url(raw)
        # ONE implementation of the canonicalize/keep-min rule (urlops.
        # url_dedup) — an inline copy here could drift on tie-break or
        # NULL handling
        keepers = url_dedup(raw).select(
            "url_canon", F.col("keep_id").alias("_keep")
        )
        wc = wc.join(keepers, "url_canon", "left")
        # NULL-url docs never reject: unknown URLs are not duplicates of
        # each other (keepers join misses -> _keep is NULL -> kept)
        url_rejected = wc.filter(
            F.col("_keep").isNotNull() & (F.col("doc_id") != F.col("_keep"))
        ).select("doc_id", F.lit("url_dup").alias("reject_reason"))
        raw = wc.filter(
            F.col("_keep").isNull() | (F.col("doc_id") == F.col("_keep"))
        ).drop("url_canon", "_keep")
    if args.max_per_source is not None:
        from sparkdoc.filters import cap_per_group

        raw = cap_per_group(
            raw.select("doc_id", "text", "source"), "source", args.max_per_source
        )
    docs = raw.select("doc_id", "text")
    if args.fix_encoding:
        from sparkdoc.textops import fix_mojibake

        docs = docs.select("doc_id", fix_mojibake(F.col("text")).alias("text"))
    if args.sample is not None:
        from sparkdoc.filters import hash_sample

        docs = hash_sample(docs, args.sample, salt=args.sample_salt)
    if args.para_dedup:
        from sparkdoc.dedup_text import paragraph_dedup

        docs = paragraph_dedup(docs).select("doc_id", "text")
    if args.substr_dedup:
        from sparkdoc.dedup_text import substring_dedup

        docs = substring_dedup(docs, k=args.substr_k).select("doc_id", "text")
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    kept, rejected = curate_split(
        docs,
        min_words=args.min_words,
        near_dup=args.near_dup,
        jaccard=args.jaccard,
        benchmark=bench,
        decontam_n=args.decontam_n,
    )
    if args.classifier:
        # trained-model gate, last: only survivors of every cheaper gate pay
        # for scoring, and the reject attribution stays first-fault
        from sparkdoc.classifier import score_quantized
        from sparkdoc.io import hadoop_read_text

        # hadoop_read_text raises FileNotFoundError on a missing/typo'd
        # --classifier path (read_text_file's None would die later as an
        # opaque json.loads(None) TypeError)
        manifest = json.loads(hadoop_read_text(spark, os.path.join(args.classifier, "manifest.json")))
        wdf = spark.read.parquet(os.path.join(args.classifier, "weights"))
        scored = score_quantized(
            kept,
            None,
            manifest["bias"],
            salt=manifest.get("salt", ""),
            weights_df=wdf,
            n_buckets=manifest["n_buckets"],
        ).withColumnRenamed("label", "_clf")
        # persisted: the scored frame feeds BOTH the reject attribution and
        # the surviving-kept branch — without the cache the whole feature-
        # hash + dot runs once per consumer (curate_split's own drop lists
        # persist for exactly this reason)
        kept_s = kept.join(scored.select("doc_id", "_clf"), "doc_id").persist()
        _release.append(kept_s)
        rejected = rejected.unionByName(
            kept_s.filter(F.col("_clf") == 0).select(
                "doc_id", F.lit("classifier").alias("reject_reason")
            )
        )
        kept = kept_s.filter(F.col("_clf") == 1).drop("_clf")

    if args.dsir_target:
        # selection LAST: DSIR ranks only documents that survived every
        # quality/dedup gate, so the target-matching budget is never spent
        # on docs a cheaper gate would have dropped anyway
        if args.dsir_k is None:
            ap.error("--dsir-target requires --dsir-k")
        from sparkdoc.selection import dsir_select, fit_dsir_model

        target = spark.read.parquet(args.dsir_target).select("doc_id", "text")
        model = fit_dsir_model(target, kept, n_buckets=args.dsir_buckets)
        # persisted: sel_ids (k rows) feeds the anti-join AND the keep join;
        # uncached, each consumer re-runs the model fit's corpus scans
        sel_ids = dsir_select(
            kept, model, k=args.dsir_k, seed=args.dsir_seed,
            n_buckets=args.dsir_buckets, temperature=args.dsir_temperature,
        ).select("doc_id").persist()
        _release.append(sel_ids)
        # k rows vs the corpus: AQE broadcasts the small side at runtime
        rejected = rejected.unionByName(
            kept.join(sel_ids, "doc_id", "left_anti").select(
                "doc_id", F.lit("dsir").alias("reject_reason")
            )
        )
        kept = kept.join(sel_ids, "doc_id")

    if url_rejected is not None:
        rejected = rejected.unionByName(url_rejected)
    # n_kept rides the kept write itself (Observation metrics collect
    # during the job) instead of a separate re-read count — one less rung
    # of the serial accounting floor (same trick as build_mix)
    from pyspark.sql import Observation

    obs_kept = Observation("kept")
    kept.observe(obs_kept, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).parquet(os.path.join(args.out, "kept"))
    n_kept = int(obs_kept.get["n"])
    rejected.write.mode("overwrite").parquet(os.path.join(args.out, "rejected"))

    by_reason = {
        r["reject_reason"]: r["n"]
        for r in spark.read.parquet(os.path.join(args.out, "rejected"))
        .groupBy("reject_reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for f in _release:
        f.unpersist()
    # n_input is DERIVED from the written outputs (kept + every gate reject
    # except the pre-pipeline url_dup pass), so the accounting balances by
    # construction — a docs.count() here would replay the whole pre-gate
    # chain (mojibake repair, paragraph + substring dedup) for one integer,
    # and double-counted url_dup rows against a denominator they never
    # entered. Cap/sample-dropped docs are subsampling, not rejects: they
    # appear in neither table by design (documented in the module docstring).
    n_input = n_kept + sum(v for k, v in by_reason.items() if k != "url_dup")
    summary = {
        "job": "curate",
        "input": args.input,
        "wall_s": round(time.monotonic() - t_start, 3),
        "n_input": n_input,
        "n_kept": n_kept,
        "rejected_by_reason": dict(sorted(by_reason.items())),
        "knobs": {
            "min_words": args.min_words,
            "near_dup": bool(args.near_dup),
            "jaccard": args.jaccard,
            "benchmark": args.benchmark,
            "decontam_n": args.decontam_n,
            "sample": args.sample,
            "sample_salt": args.sample_salt,
            "para_dedup": bool(args.para_dedup),
            "max_per_source": args.max_per_source,
            "substr_dedup": bool(args.substr_dedup),
            "substr_k": args.substr_k,
            "classifier": args.classifier,
            "fix_encoding": bool(args.fix_encoding),
            "url_dedup": bool(args.url_dedup),
            "dsir_target": args.dsir_target,
            "dsir_k": args.dsir_k,
            "dsir_seed": args.dsir_seed,
            "dsir_buckets": args.dsir_buckets,
            "dsir_temperature": args.dsir_temperature,
        },
    }
    write_text_file(
        spark,
        os.path.join(args.out, "stats.json"),
        json.dumps(summary, indent=2, sort_keys=True),
    )
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
