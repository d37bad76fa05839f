#!/usr/bin/env python
"""spark-submit entrypoint: build a training mix — curate, rebalance the
source distribution, and pack the survivors into fixed-token-budget shards.

    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/build_mix.py \
        --input /data/documents.parquet --out /data/mix_v1 \
        [--target-per-source 100000] [--budget 4194304] [--groups 1024] \
        [--near-dup] [--min-words 10] [--sample 0.1]

Stages (each deterministic, so the whole mix is reproducible bit-for-bit):
  1. curate_split       PII redaction + quality + repetition + exact dedup
                        (+ optional near-dup) — jobs/curate.py's pipeline
  2. rebalance          downweight_frequent_groups on `source` (skipped when
                        the input has no source column or no target given)
  3. pack               token-count + pack_sequences into (pack_group,
                        shard_seq) shards of ~--budget tokens

Outputs under --out:
  shards/      parquet partitioned by pack_group: doc_id, text, lang_pred,
               source, n_tokens, shard_seq
  rejected/    doc_id, reject_reason
  manifest.json  mix accounting: per-source and per-language doc/token
               totals, shard count, knobs

Prints ONE JSON summary line."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def mix_documents(
    spark,
    raw,
    out_dir: str,
    *,
    target_per_source: int | None = None,
    budget: int = 4_194_304,
    groups: int = 1024,
    near_dup: bool = False,
    min_words: int = 10,
    sample: float | None = None,
    sample_salt: str = "",
    input_label: str = "<dataframe>",
) -> dict:
    """The mix pipeline over an in-memory documents frame (doc_id, text
    [, source]): curate -> optional per-source rebalance -> token-count ->
    pack into fixed-budget shards under ``out_dir``. Returns the summary
    dict (also written as manifest.json). The CLI below and the
    web_pipeline job both call this."""
    from pyspark.sql import functions as F

    from sparkdoc.filters import curate_split, downweight_frequent_groups, hash_sample, pack_sequences
    from sparkdoc.io import write_text_file

    has_source = "source" in raw.columns
    # Arrow-stage granularity guard: the curate chain is Python-heavy
    # (PII/quality/lang/tokenize pandas kernels), and a compact parquet
    # input can coalesce to as few partitions as there are cores — zero
    # wave slack, so ONE straggler partition owns the wall (measured at
    # 240k docs / 8 cores: 8 input partitions, token_total 47.5 s at 8c vs
    # ~80 s at 2c — a 1.7x on 4x cores). Widen to 4 waves per core; the
    # shuffle moves only (doc_id, text, source) once and is noise next to
    # the per-row Python. At real scale file splitting already yields
    # thousands of partitions and this branch never fires.
    target_part = spark.sparkContext.defaultParallelism * 4
    if raw.rdd.getNumPartitions() < target_part:
        raw = raw.repartition(target_part)
    if has_source:
        # the frame is consumed TWICE (the curate chain and the kept->source
        # join); without the cache the whole upstream lineage — for the web
        # pipeline that is the parquet scan + the markdown-serialization
        # Arrow stage — executes once per consumer
        raw = raw.persist()
    docs = raw.select("doc_id", "text")
    if sample is not None:
        docs = hash_sample(docs, sample, salt=sample_salt)

    kept, rejected = curate_split(
        docs, min_words=min_words, near_dup=near_dup, with_tokens=True
    )
    # grab the cache handles BEFORE the select below re-derives `kept`
    # (DataFrame attributes don't survive reassignment)
    curate_caches = getattr(kept, "_sparkdoc_caches", [])
    kept = kept.select("doc_id", "text", "lang_pred", "n_tokens")
    if has_source:
        kept = kept.join(raw.select("doc_id", "source"), "doc_id")
        if target_per_source is not None:
            kept = downweight_frequent_groups(
                kept, "source", target_per_source, salt="mix"
            )
    else:
        kept = kept.withColumn("source", F.lit("unknown"))

    import time

    from pyspark.sql import Observation

    walls: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        walls[name] = round(time.monotonic() - t0, 3)
        return out

    # persisted: the token_total agg below materializes this frame anyway,
    # and WITHOUT the cache the whole curation tail (dedup anti-joins +
    # source join) re-executes for each of the pack join's two branches and
    # again for the shard write. n_tokens comes from the fused gate pass
    # (curate_split with_tokens=True — value-identical to token_count,
    # pinned by the fused-parity suite), so no extra full-text regex pass
    sized = kept.persist()
    # Adaptive pack-group cap: a group emits at least one shard FILE and one
    # partition-dir commit, so more groups than the token budget can fill
    # with shards is pure metadata waste — at 48k docs / 5.4M tokens /
    # budget 65536 the default 1024 groups paid a 1024-dir commit for ~83
    # natural shards (19.2 s of the 24 s mix wall at 8 cores). One scalar
    # JVM-expr agg over the persisted kept frame buys the right layout at
    # every scale; at the 10^12-doc design point the cap is a no-op and the
    # configured group count stands.
    total_tokens_est = int(
        timed("token_total", lambda: sized.agg(F.sum("n_tokens")).collect()[0][0]) or 0
    )
    groups_eff = max(1, min(groups, -(-total_tokens_est // budget)))
    packed = sized.join(
        pack_sequences(
            sized.select("doc_id", "n_tokens"), budget, n_groups=groups_eff
        ).select("doc_id", "pack_group", "shard_seq"),
        "doc_id",
    )
    # repartition on the partition column first: without it every shuffle
    # partition holds rows of ~every pack_group and the dynamic-partition
    # write emits (shuffle_partitions x n_groups) tiny files — measured 8.1k
    # files / 43 s at 48k docs vs 1 file per group / a fraction of the wall
    # after. Same table content, sane file layout at any scale.
    timed("shards_write", lambda: packed.repartition("pack_group")
          .write.mode("overwrite")
          .partitionBy("pack_group").parquet(os.path.join(out_dir, "shards")))
    # n_rejected rides the write itself (Observation metrics are collected
    # during the job) — the old shape re-read the written parquet in a
    # separate count job, one more rung of the pipeline's serial floor
    obs = Observation("rejected")
    timed("rejected_write", lambda: rejected.observe(obs, F.count(F.lit(1)).alias("n"))
          .write.mode("overwrite").parquet(os.path.join(out_dir, "rejected")))
    n_rejected = int(obs.get["n"])

    shards = spark.read.parquet(os.path.join(out_dir, "shards"))
    # ONE pass for every accounting dimension: the (source, lang) cube rows
    # carry count/tokens AND the cell's distinct shard set, and by_source /
    # by_lang / totals / n_shards all fold from them driver-side — this
    # used to be five separate jobs re-scanning the shard table, then two
    # (cube + a distinct count); now it is one. The per-cell shard sets are
    # bounded by shard count (thousands), not doc count — driver-safe.
    cube = timed("accounting_cube", lambda: (
        shards.groupBy("source", "lang_pred")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.collect_set(F.struct("pack_group", "shard_seq")).alias("cell_shards"),
        )
        .collect()
    ))
    by_source: dict[str, dict[str, int]] = {}
    by_lang: dict[str, int] = {}
    all_shards: set = set()
    for r in cube:
        s = by_source.setdefault(r["source"], {"docs": 0, "tokens": 0})
        s["docs"] += r["docs"]
        s["tokens"] += r["tokens"]
        by_lang[r["lang_pred"]] = by_lang.get(r["lang_pred"], 0) + r["docs"]
        # shards dedup ACROSS cells (a shard packs docs of several
        # sources/langs) — exact, merged driver-side
        all_shards.update((x["pack_group"], x["shard_seq"]) for x in r["cell_shards"])
    summary = {
        "job": "build_mix",
        "input": input_label,
        "n_kept": sum(r["docs"] for r in cube),
        "n_rejected": n_rejected,
        "n_shards": len(all_shards),
        "total_tokens": sum(r["tokens"] for r in cube),
        "by_source": dict(sorted(by_source.items())),
        "by_lang": dict(sorted(by_lang.items())),
        "action_walls_s": walls,
        "knobs": {
            "target_per_source": target_per_source,
            "budget": budget,
            "groups": groups,
            "groups_effective": groups_eff,
            "near_dup": bool(near_dup),
            "min_words": min_words,
            "sample": sample,
        },
    }
    write_text_file(
        spark, os.path.join(out_dir, "manifest.json"),
        json.dumps(summary, indent=2, sort_keys=True),
    )
    if has_source:
        raw.unpersist()
    # both outputs are materialized (shards + rejected written): release the
    # run's caches — `sized` and the curate_split intermediates (ADVICE r5:
    # repeated mix runs in one session accumulated cached frames)
    sized.unpersist()
    for c in curate_caches:
        c.unpersist()
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--target-per-source", type=int, default=None)
    ap.add_argument("--budget", type=int, default=4_194_304, help="tokens per shard")
    ap.add_argument("--groups", type=int, default=1024, help="packing groups")
    ap.add_argument("--near-dup", action="store_true")
    ap.add_argument("--min-words", type=int, default=10)
    ap.add_argument("--sample", type=float, default=None)
    ap.add_argument("--sample-salt", default="")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from sparkdoc.session import get_spark

    spark = get_spark(
        "sparkdoc-build-mix",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    summary = mix_documents(
        spark,
        spark.read.parquet(args.input),
        args.out,
        target_per_source=args.target_per_source,
        budget=args.budget,
        groups=args.groups,
        near_dup=args.near_dup,
        min_words=args.min_words,
        sample=args.sample,
        sample_salt=args.sample_salt,
        input_label=args.input,
    )
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
