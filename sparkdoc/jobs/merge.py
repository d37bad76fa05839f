#!/usr/bin/env python
"""spark-submit entrypoint: N-way graph merge (the reference's
``docling-graph merge`` command, cli/commands/merge.py:27, as a cluster job).

    spark-submit --driver-memory 16g --py-files sparkdoc.zip sparkdoc/jobs/merge.py \
        --inputs /data/g1,/data/g2 --out /data/merged \
        --precedence richest --conflicts keep_all

Each input dir is a convert.py output (nodes/ edges/ parquet, optional
ledger/, manifest.json with the template schema hash). The strict template
gate refuses inputs extracted under different template schemas unless
``--no-strict`` (merger.py:291-330). Prints ONE JSON merge report line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", required=True, help="comma list of convert.py output dirs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--precedence", choices=["input_order", "richest"], default="input_order")
    ap.add_argument("--conflicts", choices=["keep_first", "keep_all", "variants"], default="keep_first")
    ap.add_argument("--no-strict", action="store_true", help="skip the template-schema-hash gate")
    ap.add_argument("--no-skolemize", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    from sparkdoc.merge import MergePolicy, merge_graphs_policy
    from sparkdoc.session import get_spark

    spark = get_spark("sparkdoc-merge", shuffle_partitions=args.shuffle_partitions)

    # Hadoop-FS probes/reads: input dirs may be hdfs://|s3a:// on a cluster
    from sparkdoc.io import fs_is_dir, read_text_file

    dirs = [d for d in args.inputs.split(",") if d]
    inputs, ledgers, hashes = [], [], []
    for d in dirs:
        nodes = spark.read.parquet(os.path.join(d, "nodes"))
        edges = spark.read.parquet(os.path.join(d, "edges"))
        inputs.append((nodes, edges))
        ledger_path = os.path.join(d, "ledger")
        ledgers.append(spark.read.parquet(ledger_path) if fs_is_dir(spark, ledger_path) else None)
        mtext = read_text_file(spark, os.path.join(d, "manifest.json"))
        hashes.append(json.loads(mtext).get("template_schema_hash", "") if mtext else "")

    policy = MergePolicy(
        precedence=args.precedence,
        conflicts=args.conflicts,
        strict_template_check=not args.no_strict,
    )
    if not args.no_strict:
        # strict means strict: an input with no manifest/template hash can't
        # prove it was extracted under the same template — refusing it here
        # closes the hole where filtering empty hashes out of the comparison
        # silently passed unverifiable inputs (merger.py:291-330 gate intent)
        missing = [d for d, h in zip(dirs, hashes) if not h]
        if missing:
            sys.exit(
                "strict template gate: missing manifest.json/template_schema_hash "
                f"for inputs {missing}; pass --no-strict to merge unverified inputs"
            )
    # ledgers stay INDEX-ALIGNED with inputs (None = no sidecar); the policy
    # merge skips missing entries rather than dropping everyone's provenance
    ledgerless = [d for d, l in zip(dirs, ledgers) if l is None]
    out = merge_graphs_policy(
        inputs,
        policy=policy,
        schema_hashes=[h for h in hashes if h] or None,
        ledgers=ledgers if any(l is not None for l in ledgers) else None,
        skolemize=not args.no_skolemize,
    )

    counts: dict[str, int] = {}
    for name in ("nodes", "edges", "conflicts", "skolemized", "ledger"):
        df = out.get(name)
        if df is None:
            continue
        df.write.mode("overwrite").parquet(os.path.join(args.out, name))
        counts[name] = spark.read.parquet(os.path.join(args.out, name)).count()

    report = dict(out.get("report") or {})
    report.update(
        {
            "job": "merge",
            "inputs": dirs,
            "precedence": args.precedence,
            "conflicts_policy": args.conflicts,
            "counts": counts,
        }
    )
    if ledgerless and len(ledgerless) < len(dirs):
        report.setdefault("warnings", []).append(
            f"no ledger sidecar for inputs {ledgerless}: merged ledger covers "
            "the remaining inputs only (exact provenance binds lost for these)"
        )
    from sparkdoc.io import write_text_file

    write_text_file(
        spark, os.path.join(args.out, "merge_report.json"),
        json.dumps(report, indent=2, sort_keys=True, default=str),
    )
    print(json.dumps(report, sort_keys=True, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
