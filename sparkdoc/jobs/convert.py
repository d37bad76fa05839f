#!/usr/bin/env python
"""spark-submit entrypoint: documents → extraction graph (the reference's
``docling-graph convert`` command, cli/commands/convert.py:192, re-expressed
as a cluster job).

    spark-submit --driver-memory 16g --py-files sparkdoc.zip sparkdoc/jobs/convert.py \
        --input synth:1000 --out /data/graph --export csv,json,cypher

``--input`` is a parquet path of raw_nodes (FIXTURES.md F2 schema) or
``synth:<n_docs>``. Writes nodes/edges/ledger/coverage/invalid_entities as
parquet under ``--out``, optional CSV/JSON/Cypher exports, and a
``manifest.json`` carrying the template schema hash (the merge job's
strict-template gate, merger.py:291-330). Prints ONE JSON summary line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def template_schema_hash(template: dict) -> str:
    """Stable hash of the template's structural schema (merger.py:291-330
    analog): canonical JSON, first 16 hex of blake2b."""
    blob = json.dumps(template, sort_keys=True, default=str)
    return hashlib.blake2b(blob.encode()).hexdigest()[:16]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="raw_nodes parquet path or synth:<n_docs>")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--fill-cap", type=int, default=8)
    ap.add_argument("--template", help="template JSON file (default: demo template)")
    ap.add_argument(
        "--pydantic-template",
        help="dotted path 'pkg.module:ClassName' of a Pydantic template class "
        "(TemplateLoading stage analog, pipeline/stages.py:250-329) — compiled "
        "via sparkdoc.template.compile_template",
    )
    ap.add_argument(
        "--rules", help="JSON file of discover/fill rule overlays for --pydantic-template"
    )
    ap.add_argument(
        "--extensions",
        help="dotted path 'pkg.module:factory' of a zero-arg callable returning "
        "a sparkdoc.extension.Extensions registry (the reference's plugin "
        "objects, config.py:161-165); slots route into fill/salvage/chunk/alias",
    )
    ap.add_argument(
        "--export", default="",
        help="comma list of extra export formats: csv,json,cypher,report,html",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkdoc.catalog import DEMO_TEMPLATE
    from sparkdoc.extractor import convert_document_graph
    from sparkdoc.graph import validate_graph
    from sparkdoc.session import get_spark

    spark = get_spark("sparkdoc-convert", shuffle_partitions=args.shuffle_partitions)

    template = DEMO_TEMPLATE
    if args.template:
        with open(args.template) as f:
            template = json.load(f)
    elif args.pydantic_template:
        # dotted-path import with cwd fallback (stages.py:250-329 analog)
        import importlib

        sys.path.insert(0, os.getcwd())
        mod_path, _, cls_name = args.pydantic_template.partition(":")
        cls = getattr(importlib.import_module(mod_path), cls_name or "Template")
        rules = None
        if args.rules:
            with open(args.rules) as f:
                rules = json.load(f)
        from sparkdoc.template import compile_template

        template = compile_template(cls, rules=rules)

    extensions = None
    if args.extensions:
        import importlib

        sys.path.insert(0, os.getcwd())
        mod_path, _, fn_name = args.extensions.partition(":")
        extensions = getattr(importlib.import_module(mod_path), fn_name or "make_extensions")()

    if args.input.startswith("synth:"):
        from sparkdoc.synth import raw_nodes_df

        raw = raw_nodes_df(spark, int(args.input.split(":", 1)[1]), args.seed)
    else:
        raw = spark.read.parquet(args.input)

    out = convert_document_graph(
        raw, template=template, fill_cap=args.fill_cap, extensions=extensions
    )

    counts: dict[str, int] = {}
    for name in ("nodes", "edges", "ledger", "coverage", "invalid_entities", "alias_audit"):
        df = out[name]
        # ledger/coverage carry nested columns — parquet handles them natively
        df.write.mode("overwrite").parquet(os.path.join(args.out, name))
        counts[name] = spark.read.parquet(os.path.join(args.out, name)).count()

    # validate/summarize/export from the WRITTEN parquet, not the live DAG:
    # each extra action on `out` re-schedules the (checkpoint-truncated but
    # still many-stage) pipeline plan; the files are the same rows for the
    # cost of a scan. Exports below reuse these too.
    out = {
        **out,
        "nodes": spark.read.parquet(os.path.join(args.out, "nodes")),
        "edges": spark.read.parquet(os.path.join(args.out, "edges")),
        "coverage": spark.read.parquet(os.path.join(args.out, "coverage")),
    }
    validation = validate_graph(out["nodes"], out["edges"])
    mean_cov = out["coverage"].agg(F.avg("coverage").alias("c")).first()["c"]

    exports = [x for x in args.export.split(",") if x]
    report_done = False
    for fmt in exports:
        if fmt == "csv":
            from sparkdoc.io import export_csv

            export_csv(out["nodes"], out["edges"], os.path.join(args.out, "export_csv"))
        elif fmt == "json":
            from sparkdoc.io import export_json

            export_json(out["nodes"], out["edges"], os.path.join(args.out, "export_json"))
        elif fmt == "cypher":
            from sparkdoc.io import export_cypher

            export_cypher(out["nodes"], out["edges"], os.path.join(args.out, "graph.cypher"))
        elif fmt in ("report", "html"):
            from sparkdoc.report import export_report_and_html

            if not report_done:
                # counts from the WRITTEN parquet — counting the live
                # entities/ledger DAGs would re-run the pipeline per table
                export_report_and_html(out, args.out, counts=counts)
                report_done = True  # report+html written together once per run

    manifest = {
        "template_schema_hash": template_schema_hash(template),
        "fill_cap": args.fill_cap,
        "input": args.input,
        "counts": counts,
    }
    # via the Hadoop FS API: --out may be hdfs://|s3a:// on a cluster — the
    # manifest must land next to the parquet, not on the driver's local disk
    from sparkdoc.io import write_text_file

    write_text_file(
        spark, os.path.join(args.out, "manifest.json"),
        json.dumps(manifest, indent=2, sort_keys=True),
    )

    print(
        json.dumps(
            {
                "job": "convert",
                "counts": counts,
                "validation": validation,
                "mean_coverage": round(mean_cov, 6) if mean_cov is not None else None,
                "exports": exports,
                "template_schema_hash": manifest["template_schema_hash"],
            },
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
