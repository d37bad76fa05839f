#!/usr/bin/env python
"""spark-submit entrypoint: score an extraction run against ground truth
(the reference's evaluation scripts,
docs/examples/scripts/16_extraction_evaluation.py + 17_benchmark_aggregate.py,
restated as corpus-scale DataFrame jobs — sparkdoc/evaluate.py).

    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/evaluate.py \
        --truth /data/truth_graph --got /data/run_graph \
        --template template.json --out /data/eval

``--truth`` / ``--got`` are convert.py/merge.py output dirs (nodes/edges
parquet). Identity fields come from ``--template`` (the same template JSON
convert.py takes; per-class id_fields are compiled via the NodeCatalog) or
inline ``--id-fields '{"Class": ["field", ...]}'``. Writes
node_metrics / edge_metrics / completeness / fanout / integrity / rollup
parquet under ``--out`` and prints ONE JSON summary line (micro P/R/F1 per
rung over all classes, edge micro, integrity totals).

Doc attribution note: convert.py's edges table drops doc_id at the output
boundary (post-dedup graphs are corpus-level), so this job re-attributes
each edge to its SOURCE node's document (min doc_id when a cross-document
deduped node merged several). Truth/got pairs produced per document — the
reference's own granularity — round-trip exactly.

``--granularity doc`` (default) keeps that per-document scoring. For
merge.py outputs — or any graph where cross-document dedup means a node's
row-document and an edge's source-document can disagree — pass
``--granularity corpus``: doc_id collapses to one corpus-level group, so
identity matching, edge keys and the orphan check are document-agnostic
and a fully connected graph can never miscount orphans through
attribution skew.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def _id_fields_from_template(path: str) -> dict[str, list[str]]:
    from sparkdoc.catalog import build_node_catalog

    with open(path) as f:
        template = json.load(f)
    cat = build_node_catalog(template, include_references=True)
    out: dict[str, list[str]] = {}
    for spec in cat.nodes:
        if spec.id_fields and spec.node_type not in out:
            out[spec.node_type] = list(spec.id_fields)
    return out


def _load_graph(spark, d: str, granularity: str = "doc"):
    """convert.py output dir → (nodes, edges) in evaluate's shape:
    nodes (doc_id, class, node_id, ids, attrs); edges (doc_id, src, dst,
    label). Under ``doc`` granularity the edge doc is re-attributed from
    the source node; under ``corpus`` every doc_id collapses to '' (one
    corpus-level group — the right mode when cross-document dedup makes
    per-node document attribution ambiguous)."""
    from pyspark.sql import functions as F

    raw = spark.read.parquet(os.path.join(d, "nodes"))
    doc_col = (
        F.lit("") if granularity == "corpus" else F.coalesce("doc_id", F.lit(""))
    )
    nodes = raw.select(
        doc_col.alias("doc_id"),
        F.col("node_class").alias("class"),
        "node_id",
        # the attrs map carries id-field values with ids-first precedence
        # (graph.py nodes pass), so it serves as the ids lookup too
        F.col("attrs").alias("ids"),
        "attrs",
    )
    raw_edges = spark.read.parquet(os.path.join(d, "edges"))
    if granularity == "corpus":
        edges = raw_edges.select(F.lit("").alias("doc_id"), "src", "dst", "label")
    else:
        doc_of = nodes.groupBy("node_id").agg(F.min("doc_id").alias("src_doc"))
        edges = (
            raw_edges.join(doc_of, F.col("src") == F.col("node_id"), "left")
            .select(
                F.coalesce("src_doc", F.lit("")).alias("doc_id"),
                "src", "dst", "label",
            )
        )
    return nodes, edges


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--truth", required=True, help="ground-truth graph dir (convert.py layout)")
    ap.add_argument("--got", required=True, help="extraction-run graph dir (convert.py layout)")
    ap.add_argument("--template", help="template JSON (id fields compiled via NodeCatalog)")
    ap.add_argument("--id-fields", help='inline JSON {"Class": ["field", ...]}')
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--granularity",
        choices=["doc", "corpus"],
        default="doc",
        help="doc = per-document scoring (reference granularity); corpus = "
        "document-agnostic (use for merge.py / cross-doc-deduped graphs)",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    if bool(args.template) == bool(args.id_fields):
        ap.error("exactly one of --template / --id-fields is required")
    id_fields = (
        _id_fields_from_template(args.template)
        if args.template
        else json.loads(args.id_fields)
    )
    if not isinstance(id_fields, dict) or not id_fields:
        ap.error("id_fields resolved empty — template declares no id-bearing class")
    # a string value would iterate per CHARACTER downstream and silently
    # score 0.0 everywhere — reject anything but non-empty lists of strings
    for cls, fields in id_fields.items():
        if (
            not isinstance(fields, (list, tuple))
            or not fields
            or not all(isinstance(x, str) and x for x in fields)
        ):
            ap.error(
                f"id_fields[{cls!r}] must be a non-empty list of field-name "
                f"strings, got {fields!r}"
            )

    from sparkdoc.evaluate import (
        _node_match,
        attribute_completeness,
        edge_fanout,
        eval_edges,
        eval_nodes,
        eval_rollup,
        integrity_stats,
        node_identity_keys,
    )
    from sparkdoc.session import get_spark

    spark = get_spark("sparkdoc-evaluate", shuffle_partitions=args.shuffle_partitions)
    truth_nodes, truth_edges = _load_graph(spark, args.truth, args.granularity)
    got_nodes, got_edges = _load_graph(spark, args.got, args.granularity)

    # ONE node-level key build per graph and ONE match subtree, shared by
    # every table — these are the dominant shuffles (key build + strict
    # semi/anti + relaxed pairing over both graphs); recomputing them per
    # table multiplied the job's cost ~4x. PERSISTED: each table write is
    # its own Spark action, so plan-level sharing alone would still
    # re-execute the subtrees.
    tkn = node_identity_keys(truth_nodes, id_fields).persist()
    gkn = node_identity_keys(got_nodes, id_fields).persist()
    match = tuple(
        df.persist()
        for df in _node_match(truth_nodes, got_nodes, id_fields, keyed=(tkn, gkn))
    )
    tables = {
        "node_metrics": eval_nodes(truth_nodes, got_nodes, id_fields, match=match),
        "edge_metrics": eval_edges(
            truth_nodes, got_nodes, truth_edges, got_edges, id_fields,
            match=match, keyed=(tkn, gkn),
        ),
        "completeness": attribute_completeness(
            truth_nodes, got_nodes, id_fields, match=match
        ),
        "fanout": edge_fanout(got_edges, got_nodes, id_fields, node_keys=gkn),
        "integrity": integrity_stats(got_nodes, got_edges, id_fields, node_keys=gkn),
    }
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(args.out, name))
    # rollup from the WRITTEN node_metrics (repo convention: summarize the
    # parquet, not the live DAG — see convert.py), not a 4th match re-run
    eval_rollup(
        spark.read.parquet(os.path.join(args.out, "node_metrics"))
    ).write.mode("overwrite").parquet(os.path.join(args.out, "rollup"))

    from pyspark.sql import functions as F

    def micro(df, rung):
        row = df.agg(
            F.sum(f"tp_{rung}").alias("tp"),
            F.sum(f"fp_{rung}").alias("fp"),
            F.sum(f"fn_{rung}").alias("fn"),
        ).collect()[0]
        tp, fp, fn = (row["tp"] or 0, row["fp"] or 0, row["fn"] or 0)
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        return {"tp": tp, "fp": fp, "fn": fn,
                "p": round(p, 6), "r": round(r, 6), "f1": round(f1, 6)}

    nm = spark.read.parquet(os.path.join(args.out, "node_metrics"))
    em = spark.read.parquet(os.path.join(args.out, "edge_metrics"))
    integ = spark.read.parquet(os.path.join(args.out, "integrity")).agg(
        F.sum("node_n").alias("nodes"),
        F.sum("empty_identity_n").alias("empty_identity"),
        F.sum("orphan_n").alias("orphans"),
        F.sum("unkeyed_n").alias("unkeyed"),
    ).collect()[0]
    summary = {
        "nodes_strict": micro(nm, "strict"),
        "nodes_relaxed": micro(nm, "relaxed"),
        "edges_strict": micro(em, "strict"),
        "edges_relaxed": micro(em, "relaxed"),
        "integrity": {
            "nodes": int(integ["nodes"] or 0),
            "empty_identity_nodes": int(integ["empty_identity"] or 0),
            "orphan_nodes": int(integ["orphans"] or 0),
            "unkeyed_nodes": int(integ["unkeyed"] or 0),
        },
        "out": args.out,
    }
    print(json.dumps(summary, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
