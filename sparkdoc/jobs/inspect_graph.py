#!/usr/bin/env python
"""spark-submit entrypoint: inspect a graph export (the reference's
``docling-graph inspect`` command, cli/commands/inspect.py:15).

    spark-submit --py-files sparkdoc.zip sparkdoc/jobs/inspect_graph.py --graph /data/g1

Reads a convert.py/merge.py output dir and prints ONE JSON line: validation
report + per-class node counts, per-label edge counts, degree stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True, help="convert.py / merge.py output dir")
    args = ap.parse_args()

    from sparkdoc.graph import graph_stats, validate_graph
    from sparkdoc.session import get_spark

    spark = get_spark("sparkdoc-inspect", shuffle_partitions=8)
    nodes = spark.read.parquet(os.path.join(args.graph, "nodes"))
    edges = spark.read.parquet(os.path.join(args.graph, "edges"))

    stats = {
        (r["metric"], r["key"]): r["value"] for r in graph_stats(nodes, edges).collect()
    }
    report = {
        "job": "inspect",
        "graph": args.graph,
        "validation": validate_graph(nodes, edges),
        "stats": {f"{m}:{k}" if k else m: v for (m, k), v in sorted(stats.items())},
    }
    from sparkdoc.io import read_text_file

    mtext = read_text_file(spark, os.path.join(args.graph, "manifest.json"))
    if mtext:
        report["template_schema_hash"] = json.loads(mtext).get("template_schema_hash")
    print(json.dumps(report, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
