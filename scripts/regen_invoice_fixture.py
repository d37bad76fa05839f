#!/usr/bin/env python
"""Regenerate tests/fixtures/golden_invoice_seed42_n12.json.gz — the pinned
output of convert_document_graph over the compiled Pydantic invoice template
(sparkdoc/template.py acceptance case). Run deliberately when the pipeline
spec changes; the pin is compared exactly by tests and the driver gate."""

from __future__ import annotations

import gzip
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests", "fixtures"))


def main() -> None:
    from invoice_template import INVOICE_RULES, InvoiceDoc

    from sparkdoc.extractor import convert_document_graph
    from sparkdoc.session import get_spark
    from sparkdoc.synth import invoice_nodes_df
    from sparkdoc.template import compile_template

    spark = get_spark("regen-invoice-fixture", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    template = compile_template(InvoiceDoc, rules=INVOICE_RULES)
    out = convert_document_graph(invoice_nodes_df(spark, 12, 42, partitions=2), template=template)
    nodes = sorted(
        (r["node_id"], r["doc_id"], r["node_class"], r["label"],
         json.dumps(dict(r["attrs"] or {}), sort_keys=True))
        for r in out["nodes"].collect()
    )
    edges = sorted((r["src"], r["dst"], r["label"]) for r in out["edges"].collect())
    path = os.path.join(ROOT, "tests", "fixtures", "golden_invoice_seed42_n12.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump({"nodes": [list(n) for n in nodes], "edges": [list(e) for e in edges]}, f)
    print(f"wrote {path}: {len(nodes)} nodes, {len(edges)} edges")
    spark.stop()


if __name__ == "__main__":
    main()
