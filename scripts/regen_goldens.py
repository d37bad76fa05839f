#!/usr/bin/env python
"""Regenerate ALL chunk-derived committed golden fixtures in one pass —
run deliberately after a chunking/tokenizer/pipeline spec change:

  golden_chunks_seed42_n32   chunker pin (test_chunker + chunks_pinned)
  golden_graph_seed42_n32    whole-pipeline pin (test_extractor + graph_pinned)
  golden_ledger_seed42_n32   ledger pin (test_provenance + ledger_pinned)
  golden_fill_seed42_n64     fill-phase pin (fill_pinned)
  golden_onetoone_seed42_n64 one-to-one pin (one_to_one_pinned)
  golden_invoice_seed42_n12  Pydantic-template pin (template_graph_pinned)
  golden_chunks_main_*       full-corpus chunker pin (chunk_documents gate)
  golden_ledger_main_*       full-corpus ledger pin (provenance_ledger gate)
  golden_chunk_owner_main_*  full-corpus owner pin (chunk_owner gate)

Span-level fixtures (golden_spans_*) do not depend on token budgets and are
regenerated separately via sparkdoc.golden if the SPAN spec changes."""

from __future__ import annotations

import gzip
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests", "fixtures"))

FIX = os.path.join(ROOT, "tests", "fixtures")


def _write(name: str, payload) -> None:
    path = os.path.join(FIX, name)
    with gzip.open(path, "wt") as f:
        json.dump(payload, f)
    n = len(payload["nodes"]) + len(payload["edges"]) if isinstance(payload, dict) else len(payload)
    print(f"wrote {name}: {n} rows")


def main() -> None:
    from pyspark.sql import functions as F

    from sparkdoc.chunker import chunk_documents
    from sparkdoc.dedup import with_node_ids
    from sparkdoc.extractor import convert_document_graph
    from sparkdoc.provenance import build_ledger
    from sparkdoc.session import get_spark
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import raw_nodes_df

    spark = get_spark("regen-goldens", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- chunks (test_chunker encoding) ----
    ch = chunk_documents(extract_documents(raw_nodes_df(spark, 32, 42, partitions=4)))
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["batch_index"], r["text"], r["token_count"],
         json.dumps(list(r["page_numbers"])), json.dumps(list(r["doc_item_refs"])),
         json.dumps(list(r["headings"])), r["text_hash"], r["char_length"],
         r["resplit_of"] if r["resplit_of"] is not None else -1)
        for r in ch.collect()
    )
    _write("golden_chunks_seed42_n32.json.gz", [list(r) for r in rows])

    # ---- graph (test_extractor encoding) ----
    out = convert_document_graph(raw_nodes_df(spark, 32, 42, partitions=4))
    nodes = sorted(
        (r["node_id"], r["doc_id"], r["node_class"], r["label"],
         json.dumps(dict(r["attrs"] or {}), sort_keys=True))
        for r in out["nodes"].collect()
    )
    edges = sorted((r["src"], r["dst"], r["label"]) for r in out["edges"].collect())
    _write("golden_graph_seed42_n32.json.gz",
           {"nodes": [list(n) for n in nodes], "edges": [list(e) for e in edges]})

    # ---- ledger (test_provenance encoding) ----
    docs = extract_documents(raw_nodes_df(spark, 32, 42, partitions=4))
    chunks = chunk_documents(docs)
    spans = explode_spans(docs)
    entities = spans.filter(F.col("kind") == "heading").select(
        "doc_id",
        F.lit("sections[]").alias("path"),
        F.lit("Section").alias("class"),
        F.create_map(F.lit("name"), F.regexp_replace(F.col("text"), "^#+\\s*", "")).alias("ids"),
        F.create_map().cast("map<string,string>").alias("fields"),
        F.array().cast("array<int>").alias("chunk_ids"),
    )
    led = build_ledger(with_node_ids(entities), chunks)
    lrows = sorted(
        (r["doc_id"], r["identity_key"], r["path"],
         json.dumps(dict(r["ids"] or {}), sort_keys=True),
         json.dumps([[a["chunk_id"], a["kind"], list(a["span"])] for a in r["anchors"]]))
        for r in led.collect()
    )
    _write("golden_ledger_seed42_n32.json.gz", [list(r) for r in lrows])

    # ---- fill + one-to-one (the gate query functions ARE the encoding) ----
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry

    fill = entry._fill_pinned(spark, "")
    frows = sorted(tuple(r) for r in fill.collect())
    _write("golden_fill_seed42_n64.json.gz", [list(r) for r in frows])

    oto = entry._one_to_one_pinned(spark, "")
    orows = sorted(tuple(r) for r in oto.collect())
    _write("golden_onetoone_seed42_n64.json.gz", [list(r) for r in orows])

    # ---- invoice template pin ----
    from invoice_template import INVOICE_RULES, InvoiceDoc

    from sparkdoc.synth import invoice_nodes_df
    from sparkdoc.template import compile_template

    template = compile_template(InvoiceDoc, rules=INVOICE_RULES)
    iout = convert_document_graph(invoice_nodes_df(spark, 12, 42, partitions=2), template=template)
    inodes = sorted(
        (r["node_id"], r["doc_id"], r["node_class"], r["label"],
         json.dumps(dict(r["attrs"] or {}), sort_keys=True))
        for r in iout["nodes"].collect()
    )
    iedges = sorted((r["src"], r["dst"], r["label"]) for r in iout["edges"].collect())
    _write("golden_invoice_seed42_n12.json.gz",
           {"nodes": [list(n) for n in inodes], "edges": [list(e) for e in iedges]})

    # ---- r5 main-gate drift pins over the FULL SYNTH_DOCS gate corpus ----
    # (the gate query functions ARE the encoding; fixtures feed the VALUES
    # oracles that make chunk_documents / provenance_ledger / chunk_owner
    # oracle-exact in the driver gate)
    for gate, fixture in [
        ("chunk_documents",
         f"golden_chunks_main_seed{entry.SYNTH_SEED}_n{entry.SYNTH_DOCS}.json.gz"),
        ("provenance_ledger",
         f"golden_ledger_main_seed{entry.SYNTH_SEED}_n{entry.SYNTH_DOCS}.json.gz"),
        ("chunk_owner",
         f"golden_chunk_owner_main_seed{entry.SYNTH_SEED}_n{entry.SYNTH_DOCS}.json.gz"),
    ]:
        df = entry.queries()[gate](spark, "")
        rows = sorted(tuple(r) for r in df.collect())
        _write(fixture, [list(r) for r in rows])

    from sparkdoc.wordpiece import default_tokenizer

    print(f"tokenizer vocab hash: {default_tokenizer().hash}")
    spark.stop()


if __name__ == "__main__":
    main()
