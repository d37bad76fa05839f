"""Span emission — the golden-surface extract pipeline.

raw_nodes ──classify (exprs)──> bbox normalize (expr) ──groupBy(doc_id)
  .applyInPandas──> documents(doc_id, spans) with per-document invariant:
span-sequence equality on (kind, text, media_ref, order) vs the single-node
golden extractor (golden.py).

Sequence-dependent logic (XY-cut ordering, page-break insertion, offset
assignment, repeated-text furniture detection) runs in ONE per-document
pandas UDF — a single shuffle on doc_id for the whole pipeline. Everything
upstream is whole-stage-codegen exprs; nothing downstream reshuffles.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.clean import classify_raw_nodes
from sparkdoc.layout import normalize_bbox, xy_cut_order
from sparkdoc.schemas import DOCUMENTS

#: identical text on >= this many distinct pages ⇒ furniture
#: (reference analog: furniture exclusion, dense/orchestrator.py:127-144)
REPEAT_FURNITURE_PAGES = 3


def assemble_spans(nodes: Iterable[dict]) -> list[dict]:
    """Order classified nodes of ONE document into the final span sequence.

    Input dicts need: node_id, kind, text, media_ref, page_no,
    bbox (normalized TOPLEFT [l,t,r,b]). Pure function — used by the Spark
    per-doc UDF; the golden extractor reimplements this loop independently.
    """
    rows = sorted(nodes, key=lambda r: r["node_id"])  # deterministic tie-break
    # repeated-text furniture: same text on >= REPEAT_FURNITURE_PAGES pages
    pages_by_text: dict[str, set[int]] = {}
    for r in rows:
        if r["kind"] == "text":
            pages_by_text.setdefault(r["text"], set()).add(r["page_no"])
    repeated = {t for t, ps in pages_by_text.items() if len(ps) >= REPEAT_FURNITURE_PAGES}

    by_page: dict[int, list[dict]] = {}
    for r in rows:
        by_page.setdefault(r["page_no"], []).append(r)

    spans: list[dict] = []
    offset = 0
    pages = sorted(by_page)
    for pi, page in enumerate(pages):
        if pi > 0:
            spans.append(
                {"kind": "page_break", "text": "", "media_ref": "", "offset": offset}
            )
            offset += 1
        group = by_page[page]
        boxes = [tuple(r["bbox"]) for r in group]
        for i in xy_cut_order(boxes):
            r = group[i]
            kind = "furniture" if (r["kind"] == "text" and r["text"] in repeated) else r["kind"]
            spans.append(
                {
                    "kind": kind,
                    "text": r["text"],
                    "media_ref": r["media_ref"],
                    "offset": offset,
                }
            )
            offset += 1
    return spans


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    doc_id = pdf["doc_id"].iloc[0]
    nodes = pdf.to_dict("records")
    return pd.DataFrame([{"doc_id": doc_id, "spans": assemble_spans(nodes)}])


def extract_documents(raw_nodes: DataFrame) -> DataFrame:
    """raw_nodes → documents(doc_id, spans). One shuffle (groupBy doc_id)."""
    df = classify_raw_nodes(raw_nodes)
    df = df.withColumn(
        "bbox",
        normalize_bbox(F.col("bbox"), F.col("coord_origin"), F.col("page_height")),
    )
    sel = df.select("doc_id", "node_id", "kind", "text", "media_ref", "page_no", "bbox")
    return sel.groupBy("doc_id").applyInPandas(_assemble_group, schema=DOCUMENTS)


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents → one row per span (doc_id, kind, text, media_ref, offset)."""
    return documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")
