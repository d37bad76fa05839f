"""Span emission — the golden-surface extract pipeline.

raw_nodes ──classify (exprs)──> bbox normalize (expr)
  ──repartition(doc_id) + sortWithinPartitions(doc_id, node_id)
  ──mapInPandas streaming assembly──> documents(doc_id, spans)

Per-document invariant: span-sequence equality on (kind, text, media_ref,
order) vs the single-node golden extractor (golden.py).

Why mapInPandas and not groupBy().applyInPandas: applyInPandas pays a
per-GROUP Arrow round-trip + pandas-DataFrame construction (~5 ms/doc —
measured 19 s for 4 000 docs where the actual assembly work is 0.3 s).
Hash-repartitioning on doc_id co-locates each document, the partition-local
sort makes its rows contiguous, and the streaming UDF assembles EVERY doc in
an Arrow batch in one Python call, buffering only the possibly-split
trailing document across batch boundaries. Same single shuffle, ~10×
throughput.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.clean import classify_raw_nodes
from sparkdoc.layout import normalize_bbox, xy_cut_order
from sparkdoc.schemas import DOCUMENTS

#: identical text on >= this many distinct pages ⇒ furniture
#: (reference analog: furniture exclusion, dense/orchestrator.py:127-144)
REPEAT_FURNITURE_PAGES = 3


def _assemble_doc(kind, text, media_ref, page_no, bbox) -> list[dict]:
    """Column arrays of ONE document (already node_id-sorted) → span dicts."""
    # repeated-text furniture: same text on >= REPEAT_FURNITURE_PAGES pages
    pages_by_text: dict[str, set] = {}
    for k, t, pg in zip(kind, text, page_no):
        if k == "text":
            s = pages_by_text.get(t)
            if s is None:
                pages_by_text[t] = {pg}
            else:
                s.add(pg)
    repeated = {t for t, ps in pages_by_text.items() if len(ps) >= REPEAT_FURNITURE_PAGES}

    by_page: dict[int, list[int]] = {}
    for i, pg in enumerate(page_no):
        by_page.setdefault(pg, []).append(i)

    spans: list[dict] = []
    offset = 0
    for pi, page in enumerate(sorted(by_page)):
        if pi > 0:
            spans.append({"kind": "page_break", "text": "", "media_ref": "", "offset": offset})
            offset += 1
        idx = by_page[page]
        boxes = [tuple(bbox[i]) for i in idx]
        for j in xy_cut_order(boxes):
            i = idx[j]
            k = kind[i]
            if k == "text" and text[i] in repeated:
                k = "furniture"
            spans.append({"kind": k, "text": text[i], "media_ref": media_ref[i], "offset": offset})
            offset += 1
    return spans


def assemble_spans(nodes: Iterable[dict]) -> list[dict]:
    """Dict-rows convenience wrapper (tests / golden comparisons)."""
    rows = sorted(nodes, key=lambda r: r["node_id"])
    return _assemble_doc(
        [r["kind"] for r in rows],
        [r["text"] for r in rows],
        [r["media_ref"] for r in rows],
        [r["page_no"] for r in rows],
        [r["bbox"] for r in rows],
    )


def _assemble_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    ids = pdf["doc_id"].to_numpy()
    kind = pdf["kind"].to_numpy()
    text = pdf["text"].to_numpy()
    media = pdf["media_ref"].to_numpy()
    page = pdf["page_no"].to_numpy()
    bbox = pdf["bbox"].to_numpy()
    change = np.flatnonzero(ids[1:] != ids[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(ids)]))
    out_ids = []
    out_spans = []
    for s, e in zip(starts, ends):
        out_ids.append(ids[s])
        out_spans.append(
            _assemble_doc(kind[s:e], text[s:e], media[s:e], page[s:e], bbox[s:e])
        )
    return pd.DataFrame({"doc_id": out_ids, "spans": out_spans})


def _assemble_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Streaming per-partition assembly. Rows arrive sorted by
    (doc_id, node_id); only the trailing (possibly batch-split) document is
    buffered across Arrow batches — O(one doc) memory."""
    pending: pd.DataFrame | None = None
    for pdf in batches:
        if pending is not None and len(pending):
            pdf = pd.concat([pending, pdf], ignore_index=True)
        if not len(pdf):
            continue
        ids = pdf["doc_id"].to_numpy()
        first_of_last = int((ids == ids[-1]).argmax())
        work = pdf.iloc[:first_of_last]
        pending = pdf.iloc[first_of_last:]
        if len(work):
            yield _assemble_batch(work)
    if pending is not None and len(pending):
        yield _assemble_batch(pending)


def extract_documents(raw_nodes: DataFrame) -> DataFrame:
    """raw_nodes → documents(doc_id, spans). One shuffle (repartition by
    doc_id); assembly is batch-streamed, never per-group."""
    df = classify_raw_nodes(raw_nodes)
    df = df.withColumn(
        "bbox",
        normalize_bbox(F.col("bbox"), F.col("coord_origin"), F.col("page_height")),
    )
    sel = df.select("doc_id", "node_id", "kind", "text", "media_ref", "page_no", "bbox")
    part = sel.repartition("doc_id").sortWithinPartitions("doc_id", "node_id")
    return part.mapInPandas(_assemble_stream, schema=DOCUMENTS)


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents → one row per span (doc_id, kind, text, media_ref, offset)."""
    return documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


GEO_SPAN_ROWS_SCHEMA = (
    "doc_id string, offset int, kind string, text string, media_ref string, "
    "page_no int, bbox array<int>, page_width int, page_height int"
)


def extract_span_rows_geo(raw_nodes: DataFrame) -> DataFrame:
    """Exploded ordered span rows WITH geometry (for the DocLang-style
    serialization view; the nested DOCUMENTS table stays the golden shape).
    Same single-shuffle streaming assembly; offsets match extract_documents
    byte-exact (page_breaks are skipped here but consume an offset, exactly
    as in assemble)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf["doc_id"].to_numpy()
            change = np.flatnonzero(ids[1:] != ids[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(ids)]))
            cols = {c: pdf[c].to_numpy() for c in pdf.columns}
            rows = []
            for s, e in zip(starts, ends):
                # repeated-text furniture rule: identical to _assemble_doc
                pages_by_text: dict[str, set] = {}
                for i in range(s, e):
                    if cols["kind"][i] == "text":
                        pages_by_text.setdefault(cols["text"][i], set()).add(int(cols["page_no"][i]))
                repeated = {
                    t for t, ps in pages_by_text.items() if len(ps) >= REPEAT_FURNITURE_PAGES
                }
                by_page: dict[int, list[int]] = {}
                for i in range(s, e):
                    by_page.setdefault(int(cols["page_no"][i]), []).append(i)
                offset = 0
                for pi, page in enumerate(sorted(by_page)):
                    if pi > 0:
                        offset += 1  # page_break consumes an offset
                    idx = by_page[page]
                    order = xy_cut_order([tuple(cols["bbox"][i]) for i in idx])
                    for j in order:
                        i = idx[j]
                        k = cols["kind"][i]
                        if k == "text" and cols["text"][i] in repeated:
                            k = "furniture"
                        rows.append(
                            {
                                "doc_id": ids[s],
                                "offset": offset,
                                "kind": k,
                                "text": cols["text"][i],
                                "media_ref": cols["media_ref"][i],
                                "page_no": page,
                                "bbox": list(cols["bbox"][i]),
                                "page_width": int(cols["page_width"][i]),
                                "page_height": int(cols["page_height"][i]) if cols["page_height"][i] is not None else 0,
                            }
                        )
                        offset += 1
            return pd.DataFrame(rows)

        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy()
            first_of_last = int((ids == ids[-1]).argmax())
            work = pdf.iloc[:first_of_last]
            pending = pdf.iloc[first_of_last:]
            if len(work):
                out = emit(work)
                if len(out):
                    yield out
        if pending is not None and len(pending):
            out = emit(pending)
            if len(out):
                yield out

    df = classify_raw_nodes(raw_nodes)
    df = df.withColumn(
        "bbox",
        normalize_bbox(F.col("bbox"), F.col("coord_origin"), F.col("page_height")),
    )
    sel = df.select(
        "doc_id", "node_id", "kind", "text", "media_ref", "page_no", "bbox",
        "page_width", "page_height",
    )
    part = sel.repartition("doc_id").sortWithinPartitions("doc_id", "node_id")
    return part.mapInPandas(gen, schema=GEO_SPAN_ROWS_SCHEMA)
