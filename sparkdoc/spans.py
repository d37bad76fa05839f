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


def _assemble_doc_flat(kind, text, media_ref, page_no, bbox, ok: list, ot: list, om: list) -> int:
    """Column arrays of ONE document (already node_id-sorted) → spans appended
    to the FLAT output lists (kind/text/media). Returns the span count; the
    offset of each span is its index within the document (page_breaks consume
    one), so callers materialize offsets as an arange — no per-span dicts.
    This columnar form is what lets the Arrow stage below skip the
    python-object → Arrow conversion that dominated round-1 extract cost."""
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

    n0 = len(ok)
    for pi, page in enumerate(sorted(by_page)):
        if pi > 0:
            ok.append("page_break")
            ot.append("")
            om.append("")
        idx = by_page[page]
        boxes = [tuple(bbox[i]) for i in idx]
        for j in xy_cut_order(boxes):
            i = idx[j]
            k = kind[i]
            if k == "text" and text[i] in repeated:
                k = "furniture"
            ok.append(k)
            ot.append(text[i])
            om.append(media_ref[i])
    return len(ok) - n0


def _assemble_doc(kind, text, media_ref, page_no, bbox) -> list[dict]:
    """Dict-span view of the flat core (chunker fused path, tests)."""
    ok: list = []
    ot: list = []
    om: list = []
    _assemble_doc_flat(kind, text, media_ref, page_no, bbox, ok, ot, om)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(zip(ok, ot, om))
    ]


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


_SPAN_PA_FIELDS = ("kind", "text", "media_ref", "offset")
_IN_COLS = ("doc_id", "kind", "text", "media_ref", "page_no", "bbox")


def _emit_arrow(ids, kind, text, media, page, bbox):
    """Assemble every whole document in the buffered columns into ONE Arrow
    RecordBatch, built directly from flat columnar lists (no span dicts, no
    pandas object→Arrow conversion)."""
    import pyarrow as pa

    a = np.asarray(ids, dtype=object)
    change = np.flatnonzero(a[1:] != a[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(a)]))
    out_ids: list = []
    counts: list[int] = []
    ok: list = []
    ot: list = []
    om: list = []
    for s, e in zip(starts, ends):
        out_ids.append(ids[s])
        counts.append(
            _assemble_doc_flat(kind[s:e], text[s:e], media[s:e], page[s:e], bbox[s:e], ok, ot, om)
        )
    offsets = np.concatenate([np.arange(c, dtype=np.int32) for c in counts]) if counts else np.array([], np.int32)
    list_offsets = np.concatenate(([0], np.cumsum(counts, dtype=np.int64))).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(ok, pa.string()),
            pa.array(ot, pa.string()),
            pa.array(om, pa.string()),
            pa.array(offsets, pa.int32()),
        ],
        names=list(_SPAN_PA_FIELDS),
    )
    spans = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
    return pa.RecordBatch.from_arrays([pa.array(out_ids, pa.string()), spans], ["doc_id", "spans"])


def _assemble_stream_arrow(batches):
    """Streaming per-partition assembly over raw Arrow batches. Rows arrive
    sorted by (doc_id, node_id); only the trailing (possibly batch-split)
    document's columns are buffered across batches — O(one doc) memory.
    Input and output never touch pandas: column values are plain Python
    lists (fast C to_pylist) and the output batch is built columnar."""
    pend: tuple[list, ...] | None = None
    for rb in batches:
        cols = tuple(rb.column(name).to_pylist() for name in _IN_COLS)
        if pend is not None and pend[0]:
            cols = tuple(p + c for p, c in zip(pend, cols))
        ids = cols[0]
        if not ids:
            continue
        last = ids[-1]
        cut = len(ids)
        while cut > 0 and ids[cut - 1] == last:
            cut -= 1
        pend = tuple(c[cut:] for c in cols)
        if cut:
            yield _emit_arrow(*(c[:cut] for c in cols))
    if pend is not None and pend[0]:
        yield _emit_arrow(*pend)


def extract_documents(raw_nodes: DataFrame) -> DataFrame:
    """raw_nodes → documents(doc_id, spans). One shuffle (repartition by
    doc_id); assembly is batch-streamed (never per-group) and Arrow-native
    end to end (mapInArrow — round 1's list-of-dicts per span + pandas
    conversion made 32 cores slower than one golden process)."""
    df = classify_raw_nodes(raw_nodes)
    df = df.withColumn(
        "bbox",
        normalize_bbox(F.col("bbox"), F.col("coord_origin"), F.col("page_height")),
    )
    sel = df.select("doc_id", "node_id", "kind", "text", "media_ref", "page_no", "bbox")
    part = sel.repartition("doc_id").sortWithinPartitions("doc_id", "node_id").drop("node_id")
    return part.mapInArrow(_assemble_stream_arrow, schema=DOCUMENTS)


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
                                # pd.notna, not `is not None`: nullable int
                                # columns arrive in pandas as float64 with
                                # NaN for NULL, and int(nan) raises
                                "page_width": int(cols["page_width"][i]) if pd.notna(cols["page_width"][i]) else 0,
                                "page_height": int(cols["page_height"][i]) if pd.notna(cols["page_height"][i]) else 0,
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
