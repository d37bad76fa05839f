"""Raw-DOCX ingestion: stdlib OOXML parser → the engine's span pipeline.

The reference routes Office documents through docling conversion
(core/input/types.py catch-all DOCUMENT → docling's MS-Word backend); this
module is the from-scratch Spark-side equivalent: unzip the OOXML package
(stdlib ``zipfile``), walk ``word/document.xml`` body elements in document
order (``xml.etree`` — no external-entity resolution in modern CPython),
and emit the SAME flattened block dicts as the HTML/Markdown flatteners, so
geometry synthesis, classify rules, XY-cut, and chunking are all shared.

WordprocessingML subset (documented contract, pinned by the closed-form
gate):

* ``w:p`` paragraphs; run text from ``w:t`` in order, ``w:br``/``w:tab``
  render as spaces; empty paragraphs survive to the classify blank-drop
* ``w:pStyle Heading1..6`` (and ``Title`` → h1) → heading blocks
* ``w:numPr`` list paragraphs → one ``li`` block each
* ``w:hyperlink``-wrapped runs: text flows into the paragraph, its char
  count feeds ``n_links`` (the Boilerpipe link-density numerator — a
  paragraph of pure links is boilerplate, same rule as HTML/Markdown)
* ``w:tbl`` → one ``table`` block: rows joined newline, cells " | "
  (nested paragraphs inside a cell join with spaces)
* ``w:drawing`` with ``wp:docPr`` → ``img`` block, text = alt text
  (``descr``/``name`` attribute), media_ref assigned downstream
* first ``word/header*.xml`` / ``word/footer*.xml`` members → single
  ``header``/``footer`` furniture blocks

Like HTML/Markdown, a DOCX body is ONE unpaginated canvas (explicit page
geometry does not exist in the flow format), so ``docx_to_documents`` is a
fused ZERO-shuffle path and the generic flatten → XY-cut path is its
plan-shape twin — both pinned to one closed-form oracle.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.htmlparse import blocks_to_raw_nodes, blocks_to_spans
from sparkdoc.schemas import RAW_NODES

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_WP = "{http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing}"

_HEADING_RE = re.compile(r"^[Hh]eading([1-6])$")


def _runs_text(el, counts: dict) -> str:
    """Concatenate visible text under an element in document order:
    w:t text, w:br/w:cr/w:tab as single spaces; hyperlink-wrapped chars
    accumulate into counts['links']."""
    parts: list[str] = []

    def walk(node, in_link: bool) -> None:
        tag = node.tag
        if tag == _W + "t":
            t = node.text or ""
            parts.append(t)
            if in_link:
                counts["links"] += len(t)
            return
        if tag in (_W + "br", _W + "cr", _W + "tab"):
            parts.append(" ")
            return
        link = in_link or tag == _W + "hyperlink"
        for child in node:
            walk(child, link)

    walk(el, False)
    return "".join(parts)


def _para_block(p) -> dict | None:
    """One w:p element → block dict (or an img block for drawing-only
    paragraphs; text and drawings in one paragraph yield the text block —
    drawings are collected separately by the caller)."""
    counts = {"links": 0}
    ppr = p.find(_W + "pPr")
    tag = "p"
    if ppr is not None:
        style = ppr.find(_W + "pStyle")
        if style is not None:
            val = style.get(_W + "val", "")
            m = _HEADING_RE.match(val)
            if m:
                tag = f"h{m.group(1)}"
            elif val == "Title":
                tag = "h1"
        if ppr.find(_W + "numPr") is not None and tag == "p":
            tag = "li"
    text = _runs_text(p, counts)
    return {"tag": tag, "text": text, "n_links": counts["links"],
            "n_chars": len(text)}


def _drawing_blocks(p) -> list[dict]:
    """img blocks for every w:drawing under a paragraph: alt text from
    wp:docPr descr (fall back to name)."""
    out = []
    for dr in p.iter(_W + "drawing"):
        alt = ""
        for docpr in dr.iter(_WP + "docPr"):
            descr = docpr.get("descr")
            # name is the fallback only when descr is ABSENT — an empty
            # descr is an author's explicit "no alt text"
            alt = descr if descr is not None else (docpr.get("name") or "")
            break
        out.append({"tag": "img", "text": alt, "n_links": 0,
                    "n_chars": len(alt)})
    return out


def _table_block(tbl) -> dict:
    rows = []
    n_links = 0
    for tr in tbl.findall(_W + "tr"):
        cells = []
        for tc in tr.findall(_W + "tc"):
            counts = {"links": 0}
            ps = [_runs_text(p, counts) for p in tc.findall(_W + "p")]
            n_links += counts["links"]
            cells.append(" ".join(t for t in ps if t))
        rows.append(" | ".join(cells))
    text = "\n".join(rows)
    return {"tag": "table", "text": text, "n_links": n_links,
            "n_chars": len(text)}


def _furniture_block(xml_bytes: bytes, tag: str) -> dict | None:
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError:
        return None
    texts = []
    for p in root.iter(_W + "p"):
        t = _runs_text(p, {"links": 0})
        if t.strip():
            texts.append(t)
    if not texts:
        return None
    text = " ".join(texts)
    return {"tag": tag, "text": text, "n_links": 0, "n_chars": len(text)}


def docx_blocks_doc(data: bytes) -> list[dict]:
    """Pure per-document kernel: DOCX bytes → flattened block dicts in
    document order (header block first, footer last — section furniture)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data or b""))
        with zf.open("word/document.xml") as f:
            root = ET.fromstring(f.read())
    except Exception:
        return []  # not a zip / no document part: empty doc, never a dead task
    blocks: list[dict] = []

    def read_part(name: str) -> bytes:
        # a valid central directory can still point at a corrupted deflate
        # stream (zf.read raises zlib.error / BadZipFile mid-decompress);
        # one bad member must cost its furniture block, never the task
        try:
            return zf.read(name)
        except Exception:
            return b""

    names = sorted(zf.namelist())
    for name in names:
        if re.fullmatch(r"word/header\d*\.xml", name):
            blk = _furniture_block(read_part(name), "header")
            if blk:
                blocks.append(blk)
            break
    body = root.find(_W + "body")
    for el in (body if body is not None else root):
        if el.tag == _W + "p":
            blk = _para_block(el)
            imgs = _drawing_blocks(el)
            if blk is not None and (blk["text"] or not imgs):
                blocks.append(blk)
            blocks.extend(imgs)
        elif el.tag == _W + "tbl":
            blocks.append(_table_block(el))
    for name in names:
        if re.fullmatch(r"word/footer\d*\.xml", name):
            blk = _furniture_block(read_part(name), "footer")
            if blk:
                blocks.append(blk)
            break
    return blocks


def flatten_docx_doc(doc_id: str, data: bytes) -> list[dict]:
    """DOCX bytes → RAW_NODES row dicts (single-canvas geometry)."""
    return blocks_to_raw_nodes(doc_id, docx_blocks_doc(data))


def flatten_docx(
    docs: DataFrame, docx_col: str = "docx", id_col: str = "doc_id"
) -> DataFrame:
    """DOCX corpus (doc_id, docx binary) → flattened node table
    (RAW_NODES schema).  Zero-shuffle Arrow-batched python stage."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(docx_col).alias("b"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, blob in zip(pdf["doc_id"], pdf["b"]):
                out.extend(
                    flatten_docx_doc(did, bytes(blob) if blob is not None else b"")
                )
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def docx_spans_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-doc kernel: DOCX → ordered span dicts == the generic
    flatten → XY-cut path (single canvas ⇒ classify reduces to the shared
    streaming pass)."""
    return blocks_to_spans(flatten_docx_doc(doc_id, data))


def docx_to_documents(
    docs: DataFrame, docx_col: str = "docx", id_col: str = "doc_id"
) -> DataFrame:
    """DOCX corpus → documents(doc_id, spans), ONE python stage, ZERO
    shuffles — the 10^12-doc production shape for raw-DOCX input."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(docx_col).alias("b"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did,
                 "spans": docx_spans_doc(did, bytes(blob) if blob is not None else b"")}
                for did, blob in zip(pdf["doc_id"], pdf["b"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
