"""Raw-XLSX ingestion: stdlib SpreadsheetML parser → the engine's span path.

The reference routes Office documents through docling conversion
(core/input/types.py catch-all DOCUMENT → docling's MS-Excel backend, which
emits one table item per worksheet); this module is the from-scratch
Spark-side equivalent: unzip the OOXML package (stdlib ``zipfile``), resolve
worksheet order from ``xl/workbook.xml`` + its relationships part, walk each
sheet's ``sheetData`` rows in document order (``xml.etree`` — no
external-entity resolution in modern CPython), and emit the SAME flattened
block dicts as the HTML/Markdown/DOCX flatteners, so geometry synthesis,
classify rules, XY-cut, and chunking are all shared.

SpreadsheetML subset (documented contract, pinned by the closed-form gate):

* worksheet order = ``<sheets>`` order in ``xl/workbook.xml``; each sheet's
  part is resolved through ``xl/_rels/workbook.xml.rels`` (r:id → Target),
  falling back to ``xl/worksheets/sheet{i}.xml`` positional naming when the
  rels part is absent — sheet NUMBERING in part names need not match
  workbook order (real writers renumber on sheet moves)
* per sheet: one heading block (tag ``h2``, text = sheet name) followed by
  one ``table`` block when the sheet has any non-empty row — rows joined
  with newlines, cells joined ``" | "``
* cell values: ``t="s"`` shared-string index (rich-text ``<si><r><t>``
  runs concatenated), ``t="inlineStr"`` from ``<is>``, ``t="b"`` renders
  ``TRUE``/``FALSE``, everything else (numbers, ``str`` formula results,
  ``e`` errors) is the stored ``<v>`` text verbatim — no numeric
  re-formatting, the stored string IS the value
* the ``r="B3"``-style cell reference fixes each cell's COLUMN; gaps
  between occupied cells render as empty cells (sparse sheets keep their
  geometry), cells without ``r`` take the next position
* rows with no non-empty cell are skipped (blank spacer rows are not
  content); sheets with no content rows emit only their heading block

Like HTML/Markdown/DOCX, a workbook is ONE unpaginated canvas (worksheets
are a storage unit, not layout pages — there is no bbox geometry to
recover), so ``xlsx_to_documents`` is a fused ZERO-shuffle path and the
generic flatten → XY-cut path is its plan-shape twin — both pinned to one
closed-form oracle.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.htmlparse import blocks_to_raw_nodes, blocks_to_spans
from sparkdoc.schemas import RAW_NODES

_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF_RE = re.compile(r"^([A-Z]+)[0-9]*$")


def _col_index(ref: str | None) -> int | None:
    """'B3' → 1 (0-based column). None when the ref is absent/malformed."""
    if not ref:
        return None
    m = _CELL_REF_RE.match(ref)
    if not m:
        return None
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - 64)
    return col - 1


def _si_text(si) -> str:
    """Shared-string item text: every <t> descendant concatenated in order
    (plain items hold one <t>; rich-text items hold <r><t> runs)."""
    return "".join(t.text or "" for t in si.iter(_M + "t"))


def _cell_text(c, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_M + "is")
        return _si_text(is_el) if is_el is not None else ""
    v = c.find(_M + "v")
    raw = (v.text or "") if v is not None else ""
    if t == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return ""
    if t == "b":
        return "TRUE" if raw.strip() == "1" else "FALSE"
    return raw  # n / str / e: the stored string is the value


def _sheet_rows(ws_root, shared: list[str]) -> list[str]:
    """Worksheet XML → rendered row strings (blank rows skipped, column
    gaps preserved as empty cells)."""
    out: list[str] = []
    data = ws_root.find(_M + "sheetData")
    if data is None:
        return out
    for row in data.findall(_M + "row"):
        cells: list[str] = []
        for c in row.findall(_M + "c"):
            pos = _col_index(c.get("r"))
            if pos is None or pos < len(cells):
                pos = len(cells)
            while len(cells) < pos:
                cells.append("")
            cells.append(_cell_text(c, shared))
        if any(x.strip() for x in cells):
            out.append(" | ".join(cells))
    return out


def _workbook_sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, member_path), ...] in workbook order. Targets resolve
    through the workbook rels part; positional sheet{i}.xml fallback when
    it is absent."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rel_by_id: dict[str, str] = {}
    try:
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.iter(_PR + "Relationship"):
            tgt = rel.get("Target", "")
            if tgt.startswith("/"):
                tgt = tgt.lstrip("/")
            else:
                tgt = posixpath.normpath(posixpath.join("xl", tgt))
            rel_by_id[rel.get("Id", "")] = tgt
    except KeyError:
        pass
    names = set(zf.namelist())
    out: list[tuple[str, str]] = []
    sheets = wb.find(_M + "sheets")
    if sheets is None:
        return out
    for i, sh in enumerate(sheets.findall(_M + "sheet"), start=1):
        name = sh.get("name") or f"Sheet{i}"
        target = rel_by_id.get(sh.get(_R + "id", ""), f"xl/worksheets/sheet{i}.xml")
        if target in names:
            out.append((name, target))
    return out


def xlsx_blocks_doc(data: bytes) -> list[dict]:
    """One XLSX package → flattened blocks [{tag, text, n_links}, ...].

    Corrupt zips / packages without xl/workbook.xml / malformed XML parts
    yield zero blocks (a 10^12-row ingest records and moves on; the mixed
    sniffer routes those to 'binary' before this parser runs)."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
            if "xl/workbook.xml" not in names:
                return []
            shared: list[str] = []
            if "xl/sharedStrings.xml" in names:
                sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
                shared = [_si_text(si) for si in sst.findall(_M + "si")]
            blocks: list[dict] = []
            for name, member in _workbook_sheets(zf):
                ws = ET.fromstring(zf.read(member))
                blocks.append({"tag": "h2", "text": name, "n_links": 0})
                rows = _sheet_rows(ws, shared)
                if rows:
                    blocks.append(
                        {"tag": "table", "text": "\n".join(rows), "n_links": 0}
                    )
            return blocks
    except (zipfile.BadZipFile, ET.ParseError, KeyError, ValueError, OSError):
        return []


def flatten_xlsx_doc(doc_id: str, data: bytes) -> list[dict]:
    """One XLSX → RAW_NODES row dicts (shared canvas geometry synthesis)."""
    return blocks_to_raw_nodes(doc_id, xlsx_blocks_doc(data))


def flatten_xlsx(
    docs: DataFrame, xlsx_col: str = "xlsx", id_col: str = "doc_id"
) -> DataFrame:
    """XLSX corpus (doc_id, xlsx binary) → RAW_NODES node table.

    Zero-shuffle: one Arrow-batched python stage over the scan; each doc
    parses independently, so at 10^12 docs this scales with input splits."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(xlsx_col).alias("xlsx"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, blob in zip(pdf["doc_id"], pdf["xlsx"]):
                out.extend(
                    flatten_xlsx_doc(did, bytes(blob) if blob is not None else b"")
                )
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def xlsx_spans_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-doc kernel: XLSX bytes → ordered span dicts, identical
    output to ``extract_documents(flatten_xlsx(...))`` (parity-pinned).
    Single-canvas reduction — same argument as html_spans_doc."""
    return blocks_to_spans(xlsx_blocks_doc(data))


def xlsx_to_documents(
    docs: DataFrame, xlsx_col: str = "xlsx", id_col: str = "doc_id"
) -> DataFrame:
    """XLSX corpus → documents(doc_id, spans) in ONE python stage with ZERO
    shuffles (fused path; the flatten → extract twin is plan-shape pinned)."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(xlsx_col).alias("xlsx"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did,
                 "spans": xlsx_spans_doc(did, bytes(b) if b is not None else b"")}
                for did, b in zip(pdf["doc_id"], pdf["xlsx"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
