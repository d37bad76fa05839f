"""Raw-PPTX ingestion: stdlib PresentationML parser → the engine's span path.

The reference routes Office documents through docling conversion
(core/input/types.py catch-all DOCUMENT → docling's MS-PowerPoint backend);
this module is the from-scratch Spark-side equivalent: unzip the OOXML
package (stdlib ``zipfile``), resolve slide order from
``ppt/presentation.xml`` + its relationships part, and walk each slide's
shape tree (``xml.etree`` — no external-entity resolution in modern
CPython).

Unlike the flow formats (HTML/Markdown/DOCX/XLSX), slides carry REAL
layout: each shape's ``a:xfrm`` offset/extent (EMU, 1 pt = 12 700 EMU) is a
genuine bounding box and each slide is a genuine page. So PPTX takes the
PDF route, not the single-canvas route: nodes keep their slide page_no and
EMU-derived bbox, reading order is recovered by the SAME XY-cut +
``assemble_spans`` kernel the PDF path runs (page_break spans between
slides, repeated-text furniture across ≥3 slides — deck footers and
decoration text boxes are exactly the furniture that rule exists for).

PresentationML subset (documented contract, pinned by the closed-form gate):

* slide order = ``p:sldIdLst`` order, r:id resolved through
  ``ppt/_rels/presentation.xml.rels``; unresolvable ids are skipped
* ``p:sp`` text shapes: each ``a:p`` paragraph is one node; run text from
  ``a:t`` in order (fields ``a:fld`` contribute their cached ``a:t``),
  ``a:br`` renders as a space
* placeholder type (``p:ph type=``) drives the tag: ``title``/``ctrTitle``
  → ``h1`` on slide 1, ``h2`` after (docling's per-slide section headers);
  ``ftr``/``dt``/``sldNum`` → ``footer`` (explicit furniture); everything
  else → ``li`` when the paragraph properties carry ``a:buChar`` /
  ``a:buAutoNum``, ``p`` otherwise
* ``p:graphicFrame`` wrapping ``a:tbl`` → one ``table`` node: rows joined
  newline, cells " | " (multi-paragraph cells join with spaces)
* ``p:pic`` → ``img`` node, text = ``p:cNvPr`` ``descr`` alt text (empty
  when absent), media_ref from the parser's global node enumeration
* a shape's box splits vertically into equal slices across its paragraphs
  (a paragraph is a layout line; slicing keeps intra-shape order under
  XY-cut without inventing geometry the XML doesn't have)
* shapes without an explicit ``a:xfrm`` (layout-inherited placeholders)
  get a synthesized full-width band below the slide's real content, in
  tree order — deterministic, documented fallback

Corrupt zips / missing parts / malformed XML yield zero nodes (the mixed
sniffer routes non-PPTX zips to 'binary' before this parser runs; a
10^12-row ingest records and moves on).
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.schemas import RAW_NODES

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PR = "{http://schemas.openxmlformats.org/package/2006/relationships}"

EMU_PER_PT = 12700.0

#: default 16:9 slide (12192000 × 6858000 EMU) when p:sldSz is absent
_DEFAULT_W_PT, _DEFAULT_H_PT = 960.0, 540.0

#: placeholder types that are slide furniture by construction
_FURNITURE_PH = {"ftr", "dt", "sldNum"}
_TITLE_PH = {"title", "ctrTitle"}


def _para_text(p) -> str:
    """One a:p paragraph → visible text: a:t runs in order (fields included
    via their cached a:t), a:br as a single space."""
    parts: list[str] = []
    for node in p.iter():
        if node.tag == _A + "t":
            parts.append(node.text or "")
        elif node.tag == _A + "br":
            parts.append(" ")
    return "".join(parts)


def _is_bullet(p) -> bool:
    pr = p.find(_A + "pPr")
    return pr is not None and (
        pr.find(_A + "buChar") is not None or pr.find(_A + "buAutoNum") is not None
    )


def _iter_xfrm(el):
    """xfrm elements under ``el`` in either namespace: shapes/pictures carry
    a:xfrm (inside spPr), graphicFrames carry p:xfrm directly."""
    for node in el.iter():
        if node.tag in (_A + "xfrm", _P + "xfrm"):
            yield node


def _xfrm_box(el) -> list[float] | None:
    """First xfrm under ``el`` → [l, t, r, b] in points, or None (the
    off/ext children are always drawingml a: regardless of the xfrm's own
    namespace)."""
    for xfrm in _iter_xfrm(el):
        off, ext = xfrm.find(_A + "off"), xfrm.find(_A + "ext")
        if off is None or ext is None:
            return None
        try:
            x, y = float(off.get("x", "0")), float(off.get("y", "0"))
            cx, cy = float(ext.get("cx", "0")), float(ext.get("cy", "0"))
        except ValueError:
            return None
        return [x / EMU_PER_PT, y / EMU_PER_PT,
                (x + cx) / EMU_PER_PT, (y + cy) / EMU_PER_PT]
    return None


def _ph_type(sp) -> str | None:
    nv = sp.find(_P + "nvSpPr")
    if nv is None:
        return None
    nvpr = nv.find(_P + "nvPr")
    if nvpr is None:
        return None
    ph = nvpr.find(_P + "ph")
    return ph.get("type", "body") if ph is not None else None


def _slide_parts(zf: zipfile.ZipFile) -> list[str]:
    """Slide member paths in presentation order (p:sldIdLst × rels)."""
    pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    rel_by_id: dict[str, str] = {}
    try:
        rels = ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels"))
        for rel in rels.iter(_PR + "Relationship"):
            tgt = rel.get("Target", "")
            if tgt.startswith("/"):
                tgt = tgt.lstrip("/")
            else:
                tgt = posixpath.normpath(posixpath.join("ppt", tgt))
            rel_by_id[rel.get("Id", "")] = tgt
    except KeyError:
        return []
    names = set(zf.namelist())
    out: list[str] = []
    lst = pres.find(_P + "sldIdLst")
    if lst is None:
        return out
    for sld in lst.findall(_P + "sldId"):
        tgt = rel_by_id.get(sld.get(_R + "id", ""))
        if tgt in names:
            out.append(tgt)
    return out


def _slide_size(zf: zipfile.ZipFile) -> tuple[float, float]:
    try:
        pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    except (KeyError, ET.ParseError):
        return _DEFAULT_W_PT, _DEFAULT_H_PT
    sz = pres.find(_P + "sldSz")
    if sz is None:
        return _DEFAULT_W_PT, _DEFAULT_H_PT
    try:
        return (float(sz.get("cx", "0")) / EMU_PER_PT or _DEFAULT_W_PT,
                float(sz.get("cy", "0")) / EMU_PER_PT or _DEFAULT_H_PT)
    except ValueError:
        return _DEFAULT_W_PT, _DEFAULT_H_PT


def _table_text(tbl) -> str:
    rows: list[str] = []
    for tr in tbl.findall(_A + "tr"):
        cells: list[str] = []
        for tc in tr.findall(_A + "tc"):
            paras = [_para_text(p) for p in tc.iter(_A + "p")]
            cells.append(" ".join(t for t in paras if t))
        rows.append(" | ".join(cells))
    return "\n".join(rows)


def pptx_nodes_doc(doc_id: str, data: bytes) -> list[dict]:
    """One PPTX package → RAW_NODES row dicts with real slide geometry.

    node_id is the global parse-order enumeration (slide by slide, shapes
    in tree order, paragraphs within a shape in order) — picture media_refs
    derive from it downstream, exactly like the PDF parser's."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            if "ppt/presentation.xml" not in set(zf.namelist()):
                return []
            page_w, page_h = _slide_size(zf)
            rows: list[dict] = []
            nid = 0

            def emit(tag: str, text: str, page: int, bbox: list[float]) -> None:
                nonlocal nid
                nid += 1
                rows.append({
                    "doc_id": doc_id, "node_id": nid, "parent_id": 0,
                    "tag": tag, "text": text, "n_chars": len(text),
                    "n_links": 0, "page_no": page,
                    # RAW_NODES carries integer bboxes (same convention as
                    # the PDF parser's node emission)
                    "bbox": [int(round(v)) for v in bbox],
                    "coord_origin": "TOPLEFT",
                    "page_width": int(round(page_w)),
                    "page_height": int(round(page_h)),
                })

            for page, member in enumerate(_slide_parts(zf), start=1):
                try:
                    slide = ET.fromstring(zf.read(member))
                except (ET.ParseError, KeyError):
                    continue
                tree = slide.find(f"{_P}cSld/{_P}spTree")
                if tree is None:
                    continue
                fallback_y = page_h  # geometry-less shapes band below content
                for sp in tree:
                    if sp.tag == _P + "sp":
                        body = sp.find(f"{_P}txBody")
                        if body is None:
                            continue
                        ph = _ph_type(sp)
                        box = _xfrm_box(sp)
                        if box is None:
                            box = [0.0, fallback_y, page_w, fallback_y + 20.0]
                            fallback_y += 28.0
                        paras = body.findall(_A + "p")
                        if not paras:
                            continue
                        slice_h = (box[3] - box[1]) / len(paras)
                        for k, p in enumerate(paras):
                            if ph in _TITLE_PH:
                                tag = "h1" if page == 1 else "h2"
                            elif ph in _FURNITURE_PH:
                                tag = "footer"
                            else:
                                tag = "li" if _is_bullet(p) else "p"
                            emit(tag, _para_text(p), page,
                                 [box[0], box[1] + k * slice_h,
                                  box[2], box[1] + (k + 1) * slice_h])
                    elif sp.tag == _P + "graphicFrame":
                        tbl = next(iter(sp.iter(_A + "tbl")), None)
                        if tbl is None:
                            continue
                        box = _xfrm_box(sp)
                        if box is None:
                            box = [0.0, fallback_y, page_w, fallback_y + 20.0]
                            fallback_y += 28.0
                        emit("table", _table_text(tbl), page, box)
                    elif sp.tag == _P + "pic":
                        box = _xfrm_box(sp)
                        if box is None:
                            box = [0.0, fallback_y, page_w, fallback_y + 20.0]
                            fallback_y += 28.0
                        alt = ""
                        cnv = next(iter(sp.iter(_P + "cNvPr")), None)
                        if cnv is not None:
                            alt = cnv.get("descr", "")
                        emit("img", alt, page, box)
            return rows
    except (zipfile.BadZipFile, ET.ParseError, KeyError, ValueError, OSError):
        return []


def pptx_spans_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-doc kernel: PPTX bytes → ordered span dicts, identical
    output to ``extract_documents(flatten_pptx(...))`` (parity-pinned).

    Same reduction as pdf_spans_doc: n_links is always 0 and coord_origin
    TOPLEFT, so classify reduces to sanitize → blank drop → kind map; XY-cut
    reading order, page_breaks between slides, and repeated-text furniture
    come from the SAME spans.assemble_spans kernel."""
    from sparkdoc.clean import KIND_BY_TAG, heading_text_py
    from sparkdoc.htmlparse import _CTRL_RE
    from sparkdoc.spans import assemble_spans

    rows: list[dict] = []
    for n in pptx_nodes_doc(doc_id, data):
        text = _CTRL_RE.sub("", n["text"] or "")
        if n["tag"] != "img" and not text.strip():
            continue
        kind = KIND_BY_TAG.get(n["tag"], "text")
        if kind == "heading":
            # level carried in span text ('#'*level) — clean.heading_text_py
            text = heading_text_py(n["tag"], text)
        rows.append({
            "node_id": n["node_id"],
            "kind": kind,
            "text": text,
            "media_ref": f"#/pictures/{n['node_id']}" if kind == "picture" else "",
            "page_no": n["page_no"],
            "bbox": n["bbox"],
        })
    return assemble_spans(rows)


def flatten_pptx(
    docs: DataFrame, pptx_col: str = "pptx", id_col: str = "doc_id"
) -> DataFrame:
    """PPTX corpus (doc_id, pptx binary) → RAW_NODES node table.

    Zero-shuffle: one Arrow-batched python stage over the scan; each doc
    parses independently, so at 10^12 docs this scales with input splits.
    Like PDF, slides carry REAL multi-page geometry, so the generic extract
    path (classify → XY-cut → page breaks → furniture) is the production
    path for scattered node tables."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(pptx_col).alias("pptx"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, blob in zip(pdf["doc_id"], pdf["pptx"]):
                out.extend(
                    pptx_nodes_doc(did, bytes(blob) if blob is not None else b"")
                )
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def pptx_to_documents(
    docs: DataFrame, pptx_col: str = "pptx", id_col: str = "doc_id"
) -> DataFrame:
    """PPTX corpus → documents(doc_id, spans) in ONE python stage with ZERO
    shuffles (fused path — each blob row co-locates the whole deck, so the
    generic path's doc_id exchange is pure waste; parity pinned by tests)."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(pptx_col).alias("pptx"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did,
                 "spans": pptx_spans_doc(did, bytes(b) if b is not None else b"")}
                for did, b in zip(pdf["doc_id"], pdf["pptx"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
