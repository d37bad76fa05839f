"""DoclingDocument JSON first mile: serialized docling dumps → spans.

Reference analog: DoclingDocumentHandler (core/input/handlers.py:573-673)
loads a ``schema_name == "DoclingDocument"`` JSON and SKIPS docling
conversion — the document tree is already there. The detector special-cases
this format (core/input/types.py:140-233: JSON peek for the schema_name /
pages markers, graph exports rejected). This module parses that JSON shape
from scratch (stdlib json only) into the engine's RAW_NODES table:

  body.children $ref walk     → reading-order node enumeration (groups
                                recurse — docling nests list items under
                                group nodes)
  texts[].label               → tag (title→h1, section_header level L →
                                h{L+1}, list_item→li, caption→figcaption,
                                page_header/footer→header/footer, code→pre,
                                everything else→p)
  tables[].data.table_cells   → row-major text (cells " | ", rows "\\n" —
                                the HTML flattener's convention)
  pictures[]                  → img nodes ('' text; alt from caption refs)
  prov[0]                     → (page_no, bbox, coord_origin) + page sizes
                                from pages{} (document_processor.py:44-118
                                consumes exactly these fields; BOTTOMLEFT
                                flips downstream in the shared classify →
                                XY-cut pipeline)

Geometry rules (documented divergence-proof choices):
  * every item carries prov (the docling PDF/OCR case): real geometry, the
    XY-cut pipeline orders pages exactly as for parsed PDFs;
  * NO item carries prov (docling markdown/HTML conversions expose no
    geometry): synthesize the single-canvas stacked column every other
    flattener uses, so emission order IS reading order;
  * mixed (some items lack prov): the provless items are dropped, matching
    the reference's refusal to emit ambiguous geometry
    (document_processor.py:87-94 drops un-normalizable boxes).
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.schemas import RAW_NODES

#: docling text-item label → the engine's tag vocabulary
_LABEL_TAG = {
    "title": "h1",
    "paragraph": "p",
    "text": "p",
    "list_item": "li",
    "caption": "figcaption",
    "page_header": "header",
    "page_footer": "footer",
    "footnote": "p",
    "code": "pre",
    "formula": "p",
}

#: single-canvas synthetic geometry (the HTML/MD/DOCX flatteners' shape)
_CANVAS_W = 800
_LINE_H = 20


def _table_text(table: dict) -> str:
    """Row-major cell reconstruction: sort by (start_row, start_col), cells
    joined ' | ', rows joined newline. Malformed cells are skipped, not
    fatal (one corrupt blob must not kill a batch)."""
    cells = (table.get("data") or {}).get("table_cells") or []
    rows: dict[int, list[tuple[int, str]]] = {}
    for c in cells:
        try:
            r = int(c.get("start_row_offset_idx") or 0)
            k = int(c.get("start_col_offset_idx") or 0)
            rows.setdefault(r, []).append((k, str(c.get("text") or "")))
        except (TypeError, ValueError, AttributeError):
            continue
    out = []
    for r in sorted(rows):
        out.append(" | ".join(t for _, t in sorted(rows[r])))
    return "\n".join(out)


def _prov_of(item: dict) -> dict | None:
    """First prov entry as (page_no, int bbox, origin); None when absent OR
    malformed (non-numeric coords, wrong shapes — adversarial JSON must
    degrade, not raise)."""
    try:
        prov = item.get("prov") or []
        if not prov:
            return None
        p = prov[0]
        bbox = p.get("bbox") or {}
        if not all(k in bbox for k in ("l", "t", "r", "b")):
            return None
        return {
            "page_no": int(p.get("page_no") or 1),
            "bbox": [int(round(float(bbox[k]))) for k in ("l", "t", "r", "b")],
            "coord_origin": str(bbox.get("coord_origin") or "TOPLEFT").upper(),
        }
    except (TypeError, ValueError, AttributeError):
        return None


def _walk_children(node: dict, doc: dict, out: list[str], seen: set) -> None:
    """Iterative DFS over body/group children — a hostile 10^4-deep group
    chain must not blow the recursion limit (the seen-set already stops
    cycles)."""
    stack: list = [iter(node.get("children") or [])]
    while stack:
        try:
            ch = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        ref = ch.get("$ref") if isinstance(ch, dict) else None
        if not isinstance(ref, str) or ref in seen:
            continue
        seen.add(ref)
        if ref.startswith("#/groups/"):
            try:
                grp = doc["groups"][int(ref.rsplit("/", 1)[1])]
            except (KeyError, IndexError, ValueError, TypeError):
                continue
            if isinstance(grp, dict):
                stack.append(iter(grp.get("children") or []))
        else:
            out.append(ref)


def _resolve(doc: dict, ref: str) -> tuple[str, dict] | None:
    """'#/texts/3' → ('texts', item dict)."""
    parts = ref.split("/")
    if len(parts) != 3 or parts[0] != "#":
        return None
    coll, idx = parts[1], parts[2]
    try:
        return coll, (doc.get(coll) or [])[int(idx)]
    except (IndexError, ValueError, TypeError):
        return None


def docling_json_nodes_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-document kernel: DoclingDocument JSON bytes → RAW_NODES row
    dicts in body reading order. Returns [] for anything that is not a
    valid DoclingDocument (the reference raises ValidationError,
    handlers.py:620-640; a batch engine records and moves on)."""
    try:
        doc = json.loads(data.decode("utf-8"))
    except Exception:
        return []
    if not isinstance(doc, dict) or doc.get("schema_name") != "DoclingDocument":
        return []
    try:
        return _nodes_of(doc_id, doc)
    except Exception:
        # belt-and-braces: the targeted guards below cover the shapes we
        # know about; anything novel in adversarial JSON still degrades to
        # a reject instead of failing the Spark task
        return []


def _nodes_of(doc_id: str, doc: dict) -> list[dict]:

    page_sizes: dict[int, tuple[int, int]] = {}
    for k, pg in (doc.get("pages") or {}).items():
        size = (pg or {}).get("size") or {}
        try:
            page_sizes[int(k)] = (
                int(round(float(size["width"]))), int(round(float(size["height"])))
            )
        except (KeyError, TypeError, ValueError):
            continue

    refs: list[str] = []
    _walk_children(doc.get("body") or {}, doc, refs, set())

    items: list[tuple[str, str, str, dict | None]] = []  # (tag, text, ref, prov)
    any_prov = False
    for ref in refs:
        hit = _resolve(doc, ref)
        if hit is None or not isinstance(hit[1], dict):
            continue  # a list entry that is not an object: skip, don't raise
        coll, item = hit
        prov = _prov_of(item)
        any_prov = any_prov or prov is not None
        if coll == "texts":
            label = str(item.get("label") or "text")
            if label == "section_header":
                try:
                    lvl = int(item.get("level") or 1)
                except (TypeError, ValueError):
                    lvl = 1
                tag = f"h{min(max(lvl, 1) + 1, 6)}"
            else:
                tag = _LABEL_TAG.get(label, "p")
            items.append((tag, str(item.get("text") or ""), ref, prov))
        elif coll == "tables":
            items.append(("table", _table_text(item), ref, prov))
        elif coll == "pictures":
            items.append(("img", "", ref, prov))

    rows: list[dict] = []
    y = 0
    for nid, (tag, text, _ref, prov) in enumerate(items, start=1):
        if prov is None:
            if any_prov:
                continue  # ambiguous: real + missing geometry never mix
            h = _LINE_H * (1 + text.count("\n"))
            prov = {"page_no": 1, "bbox": [0, y, _CANVAS_W, y + h],
                    "coord_origin": "TOPLEFT"}
            y += h + _LINE_H
        pw, ph = page_sizes.get(prov["page_no"], (None, None))
        rows.append({
            "doc_id": doc_id,
            "node_id": nid,
            "parent_id": 0,
            "tag": tag,
            "text": text,
            "n_chars": len(text),
            "n_links": 0,
            "page_no": prov["page_no"],
            "bbox": prov["bbox"],
            "coord_origin": prov["coord_origin"],
            "page_width": pw if pw is not None else _CANVAS_W,
            "page_height": ph,
        })
    return rows


def flatten_docling_json(
    docs: DataFrame, json_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """DoclingDocument-JSON corpus (doc_id, blob binary) → RAW_NODES table.
    Zero-shuffle Arrow-batched python stage; the generic classify → XY-cut
    extract path handles BOTTOMLEFT flips and reading order downstream."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(json_col).alias("blob"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                out.extend(
                    docling_json_nodes_doc(did, bytes(blob) if blob is not None else b"")
                )
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def docling_json_spans_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-doc fused kernel, identical output to
    ``extract_documents(flatten_docling_json(...))`` (parity-pinned). The
    classify mirror here must carry the BOTTOMLEFT flip and the
    unknown-page-height drop — DoclingDocument prov is bottom-left-origin
    for PDF/OCR sources (document_processor.py:87-94)."""
    from sparkdoc.clean import KIND_BY_TAG, heading_text_py
    from sparkdoc.htmlparse import _CTRL_RE
    from sparkdoc.layout import normalize_bbox_py
    from sparkdoc.spans import assemble_spans

    rows: list[dict] = []
    for n in docling_json_nodes_doc(doc_id, data):
        text = _CTRL_RE.sub("", n["text"] or "")
        if n["tag"] != "img" and not text.strip():
            continue
        if n["coord_origin"] == "BOTTOMLEFT" and n["page_height"] is None:
            continue
        bbox = normalize_bbox_py(n["bbox"], n["coord_origin"], n["page_height"])
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
            "bbox": bbox,
        })
    return assemble_spans(rows)
