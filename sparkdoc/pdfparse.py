"""Raw-PDF ingestion: stdlib parser → layout blocks → the XY-cut pipeline.

The north rule names PDF layout parsing explicitly: *"parses PDF layout
blocks (reading-order sort via XY-cut over bounding boxes)"*.  The reference
delegates it to docling's converter (core/extractors/document_processor.py:
262-327 hands PDF bytes to the docling layout pipeline and gets positioned
items back); this module is the from-scratch Spark-side equivalent for the
deterministic text-PDF subset: parse real PDF bytes (objects, page tree,
Flate-compressed content streams, text-positioning operators), reconstruct
positioned text runs, cluster runs into layout blocks (lines → paragraphs /
tables / lists / headings / furniture), and emit RAW_NODES rows with REAL
per-page bounding boxes — the existing classify → normalize → XY-cut →
spans pipeline does the reading-order sort, page breaks, and furniture
rules unchanged.

Parser subset (tolerant: unknown operators are skipped, undecodable objects
are dropped, a malformed document yields an empty doc, never a dead task):
  * objects ``N 0 obj … endobj``; dicts/arrays/names/numbers/strings/refs
  * page tree via /Root → /Pages → /Kids (nested trees, inherited MediaBox)
  * content streams: FlateDecode or raw; BT/ET, Tf, Tm, Td, TD, TL, T*,
    Tj, TJ (kern numbers move x), ' ; q/Q + cm + Do for image XObjects
  * Courier-metric geometry (0.6 em advance — the classic fixed-pitch
    assumption; variable-width fonts would need embedded widths, out of
    scope for the deterministic corpus)

Block clustering (the honest layout-model part — none of this is read from
the file, it is all inferred from geometry):
  * runs on one baseline merge: gap ≤ 1.5 chars → same cell (mid-line kern
    splits concat), bigger gap → new cell (table column)
  * single-cell lines stack into a paragraph block when font, size, left
    edge, and line step agree; text joins with spaces
  * multi-cell lines with an aligned first column stack into a table
    block; text = rows joined newline, cells joined " | " (the engine's
    table convention, tableops.py)
  * "• "-prefixed lines become list items (one node each)
  * bold blocks map to heading levels by size (≥17 h1, ≥14 h2, else h3)
  * blocks inside the top/bottom 5% page margin → header/footer furniture
    (docling's layout model classifies furniture positionally; the
    repeated-text rule downstream still applies independently)
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.pdfgen import ASCENT, COURIER_ADVANCE, DESCENT
from sparkdoc.schemas import RAW_NODES

# --------------------------------------------------------------------------
# Object layer
# --------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"\s*stream\r?\n")


# precompiled value-parser tokens, matched with pos= against the ORIGINAL
# buffer — the previous b[i:] slices copied the remaining buffer per call,
# quadratic on large objects (review of the kernel profile)
_PV_NAME = re.compile(rb"/([^\s/<>\[\]()]+)")
_PV_NAME0 = re.compile(rb"/([^\s/<>\[\]()]*)")
_PV_REF = re.compile(rb"(\d+)\s+0\s+R\b")
_PV_NUM = re.compile(rb"[-+]?(?:\d+\.\d*|\.\d+|\d+)")
_PV_KW = re.compile(rb"(true|false|null)")
_PV_OCT = re.compile(rb"\\([0-7]{1,3})")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


def _parse_value(b: bytes, i: int):
    """Recursive-descent PDF value parser. Returns (value, next_index)."""
    n = len(b)
    while i < n and b[i : i + 1].isspace():
        i += 1
    if i >= n:
        return None, i
    c = b[i : i + 1]
    if b[i : i + 2] == b"<<":
        i += 2
        d: dict = {}
        while i < n:  # truncated dict: EOF terminates (never spin at i == n)
            while i < n and b[i : i + 1].isspace():
                i += 1
            if b[i : i + 2] == b">>":
                return d, i + 2
            if b[i : i + 1] != b"/":
                i += 1  # tolerate junk
                continue
            m = _PV_NAME.match(b, i)
            if not m:  # bare '/' before a delimiter: skip it, keep scanning
                i += 1
                continue
            key = m.group(1).decode("latin-1")
            i = m.end()
            val, j = _parse_value(b, i)
            i = j if j > i else i + 1  # recursion must consume ≥1 byte
            d[key] = val
        return d, i
    if c == b"[":
        i += 1
        arr = []
        while i < n:  # truncated array: EOF terminates
            while i < n and b[i : i + 1].isspace():
                i += 1
            if b[i : i + 1] == b"]":
                return arr, i + 1
            val, j = _parse_value(b, i)
            if j <= i:  # no progress (EOF inside value): stop, don't spin
                return arr, j
            i = j
            arr.append(val)
        return arr, i
    if c == b"/":
        m = _PV_NAME0.match(b, i)
        return "/" + m.group(1).decode("latin-1"), m.end()
    if c == b"(":
        s, i = _parse_string(b, i)
        return s, i
    m = _PV_REF.match(b, i)
    if m:
        return _Ref(int(m.group(1))), m.end()
    m = _PV_NUM.match(b, i)
    if m:
        tok = m.group(0)
        return (float(tok) if b"." in tok else int(tok)), m.end()
    m = _PV_KW.match(b, i)
    if m:
        return {b"true": True, b"false": False, b"null": None}[m.group(1)], m.end()
    return None, i + 1  # unknown byte: skip


_STR_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _parse_string(b: bytes, i: int) -> tuple[bytes, int]:
    """PDF literal string starting at '(' — returns (raw bytes, next_idx)."""
    assert b[i : i + 1] == b"("
    # fast path: no escape and no nested paren before the first ')' means
    # the string is exactly that slice — the overwhelmingly common case,
    # skipping the per-byte loop below
    j = b.find(b")", i + 1)
    if j != -1:
        seg = b[i + 1 : j]
        if b"\\" not in seg and b"(" not in seg:
            return seg, j + 1
    i += 1
    depth = 1
    out = bytearray()
    n = len(b)
    while i < n and depth:
        c = b[i : i + 1]
        if c == b"\\":
            nxt = b[i + 1 : i + 2]
            if nxt in _STR_ESC:
                out += _STR_ESC[nxt]
                i += 2
            elif nxt.isdigit():
                m = _PV_OCT.match(b, i)
                if m:  # \8 and \9 are not octal — PDF drops the backslash
                    out.append(int(m.group(1), 8) & 0xFF)
                    i = m.end()
                else:
                    out += nxt
                    i += 2
            else:
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _scan_objects(data: bytes) -> dict[int, tuple]:
    """All indirect objects: num → (dict-or-value, stream bytes or None).

    Cursor-driven: stream payloads are skipped via /Length (never scanned
    for keywords — compressed bytes can contain 'endobj'/'N 0 obj' by
    chance), falling back to an 'endstream' search only when Length is
    missing or indirect."""
    objs: dict[int, tuple] = {}
    pos = 0
    while True:
        m = _OBJ_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        try:
            val, j = _parse_value(data, m.end())
        except Exception:
            pos = m.end()
            continue
        stream = None
        # pos=-anchored match, same as the _PV_* parsers: re.match on
        # data[j:] would copy the remaining buffer once per object
        # (O(n_objects x file_size) on object-dense files)
        sm = _STREAM_RE.match(data, j)
        if sm:
            start = sm.end()
            length = val.get("Length") if isinstance(val, dict) else None
            if isinstance(length, int) and length >= 0:  # corrupt negative
                # Length would move the cursor BACKWARDS (rescan loop)
                stream = data[start : start + length]
                j = start + length
            else:
                se = data.find(b"endstream", start)
                if se < 0:
                    pos = start
                    continue
                stream = data[start:se]
                if stream.endswith(b"\r\n"):
                    stream = stream[:-2]
                elif stream.endswith(b"\n"):
                    stream = stream[:-1]
                j = se
        objs[num] = (val, stream)
        e = data.find(b"endobj", j)
        # monotone cursor: corrupt offsets must never move pos backwards
        # (rescanning the same object forever)
        pos = max((e + 6) if e >= 0 else j, m.end())
    return objs


def _resolve(objs: dict, v):
    seen = 0
    while isinstance(v, _Ref) and seen < 32:
        v = objs.get(v.num, (None, None))[0]
        seen += 1
    return v


def _page_list(objs: dict, data: bytes) -> list[tuple[dict, bytes, float, float]]:
    """Ordered pages: (page dict, concatenated content bytes, W, H)."""
    root = None
    tm = re.search(rb"/Root\s+(\d+)\s+0\s+R", data)
    if tm:
        root = _resolve(objs, _Ref(int(tm.group(1))))
    pages_node = _resolve(objs, (root or {}).get("Pages")) if root else None
    ordered: list[dict] = []

    def walk(node: dict, inherited_mb) -> None:
        if not isinstance(node, dict):
            return
        mb = node.get("MediaBox", inherited_mb)
        t = node.get("Type")
        if t == "/Page":
            node = dict(node)
            node.setdefault("MediaBox", mb)
            ordered.append(node)
            return
        for kid in node.get("Kids", []) or []:
            walk(_resolve(objs, kid), mb)

    if pages_node:
        walk(pages_node, None)
    else:  # damaged trailer/tree: fall back to object-order /Type /Page scan
        for num in sorted(objs):
            v, _s = objs[num]
            if isinstance(v, dict) and v.get("Type") == "/Page":
                ordered.append(v)

    out = []
    for pg in ordered:
        mb = _resolve(objs, pg.get("MediaBox")) or [0, 0, 612, 792]
        w, h = float(mb[2]) - float(mb[0]), float(mb[3]) - float(mb[1])
        contents = pg.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            r = r if isinstance(r, _Ref) else None
            if r is None:
                continue
            val, stream = objs.get(r.num, (None, None))
            if stream is None:
                continue
            filt = _resolve(objs, (val or {}).get("Filter"))
            if filt == "/FlateDecode" or (isinstance(filt, list) and "/FlateDecode" in filt):
                try:
                    stream = zlib.decompress(stream)
                except Exception:
                    continue
            parts.append(stream)
        out.append((pg, b"\n".join(parts), w, h))
    return out


# --------------------------------------------------------------------------
# Content-stream interpreter
# --------------------------------------------------------------------------

_CS_TOKEN = re.compile(
    rb"\(|\[|\]|<<|>>|/[^\s/<>\[\]()]*|[-+]?(?:\d+\.\d*|\.\d+|\d+)|[A-Za-z'\"*]+"
)


def _content_runs(content: bytes):
    """Interpret a content stream → (text runs, image boxes).

    run  = (x, y_baseline, size, bold, text)   [PDF bottom-left coords]
    image = (x, y_bottom, w, h)
    Only translation-and-scale matrices are tracked (the corpus subset);
    rotated text would need full 2×3 composition."""
    runs: list[tuple] = []
    images: list[tuple] = []
    stack: list = []
    # graphics state: CTM translation+scale
    ctm = (1.0, 1.0, 0.0, 0.0)  # sx, sy, tx, ty
    gstack: list[tuple] = []
    size = 0.0
    bold = False
    lead = 0.0
    lx = ly = 0.0  # line start
    x = y = 0.0  # current text position
    bt_id = 0  # BT-group counter: runs carry which text object drew them

    def show(raw: bytes) -> None:
        nonlocal x
        try:
            s = raw.decode("cp1252")
        except Exception:
            s = raw.decode("latin-1", errors="replace")
        if s:
            runs.append((x, y, size, bold, s, bt_id))
            x += COURIER_ADVANCE * size * len(s)

    i = 0
    n = len(content)
    while i < n:
        m = _CS_TOKEN.search(content, i)
        if not m:
            break
        tok = m.group(0)
        i = m.end()
        if tok == b"(":
            s, i = _parse_string(content, m.start())
            stack.append(("str", s))
        elif tok == b"[":
            stack.append(("mark",))
        elif tok == b"]":
            arr = []
            while stack and stack[-1] != ("mark",):
                arr.append(stack.pop())
            if stack:
                stack.pop()
            arr.reverse()
            stack.append(("arr", arr))
        elif tok[:1] == b"/":
            stack.append(("name", tok[1:].decode("latin-1")))
        elif 48 <= tok[0] <= 57 or tok[0] in (43, 45, 46):
            # starts with 0-9 + - . : the tokenizer's only alternative
            # matching these first bytes is the number pattern, so float()
            # cannot fail — the old per-token re.fullmatch was pure
            # overhead in the hottest loop of the heaviest first mile
            stack.append(("num", float(tok)))
        else:
            op = tok
            if op == b"BT":
                bt_id += 1
            elif op == b"Tf" and len(stack) >= 2:
                size = float(stack[-1][1])
                bold = stack[-2][1].endswith("2") or "Bold" in str(stack[-2][1])
            elif op == b"TL" and stack:
                lead = float(stack[-1][1])
            elif op == b"Tm" and len(stack) >= 6:
                lx = x = float(stack[-2][1])
                ly = y = float(stack[-1][1])
            elif op == b"Td" and len(stack) >= 2:
                lx += float(stack[-2][1]); ly += float(stack[-1][1])
                x, y = lx, ly
            elif op == b"TD" and len(stack) >= 2:
                lead = -float(stack[-1][1])
                lx += float(stack[-2][1]); ly += float(stack[-1][1])
                x, y = lx, ly
            elif op == b"T*":
                ly -= lead
                x, y = lx, ly
            elif op == b"Tj" and stack and stack[-1][0] == "str":
                show(stack[-1][1])
            elif op == b"'" and stack and stack[-1][0] == "str":
                ly -= lead
                x, y = lx, ly
                show(stack[-1][1])
            elif op == b"TJ" and stack and stack[-1][0] == "arr":
                for kind, v in stack[-1][1]:
                    if kind == "str":
                        show(v)
                    elif kind == "num":
                        x -= v / 1000.0 * size
            elif op == b"cm" and len(stack) >= 6:
                a = float(stack[-6][1]); d = float(stack[-3][1])
                e = float(stack[-2][1]); f = float(stack[-1][1])
                sx, sy, tx, ty = ctm
                ctm = (sx * a, sy * d, tx + sx * e, ty + sy * f)
            elif op == b"q":
                gstack.append(ctm)
            elif op == b"Q":
                ctm = gstack.pop() if gstack else (1.0, 1.0, 0.0, 0.0)
            elif op == b"Do":
                sx, sy, tx, ty = ctm
                images.append((tx, ty, sx, sy))
            # every PDF operator consumes its operands; unknown operators
            # are skipped but still clear the operand stack
            stack.clear()
    return runs, images


# --------------------------------------------------------------------------
# Layout model: runs → lines → blocks
# --------------------------------------------------------------------------


def _runs_to_lines(runs: list[tuple]) -> list[dict]:
    """Group runs into lines by STREAM order + baseline continuity: a run
    continues the current line only if it shares the baseline, moves right,
    and either belongs to the same BT text object (a generator draws a
    visual row — e.g. one table row — inside one BT group) or sits within a
    small gap of the previous run.  Pure same-y clustering would weld
    unrelated columns that happen to share a baseline on multi-column
    pages; the BT guard keeps separately-drawn objects apart even when
    stream-adjacent at one baseline.  Within a line, x-gaps decide cells:
    ≤1.5 chars concatenates (TJ kern splits), larger gaps start a new cell
    (table columns)."""
    lines: list[dict] = []
    cur: dict | None = None

    def flush() -> None:
        nonlocal cur
        if cur is not None and cur["cells"]:
            cur["size"] = cur["cells"][0]["size"]
            cur["bold"] = cur["cells"][0]["bold"]
            cur["x"] = cur["cells"][0]["x"]
            cur["x_end"] = cur["cells"][-1]["x_end"]
            lines.append(cur)
        cur = None

    for x, y, size, bold, s, bt in runs:
        cw = COURIER_ADVANCE * size
        if (
            cur is None
            or abs(y - cur["y"]) > 0.1
            or x < cur["cells"][-1]["x_end"] - 0.5 * cw
            or (bt != cur["bt"] and x - cur["cells"][-1]["x_end"] > 4.0 * cw)
        ):
            flush()
            cur = {"y": round(y, 1), "cells": [], "bt": bt}
        cur["bt"] = bt
        if cur["cells"]:
            prev = cur["cells"][-1]
            gap = x - prev["x_end"]
            if gap <= 1.5 * cw:
                prev["text"] += s
                prev["x_end"] = x + cw * len(s)
                continue
        cur["cells"].append({
            "x": x, "x_end": x + cw * len(s), "size": size,
            "bold": bold, "text": s,
        })
    flush()
    return lines


def _line_bbox(ln: dict, page_h: float) -> list[float]:
    """TOPLEFT [l, t, r, b] from a baseline line."""
    t = page_h - (ln["y"] + ASCENT * ln["size"])
    b = page_h - (ln["y"] - DESCENT * ln["size"])
    return [ln["x"], t, ln["x_end"], b]


def _heading_tag(size: float) -> str:
    if size >= 17:
        return "h1"
    if size >= 14:
        return "h2"
    return "h3"


def _lines_to_blocks(lines: list[dict], page_h: float) -> list[dict]:
    """Cluster baseline lines into layout blocks with inferred tags.

    Lines are visited column-major — sorted by (left edge, top-down) — so
    a block's lines are contiguous even on multi-column pages (block ORDER
    here is irrelevant: reading order comes from XY-cut over the bboxes)."""
    lines = sorted(lines, key=lambda l: (round(l["x"]), -l["y"]))
    blocks: list[dict] = []
    i = 0
    n = len(lines)
    margin = 0.05 * page_h
    while i < n:
        ln = lines[i]
        bb = _line_bbox(ln, page_h)
        # positional furniture
        if bb[3] <= margin or bb[1] >= page_h - margin:
            tag = "header" if bb[3] <= margin else "footer"
            blocks.append({"tag": tag, "text": " | ".join(c["text"] for c in ln["cells"]),
                           "bbox": bb})
            i += 1
            continue
        # table: run of multi-cell lines with aligned first column
        if len(ln["cells"]) > 1:
            rows = [ln]
            j = i + 1
            while (
                j < n
                and len(lines[j]["cells"]) > 1
                and abs(lines[j]["x"] - ln["x"]) <= 2.0
                and abs(rows[-1]["y"] - lines[j]["y"]) <= 2.0 * ln["size"]
            ):
                rows.append(lines[j])
                j += 1
            text = "\n".join(
                " | ".join(c["text"] for c in r["cells"]) for r in rows
            )
            l = min(r["x"] for r in rows)
            rgt = max(r["x_end"] for r in rows)
            t = _line_bbox(rows[0], page_h)[1]
            b = _line_bbox(rows[-1], page_h)[3]
            blocks.append({"tag": "table", "text": text, "bbox": [l, t, rgt, b]})
            i = j
            continue
        # list item: one node per bullet line
        if ln["cells"][0]["text"].startswith("• "):
            blocks.append({"tag": "li", "text": ln["cells"][0]["text"], "bbox": bb})
            i += 1
            continue
        # paragraph / heading: stack single-cell lines with same style
        para = [ln]
        j = i + 1
        # 1.2× leading: in-paragraph steps (1.0×) pass, stacked sibling
        # blocks (≥ size + 14 apart, i.e. ≥ 1.23× leading at size 18) never
        # merge
        lead_max = 1.2 * leading_estimate(ln["size"])
        while (
            j < n
            and len(lines[j]["cells"]) == 1
            and lines[j]["size"] == ln["size"]
            and lines[j]["bold"] == ln["bold"]
            and abs(lines[j]["x"] - ln["x"]) <= 2.0
            and 0 < (para[-1]["y"] - lines[j]["y"]) <= lead_max
            and not lines[j]["cells"][0]["text"].startswith("• ")
        ):
            para.append(lines[j])
            j += 1
        text = " ".join(p["cells"][0]["text"] for p in para)
        l = min(p["x"] for p in para)
        rgt = max(p["x_end"] for p in para)
        t = _line_bbox(para[0], page_h)[1]
        b = _line_bbox(para[-1], page_h)[3]
        tag = _heading_tag(ln["size"]) if ln["bold"] else "p"
        blocks.append({"tag": tag, "text": text, "bbox": [l, t, rgt, b]})
        i = j
    return blocks


def leading_estimate(size: float) -> float:
    return size * 1.3


# --------------------------------------------------------------------------
# Document-level parse → RAW_NODES rows
# --------------------------------------------------------------------------


def pdf_nodes_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-document kernel: PDF bytes → RAW_NODES row dicts with real
    per-page TOPLEFT bounding boxes (the XY-cut stage downstream derives
    reading order from these — nothing here depends on emission order)."""
    try:
        objs = _scan_objects(data or b"")
        pages = _page_list(objs, data or b"")
    except Exception:
        return []
    rows: list[dict] = []
    nid = 0
    for page_no, (_pg, content, w, h) in enumerate(pages, start=1):
        try:
            runs, images = _content_runs(content)
            blocks = _lines_to_blocks(_runs_to_lines(runs), h)
        except Exception:
            continue
        for x, y_bottom, iw, ih in images:
            blocks.append({
                "tag": "img", "text": "",
                "bbox": [x, h - y_bottom - ih, x + iw, h - y_bottom],
            })
        for b in blocks:
            nid += 1
            bb = [int(round(v)) for v in b["bbox"]]
            rows.append({
                "doc_id": doc_id,
                "node_id": nid,
                "parent_id": 0,
                "tag": b["tag"],
                "text": b["text"],
                "n_chars": len(b["text"]),
                "n_links": 0,
                "page_no": page_no,
                "bbox": bb,
                "coord_origin": "TOPLEFT",
                "page_width": int(round(w)),
                "page_height": int(round(h)),
            })
    return rows


def pdf_spans_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-doc kernel: PDF bytes → ordered span dicts, identical output
    to ``extract_documents(flatten_pdf(...))`` for PDF inputs (parity-pinned
    by tests). Used by the mixed-format ingest, where each blob is one row
    and the generic path's doc_id exchange would be pure waste.

    The classify reduction here mirrors clean.classify_raw_nodes for the
    node population pdf_nodes_doc can emit: n_links is always 0 (the
    link-density drop is vacuous), coord_origin is always TOPLEFT (no
    BOTTOMLEFT flip), and bbox is always present — so classify reduces to
    sanitize → blank drop → kind map → media_ref. XY-cut reading order,
    repeated-text furniture, and page breaks come from the SAME
    spans.assemble_spans kernel the distributed path runs."""
    from sparkdoc.clean import KIND_BY_TAG, heading_text_py
    from sparkdoc.htmlparse import _CTRL_RE
    from sparkdoc.spans import assemble_spans

    rows: list[dict] = []
    for n in pdf_nodes_doc(doc_id, data):
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


def flatten_pdf(
    docs: DataFrame, pdf_col: str = "pdf", id_col: str = "doc_id"
) -> DataFrame:
    """PDF corpus (doc_id, pdf binary) → RAW_NODES node table.

    Zero-shuffle: one Arrow-batched python stage over the scan; each doc
    parses independently, so at 10^12 docs this scales with input splits.
    Unlike HTML/Markdown, PDF blocks carry REAL multi-page geometry, so
    the generic extract path (classify → XY-cut → page breaks → furniture)
    is the production path — there is no single-canvas fused shortcut."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(pdf_col).alias("pdf"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, blob in zip(pdf["doc_id"], pdf["pdf"]):
                out.extend(pdf_nodes_doc(did, bytes(blob) if blob is not None else b""))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)
