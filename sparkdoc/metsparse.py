"""METS/ALTO (Google-Books-style) ingestion: OCR archives → the span path.

The reference's generic-document handler (core/input/handlers.py:560-563)
runs a bare docling ``DocumentConverter()``, whose default format matrix
includes METS/GBS bundles — a tar(.gz) archive holding one METS manifest
(Library of Congress METS schema) plus one ALTO OCR file per page; this
module is the from-scratch Spark-side equivalent. Unlike the single-canvas
XML formats (JATS/USPTO), ALTO carries REAL multi-page geometry
(HPOS/VPOS/WIDTH/HEIGHT per block), so like PDF the production path is the
generic classify → XY-cut → page-break/furniture pipeline — there is no
single-canvas fused shortcut, and reading order comes from the SAME XY-cut
the north rule names.

METS/ALTO subset (documented contract, pinned by the closed-form gate):

* detection (``is_mets_archive``): a tar archive (plain, or gzip — the
  mixed sniffer strips transport gzip first, but ``tarfile`` mode ``r:*``
  also accepts compressed members fed directly) containing an ``.xml``
  member whose head names a ``<mets`` root. Tars without a METS manifest
  are opaque binaries.
* the METS manifest maps the page sequence: ``fileSec/fileGrp/file``'s
  ``FLocat@xlink:href`` resolves each ``structMap`` page ``div``'s
  ``fptr@FILEID`` to an archive member (basename fallback for leading
  directory components); page order = ``div@ORDER`` (document order when
  absent). Pages whose fptr resolves to no ALTO member are skipped.
* each ALTO file contributes one engine page: ``Page@WIDTH/HEIGHT`` (or
  ``PrintSpace`` extent as fallback) sizes the canvas; every ``TextBlock``
  (including inside ``ComposedBlock``) → one ``p`` node — lines =
  ``TextLine``'s ``String@CONTENT`` joined with spaces, lines joined with
  spaces — with bbox [HPOS, VPOS, HPOS+WIDTH, VPOS+HEIGHT] rounded to
  ints; ``Illustration``/``GraphicalElement`` → ``img`` nodes (empty
  text). Hyphenation: a ``HYP`` element ends a line → its ``String``
  contents join WITHOUT the trailing space (the hyphen char itself is
  dropped, ALTO already splits the word).
* OCR text has no hyperlinks: ``n_links`` is always 0.
* malformed archives / manifests / ALTO degrade to ZERO nodes, per the
  mixed-ingest contract; a malformed single page is skipped, not fatal.
"""

from __future__ import annotations

import io
import tarfile
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.jatsparse import _children, _local
from sparkdoc.schemas import RAW_NODES

_TAR_MAGIC_OFFSET = 257


def _looks_like_tar(data: bytes) -> bool:
    # POSIX ('ustar\x00') and GNU ('ustar  ') magics share this prefix
    return data[_TAR_MAGIC_OFFSET:_TAR_MAGIC_OFFSET + 5] == b"ustar"


def _open_tar(data: bytes) -> tarfile.TarFile | None:
    try:
        return tarfile.open(fileobj=io.BytesIO(data), mode="r:*")
    except Exception:
        return None


def _read_member(tf: tarfile.TarFile, name: str, cap: int = 64 * 1024 * 1024) -> bytes | None:
    try:
        f = tf.extractfile(name)
        if f is None:
            return None
        return f.read(cap)
    except Exception:
        return None


def is_mets_archive(data: bytes) -> bool:
    """METS admission rule (see module docstring): a tar archive with an
    ``.xml`` member whose head names a ``<mets`` root.

    On the mixed path this runs once at sniff time and the kernel re-walks
    the member headers when parsing — accepted duplication: transport gzip
    is already stripped there, so the re-walk is a plain-tar header seek
    (no decompression) and the ALTO XML parses dominate the kernel cost."""
    if not (_looks_like_tar(data) or data[:2] == b"\x1f\x8b"):
        return False
    tf = _open_tar(data)
    if tf is None:
        return False
    try:
        for m in tf.getmembers():
            if not m.isfile() or not m.name.lower().endswith(".xml"):
                continue
            head = _read_member(tf, m.name, cap=2048) or b""
            if b"<mets" in head.lower():
                return True
        return False
    finally:
        tf.close()


def _attr(el: ET.Element, name: str) -> str | None:
    """Namespace-insensitive attribute lookup (xlink:href arrives as
    '{http://www.w3.org/1999/xlink}href')."""
    if name in el.attrib:
        return el.attrib[name]
    for k, v in el.attrib.items():
        if k.rsplit("}", 1)[-1] == name:
            return v
    return None


def _mets_page_hrefs(mets_xml: bytes) -> list[str]:
    """METS manifest → page-ordered list of member hrefs (one per page
    div whose fptr resolves through fileSec)."""
    try:
        root = ET.fromstring(mets_xml)
    except ET.ParseError:
        return []
    href_by_id: dict[str, str] = {}
    for f in root.iter():
        if _local(f.tag) != "file":
            continue
        fid = _attr(f, "ID")
        loc = next((c for c in f if _local(c.tag) == "FLocat"), None)
        href = _attr(loc, "href") if loc is not None else None
        if fid and href:
            href_by_id[fid] = href
    pages: list[tuple[int, list[str]]] = []
    seq = 0
    for div in root.iter():
        if _local(div.tag) != "div" or (_attr(div, "TYPE") or "").lower() != "page":
            continue
        seq += 1
        try:
            order = int(_attr(div, "ORDER") or seq)
        except ValueError:
            order = seq
        hrefs = []
        for fptr in div.iter():
            if _local(fptr.tag) == "fptr":
                fid = _attr(fptr, "FILEID")
                if fid and fid in href_by_id:
                    hrefs.append(href_by_id[fid])
        pages.append((order, hrefs))
    pages.sort(key=lambda p: p[0])
    out: list[str] = []
    for _order, hrefs in pages:
        xml = [h for h in hrefs if h.lower().endswith(".xml")]
        if xml:
            out.append(xml[0])
    return out


def _alto_page(alto_xml: bytes) -> tuple[int, int, list[dict]] | None:
    """One ALTO file → (page_width, page_height, blocks) with blocks =
    [{tag, text, bbox}, ...] in file order (XY-cut downstream owns reading
    order)."""
    try:
        root = ET.fromstring(alto_xml)
    except ET.ParseError:
        return None
    page = next((e for e in root.iter() if _local(e.tag) == "Page"), None)
    if page is None:
        return None

    def _dim(el: ET.Element, name: str) -> float | None:
        v = _attr(el, name)
        if v is None:
            return None
        try:
            return float(v)
        except ValueError:
            return None

    w = _dim(page, "WIDTH")
    h = _dim(page, "HEIGHT")
    if w is None or h is None:
        ps = next((e for e in page.iter() if _local(e.tag) == "PrintSpace"), None)
        if ps is not None:
            w = w or ((_dim(ps, "HPOS") or 0) + (_dim(ps, "WIDTH") or 0))
            h = h or ((_dim(ps, "VPOS") or 0) + (_dim(ps, "HEIGHT") or 0))
    if not w or not h:
        return None

    def bbox_of(el: ET.Element) -> list[int] | None:
        x, y = _dim(el, "HPOS"), _dim(el, "VPOS")
        bw, bh = _dim(el, "WIDTH"), _dim(el, "HEIGHT")
        if None in (x, y, bw, bh):
            return None
        return [int(round(x)), int(round(y)),
                int(round(x + bw)), int(round(y + bh))]

    blocks: list[dict] = []
    for el in page.iter():
        t = _local(el.tag)
        if t == "TextBlock":
            text = _join_lines(el)
            bb = bbox_of(el)
            if bb is not None and text:
                blocks.append({"tag": "p", "text": text, "bbox": bb})
        elif t in ("Illustration", "GraphicalElement"):
            bb = bbox_of(el)
            if bb is not None:
                blocks.append({"tag": "img", "text": "", "bbox": bb})
    return int(round(w)), int(round(h)), blocks


def _join_lines(block: ET.Element) -> str:
    """TextBlock → text: String CONTENTs joined with spaces within a line,
    lines joined with spaces — except a line ending in HYP joins the next
    line with NO space (the word was split by hyphenation)."""
    out: list[str] = []
    glue_next = False
    for tl in block.iter():
        if _local(tl.tag) != "TextLine":
            continue
        words: list[str] = []
        ends_hyp = False
        for s in tl:
            st = _local(s.tag)
            if st == "String":
                c = _attr(s, "CONTENT")
                if c:
                    words.append(c)
                ends_hyp = False
            elif st == "HYP":
                ends_hyp = True
        line = " ".join(words)
        if not line:
            continue
        if glue_next and out:
            out[-1] += line
        else:
            out.append(line)
        glue_next = ends_hyp
    return " ".join(out)


def mets_nodes_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-document kernel: METS/ALTO tar bytes → RAW_NODES row dicts
    with real per-page TOPLEFT bounding boxes (XY-cut downstream derives
    reading order — nothing here depends on emission order)."""
    data = data or b""
    if data[:2] == b"\x1f\x8b":
        # direct-path tar.gz: inflate through the transport guard so a
        # compression bomb routes to zero nodes instead of OOMing the
        # worker (the mixed path already strips+caps before routing here)
        from sparkdoc.ingest import _decompress_transport

        inner = _decompress_transport(data)
        if inner is None:
            return []
        data = inner
    tf = _open_tar(data)
    if tf is None:
        return []
    try:
        members = {m.name: m for m in tf.getmembers() if m.isfile()}
        base = {n.rsplit("/", 1)[-1]: n for n in members}
        mets_name = None
        for n in members:
            if n.lower().endswith(".xml"):
                head = _read_member(tf, n, cap=2048) or b""
                if b"<mets" in head.lower():
                    mets_name = n
                    break
        if mets_name is None:
            return []
        mets_xml = _read_member(tf, mets_name) or b""
        prefix = mets_name.rsplit("/", 1)[0] + "/" if "/" in mets_name else ""
        rows: list[dict] = []
        nid = 0
        page_no = 0
        for href in _mets_page_hrefs(mets_xml):
            name = None
            for cand in (href, prefix + href, base.get(href.rsplit("/", 1)[-1])):
                if cand and cand in members:
                    name = cand
                    break
            if name is None:
                continue
            alto = _read_member(tf, name)
            parsed = _alto_page(alto or b"")
            if parsed is None:
                continue
            w, h, blocks = parsed
            page_no += 1
            for b in blocks:
                nid += 1
                rows.append({
                    "doc_id": doc_id,
                    "node_id": nid,
                    "parent_id": 0,
                    "tag": b["tag"],
                    "text": b["text"],
                    "n_chars": len(b["text"]),
                    "n_links": 0,
                    "page_no": page_no,
                    "bbox": b["bbox"],
                    "coord_origin": "TOPLEFT",
                    "page_width": w,
                    "page_height": h,
                })
        return rows
    except Exception:
        return []
    finally:
        tf.close()


def mets_spans_doc(doc_id: str, data: bytes) -> list[dict]:
    """Pure per-doc kernel: METS/ALTO tar → ordered span dicts, identical
    output to ``extract_documents(flatten_mets(...))`` (parity-pinned).
    Same classify reduction as pdf_spans_doc: n_links always 0, TOPLEFT
    only, bbox always present — sanitize → blank drop → kind map →
    assemble (XY-cut + page breaks + repeated-text furniture)."""
    from sparkdoc.clean import KIND_BY_TAG, heading_text_py
    from sparkdoc.htmlparse import _CTRL_RE
    from sparkdoc.spans import assemble_spans

    rows: list[dict] = []
    for n in mets_nodes_doc(doc_id, data):
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


def flatten_mets(
    docs: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """METS/ALTO corpus (doc_id, tar blob) → RAW_NODES node table.

    Zero-shuffle: one Arrow-batched python stage over the scan. Like PDF,
    ALTO blocks carry REAL multi-page geometry, so the generic extract
    path (classify → XY-cut → page breaks → furniture) is the production
    path — no single-canvas fused shortcut."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, blob in zip(pdf["doc_id"], pdf["blob"]):
                out.extend(mets_nodes_doc(did, bytes(blob) if blob is not None else b""))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)
