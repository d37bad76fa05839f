"""JATS XML ingestion: scholarly-article parser → the engine's span path.

The reference's generic-document handler (core/input/handlers.py:560-563)
runs a bare docling ``DocumentConverter()``, whose default format matrix
includes JATS XML (the NISO Z39.96 journal-article tag suite used by
PubMed Central and most publishers); this module is the from-scratch
Spark-side equivalent — a stdlib-ElementTree walk over a documented JATS
subset emitting the SAME flattened block dicts as the HTML/Markdown
parsers, so geometry synthesis, classify rules, XY-cut, and chunking are
all shared.

JATS subset (documented contract, pinned by the closed-form gate):

* detection (``is_jats``): the document must be XML whose ROOT element is
  ``article`` — a ``<!DOCTYPE article`` declaration, or an XML prolog (or
  ``dtd-version=``/``xmlns`` attributes on the start tag) followed by
  ``<article``. A bare ``<article>`` with neither prolog nor those
  attributes is an HTML5 fragment, not JATS — this rule is what lets the
  mixed sniffer bind JATS BEFORE the HTML tag markers (``<article`` is
  also an HTML marker) without stealing XHTML, whose root is ``html``.
* ``front/article-meta``: ``article-title`` → h1; each ``contrib-group``'s
  contribs render as one ``p`` of names joined ``"; "`` (``given-names
  surname``, else ``string-name``/``collab`` flattened); each ``abstract``
  → h2 (its ``title`` child, default ``Abstract``) then its body walked
  like a section. ``journal-meta`` and all other front matter are skipped.
* ``body``: ``sec`` titles map to headings by nesting depth (top-level
  ``sec/title`` → h2, one deeper → h3, … capped h6); ``p`` → p;
  ``list/list-item`` → one ``li`` per item (nested lists recurse, each
  item its own ``li``); ``fig`` → its ``label``+``caption`` flattened as a
  ``figcaption`` block (when non-empty) then an ``img`` block whose text
  is the ``alt-text`` (default empty); ``table-wrap`` → ``label``+
  ``caption`` as a ``p`` (when non-empty) then one ``table`` block (rows =
  every ``tr``, cells ``th``/``td`` flattened and joined ``" | "``, rows
  joined newline); ``preformat``/``code`` → one verbatim ``p`` (inner
  whitespace preserved, outer newlines trimmed); ``disp-quote``/
  ``boxed-text``/``statement`` are transparent containers (their ``title``
  children are skipped, content walked at the same depth); unknown
  elements are skipped whole.
* ``back``: ``ack`` → h2 (title, default ``Acknowledgments``) + walked
  body; ``ref-list`` → h2 (title, default ``References``) + one ``li`` per
  ``ref`` (whole citation flattened, label included).
* inline content flattens via ``itertext`` with whitespace-run collapse;
  text inside ``ext-link``/``uri`` elements stays content but its length
  feeds ``n_links`` (the Boilerpipe link-density numerator, same rule as
  HTML anchors) — a reference-farm paragraph drops downstream exactly like
  an HTML link farm.
* malformed XML (or a custom external entity the stdlib parser refuses)
  degrades to ZERO blocks, per the mixed-ingest contract.

Like the other single-canvas formats, ``jats_to_documents`` is a fused
ZERO-shuffle path (scan → one mapInPandas) and the generic flatten →
XY-cut path is its plan-shape twin — both pinned to one closed-form
oracle.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.htmlparse import blocks_to_raw_nodes, blocks_to_spans
from sparkdoc.schemas import RAW_NODES

_DOCTYPE_ARTICLE_RE = re.compile(r"<!DOCTYPE\s+article\b")
_FIRST_ELEMENT_RE = re.compile(r"<([A-Za-z][\w.:-]*)([^>]*)")
#: inline elements whose flattened text length feeds n_links
_LINK_TAGS = ("ext-link", "uri")


def _local(tag: object) -> str:
    """Namespace-stripped local element name ('{ns}sec' → 'sec')."""
    if not isinstance(tag, str):  # comments/PIs surface non-str tags
        return ""
    return tag.rsplit("}", 1)[-1]


def _collapse(text: str) -> str:
    return " ".join(text.split())


def _flat(el: ET.Element | None) -> str:
    """Whitespace-collapsed flatten of an element's whole text content."""
    if el is None:
        return ""
    return _collapse("".join(el.itertext()))


def _link_chars(el: ET.Element) -> int:
    """Boilerpipe link-density numerator: collapsed length of text inside
    ext-link/uri descendants (anchor text itself stays content)."""
    n = 0
    for d in el.iter():
        if _local(d.tag) in _LINK_TAGS:
            n += len(_collapse("".join(d.itertext())))
    return n


def _children(el: ET.Element, *names: str) -> list[ET.Element]:
    """Direct children matched by local name (namespace-insensitive)."""
    return [c for c in el if _local(c.tag) in names]


def _first(el: ET.Element | None, *names: str) -> ET.Element | None:
    if el is None:
        return None
    kids = _children(el, *names)
    return kids[0] if kids else None


def skip_xml_preamble(
    text: str, doctype_re: re.Pattern | None = None
) -> tuple[bool, bool, str] | None:
    """Scan past BOM/whitespace, XML prolog, comments, PIs, and doctype.

    Returns ``(saw_prolog, doctype_matched, rest)`` where ``rest`` starts
    at the first non-preamble construct, or ``None`` when the preamble is
    truncated. ``doctype_matched`` is True when ``doctype_re`` matched a
    ``<!DOCTYPE`` — treat it as decisive at the call site: matching
    doctypes short-circuit here too (an internal DTD subset's ``[ ... ]>``
    brackets defeat the cheap ``>`` scan, so the root element after a
    matching doctype may be unreachable). Shared by the JATS and USPTO
    admission rules so the two scanners cannot drift."""
    s = text.lstrip("﻿").lstrip()
    saw_prolog = False
    if s.startswith("<?xml"):
        end = s.find("?>")
        if end < 0:
            return None
        saw_prolog = True
        s = s[end + 2:].lstrip()
    while True:
        if s.startswith("<!--"):
            end = s.find("-->")
            if end < 0:
                return None
            s = s[end + 3:].lstrip()
        elif s.startswith("<?"):
            end = s.find("?>")
            if end < 0:
                return None
            s = s[end + 2:].lstrip()
        elif s.startswith("<!DOCTYPE"):
            if doctype_re is not None and doctype_re.match(s):
                return saw_prolog, True, s
            end = s.find(">")
            if end < 0:
                return None
            s = s[end + 1:].lstrip()
        else:
            return saw_prolog, False, s


def is_jats(text: str) -> bool:
    """JATS admission rule (see module docstring): XML whose root element
    is ``article``, evidenced by a doctype naming ``article``, or a prolog
    / ``dtd-version=`` / ``xmlns`` attribute ahead of ``<article``."""
    pre = skip_xml_preamble(text, _DOCTYPE_ARTICLE_RE)
    if pre is None:
        return False
    saw_prolog, doctype_article, s = pre
    if doctype_article:
        # decisive: HTML never declares <!DOCTYPE article
        return True
    m = _FIRST_ELEMENT_RE.match(s)
    if m is None or m.group(1).rsplit(":", 1)[-1] != "article":
        return False
    attrs = m.group(2)
    return saw_prolog or "dtd-version" in attrs or "xmlns" in attrs


def _table_text(wrap: ET.Element) -> str:
    """table-wrap → the engine's table-block text: every tr (thead+tbody+
    bare), th/td cells flattened, ' | ' cells, newline rows."""
    rows: list[str] = []
    for tr in wrap.iter():
        if _local(tr.tag) != "tr":
            continue
        cells = [_flat(c) for c in _children(tr, "th", "td")]
        if cells:
            rows.append(" | ".join(cells))
    return "\n".join(rows)


def _caption_text(el: ET.Element) -> str:
    """label + caption flattened into one collapsed string."""
    parts = [_flat(c) for c in _children(el, "label", "caption")]
    return _collapse(" ".join(p for p in parts if p))


def jats_blocks_doc(text: str) -> list[dict]:
    """JATS XML → flattened block dicts [{tag, text, n_links}, ...]
    (non-JATS or malformed input → zero blocks)."""
    if not is_jats(text):
        return []
    try:
        root = ET.fromstring(text.lstrip("﻿ \t\r\n"))
    except ET.ParseError:
        return []
    blocks: list[dict] = []

    def add(tag: str, btext: str, n_links: int = 0) -> None:
        blocks.append({"tag": tag, "text": btext, "n_links": n_links})

    def walk_list(lst: ET.Element) -> None:
        for item in _children(lst, "list-item"):
            own = [c for c in item if _local(c.tag) != "list"]
            txt = _collapse(" ".join(_flat(c) for c in own))
            add("li", txt, sum(_link_chars(c) for c in own))
            for sub in _children(item, "list"):
                walk_list(sub)

    def walk_body(el: ET.Element, depth: int) -> None:
        for ch in el:
            t = _local(ch.tag)
            if t == "sec":
                title = _first(ch, "title")
                ttext = _flat(title)
                if ttext:
                    add(f"h{min(depth + 1, 6)}", ttext)
                walk_body(ch, depth + 1)
            elif t == "title":
                continue  # consumed by the enclosing sec/abstract/ack
            elif t == "p":
                add("p", _flat(ch), _link_chars(ch))
            elif t == "list":
                walk_list(ch)
            elif t == "fig":
                cap = _caption_text(ch)
                if cap:
                    add("figcaption", cap)
                add("img", _flat(_first(ch, "alt-text")))
            elif t == "table-wrap":
                cap = _caption_text(ch)
                if cap:
                    add("p", cap)
                tbl = _table_text(ch)
                if tbl:
                    add("table", tbl)
            elif t in ("preformat", "code"):
                raw = "".join(ch.itertext()).strip("\r\n")
                if raw.strip():
                    add("p", raw)
            elif t in ("disp-quote", "boxed-text", "statement"):
                walk_body(ch, depth)
            # everything else: skipped whole (documented subset)

    front = _first(root, "front")
    meta = _first(front, "article-meta")
    if meta is not None:
        title = _first(_first(meta, "title-group"), "article-title")
        ttext = _flat(title)
        if ttext:
            add("h1", ttext)
        for grp in _children(meta, "contrib-group"):
            names: list[str] = []
            for contrib in _children(grp, "contrib"):
                name = _first(contrib, "name")
                if name is not None:
                    given = _flat(_first(name, "given-names"))
                    sur = _flat(_first(name, "surname"))
                    full = _collapse(f"{given} {sur}")
                else:
                    full = _flat(_first(contrib, "string-name", "collab"))
                if full:
                    names.append(full)
            if names:
                add("p", "; ".join(names))
        for abstract in _children(meta, "abstract"):
            add("h2", _flat(_first(abstract, "title")) or "Abstract")
            walk_body(abstract, 1)
    body = _first(root, "body")
    if body is not None:
        walk_body(body, 1)
    back = _first(root, "back")
    if back is not None:
        for ack in _children(back, "ack"):
            add("h2", _flat(_first(ack, "title")) or "Acknowledgments")
            walk_body(ack, 1)
        for rl in _children(back, "ref-list"):
            add("h2", _flat(_first(rl, "title")) or "References")
            for ref in _children(rl, "ref"):
                add("li", _flat(ref), _link_chars(ref))
    return blocks


def flatten_jats_doc(doc_id: str, text: str) -> list[dict]:
    """One JATS doc → RAW_NODES row dicts (shared canvas geometry)."""
    return blocks_to_raw_nodes(doc_id, jats_blocks_doc(text))


def flatten_jats(
    docs: DataFrame, jats_col: str = "jats", id_col: str = "doc_id"
) -> DataFrame:
    """JATS corpus (doc_id, xml string) → RAW_NODES node table.
    Zero-shuffle: one Arrow-batched python stage over the scan."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(jats_col).alias("jats"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, text in zip(pdf["doc_id"], pdf["jats"]):
                out.extend(flatten_jats_doc(did, text or ""))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def jats_spans_doc(doc_id: str, text: str) -> list[dict]:
    """Pure per-doc kernel: JATS → ordered span dicts, identical output to
    ``extract_documents(flatten_jats(...))`` (parity-pinned)."""
    return blocks_to_spans(jats_blocks_doc(text))


def jats_to_documents(
    docs: DataFrame, jats_col: str = "jats", id_col: str = "doc_id"
) -> DataFrame:
    """JATS corpus → documents(doc_id, spans) in ONE python stage with
    ZERO shuffles (fused path; generic twin is plan-shape pinned)."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(jats_col).alias("jats"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did, "spans": jats_spans_doc(did, text or "")}
                for did, text in zip(pdf["doc_id"], pdf["jats"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
