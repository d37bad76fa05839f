"""USPTO patent XML ingestion: grant/application parser → the span path.

The reference's generic-document handler (core/input/handlers.py:560-563)
runs a bare docling ``DocumentConverter()``, whose default format matrix
includes USPTO patent XML (the bulk-data format for US patent grants and
applications, WIPO ST.36-shaped); this module is the from-scratch
Spark-side equivalent — a stdlib-ElementTree walk over a documented subset
emitting the SAME flattened block dicts as the HTML/JATS parsers, so
geometry synthesis, classify rules, XY-cut, and chunking are all shared.

USPTO subset (documented contract, pinned by the closed-form gate):

* detection (``is_uspto``): XML whose ROOT element is ``us-patent-grant``,
  ``us-patent-application``, or ``patent-application-publication`` — via a
  doctype naming one of those (decisive), or the root element after the
  prolog/comments/PIs. These names collide with nothing in HTML, but the
  check still runs with the JATS rule, before the HTML markers.
* ``invention-title`` (first occurrence anywhere under the bibliographic
  data, i.e. first in document order) → h1.
* ``abstract`` (root child) → h2 ``Abstract`` + its ``p`` children.
* ``description`` (root child), walked in order: ``heading`` → h2; ``p``
  → p; ``tables``/``table`` → one ``table`` block per CALS table (every
  ``row``, ``entry`` cells flattened and joined ``" | "``, rows joined
  newline); unknown children (``maths``, boilerplate sections) are
  skipped whole.
* ``drawings`` (root child) → one ``img`` block per ``figure`` (patent
  figures carry no alt text — empty text, media plumbing downstream).
* ``claims`` (root child) → h2 ``Claims`` + one ``li`` per ``claim``
  (whole nested ``claim-text`` tree flattened, ``claim-ref`` markers kept
  as content — they are text, like JATS ``xref``).
* inline flatten and whitespace collapse are shared with the JATS parser;
  patent XML carries no hyperlinks, so ``n_links`` is always 0.
* malformed XML degrades to ZERO blocks, per the mixed-ingest contract.

``uspto_to_documents`` is a fused ZERO-shuffle path (scan → one
mapInPandas); the generic flatten → XY-cut path is its plan-shape twin —
both pinned to one closed-form oracle.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.htmlparse import blocks_to_raw_nodes, blocks_to_spans
from sparkdoc.jatsparse import _children, _first, _flat, _local
from sparkdoc.schemas import RAW_NODES

_ROOTS = ("us-patent-grant", "us-patent-application",
          "patent-application-publication")
_DOCTYPE_RE = re.compile(
    r"<!DOCTYPE\s+(us-patent-grant|us-patent-application|"
    r"patent-application-publication)\b"
)
_FIRST_ELEMENT_RE = re.compile(r"<([A-Za-z][\w.:-]*)")


def is_uspto(text: str) -> bool:
    """USPTO admission rule (see module docstring): XML whose root element
    (or doctype, decisively) names a US patent grant/application. The
    preamble scan is shared with the JATS rule (jatsparse.skip_xml_preamble)
    so the two state machines cannot drift."""
    from sparkdoc.jatsparse import skip_xml_preamble

    pre = skip_xml_preamble(text, _DOCTYPE_RE)
    if pre is None:
        return False
    _saw_prolog, doctype_patent, s = pre
    if doctype_patent:
        return True
    m = _FIRST_ELEMENT_RE.match(s)
    return m is not None and m.group(1).rsplit(":", 1)[-1] in _ROOTS


def _cals_table_text(tables_el: ET.Element) -> list[str]:
    """tables/table (CALS model: tgroup → thead/tbody → row → entry) →
    one table-block text per <table> descendant."""
    out: list[str] = []
    for tbl in tables_el.iter():
        if _local(tbl.tag) != "table":
            continue
        rows: list[str] = []
        for row in tbl.iter():
            if _local(row.tag) != "row":
                continue
            cells = [_flat(c) for c in _children(row, "entry")]
            if cells:
                rows.append(" | ".join(cells))
        if rows:
            out.append("\n".join(rows))
    return out


def uspto_blocks_doc(text: str) -> list[dict]:
    """USPTO patent XML → flattened block dicts [{tag, text, n_links}, ...]
    (non-USPTO or malformed input → zero blocks)."""
    if not is_uspto(text):
        return []
    try:
        root = ET.fromstring(text.lstrip("﻿ \t\r\n"))
    except ET.ParseError:
        return []
    blocks: list[dict] = []

    def add(tag: str, btext: str) -> None:
        blocks.append({"tag": tag, "text": btext, "n_links": 0})

    # first invention-title in document order (it lives under the
    # bibliographic-data element, whose name varies grant vs application)
    for el in root.iter():
        if _local(el.tag) == "invention-title":
            ttext = _flat(el)
            if ttext:
                add("h1", ttext)
            break
    abstract = _first(root, "abstract")
    if abstract is not None:
        add("h2", "Abstract")
        for p in _children(abstract, "p"):
            add("p", _flat(p))
    desc = _first(root, "description")
    if desc is not None:
        for ch in desc:
            t = _local(ch.tag)
            if t == "heading":
                htext = _flat(ch)
                if htext:
                    add("h2", htext)
            elif t == "p":
                add("p", _flat(ch))
            elif t in ("tables", "table"):
                for tbl in _cals_table_text(ch):
                    add("table", tbl)
            # everything else (maths, chemistry, ...): skipped whole
    drawings = _first(root, "drawings")
    if drawings is not None:
        for fig in _children(drawings, "figure"):
            add("img", "")
    claims = _first(root, "claims")
    if claims is not None:
        add("h2", "Claims")
        for claim in _children(claims, "claim"):
            add("li", _flat(claim))
    return blocks


def flatten_uspto_doc(doc_id: str, text: str) -> list[dict]:
    """One USPTO doc → RAW_NODES row dicts (shared canvas geometry)."""
    return blocks_to_raw_nodes(doc_id, uspto_blocks_doc(text))


def flatten_uspto(
    docs: DataFrame, uspto_col: str = "uspto", id_col: str = "doc_id"
) -> DataFrame:
    """USPTO corpus (doc_id, xml string) → RAW_NODES node table.
    Zero-shuffle: one Arrow-batched python stage over the scan."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(uspto_col).alias("uspto"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, text in zip(pdf["doc_id"], pdf["uspto"]):
                out.extend(flatten_uspto_doc(did, text or ""))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def uspto_spans_doc(doc_id: str, text: str) -> list[dict]:
    """Pure per-doc kernel: USPTO → ordered span dicts, identical output to
    ``extract_documents(flatten_uspto(...))`` (parity-pinned)."""
    return blocks_to_spans(uspto_blocks_doc(text))


def uspto_to_documents(
    docs: DataFrame, uspto_col: str = "uspto", id_col: str = "doc_id"
) -> DataFrame:
    """USPTO corpus → documents(doc_id, spans) in ONE python stage with
    ZERO shuffles (fused path; generic twin is plan-shape pinned)."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(uspto_col).alias("uspto"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did, "spans": uspto_spans_doc(did, text or "")}
                for did, text in zip(pdf["doc_id"], pdf["uspto"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
