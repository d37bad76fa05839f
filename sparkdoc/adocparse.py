"""Raw-AsciiDoc ingestion: line-based parser → the engine's span path.

The reference's generic-document handler (core/input/handlers.py:560-563)
runs a bare docling ``DocumentConverter()``, whose default format matrix
includes AsciiDoc; this module is the from-scratch Spark-side equivalent —
a line-based parser over a documented AsciiDoc subset emitting the SAME
flattened block dicts as the Markdown parser, so geometry synthesis,
classify rules, XY-cut, and chunking are all shared.

AsciiDoc subset (documented contract, pinned by the closed-form gate):

* ``= Title`` → h1; ``== X`` … ``====== X`` → h2…h6 (marker + space)
* ``* item`` / ``- item`` / ``** nested`` → one ``li`` block each;
  ``. item`` / ``.. nested`` ordered items likewise
* ``|===`` table fences: each non-empty ``|``-leading line inside is one
  row (cells split on ``|``, stripped); rows joined newline, cells " | "
* ``image::target[alt]`` block macro → ``img`` block, text = alt
* ``----`` / ``....`` literal fences → one ``p`` block, lines joined
  newline, inline markup NOT processed (verbatim)
* attribute entries (``:name: value``), comment lines (``//``), and block
  attribute/anchor lines (``[source,python]``, ``[[id]]``) are skipped
* other consecutive non-blank lines form a paragraph (hard-wrap joins with
  a space, like the Markdown parser)
* inline: ``*bold*`` / ``_italic_`` / ```mono``` pairs are stripped to
  their content; ``link:url[text]`` and ``http(s)://url[text]`` macros
  render as ``text`` with the text length feeding ``n_links`` (the
  Boilerpipe link-density numerator); bare URLs stay literal with no link
  accounting

Like Markdown, an AsciiDoc body is ONE unpaginated canvas, so
``adoc_to_documents`` is a fused ZERO-shuffle path and the generic flatten
→ XY-cut path is its plan-shape twin — both pinned to one closed-form
oracle.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.htmlparse import blocks_to_raw_nodes, blocks_to_spans
from sparkdoc.schemas import RAW_NODES

_HEADING_RE = re.compile(r"^(={1,6}) (\S.*)$")
_BULLET_RE = re.compile(r"^(\*{1,5}|-|\.{1,5}) (\S.*)$")
_IMAGE_RE = re.compile(r"^image::([^\[\]]*)\[(.*)\]\s*$")
_ATTR_RE = re.compile(r"^:[!\w][\w.-]*!?:(\s|$)")
_BLOCK_ATTR_RE = re.compile(r"^\[.*\]$")
_LINK_RE = re.compile(r"(?:link:|https?://)[^\s\[\]]*\[([^\]]*)\]")
_STRONG_RE = re.compile(r"\*(\S(?:[^*]*\S)?)\*")
_EM_RE = re.compile(r"_(\S(?:[^_]*\S)?)_")
_MONO_RE = re.compile(r"`(\S(?:[^`]*\S)?)`")


def _inline(text: str, counts: dict) -> str:
    """Inline cleanup: link macros → their text (chars counted into
    counts['links']), paired strong/em/mono markers stripped."""

    def link_sub(m: re.Match) -> str:
        counts["links"] += len(m.group(1))
        return m.group(1)

    text = _LINK_RE.sub(link_sub, text)
    text = _STRONG_RE.sub(r"\1", text)
    text = _EM_RE.sub(r"\1", text)
    return _MONO_RE.sub(r"\1", text)


def adoc_blocks_doc(text: str) -> list[dict]:
    """AsciiDoc text → flattened blocks [{tag, text, n_links}, ...]."""
    blocks: list[dict] = []
    para: list[str] = []
    para_links = 0

    def flush() -> None:
        nonlocal para, para_links
        if para:
            blocks.append({"tag": "p", "text": " ".join(para),
                           "n_links": para_links})
        para = []
        para_links = 0

    lines = text.splitlines()
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()
        if not stripped:
            flush()
            i += 1
            continue
        if stripped in ("----", "...."):
            flush()
            fence = stripped
            i += 1
            lit: list[str] = []
            while i < n and lines[i].strip() != fence:
                lit.append(lines[i])
                i += 1
            i += 1  # closing fence (or EOF)
            blocks.append({"tag": "p", "text": "\n".join(lit), "n_links": 0})
            continue
        if stripped == "|===":
            flush()
            i += 1
            rows: list[str] = []
            while i < n and lines[i].strip() != "|===":
                row = lines[i].strip()
                if row.startswith("|"):
                    counts = {"links": 0}
                    cells = [
                        _inline(c.strip(), counts) for c in row[1:].split("|")
                    ]
                    rows.append(" | ".join(cells))
                i += 1
            i += 1
            blocks.append({"tag": "table", "text": "\n".join(rows), "n_links": 0})
            continue
        m = _IMAGE_RE.match(stripped)
        if m:
            flush()
            blocks.append({"tag": "img", "text": m.group(2), "n_links": 0})
            i += 1
            continue
        m = _HEADING_RE.match(stripped)
        if m:
            flush()
            counts = {"links": 0}
            blocks.append({
                "tag": f"h{len(m.group(1))}",
                "text": _inline(m.group(2), counts),
                "n_links": counts["links"],
            })
            i += 1
            continue
        m = _BULLET_RE.match(stripped)
        if m:
            flush()
            counts = {"links": 0}
            blocks.append({"tag": "li", "text": _inline(m.group(2), counts),
                           "n_links": counts["links"]})
            i += 1
            continue
        if _ATTR_RE.match(stripped) or stripped.startswith("//") or _BLOCK_ATTR_RE.match(stripped):
            i += 1
            continue
        counts = {"links": 0}
        para.append(_inline(stripped, counts))
        para_links += counts["links"]
        i += 1
    flush()
    return blocks


def flatten_adoc_doc(doc_id: str, text: str) -> list[dict]:
    """One AsciiDoc doc → RAW_NODES row dicts (shared canvas geometry)."""
    return blocks_to_raw_nodes(doc_id, adoc_blocks_doc(text))


def flatten_adoc(
    docs: DataFrame, adoc_col: str = "adoc", id_col: str = "doc_id"
) -> DataFrame:
    """AsciiDoc corpus (doc_id, adoc string) → RAW_NODES node table.
    Zero-shuffle: one Arrow-batched python stage over the scan."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(adoc_col).alias("adoc"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, text in zip(pdf["doc_id"], pdf["adoc"]):
                out.extend(flatten_adoc_doc(did, text or ""))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def adoc_spans_doc(doc_id: str, text: str) -> list[dict]:
    """Pure per-doc kernel: AsciiDoc → ordered span dicts, identical output
    to ``extract_documents(flatten_adoc(...))`` (parity-pinned).
    Single-canvas reduction — same argument as md_spans_doc."""
    return blocks_to_spans(adoc_blocks_doc(text))


def adoc_to_documents(
    docs: DataFrame, adoc_col: str = "adoc", id_col: str = "doc_id"
) -> DataFrame:
    """AsciiDoc corpus → documents(doc_id, spans) in ONE python stage with
    ZERO shuffles (fused path; generic twin is plan-shape pinned)."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(adoc_col).alias("adoc"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did, "spans": adoc_spans_doc(did, text or "")}
                for did, text in zip(pdf["doc_id"], pdf["adoc"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
