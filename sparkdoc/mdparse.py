"""Raw-Markdown ingestion: stdlib block parser → the engine's span pipeline.

The reference accepts Markdown sources directly (``DocumentInputHandler``
normalizes ``.txt``/raw text to ``.md`` and hands it to docling conversion —
/root/reference/docling_graph/core/input/handlers.py:44-105); docling's own
Markdown backend turns it into the DoclingDocument item sequence this
engine's spans table models.  This module is the from-scratch Spark-side
equivalent: a deterministic CommonMark-subset block parser (pure stdlib,
zero dependencies) producing the SAME flattened block dicts as the HTML
flattener, so every downstream stage — classify rules, XY-cut, chunking,
extraction — is shared, not re-implemented.

Supported subset (documented contract, pinned by the closed-form gate):

* ATX headings ``#{1,6} text`` (optional closing ``#`` run stripped)
* Setext headings: a paragraph followed by ``===`` (h1) / ``---`` (h2),
  underline of >= 3 chars
* Thematic breaks ``---`` / ``***`` / ``___`` (>= 3, own line) — skipped
* Fenced code blocks (``\u0060\u0060\u0060`` or ``~~~``), content verbatim → tag ``pre``
* List items ``- * +`` and ``1.`` / ``1)``; 2+-space-indented continuation
  lines join the item with a space → one ``li`` block per item
* GitHub pipe tables (``|``-rows + separator row) → one ``table`` block,
  cells joined " | ", rows joined "\\n" (the HTML flattener's convention)
* Standalone image lines ``![alt](url)`` → tag ``img``, text = alt
* Blockquotes (``>`` prefix, contiguous run joined with spaces)
* Paragraphs: contiguous other lines soft-wrap-joined with a space
* Inline: ``![alt](u)`` → alt; ``[text](u)`` → text (link-text chars feed
  ``n_links`` — the Boilerpipe link-density numerator, same accounting as
  the HTML flattener); autolinks ``<http://…>``; code spans verbatim;
  ``**`` ``__`` ``*`` ``_`` emphasis pairs stripped; backslash escapes.

Like a web page, a Markdown file is ONE unpaginated canvas: the shared
``blocks_to_raw_nodes`` synthesizes monotone-y geometry on page 1, so the
generic XY-cut extract reproduces document order and emits no page breaks,
and ``md_to_documents`` is the fused ZERO-shuffle production path (one
mapInPandas over the scan — the 10^12-doc shape for raw-Markdown input).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.htmlparse import blocks_to_raw_nodes, blocks_to_spans
from sparkdoc.schemas import RAW_NODES

# --------------------------------------------------------------------------
# Inline processing
# --------------------------------------------------------------------------

_ESCAPABLE = set("\\`*_{}[]()#+-.!|>\"'~")
_CODE_SPAN_RE = re.compile(r"(?<!`)(`+)(?!`)(.+?)(?<!`)\1(?!`)")
_IMAGE_RE = re.compile(r"!\[([^\]]*)\]\(\s*(?:<[^>]*>|[^)\s]*)(?:\s+\"[^\"]*\")?\s*\)")
_LINK_RE = re.compile(r"(?<!!)\[([^\]]*)\]\(\s*(?:<[^>]*>|[^)\s]*)(?:\s+\"[^\"]*\")?\s*\)")
_AUTOLINK_RE = re.compile(r"<(https?://[^>\s]+)>")
# emphasis pairs, strongest first; delimiters must hug the content
_EMPH_RES = [
    re.compile(r"\*\*\*(?!\s)(.+?)(?<!\s)\*\*\*"),
    re.compile(r"___(?!\s)(.+?)(?<!\s)___"),
    re.compile(r"\*\*(?!\s)(.+?)(?<!\s)\*\*"),
    re.compile(r"__(?!\s)(.+?)(?<!\s)__"),
    re.compile(r"\*(?!\s)(.+?)(?<!\s)\*"),
    re.compile(r"(?<![\w_])_(?!\s)(.+?)(?<!\s)_(?![\w_])"),
]


def _strip_inline(s: str) -> tuple[str, int]:
    """Inline markup → plain text.  Returns (text, n_link_chars) where
    n_link_chars counts characters of rendered link text (anchor chars —
    the link-density numerator, matching the HTML flattener's accounting).
    """
    # 1. protect backslash escapes
    hold: list[str] = []

    def _protect(ch: str) -> str:
        hold.append(ch)
        return f"\x00{len(hold) - 1}\x00"

    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s) and s[i + 1] in _ESCAPABLE:
            out.append(_protect(s[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    t = "".join(out)
    # 2. protect code spans (content verbatim, no emphasis inside)
    t = _CODE_SPAN_RE.sub(lambda m: _protect(m.group(2).strip()), t)
    # 3. images → alt text (before links: ![..]( looks like a link otherwise)
    t = _IMAGE_RE.sub(lambda m: m.group(1), t)
    # 4. links → link text, counting anchor chars; protect the text so a
    #    later emphasis pass can't eat characters the count already saw
    n_links = 0

    def _link(m: re.Match) -> str:
        nonlocal n_links
        inner = m.group(1)
        for er in _EMPH_RES:
            inner = er.sub(r"\1", inner)
        n_links += len(inner)
        return _protect(inner)

    t = _LINK_RE.sub(_link, t)

    def _auto(m: re.Match) -> str:
        nonlocal n_links
        n_links += len(m.group(1))
        return _protect(m.group(1))

    t = _AUTOLINK_RE.sub(_auto, t)
    # 5. emphasis pairs (repeat until fixed point for nested wraps)
    prev = None
    while prev != t:
        prev = t
        for er in _EMPH_RES:
            t = er.sub(r"\1", t)
    # 6. restore protected fragments
    t = re.sub(r"\x00(\d+)\x00", lambda m: hold[int(m.group(1))], t)
    return t, n_links


# --------------------------------------------------------------------------
# Block parsing
# --------------------------------------------------------------------------

_ATX_RE = re.compile(r"^(#{1,6})\s+(.*?)(?:\s+#+\s*)?$")
_FENCE_RE = re.compile(r"^(`{3,}|~{3,})\s*(\S*)\s*$")
_HR_RE = re.compile(r"^(?:-{3,}|\*{3,}|_{3,})\s*$")
_SETEXT_H1_RE = re.compile(r"^={3,}\s*$")
_SETEXT_H2_RE = re.compile(r"^-{3,}\s*$")
_LIST_RE = re.compile(r"^([-*+]|\d{1,9}[.)])\s+(.*)$")
_TABLE_SEP_RE = re.compile(r"^\|?[\s:|-]*-[\s:|-]*\|?$")
_IMG_LINE_RE = re.compile(
    r"^!\[([^\]]*)\]\(\s*(?:<[^>]*>|[^)\s]*)(?:\s+\"[^\"]*\")?\s*\)\s*$"
)


def _table_cells(line: str) -> list[str]:
    body = line.strip()
    if body.startswith("|"):
        body = body[1:]
    if body.endswith("|"):
        body = body[:-1]
    return [c.strip() for c in body.split("|")]


def md_blocks_doc(text: str) -> list[dict]:
    """Pure per-document kernel: Markdown string → flattened block dicts
    [{tag, text, n_links}, ...] in document order — the same shape the HTML
    flattener emits, so geometry synthesis and classify rules are shared."""
    lines = (text or "").split("\n")
    blocks: list[dict] = []
    para: list[str] = []

    def emit(tag: str, raw: str, *, inline: bool = True) -> None:
        if inline:
            t, n_links = _strip_inline(raw)
        else:
            t, n_links = raw, 0
        blocks.append({"tag": tag, "text": t, "n_links": n_links,
                       "n_chars": len(t)})

    def flush_para() -> None:
        if para:
            emit("p", " ".join(para))
            para.clear()

    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        stripped = line.strip()
        # fenced code
        m = _FENCE_RE.match(stripped)
        if m and not para:
            flush_para()
            fence_ch = m.group(1)[0]
            close = re.compile(r"^" + re.escape(fence_ch) + "{3,}\\s*$")
            i += 1
            body: list[str] = []
            while i < n and not close.match(lines[i].strip()):
                body.append(lines[i])
                i += 1
            i += 1  # past the closing fence (or EOF)
            emit("pre", "\n".join(body), inline=False)
            continue
        # blank line: paragraph boundary
        if not stripped:
            flush_para()
            i += 1
            continue
        # setext underline closes an open paragraph
        if para and _SETEXT_H1_RE.match(stripped):
            emit("h1", " ".join(para))
            para.clear()
            i += 1
            continue
        if para and _SETEXT_H2_RE.match(stripped):
            emit("h2", " ".join(para))
            para.clear()
            i += 1
            continue
        # ATX heading
        m = _ATX_RE.match(stripped)
        if m:
            flush_para()
            emit(f"h{len(m.group(1))}", m.group(2))
            i += 1
            continue
        # thematic break
        if _HR_RE.match(stripped):
            flush_para()
            i += 1
            continue
        # pipe table: |-row whose NEXT line is a separator row
        if (
            stripped.startswith("|")
            and i + 1 < n
            and lines[i + 1].strip().startswith(("|", ":", "-"))
            and _TABLE_SEP_RE.match(lines[i + 1].strip())
        ):
            flush_para()
            rows: list[str] = []
            n_links = 0
            hdr = []
            for c in _table_cells(stripped):
                t, nl = _strip_inline(c)
                hdr.append(t)
                n_links += nl
            rows.append(" | ".join(hdr))
            i += 2  # past header + separator
            while i < n and lines[i].strip().startswith("|"):
                cells = []
                for c in _table_cells(lines[i].strip()):
                    t, nl = _strip_inline(c)
                    cells.append(t)
                    n_links += nl
                rows.append(" | ".join(cells))
                i += 1
            t = "\n".join(rows)
            blocks.append({"tag": "table", "text": t, "n_links": n_links,
                           "n_chars": len(t)})
            continue
        # standalone image line
        m = _IMG_LINE_RE.match(stripped)
        if m:
            flush_para()
            emit("img", m.group(1))
            i += 1
            continue
        # blockquote run
        if stripped.startswith(">"):
            flush_para()
            quoted: list[str] = []
            while i < n and lines[i].strip().startswith(">"):
                q = lines[i].strip()[1:]
                if q.startswith(" "):
                    q = q[1:]
                if q:
                    quoted.append(q)
                i += 1
            emit("blockquote", " ".join(quoted))
            continue
        # list item (+ 2-space-indented continuation lines)
        m = _LIST_RE.match(stripped)
        if m and not line.startswith("    "):
            flush_para()
            item = [m.group(2)]
            i += 1
            while (
                i < n
                and lines[i].strip()
                and lines[i].startswith("  ")
                and not _LIST_RE.match(lines[i].strip())
            ):
                item.append(lines[i].strip())
                i += 1
            emit("li", " ".join(item))
            continue
        # paragraph line (soft wrap)
        para.append(stripped)
        i += 1
    flush_para()
    return blocks


# --------------------------------------------------------------------------
# Spark surfaces: RAW_NODES flatten (generic path) + fused zero-shuffle path
# --------------------------------------------------------------------------


def flatten_markdown_doc(doc_id: str, text: str) -> list[dict]:
    """Markdown string → RAW_NODES row dicts (single-canvas geometry)."""
    try:
        blocks = md_blocks_doc(text)
    except Exception:
        blocks = []  # pathological input yields an empty doc, never a dead task
    return blocks_to_raw_nodes(doc_id, blocks)


def flatten_markdown(
    docs: DataFrame, md_col: str = "markdown", id_col: str = "doc_id"
) -> DataFrame:
    """Markdown corpus → flattened node table (RAW_NODES schema).
    Zero-shuffle: one Arrow-batched python stage over the scan."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(md_col).alias("md"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, md in zip(pdf["doc_id"], pdf["md"]):
                out.extend(flatten_markdown_doc(did, md))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def md_spans_doc(doc_id: str, text: str) -> list[dict]:
    """Pure per-doc kernel: Markdown → ordered span dicts, identical output
    to ``extract_documents(flatten_markdown(...))`` (parity-pinned): one
    unpaginated canvas makes the repeated-text-furniture and page-break
    rules vacuous, so classify reduces to the shared streaming pass."""
    return blocks_to_spans(flatten_markdown_doc(doc_id, text))


def md_to_documents(
    docs: DataFrame, md_col: str = "markdown", id_col: str = "doc_id"
) -> DataFrame:
    """Markdown corpus → documents(doc_id, spans) in ONE python stage with
    ZERO shuffles — the 10^12-doc production shape for raw-Markdown input
    (same argument as htmlparse.html_to_documents_fused: the flattener
    yields whole ordered documents, so the doc_id exchange is pure waste)."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(md_col).alias("md"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did, "spans": md_spans_doc(did, md)}
                for did, md in zip(pdf["doc_id"], pdf["md"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
