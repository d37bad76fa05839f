"""Raw HTML → flattened DOM node table (the north rule's missing first mile).

The extraction pipeline (clean.classify_raw_nodes → layout XY-cut →
spans.extract_documents) starts from a FLATTENED node table; real web
corpora arrive as HTML strings.  This module closes that gap with a
stdlib-only flattener (html.parser.HTMLParser — no external deps) run as an
Arrow-batched ``mapInPandas`` kernel: per-document sequence-dependent parse
logic is exactly the justified use of the Python path, and the job is
embarrassingly parallel (zero shuffles — each input row yields its node rows
independently, so the plan is scan → ArrowEvalPython, no Exchange).

Flattening model (Boilerpipe-style shallow blocks, Kohlschütter et al.,
WSDM 2010):

- Block-level tags emit one node each: h1-h6, p, li, figcaption, header,
  footer, nav, blockquote, pre; ``<title>`` emits as ``h1`` (the document
  heading); ``<img>`` emits a picture node (text = alt); ``<table>`` emits
  ONE node whose text serializes rows as ``cell | cell`` lines (the
  raw-node convention synth.py:184 uses).
- Container tags (div/section/article/ul/ol/body/...) emit nothing but are
  block BOUNDARIES: text accumulated directly under them flushes as an
  implicit ``p`` node whenever a boundary opens or closes.
- Inline tags (a/b/i/em/strong/span/code/...) fold their text into the
  enclosing block.  ``<a>`` text additionally counts into ``n_links`` —
  anchor CHARS, the link-density numerator (schemas.py RAW_NODES).
- ``<script>/<style>/<noscript>/<template>/<svg>/<iframe>`` subtrees and
  comments are dropped entirely; ``<head>`` is dropped except ``<title>``.
- Whitespace collapses to single spaces per block (``<pre>`` preserved
  verbatim); entities decode via convert_charrefs.
- HTML carries no geometry, so bbox/page are SYNTHESIZED single-column in
  document order (monotone y, page breaks at a fixed height): the XY-cut
  reading-order stage then reproduces document order exactly, and the node
  rows are drop-in inputs for the whole downstream pipeline.

Boilerplate: ``numwords_content`` adds Boilerpipe's published
NumWordsRulesClassifier decision tree (text density = word counts of the
block and its neighbours + link density) as PURE exprs over lag/lead
windows — SQL-expressible, so the driver gate checks it against a DuckDB
twin.  The default pipeline keeps the simpler link-density rule
(clean.is_boilerplate) to protect the pinned golden fixtures; the HTML path
exposes both.

Reference basis: docling delegates HTML conversion to its own backend; the
north rule specifies the Boilerpipe/Readability shallow-feature approach
re-built here (no reference code exists for this stage — this is the
from-scratch web-ingest mile).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkdoc.clean import heading_text_py
from sparkdoc.schemas import RAW_NODES

# tags that emit one node each, capturing their whole inline subtree
_EMIT = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "figcaption",
         "header", "footer", "nav", "blockquote", "pre"}
# subtrees dropped entirely (head handled separately so <title> survives)
_DROP = {"script", "style", "noscript", "template", "svg", "iframe"}
# block boundaries that emit nothing themselves
_CONTAINER = {"html", "body", "div", "section", "article", "main", "aside",
              "ul", "ol", "form", "figure", "details", "summary", "fieldset",
              "dl", "dd", "dt", "address", "center"}
_VOID_BREAK = {"hr"}  # void tags that act as block boundaries

_WS_RE = re.compile(r"\s+")

_PAGE_W, _PAGE_H, _MARGIN, _TOP_Y = 612, 1000, 36, 60


def _collapse(parts: list[str]) -> str:
    return _WS_RE.sub(" ", "".join(parts)).strip()


class _Flattener(HTMLParser):
    """One document's HTML → ordered block dicts (tag, text, n_links)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        # capture-frame stack: implicit frames (tag 'p', implicit=True) hold
        # text found directly inside containers; explicit frames hold an
        # _EMIT block until its close tag
        self.frames: list[dict] = []
        self.drop_depth = 0
        self.in_head = 0
        self.in_title = False
        self.pre_depth = 0
        # table capture (one node per outermost <table>)
        self.table_depth = 0
        self.table_rows: list[list[str]] = []
        self.cell_parts: list[str] | None = None
        self.table_link_parts: list[str] = []
        self.anchor_depth = 0

    # -- frame plumbing -------------------------------------------------
    def _frame(self) -> dict:
        if not self.frames:
            self.frames.append({"tag": "p", "parts": [], "links": [],
                                "implicit": True, "pre": False})
        return self.frames[-1]

    def _flush(self, frame: dict) -> None:
        text = ("".join(frame["parts"]) if frame["pre"]
                else _collapse(frame["parts"]))
        if frame["pre"]:
            text = text.strip("\n")
        if text.strip():
            self.blocks.append({
                "tag": frame["tag"],
                "text": text,
                "n_links": len(_collapse(frame["links"])),
            })

    def _flush_implicit(self) -> None:
        while self.frames and self.frames[-1]["implicit"]:
            self._flush(self.frames.pop())

    # HTML5 implied end tags: an open <p>/<h*>/<figcaption> cannot contain
    # another block — a new block boundary force-closes it (browsers do
    # this; html.parser does not, so unclosed <p> streaks stay in order)
    _NON_NESTING = {"p", "h1", "h2", "h3", "h4", "h5", "h6", "figcaption"}

    def _block_boundary(self, tag: str | None = None) -> None:
        self._flush_implicit()
        while (self.frames and not self.frames[-1]["implicit"]
               and (self.frames[-1]["tag"] in self._NON_NESTING
                    or (tag == "li" and self.frames[-1]["tag"] == "li"))):
            self._flush(self.frames.pop())
        # a block boundary inside a still-open li/blockquote/pre splits it
        # in place — text before the boundary emits NOW, keeping reading
        # order (<li>a<ul><li>b</li></ul>c</li> → li(a), li(b), li(c))
        if self.frames and not self.frames[-1]["implicit"]:
            f = self.frames[-1]
            self._flush(f)
            f["parts"], f["links"] = [], []

    def _open(self, tag: str, pre: bool = False) -> None:
        self._block_boundary(tag)
        self.frames.append({"tag": tag, "parts": [], "links": [],
                            "implicit": False, "pre": pre})

    def _close(self, tag: str) -> None:
        # tolerate misnesting: pop implicit frames, then pop until the
        # matching explicit frame is flushed (or nothing matches)
        self._flush_implicit()
        for i in range(len(self.frames) - 1, -1, -1):
            if self.frames[i]["tag"] == tag:
                while len(self.frames) > i:
                    self._flush(self.frames.pop())
                return

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if self.drop_depth:
            if tag in _DROP:
                self.drop_depth += 1
            return
        if tag in _DROP:
            self.drop_depth = 1
            return
        if tag == "head":
            self.in_head += 1
            return
        if self.in_head:
            if tag == "title":
                self.in_title = True
                self._open("h1")
            return
        if self.table_depth:
            if tag == "table":
                self.table_depth += 1
            elif tag == "tr":
                self.table_rows.append([])
            elif tag in ("td", "th"):
                if not self.table_rows:
                    self.table_rows.append([])
                self.cell_parts = []
            elif tag == "a":
                self.anchor_depth += 1
            return
        if tag == "table":
            self.table_depth = 1
            self.table_rows = []
            self.cell_parts = None
            self.table_link_parts = []
            self._block_boundary()
            return
        if tag == "img":
            self._block_boundary()
            alt = next((v for k, v in attrs if k == "alt" and v), "")
            self.blocks.append({"tag": "img", "text": _collapse([alt]),
                                "n_links": 0})
            return
        if tag in _VOID_BREAK:
            self._block_boundary()
            return
        if tag in _EMIT:
            self._open(tag, pre=(tag == "pre"))
            if tag == "pre":
                self.pre_depth += 1
            return
        if tag in _CONTAINER:
            self._block_boundary()
            return
        if tag == "a":
            self.anchor_depth += 1
            return
        if tag == "br":
            f = self._frame()
            f["parts"].append("\n" if f["pre"] else " ")
        # any other tag: inline, transparent

    def handle_startendtag(self, tag, attrs):
        # <img/>, <br/>, <hr/> — route through starttag (void semantics)
        if tag in ("img", "br", "hr"):
            self.handle_starttag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if self.drop_depth:
            if tag in _DROP:
                self.drop_depth -= 1
            return
        if tag == "head":
            self.in_head = max(0, self.in_head - 1)
            return
        if self.in_head:
            if tag == "title" and self.in_title:
                self.in_title = False
                self._close("h1")
            return
        if self.table_depth:
            if tag == "table":
                self.table_depth -= 1
                if self.table_depth == 0:
                    rows = [" | ".join(r) for r in self.table_rows if r]
                    text = "\n".join(rows)
                    if text.strip():
                        self.blocks.append({
                            "tag": "table", "text": text,
                            "n_links": len(_collapse(self.table_link_parts)),
                        })
            elif tag in ("td", "th"):
                if self.cell_parts is not None:
                    self.table_rows[-1].append(_collapse(self.cell_parts))
                    self.cell_parts = None
            elif tag == "a":
                self.anchor_depth = max(0, self.anchor_depth - 1)
            return
        if tag in _EMIT:
            if tag == "pre":
                self.pre_depth = max(0, self.pre_depth - 1)
            self._close(tag)
            return
        if tag in _CONTAINER:
            self._flush_implicit()
            return
        if tag == "a":
            self.anchor_depth = max(0, self.anchor_depth - 1)

    def handle_data(self, data):
        if self.drop_depth or (self.in_head and not self.in_title):
            return
        if self.table_depth:
            if self.cell_parts is not None:
                self.cell_parts.append(data)
                if self.anchor_depth:
                    self.table_link_parts.append(data)
            return
        f = self._frame()
        f["parts"].append(data)
        if self.anchor_depth:
            # raw chunks, collapsed once at flush: 'foo ' + '& bar' inside one
            # anchor counts 9, adjacent anchors never gain phantom chars
            f["links"].append(data)

    def close_document(self) -> list[dict]:
        self.close()
        while self.frames:
            self._flush(self.frames.pop())
        return self.blocks


def _block_height(tag: str, text: str) -> int:
    """Synthesized layout heights — mirrors synth.py's authoring scale so
    flattened docs paginate like native ones."""
    if tag == "img":
        return 120
    if tag.startswith("h"):
        return 18
    if tag == "li":
        return 13
    if tag == "table":
        return 16 * (text.count("\n") + 1)
    return 14 * (1 + len(text) // 80)


def flatten_html_doc(
    doc_id: str,
    html: str,
    page_width: int = _PAGE_W,
    page_height: int = _PAGE_H,
    margin: int = _MARGIN,
) -> list[dict]:
    """Pure per-document kernel: HTML string → RAW_NODES row dicts.

    node_id is the 1-based document-order index (synth.py convention);
    geometry is synthesized single-column monotone-y, so the XY-cut stage
    reproduces document order exactly.  A web page is ONE unpaginated
    canvas: page_no is always 1 and page_height is sized to the content
    (never smaller than ``page_height``), so the extract stage emits no
    synthetic page_break spans for HTML docs.
    """
    p = _Flattener()
    try:
        p.feed(html or "")
        blocks = p.close_document()
    except Exception:
        # html.parser is tolerant by design; anything that still raises
        # (pathological input) yields an empty doc rather than a dead task
        blocks = p.blocks
    return blocks_to_raw_nodes(doc_id, blocks, page_width, page_height, margin)


def blocks_to_raw_nodes(
    doc_id: str,
    blocks: list[dict],
    page_width: int = _PAGE_W,
    page_height: int = _PAGE_H,
    margin: int = _MARGIN,
) -> list[dict]:
    """Flattened blocks [{tag, text, n_links}, ...] → RAW_NODES row dicts.

    Shared by every single-canvas flattener (HTML, Markdown, DOCX): node_id
    is the 1-based document-order index, geometry is synthesized
    single-column monotone-y so XY-cut reproduces document order exactly,
    page_no is always 1 and page_height is sized to the content."""
    rows: list[dict] = []
    y = _TOP_Y
    for i, b in enumerate(blocks, start=1):
        h = _block_height(b["tag"], b["text"])
        rows.append({
            "doc_id": doc_id,
            "node_id": i,
            "parent_id": 0,
            "tag": b["tag"],
            "text": b["text"],
            "n_chars": len(b["text"]),
            "n_links": b["n_links"],
            "page_no": 1,
            "bbox": [margin, y, page_width - margin, y + h],
            "coord_origin": "TOPLEFT",
            "page_width": page_width,
            "page_height": None,  # patched to content height below
            "y_end": y + h,
        })
        y += h + 8
    canvas_h = max(page_height, (rows[-1]["y_end"] + _TOP_Y) if rows else 0)
    for r in rows:
        r["page_height"] = canvas_h
        del r["y_end"]
    return rows


def flatten_html(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    page_width: int = _PAGE_W,
    page_height: int = _PAGE_H,
) -> DataFrame:
    """HTML corpus → flattened DOM node table (RAW_NODES schema).

    Zero-shuffle: one Arrow-batched python stage over the scan; each doc's
    nodes are produced independently, so at 100 TB this scales with input
    splits and never exchanges.  Column pruning keeps only (id, html) at
    the scan.
    """
    src = docs.select(F.col(id_col).alias("doc_id"),
                      F.col(html_col).alias("html"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, html in zip(pdf["doc_id"], pdf["html"]):
                out.extend(flatten_html_doc(did, html, page_width, page_height))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


# ---------------------------------------------------------------------------
# Boilerpipe NumWordsRulesClassifier (Kohlschütter et al., WSDM 2010) —
# text-density + link-density shallow features, pure exprs + one window.
# ---------------------------------------------------------------------------

def word_count(col: Column) -> Column:
    """Whitespace-token count; '' and all-blank count 0 (split('') == ['']).
    SQL-expressible — the DuckDB twin uses the identical formula."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def boilerplate_features(nodes: DataFrame) -> DataFrame:
    """Per-node shallow features + neighbours: words, link_density, and the
    lag/lead words/link_density over document order (node_id within doc).
    One window shuffle keyed on doc_id — at corpus scale this is the same
    doc-keyed exchange every downstream stage reuses."""
    w = Window.partitionBy("doc_id").orderBy("node_id")
    words = word_count(F.col("text"))
    ld = F.when(F.col("n_chars") > 0,
                F.col("n_links") / F.col("n_chars")).otherwise(F.lit(0.0))
    df = nodes.withColumn("words", words).withColumn("link_density", ld)
    return (
        df.withColumn("prev_words", F.coalesce(F.lag("words").over(w), F.lit(0)))
        .withColumn("next_words", F.coalesce(F.lead("words").over(w), F.lit(0)))
        .withColumn("prev_link_density",
                    F.coalesce(F.lag("link_density").over(w), F.lit(0.0)))
    )


def numwords_content(nodes: DataFrame) -> DataFrame:
    """Adds ``is_content`` via Boilerpipe's published NumWordsRulesClassifier
    decision tree (boilerpipe NumWordsRulesClassifier.java — public):

        curr_ld <= 0.333333:
          prev_ld <= 0.555556:
            curr_words > 16 → CONTENT
            else next_words > 15 → CONTENT
            else prev_words > 4 → CONTENT, else BOILERPLATE
          else:
            curr_words > 40 → CONTENT
            else next_words > 17 → CONTENT, else BOILERPLATE
        else BOILERPLATE
    """
    df = boilerplate_features(nodes)
    inner_low = (
        (F.col("words") > 16) | (F.col("next_words") > 15)
        | (F.col("prev_words") > 4)
    )
    inner_high = (F.col("words") > 40) | (F.col("next_words") > 17)
    is_content = F.when(
        F.col("link_density") <= 0.333333,
        F.when(F.col("prev_link_density") <= 0.555556, inner_low)
        .otherwise(inner_high),
    ).otherwise(F.lit(False))
    return df.withColumn("is_content", is_content)


def strip_boilerplate(nodes: DataFrame) -> DataFrame:
    """Content-only node table per the NumWordsRules tree — the HTML path's
    alternative to clean.is_boilerplate's link-density-only rule.  Headings
    are always kept (Boilerpipe's heading fusion keeps them attached to the
    following content block; a heading's own word count is naturally low)."""
    df = numwords_content(nodes)
    keep = F.col("is_content") | F.col("tag").isin(
        "h1", "h2", "h3", "h4", "h5", "h6", "img", "figcaption", "table"
    )
    return df.filter(keep).drop(
        "words", "link_density", "prev_words", "next_words",
        "prev_link_density", "is_content",
    )


# ---------------------------------------------------------------------------
# Fused html → documents(doc_id, spans): ZERO-shuffle production path
# ---------------------------------------------------------------------------

# control-char sanitize, byte-identical to clean.sanitize_text / the golden
# extractor (parity pinned by tests + the closed-form gate)
_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")
_KIND_BY_TAG = {
    "h1": "heading", "h2": "heading", "h3": "heading", "h4": "heading",
    "h5": "heading", "h6": "heading", "li": "list", "table": "table",
    "img": "picture", "figcaption": "caption", "header": "furniture",
    "footer": "furniture",
}


def html_spans_doc(doc_id: str, html: str) -> list[dict]:
    """Pure per-doc kernel: HTML → ordered span dicts, identical output to
    ``extract_documents(flatten_html(...))`` for HTML inputs (parity-pinned).

    The general extract pipeline shuffles on doc_id because arbitrary
    raw_nodes arrive scattered; flatten emits each doc's nodes together and
    already in reading order (single unpaginated column), so for HTML the
    classify rules reduce to a per-doc streaming pass: sanitize →
    nav/link-density drop → blank drop → kind map → offsets.  Repeated-text
    furniture needs ≥3 distinct pages and page_breaks need ≥2 pages —
    neither can occur on a 1-page canvas, so both rules are vacuous here."""
    return blocks_to_spans(flatten_html_doc(doc_id, html))


def blocks_to_spans(blocks: list[dict]) -> list[dict]:
    """Shared fused-path classify reduction over flattened single-canvas
    blocks (HTML/Markdown/DOCX): sanitize → nav/link-density drop → blank
    drop → kind map → offsets.  Blocks need (tag, text, n_links); n_chars
    defaults to len(text) when absent."""
    spans: list[dict] = []
    off = 0
    for nid, b in enumerate(blocks, start=1):
        tag, n_links = b["tag"], b["n_links"]
        text = _CTRL_RE.sub("", b["text"])
        n_chars = b.get("n_chars", len(b["text"]))
        if tag == "nav" or (n_links > 0 and n_links * 2 > n_chars):
            continue
        if tag != "img" and not text.strip():
            continue
        kind = _KIND_BY_TAG.get(tag, "text")
        if kind == "heading":
            # span text carries the level ('#'*level prefix) — twin of the
            # generic path's clean.heading_prefixed; trails then NEST
            text = heading_text_py(tag, text)
        spans.append({
            "kind": kind,
            "text": text,
            "media_ref": f"#/pictures/{nid}" if kind == "picture" else "",
            "offset": off,
        })
        off += 1
    return spans


def html_to_documents_fused(
    docs: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """HTML corpus → documents(doc_id, spans) in ONE python stage with ZERO
    shuffles: scan → mapInPandas, nothing else.  At 10^12 docs this removes
    the full-corpus node-row exchange the generic path pays (flatten →
    repartition(doc_id) → assemble), which is pure waste when the flattener
    already yields whole ordered documents.  Semantics parity with the
    two-stage path is pinned by tests and the closed-form gate."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"),
                      F.col(html_col).alias("html"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did, "spans": html_spans_doc(did, html)}
                for did, html in zip(pdf["doc_id"], pdf["html"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
