"""Hostile-input fuzz over the first-mile per-document kernels (hypothesis,
no Spark session — pure-Python cores, so hundreds of examples run in
seconds).

At 10^12 documents the corpus WILL contain truncated downloads, bit-flipped
blobs, polyglot junk, and adversarial markup.  The contract of every
first-mile kernel is: one bad document costs AT MOST its own rows — it never
raises (a raised exception kills the whole Arrow batch task and, after
retries, the job), and whatever rows it does emit are structurally sound so
downstream stages (XY-cut, chunker, sinks) never see malformed input.

Kernels covered (reference ingest surface: docling-graph
core/input/handlers.py routes .pdf/.docx/.md/.txt/.html into conversion):
  pdfparse.pdf_nodes_doc      random bytes · truncations · byte flips of a
                              real rendered PDF (xref/stream corruption)
  docxparse.docx/spans        random bytes · truncations · byte flips of a
                              real OOXML zip (central-dir survives, deflate
                              streams corrupt — the zlib.error surface)
  mdparse.md_* / htmlparse.html_*   arbitrary unicode text incl. control
                              chars, unterminated fences/tags, CDATA,
                              half-entities
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from sparkdoc.docxparse import docx_spans_doc, flatten_docx_doc
from sparkdoc.htmlparse import flatten_html_doc, html_spans_doc
from sparkdoc.mdparse import flatten_markdown_doc, md_spans_doc
from sparkdoc.pdfparse import pdf_nodes_doc
from sparkdoc.synth import synth_docx_doc, synth_pdf_doc

SPAN_KINDS = {"text", "heading", "list", "table", "picture", "caption",
              "furniture", "page_break"}
RAW_NODE_KEYS = {
    "doc_id", "node_id", "parent_id", "tag", "text", "n_chars", "n_links",
    "page_no", "bbox", "coord_origin", "page_width", "page_height",
}

# one real artifact per format, mutated per-example (rendering is the
# expensive part; mutation is cheap)
_PDF = synth_pdf_doc(3, 42)["pdf"]
_DOCX = synth_docx_doc(3, 42)["docx"]


def check_raw_nodes(rows: list[dict]) -> None:
    for r in rows:
        assert set(r) == RAW_NODE_KEYS
        assert isinstance(r["node_id"], int) and r["node_id"] >= 1
        assert isinstance(r["tag"], str) and r["tag"]
        assert isinstance(r["text"], str)
        assert r["n_chars"] == len(r["text"])
        assert isinstance(r["n_links"], int) and r["n_links"] >= 0
        assert isinstance(r["page_no"], int) and r["page_no"] >= 1
        assert isinstance(r["bbox"], list) and len(r["bbox"]) == 4
        assert all(isinstance(v, int) for v in r["bbox"])
        assert r["coord_origin"] in ("TOPLEFT", "BOTTOMLEFT")


def check_spans(spans: list[dict]) -> None:
    for i, s in enumerate(spans):
        assert s["kind"] in SPAN_KINDS
        assert isinstance(s["text"], str)
        # sanitize ran: no C0 control chars beyond \t\n\r
        assert not any(ord(c) < 32 and c not in "\t\n\r" for c in s["text"])
        assert isinstance(s["media_ref"], str)
        assert (s["media_ref"] != "") == (s["kind"] == "picture")
        assert s["offset"] == i  # dense 0-based document order


def _mutate(data: bytes, cut: int, flips: list[tuple[int, int]]) -> bytes:
    buf = bytearray(data[: max(1, int(len(data) * cut / 1000))])
    for pos, val in flips:
        if buf:
            buf[pos % len(buf)] = val
    return bytes(buf)


_flips = st.lists(
    st.tuples(st.integers(min_value=0, max_value=1 << 30),
              st.integers(min_value=0, max_value=255)),
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=1000), _flips)
def test_pdf_kernel_total_on_mutations(cut, flips):
    rows = pdf_nodes_doc("d", _mutate(_PDF, cut, flips))
    check_raw_nodes(rows)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_pdf_kernel_total_on_random_bytes(blob):
    check_raw_nodes(pdf_nodes_doc("d", blob))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=1000), _flips)
def test_docx_kernel_total_on_mutations(cut, flips):
    blob = _mutate(_DOCX, cut, flips)
    check_raw_nodes(flatten_docx_doc("d", blob))
    check_spans(docx_spans_doc("d", blob))


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_docx_kernel_total_on_random_bytes(blob):
    check_spans(docx_spans_doc("d", blob))


_hostile_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
    max_size=400,
)
_markupish = st.text(
    alphabet="<>#*`|[]()!&;-=\n\t abcdef\x00\x1f ",
    max_size=400,
)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_hostile_text, _markupish))
def test_md_kernel_total(text):
    check_raw_nodes(flatten_markdown_doc("d", text))
    check_spans(md_spans_doc("d", text))


@settings(max_examples=300, deadline=None)
@given(st.one_of(_hostile_text, _markupish))
def test_html_kernel_total(text):
    check_raw_nodes(flatten_html_doc("d", text))
    check_spans(html_spans_doc("d", text))


# --- round-3 XML/archive first miles: jats / uspto / mets --------------------

from sparkdoc.jatsparse import flatten_jats_doc, jats_spans_doc
from sparkdoc.metsparse import mets_nodes_doc, mets_spans_doc
from sparkdoc.synth import synth_jats_doc, synth_mets_doc, synth_uspto_doc
from sparkdoc.usptoparse import flatten_uspto_doc, uspto_spans_doc

_JATS = synth_jats_doc(3, 42)["jats"]
_USPTO = synth_uspto_doc(3, 42)["uspto"]
_METS = synth_mets_doc(3, 42)["blob"]

_xmlish = st.text(
    alphabet="<>/?!&;#\"'= \n\tabcdefgxmlarticle-",
    max_size=400,
)


def _mutate_text(text: str, cut: int, flips: list[tuple[int, int]]) -> str:
    buf = list(text[: max(1, int(len(text) * cut / 1000))])
    for pos, val in flips:
        if buf:
            buf[pos % len(buf)] = chr(32 + (val % 90))
    return "".join(buf)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=1000), _flips)
def test_jats_kernel_total_on_mutations(cut, flips):
    text = _mutate_text(_JATS, cut, flips)
    check_raw_nodes(flatten_jats_doc("d", text))
    check_spans(jats_spans_doc("d", text))


@settings(max_examples=200, deadline=None)
@given(st.one_of(_hostile_text, _xmlish))
def test_jats_kernel_total_on_random_text(text):
    check_spans(jats_spans_doc("d", text))


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=1000), _flips)
def test_uspto_kernel_total_on_mutations(cut, flips):
    text = _mutate_text(_USPTO, cut, flips)
    check_raw_nodes(flatten_uspto_doc("d", text))
    check_spans(uspto_spans_doc("d", text))


@settings(max_examples=200, deadline=None)
@given(st.one_of(_hostile_text, _xmlish))
def test_uspto_kernel_total_on_random_text(text):
    check_spans(uspto_spans_doc("d", text))


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=1, max_value=1000), _flips)
def test_mets_kernel_total_on_mutations(cut, flips):
    blob = _mutate(_METS, cut, flips)
    check_raw_nodes(mets_nodes_doc("d", blob))
    check_spans(mets_spans_doc("d", blob))


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_mets_kernel_total_on_random_bytes(blob):
    check_spans(mets_spans_doc("d", blob))
