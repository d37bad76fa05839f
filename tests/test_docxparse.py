"""Raw-DOCX ingestion: OOXML block parser, span parity, robustness.

Reference analog: Office documents route through docling conversion (input
type detection catch-all DOCUMENT, core/input/types.py); here the OOXML
package is parsed with stdlib zipfile + ElementTree and flows through the
shared single-canvas span pipeline.
"""

from __future__ import annotations

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from sparkdoc.docxparse import (
    docx_blocks_doc,
    docx_spans_doc,
    docx_to_documents,
    flatten_docx,
)
from sparkdoc.synth import docx_corpus_df, expected_docx_spans, synth_docx_doc

_NS = (
    'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" '
    'xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
)


def make_docx(body_xml: str, extra: dict[str, str] | None = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "word/document.xml",
            f'<?xml version="1.0"?><w:document {_NS}><w:body>{body_xml}</w:body></w:document>',
        )
        for name, xml in (extra or {}).items():
            zf.writestr(name, xml)
    return buf.getvalue()


def blocks(body_xml: str, extra=None) -> list[tuple]:
    return [
        (b["tag"], b["text"], b["n_links"])
        for b in docx_blocks_doc(make_docx(body_xml, extra))
    ]


def test_split_runs_concatenate_exactly():
    xml = (
        '<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>hel</w:t></w:r>'
        '<w:r><w:t xml:space="preserve">lo wor</w:t></w:r><w:r><w:t>ld</w:t></w:r></w:p>'
    )
    assert blocks(xml) == [("p", "hello world", 0)]


def test_heading_styles_and_title():
    xml = (
        '<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>H</w:t></w:r></w:p>'
        '<w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr><w:r><w:t>T</w:t></w:r></w:p>'
    )
    assert blocks(xml) == [("h2", "H", 0), ("h1", "T", 0)]


def test_numpr_is_list_item():
    xml = (
        '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr>'
        "<w:r><w:t>item</w:t></w:r></w:p>"
    )
    assert blocks(xml) == [("li", "item", 0)]


def test_hyperlink_chars_feed_n_links():
    xml = (
        '<w:p><w:r><w:t xml:space="preserve">see </w:t></w:r>'
        '<w:hyperlink r:id="rId9"><w:r><w:t>the docs</w:t></w:r></w:hyperlink></w:p>'
    )
    assert blocks(xml) == [("p", "see the docs", len("the docs"))]


def test_br_and_tab_render_as_spaces():
    xml = "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t><w:tab/><w:t>c</w:t></w:r></w:p>"
    assert blocks(xml) == [("p", "a b c", 0)]


def test_table_cells_rows_and_multi_paragraph_cells():
    xml = (
        "<w:tbl><w:tr>"
        "<w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>c</w:t></w:r></w:p></w:tc>"
        "</w:tr><w:tr>"
        "<w:tc><w:p><w:r><w:t>d</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>e</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
    )
    assert blocks(xml) == [("table", "a b | c\nd | e", 0)]


def test_drawing_alt_text_and_empty_descr():
    xml = (
        '<w:p><w:r><w:drawing><wp:inline><wp:docPr id="1" name="Picture 1" descr="a chart"/>'
        "</wp:inline></w:drawing></w:r></w:p>"
        '<w:p><w:r><w:drawing><wp:inline><wp:docPr id="2" name="Picture 2" descr=""/>'
        "</wp:inline></w:drawing></w:r></w:p>"
        '<w:p><w:r><w:drawing><wp:inline><wp:docPr id="3" name="Picture 3"/>'
        "</wp:inline></w:drawing></w:r></w:p>"
    )
    # explicit empty descr stays empty; missing descr falls back to name
    assert blocks(xml) == [
        ("img", "a chart", 0), ("img", "", 0), ("img", "Picture 3", 0),
    ]


def test_text_then_drawing_yields_text_block_then_img():
    xml = (
        '<w:p><w:r><w:t>caption-ish text</w:t></w:r>'
        '<w:r><w:drawing><wp:inline><wp:docPr id="1" name="P" descr="chart"/>'
        "</wp:inline></w:drawing></w:r></w:p>"
    )
    assert blocks(xml) == [("p", "caption-ish text", 0), ("img", "chart", 0)]


def test_empty_paragraph_survives_to_blank_drop():
    assert blocks("<w:p/>") == [("p", "", 0)]


def test_header_footer_parts_become_furniture():
    furn = (
        f'<?xml version="1.0"?><w:hdr {_NS}>'
        "<w:p><w:r><w:t>top</w:t></w:r></w:p></w:hdr>"
    )
    furn_f = furn.replace("hdr", "ftr").replace("top", "bottom")
    got = blocks(
        "<w:p><w:r><w:t>body</w:t></w:r></w:p>",
        {"word/header1.xml": furn, "word/footer1.xml": furn_f},
    )
    assert got == [("header", "top", 0), ("p", "body", 0), ("footer", "bottom", 0)]


def test_entities_and_unicode_roundtrip():
    xml = "<w:p><w:r><w:t>R&amp;D &lt;5% naïve café</w:t></w:r></w:p>"
    assert blocks(xml) == [("p", "R&D <5% naïve café", 0)]


def test_garbage_inputs_yield_empty_docs():
    assert docx_blocks_doc(b"") == []
    assert docx_blocks_doc(b"not a zip") == []
    assert docx_blocks_doc(None) == []
    # zip without document.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    assert docx_blocks_doc(buf.getvalue()) == []


def test_parser_matches_authored_plan_two_seeds():
    for seed in (42, 7):
        for i in range(30):
            d = synth_docx_doc(i, seed)
            got = [
                (b["tag"], b["text"], b["n_links"])
                for b in docx_blocks_doc(d["docx"])
            ]
            assert got == d["expected"], (seed, d["doc_id"])


def test_spans_kernel_matches_expected_spans():
    exp: dict[str, list] = {}
    for s in expected_docx_spans(24, 42):
        exp.setdefault(s["doc_id"], []).append(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
        )
    for i in range(24):
        d = synth_docx_doc(i, 42)
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in docx_spans_doc(d["doc_id"], d["docx"])
        ]
        assert got == exp.get(d["doc_id"], [])


@pytest.fixture(scope="module")
def corpus(spark):
    return docx_corpus_df(spark, 12, 42, partitions=4)


def test_fused_path_parity_with_generic_xy_cut_path(spark, corpus):
    from sparkdoc.spans import explode_spans, extract_documents

    a = sorted(tuple(r) for r in explode_spans(docx_to_documents(corpus)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_docx(corpus))).collect()
    )
    assert a == b and a


def test_fused_plan_is_zero_shuffle(spark, corpus):
    df = docx_to_documents(corpus)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_spans_match_closed_form(spark, corpus):
    from sparkdoc.spans import explode_spans

    got = sorted(
        tuple(r)
        for r in explode_spans(docx_to_documents(corpus))
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    want = sorted(
        (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_docx_spans(12, 42)
    )
    assert got == want
