"""Raw-PDF ingestion: object layer, content interpreter, layout clustering.

Reference analog: PDF sources go through docling conversion
(core/extractors/document_processor.py:262-327); here real PDF bytes are
parsed from scratch and the existing classify → XY-cut pipeline derives
reading order from the recovered bounding boxes.  The writer (pdfgen) and
parser (pdfparse) are adversaries: the parser never sees the authored plan.
"""

from __future__ import annotations

import zlib

import pytest

from sparkdoc.pdfgen import render_pdf, text_block_ops, table_ops, image_ops
from sparkdoc.pdfparse import (
    _content_runs,
    _parse_string,
    _parse_value,
    _scan_objects,
    flatten_pdf,
    pdf_nodes_doc,
)
from sparkdoc.synth import expected_pdf_spans, pdf_corpus_df, synth_pdf_doc

PAGE_W, PAGE_H = 612, 792


def one_page_pdf(*op_groups: bytes) -> bytes:
    return render_pdf([b"\n".join(op_groups)], PAGE_W, PAGE_H)


# --------------------------------------------------------------------------
# Object layer
# --------------------------------------------------------------------------


def test_parse_value_nested_dicts_arrays_refs():
    v, _ = _parse_value(
        b"<< /A [1 2 0 R /Name] /B << /C (str\\)x) /D 3.5 >> >>", 0
    )
    assert v["A"][0] == 1 and v["A"][1].num == 2 and v["A"][2] == "/Name"
    assert v["B"]["C"] == b"str)x" and v["B"]["D"] == 3.5


def test_parse_string_escapes_and_nesting():
    s, _ = _parse_string(b"(a\\(b\\)c (nested) \\101\\n)", 0)
    assert s == b"a(b)c (nested) A\n"


def test_scan_objects_skips_stream_payload_via_length():
    # a stream whose payload contains 'endobj' and a fake object header
    payload = b"xx endobj 9 0 obj yy"
    data = (
        b"1 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"2 0 obj\n<< /Type /Page >>\nendobj\n" % (len(payload), payload)
    )
    objs = _scan_objects(data)
    assert objs[1][1] == payload
    assert 9 not in objs and objs[2][0]["Type"] == "/Page"


def test_render_pdf_has_valid_header_xref_trailer():
    pdf = one_page_pdf(text_block_ops(36, 60, 10, False, ["hello"], PAGE_H))
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    # xref offsets point at the right objects
    xref_at = int(pdf.split(b"startxref\n")[1].split(b"\n")[0])
    assert pdf[xref_at : xref_at + 4] == b"xref"


# --------------------------------------------------------------------------
# Content interpreter
# --------------------------------------------------------------------------


def test_text_ops_roundtrip_with_tstar_and_tj_kern():
    ops = text_block_ops(36, 60, 10, False, ["first line", "second line"],
                         PAGE_H, kern_splits=[5, 0])
    runs, images = _content_runs(ops)
    texts = [r[4] for r in runs]
    assert "".join(texts[:2]) == "first line"  # TJ split into two runs
    assert texts[2] == "second line"
    assert not images
    # baseline advanced by the leading
    assert runs[0][1] - runs[2][1] == 13


def test_cp1252_accents_survive():
    ops = text_block_ops(36, 60, 10, False, ["café — naïve •"], PAGE_H)
    runs, _ = _content_runs(ops)
    assert runs[0][4] == "café — naïve •"


def test_image_cm_do_box():
    runs, images = _content_runs(image_ops(50, 100, 120, 80, PAGE_H))
    assert not runs
    (x, y_bottom, w, h) = images[0]
    assert (x, w, h) == (50, 120, 80)
    assert y_bottom == PAGE_H - 100 - 80


def test_unknown_operators_are_skipped():
    runs, _ = _content_runs(
        b"0.5 g 1 0 0 1 10 10 cm W n BT /F1 10 Tf 1 0 0 1 36 700 Tm (ok) Tj ET"
    )
    assert [r[4] for r in runs] == ["ok"]


# --------------------------------------------------------------------------
# Layout clustering on hand-built pages
# --------------------------------------------------------------------------


def test_same_baseline_across_columns_does_not_merge():
    left = text_block_ops(36, 300, 10, False, ["left col text"], PAGE_H)
    right = text_block_ops(330, 300, 10, False, ["right col text"], PAGE_H)
    rows = pdf_nodes_doc("d", one_page_pdf(left, right))
    texts = sorted(r["text"] for r in rows)
    assert texts == ["left col text", "right col text"]


def test_table_cells_cluster_into_rows_and_columns():
    ops = table_ops(36, 200, 10, [36, 216, 396],
                    [["a", "b", "c"], ["d", "e", "f"]], PAGE_H)
    rows = pdf_nodes_doc("d", one_page_pdf(ops))
    assert [r["tag"] for r in rows] == ["table"]
    assert rows[0]["text"] == "a | b | c\nd | e | f"


def test_bullet_lines_become_list_items():
    ops = b"\n".join(
        text_block_ops(36, 200 + 15 * i, 10, False, [f"• item {i}"], PAGE_H)
        for i in range(3)
    )
    rows = pdf_nodes_doc("d", one_page_pdf(ops))
    assert [r["tag"] for r in rows] == ["li", "li", "li"]


def test_bold_sizes_map_to_heading_levels():
    ops = b"\n".join([
        text_block_ops(36, 60, 18, True, ["big"], PAGE_H),
        text_block_ops(36, 120, 15, True, ["mid"], PAGE_H),
        text_block_ops(36, 180, 13, True, ["small"], PAGE_H),
        text_block_ops(36, 240, 10, False, ["body"], PAGE_H),
    ])
    rows = pdf_nodes_doc("d", one_page_pdf(ops))
    assert [(r["tag"], r["text"]) for r in rows] == [
        ("h1", "big"), ("h2", "mid"), ("h3", "small"), ("p", "body"),
    ]


def test_positional_furniture_margins():
    ops = b"\n".join([
        text_block_ops(36, 10, 8, False, ["top matter"], PAGE_H),
        text_block_ops(36, 400, 10, False, ["body"], PAGE_H),
        text_block_ops(36, PAGE_H - 22, 8, False, ["Page 1"], PAGE_H),
    ])
    rows = pdf_nodes_doc("d", one_page_pdf(ops))
    assert [(r["tag"], r["text"]) for r in rows] == [
        ("header", "top matter"), ("p", "body"), ("footer", "Page 1"),
    ]


def test_wrapped_paragraph_joins_lines_with_spaces():
    ops = text_block_ops(36, 300, 10, False, ["one two", "three four"], PAGE_H)
    rows = pdf_nodes_doc("d", one_page_pdf(ops))
    assert [(r["tag"], r["text"]) for r in rows] == [("p", "one two three four")]


def test_garbage_and_empty_inputs_yield_empty_docs():
    assert pdf_nodes_doc("d", b"") == []
    assert pdf_nodes_doc("d", b"not a pdf at all") == []
    assert pdf_nodes_doc("d", None) == []
    # truncated real pdf: tolerate, never raise
    pdf = one_page_pdf(text_block_ops(36, 60, 10, False, ["x"], PAGE_H))
    pdf_nodes_doc("d", pdf[: len(pdf) // 2])


def test_real_bboxes_and_pages():
    d = synth_pdf_doc(3, 42)
    rows = pdf_nodes_doc(d["doc_id"], d["pdf"])
    assert all(r["coord_origin"] == "TOPLEFT" for r in rows)
    assert all(r["page_width"] == PAGE_W and r["page_height"] == PAGE_H for r in rows)
    assert all(r["bbox"][0] < r["bbox"][2] and r["bbox"][1] < r["bbox"][3] for r in rows)
    assert {r["page_no"] for r in rows} == set(range(1, max(r["page_no"] for r in rows) + 1))


# --------------------------------------------------------------------------
# Corpus parity (driver-side, two seeds)
# --------------------------------------------------------------------------


def test_parser_matches_authored_node_order_two_seeds():
    for seed in (42, 7):
        for i in range(30):
            d = synth_pdf_doc(i, seed)
            got = [
                (r["page_no"], r["tag"], r["text"])
                for r in pdf_nodes_doc(d["doc_id"], d["pdf"])
            ]
            assert got == list(d["node_order"]), (seed, d["doc_id"])


# --------------------------------------------------------------------------
# Spark: full pipeline (classify → XY-cut → spans) vs closed form
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    return pdf_corpus_df(spark, 16, 42, partitions=4)


def test_pipeline_spans_match_closed_form(spark, corpus):
    from sparkdoc.spans import explode_spans, extract_documents

    got = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_pdf(corpus)))
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    want = sorted(
        (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_pdf_spans(16, 42)
    )
    assert got == want


def test_chunker_runs_on_pdf_documents(spark, corpus):
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.spans import extract_documents

    chunks = chunk_documents(extract_documents(flatten_pdf(corpus)))
    assert chunks.count() > 0
