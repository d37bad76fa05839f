"""Raw-PPTX ingestion: PresentationML parser, XY-cut reading order over
real slide geometry, span parity, robustness.

Reference analog: Office documents route through docling conversion (input
type detection catch-all DOCUMENT, core/input/types.py); here slides are
genuine PAGES with EMU shape geometry, so PPTX takes the PDF route (classify
→ XY-cut → page_breaks → repeated-text furniture via assemble_spans), not
the single-canvas route.
"""

from __future__ import annotations

import io
import zipfile

import pytest

from sparkdoc.pptxparse import (
    flatten_pptx,
    pptx_nodes_doc,
    pptx_spans_doc,
    pptx_to_documents,
)
from sparkdoc.synth import expected_pptx_spans, pptx_corpus_df, synth_pptx_doc

_NS = (
    'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
)

_EMU = 12700


def sp(text: str, x: int, y: int, w: int = 400, h: int = 20,
       ph: str | None = None, bullet: bool = False, xfrm: bool = True) -> str:
    ph_xml = f'<p:ph type="{ph}"/>' if ph else ""
    xfrm_xml = (
        f'<a:xfrm><a:off x="{x * _EMU}" y="{y * _EMU}"/>'
        f'<a:ext cx="{w * _EMU}" cy="{h * _EMU}"/></a:xfrm>'
    ) if xfrm else ""
    pr = '<a:pPr><a:buChar char="•"/></a:pPr>' if bullet else ""
    return (
        f'<p:sp><p:nvSpPr><p:cNvPr id="1" name="s"/><p:cNvSpPr/>'
        f"<p:nvPr>{ph_xml}</p:nvPr></p:nvSpPr><p:spPr>{xfrm_xml}</p:spPr>"
        f"<p:txBody><a:bodyPr/><a:p>{pr}<a:r><a:t>{text}</a:t></a:r></a:p></p:txBody></p:sp>"
    )


def make_pptx(slides: list[str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        ids = "".join(
            f'<p:sldId id="{256 + i}" r:id="rId{i + 2}"/>' for i in range(len(slides))
        )
        zf.writestr(
            "ppt/presentation.xml",
            f'<?xml version="1.0"?><p:presentation {_NS}>'
            f"<p:sldIdLst>{ids}</p:sldIdLst>"
            '<p:sldSz cx="12192000" cy="6858000"/></p:presentation>',
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 2}" Type="x" Target="slides/slide{i + 1}.xml"/>'
            for i in range(len(slides))
        )
        zf.writestr(
            "ppt/_rels/presentation.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + rels + "</Relationships>",
        )
        for i, body in enumerate(slides):
            zf.writestr(
                f"ppt/slides/slide{i + 1}.xml",
                f'<?xml version="1.0"?><p:sld {_NS}><p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>',
            )
    return buf.getvalue()


def kinds_texts(data: bytes) -> list[tuple]:
    return [(s["kind"], s["text"]) for s in pptx_spans_doc("d", data)]


def test_xy_cut_recovers_reading_order_from_shuffled_shapes():
    # bottom shape FIRST in the XML; geometry must reorder
    slide = sp("below", 40, 300) + sp("above", 40, 100)
    assert kinds_texts(make_pptx([slide])) == [("text", "above"), ("text", "below")]


def test_title_is_h1_on_slide_one_h2_after_and_page_breaks():
    # span text carries the heading LEVEL as a '#'*level prefix (slide-1
    # title = h1, later slide titles = h2) so chunk trails nest
    s1 = sp("Deck title", 40, 20, ph="ctrTitle")
    s2 = sp("Section", 40, 20, ph="title")
    got = kinds_texts(make_pptx([s1, s2]))
    assert got == [
        ("heading", "# Deck title"), ("page_break", ""), ("heading", "## Section"),
    ]


def test_bullets_fields_and_furniture_placeholders():
    slide = (
        sp("point one", 40, 100, bullet=True)
        + sp("confidential", 40, 492, ph="ftr")
        + (
            '<p:sp><p:nvSpPr><p:cNvPr id="9" name="n"/><p:cNvSpPr/>'
            '<p:nvPr><p:ph type="sldNum"/></p:nvPr></p:nvSpPr>'
            f'<p:spPr><a:xfrm><a:off x="{800 * _EMU}" y="{520 * _EMU}"/>'
            f'<a:ext cx="{100 * _EMU}" cy="{16 * _EMU}"/></a:xfrm></p:spPr>'
            '<p:txBody><a:bodyPr/><a:p><a:fld id="{x}" type="slidenum">'
            "<a:t>1</a:t></a:fld></a:p></p:txBody></p:sp>"
        )
    )
    got = kinds_texts(make_pptx([slide]))
    assert got == [
        ("list", "point one"), ("furniture", "confidential"), ("furniture", "1"),
    ]


def test_repeated_text_across_three_slides_becomes_furniture():
    deco = sp("Draft — internal", 40, 400)
    slides = [sp(f"body {i}", 40, 100) + deco for i in range(3)]
    got = kinds_texts(make_pptx(slides))
    assert ("furniture", "Draft — internal") in got
    assert ("text", "Draft — internal") not in got
    # two slides only: stays text
    got2 = kinds_texts(make_pptx(slides[:2]))
    assert ("text", "Draft — internal") in got2


def test_table_and_picture_with_media_ref():
    tbl = (
        '<p:graphicFrame><p:nvGraphicFramePr><p:cNvPr id="3" name="t"/></p:nvGraphicFramePr>'
        f'<p:xfrm><a:off x="{60 * _EMU}" y="{100 * _EMU}"/><a:ext cx="{700 * _EMU}" cy="{60 * _EMU}"/></p:xfrm>'
        '<a:graphic><a:graphicData uri="t"><a:tbl><a:tblGrid/>'
        '<a:tr h="1"><a:tc><a:txBody><a:bodyPr/><a:p><a:r><a:t>a</a:t></a:r></a:p>'
        "<a:p><a:r><a:t>b</a:t></a:r></a:p></a:txBody></a:tc>"
        '<a:tc><a:txBody><a:bodyPr/><a:p><a:r><a:t>c</a:t></a:r></a:p></a:txBody></a:tc></a:tr>'
        "</a:tbl></a:graphicData></a:graphic></p:graphicFrame>"
    )
    pic = (
        '<p:pic><p:nvPicPr><p:cNvPr id="4" name="p" descr="a chart"/>'
        "<p:cNvPicPr/><p:nvPr/></p:nvPicPr>"
        '<p:blipFill><a:blip r:embed="rId9"/></p:blipFill>'
        f'<p:spPr><a:xfrm><a:off x="{300 * _EMU}" y="{200 * _EMU}"/>'
        f'<a:ext cx="{300 * _EMU}" cy="{80 * _EMU}"/></a:xfrm></p:spPr></p:pic>'
    )
    spans = pptx_spans_doc("d", make_pptx([tbl + pic]))
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("table", "a b | c"), ("picture", "a chart"),
    ]
    assert spans[1]["media_ref"] == "#/pictures/2"


def test_xfrm_less_shape_falls_below_content():
    slide = sp("floating", 40, 100, xfrm=False) + sp("placed", 40, 200)
    # the xfrm-less shape is first in the XML but bands below the slide
    assert kinds_texts(make_pptx([slide])) == [
        ("text", "placed"), ("text", "floating"),
    ]


def test_empty_paragraphs_blank_dropped():
    slide = (
        '<p:sp><p:nvSpPr><p:cNvPr id="1" name="s"/><p:cNvSpPr/><p:nvPr/></p:nvSpPr>'
        f'<p:spPr><a:xfrm><a:off x="{40 * _EMU}" y="{100 * _EMU}"/>'
        f'<a:ext cx="{400 * _EMU}" cy="{54 * _EMU}"/></a:xfrm></p:spPr>'
        "<p:txBody><a:bodyPr/><a:p/><a:p><a:r><a:t>kept</a:t></a:r></a:p>"
        '<a:p><a:r><a:t xml:space="preserve">   </a:t></a:r></a:p></p:txBody></p:sp>'
    )
    assert kinds_texts(make_pptx([slide])) == [("text", "kept")]


def test_garbage_inputs_yield_empty_docs():
    for blob in (b"", b"PK\x03\x04junk", b"\x00" * 32, bytes(range(256))):
        assert pptx_spans_doc("d", blob) == []
    # presentation.xml present but malformed
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/presentation.xml", "<broken")
    assert pptx_spans_doc("d", buf.getvalue()) == []


def test_parser_matches_authored_plan_two_seeds():
    from sparkdoc.synth import _expected_pptx_doc

    for seed in (42, 7):
        for i in range(30):
            d = synth_pptx_doc(i, seed)
            exp = [
                (r["offset"], r["kind"], r["text"], r["media_ref"])
                for r in _expected_pptx_doc(d)
            ]
            got = [
                (s["offset"], s["kind"], s["text"], s["media_ref"])
                for s in pptx_spans_doc(d["doc_id"], d["pptx"])
            ]
            assert got == exp, (seed, d["doc_id"])


def test_nodes_carry_real_geometry_and_pages():
    d = synth_pptx_doc(3, 42)
    nodes = pptx_nodes_doc(d["doc_id"], d["pptx"])
    assert nodes
    pages = {n["page_no"] for n in nodes}
    assert pages == set(range(1, max(pages) + 1))
    for n in nodes:
        l, t, r, b = n["bbox"]
        assert l < r and t < b
        assert n["coord_origin"] == "TOPLEFT"
        assert n["page_width"] == 960 and n["page_height"] == 540


@pytest.fixture(scope="module")
def corpus(spark):
    return pptx_corpus_df(spark, 12, 42, partitions=4)


def test_fused_path_parity_with_generic_xy_cut_path(spark, corpus):
    from sparkdoc.spans import explode_spans, extract_documents

    a = sorted(tuple(r) for r in explode_spans(pptx_to_documents(corpus)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_pptx(corpus))).collect()
    )
    assert a == b and a


def test_fused_plan_is_zero_shuffle(spark, corpus):
    df = pptx_to_documents(corpus)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_spans_match_closed_form(spark, corpus):
    from sparkdoc.spans import explode_spans

    got = sorted(
        tuple(r)
        for r in explode_spans(pptx_to_documents(corpus))
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    want = sorted(
        (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_pptx_spans(12, 42)
    )
    assert got == want
