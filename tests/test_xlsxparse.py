"""Raw-XLSX ingestion: SpreadsheetML block parser, span parity, robustness.

Reference analog: Office documents route through docling conversion (input
type detection catch-all DOCUMENT, core/input/types.py); here the OOXML
package is parsed with stdlib zipfile + ElementTree and flows through the
shared single-canvas span pipeline (one heading + one table block per
worksheet).
"""

from __future__ import annotations

import io
import zipfile

import pytest

from sparkdoc.synth import expected_xlsx_spans, synth_xlsx_doc, xlsx_corpus_df
from sparkdoc.xlsxparse import (
    flatten_xlsx,
    xlsx_blocks_doc,
    xlsx_spans_doc,
    xlsx_to_documents,
)

_NS = (
    'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
)


def make_xlsx(
    sheets: list[tuple[str, str]],
    shared: str | None = None,
    rels: bool = True,
    part_names: list[str] | None = None,
) -> bytes:
    """sheets = [(name, sheetData inner xml)]; part_names overrides the
    worksheet member paths (defaults sheet1..N in order)."""
    parts = part_names or [
        f"xl/worksheets/sheet{i + 1}.xml" for i in range(len(sheets))
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        sheets_xml = "".join(
            f'<sheet name="{nm}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (nm, _x) in enumerate(sheets)
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {_NS}><sheets>{sheets_xml}</sheets></workbook>',
        )
        if rels:
            rels_xml = "".join(
                f'<Relationship Id="rId{i + 1}" Type="x" Target="{p[3:]}"/>'
                for i, p in enumerate(parts)
            )
            zf.writestr(
                "xl/_rels/workbook.xml.rels",
                '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                + rels_xml + "</Relationships>",
            )
        if shared is not None:
            zf.writestr(
                "xl/sharedStrings.xml",
                f'<?xml version="1.0"?><sst {_NS}>{shared}</sst>',
            )
        for p, (_nm, data_xml) in zip(parts, sheets):
            zf.writestr(
                p,
                f'<?xml version="1.0"?><worksheet {_NS}><sheetData>{data_xml}</sheetData></worksheet>',
            )
    return buf.getvalue()


def blocks(data: bytes) -> list[tuple]:
    return [(b["tag"], b["text"], b["n_links"]) for b in xlsx_blocks_doc(data)]


def test_shared_inline_number_bool_error_cells():
    xml = (
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="inlineStr"><is><t>inline</t></is></c>'
        '<c r="C1"><v>42.5</v></c>'
        '<c r="D1" t="b"><v>1</v></c>'
        '<c r="E1" t="e"><v>#REF!</v></c>'
        "</row>"
    )
    got = blocks(make_xlsx([("S", xml)], shared="<si><t>shared</t></si>"))
    assert got == [
        ("h2", "S", 0),
        ("table", "shared | inline | 42.5 | TRUE | #REF!", 0),
    ]


def test_rich_text_shared_string_runs_concatenate():
    shared = '<si><r><t xml:space="preserve">hel </t></r><r><t>lo</t></r></si>'
    xml = '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>1</v></c></row>'
    got = blocks(make_xlsx([("S", xml)], shared=shared))
    assert got == [("h2", "S", 0), ("table", "hel lo | 1", 0)]


def test_column_gaps_render_empty_cells():
    xml = '<row r="1"><c r="A1"><v>1</v></c><c r="D1"><v>4</v></c></row>'
    got = blocks(make_xlsx([("S", xml)]))
    assert got == [("h2", "S", 0), ("table", "1 |  |  | 4", 0)]


def test_blank_rows_skipped_and_empty_sheet_heading_only():
    xml = '<row r="1"/><row r="2"><c r="A2" t="inlineStr"><is><t> </t></is></c></row>'
    got = blocks(make_xlsx([("Empty", xml), ("Data", '<row r="1"><c><v>9</v></c><c><v>8</v></c></row>')]))
    assert got == [("h2", "Empty", 0), ("h2", "Data", 0), ("table", "9 | 8", 0)]


def test_sheet_order_resolves_through_rels_not_part_numbering():
    # workbook order (First, Second) but part names are numbered backwards
    got = blocks(
        make_xlsx(
            [("First", '<row r="1"><c><v>1</v></c><c><v>1</v></c></row>'),
             ("Second", '<row r="1"><c><v>2</v></c><c><v>2</v></c></row>')],
            part_names=["xl/worksheets/sheet2.xml", "xl/worksheets/sheet1.xml"],
        )
    )
    assert got == [
        ("h2", "First", 0), ("table", "1 | 1", 0),
        ("h2", "Second", 0), ("table", "2 | 2", 0),
    ]


def test_positional_fallback_without_rels():
    got = blocks(
        make_xlsx([("Only", '<row r="1"><c><v>7</v></c><c><v>7</v></c></row>')],
                  rels=False)
    )
    assert got == [("h2", "Only", 0), ("table", "7 | 7", 0)]


def test_garbage_inputs_yield_empty_docs():
    for blob in (b"", b"PK\x03\x04junk", b"\x00" * 32, b"%PDF-1.4"):
        assert xlsx_spans_doc("d", blob) == []
    # valid zip, workbook present, malformed worksheet XML
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", "<not-closed")
    assert xlsx_spans_doc("d", buf.getvalue()) == []


def test_parser_matches_authored_plan_two_seeds():
    for seed in (42, 7):
        for i in range(30):
            d = synth_xlsx_doc(i, seed)
            got = [(b["tag"], b["text"], b["n_links"]) for b in xlsx_blocks_doc(d["xlsx"])]
            assert got == d["expected"], (seed, d["doc_id"])


def test_spans_kernel_matches_expected_spans():
    exp: dict[str, list] = {}
    for s in expected_xlsx_spans(24, 42):
        exp.setdefault(s["doc_id"], []).append(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
        )
    for i in range(24):
        d = synth_xlsx_doc(i, 42)
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in xlsx_spans_doc(d["doc_id"], d["xlsx"])
        ]
        assert got == exp.get(d["doc_id"], [])


@pytest.fixture(scope="module")
def corpus(spark):
    return xlsx_corpus_df(spark, 12, 42, partitions=4)


def test_fused_path_parity_with_generic_xy_cut_path(spark, corpus):
    from sparkdoc.spans import explode_spans, extract_documents

    a = sorted(tuple(r) for r in explode_spans(xlsx_to_documents(corpus)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_xlsx(corpus))).collect()
    )
    assert a == b and a


def test_fused_plan_is_zero_shuffle(spark, corpus):
    df = xlsx_to_documents(corpus)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_spans_match_closed_form(spark, corpus):
    from sparkdoc.spans import explode_spans

    got = sorted(
        tuple(r)
        for r in explode_spans(xlsx_to_documents(corpus))
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    want = sorted(
        (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_xlsx_spans(12, 42)
    )
    assert got == want
