"""USPTO patent-XML first mile: parser, detection, span parity.

Reference analog: the generic-document handler runs a bare docling
DocumentConverter (core/input/handlers.py:560-563) whose default format
matrix includes USPTO patent XML (grants + applications); here it is a
stdlib-ElementTree walk over a documented subset flowing through the
shared single-canvas span pipeline.
"""

from __future__ import annotations

import pytest

from sparkdoc.synth import (
    expected_uspto_spans,
    synth_uspto_doc,
    uspto_corpus_df,
)
from sparkdoc.usptoparse import (
    flatten_uspto,
    is_uspto,
    uspto_blocks_doc,
    uspto_spans_doc,
    uspto_to_documents,
)

PROLOG = '<?xml version="1.0" encoding="UTF-8"?>'


def ublocks(text: str) -> list[tuple]:
    return [(b["tag"], b["text"], b["n_links"]) for b in uspto_blocks_doc(text)]


def grant(inner: str) -> str:
    return f"{PROLOG}<us-patent-grant>{inner}</us-patent-grant>"


# --- detection ----------------------------------------------------------------


def test_is_uspto_roots_and_doctype():
    assert is_uspto(f"{PROLOG}<us-patent-grant/>")
    assert is_uspto(f"{PROLOG}<us-patent-application/>")
    assert is_uspto(f"{PROLOG}<patent-application-publication/>")
    # decisive doctype, even truncated
    assert is_uspto('<!DOCTYPE us-patent-grant SYSTEM "x.dtd"><us-patent-grant/>')
    assert is_uspto("<!DOCTYPE us-patent-application")
    # non-patent XML is not USPTO
    assert not is_uspto(f"{PROLOG}<article/>")
    assert not is_uspto("<html><body/></html>")
    assert not is_uspto("")


def test_sniffer_routes_uspto():
    from sparkdoc.ingest import mixed_spans_doc, sniff_format

    d = synth_uspto_doc(0, 42)
    assert sniff_format(d["uspto"].encode()) == "uspto"
    fmt, spans = mixed_spans_doc(d["doc_id"], d["uspto"].encode())
    assert fmt == "uspto" and spans
    # JATS still binds for article roots
    assert sniff_format(f"{PROLOG}<article><body/></article>".encode()) == "jats"


# --- structure ------------------------------------------------------------------


def test_title_abstract_description():
    doc = grant(
        "<us-bibliographic-data-grant>"
        "<publication-reference><document-id><doc-number>1234567</doc-number>"
        "</document-id></publication-reference>"
        "<invention-title>Widget <b>assembly</b> device</invention-title>"
        "</us-bibliographic-data-grant>"
        '<abstract id="abstract"><p>A widget.</p></abstract>'
        "<description>"
        '<heading level="1">FIELD</heading><p num="0001">Widgets generally.</p>'
        "<maths><math><mi>x</mi></math></maths>"
        "</description>"
    )
    assert ublocks(doc) == [
        ("h1", "Widget assembly device", 0),
        ("h2", "Abstract", 0),
        ("p", "A widget.", 0),
        ("h2", "FIELD", 0),
        ("p", "Widgets generally.", 0),
    ]


def test_cals_table_and_drawings():
    doc = grant(
        "<description><tables><table><tgroup cols=\"2\">"
        "<thead><row><entry>a</entry><entry>b</entry></row></thead>"
        "<tbody><row><entry>1</entry><entry>2</entry></row></tbody>"
        "</tgroup></table></tables></description>"
        "<drawings><figure id=\"f1\"><img file=\"D1.TIF\"/></figure>"
        "<figure id=\"f2\"><img file=\"D2.TIF\"/></figure></drawings>"
    )
    assert ublocks(doc) == [
        ("table", "a | b\n1 | 2", 0),
        ("img", "", 0),
        ("img", "", 0),
    ]


def test_claims_nested_and_refs():
    doc = grant(
        "<claims>"
        '<claim id="CLM-00001" num="00001"><claim-text>A device comprising: '
        "<claim-text>a widget;</claim-text> "
        "<claim-text>a gadget.</claim-text></claim-text></claim>"
        '<claim id="CLM-00002" num="00002"><claim-text>The device of '
        '<claim-ref idref="CLM-00001">claim 1</claim-ref>, wherein blue.'
        "</claim-text></claim></claims>"
    )
    assert ublocks(doc) == [
        ("h2", "Claims", 0),
        ("li", "A device comprising: a widget; a gadget.", 0),
        ("li", "The device of claim 1, wherein blue.", 0),
    ]


def test_malformed_degrades_to_zero():
    for text in (f"{PROLOG}<us-patent-grant><p>unclosed", "", "<us-patent"):
        assert uspto_spans_doc("d", text) == []


def test_uspto_matches_authored_plan_two_seeds():
    for seed in (42, 7):
        for i in range(30):
            d = synth_uspto_doc(i, seed)
            got = [(b["tag"], b["text"], b["n_links"]) for b in uspto_blocks_doc(d["uspto"])]
            assert got == d["expected"], (seed, d["doc_id"])


# --- distributed parity / plans ----------------------------------------------


@pytest.fixture(scope="module")
def ucorpus(spark):
    return uspto_corpus_df(spark, 12, 42, partitions=4)


def test_uspto_fused_parity_and_zero_shuffle(spark, ucorpus):
    from sparkdoc.spans import explode_spans, extract_documents

    a = sorted(tuple(r) for r in explode_spans(uspto_to_documents(ucorpus)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_uspto(ucorpus))).collect()
    )
    assert a == b and a
    plan = uspto_to_documents(ucorpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_uspto_corpus_matches_closed_form(spark, ucorpus):
    from sparkdoc.spans import explode_spans

    got = sorted(
        tuple(r)
        for r in explode_spans(uspto_to_documents(ucorpus))
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    want = sorted(
        (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_uspto_spans(12, 42)
    )
    assert got == want and got
