"""JATS XML first mile: parser, detection, span parity, robustness.

Reference analog: the generic-document handler runs a bare docling
DocumentConverter (core/input/handlers.py:560-563) whose default format
matrix includes JATS XML (NISO Z39.96 journal articles); here it is a
stdlib-ElementTree walk over a documented subset flowing through the
shared single-canvas span pipeline.
"""

from __future__ import annotations

import pytest

from sparkdoc.jatsparse import (
    flatten_jats,
    is_jats,
    jats_blocks_doc,
    jats_spans_doc,
    jats_to_documents,
)
from sparkdoc.synth import (
    expected_jats_spans,
    jats_corpus_df,
    synth_jats_doc,
)

PROLOG = '<?xml version="1.0" encoding="UTF-8"?>'


def jblocks(text: str) -> list[tuple]:
    return [(b["tag"], b["text"], b["n_links"]) for b in jats_blocks_doc(text)]


def art(inner: str) -> str:
    return f"{PROLOG}<article><front><article-meta>{inner}</article-meta></front></article>"


def body(inner: str) -> str:
    return f"{PROLOG}<article><body>{inner}</body></article>"


# --- detection ----------------------------------------------------------------


def test_is_jats_requires_xml_evidence():
    # prolog + article root binds
    assert is_jats(f"{PROLOG}<article><body/></article>")
    # doctype naming article binds, even without a prolog
    assert is_jats('<!DOCTYPE article SYSTEM "JATS.dtd"><article/>')
    # dtd-version / xmlns attributes bind without a prolog
    assert is_jats('<article dtd-version="1.3"><body/></article>')
    assert is_jats('<article xmlns:xlink="http://www.w3.org/1999/xlink"/>')
    # a bare HTML5 <article> fragment is NOT JATS
    assert not is_jats("<article><p>hi</p></article>")
    # XHTML: prolog but root is html, not article
    assert not is_jats(f'{PROLOG}<html xmlns="http://www.w3.org/1999/xhtml"/>')
    # comments/PIs before the root are tolerated
    assert is_jats(f"{PROLOG}<!-- x --><?pi data?><article/>")
    # <!DOCTYPE article is decisive even with an internal DTD subset
    assert is_jats('<!DOCTYPE article [ <!ENTITY deg "&#176;"> ]><article/>')
    # truncated constructs never crash (a truncated article doctype still
    # sniffs jats — the parser then degrades it to zero blocks)
    assert is_jats("<!DOCTYPE article")
    for s in ("<?xml", "<!--", "", "<", "<!DOCTYPE html"):
        assert not is_jats(s)


def test_sniffer_binds_jats_before_html_markers():
    from sparkdoc.ingest import mixed_spans_doc, sniff_format

    d = synth_jats_doc(0, 42)
    assert sniff_format(d["jats"].encode()) == "jats"
    fmt, spans = mixed_spans_doc(d["doc_id"], d["jats"].encode())
    assert fmt == "jats" and spans
    # HTML5 article fragment still routes to the HTML parser
    assert sniff_format(b"<article><p>hi</p></article>") == "html"
    # XHTML prolog does not steal into jats
    assert (
        sniff_format(
            b'<?xml version="1.0"?><html xmlns="http://www.w3.org/1999/xhtml">'
            b"<body><p>x</p></body></html>"
        )
        == "html"
    )
    # our own DocLang serialization keeps winning the <?xml race
    assert sniff_format(b'<?xml version="1.0"?><doc><text>x</text></doc>') == "doclang"


# --- front matter ---------------------------------------------------------------


def test_front_title_contributors_abstract():
    doc = art(
        "<title-group><article-title>Deep <italic>results</italic> here</article-title></title-group>"
        '<contrib-group><contrib><name><surname>Curie</surname>'
        "<given-names>Marie</given-names></name></contrib>"
        "<contrib><collab>ATLAS Collaboration</collab></contrib></contrib-group>"
        "<abstract><p>First point.</p><p>Second point.</p></abstract>"
    )
    assert jblocks(doc) == [
        ("h1", "Deep results here", 0),
        ("p", "Marie Curie; ATLAS Collaboration", 0),
        ("h2", "Abstract", 0),
        ("p", "First point.", 0),
        ("p", "Second point.", 0),
    ]


def test_abstract_title_and_journal_meta_skip():
    doc = (
        f"{PROLOG}<article><front>"
        "<journal-meta><journal-title-group><journal-title>Junk</journal-title>"
        "</journal-title-group></journal-meta>"
        "<article-meta><abstract><title>Summary</title><p>Body.</p></abstract>"
        "</article-meta></front></article>"
    )
    assert jblocks(doc) == [("h2", "Summary", 0), ("p", "Body.", 0)]


# --- body structure -------------------------------------------------------------


def test_sec_depth_headings_cap_at_h6():
    inner, closers = "", ""
    for i in range(7):
        inner += f"<sec><title>L{i}</title>"
        closers += "</sec>"
    doc = body(inner + closers)
    tags = [t for t, _x, _n in jblocks(doc)]
    assert tags == ["h2", "h3", "h4", "h5", "h6", "h6", "h6"]


def test_paragraph_inline_flatten_and_link_chars():
    doc = body(
        '<p>see <ext-link ext-link-type="uri" xlink:href="https://x.io">the docs</ext-link>'
        ' now <xref rid="r1">[1]</xref></p>'
    )
    # needs xlink declared — is_jats passes via prolog; ET needs the ns
    doc = doc.replace("<article>", '<article xmlns:xlink="http://www.w3.org/1999/xlink">')
    assert jblocks(doc) == [("p", "see the docs now [1]", len("the docs"))]


def test_lists_nested_items_in_order():
    doc = body(
        '<list list-type="bullet">'
        "<list-item><p>one</p></list-item>"
        '<list-item><p>two</p><list list-type="order">'
        "<list-item><p>two-a</p></list-item></list></list-item>"
        "<list-item><p>three</p></list-item></list>"
    )
    assert jblocks(doc) == [
        ("li", "one", 0), ("li", "two", 0), ("li", "two-a", 0), ("li", "three", 0),
    ]


def test_fig_caption_alt_text_combinations():
    doc = body(
        '<fig id="f1"><label>Figure 1</label><caption><p>A chart.</p></caption>'
        '<graphic href="f1.jpg"/></fig>'
        '<fig id="f2"><alt-text>bars over time</alt-text><graphic href="f2.jpg"/></fig>'
        '<fig id="f3"><graphic href="f3.jpg"/></fig>'
    )
    assert jblocks(doc) == [
        ("figcaption", "Figure 1 A chart.", 0), ("img", "", 0),
        ("img", "bars over time", 0),
        ("img", "", 0),
    ]


def test_table_wrap_rows_and_caption():
    doc = body(
        '<table-wrap id="t1"><label>Table 2</label><caption><p>Results.</p></caption>'
        "<table><thead><tr><th>a</th><th>b</th></tr></thead>"
        "<tbody><tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr></tbody>"
        "</table></table-wrap>"
    )
    assert jblocks(doc) == [
        ("p", "Table 2 Results.", 0),
        ("table", "a | b\n1 | 2\n3 | 4", 0),
    ]


def test_preformat_verbatim_and_transparent_containers():
    doc = body(
        "<preformat>\ndef f(x):\n    return x\n</preformat>"
        "<disp-quote><p>quoted words</p></disp-quote>"
        '<supplementary-material href="s.zip"><label>S1</label></supplementary-material>'
    )
    assert jblocks(doc) == [
        ("p", "def f(x):\n    return x", 0),
        ("p", "quoted words", 0),
    ]


def test_back_ack_and_ref_list_defaults():
    doc = (
        f"{PROLOG}<article><back>"
        "<ack><p>Thanks all.</p></ack>"
        "<ref-list><ref><label>1.</label> <mixed-citation>Smith (2020). Title.</mixed-citation></ref>"
        "</ref-list></back></article>"
    )
    assert jblocks(doc) == [
        ("h2", "Acknowledgments", 0),
        ("p", "Thanks all.", 0),
        ("h2", "References", 0),
        ("li", "1. Smith (2020). Title.", 0),
    ]


def test_entities_unescape_and_namespaced_tags():
    doc = body("<p>A &amp; B when x &lt; 2.</p>").replace(
        "<article>", '<article xmlns="https://jats.nlm.nih.gov">'
    )
    assert jblocks(doc) == [("p", "A & B when x < 2.", 0)]


def test_malformed_xml_degrades_to_zero_blocks():
    for text in (
        f"{PROLOG}<article><body><p>unclosed</body></article>",
        f"{PROLOG}<article><p>&undefined;</p></article>",
        f"{PROLOG}<article",
        "",
    ):
        assert jats_spans_doc("d", text) == []


def test_jats_matches_authored_plan_two_seeds():
    for seed in (42, 7):
        for i in range(30):
            d = synth_jats_doc(i, seed)
            got = [(b["tag"], b["text"], b["n_links"]) for b in jats_blocks_doc(d["jats"])]
            assert got == d["expected"], (seed, d["doc_id"])


# --- distributed parity / plans ----------------------------------------------


@pytest.fixture(scope="module")
def jcorpus(spark):
    return jats_corpus_df(spark, 12, 42, partitions=4)


def test_jats_fused_parity_and_zero_shuffle(spark, jcorpus):
    from sparkdoc.spans import explode_spans, extract_documents

    a = sorted(tuple(r) for r in explode_spans(jats_to_documents(jcorpus)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_jats(jcorpus))).collect()
    )
    assert a == b and a
    plan = jats_to_documents(jcorpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_jats_corpus_matches_closed_form(spark, jcorpus):
    from sparkdoc.spans import explode_spans

    got = sorted(
        tuple(r)
        for r in explode_spans(jats_to_documents(jcorpus))
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    want = sorted(
        (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_jats_spans(12, 42)
    )
    assert got == want and got
