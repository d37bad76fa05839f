"""AsciiDoc + WebVTT first miles: parsers, span parity, robustness.

Reference analog: the generic-document handler runs a bare docling
DocumentConverter (core/input/handlers.py:560-563) whose default format
matrix includes AsciiDoc and WebVTT; here both are stdlib line parsers over
documented subsets flowing through the shared single-canvas span pipeline.
"""

from __future__ import annotations

import pytest

from sparkdoc.adocparse import (
    adoc_blocks_doc,
    adoc_spans_doc,
    adoc_to_documents,
    flatten_adoc,
)
from sparkdoc.synth import (
    adoc_corpus_df,
    expected_adoc_spans,
    expected_vtt_spans,
    synth_adoc_doc,
    synth_vtt_doc,
    vtt_corpus_df,
)
from sparkdoc.vttparse import (
    flatten_vtt,
    is_vtt,
    vtt_blocks_doc,
    vtt_spans_doc,
    vtt_to_documents,
)


def ablocks(text: str) -> list[tuple]:
    return [(b["tag"], b["text"], b["n_links"]) for b in adoc_blocks_doc(text)]


# --- AsciiDoc parser ---------------------------------------------------------


def test_adoc_title_sections_and_attributes():
    doc = "= Title\n:toc: left\n:author: x\n\nbody text\n\n== Section\n\n=== Sub\n"
    assert ablocks(doc) == [
        ("h1", "Title", 0), ("p", "body text", 0),
        ("h2", "Section", 0), ("h3", "Sub", 0),
    ]


def test_adoc_hard_wrap_and_inline_strip():
    doc = "first *bold* line\nsecond _em_ line\nthird `mono` line\n"
    assert ablocks(doc) == [("p", "first bold line second em line third mono line", 0)]


def test_adoc_link_macros_feed_n_links_bare_urls_do_not():
    doc = "see link:/a.html[the docs] now\n\nvisit https://x.io/p[our site]\n\nraw https://x.io/q here\n"
    assert ablocks(doc) == [
        ("p", "see the docs now", len("the docs")),
        ("p", "visit our site", len("our site")),
        ("p", "raw https://x.io/q here", 0),
    ]


def test_adoc_lists_tables_images():
    doc = (
        "* one\n* two\n\n. first\n. second\n\n|===\n|a|b\n|c|d\n|===\n\n"
        "image::x.png[a chart]\n\nimage::y.png[]\n"
    )
    assert ablocks(doc) == [
        ("li", "one", 0), ("li", "two", 0),
        ("li", "first", 0), ("li", "second", 0),
        ("table", "a | b\nc | d", 0),
        ("img", "a chart", 0), ("img", "", 0),
    ]


def test_adoc_literal_fence_shields_markup():
    doc = "----\n== not a heading\n* not a bullet\n----\n"
    assert ablocks(doc) == [("p", "== not a heading\n* not a bullet", 0)]


def test_adoc_comments_and_block_attrs_skipped():
    doc = "// comment\n[source,python]\npara text\n"
    assert ablocks(doc) == [("p", "para text", 0)]


def test_adoc_matches_authored_plan_two_seeds():
    for seed in (42, 7):
        for i in range(30):
            d = synth_adoc_doc(i, seed)
            got = [(b["tag"], b["text"], b["n_links"]) for b in adoc_blocks_doc(d["adoc"])]
            assert got == d["expected"], (seed, d["doc_id"])


def test_adoc_garbage_never_crashes():
    for text in ("", "|===\n|a", "----\nnever closed", "= ", "===", "\x00x"):
        assert isinstance(adoc_spans_doc("d", text), list)


# --- WebVTT parser -----------------------------------------------------------


def test_vtt_signature():
    assert is_vtt("WEBVTT")
    assert is_vtt("WEBVTT - notes\n")
    assert is_vtt("WEBVTT\n00:00.000 --> 00:01.000\nhi")
    assert not is_vtt("WEBVTTX")
    assert not is_vtt("webvtt\n")


def test_vtt_cues_ids_voice_and_tag_strip():
    doc = (
        "WEBVTT\n\n1\n00:00.000 --> 00:02.000\n<v Ana>hello there</v>\n\n"
        "00:02.000 --> 00:04.000 align:start\n<i>soft</i> <00:00:03.000>words\n\n"
        "NOTE\nthis is skipped\n\n"
        "00:04.000 --> 00:06.000\nline one\nline two\n"
    )
    assert [(b["tag"], b["text"]) for b in vtt_blocks_doc(doc)] == [
        ("p", "Ana: hello there"),
        ("p", "soft words"),
        ("p", "line one line two"),
    ]


def test_vtt_style_and_header_metadata_skipped():
    doc = (
        "WEBVTT\nKind: captions\nLanguage: en\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "00:00.000 --> 00:01.000\ncontent\n"
    )
    assert [(b["tag"], b["text"]) for b in vtt_blocks_doc(doc)] == [("p", "content")]


def test_vtt_non_vtt_yields_nothing():
    assert vtt_blocks_doc("not a vtt file") == []
    assert vtt_spans_doc("d", "") == []


def test_vtt_matches_authored_plan_two_seeds():
    for seed in (42, 7):
        for i in range(30):
            d = synth_vtt_doc(i, seed)
            got = [(b["tag"], b["text"], b["n_links"]) for b in vtt_blocks_doc(d["vtt"])]
            assert got == d["expected"], (seed, d["doc_id"])


# --- distributed parity / plans ----------------------------------------------


@pytest.fixture(scope="module")
def acorpus(spark):
    return adoc_corpus_df(spark, 12, 42, partitions=4)


@pytest.fixture(scope="module")
def vcorpus(spark):
    return vtt_corpus_df(spark, 12, 42, partitions=4)


def test_adoc_fused_parity_and_zero_shuffle(spark, acorpus):
    from sparkdoc.spans import explode_spans, extract_documents

    a = sorted(tuple(r) for r in explode_spans(adoc_to_documents(acorpus)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_adoc(acorpus))).collect()
    )
    assert a == b and a
    plan = adoc_to_documents(acorpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vtt_fused_parity_and_zero_shuffle(spark, vcorpus):
    from sparkdoc.spans import explode_spans, extract_documents

    a = sorted(tuple(r) for r in explode_spans(vtt_to_documents(vcorpus)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_vtt(vcorpus))).collect()
    )
    assert a == b and a
    plan = vtt_to_documents(vcorpus)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpora_match_closed_forms(spark, acorpus, vcorpus):
    from sparkdoc.spans import explode_spans

    for docs, expected in (
        (adoc_to_documents(acorpus), expected_adoc_spans(12, 42)),
        (vtt_to_documents(vcorpus), expected_vtt_spans(12, 42)),
    ):
        got = sorted(
            tuple(r)
            for r in explode_spans(docs)
            .select("doc_id", "kind", "text", "media_ref", "offset")
            .collect()
        )
        want = sorted(
            (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in expected
        )
        assert got == want and got


def test_sniffer_routes_adoc_and_vtt():
    from sparkdoc.ingest import mixed_spans_doc, sniff_format

    d = synth_adoc_doc(0, 42)
    assert sniff_format(d["adoc"].encode()) == "asciidoc"
    fmt, spans = mixed_spans_doc(d["doc_id"], d["adoc"].encode())
    assert fmt == "asciidoc" and spans
    v = synth_vtt_doc(0, 42)
    assert sniff_format(v["vtt"].encode()) == "vtt"
    fmt, spans = mixed_spans_doc(v["doc_id"], v["vtt"].encode())
    assert fmt == "vtt" and spans
    # a cue payload full of <i> tags must not trip the HTML sniff
    assert sniff_format(b"WEBVTT\n\n00:00.000 --> 00:01.000\n<i>hi</i> <b>yo</b>\n") == "vtt"
    # markdown setext underline is not an AsciiDoc heading
    assert sniff_format(b"Title\n=====\n\nbody\n") == "markdown"