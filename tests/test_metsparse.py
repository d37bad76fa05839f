"""METS/ALTO first mile: manifest resolution, ALTO geometry, span parity.

Reference analog: the generic-document handler runs a bare docling
DocumentConverter (core/input/handlers.py:560-563) whose default format
matrix includes METS/GBS scan bundles (tar.gz of one METS manifest plus
per-page ALTO OCR); here it is stdlib tarfile+ElementTree producing REAL
multi-page geometry for the same XY-cut pipeline PDF uses.
"""

from __future__ import annotations

import gzip
import io
import tarfile

import pytest

from sparkdoc.metsparse import (
    flatten_mets,
    is_mets_archive,
    mets_nodes_doc,
    mets_spans_doc,
)
from sparkdoc.synth import (
    _expected_mets_doc,
    expected_mets_spans,
    mets_corpus_df,
    synth_mets_doc,
)


def tar_of(members: dict[str, bytes], gz: bool = False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            ti = tarfile.TarInfo(name=name)
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(data))
    out = buf.getvalue()
    return gzip.compress(out, mtime=0) if gz else out


METS = (
    b'<?xml version="1.0"?>'
    b'<mets xmlns="http://www.loc.gov/METS/" xmlns:xlink="http://www.w3.org/1999/xlink">'
    b'<fileSec><fileGrp><file ID="OCR1"><FLocat xlink:href="alto/1.xml"/></file>'
    b'<file ID="IMG1"><FLocat xlink:href="images/1.jp2"/></file></fileGrp></fileSec>'
    b'<structMap TYPE="physical"><div TYPE="book">'
    b'<div TYPE="page" ORDER="1"><fptr FILEID="IMG1"/><fptr FILEID="OCR1"/></div>'
    b"</div></structMap></mets>"
)


def alto(blocks: bytes) -> bytes:
    return (
        b'<?xml version="1.0"?><alto><Layout>'
        b'<Page ID="P1" WIDTH="800" HEIGHT="1200"><PrintSpace>'
        + blocks
        + b"</PrintSpace></Page></Layout></alto>"
    )


def block(vpos: int, *words: str) -> bytes:
    strs = "".join(f'<String CONTENT="{w}"/><SP/>' for w in words)
    return (
        f'<TextBlock HPOS="60" VPOS="{vpos}" WIDTH="680" HEIGHT="20">'
        f'<TextLine HPOS="60" VPOS="{vpos}" WIDTH="680" HEIGHT="18">{strs}</TextLine>'
        "</TextBlock>"
    ).encode()


# --- detection ----------------------------------------------------------------


def test_is_mets_archive():
    good = tar_of({"b/b.mets.xml": METS, "b/alto/1.xml": alto(block(80, "hi"))})
    assert is_mets_archive(good)
    # tar without a METS member is not a bundle
    assert not is_mets_archive(tar_of({"a/x.xml": b"<alto/>", "a/y.txt": b"hi"}))
    # non-tar bytes
    assert not is_mets_archive(b"plain text")
    assert not is_mets_archive(b"")


def test_sniffer_routes_mets_and_rejects_other_tars():
    from sparkdoc.ingest import mixed_spans_doc, sniff_format

    d = synth_mets_doc(0, 42)
    # blob is tar.gz: the transport layer strips, the tar routes to mets
    fmt, spans = mixed_spans_doc(d["doc_id"], d["blob"])
    assert fmt == "mets" and spans
    other = tar_of({"a/readme.txt": b"not a scan bundle"})
    assert sniff_format(other) == "binary"


def test_leading_magics_beat_payload_ustar():
    # formats identified by LEADING magic must win even when their payload
    # happens to spell 'ustar' at the tar magic offset 257 (review finding)
    from sparkdoc.ingest import sniff_format

    warc = (b"WARC/1.0\r\nWARC-Type: resource\r\n" + b"x" * 226 + b"ustar" + b"y" * 64)
    assert warc[257:262] == b"ustar"
    assert sniff_format(warc) == "warc"
    pdf = b"%PDF-1.4\n" + b"a" * 248 + b"ustar" + b"b" * 64
    assert pdf[257:262] == b"ustar"
    assert sniff_format(pdf) == "pdf"


# --- manifest + ALTO semantics ------------------------------------------------


def test_geometry_reading_order_not_file_order():
    # blocks emitted bottom-first in the file; XY-cut restores VPOS order
    a = alto(block(500, "last") + block(80, "first") + block(300, "middle"))
    blob = tar_of({"b/b.mets.xml": METS, "b/alto/1.xml": a})
    texts = [s["text"] for s in mets_spans_doc("d", blob)]
    assert texts == ["first", "middle", "last"]
    # node ids (media plumbing) still follow file order
    nodes = mets_nodes_doc("d", blob)
    assert [n["text"] for n in nodes] == ["last", "first", "middle"]


def test_two_column_page_reads_column_major():
    # a dense two-column scan: full-width title band, then two columns of
    # TALL blocks that overlap vertically (no whitespace band crosses both
    # columns, as on a real magazine page) — XY-cut finds no horizontal
    # cut, falls to the vertical gap between the columns, and reads the
    # whole LEFT column top-to-bottom before the RIGHT column
    def colblock(hpos: int, vpos: int, word: str) -> bytes:
        return (
            f'<TextBlock HPOS="{hpos}" VPOS="{vpos}" WIDTH="320" HEIGHT="200">'
            f'<TextLine><String CONTENT="{word}"/></TextLine></TextBlock>'
        ).encode()

    a = alto(
        block(10, "title")  # full-width (HPOS 60 WIDTH 680)
        + colblock(420, 150, "R1") + colblock(60, 100, "L1")
        + colblock(60, 310, "L2") + colblock(420, 360, "R2")
        + colblock(60, 520, "L3")
    )
    blob = tar_of({"b/b.mets.xml": METS, "b/alto/1.xml": a})
    texts = [s["text"] for s in mets_spans_doc("d", blob)]
    assert texts == ["title", "L1", "L2", "L3", "R1", "R2"]


def test_hyphenation_joins_without_space():
    a = alto(
        b'<TextBlock HPOS="60" VPOS="80" WIDTH="680" HEIGHT="40">'
        b'<TextLine><String CONTENT="an"/><SP/><String CONTENT="exam"/><HYP/></TextLine>'
        b'<TextLine><String CONTENT="ple"/><SP/><String CONTENT="here"/></TextLine>'
        b"</TextBlock>"
    )
    blob = tar_of({"b/b.mets.xml": METS, "b/alto/1.xml": a})
    assert [s["text"] for s in mets_spans_doc("d", blob)] == ["an example here"]


def test_illustrations_become_pictures():
    a = alto(
        block(80, "text")
        + b'<Illustration HPOS="120" VPOS="200" WIDTH="560" HEIGHT="160"/>'
    )
    blob = tar_of({"b/b.mets.xml": METS, "b/alto/1.xml": a})
    spans = mets_spans_doc("d", blob)
    assert [(s["kind"], s["media_ref"]) for s in spans] == [
        ("text", ""), ("picture", "#/pictures/2"),
    ]


def test_malformed_degrades_to_zero():
    assert mets_spans_doc("d", b"") == []
    assert mets_spans_doc("d", b"not a tar at all") == []
    # METS present but ALTO malformed: page skipped, not fatal
    blob = tar_of({"b/b.mets.xml": METS, "b/alto/1.xml": b"<alto><unclosed"})
    assert mets_spans_doc("d", blob) == []


def test_mets_matches_authored_plan_two_seeds():
    for seed in (42, 7):
        for i in range(25):
            d = synth_mets_doc(i, seed)
            got = [(s["offset"], s["kind"], s["text"], s["media_ref"])
                   for s in mets_spans_doc(d["doc_id"], d["blob"])]
            want = [(s["offset"], s["kind"], s["text"], s["media_ref"])
                    for s in _expected_mets_doc(d)]
            assert got == want, (seed, d["doc_id"])


def test_furniture_rule_on_three_page_books():
    # an authored >=3-page book marks its running header furniture
    for seed in (42,):
        seen3 = False
        for i in range(40):
            d = synth_mets_doc(i, seed)
            pages = {p for p, _t, _x, _b in d["expected"]}
            kinds = {s["kind"] for s in _expected_mets_doc(d)}
            if len(pages) >= 3:
                seen3 = True
                assert "furniture" in kinds
            else:
                assert "furniture" not in kinds
        assert seen3


# --- distributed parity / plans ----------------------------------------------


@pytest.fixture(scope="module")
def mcorpus(spark):
    return mets_corpus_df(spark, 10, 42, partitions=4)


def test_mets_corpus_matches_closed_form(spark, mcorpus):
    from sparkdoc.spans import explode_spans, extract_documents

    got = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_mets(mcorpus)))
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    want = sorted(
        (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_mets_spans(10, 42)
    )
    assert got == want and got


def test_mets_generic_path_single_exchange(spark, mcorpus):
    from sparkdoc.spans import extract_documents

    plan = (
        extract_documents(flatten_mets(mcorpus))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") >= 1  # the one doc_id exchange exists
    # and the per-doc kernel parity: distributed == pure-python kernel
    rows = {r["doc_id"]: r["spans"]
            for r in extract_documents(flatten_mets(mcorpus)).collect()}
    for i in range(10):
        d = synth_mets_doc(i, 42)
        ker = mets_spans_doc(d["doc_id"], d["blob"])
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in rows[d["doc_id"]]]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in ker]
        assert got == want