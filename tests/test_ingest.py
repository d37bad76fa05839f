"""Mixed-format ingest: bytes sniffer + one-pass per-doc routing.

Reference analog: InputTypeDetector.detect (core/input/types.py:44-233)
classifies each source and dispatches to a handler; our detector works on
leading blob bytes (crawl tables carry no filenames) and routes inside one
mapInPandas. The fused per-doc PDF kernel's parity with the generic
classify → XY-cut path is pinned here too.
"""

from __future__ import annotations

import io
import zipfile

import pytest

from sparkdoc.ingest import (
    FORMATS,
    format_counts,
    mixed_spans_doc,
    mixed_to_documents,
    sniff_format,
)
from sparkdoc.synth import (
    expected_mixed_formats,
    expected_mixed_spans,
    mixed_corpus_df,
    synth_binary_doc,
    synth_doclang_doc,
    synth_docx_doc,
    synth_html_doc,
    synth_md_doc,
    synth_mixed_doc,
    synth_pdf_doc,
)

SEED = 42


# --- sniffer unit ----------------------------------------------------------


def test_sniff_magics():
    assert sniff_format(b"%PDF-1.4 junk") == "pdf"
    assert sniff_format(b"") == "binary"
    assert sniff_format(b"   \n\t  ") == "binary"  # whitespace-only text
    assert sniff_format(b"\xff\xfe\x00\x01") == "binary"  # invalid UTF-8
    assert sniff_format(b'{"nodes": [], "edges": []}') == "json"
    assert sniff_format(b"[1, 2, 3]") == "json"
    assert sniff_format(b"plain prose, no tags at all") == "markdown"
    assert sniff_format(b"# Title\n\nbody") == "markdown"


def test_sniff_html_variants():
    assert sniff_format(b"<!DOCTYPE html><html><body>x</body></html>") == "html"
    assert sniff_format(b"<HTML><BODY>upper</BODY></HTML>") == "html"
    assert sniff_format(b"  \n<div class='a'>fragment</div>") == "html"
    assert sniff_format(b"prose first then <a href='x'>link</a>") == "html"


def test_sniff_doclang():
    assert sniff_format(b'<doc><text loc="" page="1">t</text></doc>') == "doclang"
    assert sniff_format(b"\xef\xbb\xbf<doc></doc>") == "doclang"  # BOM
    assert sniff_format(b'<?xml version="1.0"?><doc></doc>') == "doclang"


def test_sniff_zip_docx_vs_plain_zip():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("data.bin", b"\x00\x01")
    assert sniff_format(buf.getvalue()) == "binary"
    d = synth_docx_doc(0, SEED)
    assert sniff_format(d["docx"]) == "docx"
    # truncated zip (central directory gone) degrades to binary, not a crash
    assert sniff_format(d["docx"][:100]) == "binary"


def test_sniff_bom_markdown():
    assert sniff_format(b"\xef\xbb\xbf# Heading\n\nbody text") == "markdown"


def test_sniff_every_synth_format():
    """Every authored synth doc sniffs as its own format (the mixed gate
    depends on this)."""
    assert sniff_format(synth_html_doc(0, SEED)["html"].encode()) == "html"
    assert sniff_format(synth_md_doc(0, SEED)["markdown"].encode()) == "markdown"
    assert sniff_format(synth_pdf_doc(0, SEED)["pdf"]) == "pdf"
    assert sniff_format(synth_docx_doc(0, SEED)["docx"]) == "docx"
    assert sniff_format(synth_doclang_doc(0, SEED)["dclg"].encode()) == "doclang"
    for j in range(4):
        b = synth_binary_doc(j, SEED)
        assert sniff_format(b["blob"]) == b["fmt"]


# --- per-doc routing kernel --------------------------------------------------


def test_mixed_spans_doc_matches_expected_all_formats():
    exp = expected_mixed_spans(24, SEED)
    by_doc: dict[str, list] = {}
    for r in exp:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(24):
        d = synth_mixed_doc(i, SEED)
        fmt, spans = mixed_spans_doc(d["doc_id"], d["blob"])
        assert fmt == d["fmt"], d["doc_id"]
        erows = by_doc.get(d["doc_id"], [])
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans] == [
            (e["kind"], e["text"], e["media_ref"], e["offset"]) for e in erows
        ], d["doc_id"]


def test_mixed_spans_doc_garbage_never_crashes():
    """Truncated/corrupt blobs of every sniffable shape degrade to spans
    (possibly empty), never exceptions — one poison blob must not kill a
    10^12-row batch."""
    cases = [
        b"%PDF-1.4",  # pdf magic, no body
        b"%PDF-" + bytes(range(256)),  # pdf magic, binary junk
        synth_pdf_doc(0, SEED)["pdf"][:200],  # truncated real pdf
        b"PK\x03\x04" + b"\x00" * 50,  # broken zip
        b"<doc><text loc=",  # truncated doclang
        b"<html><p>unclosed",  # broken html
        b"\xef\xbb\xbf",  # BOM only
    ]
    for blob in cases:
        fmt, spans = mixed_spans_doc("d", blob)
        assert fmt in FORMATS
        assert isinstance(spans, list)


def test_pdf_spans_doc_parity_with_generic_path(spark):
    """The fused per-doc PDF kernel must equal the distributed generic path
    (classify → XY-cut → assemble) span for span — same pin the other
    single-canvas fused paths carry."""
    from sparkdoc.pdfparse import flatten_pdf, pdf_spans_doc
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import pdf_corpus_df

    n = 12
    generic = (
        explode_spans(extract_documents(flatten_pdf(pdf_corpus_df(spark, n, SEED))))
        .orderBy("doc_id", "offset")
        .collect()
    )
    fused: list[tuple] = []
    for i in range(n):
        d = synth_pdf_doc(i, SEED)
        for s in pdf_spans_doc(d["doc_id"], d["pdf"]):
            fused.append((d["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"]))
    fused.sort()
    got = sorted((r.doc_id, r.kind, r.text, r.media_ref, r.offset) for r in generic)
    assert fused == got


# --- distributed e2e ---------------------------------------------------------


def test_mixed_to_documents_e2e(spark):
    n = 24
    out = mixed_to_documents(mixed_corpus_df(spark, n, SEED)).collect()
    assert len(out) == n
    fmts = {r["doc_id"]: (r["fmt"], r["n_spans"]) for r in expected_mixed_formats(n, SEED)}
    exp = expected_mixed_spans(n, SEED)
    by_doc: dict[str, list] = {}
    for r in exp:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for row in out:
        efmt, ecount = fmts[row.doc_id]
        assert row.fmt == efmt, row.doc_id
        assert len(row.spans) == ecount, row.doc_id
        erows = by_doc.get(row.doc_id, [])
        assert [(s.kind, s.text, s.media_ref, s.offset) for s in row.spans] == [
            (e["kind"], e["text"], e["media_ref"], e["offset"]) for e in erows
        ], row.doc_id


def test_format_counts(spark):
    n = 24
    got = {r.fmt: (r.docs, r.spans) for r in
           format_counts(mixed_to_documents(mixed_corpus_df(spark, n, SEED))).collect()}
    exp: dict[str, list[int]] = {}
    for r in expected_mixed_formats(n, SEED):
        d = exp.setdefault(r["fmt"], [0, 0])
        d[0] += 1
        d[1] += r["n_spans"]
    assert got == {k: tuple(v) for k, v in exp.items()}


def test_mixed_plan_zero_exchange(spark):
    """The mixed ingest is scan → mapInPandas, nothing else: no Exchange
    anywhere in the physical plan (one pass over every blob)."""
    plan = mixed_to_documents(
        mixed_corpus_df(spark, 12, SEED)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- DoclingDocument JSON first mile ----------------------------------------


def test_sniff_docling_json():
    from sparkdoc.synth import synth_docling_json_doc

    assert sniff_format(synth_docling_json_doc(0, SEED)["blob"]) == "docling_json"
    assert sniff_format(b'{"schema_name": "DoclingDocument", "texts": []}') == "docling_json"
    # other schema_names and graph exports stay rejected
    assert sniff_format(b'{"schema_name": "Other"}') == "json"
    assert sniff_format(b'{"nodes": [], "edges": []}') == "json"


def test_docling_json_kernel_matches_expected():
    from sparkdoc.dljson import docling_json_spans_doc
    from sparkdoc.synth import expected_docling_json_spans, synth_docling_json_doc

    n = 24
    exp = expected_docling_json_spans(n, SEED)
    by_doc: dict[str, list] = {}
    for r in exp:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(n):
        d = synth_docling_json_doc(i, SEED)
        spans = docling_json_spans_doc(d["doc_id"], d["blob"])
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans] == [
            (e["kind"], e["text"], e["media_ref"], e["offset"])
            for e in by_doc.get(d["doc_id"], [])
        ], (d["doc_id"], f"variant={i % 4}")


def test_docling_json_garbage_never_crashes():
    from sparkdoc.dljson import docling_json_nodes_doc, docling_json_spans_doc

    cases = [
        b"",
        b"{",
        b'{"schema_name": "DoclingDocument"}',  # no body/texts
        b'{"schema_name": "DoclingDocument", "body": {"children": [{"$ref": "#/texts/9"}]}, "texts": []}',
        b'{"schema_name": "DoclingDocument", "body": {"children": [{"$ref": "#/groups/0"}]}, "groups": [{"children": [{"$ref": "#/groups/0"}]}]}',  # self-referential group
        b'{"schema_name": "Nope"}',
    ]
    for blob in cases:
        assert isinstance(docling_json_nodes_doc("d", blob), list)
        assert isinstance(docling_json_spans_doc("d", blob), list)


def test_docling_json_fused_parity_with_generic(spark):
    """Fused per-doc kernel == distributed flatten → classify → XY-cut path,
    across all four geometry variants (incl. BOTTOMLEFT flips and the
    mixed-prov drop rule)."""
    from sparkdoc.dljson import docling_json_spans_doc, flatten_docling_json
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import docling_json_corpus_df, synth_docling_json_doc

    n = 16
    generic = (
        explode_spans(extract_documents(
            flatten_docling_json(docling_json_corpus_df(spark, n, SEED))
        ))
        .orderBy("doc_id", "offset")
        .collect()
    )
    fused: list[tuple] = []
    for i in range(n):
        d = synth_docling_json_doc(i, SEED)
        for s in docling_json_spans_doc(d["doc_id"], d["blob"]):
            fused.append((d["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"]))
    fused.sort()
    got = sorted((r.doc_id, r.kind, r.text, r.media_ref, r.offset) for r in generic)
    assert fused == got


# --- gzip transport compression ----------------------------------------------


def test_sniff_gzip_transparent():
    import gzip

    from sparkdoc.ingest import MAX_INFLATE, gunzip

    assert sniff_format(gzip.compress(b"<!DOCTYPE html><p>x</p>")) == "html"
    assert sniff_format(gzip.compress(b"# md heading\n\nbody")) == "markdown"
    assert sniff_format(gzip.compress(synth_pdf_doc(0, SEED)["pdf"])) == "pdf"
    assert sniff_format(b"\x1f\x8b\x00corrupt") == "binary"
    assert gunzip(b"\x1f\x8b garbage") is None


def test_mixed_gzip_doc_routes_to_inner_format():
    import gzip

    d = synth_html_doc(1, SEED)
    fmt, spans = mixed_spans_doc(d["doc_id"], gzip.compress(d["html"].encode()))
    assert fmt == "html" and len(spans) > 0
    # identical spans to the uncompressed route
    fmt2, spans2 = mixed_spans_doc(d["doc_id"], d["html"].encode())
    assert spans == spans2


def test_gunzip_bomb_guard():
    import gzip

    from sparkdoc.ingest import gunzip

    bomb = gzip.compress(b"\x00" * (4 << 20))
    assert gunzip(bomb, cap=1 << 20) is None  # over cap -> rejected
    assert gunzip(bomb, cap=8 << 20) is not None


def test_sniff_bz2_and_xz_transparent():
    import bz2
    import lzma

    from sparkdoc.ingest import _decompress_transport

    html = synth_html_doc(2, SEED)["html"].encode()
    assert sniff_format(bz2.compress(html)) == "html"
    assert sniff_format(lzma.compress(html)) == "html"
    # true magic (BZh + level digit) with a corrupt stream → binary;
    # prose that merely starts with "BZh" is NOT compressed (see the
    # bzh-prefixed-text regression below)
    assert sniff_format(b"BZh9garbage") == "binary"
    assert sniff_format(b"\xfd7zXZ\x00garbage") == "binary"
    # truncated streams are corrupt, not partial documents
    assert sniff_format(bz2.compress(html)[:20]) == "binary"
    # bomb guard bounds all three codecs
    big = b"\x00" * (4 << 20)
    assert _decompress_transport(bz2.compress(big), cap=1 << 20) is None
    assert _decompress_transport(lzma.compress(big), cap=1 << 20) is None
    # routing parity: compressed and plain land on identical spans
    f1, s1 = mixed_spans_doc("d", bz2.compress(html))
    f2, s2 = mixed_spans_doc("d", html)
    assert f1 == f2 == "html" and s1 == s2


# --- review-fix regressions ---------------------------------------------------


def test_nested_compression_routes_not_crashes():
    """Double Content-Encoding (gzip(gzip(doc))) must parse like the plain
    doc; exceeding the layer cap degrades to binary — one hostile blob must
    never raise out of the routing kernel."""
    import bz2
    import gzip

    html = synth_html_doc(1, SEED)["html"].encode()
    _f0, plain = mixed_spans_doc("d", html)
    for blob in (gzip.compress(gzip.compress(html)),
                 bz2.compress(gzip.compress(html))):
        fmt, spans = mixed_spans_doc("d", blob)
        assert fmt == "html" and spans == plain
    deep = html
    for _ in range(5):
        deep = gzip.compress(deep)
    assert sniff_format(deep) == "binary"
    assert mixed_spans_doc("d", deep) == ("binary", [])


def test_multi_member_gzip_decompresses_whole():
    """Concatenated gzip members (bgzip / block-gzipped docs) must yield the
    WHOLE document — first-member-only truncation is silent corruption."""
    import gzip

    from sparkdoc.ingest import gunzip

    html = synth_html_doc(1, SEED)["html"].encode()
    multi = gzip.compress(html[: len(html) // 2]) + gzip.compress(html[len(html) // 2:])
    assert gunzip(multi) == html
    _f, plain = mixed_spans_doc("d", html)
    fmt, spans = mixed_spans_doc("d", multi)
    assert fmt == "html" and spans == plain


def test_bzh_prefixed_text_is_markdown_not_binary():
    """Real bzip2 magic is BZh + block-size digit; prose starting with 'BZh'
    must fall through to the markdown catch-all."""
    md = b"BZh compression notes\n\nThis markdown document explains bzip2."
    assert sniff_format(md) == "markdown"
    fmt, spans = mixed_spans_doc("d", md)
    assert fmt == "markdown" and len(spans) > 0


def test_warc_container_sniffed_not_garbled():
    """A whole WARC file mis-fed as one document row is recorded as fmt
    'warc' with zero spans (route containers through warc_extract)."""
    from sparkdoc.synth import synth_warc_file

    w = synth_warc_file(0, SEED)["content"]
    assert sniff_format(w) == "warc"
    assert mixed_spans_doc("d", w) == ("warc", [])


def test_docling_json_adversarial_shapes():
    """Malformed values inside a schema_name-marked JSON degrade to [] or
    partial nodes — never exceptions (review finding repros)."""
    import json

    from sparkdoc.dljson import docling_json_nodes_doc

    cases = [
        b'{"schema_name": "DoclingDocument", "body": {"children": [{"$ref": "#/texts/0"}]}, "texts": [{"label": "text", "text": "x", "prov": [{"page_no": 1, "bbox": {"l": "x", "t": 1, "r": 2, "b": 3}}]}]}',
        b'{"schema_name": "DoclingDocument", "body": {"children": [{"$ref": "#/texts/0"}]}, "texts": ["not a dict"]}',
        b'{"schema_name": "DoclingDocument", "body": {"children": [{"$ref": "#/texts/0"}]}, "texts": [{"label": "section_header", "level": "two", "text": "h"}]}',
        b'{"schema_name": "DoclingDocument", "body": "not a dict"}',
    ]
    for c in cases:
        assert isinstance(docling_json_nodes_doc("d", c), list)
    # a 3000-deep group chain must not blow the recursion limit
    groups = [{"self_ref": f"#/groups/{i}", "children": [{"$ref": f"#/groups/{i + 1}"}]}
              for i in range(3000)]
    groups[-1]["children"] = [{"$ref": "#/texts/0"}]
    doc = {"schema_name": "DoclingDocument",
           "body": {"children": [{"$ref": "#/groups/0"}]},
           "groups": groups,
           "texts": [{"label": "text", "text": "deep", "prov": []}]}
    rows = docling_json_nodes_doc("d", json.dumps(doc).encode())
    assert len(rows) == 1 and rows[0]["text"] == "deep"


def test_csv_sniff_and_kernel():
    from sparkdoc.ingest import csv_spans_doc, looks_like_csv, sniff_format

    csv_text = 'a,b,c\n1,"x,y",3\n4,5,"he said ""hi"""\n'
    assert sniff_format(csv_text.encode()) == "csv"
    spans = csv_spans_doc("d", csv_text)
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("table", 'a | b | c\n1 | x,y | 3\n4 | 5 | he said "hi"')
    ]
    # semicolon + tab delimiters
    assert sniff_format(b"a;b\n1;2\n") == "csv"
    assert sniff_format(b"a\tb\n1\t2\n") == "csv"
    # inconsistent field counts / single column / prose are NOT csv
    assert not looks_like_csv("a,b\n1,2,3\n")
    assert not looks_like_csv("hello\nworld\n")
    assert sniff_format(b"Plain prose, with commas.\nAnd more text here.\n") == "markdown"
    # quoted field hides its delimiter from the naive count but the csv
    # parse is what must stay consistent
    assert looks_like_csv('a,b\n"x,y",2\n')


def test_image_magics_route_to_single_picture_span():
    from sparkdoc.ingest import mixed_spans_doc, sniff_format
    from sparkdoc.synth import synth_image_doc

    for i in range(14):  # two full subtype cycles
        d = synth_image_doc(i, 42)
        fmt, spans = mixed_spans_doc(d["doc_id"], d["blob"])
        assert fmt == "image", d["subtype"]
        assert spans == [
            {"kind": "picture", "text": "", "media_ref": "#/pictures/1", "offset": 0}
        ]
    # 'BM' alone is NOT a BMP: header fields must be self-consistent
    assert sniff_format(b"BMW sales grew 4% in 2024, beating every forecast.") == "markdown"
    # RIFF without the WEBP fourcc is never an image (a real WAV's sample
    # bytes fail UTF-8 and land in 'binary'; this ASCII-only header falls
    # through to the text catch-all — the claim under test is only that
    # the image sniff requires the WEBP fourcc)
    assert sniff_format(b"RIFF\x04\x00\x00\x00WAVE") != "image"
    assert sniff_format(b"RIFF\x10\x00\x00\x00WAVEfmt \xff\xfe" + bytes(32)) == "binary"


def test_ooxml_zip_sniffing_by_entry_part():
    import io
    import zipfile

    from sparkdoc.ingest import sniff_format
    from sparkdoc.synth import synth_pptx_doc, synth_xlsx_doc

    assert sniff_format(synth_xlsx_doc(0, 42)["xlsx"]) == "xlsx"
    assert sniff_format(synth_pptx_doc(0, 42)["pptx"]) == "pptx"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "zip but not office")
    assert sniff_format(buf.getvalue()) == "binary"


def test_mixed_and_dljson_second_seed():
    """The closed-form expectations hold at an independent seed (same
    two-seed discipline as the golden corpus) — guards against the corpus
    accidentally exercising only seed-42-specific branches."""
    from sparkdoc.synth import (
        expected_docling_json_spans,
        expected_mixed_spans,
        expected_warc_spans,
        synth_docling_json_doc,
        synth_mixed_doc,
        synth_warc_file,
    )
    from sparkdoc.dljson import docling_json_spans_doc
    from sparkdoc.warc import warc_doc_blobs

    seed = 7
    exp = expected_mixed_spans(39, seed)
    by_doc: dict[str, list] = {}
    for r in exp:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(39):
        d = synth_mixed_doc(i, seed)
        fmt, spans = mixed_spans_doc(d["doc_id"], d["blob"])
        assert fmt == d["fmt"]
        assert [(s["kind"], s["text"], s["offset"]) for s in spans] == [
            (e["kind"], e["text"], e["offset"]) for e in by_doc.get(d["doc_id"], [])
        ], d["doc_id"]

    exp_j = expected_docling_json_spans(8, seed)
    by_doc = {}
    for r in exp_j:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(8):
        d = synth_docling_json_doc(i, seed)
        spans = docling_json_spans_doc(d["doc_id"], d["blob"])
        assert [(s["kind"], s["text"]) for s in spans] == [
            (e["kind"], e["text"]) for e in by_doc.get(d["doc_id"], [])
        ], i

    exp_w = expected_warc_spans(4, seed)
    by_doc = {}
    for r in exp_w:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(4):
        f = synth_warc_file(i, seed)
        for (rid, blob), (out_id, _inner) in zip(warc_doc_blobs(f["content"]), f["expected"]):
            full_id = f"{f['warc_name']}#{rid}"
            assert full_id == out_id
            _fmt, spans = mixed_spans_doc(full_id, blob)
            assert [(s["kind"], s["text"]) for s in spans] == [
                (e["kind"], e["text"]) for e in by_doc.get(full_id, [])
            ], full_id
