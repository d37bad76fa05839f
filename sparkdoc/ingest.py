"""Mixed-format ingest: bytes-level format sniffing + one-pass routing.

Reference analog: InputTypeDetector.detect (core/input/types.py:44-233) —
the reference classifies each source (URL / DoclingDocument JSON / DocLang
.dclg/.dclg.xml/.xml-sniff / graph-export rejection / catch-all DOCUMENT)
and hands it to the matching handler, one process per document. A 100 TB
crawl table carries no filenames or extensions, so our detector works on
the LEADING BYTES of each blob instead (magic numbers + cheap content
sniffs, the same trick the reference's _is_doclang_xml head-read plays),
and the per-format handlers are the engine's own first-mile kernels.

Architecture: ONE ``mapInPandas`` over the ``(doc_id, blob)`` scan — sniff
and parse in the same Python stage, ZERO shuffles, each document fully
independent. At 10^12 docs this reads every blob exactly once and scales
with input splits; there is no format-homogeneity assumption anywhere (real
crawl dumps interleave PDFs, Office files, HTML, and plain text in one
table). PDFs route through pdf_spans_doc — the per-doc fused kernel whose
parity with the generic classify → XY-cut path is test-pinned — because the
blob row already co-locates the whole document, making the generic path's
doc_id exchange pure waste here.

Format vocabulary (sniff → handler):

  pdf       %PDF- magic                     → pdfparse.pdf_spans_doc
  docx      PK zip containing word/document.xml → docxparse.docx_spans_doc
  xlsx      PK zip containing xl/workbook.xml → xlsxparse.xlsx_spans_doc
  pptx      PK zip containing ppt/presentation.xml → pptxparse.pptx_spans_doc
  image     PNG/JPEG/GIF/TIFF/WEBP/binary-PNM magic, or a BM header whose
            size/offset fields are self-consistent → ONE picture span
            (media_ref #/pictures/1, empty text): a standalone image IS an
            interleaved document of one media item. The reference's
            InputType.IMAGE routes these to docling OCR/VLM conversion —
            explicitly out of scope here (SURVEY ∅); the payload stays an
            opaque binary for the multimodal/codec operators downstream.
  csv       delimiter-consistent text table (>= 2 rows x >= 2 columns of
            comma/semicolon/tab-separated fields, quoted fields honored)
            → ONE table span, rows newline-joined, cells " | " — the same
            rendering docling's CSV backend feeds its table item. Detection
            is heuristic BY DESIGN: with no filename, prose whose first
            lines carry perfectly consistent delimiter counts reads as CSV
            (the reference detects by .csv extension, which a crawl table
            does not have).
  jats      XML whose root element is <article> (JATS doctype, or an XML
            prolog / dtd-version= / xmlns attrs ahead of the start tag) —
            binds BEFORE the HTML markers because <article is also an HTML
            tag; a bare <article> fragment still reads as HTML
                                            → jatsparse.jats_spans_doc
  uspto     XML whose root element (or doctype) is us-patent-grant /
            us-patent-application / patent-application-publication
                                            → usptoparse.uspto_spans_doc
  mets      tar archive (ustar magic; transport gzip already stripped)
            holding a METS manifest + ALTO OCR pages (Google-Books-style
            scan bundle); other tars are opaque binaries
                                            → metsparse.mets_spans_doc
  html      <!doctype html / <html / common HTML tags in the head
                                            → htmlparse.html_spans_doc
  asciidoc  leading `= Title` / `== Section` marker line
                                            → adocparse.adoc_spans_doc
  vtt       WEBVTT file signature           → vttparse.vtt_spans_doc
            (docling's transcript/subtitle route; one p block per cue)
  doclang   <doc> root after BOM/whitespace → serialize.doclang_spans_doc
  docling_json  JSON object with the DoclingDocument schema_name marker
            (reference accepts these WITHOUT docling conversion —
            _is_docling_document, types.py:206-233) → dljson kernels
  json      any other JSON object (graph exports etc.) — REJECTED as a
            document, zero spans (reference raises on graph exports,
            types.py:180-190: "Exported graphs cannot be converted again")
  markdown  any other valid-UTF-8 text      → mdparse.md_spans_doc
            (the reference's catch-all: raw text normalizes to .md,
            handlers.py:44-105)
  warc      a whole WARC container mis-fed as one document row — zero
            spans, fmt recorded (route containers through
            warc.warc_extract, which splits records first)
  binary    everything else (unknown magics, invalid UTF-8, zips without
            word/document.xml, empty blobs) — zero spans, fmt recorded so
            the job can account for skipped inputs instead of crashing

Transport compression (gzip 1f-8b, bzip2 BZh, xz fd-37-7a-58-5a magics) is
stripped transparently before sniffing — crawl dumps compress per document —
with a decompression cap (MAX_INFLATE) so a compression bomb routes to
'binary' instead of OOMing a worker; truncated streams count as corrupt.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from sparkdoc.schemas import SPAN

#: documents table + the detected format per row
MIXED_DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("fmt", StringType(), False),
        StructField("spans", ArrayType(SPAN, False), False),
    ]
)

FORMATS = (
    "pdf", "docx", "xlsx", "pptx", "image", "csv", "jats", "uspto",
    "mets", "html", "asciidoc", "vtt", "doclang", "docling_json", "json",
    "markdown", "warc", "binary"
)

import re as _re

#: an AsciiDoc document leads with its title (= Title) or a section
#: heading (== … ====== ) — the marker+space shape Markdown never uses at
#: line start (Markdown's setext '=' underline FOLLOWS the title text)
_ADOC_HEAD_RE = _re.compile(r"^={1,6} \S")

#: tags that mark text as HTML when they appear in the head window
#: (reference handlers send HTML to docling's HTML backend; the tag list is
#: the flattener's own block vocabulary)
_HTML_MARKERS = (
    "<!doctype html", "<html", "<head", "<body", "<p>", "<p ", "<div",
    "<br", "<h1", "<h2", "<h3", "<table", "<ul", "<ol", "<li", "<a href",
    "<span", "<nav", "<article", "<section", "<img",
)

_UTF8_BOM = b"\xef\xbb\xbf"
_GZIP_MAGIC = b"\x1f\x8b"

#: decompression cap per blob — a 100 TB ingest must survive gzip bombs; a
#: blob inflating past this routes to 'binary' instead of OOMing the worker
MAX_INFLATE = 512 * 1024 * 1024


#: real bzip2 magic is 'BZh' + block-size digit — a 3-byte check would
#: misroute plain text that merely starts with "BZh" (review finding)
_BZ2_MAGICS = tuple(b"BZh%d" % d for d in range(1, 10))
_XZ_MAGIC = b"\xfd7zXZ\x00"

#: nested transport layers allowed (double Content-Encoding happens in real
#: crawls; beyond a few layers it's a compression quine, not a document)
_MAX_TRANSPORT_LAYERS = 4


def _is_compressed(data: bytes) -> bool:
    return data.startswith((_GZIP_MAGIC, _XZ_MAGIC)) or data.startswith(_BZ2_MAGICS)


def gunzip(data: bytes, cap: int = MAX_INFLATE) -> bytes | None:
    """ALL gzip members of ``data`` inflated and concatenated (bgzip /
    block-gzipped documents arrive as concatenated members — returning only
    the first silently truncates the document), or None (corrupt, truncated,
    or over cap). decompressobj + max_length keeps the bomb guard
    allocation-bounded; the cap applies to the TOTAL output."""
    import zlib

    out = bytearray()
    rest = data
    try:
        while rest:
            d = zlib.decompressobj(wbits=31)
            out += d.decompress(rest, cap - len(out) + 1)
            if len(out) > cap or not d.eof:
                return None  # over the cap, or a truncated stream
            rest = d.unused_data
    except zlib.error:
        return None
    return bytes(out)


def _multi_stream(decomp_cls, err, data: bytes, cap: int) -> bytes | None:
    """bz2/lzma analog of gunzip's member loop (both decompressor classes
    expose eof + unused_data per stream)."""
    out = bytearray()
    rest = data
    try:
        while rest:
            d = decomp_cls()
            out += d.decompress(rest, cap - len(out) + 1)
            if len(out) > cap or not d.eof:
                return None
            rest = d.unused_data
    except err:
        return None
    return bytes(out)


def _decompress_transport(data: bytes, cap: int = MAX_INFLATE) -> bytes | None:
    """Strip transport compression (gzip / bzip2 / xz magics), up to
    ``_MAX_TRANSPORT_LAYERS`` nested layers (double Content-Encoding); None
    means corrupt, truncated, over the bomb cap, or nested deeper than the
    layer cap; the bytes unchanged means no compression layer. All three
    decompressors are incremental with max_length, so the cap bounds
    allocation, not just output — and concatenated multi-member/stream
    blobs decompress WHOLE (no silent first-member truncation)."""
    for _ in range(_MAX_TRANSPORT_LAYERS):
        if data.startswith(_GZIP_MAGIC):
            nxt = gunzip(data, cap)
        elif data.startswith(_BZ2_MAGICS):
            import bz2

            nxt = _multi_stream(bz2.BZ2Decompressor, OSError, data, cap)
        elif data.startswith(_XZ_MAGIC):
            import lzma

            nxt = _multi_stream(lzma.LZMADecompressor, lzma.LZMAError, data, cap)
        else:
            return data
        if nxt is None:
            return None
        data = nxt
    return None if _is_compressed(data) else data


#: unambiguous image magics (BMP is handled separately — its 2-byte 'BM'
#: magic needs header self-consistency checks to not claim text)
_IMAGE_MAGICS = (
    b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF87a", b"GIF89a",
    b"II*\x00", b"MM\x00*", b"P4 ", b"P4\n", b"P4\t", b"P5 ", b"P5\n",
    b"P5\t", b"P6 ", b"P6\n", b"P6\t",
)

_BMP_HEADER_SIZES = {12, 40, 52, 56, 64, 108, 124}


def _is_image(data: bytes) -> bool:
    if data.startswith(_IMAGE_MAGICS):
        return True
    if data.startswith(b"RIFF") and data[8:12] == b"WEBP":
        return True
    if data.startswith(b"BM") and len(data) >= 26:
        # BMP's magic is 2 ASCII bytes; require the DIB header size field
        # to be a known value and the pixel-data offset to be in range
        hdr = int.from_bytes(data[14:18], "little")
        off = int.from_bytes(data[10:14], "little")
        return hdr in _BMP_HEADER_SIZES and 26 <= off <= len(data)
    return False


#: CSV detection sample: leading lines only (a head sniff, like HTML's)
_CSV_SAMPLE_CHARS = 4096
_CSV_DELIMS = (",", ";", "\t")


def looks_like_csv(text: str) -> bool:
    """Delimiter-consistency head sniff: >= 2 sampled non-empty lines that
    all parse (csv.reader, quotes honored) to the SAME field count >= 2
    under the delimiter most frequent in the first line. Lines cut by the
    sample window are dropped (never judge a partial line)."""
    import csv as _csv

    window = text[:_CSV_SAMPLE_CHARS]
    complete = len(text) <= _CSV_SAMPLE_CHARS
    lines = window.splitlines()
    if not complete and len(lines) > 1:
        lines = lines[:-1]
    lines = [ln for ln in lines if ln.strip()][:16]
    if len(lines) < 2:
        return False
    first = lines[0]
    delim = max(_CSV_DELIMS, key=first.count)
    if first.count(delim) == 0:
        return False
    try:
        counts = {len(row) for row in _csv.reader(lines, delimiter=delim)}
    except _csv.Error:
        return False
    return len(counts) == 1 and counts.pop() >= 2


def csv_spans_doc(doc_id: str, text: str) -> list[dict]:
    """CSV text → spans via the shared single-canvas reduction: ONE table
    block (rows newline-joined, cells ' | ', quoted fields unescaped,
    all-empty rows skipped) — the same shape docling's CSV backend emits."""
    import csv as _csv

    from sparkdoc.htmlparse import blocks_to_spans

    # same delimiter choice as looks_like_csv: most frequent in the first
    # NON-EMPTY sampled line
    first = next(
        (ln for ln in text[:_CSV_SAMPLE_CHARS].splitlines() if ln.strip()), ""
    )
    delim = max(_CSV_DELIMS, key=first.count)
    try:
        rows = [
            " | ".join(row)
            for row in _csv.reader(text.splitlines(), delimiter=delim)
            if any(c.strip() for c in row)
        ]
    except _csv.Error:
        return []
    if not rows:
        return []
    return blocks_to_spans([{"tag": "table", "text": "\n".join(rows), "n_links": 0}])


def sniff_format(data: bytes) -> str:
    """Classify a document blob by leading bytes (InputTypeDetector analog,
    core/input/types.py:44-233). Deterministic, pure, cheap: magic-number
    checks plus a 1024-char head sniff for HTML/DocLang/JSON. Two checks
    read past the head: the OOXML one (the zip central directory lives at
    the END of the file; zipfile needs it to list member names) and the
    tar/METS one (member headers are interleaved through the archive; the
    scan stops at the first .xml member head naming a <mets root)."""
    if not data:
        return "binary"
    if _is_compressed(data):
        # transparent transport compression (crawl dumps compress per
        # document); sniff the decompressed payload — corrupt/bomb is binary
        inner = _decompress_transport(data)
        return "binary" if inner is None else sniff_format(inner)
    if data.startswith(b"%PDF-"):
        return "pdf"
    if _is_image(data):
        return "image"
    if data.startswith(b"WARC/"):
        # a whole WARC container fed as one document row: many documents,
        # not one — route through warc.warc_extract instead (recorded here
        # so the accounting flags the mis-fed container instead of
        # serializing its headers as markdown)
        return "warc"
    if data.startswith(b"PK\x03\x04"):
        # OOXML packages are zips; the entry part names the application
        # (word/xl/ppt — docx/xlsx/pptx parsers key off the same parts).
        # Other zips are opaque binaries.
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                names = set(zf.namelist())
        except Exception:
            return "binary"
        if "word/document.xml" in names:
            return "docx"
        if "xl/workbook.xml" in names:
            return "xlsx"
        if "ppt/presentation.xml" in names:
            return "pptx"
        return "binary"
    if len(data) > 262 and data[257:262] == b"ustar":
        # tar archive: a METS/ALTO scan bundle routes to the metsparse
        # kernel; any other tar is an opaque binary. Checked AFTER every
        # unambiguous leading-magic format (PDF/image/WARC/zip): the ustar
        # magic sits at offset 257 INSIDE the payload, so a WARC or zip
        # whose content bytes happen to spell 'ustar' there must not be
        # stolen (review finding)
        from sparkdoc.metsparse import is_mets_archive

        return "mets" if is_mets_archive(data) else "binary"
    raw = data[3:] if data.startswith(_UTF8_BOM) else data
    try:
        text = raw.decode("utf-8")
    except UnicodeDecodeError:
        return "binary"
    head = text[:1024].lstrip()
    if not head:
        return "binary"  # empty/whitespace-only text is not a document
        # (reference TextInputHandler rejects it, handlers.py:108-187)
    if head.startswith("<doc>"):
        # our DocLang serialization root; the reference sniffs '<doclang'
        # the same way (_is_doclang_xml head read, types.py:152-159)
        return "doclang"
    if head.startswith("<?xml") and "<doc>" in head:
        return "doclang"
    if head.startswith(("{", "[")):
        # DoclingDocument dumps open with their schema_name marker (docling
        # serializes it first; ours does too) — peek a wider window, the
        # reference full-parses the file for the same check
        # (_is_docling_document, types.py:206-233)
        w = text[:2048]
        if '"schema_name"' in w and '"DoclingDocument"' in w:
            return "docling_json"
        return "json"
    from sparkdoc.vttparse import is_vtt

    if is_vtt(text):
        # the WebVTT signature binds harder than the HTML tag sniff (cue
        # payloads legally carry <i>/<b>/<c> tags)
        return "vtt"
    from sparkdoc.usptoparse import is_uspto

    if is_uspto(head):
        # USPTO patent XML: root element (or doctype) names a grant/
        # application — collides with nothing in HTML, checked here with
        # the other XML-evidence sniffs
        return "uspto"
    from sparkdoc.jatsparse import is_jats

    if is_jats(head):
        # JATS binds before the HTML markers: <article is also an HTML tag,
        # but JATS requires XML evidence (doctype naming article, or a
        # prolog / dtd-version= / xmlns ahead of the start tag) that an
        # HTML5 fragment never carries; XHTML's root is html, not article
        return "jats"
    low = head.lower()
    if any(m in low for m in _HTML_MARKERS):
        return "html"
    if _ADOC_HEAD_RE.match(head):
        return "asciidoc"
    if looks_like_csv(text):
        return "csv"
    return "markdown"


def mixed_spans_doc(doc_id: str, data: bytes) -> tuple[str, list[dict]]:
    """Per-doc routing kernel: sniff + parse one blob → (fmt, spans).

    json/binary yield zero spans by design (the reference raises on graph
    exports and unreadable inputs; a 10^12-row batch job records and moves
    on). Parser failures on a CORRECTLY sniffed format also degrade to zero
    spans rather than poisoning the batch — each first-mile parser already
    guards its own nontermination/crash cases (fuzz-tested). Transport
    compression (gzip/bzip2/xz, nested up to the layer cap) is stripped
    transparently — fmt reports the INNER format."""
    if _is_compressed(data):
        inner = _decompress_transport(data)
        if inner is None:
            return "binary", []
        data = inner
    fmt = sniff_format(data)
    if fmt == "pdf":
        from sparkdoc.pdfparse import pdf_spans_doc

        return fmt, pdf_spans_doc(doc_id, data)
    if fmt == "docx":
        from sparkdoc.docxparse import docx_spans_doc

        return fmt, docx_spans_doc(doc_id, data)
    if fmt == "xlsx":
        from sparkdoc.xlsxparse import xlsx_spans_doc

        return fmt, xlsx_spans_doc(doc_id, data)
    if fmt == "pptx":
        from sparkdoc.pptxparse import pptx_spans_doc

        return fmt, pptx_spans_doc(doc_id, data)
    if fmt == "image":
        # one media item IS the document; decode stays downstream (codec /
        # multimodal operators) — ingest only places it in the structure
        return fmt, [
            {"kind": "picture", "text": "", "media_ref": "#/pictures/1",
             "offset": 0}
        ]
    raw = data[3:] if data.startswith(_UTF8_BOM) else data
    if fmt == "html":
        from sparkdoc.htmlparse import html_spans_doc

        return fmt, html_spans_doc(doc_id, raw.decode("utf-8"))
    if fmt == "doclang":
        from sparkdoc.serialize import doclang_spans_doc

        spans = doclang_spans_doc(raw.decode("utf-8").strip())
        return fmt, [
            {"kind": s["kind"], "text": s["text"],
             "media_ref": s["media_ref"], "offset": s["offset"]}
            for s in spans
        ]
    if fmt == "docling_json":
        from sparkdoc.dljson import docling_json_spans_doc

        return fmt, docling_json_spans_doc(doc_id, raw)
    if fmt == "vtt":
        from sparkdoc.vttparse import vtt_spans_doc

        return fmt, vtt_spans_doc(doc_id, raw.decode("utf-8"))
    if fmt == "jats":
        from sparkdoc.jatsparse import jats_spans_doc

        return fmt, jats_spans_doc(doc_id, raw.decode("utf-8"))
    if fmt == "uspto":
        from sparkdoc.usptoparse import uspto_spans_doc

        return fmt, uspto_spans_doc(doc_id, raw.decode("utf-8"))
    if fmt == "mets":
        from sparkdoc.metsparse import mets_spans_doc

        return fmt, mets_spans_doc(doc_id, data)
    if fmt == "asciidoc":
        from sparkdoc.adocparse import adoc_spans_doc

        return fmt, adoc_spans_doc(doc_id, raw.decode("utf-8"))
    if fmt == "csv":
        return fmt, csv_spans_doc(doc_id, raw.decode("utf-8"))
    if fmt == "markdown":
        from sparkdoc.mdparse import md_spans_doc

        return fmt, md_spans_doc(doc_id, raw.decode("utf-8"))
    return fmt, []  # json / binary


def mixed_to_documents(
    docs: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Mixed-format corpus (doc_id, blob binary) → (doc_id, fmt, spans) in
    ONE python stage with ZERO shuffles: scan → mapInPandas, nothing else.

    Every blob is read exactly once; formats never need to be known up
    front or be homogeneous within a partition. The fused per-doc kernels
    are parity-pinned against their generic distributed paths, so routing
    through this operator or through the per-format jobs yields identical
    spans.

    ``passthrough`` carries the named input columns onto each output row
    unchanged (one output row per input row, so this is a pure copy) — the
    file-bucketed resumable warcdir path uses it to keep the container-level
    ``bucket`` without a re-hash or join after the parse."""
    pt = list(passthrough or [])
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(blob_col).alias("blob"), *pt
    )
    out_cols = ["doc_id", "fmt", "spans"] + pt
    schema_struct = StructType(
        list(MIXED_DOCUMENTS.fields)
        + [docs.schema[c] for c in pt]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            extras = [pdf[c] for c in pt]
            for i, (did, blob) in enumerate(zip(pdf["doc_id"], pdf["blob"])):
                fmt, spans = mixed_spans_doc(
                    did, bytes(blob) if blob is not None else b""
                )
                rec = {"doc_id": did, "fmt": fmt, "spans": spans}
                for c, col in zip(pt, extras):
                    rec[c] = col.iloc[i]
                out.append(rec)
            yield (pd.DataFrame(out, columns=out_cols) if out
                   else pd.DataFrame({c: [] for c in out_cols}))

    return src.mapInPandas(gen, schema=schema_struct)


def format_counts(mixed: DataFrame) -> DataFrame:
    """Per-format ingest accounting (docs, spans) — the run-report view a
    100 TB ingest needs to quantify skipped binaries/json rejects."""
    return (
        mixed.groupBy("fmt")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.size("spans")).alias("spans"),
        )
        .orderBy("fmt")
    )
