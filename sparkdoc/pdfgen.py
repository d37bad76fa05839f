"""Minimal deterministic PDF renderer (pure stdlib) — synth-corpus writer.

Produces real, spec-conformant PDF 1.4 bytes for the PDF-ingest gate: pages
with Flate-compressed content streams, Courier / Courier-Bold text
(WinAnsiEncoding — fixed 0.6 em advance, so geometry is exactly
reconstructable), per-cell positioned table text, and 1×1-pixel image
XObjects placed via ``cm`` matrices.  The parser under test
(``sparkdoc/pdfparse.py``) never sees the authored plan — only these bytes.

Writer subset (everything the reference's PDF corpus exercises through
docling's layout model, re-expressed as first-principles PDF):
  * text blocks: ``BT /F1 s Tf L TL a b c d e f Tm (line) Tj T* … ET``
  * occasional TJ arrays with small kern numbers (mid-line split fodder)
  * tables: one ``BT … Tm (cell) Tj ET`` per cell at explicit column x's
  * images: ``q w 0 0 h x y cm /ImN Do Q`` over a shared 1×1 gray XObject
  * Flate-compressed streams, correct xref table + trailer

This doubles as a tiny PDF *sink* for spans tables (see ``documents_to_pdf``
in tests), but its primary job is gate fodder, like the HTML/Markdown
renderers in synth.py.
"""

from __future__ import annotations

import zlib

#: Courier advance per char, in 1/1000 em — every glyph in the Courier
#: family is 600 (public AFM metrics), which is what makes text geometry
#: closed-form for both writer and parser.
COURIER_ADVANCE = 0.6
#: ascent/descent fractions of the font size used for line bboxes
ASCENT = 0.8
DESCENT = 0.2


def _escape_pdf_text(s: str) -> bytes:
    """cp1252-encode (WinAnsi) and escape PDF string delimiters."""
    b = s.encode("cp1252", errors="replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def leading_for(size: int) -> int:
    return int(size * 1.3)


def text_block_ops(
    x: int, y_top: int, size: int, bold: bool, lines: list[str],
    page_h: int, kern_splits: list[int] | None = None,
) -> bytes:
    """One BT/ET group: first line via Tm, following lines via TL + T*.
    ``y_top`` is the authored TOPLEFT block top; the first baseline sits one
    ascent below it.  ``kern_splits[i]`` (optional) splits line i at that
    char offset into a TJ array with a small kern number — invisible
    geometry, mid-word split fodder for the parser's run merging."""
    font = b"/F2" if bold else b"/F1"
    lead = leading_for(size)
    y0 = page_h - y_top - round(ASCENT * size)
    out = [b"BT %s %d Tf %d TL 1 0 0 1 %d %d Tm" % (font, size, lead, x, y0)]
    for i, line in enumerate(lines):
        if i > 0:
            out.append(b"T*")
        cut = kern_splits[i] if kern_splits else 0
        if cut and 0 < cut < len(line):
            out.append(
                b"[(%s) -15 (%s)] TJ"
                % (_escape_pdf_text(line[:cut]), _escape_pdf_text(line[cut:]))
            )
        else:
            out.append(b"(%s) Tj" % _escape_pdf_text(line))
    out.append(b"ET")
    return b"\n".join(out)


def table_ops(
    x: int, y_top: int, size: int, col_xs: list[int], rows: list[list[str]],
    page_h: int,
) -> bytes:
    """Tables the way real generators emit them: one BT group per ROW, each
    cell positioned at its column x via a relative Td jump — recovering the
    row/column structure from the x/y geometry is the parser's job."""
    lead = int(size * 1.6)
    out = []
    for r, row in enumerate(rows):
        y = page_h - y_top - round(ASCENT * size) - r * lead
        parts = [b"BT /F1 %d Tf 1 0 0 1 %d %d Tm" % (size, col_xs[0], y)]
        prev_x = col_xs[0]
        for cx, cell in zip(col_xs, row):
            if cx != prev_x:
                parts.append(b"%d 0 Td" % (cx - prev_x))
                prev_x = cx
            parts.append(b"(%s) Tj" % _escape_pdf_text(cell))
        parts.append(b"ET")
        out.append(b" ".join(parts))
    return b"\n".join(out)


def image_ops(x: int, y_top: int, w: int, h: int, page_h: int) -> bytes:
    return b"q %d 0 0 %d %d %d cm /Im1 Do Q" % (w, h, x, page_h - y_top - h)


def render_pdf(page_contents: list[bytes], page_w: int, page_h: int) -> bytes:
    """Assemble a complete PDF: catalog, page tree, shared fonts + image
    XObject, one Flate-compressed content stream per page, xref, trailer."""
    objs: list[bytes] = []  # 1-based object bodies, index = number - 1

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    cat = add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_num = add(b"PLACEHOLDER")  # patched below
    f1 = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
             b" /Encoding /WinAnsiEncoding >>")
    f2 = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier-Bold"
             b" /Encoding /WinAnsiEncoding >>")
    img_px = zlib.compress(b"\x80")
    im1 = add(
        b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1"
        b" /ColorSpace /DeviceGray /BitsPerComponent 8"
        b" /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
        % (len(img_px), img_px)
    )
    res = (
        b"<< /Font << /F1 %d 0 R /F2 %d 0 R >> /XObject << /Im1 %d 0 R >> >>"
        % (f1, f2, im1)
    )
    page_nums: list[int] = []
    for content in page_contents:
        data = zlib.compress(content)
        cnum = add(
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
            % (len(data), data)
        )
        pnum = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources %s /Contents %d 0 R >>"
            % (page_w, page_h, res, cnum)
        )
        page_nums.append(pnum)
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[pages_num - 1] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0] * (len(objs) + 1)
    for i, body in enumerate(objs, start=1):
        offsets[i] = len(buf)
        buf += b"%d 0 obj\n" % i
        buf += body
        buf += b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objs) + 1)
    buf += b"0000000000 65535 f \n"
    for i in range(1, len(objs) + 1):
        buf += b"%010d 00000 n \n" % offsets[i]
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, cat, xref_at)
    )
    return bytes(buf)
