"""Pure-numpy image codecs: BMP (24/32-bit BI_RGB, bottom-up and top-down),
binary PPM (P6), PGM (P5), PNG (bit depth 8, color types 0/2/3/4/6, all
five scanline filters — DEFLATE via stdlib zlib), GIF (87a/89a LZW,
global/local color tables, interlace; first frame of animations), TIFF
(6.0 baseline subset in this module: II/MM byte orders, gray/inverted-
gray/RGB, none/LZW-with-early-change/PackBits compression, predictor 2,
multi-strip), and JPEG (``sparkdoc.jpegcodec``: baseline SOF0 Huffman +
IDCT with 4:4:4/4:2:0 and restart intervals, AND progressive SOF2 with
spectral selection, successive approximation, EOB runs, per-scan
restarts).

This is the REAL decode kernel behind ``multimodal.image_features`` — no
external image libraries exist in this environment, but these formats are
fully decodable from their public specifications (PNG/GIF/TIFF bit-exactly;
JPEG exactly up to its own quantization loss), so the media pipeline runs
end-to-end on real pixel data instead of the deterministic stub whenever
payloads arrive in one of these containers. WebP-LOSSLESS (VP8L: LZ77 +
canonical prefix codes + the four reversible transforms) decodes natively
via ``sparkdoc.webpcodec``; the genuinely out-of-scope containers (lossy
WebP, AVIF — video-codec intra frames) keep the documented
stub/NotImplementedError path (multimodal._decode_image_real).

Reference parity note: the reference engine delegates image handling to
PIL via docling's conversion backends (see /root/reference docling
dependencies); this module re-derives the container parsing from the BMP
(BITMAPFILEHEADER/BITMAPINFOHEADER, Windows GDI layout) and Netpbm specs —
no reference code involved.

Everything here is driver/executor-side plain Python + numpy: it is called
from Arrow-batched pandas UDFs (one call per image, vectorized numpy inside)
and never appears in a Catalyst expression.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff_format",
    "decode_image",
    "encode_bmp",
    "encode_ppm",
    "encode_pgm",
    "encode_png",
    "encode_gif",
    "encode_tiff",
    "luma_int",
    "gray_grid_embedding",
]


def sniff_format(payload: bytes) -> str | None:
    """Container sniff by magic bytes: 'bmp' | 'ppm' | 'pgm' | 'png' |
    'gif' | 'jpeg' | 'tiff' | 'webp' | None."""
    if len(payload) >= 8 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if len(payload) >= 6 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if len(payload) >= 3 and payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(payload) >= 4 and payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if len(payload) >= 2:
        if payload[:2] == b"BM":
            return "bmp"
        if payload[:2] == b"P6":
            return "ppm"
        if payload[:2] == b"P5":
            return "pgm"
    return None


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

def _decode_bmp(payload: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8 RGB. Supports the classic Windows layout:
    BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes), bpp 24 or 32,
    compression BI_RGB (0). Positive biHeight = bottom-up row order (the
    common case), negative = top-down. 24-bpp rows are padded to 4-byte
    boundaries; pixels are stored BGR(A)."""
    if len(payload) < 54:
        raise ValueError("bmp: truncated header")
    if payload[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"bmp: unsupported DIB header size {header_size}")
    width, height_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1:
        raise ValueError(f"bmp: planes={planes}")
    if compression != 0:
        raise ValueError(f"bmp: compressed BMP (method {compression}) not supported")
    if bpp not in (24, 32):
        raise ValueError(f"bmp: bpp={bpp} not supported (24/32 only)")
    if width <= 0 or height_raw == 0:
        raise ValueError(f"bmp: bad dimensions {width}x{height_raw}")
    bottom_up = height_raw > 0
    height = abs(height_raw)
    channels = bpp // 8
    stride = ((width * channels + 3) // 4) * 4  # rows pad to 4 bytes
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError(f"bmp: truncated pixel data ({len(payload)} < {need})")
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=data_offset)
    rows = raw.reshape(height, stride)[:, : width * channels].reshape(height, width, channels)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) -> RGB; the alpha byte (32 bpp) is dropped
    return np.ascontiguousarray(rows[:, :, :3][:, :, ::-1])


def encode_bmp(arr: np.ndarray, *, bpp: int = 24, bottom_up: bool = True) -> bytes:
    """(H, W, 3) uint8 RGB → BMP bytes (BI_RGB, BITMAPINFOHEADER).

    Exists for tests and synthetic corpora — decoding its output with
    ``decode_image`` must round-trip bit-exactly for both depths and both
    row orders (incl. the 4-byte row padding 24 bpp requires)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp: expected (H, W, 3) uint8 RGB")
    if bpp not in (24, 32):
        raise ValueError(f"encode_bmp: bpp={bpp}")
    h, w, _ = arr.shape
    channels = bpp // 8
    stride = ((w * channels + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = arr[:, :, ::-1]  # RGB -> BGR
    if channels == 4:
        px = np.concatenate([bgr, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2)
    else:
        px = bgr
    rows[:, : w * channels] = px.reshape(h, w * channels)
    if bottom_up:
        rows = rows[::-1]
    pixel_bytes = rows.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_bytes)
    height_field = h if bottom_up else -h
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, height_field, 1, bpp, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return header + dib + pixel_bytes


# --------------------------------------------------------------------------
# Netpbm (binary PPM / PGM)
# --------------------------------------------------------------------------

def _pnm_header(payload: bytes, magic: bytes) -> tuple[int, int, int, int]:
    """Parse a Netpbm binary header: magic, whitespace/comment-separated
    width height maxval, one whitespace byte, then raster. Returns
    (width, height, maxval, raster_offset)."""
    if payload[:2] != magic:
        raise ValueError(f"pnm: bad magic (want {magic!r})")
    fields: list[int] = []
    i = 2
    n = len(payload)
    while len(fields) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":  # comment to end of line
            while i < n and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("pnm: truncated header")
        fields.append(int(payload[i:j]))
        i = j
    if i >= n or not payload[i : i + 1].isspace():
        raise ValueError("pnm: missing raster separator")
    i += 1  # exactly ONE whitespace byte before the raster
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ValueError(f"pnm: bad dimensions {w}x{h}")
    if not (0 < maxval < 256):
        raise ValueError(f"pnm: maxval {maxval} not supported (8-bit only)")
    return w, h, maxval, i


def _decode_ppm(payload: bytes) -> np.ndarray:
    w, h, _, off = _pnm_header(payload, b"P6")
    need = off + w * h * 3
    if len(payload) < need:
        raise ValueError("ppm: truncated raster")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
        .reshape(h, w, 3)
        .copy()
    )


def _decode_pgm(payload: bytes) -> np.ndarray:
    w, h, _, off = _pnm_header(payload, b"P5")
    need = off + w * h
    if len(payload) < need:
        raise ValueError("pgm: truncated raster")
    g = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=off).reshape(h, w)
    return np.repeat(g[:, :, None], 3, axis=2)


def encode_ppm(arr: np.ndarray) -> bytes:
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_ppm: expected (H, W, 3) uint8 RGB")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_pgm(gray: np.ndarray) -> bytes:
    if gray.ndim != 2 or gray.dtype != np.uint8:
        raise ValueError("encode_pgm: expected (H, W) uint8")
    h, w = gray.shape
    return b"P5\n%d %d\n255\n" % (w, h) + gray.tobytes()


# --------------------------------------------------------------------------
# Dispatch + features
# --------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """Decode a supported container to (H, W, 3) uint8 RGB; raises
    ValueError for unsupported/corrupt payloads (PNG/JPEG land here —
    callers fall back to the documented stub path)."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        return _decode_bmp(payload)
    if fmt == "ppm":
        return _decode_ppm(payload)
    if fmt == "pgm":
        return _decode_pgm(payload)
    if fmt == "png":
        return _decode_png(payload)
    if fmt == "gif":
        return _decode_gif(payload)
    if fmt == "jpeg":
        from sparkdoc.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    if fmt == "tiff":
        return _decode_tiff(payload)
    if fmt == "webp":
        from sparkdoc.webpcodec import decode_webp

        return decode_webp(payload)  # VP8L only; lossy raises -> stub path
    raise ValueError(
        "decode_image: unsupported container "
        "(BMP/PPM/PGM/PNG/GIF/JPEG/TIFF/lossless-WebP only)"
    )


def luma_int(arr: np.ndarray) -> np.ndarray:
    """Integer BT.601-style luma plane: (77·R + 150·G + 29·B) >> 8 on int64.

    THE single definition — the media_decode gate pins its closed-form SQL
    twin to exactly these coefficients, so every consumer (embedding, pixel
    stats) must share this function rather than re-deriving the formula."""
    a = arr.astype(np.int64)
    return (77 * a[:, :, 0] + 150 * a[:, :, 1] + 29 * a[:, :, 2]) >> 8


def gray_grid_embedding(arr: np.ndarray, grid: int = 4) -> list[float]:
    """Real content embedding: integer-luma block means on a grid×grid
    layout, centered and unit-normalized (grid²-dim — 16 matches the media
    pipeline's EMBED_DIM). Deterministic: integer BT.601-style luma
    (77R+150G+29B)>>8, block boundaries by integer splits, float64 math.
    """
    h, w, _ = arr.shape
    luma = luma_int(arr)
    ys = [h * i // grid for i in range(grid + 1)]
    xs = [w * i // grid for i in range(grid + 1)]
    v = np.empty(grid * grid, dtype=np.float64)
    for i in range(grid):
        for j in range(grid):
            block = luma[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
            v[i * grid + j] = float(block.mean())
    v = v - v.mean()
    n = float(np.sqrt((v * v).sum()))
    if n == 0.0:
        # flat image: deterministic constant unit vector
        v = np.full(grid * grid, 1.0 / np.sqrt(grid * grid))
        return [float(x) for x in v]
    return [float(x / n) for x in v]


# --------------------------------------------------------------------------
# PNG (RFC 2083 / W3C PNG spec) — stdlib zlib + numpy unfiltering
# --------------------------------------------------------------------------
#
# PNG is a COMPRESSED container, but its only compression is DEFLATE —
# which Python ships in the standard library (zlib) — so unlike JPEG it is
# fully decodable here without any external codec. Supported: bit depth 8,
# color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
# interlace method 0, all five scanline filters (None/Sub/Up/Average/
# Paeth). Alpha is dropped on decode (same policy as 32bpp BMP). CRCs are
# verified — a crawl payload with flipped bits fails loudly into the
# callers' decoded=0 fallback instead of yielding garbage pixels.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# bytes per pixel by color type at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunks(payload: bytes):
    """Yield (type, body) for each chunk, verifying lengths and CRCs."""
    import zlib

    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body_end = pos + 8 + size
        if body_end + 4 > n:
            raise ValueError("png: truncated chunk")
        body = payload[pos + 8 : body_end]
        (crc,) = struct.unpack_from(">I", payload, body_end)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: bad CRC on {ctype!r} chunk")
        yield ctype, body
        pos = body_end + 4
        if ctype == b"IEND":
            return
    raise ValueError("png: missing IEND")


def _unfilter_png(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters. Returns (H, W*bpp) uint8.

    Filters Sub/Up are vectorized (uint8 accumulate wraps mod 256 exactly
    as the spec requires); Average and Paeth have a genuine along-x data
    dependency and run as per-byte loops — fine for the Arrow-batched
    per-image call sites, and honest about the spec's sequential recurrence.
    """
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"png: decompressed size {len(raw)} != expected {(stride + 1) * height}"
        )
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(mat[y, 0])
        row = mat[y, 1:].copy()
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            rec = np.add.accumulate(row.reshape(-1, bpp), axis=0, dtype=np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = row + prev
        elif ftype == 3:  # Average
            rec = row
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = row
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[y] = rec
        prev = out[y]
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("png: bad magic")
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(payload):
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError("png: bad IHDR length")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"png: bit depth {depth} not supported (8 only)")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"png: color type {color_type} not supported")
            if comp != 0 or filt != 0:
                raise ValueError("png: nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("png: Adam7 interlace not supported")
            if width <= 0 or height <= 0 or width > 1 << 24 or height > 1 << 24:
                raise ValueError(f"png: bad dimensions {width}x{height}")
        elif ctype == b"PLTE":
            if len(body) % 3 != 0 or not 3 <= len(body) <= 768:
                raise ValueError("png: bad PLTE length")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise ValueError("png: missing IHDR")
    if not idat:
        raise ValueError("png: missing IDAT")
    bpp = _PNG_CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupted stream -> ValueError like the rest
        raise ValueError(f"png: bad IDAT stream ({e})") from None
    flat = _unfilter_png(raw, width, height, bpp)
    if color_type == 0:  # gray
        g = flat.reshape(height, width)
        return np.repeat(g[:, :, None], 3, axis=2)
    if color_type == 2:  # RGB
        return flat.reshape(height, width, 3).copy()
    if color_type == 3:  # palette
        if palette is None:
            raise ValueError("png: color type 3 without PLTE")
        idx = flat.reshape(height, width)
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("png: palette index out of range")
        return palette[idx]
    if color_type == 4:  # gray + alpha (alpha dropped)
        ga = flat.reshape(height, width, 2)
        return np.repeat(ga[:, :, :1], 3, axis=2)
    # color type 6: RGBA (alpha dropped)
    return flat.reshape(height, width, 4)[:, :, :3].copy()


def encode_png(
    arr: np.ndarray,
    *,
    color_type: int = 2,
    filter_type: int | None = None,
    palette: np.ndarray | None = None,
    indices: np.ndarray | None = None,
    alpha: np.ndarray | None = None,
) -> bytes:
    """Encode to PNG for tests and synthetic corpora.

    ``arr``: (H, W, 3) uint8 RGB for color types 2/6, (H, W) uint8 gray for
    0/4; color type 3 takes ``palette`` (N,3) + ``indices`` (H,W) instead
    (arr ignored). ``alpha``: (H, W) uint8 for types 4/6 (default opaque).
    ``filter_type``: fixed filter 0-4 for every row, or None for the
    round-robin (row % 5) sweep — the decoder-exercising default.
    Roundtrip with ``decode_image`` must be exact on the RGB projection.
    """
    import zlib

    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"encode_png: color type {color_type}")
    if color_type == 3:
        if palette is None or indices is None:
            raise ValueError("encode_png: color type 3 needs palette + indices")
        if palette.ndim != 2 or palette.shape[1] != 3 or palette.shape[0] > 256:
            raise ValueError("encode_png: bad palette shape")
        h, w = indices.shape
        px = indices.astype(np.uint8)[:, :, None]
    elif color_type in (0, 4):
        if arr.ndim != 2 or arr.dtype != np.uint8:
            raise ValueError("encode_png: gray color types take (H, W) uint8")
        h, w = arr.shape
        px = arr[:, :, None]
        if color_type == 4:
            a = alpha if alpha is not None else np.full((h, w), 255, dtype=np.uint8)
            px = np.concatenate([px, a[:, :, None]], axis=2)
    else:
        if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
            raise ValueError("encode_png: expected (H, W, 3) uint8 RGB")
        h, w, _ = arr.shape
        px = arr
        if color_type == 6:
            a = alpha if alpha is not None else np.full((h, w), 255, dtype=np.uint8)
            px = np.concatenate([px, a[:, :, None]], axis=2)
    bpp = _PNG_CHANNELS[color_type]
    flat = np.ascontiguousarray(px).reshape(h, w * bpp)
    stride = w * bpp

    lines = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = (y % 5) if filter_type is None else filter_type
        cur = flat[y]
        if ft == 0:
            enc = cur
        elif ft == 1:
            left = np.zeros(stride, dtype=np.uint8)
            left[bpp:] = cur[:-bpp]
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                enc[x] = (int(cur[x]) - ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:
            enc = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                enc[x] = (int(cur[x]) - _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"encode_png: filter type {ft}")
        lines.append(ft)
        lines += enc.tobytes()
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = bytearray(_PNG_MAGIC)
    out += chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(b"PLTE", np.ascontiguousarray(palette.astype(np.uint8)).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(lines), 6))
    out += chunk(b"IEND", b"")
    return bytes(out)


# --------------------------------------------------------------------------
# GIF (GIF87a/GIF89a) — pure-Python LZW + numpy palette expansion
# --------------------------------------------------------------------------
#
# GIF's only compression is the 12-bit variable-width LZW variant its spec
# defines — no external codec needed. Supported: global and local color
# tables, interlaced and sequential row order, 89a extension blocks
# (skipped; transparency is IGNORED — alpha is dropped everywhere in this
# kernel, matching the BMP-32/PNG policy). Animated GIFs decode to their
# FIRST frame (the honest still-image projection for a feature pipeline);
# the frame must cover the full logical screen, else ValueError.

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def _gif_lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """The GIF LZW variant: variable code width starting at min+1, grows to
    12 bits, CLEAR resets the table, EOI terminates. Codes are packed
    LSB-first. Returns exactly ``expect`` pixel indices (extra data after
    EOI is ignored per spec; a short stream raises)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    # table maps code -> bytes; rebuilt on CLEAR
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("gif: LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("gif: first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # table is frozen at 4096 (deferred clear)
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expect:
            # spec says EOI follows; tolerate its absence only at exact fill
            if len(out) > expect:
                raise ValueError("gif: more pixels than image area")
            break
    if len(out) != expect:
        raise ValueError(f"gif: decoded {len(out)} pixels, expected {expect}")
    return bytes(out)


def _decode_gif(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad magic")
    if len(payload) < 13:
        raise ValueError("gif: truncated header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        gct_n = 2 << (packed & 0x07)
        end = pos + 3 * gct_n
        if len(payload) < end:
            raise ValueError("gif: truncated global color table")
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * gct_n, offset=pos).reshape(
            -1, 3
        )
        pos = end
    n = len(payload)
    while pos < n:
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            pos += 2
            while pos < n and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1  # block terminator
        elif block == 0x2C:  # image descriptor
            if pos + 10 > n:
                raise ValueError("gif: truncated image descriptor")
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if (left, top, w, h) != (0, 0, sw, sh):
                raise ValueError("gif: first frame does not cover the logical screen")
            if w <= 0 or h <= 0:
                raise ValueError(f"gif: bad dimensions {w}x{h}")
            ct = gct
            if ipacked & 0x80:
                lct_n = 2 << (ipacked & 0x07)
                end = pos + 3 * lct_n
                if n < end:
                    raise ValueError("gif: truncated local color table")
                ct = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * lct_n, offset=pos
                ).reshape(-1, 3)
                pos = end
            if ct is None:
                raise ValueError("gif: no color table")
            if pos >= n:
                raise ValueError("gif: missing LZW min code size")
            min_code = payload[pos]
            pos += 1
            if not 2 <= min_code <= 8:
                raise ValueError(f"gif: bad LZW min code size {min_code}")
            data = bytearray()
            while pos < n and payload[pos] != 0:
                size = payload[pos]
                if pos + 1 + size > n:
                    raise ValueError("gif: truncated image sub-block")
                data += payload[pos + 1 : pos + 1 + size]
                pos += 1 + size
            if pos >= n:
                raise ValueError("gif: missing sub-block terminator")
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(data), min_code, w * h), dtype=np.uint8
            )
            if int(idx.max(initial=0)) >= ct.shape[0]:
                raise ValueError("gif: color index out of range")
            if ipacked & 0x40:  # interlaced: 4-pass row shuffle
                rows = np.empty((h, w), dtype=np.uint8)
                flat = idx.reshape(h, w)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for y in range(start, h, step):
                        rows[y] = flat[src]
                        src += 1
                idx = rows
            else:
                idx = idx.reshape(h, w)
            return ct[idx]  # first frame only
        elif block == 0x3B:  # trailer before any image
            raise ValueError("gif: no image data")
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    raise ValueError("gif: missing trailer")


def encode_gif(
    palette: np.ndarray,
    indices: np.ndarray,
    *,
    interlace: bool = False,
    compress: bool = True,
    version: bytes = b"GIF89a",
) -> bytes:
    """Encode a single-frame GIF for tests and synthetic corpora.

    ``compress=True`` runs the real GIF-LZW compressor (greedy
    longest-match dictionary, width growth min+1 → 12 bits, CLEAR emitted
    when the table fills at 4096) so roundtrips exercise the decoder's
    table-growth / width-increase / KwKwK paths. ``compress=False`` uses
    the classic 'uncompressed GIF' technique — a CLEAR before every pixel
    keeps the table empty so every code is a literal — which instead
    exercises CLEAR handling on every single pixel. Both are
    bitstream-valid; roundtrip with ``decode_image`` must be exact."""
    if palette.ndim != 2 or palette.shape[1] != 3 or palette.shape[0] > 256:
        raise ValueError("encode_gif: bad palette shape")
    if indices.dtype != np.uint8 or indices.ndim != 2:
        raise ValueError("encode_gif: indices must be (H, W) uint8")
    if int(indices.max(initial=0)) >= palette.shape[0]:
        raise ValueError("encode_gif: index out of palette range")
    h, w = indices.shape
    # color table size: power of two >= max(palette len, 4)
    ct_bits = 1
    while (2 << ct_bits - 1) < max(palette.shape[0], 4):
        ct_bits += 1
    ct_n = 2 << ct_bits - 1
    min_code = max(2, ct_bits)
    clear = 1 << min_code
    width = min_code + 1

    out = bytearray(version)
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    ct = np.zeros((ct_n, 3), dtype=np.uint8)
    ct[: palette.shape[0]] = palette.astype(np.uint8)
    out += ct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)

    if interlace:
        order = []
        for start, step in _GIF_INTERLACE_PASSES:
            order.extend(range(start, h, step))
        seq = indices[order].reshape(-1)
    else:
        seq = indices.reshape(-1)

    # bit packer, LSB-first
    acc = 0
    nbits = 0
    lzw = bytearray()

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    eoi = clear + 1
    if not compress:
        emit(clear)
        for px in seq.tolist():
            emit(int(px))
            emit(clear)  # keep the table permanently empty
        emit(eoi)
    else:
        # Real GIF-LZW. Sync invariant with the decoder (which appends its
        # mirror entry one code later): grow width when the JUST-ASSIGNED
        # code equals 1<<width — that is exactly when the decoder's table
        # length hits 1<<width after its append. At 4096 entries emit CLEAR
        # and restart (never defer).
        pixels = bytes(seq.tolist())

        def fresh():
            return {bytes((i,)): i for i in range(1 << min_code)}, eoi + 1

        emit(clear)
        table, next_code = fresh()
        buf = b""
        for i in range(len(pixels)):
            c = pixels[i : i + 1]
            if buf + c in table:
                buf += c
                continue
            emit(table[buf])
            table[buf + c] = next_code
            assigned, next_code = next_code, next_code + 1
            if assigned == (1 << width) and width < 12:
                width += 1
            buf = c
            if next_code == 4096:
                emit(table[buf])  # flush before reset so widths stay synced
                emit(clear)
                width = min_code + 1
                table, next_code = fresh()
                buf = b""
        if buf:
            emit(table[buf])
        emit(eoi)
    if nbits:
        lzw.append(acc & 0xFF)

    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # image-data terminator
    out.append(0x3B)  # trailer
    return bytes(out)


# --------------------------------------------------------------------------
# TIFF (TIFF 6.0 baseline subset, from scratch off the public spec)
#
# Decoder coverage: both byte orders (II little / MM big), 8-bit samples,
# PhotometricInterpretation 0 (WhiteIsZero, inverted gray), 1 (BlackIsZero
# gray), 2 (RGB); Compression 1 (none), 5 (LZW with the spec's EARLY-CHANGE
# code-width rule and optional horizontal Predictor 2), 32773 (PackBits);
# multi-strip images (RowsPerStrip + StripOffsets/StripByteCounts arrays).
# Metadata-only IFD entries with value types outside the pixel-path subset
# (RATIONAL resolutions, ASCII Software/DateTime, …) are SKIPPED per the
# spec's unknown-field rule — real-world writers emit them on virtually
# every file. Unsupported pixel features (tiles, 16-bit, palettes, planar
# config 2, or a required tag with an exotic type) raise ValueError —
# corrupt payloads never crash callers, they fall back to the documented
# stub path exactly like the other codecs.
# --------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG
# tags a decoder cannot proceed without: ImageWidth, ImageLength,
# PhotometricInterpretation, StripOffsets, StripByteCounts
_TIFF_REQUIRED_TAGS = {256, 257, 262, 273, 279}


def _tiff_read_values(payload: bytes, endian: str, vtype: int, count: int, field: bytes) -> list[int]:
    size = _TIFF_TYPE_SIZE.get(vtype)
    if size is None:
        raise ValueError("tiff: unsupported IFD value type")
    total = size * count
    if total <= 4:
        raw = field[:total]  # value left-justified in the 4-byte field
    else:
        off = int.from_bytes(field, endian)
        raw = payload[off : off + total]
        if len(raw) < total:
            raise ValueError("tiff: IFD value overruns file")
    return [
        int.from_bytes(raw[k * size : (k + 1) * size], endian)
        for k in range(count)
    ]


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                break
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: noop
    if len(out) < expect:
        raise ValueError("tiff: PackBits strip shorter than expected")
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    """Simple spec-valid PackBits: repeat runs >= 3 as replicate runs,
    everything else as literal runs (max 128 either way)."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            while lit_start < i:  # flush pending literals
                take = min(128, i - lit_start)
                out.append(take - 1)
                out += data[lit_start : lit_start + take]
                lit_start += take
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    while lit_start < i:
        take = min(128, i - lit_start)
        out.append(take - 1)
        out += data[lit_start : lit_start + take]
        lit_start += take
    return bytes(out)


_TIFF_CLEAR, _TIFF_EOI = 256, 257


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-flavor LZW: MSB-first bit packing, 9->12 bit codes with the
    spec's EARLY CHANGE (width bumps when the NEXT code to be assigned is
    2^w - 1 — one code earlier than GIF)."""
    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def reset():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = reset()
    width = 9
    prev: bytes | None = None
    while bitpos + width <= nbits and len(out) < expect:
        b0 = bitpos >> 3
        chunk = int.from_bytes(data[b0 : b0 + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == _TIFF_CLEAR:
            table = reset()
            width = 9
            prev = None
            continue
        if code == _TIFF_EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("tiff: LZW first code out of range")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                raise ValueError("tiff: LZW code out of range")
            table.append(prev + entry[:1])
        out += entry
        prev = entry
        # EARLY CHANGE, decoder side: the decoder's table lags the
        # encoder's by one entry (the encoder adds buf+c right after
        # emitting buf; the decoder can only append on the NEXT read), so
        # it must widen one entry early — at 2^w - 2 — to stay bit-synced
        # with an encoder that widens when its next free code is 2^w - 1
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("tiff: LZW strip shorter than expected")
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nacc = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258

    table, next_code = fresh()
    emit(_TIFF_CLEAR)
    buf = b""
    for k in range(len(data)):
        c = data[k : k + 1]
        if buf + c in table:
            buf += c
            continue
        emit(table[buf])
        table[buf + c] = next_code
        next_code += 1
        # early change: the DECODER bumps width when its table length
        # reaches 2^w - 1; mirror exactly so bit boundaries stay in sync
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        buf = c
        if next_code == 4094:  # reset before the table can overflow 12 bits
            emit(table[buf])
            emit(_TIFF_CLEAR)
            width = 9
            table, next_code = fresh()
            buf = b""
    if buf:
        emit(table[buf])
    emit(_TIFF_EOI)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _predictor2_undo(rows: np.ndarray) -> np.ndarray:
    """Horizontal differencing undo: per row, cumulative sum per sample
    channel mod 256 (rows shaped (h, w, spp))."""
    return np.cumsum(rows.astype(np.int64), axis=1).astype(np.uint8)


def _predictor2_apply(rows: np.ndarray) -> np.ndarray:
    d = rows.astype(np.int64)
    d[:, 1:, :] = d[:, 1:, :] - rows.astype(np.int64)[:, :-1, :]
    return (d % 256).astype(np.uint8)


def _decode_tiff(payload: bytes) -> np.ndarray:
    if len(payload) < 8:
        raise ValueError("tiff: truncated header")
    if payload[:4] == b"II*\x00":
        endian = "little"
    elif payload[:4] == b"MM\x00*":
        endian = "big"
    else:
        raise ValueError("tiff: bad magic")
    ifd_off = int.from_bytes(payload[4:8], endian)
    if ifd_off + 2 > len(payload):
        raise ValueError("tiff: IFD offset out of range")
    n_entries = int.from_bytes(payload[ifd_off : ifd_off + 2], endian)
    tags: dict[int, list[int]] = {}
    for e in range(n_entries):
        base = ifd_off + 2 + 12 * e
        ent = payload[base : base + 12]
        if len(ent) < 12:
            raise ValueError("tiff: truncated IFD")
        tag = int.from_bytes(ent[0:2], endian)
        vtype = int.from_bytes(ent[2:4], endian)
        count = int.from_bytes(ent[4:8], endian)
        if vtype not in _TIFF_TYPE_SIZE:
            # RATIONAL (XResolution/YResolution), ASCII (Software/DateTime),
            # UNDEFINED, SRATIONAL etc. are metadata-only — never among the
            # tags required to decode pixels, and the spec requires readers
            # to skip unknown fields. Rejecting them would turn away almost
            # every externally-produced baseline TIFF. Decode-required tags
            # (dims/photometric/strip layout) are SHORT/LONG by spec; if one
            # somehow carries an exotic type the required-tag check below
            # raises with a clear message.
            if tag in _TIFF_REQUIRED_TAGS:
                raise ValueError(
                    f"tiff: required tag {tag} has unsupported value type {vtype}"
                )
            continue
        tags[tag] = _tiff_read_values(payload, endian, vtype, count, ent[8:12])

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"tiff: missing required tag {tag}")
        return default

    w = one(256)
    h = one(257)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("tiff: unreasonable dimensions")
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise ValueError("tiff: only 8-bit gray/RGB supported")
    photo = one(262)
    if photo not in (0, 1, 2):
        raise ValueError("tiff: unsupported photometric interpretation")
    if (photo == 2) != (spp == 3):
        raise ValueError("tiff: photometric/samples mismatch")
    if one(284, 1) != 1:
        raise ValueError("tiff: planar configuration 2 unsupported")
    comp = one(259, 1)
    if comp not in (1, 5, 32773):
        raise ValueError("tiff: unsupported compression")
    predictor = one(317, 1)
    if predictor not in (1, 2) or (predictor == 2 and comp == 1):
        raise ValueError("tiff: unsupported predictor")
    rps = one(278, h) or h
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("tiff: missing strip layout")
    n_strips = (h + rps - 1) // rps
    if len(offsets) != n_strips:
        raise ValueError("tiff: strip count mismatch")

    rows_out = []
    for s in range(n_strips):
        strip_rows = min(rps, h - s * rps)
        expect = strip_rows * w * spp
        raw = payload[offsets[s] : offsets[s] + counts[s]]
        if len(raw) < counts[s]:
            raise ValueError("tiff: strip overruns file")
        if comp == 1:
            if len(raw) < expect:
                raise ValueError("tiff: uncompressed strip short")
            data = raw[:expect]
        elif comp == 32773:
            data = _packbits_decode(raw, expect)
        else:
            data = _tiff_lzw_decode(raw, expect)
        arr = np.frombuffer(data, dtype=np.uint8).reshape(strip_rows, w, spp)
        if predictor == 2:
            arr = _predictor2_undo(arr)
        rows_out.append(arr)
    img = np.concatenate(rows_out, axis=0)
    if photo == 0:
        img = 255 - img
    if spp == 1:
        img = np.repeat(img, 3, axis=2)
    return np.ascontiguousarray(img)


def encode_tiff(
    arr: np.ndarray,
    *,
    photometric: int = 2,
    compression: int = 1,
    byte_order: str = "II",
    rows_per_strip: int | None = None,
    predictor: int = 1,
    metadata: bool = False,
) -> bytes:
    """Encode (H,W,3) RGB (photometric 2) or (H,W) gray (photometric 0/1;
    0 stores inverted WhiteIsZero samples) as a real TIFF. Compression 1 /
    5 (LZW, optional predictor 2) / 32773 (PackBits); layout: header,
    strips, out-of-line value arrays, IFD. ``metadata=True`` adds the
    RATIONAL resolution tags and ASCII Software/DateTime tags virtually
    every real-world writer emits — the decoder must skip these (they are
    value types outside its pixel-path subset), so fixtures use this flag
    to pin that tolerance."""
    endian = "little" if byte_order == "II" else "big"
    if photometric == 2:
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("encode_tiff: RGB needs (H,W,3)")
        samples = arr.astype(np.uint8)
        spp = 3
    else:
        if arr.ndim != 2:
            raise ValueError("encode_tiff: gray needs (H,W)")
        g = arr.astype(np.uint8)
        samples = (255 - g if photometric == 0 else g)[:, :, None]
        spp = 1
    h, w = samples.shape[:2]
    rps = rows_per_strip or h
    strips: list[bytes] = []
    for s in range(0, h, rps):
        block = samples[s : s + rps]
        if predictor == 2:
            block = _predictor2_apply(block)
        data = block.tobytes()
        if compression == 32773:
            data = _packbits_encode(data)
        elif compression == 5:
            data = _tiff_lzw_encode(data)
        strips.append(data)

    def u16(v: int) -> bytes:
        return int(v).to_bytes(2, endian)

    def u32(v: int) -> bytes:
        return int(v).to_bytes(4, endian)

    out = bytearray()
    out += (b"II*\x00" if endian == "little" else b"MM\x00*")
    out += u32(0)  # IFD offset patched below
    strip_offsets = []
    for data in strips:
        strip_offsets.append(len(out))
        out += data
    if len(out) % 2:
        out += b"\x00"

    # out-of-line value arrays (when they exceed the 4-byte inline field)
    def values_field(vals: list[int], vtype: int) -> bytes:
        size = _TIFF_TYPE_SIZE[vtype]
        raw = b"".join(int(v).to_bytes(size, endian) for v in vals)
        if len(raw) <= 4:
            return raw.ljust(4, b"\x00")
        off = len(out)
        out.extend(raw)
        if len(out) % 2:
            out.extend(b"\x00")
        return u32(off)

    entries: list[tuple[int, int, int, bytes]] = []

    def add(tag: int, vtype: int, vals: list[int]) -> None:
        entries.append((tag, vtype, len(vals), values_field(vals, vtype)))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [compression])
    add(262, 3, [photometric])
    add(273, 4, strip_offsets)
    add(277, 3, [spp])
    add(278, 4, [rps])
    add(279, 4, [len(d) for d in strips])
    if predictor != 1:
        add(317, 3, [predictor])
    if metadata:
        # raw-typed metadata entries (RATIONAL=5, ASCII=2) — types the
        # decoder does NOT parse and must skip
        def add_raw(tag: int, vtype: int, count: int, raw: bytes) -> None:
            if len(raw) <= 4:
                field = raw.ljust(4, b"\x00")
            else:
                off = len(out)
                out.extend(raw)
                if len(out) % 2:
                    out.extend(b"\x00")
                field = u32(off)
            entries.append((tag, vtype, count, field))

        res = u32(72) + u32(1)  # 72/1 dpi as a RATIONAL numerator/denominator
        add_raw(282, 5, 1, res)  # XResolution
        add_raw(283, 5, 1, res)  # YResolution
        add(296, 3, [2])  # ResolutionUnit = inch
        sw = b"sparkdoc tiff writer\x00"
        add_raw(305, 2, len(sw), sw)  # Software
        dt = b"2020:01:01 00:00:00\x00"
        add_raw(306, 2, len(dt), dt)  # DateTime
    entries.sort(key=lambda t: t[0])  # spec: ascending tag order
    ifd_off = len(out)
    out += u16(len(entries))
    for tag, vtype, count, field in entries:
        out += u16(tag) + u16(vtype) + u32(count) + field
    out += u32(0)  # no next IFD
    out[4:8] = u32(ifd_off)
    return bytes(out)
