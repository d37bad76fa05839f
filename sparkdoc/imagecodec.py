"""Pure-numpy image codecs for uncompressed formats: BMP (24/32-bit BI_RGB,
bottom-up and top-down), binary PPM (P6) and PGM (P5).

This is the REAL decode kernel behind ``multimodal.image_features`` — no
external image libraries exist in this environment, but these formats are
bit-exactly decodable from their public specifications, so the media
pipeline runs end-to-end on real pixel data instead of the deterministic
stub whenever payloads arrive in one of these containers. Compressed
formats (PNG/JPEG) still require a codec library and keep the documented
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
    "gray_grid_embedding",
]


def sniff_format(payload: bytes) -> str | None:
    """Container sniff by magic bytes: 'bmp' | 'ppm' | 'pgm' | None."""
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
    raise ValueError("decode_image: unsupported container (BMP/PPM/PGM only)")


def gray_grid_embedding(arr: np.ndarray, grid: int = 4) -> list[float]:
    """Real content embedding: integer-luma block means on a grid×grid
    layout, centered and unit-normalized (grid²-dim — 16 matches the media
    pipeline's EMBED_DIM). Deterministic: integer BT.601-style luma
    (77R+150G+29B)>>8, block boundaries by integer splits, float64 math.
    """
    h, w, _ = arr.shape
    a = arr.astype(np.int64)
    luma = (77 * a[:, :, 0] + 150 * a[:, :, 1] + 29 * a[:, :, 2]) >> 8
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
