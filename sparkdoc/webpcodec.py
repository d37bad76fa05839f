"""WebP-lossless (VP8L) codec, from scratch off the public spec.

The r4 verdict's remaining media gap (Next #6): VP8L is the one modern
container whose bitstream is self-contained (LZ77 + canonical Huffman +
four reversible pixel transforms — no DCT, no video-codec intra machinery),
so it is implementable exactly from the WebP Lossless Bitstream
Specification. Lossy WebP (VP8 intra frames) and AVIF (AV1) remain the
documented stub path in ``multimodal``.

Decoder coverage: full VP8L feature surface —
  * LSB-first bitstream, 14-bit dimensions header;
  * canonical prefix codes: simple (1-2 symbol) and normal
    (code-length-code with 16/17/18 repeats, optional max_symbol cap);
  * color cache (hash 0x1e35a7bd, 1..11 bits), LZ77 backward references
    with the 120-entry two-dimensional distance map, literals;
  * meta-prefix (entropy image) tiling for the spatially-coded image;
  * all four transforms, inverse-applied in reverse bitstream order:
    PREDICTOR (14 modes, exact border rules incl. the top-right wrap to
    the current row's first pixel at x = w-1), COLOR (signed fixed-point
    3.5 deltas, r2b applied on the reconstructed red), SUBTRACT_GREEN,
    COLOR_INDEXING (delta-coded palette, 1/2/4-bit pixel bundling).

Encoder: spec-valid streams over the same surface (literal-only, LZ77
greedy with plain distances and 2D window codes, color cache, palette
with bundling, subtract-green, predictor mode-2/5 tiles) — the round-trip
matrix in tests exercises decoder paths with INDEPENDENTLY computed pixel
oracles, and hand-built bitstream vectors pin the exact bit layout.

The 120-entry distance map is GENERATED from its defining rule (the
window offsets (x, y), y in 0..7, x in -8..7, excluding y = 0, x >= 0,
ordered by ascending x*x + y*y, then y descending, then x ascending),
not transcribed — the derivation is pinned by unit tests against known
anchor codes (code 0 = one row up, code 1 = previous pixel, code 96 =
eight left, code 119 = (-8, 7)).

No reference-repo counterpart exists (the reference delegates images to
PIL); everything here derives from the public spec. Pure Python + numpy,
called from Arrow-batched pandas UDFs — never inside Catalyst exprs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_vp8l", "decode_webp", "encode_webp_lossless", "plane_code_to_offset"]


# --------------------------------------------------------------------------
# bit IO (LSB-first within bytes, like DEFLATE)
# --------------------------------------------------------------------------


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("vp8l: bitstream truncated")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("vp8l: bitstream truncated")
        bit = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return bit


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def getvalue(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# --------------------------------------------------------------------------
# canonical prefix codes
# --------------------------------------------------------------------------


def build_canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), RFC1951-style canonical assignment (codes
    ordered by (length, symbol); first transmitted bit = MSB of the code)."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class PrefixTree:
    """Bit-by-bit decoder; also records single-symbol (0-bit) codes."""

    __slots__ = ("single", "tree")

    def __init__(self, lengths: list[int]):
        nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("vp8l: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][0]
            self.tree = None
            return
        self.single = None
        codes = build_canonical_codes(lengths)
        # completeness (Kraft equality) — required by the spec
        if sum(1 << (max(l for _, l in nz) - l) for _, l in nz) != (
            1 << max(l for _, l in nz)
        ):
            raise ValueError("vp8l: prefix code is not complete")
        tree: dict[int, object] = {}
        for sym, (code, ln) in codes.items():
            cur = tree
            for i in range(ln - 1, 0, -1):
                cur = cur.setdefault((code >> i) & 1, {})
                if not isinstance(cur, dict):
                    raise ValueError("vp8l: prefix code collision")
            b = code & 1
            if b in cur:
                raise ValueError("vp8l: prefix code collision")
            cur[b] = sym
        self.tree = tree

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        cur = self.tree
        while True:
            cur = cur.get(br.read_bit())
            if cur is None:
                raise ValueError("vp8l: invalid prefix code bits")
            if not isinstance(cur, dict):
                return cur


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixTree:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            if sym0 >= alphabet_size:
                raise ValueError("vp8l: simple code symbol out of range")
            lengths[sym0] = 1  # PrefixTree turns a lone symbol into 0 bits
        else:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size or sym0 == sym1:
                raise ValueError("vp8l: simple code symbols invalid")
            lengths[sym0] = 1
            lengths[sym1] = 1
        return PrefixTree(lengths)
    # normal: code-length code over 19 symbols in the spec's order
    num_codes = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = PrefixTree(clc_lengths)
    if br.read_bit():  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = clc.decode(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat = 3 + br.read(2)
                fill = prev_len
            elif code_len == 17:
                repeat = 3 + br.read(3)
                fill = 0
            else:  # 18
                repeat = 11 + br.read(7)
                fill = 0
            if symbol + repeat > alphabet_size:
                raise ValueError("vp8l: code length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return PrefixTree(lengths)


# --------------------------------------------------------------------------
# LZ77 prefix values + the 2D distance map
# --------------------------------------------------------------------------


def _prefix_value(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """value (>=1) -> (code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra = hi - 1
    code = 2 * hi + ((v >> extra) & 1)
    return code, v & ((1 << extra) - 1), extra


def _gen_distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance window offsets (x, y): y in 0..7, x in -8..7,
    excluding (y == 0 and x >= 0); ordered by ascending x*x + y*y, then y
    DESCENDING, then x ascending. Pixel distance = y * xsize - x."""
    cands = [
        (x, y)
        for y in range(0, 8)
        for x in range(-8, 8)
        if not (y == 0 and x >= 0)
    ]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0]))
    assert len(cands) == 120
    return cands


_DIST_MAP = _gen_distance_map()


def plane_code_to_offset(code: int) -> tuple[int, int]:
    """0-based short-distance code -> (x, y) window offset."""
    return _DIST_MAP[code]


def _plane_code_to_distance(xsize: int, dist_code: int) -> int:
    """dist_code is the 1-based decoded prefix value."""
    if dist_code > 120:
        return dist_code - 120
    x, y = _DIST_MAP[dist_code - 1]
    return max(1, y * xsize - x)


def _offset_to_plane_code(x: int, y: int) -> int | None:
    try:
        return _DIST_MAP.index((x, y))
    except ValueError:
        return None


# --------------------------------------------------------------------------
# entropy-coded image streams
# --------------------------------------------------------------------------

_NUM_LENGTH_CODES = 24
_CACHE_MULT = 0x1E35A7BD


def _cache_key(argb: int, bits: int) -> int:
    return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - bits)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image_stream(br: BitReader, xsize: int, ysize: int, is_level0: bool):
    """Decode one VP8L image stream into a uint32 ARGB array (ysize, xsize).
    Returns (pixels, transforms) — transforms only read when is_level0."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # PREDICTOR
                bits = br.read(3) + 2
                tw, th = _subsample_size(xsize, bits), _subsample_size(ysize, bits)
                tiles, _ = _decode_image_stream(br, tw, th, False)
                transforms.append(("predictor", bits, tiles))
            elif ttype == 1:  # COLOR
                bits = br.read(3) + 2
                tw, th = _subsample_size(xsize, bits), _subsample_size(ysize, bits)
                tiles, _ = _decode_image_stream(br, tw, th, False)
                transforms.append(("color", bits, tiles))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append(("subtract_green",))
            else:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal_deltas, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries accumulate COMPONENTWISE mod 256, not as
                # uint32 addition (no carries across channels)
                comp = (
                    np.ascontiguousarray(pal_deltas.reshape(-1))
                    .view(np.uint8)
                    .reshape(-1, 4)
                    .astype(np.int64)
                )
                comp = np.cumsum(comp, axis=0) % 256
                pal_argb = (
                    comp.astype(np.uint8).reshape(-1, 4).copy().view(np.uint32).reshape(-1)
                )
                if n_colors <= 2:
                    pbits = 3
                elif n_colors <= 4:
                    pbits = 2
                elif n_colors <= 16:
                    pbits = 1
                else:
                    pbits = 0
                transforms.append(("palette", pal_argb, pbits, xsize))
                if pbits:
                    xsize = _subsample_size(xsize, pbits)
    # color cache
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("vp8l: invalid color cache bits")
    # meta prefix image
    meta = None
    meta_bits = 0
    num_groups = 1
    meta_w = 0
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        mw, mh = _subsample_size(xsize, meta_bits), _subsample_size(ysize, meta_bits)
        meta_img, _ = _decode_image_stream(br, mw, mh, False)
        # _decode_image_stream returns (ysize, xsize)-shaped pixels; flatten
        # ONCE so the row-major flat index below addresses a scalar — 2-D
        # flat-indexing returned a whole ROW for any meta image wider than
        # one column (every real-world entropy-image file)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64).reshape(-1)
        meta_w = mw
        num_groups = int(meta.max()) + 1
    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = xsize * ysize
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        x, y = pos % xsize, pos // xsize
        if meta is not None:
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            if gi >= num_groups:
                raise ValueError("vp8l: meta prefix index out of range")
            gt, rt, bt, at, dt = groups[gi]
        else:
            gt, rt, bt, at, dt = groups[0]
        sym = gt.decode(br)
        if sym < 256:
            red = rt.decode(br)
            blue = bt.decode(br)
            alpha = at.decode(br)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif sym < 256 + _NUM_LENGTH_CODES:
            length = _prefix_value(sym - 256, br)
            dist_code = _prefix_value(dt.decode(br), br)
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: LZ77 reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            out[pos] = cache[sym - 256 - _NUM_LENGTH_CODES]
            pos += 1
    return out.reshape(ysize, xsize), transforms


# --------------------------------------------------------------------------
# inverse transforms
# --------------------------------------------------------------------------


def _argb_channels(arr: np.ndarray):
    return (arr >> 24) & 0xFF, (arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF


def _avg2(p1: int, p2: int) -> int:
    # per-channel (a + b) >> 1 without carries across channels
    return (((p1 ^ p2) & 0xFEFEFEFE) >> 1) + (p1 & p2)


def _add_pixels(a: int, b: int) -> int:
    # per-channel modular add
    out = 0
    for sh in (0, 8, 16, 24):
        out |= (((a >> sh) + (b >> sh)) & 0xFF) << sh
    return out


def _select(l: int, t: int, tl: int) -> int:
    s = 0
    for sh in (0, 8, 16, 24):
        lc, tc, tlc = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        s += abs(lc - tlc) - abs(tc - tlc)
    # s = sum(|L-TL|) - sum(|T-TL|): L closer to TL => vertical gradient => T
    return t if s <= 0 else l


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (0, 8, 16, 24):
        a = (ave >> sh) & 0xFF
        c = (tl >> sh) & 0xFF
        v = a + (a - c) // 2 if (a - c) >= 0 else a - ((c - a) // 2)
        # C truncation toward zero: (a - c) / 2
        out |= max(0, min(255, v)) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError("vp8l: invalid predictor mode")


def _inverse_predictor(img: np.ndarray, bits: int, tiles: np.ndarray) -> np.ndarray:
    h, w = img.shape
    tw = _subsample_size(w, bits)
    out = img.copy()
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # top row: left
            elif x == 0:
                pred = int(out[y - 1, 0])  # left column: top
            else:
                mode = (int(tiles[y >> bits, x >> bits]) >> 8) & 0xFF
                l = int(out[y, x - 1])
                t = int(out[y - 1, x])
                tl = int(out[y - 1, x - 1])
                # top-right of the last column wraps to the CURRENT row's
                # first pixel (contiguous-buffer behavior the format pins)
                tr = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                pred = _predict(mode, l, t, tr, tl)
            out[y, x] = _add_pixels(int(img[y, x]), pred)
    return out


def _ct_delta(t: int, c: int) -> int:
    # signed 3.5 fixed-point: (int8(t) * int8(c)) >> 5 (arithmetic shift)
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(img: np.ndarray, bits: int, tiles: np.ndarray) -> np.ndarray:
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            cte = int(tiles[y >> bits, x >> bits])
            g2r = cte & 0xFF          # blue channel
            g2b = (cte >> 8) & 0xFF   # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            px = int(out[y, x])
            a, r, g, b = (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _inverse_subtract_green(img: np.ndarray) -> np.ndarray:
    a, r, g, b = _argb_channels(img)
    r = (r + g) % 256
    b = (b + g) % 256
    return (a << 24) | (r << 16) | (g << 8) | b


def _inverse_palette(img: np.ndarray, palette: np.ndarray, pbits: int, orig_w: int) -> np.ndarray:
    h, packed_w = img.shape
    idx_full = np.zeros((h, orig_w), dtype=np.int64)
    if pbits == 0:
        idx_full = ((img >> 8) & 0xFF).astype(np.int64)
    else:
        per = 1 << pbits  # pixels per packed green byte: 8/4/2
        width_bits = 8 >> pbits  # 1/2/4 bits per pixel, LSB-first
        green = ((img >> 8) & 0xFF).astype(np.int64)
        for x in range(orig_w):
            sub = x // per
            shift = (x % per) * width_bits
            idx_full[:, x] = (green[:, sub] >> shift) & ((1 << width_bits) - 1)
    if idx_full.max(initial=0) >= len(palette):
        raise ValueError("vp8l: palette index out of range")
    return palette[idx_full]


def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a raw VP8L bitstream (the VP8L chunk payload) to (H, W, 4)
    RGBA uint8."""
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature")
    br = BitReader(data)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unsupported version")
    if w * h > 64_000_000:
        raise ValueError("vp8l: unreasonable dimensions")
    # transforms shrink the coded xsize (palette bundling)
    coded_w = w
    img, transforms = _decode_image_stream(br, coded_w, h, True)
    for t in reversed(transforms):
        if t[0] == "predictor":
            img = _inverse_predictor(img, t[1], t[2])
        elif t[0] == "color":
            img = _inverse_color_transform(img, t[1], t[2])
        elif t[0] == "subtract_green":
            img = _inverse_subtract_green(img)
        else:  # palette
            img = _inverse_palette(img, t[1], t[2], t[3])
    if img.shape != (h, w):
        raise ValueError("vp8l: decoded shape mismatch")
    a, r, g, b = _argb_channels(img)
    return np.stack([r, g, b, a], axis=2).astype(np.uint8)


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container -> (H, W, 3) RGB (alpha dropped). Lossless
    (VP8L) only; lossy VP8/VP8X-wrapped-lossy raise ValueError and fall to
    the documented stub path."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("webp: bad container")
    i = 12
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + size]
        if tag == b"VP8L":
            rgba = decode_vp8l(body)
            return np.ascontiguousarray(rgba[:, :, :3])
        if tag == b"VP8 ":
            raise ValueError("webp: lossy VP8 unsupported (documented stub)")
        i += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk found")


# --------------------------------------------------------------------------
# encoder (spec-valid VP8L; feature selection via mode)
# --------------------------------------------------------------------------


def _write_code_lengths(bw: BitWriter, lengths: list[int]) -> None:
    """Normal-code emission: code-length-code carrying the raw lengths (no
    16/17/18 runs except a single trailing zero-run via max_symbol)."""
    used = set(l for l in lengths if l)
    # trailing zeros handled by max_symbol cap
    last_nz = max((i for i, l in enumerate(lengths) if l), default=-1)
    trimmed = lengths[: last_nz + 1]
    clc_hist = {}
    for l in trimmed:
        clc_hist[l] = clc_hist.get(l, 0) + 1
    clc_lengths = [0] * 19
    distinct = sorted(clc_hist)
    if len(distinct) == 1:
        clc_lengths[distinct[0]] = 1  # lone symbol: spec allows len-1 solo? build
        # a complete 1-bit code needs 2 symbols; pair it with an unused one
        other = 0 if distinct[0] != 0 else 1
        clc_lengths[other] = 1
    else:
        # flat code over the distinct length symbols (complete: pad to pow2)
        import math

        nbits = max(1, math.ceil(math.log2(len(distinct))))
        # make Kraft-complete: assign nbits to 2^nbits symbols
        pool = distinct + [s for s in range(19) if s not in distinct]
        for s in pool[: 1 << nbits]:
            clc_lengths[s] = nbits
    clc_codes = build_canonical_codes(clc_lengths)
    bw.write(0, 1)  # not simple
    # num_code_lengths: emit all 19 slots (covers any order position)
    bw.write(19 - 4, 4)
    for s in _CLC_ORDER:
        bw.write(clc_lengths[s], 3)
    if last_nz + 1 < len(lengths):
        # use max_symbol cap for the trailing zero run
        n = last_nz + 1
        # choose smallest length_nbits with capacity
        for ln_code in range(8):
            nb = 2 + 2 * ln_code
            if n - 2 < (1 << nb):
                break
        bw.write(1, 1)
        bw.write(ln_code, 3)
        bw.write(n - 2, nb)
    else:
        bw.write(0, 1)
    for l in trimmed:
        code, ln = clc_codes[l]
        for i in range(ln - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


def _write_prefix_code(bw: BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    nz = [(s, l) for s, l in enumerate(lengths) if l]
    if any(s > 255 for s, _ in nz):
        # simple codes carry at most 8-bit symbols; length/cache symbols
        # (>= 256) force the normal code-length path
        _write_code_lengths(bw, lengths)
        return build_canonical_codes(lengths)
    if len(nz) == 1 and nz[0][1] == 1:
        sym = nz[0][0]
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if sym < 2:
            bw.write(0, 1)
            bw.write(sym, 1)
        else:
            bw.write(1, 1)
            bw.write(sym, 8)
        return {sym: (0, 0)}
    if len(nz) == 2 and all(l == 1 for _, l in nz):
        (s0, _), (s1, _) = nz
        bw.write(1, 1)
        bw.write(1, 1)  # two symbols
        if s0 < 2:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (0, 1), s1: (1, 1)}
    _write_code_lengths(bw, lengths)
    return build_canonical_codes(lengths)


def _huff_lengths(hist: dict[int, int], alphabet: int, max_len: int = 15) -> list[int]:
    """Length-limited Huffman (simple package-merge-free heuristic: build
    Huffman, then flatten overlong codes by incrementing shorter ones)."""
    import heapq

    syms = [s for s, c in hist.items() if c > 0]
    lengths = [0] * alphabet
    if not syms:
        return lengths
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    counts = dict(hist)
    while True:
        lengths = [0] * alphabet
        heap = [(c, i, (s,)) for i, (s, c) in enumerate(sorted(counts.items())) if c > 0]
        heapq.heapify(heap)
        i = len(heap)
        while len(heap) > 1:
            c1, _, g1 = heapq.heappop(heap)
            c2, _, g2 = heapq.heappop(heap)
            for s in g1 + g2:
                lengths[s] += 1
            heapq.heappush(heap, (c1 + c2, i, g1 + g2))
            i += 1
        if max(lengths) <= max_len:
            return lengths
        # depth limiting, zlib-style: halve the counts (floor at 1) and
        # rebuild — converges to a balanced tree (depth ceil(log2 n) <= 15)
        counts = {s: max(1, c >> 1) for s, c in counts.items()}


def _emit(bw: BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, ln = codes[sym]
    for i in range(ln - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


class _Token:
    __slots__ = ("kind", "a", "b", "c", "d")

    def __init__(self, kind, a=0, b=0, c=0, d=0):
        self.kind, self.a, self.b, self.c, self.d = kind, a, b, c, d


def _tokenize(pixels: list[int], xsize: int, use_lz77: bool, cache_bits: int):
    """Greedy tokens: cache hits, LZ77 row/col matches, literals."""
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(pixels)
    pos = 0
    while pos < n:
        px = pixels[pos]
        if cache is not None:
            k = _cache_key(px, cache_bits)
            if cache[k] == px:
                tokens.append(_Token("cache", k))
                pos += 1
                continue
        if use_lz77 and pos > 0:
            best_len, best_dist = 0, 0
            for dist in (1, xsize):
                if dist <= pos:
                    ln = 0
                    while pos + ln < n and ln < 4096 and pixels[pos + ln - dist] == pixels[pos + ln]:
                        ln += 1
                    if ln > best_len:
                        best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append(_Token("copy", best_len, best_dist))
                if cache is not None:
                    for i in range(best_len):
                        cache[_cache_key(pixels[pos + i], cache_bits)] = pixels[pos + i]
                pos += best_len
                continue
        tokens.append(_Token("lit", px))
        if cache is not None:
            cache[_cache_key(px, cache_bits)] = px
        pos += 1
    return tokens


def _encode_image_stream(
    bw: BitWriter,
    argb: np.ndarray,
    xsize: int,
    *,
    use_lz77: bool = False,
    cache_bits: int = 0,
    is_level0: bool = False,
) -> None:
    pixels = [int(v) for v in argb.reshape(-1)]
    tokens = _tokenize(pixels, xsize, use_lz77, cache_bits)
    # histograms
    gh: dict[int, int] = {}
    rh: dict[int, int] = {}
    bh: dict[int, int] = {}
    ah: dict[int, int] = {}
    dh: dict[int, int] = {}
    def dist_to_code(dist: int) -> int:
        """Pixel distance -> 1-based VP8L distance code (prefer the 2D
        window codes the way real encoders do)."""
        if dist == xsize:
            return _offset_to_plane_code(0, 1) + 1
        if 1 <= dist <= 8:
            return _offset_to_plane_code(-dist, 0) + 1
        return dist + 120

    for t in tokens:
        if t.kind == "lit":
            px = t.a
            gh[(px >> 8) & 0xFF] = gh.get((px >> 8) & 0xFF, 0) + 1
            rh[(px >> 16) & 0xFF] = rh.get((px >> 16) & 0xFF, 0) + 1
            bh[px & 0xFF] = bh.get(px & 0xFF, 0) + 1
            ah[(px >> 24) & 0xFF] = ah.get((px >> 24) & 0xFF, 0) + 1
        elif t.kind == "copy":
            lc, _, _ = _prefix_encode(t.a)
            gh[256 + lc] = gh.get(256 + lc, 0) + 1
            dc, _, _ = _prefix_encode(dist_to_code(t.b))
            dh[dc] = dh.get(dc, 0) + 1
        else:
            gh[256 + _NUM_LENGTH_CODES + t.a] = gh.get(256 + _NUM_LENGTH_CODES + t.a, 0) + 1
    # color cache header
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_level0:
        bw.write(0, 1)  # no meta prefix codes (single group)
    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    for h in (rh, bh, ah):
        if not h:
            h[0] = 1  # trees must exist even if unused
    if not dh:
        dh[0] = 1
    if not gh:
        gh[0] = 1
    g_codes = _write_prefix_code(bw, _huff_lengths(gh, green_alpha))
    r_codes = _write_prefix_code(bw, _huff_lengths(rh, 256))
    b_codes = _write_prefix_code(bw, _huff_lengths(bh, 256))
    a_codes = _write_prefix_code(bw, _huff_lengths(ah, 256))
    d_codes = _write_prefix_code(bw, _huff_lengths(dh, 40))
    for t in tokens:
        if t.kind == "lit":
            px = t.a
            _emit(bw, g_codes, (px >> 8) & 0xFF)
            _emit(bw, r_codes, (px >> 16) & 0xFF)
            _emit(bw, b_codes, px & 0xFF)
            _emit(bw, a_codes, (px >> 24) & 0xFF)
        elif t.kind == "copy":
            lc, lv, lb = _prefix_encode(t.a)
            _emit(bw, g_codes, 256 + lc)
            if lb:
                bw.write(lv, lb)
            dc, dv, db = _prefix_encode(dist_to_code(t.b))
            _emit(bw, d_codes, dc)
            if db:
                bw.write(dv, db)
        else:
            _emit(bw, g_codes, 256 + _NUM_LENGTH_CODES + t.a)


def encode_webp_lossless(
    arr: np.ndarray,
    *,
    use_lz77: bool = False,
    cache_bits: int = 0,
    subtract_green: bool = False,
    palette: bool = False,
    predictor_mode: int | None = None,
) -> bytes:
    """Encode (H,W,3) RGB or (H,W,4) RGBA as a RIFF/WEBP VP8L file.

    Feature flags pick the transform/entropy path so tests can exercise
    each decoder branch; combinations follow the spec's transform order
    (subtract-green and predictor are mutually composable; palette
    excludes both, as in libwebp)."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    if arr.shape[2] == 3:
        a = np.full((h, w), 255, dtype=np.uint32)
    else:
        a = arr[:, :, 3].astype(np.uint32)
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    argb = (a << 24) | (r << 16) | (g << 8) | b

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if arr.shape[2] == 4 else 0, 1)
    bw.write(0, 3)  # version

    coded = argb
    coded_w = w
    if palette:
        colors = list(dict.fromkeys(int(v) for v in argb.reshape(-1)))
        if len(colors) > 256:
            raise ValueError("encode: palette mode needs <= 256 colors")
        lut = {c: i for i, c in enumerate(colors)}
        n_colors = len(colors)
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        # delta-coded palette as a 1-row image
        deltas = []
        prev = 0
        for c in colors:
            d = 0
            for sh in (0, 8, 16, 24):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _encode_image_stream(bw, np.array(deltas, dtype=np.uint32), n_colors)
        idx = np.vectorize(lut.__getitem__)(argb).astype(np.uint32)
        if n_colors <= 2:
            pbits, per, wbits = 3, 8, 1
        elif n_colors <= 4:
            pbits, per, wbits = 2, 4, 2
        elif n_colors <= 16:
            pbits, per, wbits = 1, 2, 4
        else:
            pbits, per, wbits = 0, 1, 8
        if pbits:
            coded_w = _subsample_size(w, pbits)
            packed = np.zeros((h, coded_w), dtype=np.uint32)
            for x in range(w):
                packed[:, x // per] |= idx[:, x] << ((x % per) * wbits)
            coded = (0xFF000000 | (packed << 8)).astype(np.uint32)
        else:
            coded_w = w
            coded = (0xFF000000 | (idx << 8)).astype(np.uint32)
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)  # SUBTRACT_GREEN
            rr = (r - g) % 256
            bb = (b - g) % 256
            coded = (a << 24) | (rr << 16) | (g << 8) | bb
        if predictor_mode is not None:
            bw.write(1, 1)
            bw.write(0, 2)  # PREDICTOR
            bits = 4  # 16x16 tiles
            bw.write(bits - 2, 3)
            tw, th = _subsample_size(w, bits), _subsample_size(h, bits)
            tiles = np.full((th, tw), 0xFF000000 | (predictor_mode << 8), dtype=np.uint32)
            _encode_image_stream(bw, tiles, tw)
            # residuals via the exact decoder border rules
            src = coded
            res = np.zeros_like(src)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = int(src[0, x - 1])
                    elif x == 0:
                        pred = int(src[y - 1, 0])
                    else:
                        l = int(src[y, x - 1])
                        t = int(src[y - 1, x])
                        tl = int(src[y - 1, x - 1])
                        tr = int(src[y - 1, x + 1]) if x + 1 < w else int(src[y, 0])
                        pred = _predict(predictor_mode, l, t, tr, tl)
                    d = 0
                    pxv = int(src[y, x])
                    for sh in (0, 8, 16, 24):
                        d |= (((pxv >> sh) - (pred >> sh)) & 0xFF) << sh
                    res[y, x] = d
            coded = res
    bw.write(0, 1)  # no more transforms
    _encode_image_stream(
        bw, coded, coded_w, use_lz77=use_lz77, cache_bits=cache_bits, is_level0=True
    )
    payload = bw.getvalue()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
