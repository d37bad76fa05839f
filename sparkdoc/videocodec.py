"""Pure-numpy Y4M (YUV4MPEG2) video codec — the video counterpart of
imagecodec/audiocodec: Y4M is the standard UNCOMPRESSED video interchange
container (raw YUV planes behind a text header), bit-exactly parsable from
its public spec, so frame sampling and per-frame statistics run on real
decoded frames. Compressed video (MP4/H.264/VP9) needs ffmpeg-class codecs
the sandbox lacks and keeps the documented stub path.

Supported colorspaces: C420* (chroma quarter-size — the default), C422
(half-width), C444 (full), Cmono (no chroma). Only the luma (Y) plane is
returned — every downstream statistic is luma-based — but chroma plane
SIZES must still be parsed exactly right: a wrong skip desynchronizes every
subsequent FRAME marker, which is precisely what the position-weighted
per-frame sums in the media_video_decode gate would catch.

Called from Arrow-batched pandas UDFs; never in a Catalyst expression.
"""

from __future__ import annotations

import numpy as np

__all__ = ["sniff_y4m", "decode_y4m", "encode_y4m"]

_MAGIC = b"YUV4MPEG2 "


def sniff_y4m(payload: bytes) -> bool:
    return payload[: len(_MAGIC)] == _MAGIC


def _chroma_bytes(w: int, h: int, cs: str) -> int:
    """Bytes of BOTH chroma planes for one frame."""
    if cs.startswith("C420"):
        return 2 * ((w // 2) * (h // 2))
    if cs.startswith("C422"):
        return 2 * ((w // 2) * h)
    if cs.startswith("C444"):
        return 2 * (w * h)
    if cs.startswith("Cmono"):
        return 0
    raise ValueError(f"y4m: unsupported colorspace {cs}")


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Y4M → ((n_frames, H, W) uint8 luma array, fps_num, fps_den)."""
    if not sniff_y4m(payload):
        raise ValueError("y4m: bad magic")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("y4m: unterminated stream header")
    params = payload[len(_MAGIC) : nl].decode("ascii", "replace").split(" ")
    w = h = 0
    fps_num, fps_den = 30, 1
    cs = "C420"
    for p in params:
        if not p:
            continue
        if p[0] == "W":
            w = int(p[1:])
        elif p[0] == "H":
            h = int(p[1:])
        elif p[0] == "F":
            num, den = p[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif p[0] == "C":
            cs = p
    if w <= 0 or h <= 0:
        raise ValueError(f"y4m: bad dimensions {w}x{h}")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError(f"y4m: bad frame rate {fps_num}:{fps_den}")
    y_size = w * h
    skip = _chroma_bytes(w, h, cs)
    frames: list[np.ndarray] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fe = payload.find(b"\n", pos)
        if fe < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m: bad FRAME marker")
        pos = fe + 1
        # frames are fixed-size (luma + chroma): a stream truncated even
        # mid-chroma is corrupt — tolerating it would mask the desync bugs
        # the strict size check exists to catch
        if pos + y_size + skip > n:
            raise ValueError("y4m: truncated frame")
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=y_size, offset=pos).reshape(h, w)
        )
        pos += y_size + skip
    if not frames:
        raise ValueError("y4m: no frames")
    return np.stack(frames), fps_num, fps_den


def encode_y4m(
    luma: np.ndarray, fps_num: int = 30, fps_den: int = 1, colorspace: str = "C420"
) -> bytes:
    """(n_frames, H, W) uint8 luma → Y4M bytes (chroma planes neutral 128).
    Exists for tests and synthetic corpora; decode_y4m must round-trip the
    luma exactly for every supported colorspace."""
    if luma.ndim != 3 or luma.dtype != np.uint8 or luma.shape[0] == 0:
        raise ValueError("encode_y4m: expected (n_frames, H, W) uint8")
    _, h, w = luma.shape
    if colorspace.startswith(("C420", "C422")) and (w % 2 or (colorspace.startswith("C420") and h % 2)):
        raise ValueError(f"y4m: {colorspace} needs even dimensions, got {w}x{h}")
    header = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 {colorspace}\n".encode()
    chroma = bytes([128]) * _chroma_bytes(w, h, colorspace)
    out = [header]
    for f in range(luma.shape[0]):
        out.append(b"FRAME\n")
        out.append(luma[f].tobytes())
        out.append(chroma)
    return b"".join(out)
