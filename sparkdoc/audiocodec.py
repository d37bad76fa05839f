"""Pure-numpy WAV (RIFF PCM) codec — the audio counterpart of
sparkdoc.imagecodec: uncompressed PCM WAV files are bit-exactly decodable
from the public RIFF/WAVE spec, so the multimodal audio pipeline computes
REAL sample statistics instead of the deterministic stub whenever payloads
arrive as PCM WAV. Compressed audio (MP3/AAC/OGG) still needs a codec
library the sandbox lacks and keeps the stub path.

Supported: PCM (format tag 1) 8-bit unsigned and 16-bit signed
little-endian, any channel count, chunk-walk header parsing (fmt/data in
any order, unknown chunks skipped — real encoders emit LIST/fact chunks).

Called from Arrow-batched pandas UDFs (one call per payload, vectorized
numpy inside); never appears in a Catalyst expression.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["sniff_wav", "decode_wav", "encode_wav"]


def sniff_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV → ((n_samples, n_channels) int32 array, sample_rate).

    8-bit PCM is unsigned (centered at 128) and is rescaled to the signed
    16-bit range ((v − 128) · 256) so downstream statistics are
    depth-independent; 16-bit PCM passes through."""
    if not sniff_wav(payload):
        raise ValueError("wav: bad RIFF/WAVE magic")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # validate the BODY length, not the declared size — a truncated
            # payload can declare size 16 but carry fewer bytes, and a
            # struct.error escaping here would crash the Spark task instead
            # of taking the callers' documented decoded=0 fallback
            if len(body) < 16:
                raise ValueError("wav: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("wav: truncated data chunk")
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"wav: compressed format tag {audio_format} not supported")
    if channels < 1:
        raise ValueError(f"wav: channels={channels}")
    if bits == 16:
        frames = len(data) // (2 * channels)
        raw = np.frombuffer(data, dtype="<i2", count=frames * channels)
        samples = raw.astype(np.int32)
    elif bits == 8:
        frames = len(data) // channels
        raw = np.frombuffer(data, dtype=np.uint8, count=frames * channels)
        samples = (raw.astype(np.int32) - 128) * 256
    else:
        raise ValueError(f"wav: bits={bits} not supported (8/16 only)")
    if frames == 0:
        raise ValueError("wav: empty data chunk")
    return samples.reshape(frames, channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int, *, bits: int = 16) -> bytes:
    """(n_samples, n_channels) int array (16-bit signed range) → WAV bytes.
    Exists for tests and synthetic corpora; decode_wav must round-trip it."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2 or samples.shape[0] == 0:
        raise ValueError("encode_wav: expected (n_samples, n_channels)")
    frames, channels = samples.shape
    if bits == 16:
        body = samples.astype("<i2").tobytes()
        block = 2 * channels
    elif bits == 8:
        body = ((samples.astype(np.int32) // 256) + 128).astype(np.uint8).tobytes()
        block = channels
    else:
        raise ValueError(f"encode_wav: bits={bits}")
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
