"""Multimodal payloads: image/audio/video as opaque binary columns.

Media travel as ``binary`` + typed metadata struct; the span table references
them via ``media_ref`` (``#/pictures/<id>``). Decode / feature-extract /
resize / frame-sample are Arrow-batched pandas UDFs over mapInPandas.

Decode status: payloads in BMP 24/32-bit, binary PPM/PGM, PNG (bit depth 8,
all color types, all scanline filters — DEFLATE via stdlib zlib), GIF
(87a/89a LZW, interlace, first frame), baseline JPEG (SOF0 Huffman +
IDCT, 4:4:4/4:2:0, restart intervals), and TIFF (II/MM byte orders, 8-bit
gray incl. WhiteIsZero + RGB, none/PackBits/LZW-with-early-change
compression, horizontal predictor, multi-strip) decode FOR REAL via the
pure-numpy ``sparkdoc.imagecodec``/``jpegcodec`` kernels — true
dimensions, pixel statistics, and a content embedding come from actual
pixels (gates ``media_decode`` / ``media_png_decode`` /
``media_gif_decode`` / ``media_jpeg_decode`` / ``media_tiff_decode`` pin
the decoded stats against closed-form SQL twins).
Containers beyond those (WebP, AVIF, progressive JPEG) still need a codec
library the sandbox lacks and keep the documented stub path behind
``SPARKDOC_FAKE_CODECS`` (deterministic fake embedding) /
``_decode_image_real`` (NotImplementedError when fakes are disabled).

Design for 100 TB of media:
  * blobs never join wide tables — media lives in its own table keyed by
    media_ref, bucketed the same way as documents so media⋈spans is
    co-partitioned
  * features (small structs) are computed once and stored columnar; the
    binary column is pruned away by Catalyst unless explicitly selected
  * mapInPandas streams Arrow record batches — cap rows per batch so a
    batch of 10 MB blobs fits executor memory
    (spark.sql.execution.arrow.maxRecordsPerBatch)
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
        StructField("meta_sample_rate", IntegerType(), True),
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("sha256", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)

FRAME_SAMPLES = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame_sha256", StringType(), False),
    ]
)

FAKE_CODECS = os.environ.get("SPARKDOC_FAKE_CODECS", "1") == "1"
EMBED_DIM = 16


def _decode_image_real(payload: bytes):  # pragma: no cover - no codecs in sandbox
    raise NotImplementedError(
        "decode for containers beyond BMP/PPM/PGM/PNG/GIF/TIFF/"
        "baseline+progressive-JPEG/lossless-WebP (e.g. lossy WebP, AVIF) "
        "needs PIL/opencv — not available in this container; the supported "
        "formats decode natively via sparkdoc.imagecodec/jpegcodec/"
        "webpcodec, and SPARKDOC_FAKE_CODECS=1 (default) stubs the rest "
        "deterministically"
    )


def _try_decode(payload: bytes):
    """Real decode for natively-supported containers; None when the payload
    is not one of them (or is corrupt) so callers can fall back."""
    from sparkdoc import imagecodec

    if imagecodec.sniff_format(payload) is None:
        return None
    try:
        return imagecodec.decode_image(payload)
    except (ValueError, TypeError, IndexError, KeyError):
        # the codecs normalize most malformed-payload failures to
        # ValueError, but a truncated/adversarial bitstream can surface as
        # an index/type error from deep inside the entropy decoders — the
        # 'corrupt payloads never crash callers' contract means ANY decode
        # failure falls back to the stub path, never up through the task
        return None


def _fake_embed(payload: bytes, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic fake 'embedding': bytes → blake2b → unit-norm floats."""
    h = hashlib.blake2b(payload, digest_size=dim * 2).digest()
    v = np.frombuffer(h, dtype=np.uint16).astype(np.float64)
    v = v / 65535.0 - 0.5
    n = float(np.sqrt((v * v).sum())) or 1.0
    return [float(x / n) for x in v]


def synth_media_df(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Deterministic media table for every picture span in ``documents``
    (payload = seeded pseudo-bytes; metadata typed)."""
    pics = (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "picture")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import random

        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                rng = random.Random(f"media:{doc_id}:{ref}")
                size = rng.randint(256, 4096)
                payload = bytes(rng.getrandbits(8) for _ in range(size))
                rows.append(
                    {
                        "media_ref": ref,
                        "doc_id": doc_id,
                        "media_type": "image",
                        "mime": "image/png",
                        "payload": payload,
                        "meta_width": rng.choice([320, 640, 1024]),
                        "meta_height": rng.choice([240, 480, 768]),
                        "meta_duration_ms": None,
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return pics.mapInPandas(gen, schema=MEDIA)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per image: hash, size, dims, embedding.

    Natively-decodable containers (BMP/PPM/PGM/PNG/GIF/baseline-JPEG —
    sparkdoc.imagecodec + jpegcodec) yield
    TRUE width/height from the pixel data (overriding possibly-lying
    metadata) and a real content embedding (gray-grid block means);
    everything else takes the documented stub path (metadata dims + fake
    hash embedding, or NotImplementedError with fakes disabled).

    Arrow-batched; the binary column is consumed here and pruned from all
    downstream plans.
    """
    from sparkdoc.imagecodec import gray_grid_embedding

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                arr = _try_decode(payload)
                if arr is not None:
                    width, height = int(arr.shape[1]), int(arr.shape[0])
                    embedding = gray_grid_embedding(arr)
                else:
                    if not FAKE_CODECS:
                        _decode_image_real(payload)
                    width, height = r.meta_width, r.meta_height
                    embedding = _fake_embed(payload)
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "doc_id": r.doc_id,
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "n_bytes": len(payload),
                        "width": width,
                        "height": height,
                        "embedding": embedding,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "image").mapInPandas(
        feats, schema=IMAGE_FEATURES
    )


PIXEL_STATS = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("decoded", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
        StructField("wsum_luma", LongType(), True),
    ]
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL pixel statistics per decodable image: channel sums plus a
    position-weighted luma sum, wsum_luma = Σ (y·W + x) · luma(x, y) with
    integer luma (77·R + 150·G + 29·B) >> 8.

    The position weighting makes the statistic sensitive to ROW ORDER and
    CHANNEL ORDER, so it pins exactly the parts a container decoder can get
    wrong (bottom-up flip, BGR swap, row padding) — the ``media_decode``
    gate recomputes it in closed form over the generating formula.
    Undecodable payloads emit decoded=0 with null stats (never an error —
    a 100 TB media crawl always contains junk)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sparkdoc.imagecodec import luma_int

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = _try_decode(bytes(r.payload))
                if arr is None:
                    rows.append(
                        {
                            "media_ref": r.media_ref,
                            "doc_id": r.doc_id,
                            "decoded": 0,
                            "width": None,
                            "height": None,
                            "sum_r": None,
                            "sum_g": None,
                            "sum_b": None,
                            "wsum_luma": None,
                        }
                    )
                    continue
                a = arr.astype(np.int64)
                h, w, _ = a.shape
                luma = luma_int(arr)
                pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "doc_id": r.doc_id,
                        "decoded": 1,
                        "width": w,
                        "height": h,
                        "sum_r": int(a[:, :, 0].sum()),
                        "sum_g": int(a[:, :, 1].sum()),
                        "sum_b": int(a[:, :, 2].sum()),
                        "wsum_luma": int((pos * luma).sum()),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "image").mapInPandas(
        stats, schema=PIXEL_STATS
    )


def synth_decodable_media_df(spark: SparkSession, n: int = 40) -> DataFrame:
    """Deterministic REAL-container media corpus: image i rotates through
    five encodings (BMP bottom-up 24bpp, BMP top-down 24bpp, BMP bottom-up
    32bpp, binary PPM, binary PGM) with formula pixels

        r = (7x + 13y + i) mod 256
        g = (3x + 5y + 2i) mod 251     (PGM: r = g = b = r-formula)
        b = (11x + 17y + 3i) mod 241

    and dimensions w = 5 + i mod 6, h = 4 + i mod 7 — the width sweep
    exercises every 24bpp row-padding remainder. The closed-form pixel rule
    is what lets the media_decode oracle verify the DECODER, not just the
    plumbing."""
    from sparkdoc.imagecodec import encode_bmp, encode_pgm, encode_ppm

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                w, h = 5 + i % 6, 4 + i % 7
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                r = (7 * x + 13 * y + i) % 256
                g = (3 * x + 5 * y + 2 * i) % 251
                b = (11 * x + 17 * y + 3 * i) % 241
                kind = i % 5
                if kind == 4:
                    payload = encode_pgm(r.astype(np.uint8))
                    mime = "image/x-portable-graymap"
                else:
                    arr = np.stack(
                        [r.astype(np.uint8), g.astype(np.uint8), b.astype(np.uint8)], axis=2
                    )
                    if kind == 0:
                        payload, mime = encode_bmp(arr, bpp=24, bottom_up=True), "image/bmp"
                    elif kind == 1:
                        payload, mime = encode_bmp(arr, bpp=24, bottom_up=False), "image/bmp"
                    elif kind == 2:
                        payload, mime = encode_bmp(arr, bpp=32, bottom_up=True), "image/bmp"
                    else:
                        payload, mime = encode_ppm(arr), "image/x-portable-pixmap"
                rows.append(
                    {
                        "media_ref": f"#/pictures/{i}",
                        "doc_id": f"img{i:04d}",
                        "media_type": "image",
                        "mime": mime,
                        "payload": payload,
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": None,
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


def synth_png_media_df(spark: SparkSession, n: int = 40) -> DataFrame:
    """Deterministic REAL-PNG media corpus: image i rotates through the five
    PNG color types (2 RGB, 6 RGBA, 0 gray, 4 gray+alpha, 3 palette) with
    the same formula pixels as ``synth_decodable_media_df``

        r = (7x + 13y + i) mod 256
        g = (3x + 5y + 2i) mod 251     (gray types: r = g = b = r-formula)
        b = (11x + 17y + 3i) mod 241

    Palette images index with p = (x + 2y + i) mod 64 into a PLTE whose
    entry j is (7j+i mod 256, 3j+2i mod 251, 11j+3i mod 241); alpha (types
    4/6) is (5x + 7y + i) mod 253 and must be DROPPED by the decoder. Every
    row uses filter (y mod 5) — the round-robin sweeps all five scanline
    filters within each image — and dimensions w = 5 + i mod 6,
    h = 4 + i mod 7 keep h ≥ 4 so at least filters 0-3 always fire. The
    closed-form pixel rule lets the ``media_png_decode`` oracle verify the
    DEFLATE + unfilter + color-type expansion pipeline without touching any
    container bytes."""
    from sparkdoc.imagecodec import encode_png

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                w, h = 5 + i % 6, 4 + i % 7
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                r = ((7 * x + 13 * y + i) % 256).astype(np.uint8)
                g = ((3 * x + 5 * y + 2 * i) % 251).astype(np.uint8)
                b = ((11 * x + 17 * y + 3 * i) % 241).astype(np.uint8)
                alpha = ((5 * x + 7 * y + i) % 253 + np.zeros((h, w), dtype=np.int64)).astype(
                    np.uint8
                )
                kind = i % 5
                if kind == 0:
                    payload = encode_png(np.stack([r, g, b], axis=2), color_type=2)
                elif kind == 1:
                    payload = encode_png(
                        np.stack([r, g, b], axis=2), color_type=6, alpha=alpha
                    )
                elif kind == 2:
                    payload = encode_png(r, color_type=0)
                elif kind == 3:
                    payload = encode_png(r, color_type=4, alpha=alpha)
                else:
                    j = np.arange(64, dtype=np.int64)
                    pal = np.stack(
                        [(7 * j + i) % 256, (3 * j + 2 * i) % 251, (11 * j + 3 * i) % 241],
                        axis=1,
                    ).astype(np.uint8)
                    idx = ((x + 2 * y + i) % 64 + np.zeros((h, w), dtype=np.int64)).astype(
                        np.uint8
                    )
                    payload = encode_png(None, color_type=3, palette=pal, indices=idx)
                rows.append(
                    {
                        "media_ref": f"#/pictures/{i}",
                        "doc_id": f"png{i:04d}",
                        "media_type": "image",
                        "mime": "image/png",
                        "payload": payload,
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": None,
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


def synth_gif_media_df(spark: SparkSession, n: int = 40) -> DataFrame:
    """Deterministic REAL-GIF media corpus: every image is palette-indexed
    (GIF is always paletted) with the same palette/index formulas as the
    PNG type-3 rotation —

        index p = (x + 2y + i) mod 64
        PLTE[j] = ((7j+i) mod 256, (3j+2i) mod 251, (11j+3i) mod 241)

    — while i mod 4 rotates the CONTAINER shape: (LZW-compressed,
    sequential), (LZW, interlaced), (clear-per-pixel uncompressed,
    sequential), (uncompressed, interlaced). All four decode to identical
    pixels, so one closed-form oracle (``media_gif_decode``) pins the LZW
    table growth, the 4-pass interlace shuffle, and CLEAR handling at once.
    Dimensions w = 5 + i mod 6, h = 4 + i mod 7."""
    from sparkdoc.imagecodec import encode_gif

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                w, h = 5 + i % 6, 4 + i % 7
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                j = np.arange(64, dtype=np.int64)
                pal = np.stack(
                    [(7 * j + i) % 256, (3 * j + 2 * i) % 251, (11 * j + 3 * i) % 241],
                    axis=1,
                ).astype(np.uint8)
                idx = ((x + 2 * y + i) % 64 + np.zeros((h, w), dtype=np.int64)).astype(
                    np.uint8
                )
                kind = i % 4
                payload = encode_gif(
                    pal, idx, compress=kind < 2, interlace=kind % 2 == 1
                )
                rows.append(
                    {
                        "media_ref": f"#/pictures/{i}",
                        "doc_id": f"gif{i:04d}",
                        "media_type": "image",
                        "mime": "image/gif",
                        "payload": payload,
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": None,
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


def synth_tiff_media_df(spark: SparkSession, n: int = 40) -> DataFrame:
    """Deterministic REAL-TIFF media corpus: the same formula pixels as the
    PNG corpus —

        r = (7x + 13y + i) mod 256
        g = (3x + 5y + 2i) mod 251     (gray kinds: r = g = b = r-formula)
        b = (11x + 17y + 3i) mod 241

    while i mod 6 rotates the CONTAINER shape across both byte orders and
    every supported compression:

        0 RGB, uncompressed, II, 2-row strips
        1 RGB, PackBits, MM, 3-row strips
        2 RGB, LZW, II, single strip
        3 gray BlackIsZero, LZW + horizontal predictor 2, MM, 2-row strips
        4 gray WhiteIsZero (samples stored INVERTED), PackBits, II
        5 RGB, LZW + predictor 2, MM, 2-row strips

    All six decode to identical formula pixels, so one closed-form oracle
    (``media_tiff_decode``) pins IFD parsing in both endiannesses, strip
    reassembly, PackBits runs, TIFF-LZW early-change code widths, the
    differencing predictor, and the WhiteIsZero inversion at once.
    Dimensions w = 5 + i mod 6, h = 4 + i mod 7."""
    from sparkdoc.imagecodec import encode_tiff

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                w, h = 5 + i % 6, 4 + i % 7
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                r = ((7 * x + 13 * y + i) % 256).astype(np.uint8)
                g = ((3 * x + 5 * y + 2 * i) % 251).astype(np.uint8)
                b = ((11 * x + 17 * y + 3 * i) % 241).astype(np.uint8)
                rgb = np.stack([r, g, b], axis=2)
                kind = i % 6
                if kind == 0:
                    payload = encode_tiff(rgb, compression=1, byte_order="II", rows_per_strip=2)
                elif kind == 1:
                    payload = encode_tiff(rgb, compression=32773, byte_order="MM", rows_per_strip=3)
                elif kind == 2:
                    payload = encode_tiff(rgb, compression=5, byte_order="II")
                elif kind == 3:
                    payload = encode_tiff(r, photometric=1, compression=5, byte_order="MM", rows_per_strip=2, predictor=2)
                elif kind == 4:
                    payload = encode_tiff(r, photometric=0, compression=32773, byte_order="II")
                else:
                    payload = encode_tiff(rgb, compression=5, byte_order="MM", rows_per_strip=2, predictor=2)
                rows.append(
                    {
                        "media_ref": f"#/pictures/{i}",
                        "doc_id": f"tif{i:04d}",
                        "media_type": "image",
                        "mime": "image/tiff",
                        "payload": payload,
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": None,
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


def synth_webp_media_df(spark: SparkSession, n: int = 42) -> DataFrame:
    """Deterministic REAL WebP-lossless (VP8L) media corpus: the same
    formula pixels as the TIFF corpus —

        r = (7x + 13y + i) mod 256
        g = (3x + 5y + 2i) mod 251
        b = (11x + 17y + 3i) mod 241

    while i mod 6 rotates the VP8L feature shape:

        0 literal-only
        1 LZ77 backward references (incl. the 2D window distance codes)
        2 color cache (6 bits)
        3 subtract-green transform
        4 predictor transform (mode 7, averages) + LZ77
        5 color-indexing (palette) — w*h <= 100 distinct colors, so the
          delta-coded palette and (for tiny palettes) pixel bundling run

    All six decode to identical formula pixels, so one closed-form oracle
    (``media_webp_decode``) pins the prefix-code reader, LZ77 + distance
    map, cache hashing, and every inverse transform at once. Dimensions
    w = 5 + i mod 6, h = 4 + i mod 7 (as the TIFF corpus)."""
    from sparkdoc.webpcodec import encode_webp_lossless

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                w, h = 5 + i % 6, 4 + i % 7
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                r = ((7 * x + 13 * y + i) % 256).astype(np.uint8)
                g = ((3 * x + 5 * y + 2 * i) % 251).astype(np.uint8)
                b = ((11 * x + 17 * y + 3 * i) % 241).astype(np.uint8)
                rgb = np.stack([r, g, b], axis=2)
                kind = i % 6
                if kind == 0:
                    payload = encode_webp_lossless(rgb)
                elif kind == 1:
                    payload = encode_webp_lossless(rgb, use_lz77=True)
                elif kind == 2:
                    payload = encode_webp_lossless(rgb, cache_bits=6)
                elif kind == 3:
                    payload = encode_webp_lossless(rgb, subtract_green=True)
                elif kind == 4:
                    payload = encode_webp_lossless(rgb, predictor_mode=7, use_lz77=True)
                else:
                    payload = encode_webp_lossless(rgb, palette=True)
                rows.append(
                    {
                        "media_ref": f"#/pictures/{i}",
                        "doc_id": f"wbp{i:04d}",
                        "media_type": "image",
                        "mime": "image/webp",
                        "payload": payload,
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": None,
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


def synth_jpeg_media_df(spark: SparkSession, n: int = 40) -> DataFrame:
    """Deterministic REAL-JPEG media corpus, built so decode is CLOSED-FORM
    despite JPEG being lossy: every 8x8 block (16x16 macroblock in 4:2:0) is
    FLAT, so only the DC coefficient is nonzero and the all-8s quant table
    reconstructs the level-shifted value exactly (see jpegcodec docstring).
    Encoding happens from YCbCr planes directly, so the decoded RGB is the
    fixed floor(x+0.5) color conversion of the block formulas

        Y  = (37·bx + 53·by + 11 + i) mod 256
        Cb = (29·bx + 71·by + 5 + 2i) mod 256
        Cr = (41·bx + 13·by + 101 + 3i) mod 256

    with bx = x // s, by = y // s. i mod 4 rotates the container shape:
    0 = grayscale single-component (r = g = b = Y), 1 = color 4:4:4,
    2 = color 4:2:0 (s = 16, dims multiples of 16), 3 = color 4:4:4 with
    restart interval 2 (DRI/RSTn exercised). The ``media_jpeg_decode``
    oracle replays the conversion in SQL — a Huffman desync, a DC-predictor
    slip, a wrong IDCT scale, or a chroma-upsample bug breaks the match."""
    from sparkdoc.jpegcodec import encode_jpeg

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                kind = i % 4
                if kind == 2:
                    s = 16
                    w, h = 16 * (1 + i % 2), 16 * (1 + (i // 4) % 2)
                else:
                    s = 8
                    w, h = 8 * (1 + i % 4), 8 * (1 + i % 3)
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                bx, by = x // s, y // s
                yv = ((37 * bx + 53 * by + 11 + i) % 256).astype(np.float64)
                yv = yv + np.zeros((h, w))
                if kind == 0:
                    payload = encode_jpeg(yv.astype(np.uint8), gray=True)
                else:
                    cb = ((29 * bx + 71 * by + 5 + 2 * i) % 256).astype(np.float64)
                    cr = ((41 * bx + 13 * by + 101 + 3 * i) % 256).astype(np.float64)
                    ycc = np.stack(
                        [yv, cb + np.zeros((h, w)), cr + np.zeros((h, w))], axis=2
                    )
                    payload = encode_jpeg(
                        None,
                        subsampling="420" if kind == 2 else "444",
                        ycbcr=ycc,
                        restart_interval=2 if kind == 3 else 0,
                    )
                rows.append(
                    {
                        "media_ref": f"#/pictures/{i}",
                        "doc_id": f"jpg{i:04d}",
                        "media_type": "image",
                        "mime": "image/jpeg",
                        "payload": payload,
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": None,
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


def synth_jpeg_prog_media_df(spark: SparkSession, n: int = 40) -> DataFrame:
    """PROGRESSIVE (SOF2) twin of ``synth_jpeg_media_df``: the IDENTICAL
    flat-block formula images, coded with the multi-scan progressive
    script (interleaved DC first at Al=1, per-component full-band AC
    first, DC refinement, AC refinement) instead of one sequential scan.
    The decoded pixels are the same closed forms, so the
    ``media_jpeg_prog_decode`` oracle is the sequential gate's SQL with
    only the doc_id prefix changed — pinning scan accumulation,
    successive-approximation refinement, and EOB-run handling against the
    same ground truth. i%4==3 (the DRI rotation in the sequential corpus)
    codes as plain 4:4:4 progressive: restart framing doesn't change
    pixels, and the progressive encoder doesn't emit DRI."""
    from sparkdoc.jpegcodec import encode_jpeg

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                kind = i % 4
                if kind == 2:
                    s = 16
                    w, h = 16 * (1 + i % 2), 16 * (1 + (i // 4) % 2)
                else:
                    s = 8
                    w, h = 8 * (1 + i % 4), 8 * (1 + i % 3)
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                bx, by = x // s, y // s
                yv = ((37 * bx + 53 * by + 11 + i) % 256).astype(np.float64)
                yv = yv + np.zeros((h, w))
                if kind == 0:
                    payload = encode_jpeg(
                        yv.astype(np.uint8), gray=True, progressive=True
                    )
                else:
                    cb = ((29 * bx + 71 * by + 5 + 2 * i) % 256).astype(np.float64)
                    cr = ((41 * bx + 13 * by + 101 + 3 * i) % 256).astype(np.float64)
                    ycc = np.stack(
                        [yv, cb + np.zeros((h, w)), cr + np.zeros((h, w))], axis=2
                    )
                    payload = encode_jpeg(
                        None,
                        subsampling="420" if kind == 2 else "444",
                        ycbcr=ycc,
                        progressive=True,
                    )
                rows.append(
                    {
                        "media_ref": f"#/pictures/{i}",
                        "doc_id": f"jpp{i:04d}",
                        "media_type": "image",
                        "mime": "image/jpeg",
                        "payload": payload,
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": None,
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Typed resize plan (target dims preserving aspect) — pure exprs; the
    pixel work would ride the same mapInPandas as image_features. Image rows
    with sane dimensions only: audio/video carry null width/height (least()
    skips nulls → a claimed-valid plan row with null target dims), and a
    corrupt zero dimension would null the scale the same way."""
    w, h = F.col("meta_width"), F.col("meta_height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    media = media.filter(
        (F.col("media_type") == "image") & (w > 0) & (h > 0)
    )
    return media.select(
        "media_ref",
        "doc_id",
        w.alias("src_width"),
        h.alias("src_height"),
        F.round(w * scale).cast("int").alias("dst_width"),
        F.round(h * scale).cast("int").alias("dst_height"),
        (scale < 1.0).cast("int").alias("needs_resize"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video payloads: emit one row per sampled frame
    (stub hashes a byte slice per frame — the batch shape and schema are the
    real contract)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                dur = int(r.meta_duration_ms or 0)
                payload = bytes(r.payload)
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    lo = (i * 97) % max(len(payload) - 16, 1)
                    rows.append(
                        {
                            "media_ref": r.media_ref,
                            "doc_id": r.doc_id,
                            "frame_index": i,
                            "ts_ms": ts,
                            "frame_sha256": hashlib.sha256(payload[lo : lo + 16]).hexdigest(),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        frames, schema=FRAME_SAMPLES
    )


AUDIO_STATS = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("decoded", IntegerType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("channels", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sum_s", LongType(), True),
        StructField("sum_abs", LongType(), True),
        StructField("wsum_s", LongType(), True),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio statistics per decodable payload (PCM WAV via
    sparkdoc.audiocodec): sample rate / frames / channels / duration from
    the actual container, plus integer sample sums — sum, |sum|, and the
    interleave-position-weighted wsum_s = Σ (t·C + c) · s(t, c), which pins
    channel-interleaving and byte order exactly the way wsum_luma pins row
    order for images (gate ``media_audio_decode``). Undecodable payloads
    (MP3/AAC — no codec in the sandbox) emit decoded=0 with null stats."""
    from sparkdoc.audiocodec import decode_wav, sniff_wav

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                decoded = None
                if sniff_wav(payload):
                    try:
                        decoded = decode_wav(payload)
                    except ValueError:
                        decoded = None
                if decoded is None:
                    rows.append(
                        {
                            "media_ref": r.media_ref,
                            "doc_id": r.doc_id,
                            "decoded": 0,
                            "sample_rate": None,
                            "n_frames": None,
                            "channels": None,
                            "duration_ms": None,
                            "sum_s": None,
                            "sum_abs": None,
                            "wsum_s": None,
                        }
                    )
                    continue
                samples, sr = decoded
                s = samples.astype(np.int64)
                frames, channels = s.shape
                pos = np.arange(frames * channels, dtype=np.int64).reshape(frames, channels)
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "doc_id": r.doc_id,
                        "decoded": 1,
                        "sample_rate": int(sr),
                        "n_frames": int(frames),
                        "channels": int(channels),
                        "duration_ms": int(frames * 1000 // sr),
                        "sum_s": int(s.sum()),
                        "sum_abs": int(np.abs(s).sum()),
                        "wsum_s": int((pos * s).sum()),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "audio").mapInPandas(
        stats, schema=AUDIO_STATS
    )


def synth_decodable_audio_df(spark: SparkSession, n: int = 30) -> DataFrame:
    """Deterministic REAL-container audio corpus: clip i is PCM WAV with
    frames = 20 + i mod 13, channels = 1 + i mod 3, rate = 8000·(1 + i mod 3)
    and formula samples

        16-bit (i mod 4 ≠ 3): s = ((5t + 3c + i)·2641) mod 65536 − 32768
        8-bit  (i mod 4 = 3): s = (((5t + 3c + i) mod 256) − 128) · 256

    — both closed-form so the media_audio_decode oracle recomputes every
    statistic without touching container bytes."""
    from sparkdoc.audiocodec import encode_wav

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                frames, channels = 20 + i % 13, 1 + i % 3
                rate = 8000 * (1 + i % 3)
                t = np.arange(frames, dtype=np.int64)[:, None]
                c = np.arange(channels, dtype=np.int64)[None, :]
                if i % 4 == 3:
                    s = (((5 * t + 3 * c + i) % 256) - 128) * 256
                    payload = encode_wav(s.astype(np.int32), rate, bits=8)
                else:
                    s = ((5 * t + 3 * c + i) * 2641) % 65536 - 32768
                    payload = encode_wav(s.astype(np.int32), rate, bits=16)
                rows.append(
                    {
                        "media_ref": f"#/audio/{i}",
                        "doc_id": f"aud{i:04d}",
                        "media_type": "audio",
                        "mime": "audio/wav",
                        "payload": payload,
                        "meta_width": None,
                        "meta_height": None,
                        "meta_duration_ms": int(frames * 1000 // rate),
                        "meta_sample_rate": rate,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


FRAME_STATS = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("decoded", IntegerType(), False),
        StructField("frame_index", IntegerType(), True),
        StructField("ts_ms", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sum_y", LongType(), True),
        StructField("wsum_y", LongType(), True),
    ]
)


def video_frame_stats(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling over decodable video (Y4M via
    sparkdoc.videocodec): emit every ``every_n``-th frame with its true
    timestamp (frame_index·1000·fps_den // fps_num) and integer luma
    statistics — sum_y plus the position-weighted wsum_y = Σ (y·W + x)·Y,
    which pins plane layout AND frame synchronization (a chroma-skip bug
    desyncs every later frame). Undecodable payloads (MP4 etc. — no codecs
    in the sandbox) emit one decoded=0 row with null stats."""
    from sparkdoc.videocodec import decode_y4m, sniff_y4m

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                decoded = None
                if sniff_y4m(payload):
                    try:
                        decoded = decode_y4m(payload)
                    except ValueError:
                        decoded = None
                if decoded is None:
                    rows.append(
                        {
                            "media_ref": r.media_ref,
                            "doc_id": r.doc_id,
                            "decoded": 0,
                            "frame_index": None,
                            "ts_ms": None,
                            "width": None,
                            "height": None,
                            "sum_y": None,
                            "wsum_y": None,
                        }
                    )
                    continue
                luma, num, den = decoded
                nf, h, w = luma.shape
                pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
                for f in range(0, nf, every_n):
                    y = luma[f].astype(np.int64)
                    rows.append(
                        {
                            "media_ref": r.media_ref,
                            "doc_id": r.doc_id,
                            "decoded": 1,
                            "frame_index": f,
                            "ts_ms": int(f * 1000 * den // num),
                            "width": w,
                            "height": h,
                            "sum_y": int(y.sum()),
                            "wsum_y": int((pos * y).sum()),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        stats, schema=FRAME_STATS
    )


def synth_decodable_video_df(spark: SparkSession, n: int = 20) -> DataFrame:
    """Deterministic REAL-container video corpus: clip i is Y4M with
    colorspace rotating C420/C444/Cmono (chroma-skip sizes all exercised),
    frames = 3 + i mod 4, w = 4 + (i mod 3)·2, h = 4 + (i mod 2)·2,
    fps = (10 + i mod 5):1 and formula luma

        Y(f, x, y) = (3x + 5y + 7f + i) mod 256

    — closed-form so the media_video_decode oracle recomputes every sampled
    frame's statistics without touching container bytes."""
    from sparkdoc.videocodec import encode_y4m

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["i"]:
                i = int(i)
                nf = 3 + i % 4
                w, h = 4 + (i % 3) * 2, 4 + (i % 2) * 2
                fps = 10 + i % 5
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                luma = np.stack(
                    [((3 * x + 5 * y + 7 * f + i) % 256).astype(np.uint8) for f in range(nf)]
                )
                cs = ["C420", "C444", "Cmono"][i % 3]
                payload = encode_y4m(luma, fps, 1, cs)
                rows.append(
                    {
                        "media_ref": f"#/video/{i}",
                        "doc_id": f"vid{i:04d}",
                        "media_type": "video",
                        "mime": "video/x-yuv4mpeg",
                        "payload": payload,
                        "meta_width": w,
                        "meta_height": h,
                        "meta_duration_ms": int(nf * 1000 // fps),
                        "meta_sample_rate": None,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return base.mapInPandas(gen, schema=MEDIA)


def media_dedup_groups(features: DataFrame) -> DataFrame:
    """Exact media dedup by content hash (cross-document).

    media_ref ('#/pictures/<node_id>') is DOCUMENT-scoped — the same ref
    string names unrelated media in other documents — so the survivor is
    identified by the (doc_id, media_ref) pair, not the ref alone (a bare
    min(media_ref) could point a consumer at a different document's
    unrelated image)."""
    keep = F.min(F.struct("doc_id", "media_ref")).alias("_keep")
    return (
        features.groupBy("sha256")
        .agg(F.count("*").alias("n_copies"), keep)
        .filter(F.col("n_copies") > 1)
        .select(
            "sha256", "n_copies",
            F.col("_keep.doc_id").alias("keep_doc_id"),
            F.col("_keep.media_ref").alias("keep_ref"),
        )
    )


def near_dup_media(features: DataFrame, k: int = 5, max_broadcast_rows: int = 100_000) -> DataFrame:
    """Embedding-cosine near-dup candidates over image embeddings (reuses the
    similarity kernel). Brute force broadcasts the query side and self-joins
    a mapInPandas-derived plan, so (a) the feature table is checkpointed once
    instead of re-embedding the feature-extraction plan on both join sides,
    and (b) the corpus size is guarded — past ``max_broadcast_rows`` use the
    bucketed path (similarity.lsh_topk / embedding_near_dups), which never
    broadcasts the corpus.

    Output ids are ``doc_id + '\\x1f' + media_ref`` (unit-separator packed):
    media_ref alone is document-scoped and NOT unique across the corpus."""
    from sparkdoc.similarity import brute_force_topk

    # vec_id must be GLOBALLY unique: media_ref is a per-document counter
    # ref, so doc A's and doc B's '#/pictures/7' would otherwise share one
    # id — the kernel's self-pair filter (query_id != neighbor_id) would
    # drop exactly the cross-document near-dup pairs this exists to find,
    # and both images' neighbors would merge into one top-k list
    emb = features.select(
        F.concat_ws("\x1f", F.col("doc_id"), F.col("media_ref")).alias("vec_id"),
        F.col("embedding"),
    ).localCheckpoint(eager=False)
    n = emb.count()
    if n > max_broadcast_rows:
        raise ValueError(
            f"near_dup_media: {n} embeddings exceeds the brute-force broadcast "
            f"guard ({max_broadcast_rows}); use similarity.embedding_near_dups "
            "(banded LSH, bucketed equi-join) for corpus-scale media dedup."
        )
    return brute_force_topk(emb, emb, k=k, id_col="vec_id", vec_col="embedding")
