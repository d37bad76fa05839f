"""Multimodal payloads: image/audio/video as opaque binary columns.

Media travel as ``binary`` + typed metadata struct; the span table references
them via ``media_ref`` (``#/pictures/<id>``). Decode / feature-extract /
resize / frame-sample are Arrow-batched pandas UDFs over mapInPandas — the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape) is
real and tested; the codec step itself is STUBBED behind
``SPARKDOC_FAKE_CODECS`` (deterministic fake) because the sandbox has no
image/audio libraries. Swap ``_decode_image_real`` in when PIL/ffmpeg exist.

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
        "real image decode needs PIL/opencv — not available in this container; "
        "set SPARKDOC_FAKE_CODECS=1 (default) for the deterministic stub"
    )


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
    """Decode(stub) + feature-extract per image: hash, size, dims, embedding.

    Arrow-batched; the binary column is consumed here and pruned from all
    downstream plans.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if not FAKE_CODECS:
                    _decode_image_real(payload)
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "doc_id": r.doc_id,
                        "sha256": hashlib.sha256(payload).hexdigest(),
                        "n_bytes": len(payload),
                        "width": r.meta_width,
                        "height": r.meta_height,
                        "embedding": _fake_embed(payload),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.filter(F.col("media_type") == "image").mapInPandas(
        feats, schema=IMAGE_FEATURES
    )


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
