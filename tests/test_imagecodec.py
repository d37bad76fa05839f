"""Real image decode: pure-numpy BMP/PPM/PGM codec (sparkdoc.imagecodec)
and its integration into the media feature pipeline (multimodal)."""

from __future__ import annotations

import numpy as np
import pytest

from sparkdoc.imagecodec import (
    decode_image,
    encode_bmp,
    encode_pgm,
    encode_ppm,
    gray_grid_embedding,
    sniff_format,
)


def _rand_img(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


class TestBmpRoundtrip:
    def test_all_padding_remainders_and_variants(self):
        # widths 1..8 sweep every 24bpp row-padding remainder (3w mod 4)
        for w in range(1, 9):
            for h in (1, 2, 5):
                a = _rand_img(h, w, seed=w * 10 + h)
                for bpp in (24, 32):
                    for bottom_up in (True, False):
                        payload = encode_bmp(a, bpp=bpp, bottom_up=bottom_up)
                        d = decode_image(payload)
                        assert d.shape == a.shape
                        assert (d == a).all(), (w, h, bpp, bottom_up)

    def test_orientation_actually_differs_on_disk(self):
        # same image, both orientations: identical decode, different bytes
        a = _rand_img(4, 4, seed=3)
        up = encode_bmp(a, bottom_up=True)
        down = encode_bmp(a, bottom_up=False)
        assert up != down
        assert (decode_image(up) == decode_image(down)).all()

    def test_corrupt_rejected(self):
        a = _rand_img(3, 3)
        good = encode_bmp(a)
        with pytest.raises(ValueError):
            decode_image(good[:40])  # truncated header
        with pytest.raises(ValueError):
            decode_image(good[:-5])  # truncated raster
        bad_bpp = bytearray(good)
        bad_bpp[28] = 8  # 8bpp palette BMP unsupported
        with pytest.raises(ValueError):
            decode_image(bytes(bad_bpp))


class TestPnm:
    def test_ppm_roundtrip(self):
        a = _rand_img(5, 7, seed=1)
        assert (decode_image(encode_ppm(a)) == a).all()

    def test_pgm_roundtrip_replicates_channels(self):
        g = np.random.RandomState(2).randint(0, 256, (6, 4)).astype(np.uint8)
        d = decode_image(encode_pgm(g))
        assert d.shape == (6, 4, 3)
        for c in range(3):
            assert (d[:, :, c] == g).all()

    def test_header_comments_and_whitespace(self):
        raster = bytes(range(2 * 3 * 3))
        payload = b"P6 # inline\n# full comment line\n 3\t2 # dims\n255\n" + raster
        d = decode_image(payload)
        assert d.shape == (2, 3, 3)
        assert d[0, 0, 0] == 0 and d[1, 2, 2] == 17

    def test_sniff(self):
        assert sniff_format(encode_ppm(_rand_img(2, 2))) == "ppm"
        assert sniff_format(b"\x89PNG\r\n") is None
        with pytest.raises(ValueError):
            decode_image(b"\x89PNG\r\n\x1a\n....")


class TestEmbedding:
    def test_unit_norm_and_content_sensitivity(self):
        a = _rand_img(16, 16, seed=5)
        e = gray_grid_embedding(a)
        assert len(e) == 16
        assert abs(sum(x * x for x in e) - 1.0) < 1e-9
        b = a.copy()
        b[:8] = 255 - b[:8]  # change the top half
        assert gray_grid_embedding(b) != e

    def test_flat_image_stays_unit(self):
        e = gray_grid_embedding(np.full((8, 8, 3), 9, np.uint8))
        assert abs(sum(x * x for x in e) - 1.0) < 1e-9

    def test_tiny_image(self):
        # smaller than the grid: blocks clamp to >=1 pixel, still 16-dim unit
        e = gray_grid_embedding(_rand_img(2, 3, seed=7))
        assert len(e) == 16
        assert abs(sum(x * x for x in e) - 1.0) < 1e-9


class TestMediaPipeline:
    def test_pixel_stats_match_numpy(self, spark):
        from sparkdoc.multimodal import image_pixel_stats, synth_decodable_media_df

        media = synth_decodable_media_df(spark, 12)
        got = {r["doc_id"]: r.asDict() for r in image_pixel_stats(media).collect()}
        assert len(got) == 12
        for i in range(12):
            w, h = 5 + i % 6, 4 + i % 7
            x = np.arange(w, dtype=np.int64)[None, :]
            y = np.arange(h, dtype=np.int64)[:, None]
            r = (7 * x + 13 * y + i) % 256
            if i % 5 == 4:
                g = b = r
            else:
                g = (3 * x + 5 * y + 2 * i) % 251
                b = (11 * x + 17 * y + 3 * i) % 241
            luma = (77 * r + 150 * g + 29 * b) >> 8
            pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
            row = got[f"img{i:04d}"]
            assert row["decoded"] == 1
            assert (row["width"], row["height"]) == (w, h)
            assert row["sum_r"] == int(r.sum()) and row["sum_g"] == int(g.sum())
            assert row["sum_b"] == int(b.sum())
            assert row["wsum_luma"] == int((pos * luma).sum())

    def test_features_use_real_dims_when_meta_lies(self, spark):
        import pandas as pd
        from sparkdoc.multimodal import MEDIA, image_features

        a = _rand_img(6, 9, seed=11)
        rows = pd.DataFrame(
            [
                {
                    "media_ref": "#/pictures/0",
                    "doc_id": "d1",
                    "media_type": "image",
                    "mime": "image/bmp",
                    "payload": encode_bmp(a),
                    "meta_width": 999,  # lying metadata
                    "meta_height": 999,
                    "meta_duration_ms": None,
                    "meta_sample_rate": None,
                },
                {
                    "media_ref": "#/pictures/1",
                    "doc_id": "d1",
                    "media_type": "image",
                    "mime": "image/png",
                    "payload": b"\x89PNG\r\n\x1a\n notdecodable",
                    "meta_width": 32,
                    "meta_height": 16,
                    "meta_duration_ms": None,
                    "meta_sample_rate": None,
                },
            ]
        )
        feats = {
            r["media_ref"]: r.asDict()
            for r in image_features(spark.createDataFrame(rows, schema=MEDIA)).collect()
        }
        # decodable: true dims + content embedding
        real = feats["#/pictures/0"]
        assert (real["width"], real["height"]) == (9, 6)
        want = gray_grid_embedding(a)
        assert np.allclose(real["embedding"], want, atol=1e-6)
        # undecodable: stub path keeps metadata dims
        stub = feats["#/pictures/1"]
        assert (stub["width"], stub["height"]) == (32, 16)

    def test_undecodable_payload_stats_row(self, spark):
        import pandas as pd
        from sparkdoc.multimodal import MEDIA, image_pixel_stats

        rows = pd.DataFrame(
            [
                {
                    "media_ref": "#/pictures/0",
                    "doc_id": "d1",
                    "media_type": "image",
                    "mime": "image/jpeg",
                    "payload": b"\xff\xd8\xff\xe0 junk",
                    "meta_width": 10,
                    "meta_height": 10,
                    "meta_duration_ms": None,
                    "meta_sample_rate": None,
                }
            ]
        )
        out = image_pixel_stats(spark.createDataFrame(rows, schema=MEDIA)).collect()
        assert len(out) == 1
        assert out[0]["decoded"] == 0 and out[0]["sum_r"] is None
