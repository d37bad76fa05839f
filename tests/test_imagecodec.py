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


class TestPng:
    """PNG codec (stdlib-zlib DEFLATE + numpy unfiltering): every color
    type × every filter type roundtrips; corruption/unsupported payloads
    raise ValueError (so the pipeline takes the decoded=0 path)."""

    def test_rgb_roundtrip_all_filters(self):
        from sparkdoc.imagecodec import encode_png

        for ft in (None, 0, 1, 2, 3, 4):
            for w in range(1, 9):  # width sweep incl. 1-px edge
                arr = _rand_img(6, w, seed=ft if ft is not None else 9)
                p = encode_png(arr, color_type=2, filter_type=ft)
                assert sniff_format(p) == "png"
                assert (decode_image(p) == arr).all()

    def test_rgba_alpha_dropped(self):
        from sparkdoc.imagecodec import encode_png

        arr = _rand_img(5, 7, seed=1)
        alpha = np.random.RandomState(2).randint(0, 256, (5, 7)).astype(np.uint8)
        for ft in (None, 0, 1, 2, 3, 4):
            p = encode_png(arr, color_type=6, filter_type=ft, alpha=alpha)
            assert (decode_image(p) == arr).all()

    def test_gray_and_gray_alpha_replicate_channels(self):
        from sparkdoc.imagecodec import encode_png

        gray = np.random.RandomState(3).randint(0, 256, (4, 6)).astype(np.uint8)
        want = np.repeat(gray[:, :, None], 3, axis=2)
        alpha = np.random.RandomState(4).randint(0, 256, (4, 6)).astype(np.uint8)
        for ft in (None, 0, 1, 2, 3, 4):
            assert (decode_image(encode_png(gray, color_type=0, filter_type=ft)) == want).all()
            assert (
                decode_image(encode_png(gray, color_type=4, filter_type=ft, alpha=alpha))
                == want
            ).all()

    def test_palette_roundtrip(self):
        from sparkdoc.imagecodec import encode_png

        rs = np.random.RandomState(5)
        pal = rs.randint(0, 256, (17, 3)).astype(np.uint8)
        idx = rs.randint(0, 17, (6, 5)).astype(np.uint8)
        for ft in (None, 0, 1, 2, 3, 4):
            p = encode_png(None, color_type=3, filter_type=ft, palette=pal, indices=idx)
            assert (decode_image(p) == pal[idx]).all()

    def test_corrupt_and_unsupported_rejected(self):
        import struct
        import zlib

        from sparkdoc.imagecodec import encode_png

        arr = _rand_img(6, 5, seed=6)
        good = encode_png(arr)

        # bit-flip inside IDAT -> CRC failure
        bad = bytearray(good)
        bad[len(bad) // 2] ^= 0xFF
        with pytest.raises(ValueError):
            decode_image(bytes(bad))
        # truncation
        with pytest.raises(ValueError):
            decode_image(good[: len(good) - 10])

        def chunk(t, b):
            return struct.pack(">I", len(b)) + t + b + struct.pack(
                ">I", zlib.crc32(t + b) & 0xFFFFFFFF
            )

        magic = b"\x89PNG\r\n\x1a\n"
        # Adam7 interlace unsupported
        with pytest.raises(ValueError, match="interlace"):
            decode_image(magic + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 1)))
        # 16-bit depth unsupported
        with pytest.raises(ValueError, match="bit depth"):
            decode_image(magic + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 16, 2, 0, 0, 0)))
        # palette image missing its PLTE
        with pytest.raises(ValueError, match="PLTE"):
            raw = zlib.compress(bytes(6 * (1 + 5)))
            decode_image(
                magic
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, 0))
                + chunk(b"IDAT", raw)
                + chunk(b"IEND", b"")
            )
        # declared size disagrees with decompressed scanlines
        with pytest.raises(ValueError, match="decompressed size"):
            raw = zlib.compress(bytes(3 * (1 + 5 * 3)))  # 3 rows for a 6-row image
            decode_image(
                magic
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", raw)
                + chunk(b"IEND", b"")
            )

    def test_synth_png_corpus_stats_match_oracle_formula(self, spark):
        """The media_png_decode gate's Spark side, pinned in-process: decoded
        sums equal the closed-form formulas for every color type."""
        from sparkdoc.multimodal import image_pixel_stats, synth_png_media_df

        out = {
            r["doc_id"]: r
            for r in image_pixel_stats(synth_png_media_df(spark, 10)).collect()
        }
        assert len(out) == 10
        for i in range(10):
            w, h = 5 + i % 6, 4 + i % 7
            x = np.arange(w, dtype=np.int64)[None, :]
            y = np.arange(h, dtype=np.int64)[:, None]
            kind = i % 5
            if kind in (0, 1):
                er = (7 * x + 13 * y + i) % 256
                eg = (3 * x + 5 * y + 2 * i) % 251
                eb = (11 * x + 17 * y + 3 * i) % 241
            elif kind in (2, 3):
                er = eg = eb = (7 * x + 13 * y + i) % 256
            else:
                p = (x + 2 * y + i) % 64
                er, eg, eb = (7 * p + i) % 256, (3 * p + 2 * i) % 251, (11 * p + 3 * i) % 241
            er, eg, eb = (np.broadcast_to(a, (h, w)) for a in (er, eg, eb))
            r = out[f"png{i:04d}"]
            assert r["decoded"] == 1 and (r["width"], r["height"]) == (w, h)
            assert r["sum_r"] == int(er.sum()) and r["sum_g"] == int(eg.sum())
            assert r["sum_b"] == int(eb.sum())
            pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
            luma = (77 * er + 150 * eg + 29 * eb) >> 8
            assert r["wsum_luma"] == int((pos * luma).sum())


class TestGif:
    """GIF codec (pure-Python variable-width LZW + numpy palette/interlace):
    both encoder modes roundtrip; malformed payloads raise ValueError."""

    def test_roundtrip_both_modes_and_interlace(self):
        from sparkdoc.imagecodec import encode_gif

        rs = np.random.RandomState(8)
        for npal in (3, 16, 256):
            pal = rs.randint(0, 256, (npal, 3)).astype(np.uint8)
            for (w, h) in ((1, 1), (5, 4), (17, 9)):
                idx = rs.randint(0, npal, (h, w)).astype(np.uint8)
                for comp in (True, False):
                    for il in (True, False):
                        p = encode_gif(pal, idx, compress=comp, interlace=il)
                        assert sniff_format(p) == "gif"
                        assert (decode_image(p) == pal[idx]).all()

    def test_lzw_table_growth_to_4096_and_kwkwk(self):
        from sparkdoc.imagecodec import encode_gif

        pal = np.random.RandomState(9).randint(0, 256, (256, 3)).astype(np.uint8)
        # diagonal stripes: long repeated runs drive the table to 4096 so the
        # mid-stream CLEAR + width growth to 12 bits is exercised
        h, w = 200, 300
        idx = ((np.arange(h)[:, None] + np.arange(w)[None, :]) % 251).astype(np.uint8)
        assert (decode_image(encode_gif(pal, idx, compress=True)) == pal[idx]).all()
        # all-one-color image: back-to-back KwKwK codes
        flat = np.zeros((50, 60), dtype=np.uint8)
        assert (decode_image(encode_gif(pal, flat, compress=True)) == pal[flat]).all()

    def test_malformed_rejected(self):
        from sparkdoc.imagecodec import encode_gif

        pal = np.random.RandomState(10).randint(0, 256, (8, 3)).astype(np.uint8)
        idx = np.random.RandomState(10).randint(0, 8, (6, 5)).astype(np.uint8)
        good = encode_gif(pal, idx)
        with pytest.raises(ValueError):
            decode_image(good[:20])  # truncated color table
        with pytest.raises(ValueError):
            decode_image(good[: len(good) - 8])  # truncated LZW stream
        bad = bytearray(good)
        bad[3] = ord("x")  # breaks the sniff -> unsupported-container reject
        with pytest.raises(ValueError, match="unsupported container"):
            decode_image(bytes(bad))
        # trailer with no image data
        with pytest.raises(ValueError, match="no image"):
            decode_image(good[:13] + bytes(8 * 3) + b"\x3b")

    def test_synth_gif_corpus_matches_formula(self, spark):
        """The media_gif_decode gate's Spark side, pinned in-process: all
        four container shapes decode to the shared palette formula."""
        from sparkdoc.multimodal import image_pixel_stats, synth_gif_media_df

        out = {
            r["doc_id"]: r
            for r in image_pixel_stats(synth_gif_media_df(spark, 8)).collect()
        }
        assert len(out) == 8
        for i in range(8):
            w, h = 5 + i % 6, 4 + i % 7
            x = np.arange(w, dtype=np.int64)[None, :]
            y = np.arange(h, dtype=np.int64)[:, None]
            p = (x + 2 * y + i) % 64
            er = np.broadcast_to((7 * p + i) % 256, (h, w))
            eg = np.broadcast_to((3 * p + 2 * i) % 251, (h, w))
            eb = np.broadcast_to((11 * p + 3 * i) % 241, (h, w))
            r = out[f"gif{i:04d}"]
            assert r["decoded"] == 1 and (r["width"], r["height"]) == (w, h)
            assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
                int(er.sum()), int(eg.sum()), int(eb.sum()),
            )


class TestJpeg:
    """Baseline JPEG codec (sparkdoc.jpegcodec): flat blocks are EXACT with
    the all-8s quant table; general content roundtrips within the
    quantization-loss tolerance; non-baseline payloads raise ValueError."""

    def test_flat_gray_exact(self):
        from sparkdoc.jpegcodec import decode_jpeg, encode_jpeg

        for v in (0, 1, 127, 128, 200, 255):
            g = np.full((16, 24), v, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(g, gray=True))
            assert out.shape == (16, 24, 3) and (out == v).all()

    def test_flat_ycbcr_blocks_exact_both_subsamplings(self):
        from sparkdoc.jpegcodec import decode_jpeg, encode_jpeg

        for sub, s, (h, w) in (("444", 8, (24, 40)), ("420", 16, (32, 48))):
            x = np.arange(w, dtype=np.int64)[None, :]
            y = np.arange(h, dtype=np.int64)[:, None]
            bx, by = x // s, y // s
            Y = ((37 * bx + 53 * by + 11) % 256) + np.zeros((h, w))
            Cb = ((29 * bx + 71 * by + 5) % 256) + np.zeros((h, w))
            Cr = ((41 * bx + 13 * by + 101) % 256) + np.zeros((h, w))
            out = decode_jpeg(
                encode_jpeg(None, subsampling=sub, ycbcr=np.stack([Y, Cb, Cr], axis=2))
            )
            er = np.clip(np.floor(Y + 1.402 * (Cr - 128) + 0.5), 0, 255)
            eg = np.clip(
                np.floor(Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128) + 0.5), 0, 255
            )
            eb = np.clip(np.floor(Y + 1.772 * (Cb - 128) + 0.5), 0, 255)
            assert (out[:, :, 0] == er).all(), sub
            assert (out[:, :, 1] == eg).all(), sub
            assert (out[:, :, 2] == eb).all(), sub

    def test_general_roundtrip_within_quant_loss(self):
        from sparkdoc.jpegcodec import decode_jpeg, encode_jpeg

        rs = np.random.RandomState(12)
        arr = rs.randint(0, 256, (25, 37, 3)).astype(np.uint8)  # odd dims: padding
        out = decode_jpeg(encode_jpeg(arr, subsampling="444"))
        assert out.shape == arr.shape
        assert np.abs(out.astype(int) - arr.astype(int)).max() <= 24

    def test_restart_intervals(self):
        from sparkdoc.jpegcodec import decode_jpeg, encode_jpeg

        rs = np.random.RandomState(13)
        arr = rs.randint(0, 256, (40, 40, 3)).astype(np.uint8)
        with_rst = encode_jpeg(arr, subsampling="444", restart_interval=3)
        without = encode_jpeg(arr, subsampling="444")
        assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
        assert (decode_jpeg(with_rst) == decode_jpeg(without)).all()

    def test_dispatch_and_rejects(self):
        from sparkdoc.imagecodec import decode_image, sniff_format
        from sparkdoc.jpegcodec import decode_jpeg, encode_jpeg

        g = np.full((8, 8), 99, dtype=np.uint8)
        p = encode_jpeg(g, gray=True)
        assert sniff_format(p) == "jpeg"
        assert (decode_image(p) == 99).all()  # routed through the dispatcher
        with pytest.raises(ValueError):
            decode_jpeg(p[:30])  # truncated
        # SOF2 is now SUPPORTED — but a baseline stream with only the SOF
        # marker patched is malformed as progressive (its single scan
        # declares the full 0..63 band on a DC-style header) and must fail
        # loudly, not silently misdecode
        with pytest.raises(ValueError):
            decode_jpeg(p.replace(b"\xff\xc0", b"\xff\xc2", 1))
        with pytest.raises(ValueError, match="SOF9"):
            decode_jpeg(p.replace(b"\xff\xc0", b"\xff\xc9", 1))  # arithmetic
        with pytest.raises(ValueError, match="missing SOS|no scan"):
            decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, nothing else

    def test_synth_jpeg_corpus_matches_formula(self, spark):
        """The media_jpeg_decode gate's Spark side, pinned in-process."""
        from sparkdoc.multimodal import image_pixel_stats, synth_jpeg_media_df

        out = {
            r["doc_id"]: r
            for r in image_pixel_stats(synth_jpeg_media_df(spark, 8)).collect()
        }
        assert len(out) == 8
        for i in range(8):
            kind = i % 4
            if kind == 2:
                s, w, h = 16, 16 * (1 + i % 2), 16 * (1 + (i // 4) % 2)
            else:
                s, w, h = 8, 8 * (1 + i % 4), 8 * (1 + i % 3)
            x = np.arange(w, dtype=np.int64)[None, :]
            y = np.arange(h, dtype=np.int64)[:, None]
            bx, by = x // s, y // s
            Y = (37 * bx + 53 * by + 11 + i) % 256
            if kind == 0:
                er = eg = eb = np.broadcast_to(Y, (h, w))
            else:
                Cb = (29 * bx + 71 * by + 5 + 2 * i) % 256
                Cr = (41 * bx + 13 * by + 101 + 3 * i) % 256
                er = np.broadcast_to(np.clip(np.floor(Y + 1.402 * (Cr - 128) + 0.5), 0, 255), (h, w))
                eg = np.broadcast_to(np.clip(np.floor(
                    Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128) + 0.5), 0, 255), (h, w))
                eb = np.broadcast_to(np.clip(np.floor(Y + 1.772 * (Cb - 128) + 0.5), 0, 255), (h, w))
            r = out[f"jpg{i:04d}"]
            assert r["decoded"] == 1 and (r["width"], r["height"]) == (w, h)
            assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (
                int(er.sum()), int(eg.sum()), int(eb.sum()),
            ), i


class TestTiff:
    """TIFF 6.0 baseline subset: II/MM, gray (both photometrics) + RGB,
    none/PackBits/LZW(+early change, +predictor 2), multi-strip."""

    def test_roundtrip_matrix(self):
        import numpy as np

        from sparkdoc.imagecodec import decode_image, encode_tiff, sniff_format

        rng = np.random.RandomState(11)
        for h, w in [(1, 1), (4, 5), (9, 7), (17, 23)]:
            rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            gray = rng.randint(0, 256, (h, w), dtype=np.uint8)
            for comp in (1, 32773, 5):
                for bo in ("II", "MM"):
                    for rps in (None, 2):
                        p = encode_tiff(rgb, compression=comp, byte_order=bo,
                                        rows_per_strip=rps)
                        assert sniff_format(p) == "tiff"
                        assert np.array_equal(decode_image(p), rgb)
                        for photo in (0, 1):
                            p = encode_tiff(gray, photometric=photo,
                                            compression=comp, byte_order=bo,
                                            rows_per_strip=rps)
                            assert np.array_equal(
                                decode_image(p),
                                np.repeat(gray[:, :, None], 3, axis=2),
                            ), (h, w, comp, bo, rps, photo)

    def test_predictor2_and_deep_lzw_growth(self):
        import numpy as np

        from sparkdoc.imagecodec import decode_image, encode_tiff

        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, (9, 13, 3), dtype=np.uint8)
        for comp in (5, 32773):
            p = encode_tiff(rgb, compression=comp, byte_order="MM",
                            rows_per_strip=4, predictor=2)
            assert np.array_equal(decode_image(p), rgb)
        # enough low-entropy data to push LZW through 10/11/12-bit widths
        # and a table reset — an early-change off-by-one desyncs here
        noise = rng.randint(0, 8, (200, 400, 3), dtype=np.uint8) * 16
        p = encode_tiff(noise, compression=5)
        assert np.array_equal(decode_image(p), noise)

    def test_packbits_edge_runs(self):
        from sparkdoc.imagecodec import _packbits_decode, _packbits_encode

        for data in (
            b"", b"a", b"ab", b"aaa", b"aab", b"abb" * 3,
            b"x" * 128, b"x" * 129, b"x" * 300,
            bytes(range(200)) + b"q" * 5 + bytes(range(50)),
        ):
            assert _packbits_decode(_packbits_encode(data), len(data)) == data

    def test_white_is_zero_actually_inverted_on_disk(self):
        import numpy as np

        from sparkdoc.imagecodec import decode_image, encode_tiff

        gray = np.full((4, 4), 10, dtype=np.uint8)
        p0 = encode_tiff(gray, photometric=0, compression=1)
        p1 = encode_tiff(gray, photometric=1, compression=1)
        # same decoded pixels, different stored sample bytes
        assert np.array_equal(decode_image(p0), decode_image(p1))
        assert p0 != p1 and b"\xf5" in p0  # 255-10 stored for WhiteIsZero

    def test_metadata_tags_skipped_not_rejected(self):
        """Real-world baseline TIFFs almost always carry RATIONAL
        (XResolution/YResolution) and ASCII (Software/DateTime) entries;
        the decoder must skip value types outside its pixel-path subset
        per the spec's unknown-field rule, not reject the file."""
        import numpy as np

        from sparkdoc.imagecodec import decode_image, encode_tiff

        rng = np.random.RandomState(7)
        rgb = rng.randint(0, 256, (6, 9, 3), dtype=np.uint8)
        gray = rng.randint(0, 256, (6, 9), dtype=np.uint8)
        for comp in (1, 32773, 5):
            for bo in ("II", "MM"):
                p = encode_tiff(rgb, compression=comp, byte_order=bo,
                                metadata=True)
                assert np.array_equal(decode_image(p), rgb), (comp, bo)
                p = encode_tiff(gray, photometric=1, compression=comp,
                                byte_order=bo, metadata=True)
                assert np.array_equal(
                    decode_image(p), np.repeat(gray[:, :, None], 3, axis=2)
                ), (comp, bo)

    def test_required_tag_with_exotic_type_rejected(self):
        """A required tag (ImageWidth) carrying a RATIONAL value type is a
        malformed file — clear rejection, not a silent skip that would then
        report the tag missing."""
        import numpy as np
        import pytest

        from sparkdoc.imagecodec import encode_tiff, _decode_tiff

        p = bytearray(encode_tiff(np.zeros((4, 4, 3), dtype=np.uint8)))
        ifd_off = int.from_bytes(p[4:8], "little")
        n = int.from_bytes(p[ifd_off:ifd_off + 2], "little")
        for e in range(n):
            base = ifd_off + 2 + 12 * e
            if int.from_bytes(p[base:base + 2], "little") == 256:
                p[base + 2:base + 4] = (5).to_bytes(2, "little")  # RATIONAL
        with pytest.raises(ValueError, match="required tag 256"):
            _decode_tiff(bytes(p))

    def test_corrupt_rejected_not_crashed(self):
        import numpy as np
        import pytest

        from sparkdoc.imagecodec import decode_image, encode_tiff

        p = encode_tiff(np.zeros((6, 6, 3), dtype=np.uint8), compression=5)
        for bad in (
            p[:10],                        # truncated IFD
            p[:4] + b"\xff\xff\xff\xff" + p[8:],  # IFD offset out of range
            b"II*\x00" + b"\x00" * 20,     # empty IFD region
            p[:-20],                       # strip/IFD overrun
        ):
            with pytest.raises(ValueError):
                decode_image(bad)


class TestProgressiveJpeg:
    """SOF2 progressive: spectral selection + successive approximation (DC
    and AC refinement) + EOB runs, pinned bit-equal to the baseline path —
    both codings of one image share the dequant/IDCT/color tail, and the
    scan script reconstructs the exact quantized coefficients."""

    def test_parity_with_baseline_matrix(self):
        import numpy as np

        from sparkdoc.jpegcodec import decode_jpeg, encode_jpeg

        rng = np.random.RandomState(5)
        for h, w in [(8, 8), (16, 24), (17, 23), (40, 33)]:
            rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            gray = rng.randint(0, 256, (h, w), dtype=np.uint8)
            for sub in ("444", "420"):
                b = decode_jpeg(encode_jpeg(rgb, subsampling=sub))
                p = decode_jpeg(encode_jpeg(rgb, subsampling=sub, progressive=True))
                assert np.array_equal(b, p), (h, w, sub)
            b = decode_jpeg(encode_jpeg(gray, gray=True))
            p = decode_jpeg(encode_jpeg(gray, gray=True, progressive=True))
            assert np.array_equal(b, p), (h, w, "gray")

    def test_eob_runs_zrl_and_large_categories(self):
        import numpy as np

        from sparkdoc.jpegcodec import decode_jpeg, encode_jpeg

        # flat image: every AC block empty -> multi-block EOB runs
        flat = np.full((128, 160, 3), 130, dtype=np.uint8)
        for sub in ("444", "420"):
            assert np.array_equal(
                decode_jpeg(encode_jpeg(flat, subsampling=sub)),
                decode_jpeg(encode_jpeg(flat, subsampling=sub, progressive=True)),
            )
        # sparse spikes: ZRL runs + refinement corrections interleaved
        img = np.full((96, 96, 3), 100, dtype=np.uint8)
        img[::17, ::13] = 250
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img)),
            decode_jpeg(encode_jpeg(img, progressive=True)),
        )
        # quant=1: large coefficient magnitudes (categories up to 11)
        q = np.ones(64, dtype=np.int64)
        rng = np.random.RandomState(9)
        hi = rng.randint(0, 256, (32, 40, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(hi, quant=q)),
            decode_jpeg(encode_jpeg(hi, quant=q, progressive=True)),
        )

    def test_progressive_marker_and_guards(self):
        import numpy as np
        import pytest

        from sparkdoc.jpegcodec import decode_jpeg, encode_jpeg

        img = np.zeros((8, 8, 3), dtype=np.uint8)
        p = encode_jpeg(img, progressive=True)
        assert b"\xff\xc2" in p and b"\xff\xc0" not in p
        with pytest.raises(ValueError, match="restart"):
            encode_jpeg(img, progressive=True, restart_interval=2)
        # truncated progressive stream fails loudly, never hangs
        with pytest.raises(ValueError):
            decode_jpeg(p[: len(p) // 2])
