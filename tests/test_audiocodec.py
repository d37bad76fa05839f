"""PCM WAV codec (sparkdoc.audiocodec) + audio feature pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from sparkdoc.audiocodec import decode_wav, encode_wav, sniff_wav


def _rand_pcm(n, ch, seed=0):
    return np.random.RandomState(seed).randint(-32768, 32768, (n, ch)).astype(np.int32)


class TestWavRoundtrip:
    def test_16bit_all_channel_counts(self):
        for ch in (1, 2, 3):
            for n in (1, 7, 100):
                s = _rand_pcm(n, ch, seed=n * 10 + ch)
                d, sr = decode_wav(encode_wav(s, 16000))
                assert sr == 16000 and d.shape == s.shape and (d == s).all()

    def test_8bit_quantized(self):
        s = (_rand_pcm(50, 2, seed=4) // 256) * 256
        d, sr = decode_wav(encode_wav(s, 8000, bits=8))
        assert sr == 8000 and (d == s).all()

    def test_odd_data_chunk_pads_even(self):
        # 7 mono 8-bit frames = odd chunk size; RIFF pads to even offsets
        s = (_rand_pcm(7, 1, seed=5) // 256) * 256
        payload = encode_wav(s, 8000, bits=8)
        assert len(payload) % 2 == 0
        assert (decode_wav(payload)[0] == s).all()

    def test_unknown_chunks_skipped(self):
        w = encode_wav(np.ones((4, 1), np.int32), 44100)
        inject = b"LIST" + (5).to_bytes(4, "little") + b"INFOx\x00"
        spliced = w[:12] + inject + w[12:]
        spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
        d, sr = decode_wav(spliced)
        assert sr == 44100 and d.shape == (4, 1)

    def test_rejects_bad_payloads(self):
        assert not sniff_wav(b"\xff\xfb mp3 frame")
        with pytest.raises(ValueError):
            decode_wav(b"RIFFxxxxWAVE")  # no chunks
        good = encode_wav(_rand_pcm(4, 1), 8000)
        compressed = bytearray(good)
        compressed[20] = 85  # format tag -> MP3
        with pytest.raises(ValueError):
            decode_wav(bytes(compressed))


class TestAudioPipeline:
    def test_audio_stats_match_numpy(self, spark):
        from sparkdoc.multimodal import audio_features, synth_decodable_audio_df

        media = synth_decodable_audio_df(spark, 10)
        got = {r["doc_id"]: r.asDict() for r in audio_features(media).collect()}
        assert len(got) == 10
        for i in range(10):
            frames, channels = 20 + i % 13, 1 + i % 3
            rate = 8000 * (1 + i % 3)
            t = np.arange(frames, dtype=np.int64)[:, None]
            c = np.arange(channels, dtype=np.int64)[None, :]
            if i % 4 == 3:
                s = (((5 * t + 3 * c + i) % 256) - 128) * 256
            else:
                s = ((5 * t + 3 * c + i) * 2641) % 65536 - 32768
            pos = np.arange(frames * channels, dtype=np.int64).reshape(frames, channels)
            row = got[f"aud{i:04d}"]
            assert row["decoded"] == 1
            assert (row["sample_rate"], row["n_frames"], row["channels"]) == (
                rate, frames, channels,
            )
            assert row["duration_ms"] == frames * 1000 // rate
            assert row["sum_s"] == int(s.sum())
            assert row["sum_abs"] == int(np.abs(s).sum())
            assert row["wsum_s"] == int((pos * s).sum())

    def test_undecodable_audio_row(self, spark):
        import pandas as pd
        from sparkdoc.multimodal import MEDIA, audio_features

        rows = pd.DataFrame(
            [
                {
                    "media_ref": "#/audio/0",
                    "doc_id": "d1",
                    "media_type": "audio",
                    "mime": "audio/mpeg",
                    "payload": b"\xff\xfb\x90\x00 mp3 junk",
                    "meta_width": None,
                    "meta_height": None,
                    "meta_duration_ms": 1000,
                    "meta_sample_rate": 44100,
                }
            ]
        )
        out = audio_features(spark.createDataFrame(rows, schema=MEDIA)).collect()
        assert len(out) == 1
        assert out[0]["decoded"] == 0 and out[0]["sum_s"] is None
