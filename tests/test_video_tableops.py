"""Y4M video codec + frame sampling, and table-structure recovery."""

from __future__ import annotations

import numpy as np
import pytest

from sparkdoc.videocodec import decode_y4m, encode_y4m, sniff_y4m


def _luma(nf, h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (nf, h, w)).astype(np.uint8)


class TestY4m:
    def test_roundtrip_all_colorspaces(self):
        for cs in ("C420", "C420jpeg", "C422", "C444", "Cmono"):
            for nf in (1, 4):
                y = _luma(nf, 4, 6, seed=nf)
                d, num, den = decode_y4m(encode_y4m(y, 25, 1, cs))
                assert num == 25 and den == 1
                assert (d == y).all(), cs

    def test_odd_dims_only_for_full_chroma(self):
        y = _luma(2, 5, 7)
        assert (decode_y4m(encode_y4m(y, 30, 1, "C444"))[0] == y).all()
        assert (decode_y4m(encode_y4m(y, 30, 1, "Cmono"))[0] == y).all()
        with pytest.raises(ValueError):
            encode_y4m(y, 30, 1, "C420")

    def test_fractional_fps(self):
        y = _luma(1, 2, 2)
        _, num, den = decode_y4m(encode_y4m(y, 30000, 1001))
        assert (num, den) == (30000, 1001)

    def test_corrupt_rejected(self):
        assert not sniff_y4m(b"\x00\x00\x00\x18ftypmp42")  # mp4
        good = encode_y4m(_luma(2, 4, 4), 25)
        with pytest.raises(ValueError):
            decode_y4m(good[:-5])  # truncated frame
        with pytest.raises(ValueError):
            decode_y4m(good.replace(b"FRAME", b"FRAMX", 1))


class TestVideoPipeline:
    def test_frame_stats_match_numpy(self, spark):
        from sparkdoc.multimodal import synth_decodable_video_df, video_frame_stats

        media = synth_decodable_video_df(spark, 8)
        got = {}
        for r in video_frame_stats(media, every_n=2).collect():
            got[(r["doc_id"], r["frame_index"])] = r.asDict()
        for i in range(8):
            nf, w, h = 3 + i % 4, 4 + (i % 3) * 2, 4 + (i % 2) * 2
            fps = 10 + i % 5
            x = np.arange(w, dtype=np.int64)[None, :]
            y = np.arange(h, dtype=np.int64)[:, None]
            pos = np.arange(h * w, dtype=np.int64).reshape(h, w)
            for f in range(0, nf, 2):
                yv = (3 * x + 5 * y + 7 * f + i) % 256
                row = got[(f"vid{i:04d}", f)]
                assert row["decoded"] == 1
                assert row["ts_ms"] == f * 1000 // fps
                assert (row["width"], row["height"]) == (w, h)
                assert row["sum_y"] == int(yv.sum())
                assert row["wsum_y"] == int((pos * yv).sum())
        # every_n=2 means odd frames never emit
        assert all(fi % 2 == 0 for (_, fi) in got)

    def test_undecodable_video_row(self, spark):
        import pandas as pd
        from sparkdoc.multimodal import MEDIA, video_frame_stats

        rows = pd.DataFrame(
            [
                {
                    "media_ref": "#/video/0",
                    "doc_id": "d1",
                    "media_type": "video",
                    "mime": "video/mp4",
                    "payload": b"\x00\x00\x00\x18ftypmp42 junk",
                    "meta_width": 640,
                    "meta_height": 480,
                    "meta_duration_ms": 1000,
                    "meta_sample_rate": None,
                }
            ]
        )
        out = video_frame_stats(spark.createDataFrame(rows, schema=MEDIA)).collect()
        assert len(out) == 1
        assert out[0]["decoded"] == 0 and out[0]["sum_y"] is None


class TestTableOps:
    def test_split_semantics(self, spark):
        from sparkdoc.tableops import split_table_cells

        tbl = spark.createDataFrame(
            [
                ("t1", "a | b | c\nd|e\n\nf"),
                ("t2", ""),
            ],
            "tid string, text string",
        )
        got = {
            (r["tid"], r["row_idx"], r["col_idx"]): r["cell"]
            for r in split_table_cells(tbl, keep=["tid"]).collect()
        }
        assert got[("t1", 0, 0)] == "a" and got[("t1", 0, 2)] == "c"
        assert got[("t1", 1, 0)] == "d" and got[("t1", 1, 1)] == "e"
        assert got[("t1", 2, 0)] == ""  # blank row preserved as one empty cell
        assert got[("t1", 3, 0)] == "f"
        assert got[("t2", 0, 0)] == ""  # empty text -> single empty cell

    def test_table_cells_from_real_spans(self, spark):
        """Integration: table spans from the synth extraction pipeline
        recover a cell grid whose rows equal the span text's pipe rows."""
        from sparkdoc.spans import extract_documents
        from sparkdoc.synth import raw_nodes_df
        from sparkdoc.tableops import table_cells

        docs = extract_documents(raw_nodes_df(spark, 24, 42, partitions=2))
        cells = table_cells(docs)
        rows = cells.collect()
        assert rows, "synth corpus always contains table spans"
        # rebuild one table's text from cells and compare to the span
        import pyspark.sql.functions as F

        some = rows[0]
        span = (
            docs.filter(F.col("doc_id") == some["doc_id"])
            .select(F.explode("spans").alias("s"))
            .filter((F.col("s.kind") == "table") & (F.col("s.offset") == some["offset"]))
            .collect()[0]["s"]
        )
        mine = sorted(
            (r["row_idx"], r["col_idx"], r["cell"])
            for r in rows
            if r["doc_id"] == some["doc_id"] and r["offset"] == some["offset"]
        )
        want = []
        for ri, line in enumerate(span["text"].split("\n")):
            for ci, cell in enumerate(line.split("|")):
                want.append((ri, ci, cell.strip()))
        assert mine == sorted(want)

    def test_shapes(self, spark):
        from sparkdoc.tableops import split_table_cells, table_shapes

        tbl = spark.createDataFrame(
            [("t1", "a | b | c\nd | e | f"), ("t2", "a | b\nc")],
            "tid string, text string",
        )
        cells = split_table_cells(tbl, keep=["tid"])
        got = {r["tid"]: r.asDict() for r in table_shapes(cells, keys=["tid"]).collect()}
        assert got["t1"]["n_rows"] == 2 and got["t1"]["is_ragged"] == 0
        assert got["t1"]["n_cells"] == 6 and got["t1"]["max_cols"] == 3
        assert got["t2"]["is_ragged"] == 1 and got["t2"]["min_cols"] == 1
