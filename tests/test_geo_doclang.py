"""Geometry span rows + DocLang serialization + quantization parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdoc.layout import quantize_512_py


def test_quantize_512_py_spec():
    assert quantize_512_py(0, 612) == 0
    assert quantize_512_py(612, 612) == 511  # clamped
    assert quantize_512_py(306, 612) == 256
    assert quantize_512_py(-5, 612) == 0
    # half-to-even (the reference's Python round()): exact .5 values round to
    # the even neighbour — 2.5→2, 3.5→4
    assert quantize_512_py(612 * 2.5 / 512, 612) == round(2.5) == 2
    assert quantize_512_py(612 * 3.5 / 512, 612) == round(3.5) == 4


def test_quantize_spark_python_parity(spark):
    from sparkdoc.layout import quantize_512

    vals = [(c, 612) for c in range(0, 613, 7)] + [(c, 792) for c in range(0, 793, 11)]
    df = spark.createDataFrame(vals, "coord int, dim int")
    got = df.select("coord", "dim", quantize_512(F.col("coord"), F.col("dim")).alias("q")).collect()
    for r in got:
        assert r["q"] == quantize_512_py(r["coord"], r["dim"]), (r["coord"], r["dim"])


def test_geo_rows_match_span_sequence(spark):
    """Geo rows agree with extract_documents on (kind, text, media_ref,
    offset) for the non-page-break spans."""
    from sparkdoc.spans import explode_spans, extract_documents, extract_span_rows_geo
    from sparkdoc.synth import raw_nodes_df

    raw = raw_nodes_df(spark, 16, 31, partitions=4)
    plain = {
        (r["doc_id"], r["offset"]): (r["kind"], r["text"], r["media_ref"])
        for r in explode_spans(extract_documents(raw)).collect()
        if r["kind"] != "page_break"
    }
    geo = {
        (r["doc_id"], r["offset"]): (r["kind"], r["text"], r["media_ref"])
        for r in extract_span_rows_geo(raw).collect()
    }
    assert geo == plain and len(geo) > 0


def test_doclang_serialization(spark):
    from sparkdoc.serialize import doclang_documents
    from sparkdoc.spans import extract_span_rows_geo
    from sparkdoc.synth import raw_nodes_df

    geo = extract_span_rows_geo(raw_nodes_df(spark, 8, 31, partitions=2))
    out = doclang_documents(geo).collect()
    assert len(out) > 0
    multi_page = [r for r in out if "<page_break/>" in r["dclg"]]
    for r in out[:3]:
        d = r["dclg"]
        assert d.startswith("<doc>\n") and d.endswith("\n</doc>")
        assert ' loc="' in d and ' page="1"' in d
        # quantized coords in range
        import re

        for m in re.finditer(r'loc="(\d+),(\d+),(\d+),(\d+)"', d):
            for g in m.groups():
                assert 0 <= int(g) <= 511
    assert multi_page  # corpus has multi-page docs


def test_doclang_roundtrip_matches_extraction(spark):
    """serialize → parse must reproduce the extraction pipeline's span
    sequences exactly (kind, text, media_ref, offset), page_breaks included —
    the DocLang ingest path (handlers.py:526-570 analog)."""
    from pyspark.sql import functions as F

    from sparkdoc.serialize import doclang_documents, parse_doclang
    from sparkdoc.spans import explode_spans, extract_documents, extract_span_rows_geo
    from sparkdoc.synth import raw_nodes_df

    raw = raw_nodes_df(spark, 16, 42, partitions=4)
    expected = sorted(
        (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
        for r in explode_spans(extract_documents(raw)).collect()
    )
    parsed = parse_doclang(doclang_documents(extract_span_rows_geo(raw)))
    got = sorted(
        (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
        for r in parsed.collect()
    )
    assert len(got) > 0
    assert got == expected


def test_doclang_roundtrip_hostile_chars(spark):
    """Markup characters inside span text / refs survive the roundtrip via
    XML escaping (a literal '</table>' inside a cell must not truncate)."""
    from sparkdoc.serialize import doclang_documents, parse_doclang

    rows = [
        ("d1", 0, "text", 'a < b & c > "d" </table>', "", 1, [0, 0, 10, 10], 612, 792),
        ("d1", 1, "table", "cell1 | x<y\ncell2 | p&q", "", 1, [0, 20, 10, 30], 612, 792),
        ("d1", 2, "picture", "", 'm"1&<>', 1, [0, 40, 10, 50], 612, 792),
    ]
    geo = spark.createDataFrame(
        rows,
        "doc_id string, offset int, kind string, text string, media_ref string, "
        "page_no int, bbox array<int>, page_width int, page_height int",
    )
    parsed = {
        r["offset"]: (r["kind"], r["text"], r["media_ref"])
        for r in parse_doclang(doclang_documents(geo)).collect()
    }
    assert parsed[0] == ("text", 'a < b & c > "d" </table>', "")
    assert parsed[1] == ("table", "cell1 | x<y\ncell2 | p&q", "")
    assert parsed[2] == ("picture", "", 'm"1&<>')


def test_parse_doclang_page_break_page_no_matches_engine_convention(spark):
    """A page_break span's page_no equals what _page_no_col computes over the
    same table: the break row belongs to the FOLLOWING page (cumulative sum
    includes the current row)."""
    from sparkdoc.serialize import _page_no_col, doclang_documents, parse_doclang

    rows = [  # content rows only — the serializer inserts <page_break/>
        ("d1", 0, "text", "p1 body", "", 1, [0, 0, 10, 10], 612, 792),
        ("d1", 1, "text", "p2 body", "", 2, [0, 0, 10, 10], 612, 792),
        ("d1", 2, "text", "p3 body", "", 3, [0, 0, 10, 10], 612, 792),
    ]
    geo = spark.createDataFrame(
        rows,
        "doc_id string, offset int, kind string, text string, media_ref string, "
        "page_no int, bbox array<int>, page_width int, page_height int",
    )
    parsed = parse_doclang(doclang_documents(geo)).localCheckpoint()
    got = {r["offset"]: (r["kind"], r["page_no"]) for r in parsed.collect()}
    conv = {
        r["offset"]: (r["kind"], r["pn"])
        for r in parsed.withColumn("pn", _page_no_col()).collect()
    }
    assert got == conv == {
        0: ("text", 1), 1: ("page_break", 2), 2: ("text", 2),
        3: ("page_break", 3), 4: ("text", 3),
    }


def test_geo_rows_survive_null_page_dims(spark):
    """TOPLEFT rows with NULL page_width/page_height (legitimately kept by
    classify_raw_nodes) must not crash the Arrow kernel: nullable int
    columns arrive as float64 NaN, and the old `is not None` guard passed
    NaN into int() — the guard must be pd.notna."""
    from sparkdoc.spans import extract_span_rows_geo
    from sparkdoc.synth import raw_nodes_df

    base = raw_nodes_df(spark, 4, 42)
    import pyspark.sql.functions as F

    nulled = base.withColumn(
        "page_width",
        F.when(F.col("doc_id") == base.select("doc_id").first()[0], F.lit(None)).otherwise(
            F.col("page_width")
        ),
    )
    rows = extract_span_rows_geo(nulled).collect()
    assert rows  # no task crash; nulled dims fall back to 0
    assert any(r["page_width"] == 0 for r in rows)
