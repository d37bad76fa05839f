"""Golden suite: Spark extract pipeline == single-node golden extractor.

The BASELINE.json correctness invariant: per-document span-sequence equality
on (kind, text, media_ref, order).
"""

from __future__ import annotations

import pytest

from sparkdoc.golden import extract_corpus_golden
from sparkdoc.spans import extract_documents
from sparkdoc.synth import raw_nodes_df, synth_corpus

N_DOCS = 48
SEED = 42


@pytest.fixture(scope="module")
def golden():
    return extract_corpus_golden(synth_corpus(N_DOCS, SEED))


@pytest.fixture(scope="module")
def spark_result(spark):
    raw = raw_nodes_df(spark, N_DOCS, SEED, partitions=8)
    docs = extract_documents(raw).collect()
    return {
        r["doc_id"]: [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": s["offset"]}
            for s in r["spans"]
        ]
        for r in docs
    }


def test_same_doc_ids(golden, spark_result):
    assert set(golden) == set(spark_result)


def test_span_sequence_equality(golden, spark_result):
    for doc_id, gspans in golden.items():
        got = spark_result[doc_id]
        assert got == gspans, f"span sequence mismatch for {doc_id}"


def test_offsets_are_dense(spark_result):
    for doc_id, spans in spark_result.items():
        assert [s["offset"] for s in spans] == list(range(len(spans))), doc_id


def test_kinds_vocabulary(spark_result):
    from sparkdoc.schemas import SPAN_KINDS

    for spans in spark_result.values():
        for s in spans:
            assert s["kind"] in SPAN_KINDS


def test_no_control_chars_and_no_boilerplate(spark_result):
    for spans in spark_result.values():
        for s in spans:
            assert "\x00" not in s["text"] and "\x07" not in s["text"]


def test_pictures_have_media_ref(spark_result):
    seen_picture = False
    for spans in spark_result.values():
        for s in spans:
            if s["kind"] == "picture":
                seen_picture = True
                assert s["media_ref"].startswith("#/pictures/")
            else:
                assert s["media_ref"] == ""
    assert seen_picture


def test_golden_matches_committed_fixture(golden):
    """Guard against co-drift: the live golden implementation must match the
    CHECKED-IN fixture (regenerate deliberately if the spec changes)."""
    import gzip
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_spans_seed42_n48.json.gz")
    with gzip.open(path, "rt") as f:
        fixture = json.load(f)
    assert set(fixture) == set(golden)
    for doc_id, spans in fixture.items():
        assert golden[doc_id] == spans, doc_id


def test_spark_matches_committed_fixture_seed7(spark):
    """Second-seed end-to-end golden gate: the SPARK pipeline must reproduce
    the checked-in seed-7 fixture exactly (independent corpus shape draw —
    different furniture/boilerplate/BOTTOMLEFT mix than seed 42)."""
    import gzip
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_spans_seed7_n48.json.gz")
    with gzip.open(path, "rt") as f:
        fixture = json.load(f)
    raw = raw_nodes_df(spark, N_DOCS, 7, partitions=8)
    got = {
        r["doc_id"]: [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": s["offset"]}
            for s in r["spans"]
        ]
        for r in extract_documents(raw).collect()
    }
    assert set(got) == set(fixture)
    for doc_id, spans in fixture.items():
        assert got[doc_id] == spans, doc_id


def test_whitespace_only_text_matches_golden(spark):
    """'\\n'-only text must be BLANK on both sides: Spark trim strips only
    spaces, golden uses str.strip() — the regex blank test keeps them equal
    (a divergence here shifts every later span's offset)."""
    from sparkdoc.clean import classify_raw_nodes
    from sparkdoc.schemas import RAW_NODES

    rows = [
        ("d", 0, None, "p", "\n", 1, 0, 1, [0, 0, 5, 5], "TOPLEFT", 612, 792),
        ("d", 1, None, "p", "\t \t", 3, 0, 1, [0, 6, 5, 9], "TOPLEFT", 612, 792),
        ("d", 2, None, "p", "real", 4, 0, 1, [0, 10, 5, 14], "TOPLEFT", 612, 792),
        ("d", 3, None, "img", None, 0, 0, 1, [0, 15, 5, 19], "TOPLEFT", 612, 792),
    ]
    out = classify_raw_nodes(spark.createDataFrame(rows, RAW_NODES)).collect()
    kept = {r["node_id"]: r for r in out}
    assert set(kept) == {2, 3}  # whitespace-only dropped, img kept
    assert kept[3]["text"] == ""  # NULL img text coerced like golden


def test_null_geometry_never_crashes(spark):
    """Schema-legal NULL bbox/page_width rows must not kill the job."""
    from sparkdoc.schemas import RAW_NODES
    from sparkdoc.spans import explode_spans, extract_documents

    rows = [
        ("d", 0, None, "p", "has bbox", 8, 0, 1, [0, 0, 5, 5], "TOPLEFT", 612, 792),
        ("d", 1, None, "p", "no bbox", 7, 0, 1, None, "TOPLEFT", 612, 792),
        ("d", 2, None, "p", "no width", 8, 0, 1, [0, 6, 5, 9], "TOPLEFT", None, None),
    ]
    spans = explode_spans(extract_documents(spark.createDataFrame(rows, RAW_NODES))).collect()
    texts = {s["text"] for s in spans}
    assert "has bbox" in texts and "no bbox" not in texts  # dropped, not crashed
    assert "no width" in texts  # width-less page still extracts


def test_quantize_512_zero_dim_parity(spark):
    from pyspark.sql import functions as F

    from sparkdoc.layout import quantize_512, quantize_512_py

    df = spark.createDataFrame([(100.0, 0.0), (100.0, 612.0)], "c double, d double")
    got = [r["q"] for r in df.select(quantize_512(F.col("c"), F.col("d")).alias("q")).collect()]
    assert got == [quantize_512_py(100.0, 0.0), quantize_512_py(100.0, 612.0)]


def test_repeated_text_furniture_demotion_parity(spark):
    """A kind-'text' span repeated verbatim on >= REPEAT_FURNITURE_PAGES
    pages is demoted to furniture by BOTH the golden extractor and the Spark
    pipeline; 2-page repeats are NOT. The synth corpus never produces this
    case (its only cross-page repeats are already-furniture headers), so
    without this test the two independent demotion implementations could
    drift unnoticed."""
    from sparkdoc.golden import extract_corpus_golden
    from sparkdoc.schemas import RAW_NODES
    from sparkdoc.spans import extract_documents

    def page(doc, pg, base):
        return [
            (doc, base, None, "p", "CONFIDENTIAL — do not distribute", 32, 0, pg,
             [0, 0, 200, 10], "TOPLEFT", 612, 792),
            (doc, base + 1, None, "p", "twice only", 10, 0, pg,
             [0, 20, 200, 30], "TOPLEFT", 612, 792),
            (doc, base + 2, None, "p", f"unique body {doc} {pg}", 16, 0, pg,
             [0, 40, 200, 50], "TOPLEFT", 612, 792),
        ]

    rows = []
    # d3: banner on 3 pages (demoted); "twice only" on pages 1-2 (kept)
    for pg in (1, 2, 3):
        rows += page("d3", pg, pg * 10)
    rows = [r for r in rows if not (r[4] == "twice only" and r[7] == 3)]
    # d2: same banner but only 2 pages -> NOT demoted (per-document scope)
    for pg in (1, 2):
        rows += page("d2", pg, pg * 10)

    golden = extract_corpus_golden([dict(zip([f.name for f in RAW_NODES.fields], r)) for r in rows])
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in extract_documents(spark.createDataFrame(rows, RAW_NODES)).collect()
    }
    exp = {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for d, spans in golden.items()
    }
    assert got == exp
    d3_kinds = {t: k for k, t, _, _ in got["d3"]}
    assert d3_kinds["CONFIDENTIAL — do not distribute"] == "furniture"  # >=3 pages
    assert d3_kinds["twice only"] == "text"
    assert {t: k for k, t, _, _ in got["d2"]}["CONFIDENTIAL — do not distribute"] == "text"


def test_link_density_drop_parity_on_non_nav_row(spark):
    """A non-nav row whose anchor-char count exceeds half its text (link
    density > 0.5) is dropped by BOTH golden and Spark; a low-density row
    with SOME links is kept. The synth corpus only exercises the density
    rule via nav rows (already dropped by the tag check), so the two
    independent implementations of the density formula could drift
    unnoticed without this pin."""
    from sparkdoc.golden import extract_corpus_golden
    from sparkdoc.schemas import RAW_NODES
    from sparkdoc.spans import extract_documents

    rows = [
        # 30 chars, 20 of them linked -> density 0.67 -> dropped
        ("d", 0, None, "p", "[a] [b] [c] [d] [e] filler txt", 30, 20, 1,
         [0, 0, 200, 10], "TOPLEFT", 612, 792),
        # 30 chars, 10 linked -> density 0.33 -> kept
        ("d", 1, None, "p", "mostly prose with [one link] xx", 31, 10, 1,
         [0, 20, 200, 30], "TOPLEFT", 612, 792),
        # boundary: n_links*2 == n_chars is NOT > -> kept
        ("d", 2, None, "p", "half linked txt here exactly", 28, 14, 1,
         [0, 40, 200, 50], "TOPLEFT", 612, 792),
    ]
    golden = extract_corpus_golden(
        [dict(zip([f.name for f in RAW_NODES.fields], r)) for r in rows]
    )
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["offset"]) for s in r["spans"]]
        for r in extract_documents(spark.createDataFrame(rows, RAW_NODES)).collect()
    }
    exp = {
        d: [(s["kind"], s["text"], s["offset"]) for s in spans]
        for d, spans in golden.items()
    }
    assert got == exp
    texts = {t for _, t, _ in got["d"]}
    assert "[a] [b] [c] [d] [e] filler txt" not in texts  # density-dropped
    assert "mostly prose with [one link] xx" in texts
    assert "half linked txt here exactly" in texts  # strict >, not >=
