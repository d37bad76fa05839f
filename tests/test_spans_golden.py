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
