"""Deterministic extraction shell tests: skeleton, coverage, salvage, full
document→graph conversion driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def chunks(spark):
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    return chunk_documents(extract_documents(raw_nodes_df(spark, 32, 42, partitions=4))).persist()


def test_skeleton_phase_extracts_entities(chunks):
    from sparkdoc.extractor import skeleton_phase

    sk = skeleton_phase(chunks).persist()
    classes = {r["class"] for r in sk.select("class").distinct().collect()}
    assert "Code" in classes and "Email" in classes and "Amount" in classes
    # dedup: node_id unique per (doc, path)
    assert (
        sk.groupBy("doc_id", "path", "node_id").count().filter(F.col("count") > 1).count() == 0
    )
    # every entity grounded in at least one chunk
    assert sk.filter(F.size("chunk_ids") == 0).count() == 0


def test_coverage_pass_growth_cap(chunks):
    from sparkdoc.extractor import coverage_pass, skeleton_phase

    sk = skeleton_phase(chunks)
    full = coverage_pass(chunks, sk)
    assert full.count() >= sk.count()
    # Term rows only come from the coverage pass
    terms = full.filter(F.col("class") == "Term")
    assert terms.count() >= 0  # may be zero if everything was covered


def test_validate_salvage(spark):
    from sparkdoc.extractor import validate_salvage
    from sparkdoc.schemas import ENTITIES

    rows = [
        ("d1", "p[]", "P", {"name": "ok   value"}, {}, [0]),
        ("d1", "p[]", "P", {"name": ""}, {}, [0]),
        ("d1", "p[]", "P", {"name": "x" * 500}, {}, [0]),
    ]
    out = validate_salvage(spark.createDataFrame(rows, ENTITIES)).collect()
    by_name = {r["ids"]["name"][:10]: r for r in out}
    assert by_name["ok value"]["valid"] == 1  # whitespace collapsed
    empty = [r for r in out if r["ids"]["name"] == ""][0]
    assert empty["valid"] == 0 and "missing_required:name" in empty["errors"]
    truncated = [r for r in out if len(r["ids"]["name"]) == 300][0]
    assert truncated["valid"] == 1 and "truncated_identity" in truncated["errors"]


def test_convert_document_graph_end_to_end(spark):
    from sparkdoc.extractor import convert_document_graph
    from sparkdoc.graph import validate_graph
    from sparkdoc.synth import raw_nodes_df

    out = convert_document_graph(raw_nodes_df(spark, 32, 42, partitions=4))
    n_nodes = out["nodes"].count()
    assert n_nodes > 0
    assert out["edges"].count() > 0
    v = validate_graph(out["nodes"], out["edges"])
    assert v["is_valid"], v
    # ledger covers the extracted entities with verbatim anchors
    ledger = out["ledger"]
    verb = ledger.select(F.explode("anchors").alias("a")).filter(F.col("a.kind") == "verbatim")
    assert verb.count() > 0
    cov = out["coverage"].agg(F.avg("coverage")).collect()[0][0]
    assert 0 < cov <= 1
