"""Deterministic extraction shell tests: catalog-driven skeleton, coverage,
fill phase, salvage ladder, full document→graph conversion driver."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def chunks(spark):
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    return chunk_documents(extract_documents(raw_nodes_df(spark, 32, 42, partitions=4))).localCheckpoint()


@pytest.fixture(scope="module")
def catalog():
    from sparkdoc.extractor import demo_catalog

    return demo_catalog()


def test_skeleton_phase_extracts_entities(chunks, catalog):
    from sparkdoc.extractor import skeleton_phase

    sk = skeleton_phase(chunks, catalog).persist()
    classes = {r["class"] for r in sk.select("class").distinct().collect()}
    assert {"Report", "Section", "Contract", "Contact", "Fee"} <= classes
    # dedup: node_id unique per (doc, path)
    assert (
        sk.groupBy("doc_id", "path", "node_id").count().filter(F.col("count") > 1).count() == 0
    )
    # every non-root entity grounded in at least one chunk; root is doc-scoped
    assert sk.filter((F.col("path") != "") & (F.size("chunk_ids") == 0)).count() == 0
    # exactly one root per doc
    roots = sk.filter(F.col("path") == "").groupBy("doc_id").count()
    assert roots.filter(F.col("count") != 1).count() == 0


def test_coverage_pass_growth_cap(chunks, catalog):
    from sparkdoc.extractor import coverage_pass, skeleton_phase

    sk = skeleton_phase(chunks, catalog)
    full = coverage_pass(chunks, sk, catalog)
    assert full.count() >= sk.count()
    # Term rows only come from the coverage pass (coverage_discover-only spec)
    assert sk.filter(F.col("class") == "Term").count() == 0


def test_fill_phase_semantics(chunks, catalog):
    from sparkdoc.extractor import skeleton_phase
    from sparkdoc.fill import fill_phase

    sk = skeleton_phase(chunks, catalog).persist()
    filled = fill_phase(chunks, sk, catalog).persist()
    # pad/truncate parity: exactly one output row per descriptor
    assert filled.count() == sk.count()
    # sanitize: fill never changes identity
    a = {r["node_id"]: r["ids"] for r in sk.collect()}
    b = {r["node_id"]: r["ids"] for r in filled.collect()}
    assert a == b
    # projected-schema fields got filled from scoped context / id rules
    contracts = filled.filter(F.col("class") == "Contract").collect()
    assert contracts
    for r in contracts:
        assert r["fields"]["kind"] in ("CONTRACT", "INVOICE", "PURCHASE_ORDER")
        assert r["ids"]["code"] in r["fields"]["sentence"]
    contacts = filled.filter(F.col("class") == "Contact").collect()
    for r in contacts:
        assert r["ids"]["email"].endswith("@" + r["fields"]["domain"])
    # fill batch assignment: contiguous 0..N per (doc, path), cap respected
    sizes = (
        filled.filter(F.col("fill_batch") >= 0)
        .groupBy("doc_id", "path", "fill_batch")
        .count()
        .collect()
    )
    assert all(r["count"] <= 8 for r in sizes)


def test_fill_scoped_context_head_rule(spark, catalog):
    """Root descriptors (no source chunks) get the global-head context."""
    from sparkdoc.fill import scoped_context

    chunks = spark.createDataFrame(
        [("d1", 0, "OPENING LINE\nmore text"), ("d1", 1, "later chunk §9 Title")],
        "doc_id string, chunk_id int, text string",
    )
    descs = spark.createDataFrame(
        [("d1", "R_1", "", []), ("d1", "S_1", "sections[]", [1])],
        "doc_id string, node_id string, path string, chunk_ids array<int>",
    )
    got = {r["node_id"]: r["context"] for r in scoped_context(descs, chunks).collect()}
    assert got["R_1"].startswith("OPENING LINE")
    # chunk-1-scoped descriptor gets the head PREPENDED (chunk 0 not a source)
    assert got["S_1"].startswith("OPENING LINE") and "§9 Title" in got["S_1"]


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
    # catalog-driven parent edges exist for both nesting levels
    labels = {r["label"] for r in out["edges"].select("label").distinct().collect()}
    assert "sections" in labels and "contracts" in labels
    # reference-field edges MATERIALIZE: a filled reporter field resolves to
    # the real Contact node id (regression: salvage used to rewrite the bare
    # id string into a JSON object, so every reference edge dangled)
    rep = out["edges"].filter(F.col("label") == "reporter")
    assert rep.count() > 0
    dangling = rep.join(
        out["nodes"].select(F.col("node_id").alias("dst")), "dst", "left_anti"
    )
    assert dangling.count() == 0
    # ledger covers the extracted entities with verbatim anchors
    ledger = out["ledger"]
    verb = ledger.select(F.explode("anchors").alias("a")).filter(F.col("a.kind") == "verbatim")
    assert verb.count() > 0
    cov = out["coverage"].agg(F.avg("coverage")).collect()[0][0]
    assert 0 < cov <= 1


def test_one_to_one_strategy(spark):
    """Per-page extraction: entities carry (doc_id, page_no); a contract code
    on page N is discovered from page N's markdown only."""
    from pyspark.sql import functions as F

    from sparkdoc.extractor import one_to_one_extract
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import raw_nodes_df

    spans = explode_spans(extract_documents(raw_nodes_df(spark, 24, 42, partitions=4)))
    out = one_to_one_extract(spans).persist()
    assert out.filter(F.col("page_no").isNull()).count() == 0
    assert "\x1f" not in out.select("doc_id").first()["doc_id"]
    # one Report root per page
    roots = out.filter(F.col("path") == "").groupBy("doc_id", "page_no").count()
    assert roots.filter(F.col("count") != 1).count() == 0
    classes = {r["class"] for r in out.select("class").distinct().collect()}
    assert "Section" in classes


def test_format_auto_resolution(spark):
    from pyspark.sql import functions as F

    from sparkdoc.contracts import with_resolved_format

    docs = spark.createDataFrame(
        [(1, "short doc"), (2, "x" * 40000)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["contract"], r["llm_format"]) for r in with_resolved_format(docs).collect()}
    assert got[1] == ("direct", "doclang-geo")
    assert got[2] == ("dense", "doclang")
    raw = with_resolved_format(docs, text_input=True).collect()
    assert all(r["llm_format"] == "markdown" for r in raw)


def test_graph_matches_committed_fixture(spark):
    """Whole-pipeline pin (FIXTURES.md F5 golden_graph): convert_document_graph
    on the seeded corpus must reproduce the checked-in node/edge sets exactly
    — verified insensitive to partition count; regenerate deliberately if the
    pipeline spec changes."""
    import gzip
    import json
    import os

    from sparkdoc.extractor import convert_document_graph
    from sparkdoc.synth import raw_nodes_df

    out = convert_document_graph(raw_nodes_df(spark, 32, 42, partitions=4))
    nodes = sorted(
        (r["node_id"], r["doc_id"], r["node_class"], r["label"],
         json.dumps(dict(r["attrs"] or {}), sort_keys=True))
        for r in out["nodes"].collect()
    )
    edges = sorted((r["src"], r["dst"], r["label"]) for r in out["edges"].collect())
    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_graph_seed42_n32.json.gz")
    with gzip.open(path, "rt") as f:
        fix = json.load(f)
    assert nodes == [tuple(x) for x in fix["nodes"]]
    assert edges == [tuple(x) for x in fix["edges"]]


def test_one_to_one_hostile_doc_ids(spark):
    """The per-page pseudo-document key must be injective for ANY doc_id
    byte content: control chars (incl. the old \\x1f sentinel), ':' (the new
    separator), and unicode all round-trip without corrupting grouping."""
    from pyspark.sql import functions as F

    from sparkdoc.extractor import one_to_one_extract

    hostile = ["doc\x1fwith\x1fsentinel", "doc:with:colons", "доc-ünïcode", "a:b\x1fc"]
    rows = []
    for d in hostile:
        for page, off in ((1, 0), (2, 2)):
            rows.append((d, "heading", f"# §{off + 1} section", "", off))
            rows.append((d, "text", f"Contract CT-100{off} applies.", "", off + 1))
        rows.append((d, "page_break", "", "", 2))
    spans = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, media_ref string, offset int"
    )
    out = one_to_one_extract(spans)
    got_docs = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    assert got_docs == set(hostile)  # byte-exact roundtrip, no truncation
    # per-(doc, page) grouping intact: both pages extracted for every doc
    pages = {
        (r["doc_id"], r["page_no"])
        for r in out.filter(F.col("path") == "").select("doc_id", "page_no").collect()
    }
    assert pages == {(d, p) for d in hostile for p in (1, 2)}
    # the root's primary id carries the REAL doc_id, not the packed key
    roots = out.filter(F.col("path") == "").collect()
    for r in roots:
        assert r["ids"]["name"] == r["doc_id"]
        assert ":" not in r["node_id"] or r["doc_id"].count(":") > 0


def test_coverage_threshold_boundary_wordpiece_true(spark):
    """The coverage trigger measures the 10% share in WordPiece-true token
    counts and fires AT the boundary: a doc whose uncovered chunk holds
    exactly 10% of its tokens triggers (the rule is >=); one token below
    does not (orchestrator.py:74-90 analog)."""
    from sparkdoc.extractor import coverage_candidates
    from sparkdoc.chunker import count_tokens

    # "the" is a single WordPiece piece — counts are exact words
    assert count_tokens(" ".join(["the"] * 7)) == 7
    rows = [
        ("A", 0, 45), ("A", 1, 45), ("A", 2, 10),  # 10/100 == 10% -> fires
        ("B", 0, 46), ("B", 1, 45), ("B", 2, 10),  # 10/101 < 10% -> no
    ]
    chunks = spark.createDataFrame(
        [(d, c, count_tokens(" ".join(["the"] * n))) for d, c, n in rows],
        "doc_id string, chunk_id int, token_count int",
    )
    skeleton = spark.createDataFrame(
        [("A", [0, 1]), ("B", [0, 1])], "doc_id string, chunk_ids array<int>"
    )
    got = {r["doc_id"]: r for r in coverage_candidates(chunks, skeleton).collect()}
    assert got["A"]["triggered"] is True
    assert got["A"]["uncovered_tokens"] == 10 and got["A"]["doc_tokens"] == 100
    assert got["B"]["triggered"] is False
    assert got["B"]["doc_tokens"] == 101
