"""Anchor scan + ledger tests (F5 golden-ledger cases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdoc.provenance import anchor_scan, build_ledger, coverage_stats
from sparkdoc.schemas import ENTITIES


@pytest.fixture(scope="module")
def chunks_df(spark):
    rows = [
        ("d1", 0, "The contract CT-9917 was signed by ACME Corp."),
        ("d1", 1, "Delivery terms: see contract CT-9917 annex."),
        ("d1", 2, "Payment of 500 USD is due."),
        # 'common' appears in many chunks → non-distinctive
        ("d1", 3, "common common words"),
        ("d1", 4, "common here too"),
        ("d1", 5, "common again"),
        ("d1", 6, "common also"),
        ("d1", 7, "common as well"),
        ("d1", 8, "common yet again"),
        ("d1", 9, "still common"),
        ("d1", 10, "escaped A&B GmbH renders as A&amp;B GmbH here"),
    ]
    return spark.createDataFrame(rows, "doc_id string, chunk_id int, text string")


@pytest.fixture(scope="module")
def entities_df(spark):
    rows = [
        ("d1", "contracts[]", "Contract", {"code": "CT-9917"}, {}, [0]),
        ("d1", "parties[]", "Party", {"name": "ACME Corp"}, {}, [0]),
        ("d1", "terms[]", "Term", {"name": "common"}, {}, [3]),  # non-distinctive
        ("d1", "amounts[]", "Amount", {"value": "42"}, {}, [2]),  # short numeric → skipped
        ("d1", "parties[]", "Party", {"name": "A&B GmbH"}, {}, [10]),  # xml-escape retry
        ("d1", "ghosts[]", "Ghost", {"name": "NOWHERE-TO-BE-FOUND-XYZ"}, {}, [1, 2]),
    ]
    df = spark.createDataFrame(rows, ENTITIES)
    from sparkdoc.dedup import with_node_ids

    return with_node_ids(df)


def test_verbatim_hits_and_spans(entities_df, chunks_df):
    hits = anchor_scan(entities_df, chunks_df).collect()
    ct = [h for h in hits if h["value"] == "CT-9917"]
    assert {h["chunk_id"] for h in ct} == {0, 1}
    h0 = next(h for h in ct if h["chunk_id"] == 0)
    assert h0["start"] == 13 and h0["end"] == 20
    # case-insensitive
    acme = [h for h in hits if h["value"] == "ACME Corp"]
    assert len(acme) == 1 and acme[0]["chunk_id"] == 0


def test_non_distinctive_dropped(entities_df, chunks_df):
    hits = anchor_scan(entities_df, chunks_df)
    assert hits.filter(F.col("value") == "common").count() == 0  # >6 chunks


def test_short_numeric_guard(entities_df, chunks_df):
    hits = anchor_scan(entities_df, chunks_df)
    assert hits.filter(F.col("value") == "42").count() == 0


def test_xml_escape_retry(entities_df, chunks_df):
    hits = anchor_scan(entities_df, chunks_df).filter(F.col("value") == "A&B GmbH").collect()
    assert len(hits) >= 1  # raw hit at 8; escaped form also present in chunk 10


def test_ledger_fallback_observed(entities_df, chunks_df):
    ledger = build_ledger(entities_df, chunks_df)
    ghost = ledger.filter(F.col("path") == "ghosts[]").collect()[0]
    assert [a["kind"] for a in ghost["anchors"]] == ["observed", "observed"]
    assert [a["chunk_id"] for a in ghost["anchors"]] == [1, 2]
    contract = ledger.filter(F.col("path") == "contracts[]").collect()[0]
    assert all(a["kind"] == "verbatim" for a in contract["anchors"])
    assert [a["chunk_id"] for a in contract["anchors"]] == [0, 1]


def test_anchor_cap_eight(spark):
    from sparkdoc.dedup import with_node_ids

    chunks = spark.createDataFrame(
        [("d2", i, f"needle-8899 in chunk {i}") for i in range(6)],
        "doc_id string, chunk_id int, text string",
    )
    ents = with_node_ids(
        spark.createDataFrame(
            [("d2", "p[]", "P", {"code": "needle-8899"}, {}, [0])], ENTITIES
        )
    )
    ledger = build_ledger(ents, chunks).collect()[0]
    assert len(ledger["anchors"]) == 6  # <= MAX_ANCHORS, all hits kept here


def test_coverage_stats(entities_df, chunks_df):
    ledger = build_ledger(entities_df, chunks_df)
    cov = coverage_stats(chunks_df, ledger).collect()[0]
    assert cov["n_chunks"] == 11
    assert 0 < cov["n_covered"] <= 11
    assert cov["coverage"] == cov["n_covered"] / cov["n_chunks"]


# --- binder ladder (binder.py:172-356 analog) --------------------------------


def test_bind_provenance_rungs(spark):
    """exact → fuzzy (unique same-path containment) → verbatim → unresolved."""
    import json

    from sparkdoc.provenance import bind_provenance
    from sparkdoc.schemas import LEDGER

    ledger = spark.createDataFrame(
        [
            # exact: identity_key == the node's id
            ("d1", "N_exact", "p[]", {"name": "Alpha"}, [(0, "observed", [0, 0])]),
            # fuzzy target: canonical containment of 'article 5'
            ("d1", "K_led1", "p[]", {"name": "Article 5 Termination"}, [(1, "observed", [0, 0])]),
            # ambiguous pair for 'beta'
            ("d1", "K_a", "q[]", {"name": "Beta One"}, [(2, "observed", [0, 0])]),
            ("d1", "K_b", "q[]", {"name": "Beta Two"}, [(3, "observed", [0, 0])]),
        ],
        LEDGER,
    )
    nodes = spark.createDataFrame(
        [
            ("d1", "N_exact", "p[]", {"name": "Alpha"}),
            ("d1", "N_fuzzy", "p[]", {"name": "Article 5"}),
            ("d1", "N_ambig", "q[]", {"name": "Beta"}),
            ("d1", "N_verb", "r[]", {"code": "CT-123456"}),
            ("d1", "N_lost", "r[]", {"code": "ZZZZZ"}),
        ],
        "doc_id string, node_id string, path string, ids map<string,string>",
    )
    chunks = spark.createDataFrame(
        [("d1", 7, "the contract ct-123456 applies here")],
        "doc_id string, chunk_id int, text string",
    )
    bound, stats = bind_provenance(nodes, ledger, chunks)
    got = {r["node_id"]: json.loads(r["provenance"]) for r in bound.collect()}
    assert got["N_exact"]["kind"] == "observed"
    assert got["N_fuzzy"]["kind"] == "fuzzy"
    assert got["N_fuzzy"]["anchors"][0]["chunk_id"] == 1
    assert got["N_verb"]["kind"] == "verbatim"
    assert got["N_verb"]["anchors"][0]["chunk_id"] == 7
    # ambiguous containment (2 same-path candidates) never binds fuzzily
    assert got["N_ambig"].get("status") == "unresolved"
    assert got["N_lost"].get("status") == "unresolved"
    s = stats.collect()[0]
    assert s["nodes_seen"] == 5 and s["bound_verbatim"] == 1
    assert s["bound_fuzzy"] == 1 and s["unresolved"] == 2


def test_bind_provenance_document_fallback(spark):
    """Direct-contract (not node-level) ledgers fall back to document scope."""
    import json

    from sparkdoc.provenance import bind_provenance
    from sparkdoc.schemas import LEDGER

    ledger = spark.createDataFrame([], LEDGER)
    nodes = spark.createDataFrame(
        [("d1", "N_1", "p[]", {"name": "Gamma"})],
        "doc_id string, node_id string, path string, ids map<string,string>",
    )
    bound, stats = bind_provenance(nodes, ledger, chunks=None, node_level=False)
    got = json.loads(bound.collect()[0]["provenance"])
    assert got == {"scope": "document"}
    assert stats.collect()[0]["bound_document"] == 1


def test_ledger_matches_committed_fixture(spark):
    """FIXTURES.md F5 golden_ledger pin: the end-to-end ledger (extract →
    chunk → heading entities → anchor scan → build_ledger) over the seeded
    corpus must reproduce the checked-in rows exactly (partition-insensitive;
    regenerate deliberately on spec change)."""
    import gzip
    import json
    import os

    from pyspark.sql import functions as F

    from sparkdoc.chunker import chunk_documents
    from sparkdoc.dedup import with_node_ids
    from sparkdoc.provenance import build_ledger
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import raw_nodes_df

    docs = extract_documents(raw_nodes_df(spark, 32, 42, partitions=4))
    chunks = chunk_documents(docs)
    spans = explode_spans(docs)
    entities = (
        spans.filter(F.col("kind") == "heading")
        .select(
            "doc_id",
            F.lit("sections[]").alias("path"),
            F.lit("Section").alias("class"),
            F.create_map(F.lit("name"), F.regexp_replace(F.col("text"), "^#+\\s*", "")).alias("ids"),
            F.create_map().cast("map<string,string>").alias("fields"),
            F.array().cast("array<int>").alias("chunk_ids"),
        )
    )
    led = build_ledger(with_node_ids(entities), chunks)
    got = sorted(
        (r["doc_id"], r["identity_key"], r["path"],
         json.dumps(dict(r["ids"] or {}), sort_keys=True),
         json.dumps([[a["chunk_id"], a["kind"], list(a["span"])] for a in r["anchors"]]))
        for r in led.collect()
    )
    path = os.path.join(os.path.dirname(__file__), "fixtures", "golden_ledger_seed42_n32.json.gz")
    with gzip.open(path, "rt") as f:
        fix = json.load(f)
    assert got == [tuple(x) for x in fix]
