"""Contract cost model, root-id hygiene, formatting, rekey/alias-merge,
ledger-merge tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_contract_resolution(spark):
    from sparkdoc.contracts import preflight_filter, with_contract

    docs = spark.createDataFrame(
        [(1, "short doc"), (2, "x" * 40000), (3, "y" * 600000)],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["contract"] for r in with_contract(docs).collect()}
    assert got[1] == "direct"
    assert got[2] == "dense"  # > 8192*4 chars output budget
    assert got[3] == "dense"
    # preflight admission: tiny context rejects the monster
    kept = preflight_filter(docs, context_tokens=1000)
    assert {r["doc_id"] for r in kept.collect()} == {1}


def test_preflight_admits_null_text(spark):
    """NULL text estimates as 0 tokens and is ADMITTED (resolve_contract
    routes it to 'dense'); a NULL comparison predicate would silently drop
    the row while the same doc with text='' passes."""
    from sparkdoc.contracts import preflight_filter, with_contract

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "z" * 600000)], "doc_id int, text string"
    )
    kept = {r["doc_id"] for r in preflight_filter(docs, context_tokens=1000).collect()}
    assert kept == {1, 2}  # NULL and empty treated alike; monster refused
    got = {r["doc_id"]: r["contract"] for r in with_contract(docs).collect()}
    assert got[1] == "dense"  # consistent downstream routing for NULL text


def test_contract_markup_blind(spark):
    from sparkdoc.contracts import with_contract

    pad = "word " * 7000  # 35000 chars > 32768 budget
    docs = spark.createDataFrame(
        [(1, pad), (2, "<b>" * 6000 + pad + "</b>" * 6000)],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["contract"] for r in with_contract(docs).collect()}
    assert got[1] == "dense" and got[2] == "dense"  # markup doesn't change the call


def test_strip_mislabeled_root_ids(spark):
    from sparkdoc.rootid import strip_mislabeled_root_ids
    from sparkdoc.schemas import ENTITIES

    rows = [
        ("d1", "r[]", "Invoice", {"invoice_number": "the quick brown fox", "name": "ok"}, {}, [0]),
        ("d1", "r[]", "Invoice", {"invoice_number": "INV-123", "name": "Invoice"}, {}, [0]),
    ]
    df = spark.createDataFrame(rows, ENTITIES)
    got = [r["ids"] for r in strip_mislabeled_root_ids(df).collect()]
    assert got[0] == {"name": "ok"}  # prose in numeric field cleared
    assert got[1] == {"invoice_number": "INV-123"}  # class echo cleared


def test_class_name_echo():
    from sparkdoc.rootid import is_class_name_echo

    assert is_class_name_echo("In-voice", "Invoice")
    assert not is_class_name_echo("ACME", "Invoice")
    assert not is_class_name_echo("", "Invoice")


def test_sparse_and_overdiscovery(spark):
    from sparkdoc.rootid import over_discovery_warnings, sparse_result_flags
    from sparkdoc.schemas import ENTITIES

    filled = spark.createDataFrame(
        [
            (1, 500, {f"k{i}": ("v" if i < 3 else "") for i in range(12)}),
            (2, 500, {f"k{i}": "v" for i in range(12)}),
            (3, 100, {f"k{i}": "" for i in range(12)}),  # short doc exempt
        ],
        "doc_id int, n_chars int, attrs map<string,string>",
    )
    got = {r["doc_id"]: r["is_sparse"] for r in sparse_result_flags(filled).collect()}
    assert got[1] == 1 and got[2] == 0 and got[3] == 0

    ents = spark.createDataFrame(
        [("d1", "a[]", "A", {}, {}, [0])] * 3
        + [("d1", "b[]", "B", {}, {}, [0])] * 2
        + [("d1", "spam[]", "S", {}, {}, [0])] * 40,
        ENTITIES,
    )
    warns = over_discovery_warnings(ents).collect()
    assert len(warns) == 1 and warns[0]["path"] == "spam[]"


def test_root_identity_excerpts(spark):
    from sparkdoc.rootid import root_identity_excerpts

    rows = [("d1", "furniture", "ACME LTD — CONFIDENTIAL", "", 0)] + [
        ("d1", "text", f"span {i}.", "", i + 1) for i in range(12)
    ]
    spans = spark.createDataFrame(rows, "doc_id string, kind string, text string, media_ref string, offset int")
    got = root_identity_excerpts(spans).collect()[0]
    assert got["head_excerpt"].startswith("span 0.")
    assert "span 11." in got["tail_excerpt"]
    assert "ACME LTD" in got["furniture_excerpt"]


def test_format_exprs(spark):
    from sparkdoc.format import property_display, sanitize_filename, truncate_display

    df = spark.createDataFrame([("total_amount", "x" * 200, "My Doc: v2/final?")], "k string, v string, f string")
    r = df.select(
        property_display(F.col("k"), F.col("v"), 20).alias("disp"),
        sanitize_filename(F.col("f")).alias("fn"),
        truncate_display(F.lit("short"), 20).alias("t"),
    ).collect()[0]
    assert r["disp"].startswith("Total Amount: xxx")
    assert r["disp"].endswith("...")  # ASCII suffix, string_formatter.py:33
    assert r["fn"] == "My_Doc_v2_final"
    assert r["t"] == "short"


def test_rekey_graph_parity(spark):
    from sparkdoc.dedup import rekey_graph
    from sparkdoc.identity import node_id
    from sparkdoc.schemas import EDGES, NODES

    nodes = spark.createDataFrame(
        [
            ("OLD_1", "d1", "Person", "Ada", {"name": "Ada Lovelace"}, None),
            ("OLD_2", "d1", "Person", "ada", {"name": "ada-lovelace"}, None),  # same identity
            ("OLD_3", "d1", "Person", "Bob", {"name": "Bob"}, None),
        ],
        NODES,
    )
    edges = spark.createDataFrame([("OLD_3", "OLD_2", "knows", None)], EDGES)
    n2, e2 = rekey_graph(nodes, edges, {"Person": ["name"]})
    expected = node_id("Person", {"name": "Ada Lovelace"})
    ids = {r["node_id"] for r in n2.collect()}
    assert expected in ids and len(ids) == 2  # OLD_1/OLD_2 folded
    assert e2.collect()[0]["dst"] == expected  # edge redirected (parity pin)


def test_apply_alias_merges(spark):
    from sparkdoc.dedup import apply_alias_merges
    from sparkdoc.schemas import EDGES, NODES

    nodes = spark.createDataFrame(
        [
            ("N_base", "d1", "T", "Annex 2", {"name": "Annex 2", "extra": "keep"}, None),
            ("N_sup", "d1", "T", "Annex 2 Technical", {"name": "Annex 2 Technical"}, None),
            ("N_x", "d1", "X", "x", {"name": "x"}, None),
        ],
        NODES,
    )
    edges = spark.createDataFrame([("N_x", "N_base", "refs", None)], EDGES)
    pairs = spark.createDataFrame([("N_base", "N_sup")], "base_id string, superset_id string")
    n2, e2, audit = apply_alias_merges(nodes, edges, pairs)
    got = {r["node_id"]: r["attrs"] for r in n2.collect()}
    assert "N_base" not in got
    assert got["N_sup"]["extra"] == "keep"  # absorbed
    assert got["N_sup"]["name"] == "Annex 2 Technical"  # superset wins
    assert e2.collect()[0]["dst"] == "N_sup"
    assert audit.collect()[0]["merged_node"] == "N_base"


def test_merge_ledgers_strength(spark):
    from sparkdoc.provenance import merge_ledgers
    from sparkdoc.schemas import LEDGER

    l1 = spark.createDataFrame(
        [("d1", "K1", "p[]", {"name": "x"}, [{"chunk_id": 0, "kind": "observed", "span": [0, 0]}])],
        LEDGER,
    )
    l2 = spark.createDataFrame(
        [
            ("d1", "K1", "p[]", {"name": "x"}, [
                {"chunk_id": 0, "kind": "verbatim", "span": [0, 0]},
                {"chunk_id": 2, "kind": "observed", "span": [0, 0]},
            ])
        ],
        LEDGER,
    )
    merged = merge_ledgers([l1, l2]).collect()
    assert len(merged) == 1
    anchors = {(a["chunk_id"], a["kind"]) for a in merged[0]["anchors"]}
    assert (0, "verbatim") in anchors  # strength max wins
    assert (0, "observed") not in anchors
    assert (2, "observed") in anchors


def test_sanitize_filename_degenerate_ids(spark):
    """'.'/'..' (path traversal segments) and all-invalid ids (empty result)
    fall back to a deterministic hash — never a traversal or a collision."""
    from pyspark.sql import functions as F

    from sparkdoc.format import sanitize_filename

    df = spark.createDataFrame(
        [("..",), (".",), ("???",), ("!!!",), ("ok-doc.1",)], "f string"
    )
    got = {r["f"]: r["fn"] for r in df.select("f", sanitize_filename(F.col("f")).alias("fn")).collect()}
    assert got["ok-doc.1"] == "ok-doc.1"
    for bad in ("..", ".", "???", "!!!"):
        assert got[bad].startswith("id_") and "/" not in got[bad] and "." not in got[bad]
    # distinct degenerate ids → distinct fallback names
    assert len({got["???"], got["!!!"], got[".."], got["."]}) == 4
