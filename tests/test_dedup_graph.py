"""Dedup + graph operator tests (F4 fixture cases, one Spark session)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdoc.dedup import (
    assert_no_cross_class_collisions,
    co_occurrence_veto,
    containment_alias_groups,
    content_hash_dedup,
    dedup_entities,
    enforce_cardinality_bounds,
    with_node_ids,
)
from sparkdoc.graph import (
    clean_edges,
    entities_to_nodes,
    graph_stats,
    remove_phantom_nodes,
    reverse_edges,
    validate_graph,
)
from sparkdoc.schemas import ENTITIES


@pytest.fixture(scope="module")
def entities(spark):
    rows = [
        # accent/case variants → same id (must fold to one row)
        ("d1", "categories[]", "Category", {"name": "Électroménager"}, {"note": "a"}, [1]),
        ("d1", "categories[]", "Category", {"name": "électroménager"}, {"note": "b"}, [3]),
        # separator variants → same id
        ("d1", "roles[]", "Role", {"name": "PROPRIETAIRE_NON_OCCUPANT"}, {}, [2]),
        ("d1", "roles[]", "Role", {"name": "Propriétaire non occupant"}, {"x": "1"}, [5]),
        # digit distinction → two ids
        ("d1", "clauses[]", "Clause", {"name": "Article 5"}, {}, [4]),
        ("d1", "clauses[]", "Clause", {"name": "Article 6"}, {}, [4]),
        # containment alias pair (short label ⊂ full title, same digit sig)
        ("d1", "sections[]", "Section", {"name": "Annex 2"}, {}, [6]),
        ("d1", "sections[]", "Section", {"name": "Annex 2 Technical Standards"}, {}, [7]),
        # tier trap must NOT merge: CONFORT ⊂ CONFORT PLUS but co-occur in chunk 8
        ("d1", "tiers[]", "Tier", {"name": "CONFORT"}, {}, [8]),
        ("d1", "tiers[]", "Tier", {"name": "CONFORT PLUS"}, {}, [8]),
    ]
    return spark.createDataFrame(rows, ENTITIES)


def test_with_node_ids_variants_converge(entities):
    df = with_node_ids(entities)
    cats = df.filter(F.col("class") == "Category").select("node_id").distinct().count()
    roles = df.filter(F.col("class") == "Role").select("node_id").distinct().count()
    clauses = df.filter(F.col("class") == "Clause").select("node_id").distinct().count()
    assert cats == 1 and roles == 1 and clauses == 2
    assert assert_no_cross_class_collisions(df) == 0


def test_dedup_entities_first_wins_union_chunks(entities):
    dd = dedup_entities(with_node_ids(entities))
    cat = dd.filter(F.col("class") == "Category").collect()
    assert len(cat) == 1
    # earliest chunk (1) wins the fields; chunk sets union
    assert cat[0]["fields"] == {"note": "a"}
    assert cat[0]["chunk_ids"] == [1, 3]


def test_containment_alias_and_veto(entities):
    nodes = entities_to_nodes(dedup_entities(with_node_ids(entities)))
    pairs = containment_alias_groups(nodes, name_col="label")
    got = {(r["base_canon"], r["superset_canon"]) for r in pairs.collect()}
    # Annex 2 ⊂ Annex 2 Technical Standards proposed; CONFORT ⊂ CONFORT PLUS also proposed
    assert ("annex2", "annex2technicalstandards") in got
    vetoed = co_occurrence_veto(pairs, nodes)
    kept = {(r["base_canon"], r["superset_canon"]) for r in vetoed.collect()}
    assert ("annex2", "annex2technicalstandards") in kept
    assert ("confort", "confortplus") not in kept  # same-chunk veto


def test_content_hash_dedup_redirects_edges(spark):
    from sparkdoc.schemas import EDGES, NODES

    nodes = spark.createDataFrame(
        [
            ("A_1", "d1", "A", "x", {"k": "v"}, None),
            ("A_2", "d1", "A", "x", {"k": "v"}, None),  # same content → folds into A_1
            ("B_1", "d1", "B", "y", {"k": "w"}, None),
        ],
        NODES,
    )
    edges = spark.createDataFrame([("B_1", "A_2", "refs", None)], EDGES)
    survivors, redirected = content_hash_dedup(nodes, edges)
    assert {r["node_id"] for r in survivors.collect()} == {"A_1", "B_1"}
    assert redirected.collect()[0]["dst"] == "A_1"


def test_cardinality_bounds_topk(spark):
    from sparkdoc.schemas import NODES

    rows = [
        (f"C_{i}", "d1", "C", f"n{i}", {"a": "x"} if i < 2 else {"a": "x", "b": "y"}, None)
        for i in range(5)
    ]
    nodes = spark.createDataFrame(rows, NODES)
    kept, demoted = enforce_cardinality_bounds(nodes, {"C": 2})
    assert kept.count() == 2
    assert demoted.count() == 3
    # richest (2 attrs) survive
    for r in kept.collect():
        assert len(r["attrs"]) == 2


def test_graph_cleaning_pipeline(spark):
    from sparkdoc.schemas import EDGES, NODES

    nodes = spark.createDataFrame(
        [
            ("N1", "d1", "T", "n1", {"a": "1"}, None),
            ("N2", "d1", "T", "n2", {"a": ""}, None),  # phantom: no meaningful attr
            ("N3", "d1", "T", "n3", {"a": "3"}, None),
        ],
        NODES,
    )
    edges = spark.createDataFrame(
        [
            ("N1", "N1", "self", None),  # self-loop
            ("N1", "N3", "ok", None),
            ("N1", "N3", "ok", None),  # duplicate
            ("N1", "N2", "to_phantom", None),
            ("N1", "NX", "dangling", None),
        ],
        EDGES,
    )
    n2, e2, audit = remove_phantom_nodes(nodes, edges)
    assert {r["node_id"] for r in n2.collect()} == {"N1", "N3"}
    assert audit.count() == 1  # the dropped to_phantom rel
    cleaned = clean_edges(n2, e2)
    assert cleaned.count() == 1
    assert validate_graph(n2, cleaned)["is_valid"]


def test_reverse_edges_and_stats(spark):
    from sparkdoc.schemas import EDGES, NODES

    nodes = spark.createDataFrame(
        [("N1", "d1", "T", "n1", {"a": "1"}, None), ("N2", "d1", "U", "n2", {"a": "2"}, None)],
        NODES,
    )
    edges = spark.createDataFrame([("N1", "N2", "likes", None)], EDGES)
    rev = reverse_edges(edges)
    assert rev.count() == 2
    assert {r["label"] for r in rev.collect()} == {"likes", "reverse_likes"}
    stats = {(r["metric"], r["key"]): r["value"] for r in graph_stats(nodes, edges).collect()}
    assert stats[("n_nodes", "")] == 2.0
    assert stats[("nodes_per_class", "T")] == 1.0
    assert stats[("avg_degree", "")] == 1.0


def test_cap_keywords(spark):
    from sparkdoc.graph import cap_keywords
    from sparkdoc.schemas import NODES

    nodes = spark.createDataFrame(
        [
            ("N1", "d1", "T", "n1", {"keywords": "a|b|c|d|e|f|g", "x": "1"}, None),
            ("N2", "d1", "T", "n2", {"x": "2"}, None),
        ],
        NODES,
    )
    got = {r["node_id"]: r["attrs"] for r in cap_keywords(nodes).collect()}
    assert got["N1"]["keywords"] == "a|b|c|d|e"  # capped at 5
    assert got["N1"]["x"] == "1"
    assert got["N2"] == {"x": "2"}  # untouched


def test_merge_graphs_richest_precedence(spark):
    from sparkdoc.merge import merge_graphs
    from sparkdoc.schemas import EDGES, NODES

    poor = spark.createDataFrame([("N1", "d1", "T", "n1", {"a": "first"}, None)], NODES)
    rich = spark.createDataFrame(
        [("N1", "d2", "T", "n1r", {"a": "rich", "b": "2", "c": "3"}, None)], NODES
    )
    e = spark.createDataFrame([], EDGES)
    nodes, _, _ = merge_graphs([(poor, e), (rich, e)], precedence="richest")
    got = nodes.collect()[0]["attrs"]
    assert got["a"] == "rich"  # richest input wins the conflicting attr
    assert got["b"] == "2" and got["c"] == "3"


def test_empty_identity_nodes(spark):
    from sparkdoc.dedup import with_node_ids
    from sparkdoc.rootid import empty_identity_nodes
    from sparkdoc.schemas import ENTITIES

    ents = with_node_ids(
        spark.createDataFrame(
            [
                ("d1", "p[]", "P", {"name": ""}, {}, [0]),
                ("d1", "p[]", "P", {"name": "real"}, {}, [0]),
            ],
            ENTITIES,
        )
    )
    flagged = empty_identity_nodes(ents).collect()
    assert len(flagged) == 1 and flagged[0]["class"] == "P"


def test_content_hash_dedup_cleans_collapsed_edges(spark):
    """Redirection collapsing an edge onto itself (self-loop) or onto a
    duplicate must drop/dedupe it (graph_cleaner.py:406,411 parity)."""
    from sparkdoc.dedup import content_hash_dedup
    from sparkdoc.schemas import EDGES, NODES

    nodes = spark.createDataFrame(
        [
            ("A_1", "d1", "A", "x", {"k": "v"}, None),
            ("A_2", "d1", "A", "x", {"k": "v"}, None),  # folds into A_1
            ("B_1", "d1", "B", "y", {"k": "w"}, None),
        ],
        NODES,
    )
    edges = spark.createDataFrame(
        [
            ("A_1", "A_2", "same", None),   # becomes A_1→A_1 self-loop → dropped
            ("B_1", "A_1", "refs", None),
            ("B_1", "A_2", "refs", None),   # becomes duplicate of the row above
        ],
        EDGES,
    )
    _, redirected = content_hash_dedup(nodes, edges)
    got = [(r["src"], r["dst"], r["label"]) for r in redirected.collect()]
    assert got == [("B_1", "A_1", "refs")]


def test_cardinality_full_rank_key(spark):
    """Rank key completion (graph_converter.py:360-420): richness desc, chunk
    weight desc, EXTERNAL in-degree desc (non-root sources only), canonical
    identity asc as the stable tiebreak."""
    from sparkdoc.dedup import enforce_cardinality_bounds
    from sparkdoc.schemas import EDGES

    rows = [
        # equal richness + weight: ext_in then canonical identity decide
        ("K_1", "d1", "K", "zeta", {"name": "zeta"}, None, [0]),
        ("K_2", "d1", "K", "alpha", {"name": "alpha"}, None, [0]),
        ("K_3", "d1", "K", "beta", {"name": "beta"}, None, [0]),
        ("R_1", "d1", "Root", "root", {"name": "root"}, None, [0]),
        ("X_1", "d1", "X", "x", {"name": "x"}, None, [0]),
    ]
    nodes = spark.createDataFrame(
        rows,
        "node_id string, doc_id string, node_class string, label string, "
        "attrs map<string,string>, provenance string, chunk_ids array<int>",
    )
    edges = spark.createDataFrame(
        [
            ("R_1", "K_2", "has", None),  # root source — does NOT count
            ("X_1", "K_1", "refs", None),  # non-root source — counts for K_1
        ],
        EDGES,
    )
    kept, demoted = enforce_cardinality_bounds(
        nodes,
        {"K": 2},
        edges=edges,
        root_classes=("Root",),
        id_fields_map={"K": ["name"]},
    )
    kept_ids = {r["node_id"] for r in kept.collect() if r["node_class"] == "K"}
    # K_1 wins on ext_in=1; K_2 vs K_3 tie on ext_in=0 → canonical identity
    # 'alpha' < 'beta' keeps K_2; K_3 demoted
    assert kept_ids == {"K_1", "K_2"}
    assert [r["node_id"] for r in demoted.collect()] == ["K_3"]


def test_demoted_doc_edges_dropped_per_document(spark):
    """A node demoted in doc B but kept in doc A (global registry id, per-doc
    bound) loses exactly doc B's edges: the reference converts one document
    per graph, so the demoted instance isn't in doc B's graph at all."""
    from sparkdoc.dedup import drop_demoted_doc_edges

    edges = spark.createDataFrame(
        [
            ("dA", "R_A", "P_1", "has", None),  # P_1 kept in dA → survives
            ("dB", "R_B", "P_1", "has", None),  # P_1 demoted in dB → dropped
            ("dB", "P_1", "K_1", "refs", None),  # demoted endpoint as SRC → dropped
            ("dB", "R_B", "K_1", "has", None),  # untouched edge in dB → survives
        ],
        "doc_id string, src string, dst string, label string, props map<string,string>",
    )
    demoted = spark.createDataFrame(
        [("dB", "P_1", "P", 3)], "doc_id string, node_id string, node_class string, _rank int"
    )
    out = {(r["doc_id"], r["src"], r["dst"]) for r in drop_demoted_doc_edges(edges, demoted).collect()}
    assert out == {("dA", "R_A", "P_1"), ("dB", "R_B", "K_1")}


def test_alias_pair_survives_multi_doc_node_rows(spark):
    """A node appearing in 2+ documents (per-(doc,node) rows) must not veto
    its own alias pair: the uniqueness count is per distinct base, not per
    row."""
    from sparkdoc.dedup import containment_alias_groups

    nodes = spark.createDataFrame(
        [
            ("N1", "d1", "C", "ACME", [0]),
            ("N1", "d2", "C", "ACME", [0]),  # same node, second doc
            ("N2", "d1", "C", "ACME Corporation", [1]),
        ],
        "node_id string, doc_id string, node_class string, label string, chunk_ids array<int>",
    )
    pairs = containment_alias_groups(nodes).collect()
    assert {(p["base_id"], p["superset_id"]) for p in pairs} == {("N1", "N2")}
    assert len(pairs) == 1  # and exactly one row per pair


def test_co_occurrence_veto_is_doc_scoped(spark):
    """chunk ids are per-document ordinals: doc A's chunk 0 and doc B's
    chunk 0 are different chunks — only SAME-document overlap vetoes."""
    from sparkdoc.dedup import co_occurrence_veto

    pairs = spark.createDataFrame(
        [("N1", "N2"), ("N3", "N4")], "base_id string, superset_id string"
    )
    nodes = spark.createDataFrame(
        [
            # N1/N2: chunk 0 in DIFFERENT docs — no real co-occurrence
            ("N1", "dA", [0]), ("N2", "dB", [0]),
            # N3/N4: chunk 3 in the SAME doc — genuine siblings, vetoed
            ("N3", "dC", [3]), ("N4", "dC", [3]),
        ],
        "node_id string, doc_id string, chunk_ids array<int>",
    )
    kept = {(r["base_id"], r["superset_id"]) for r in co_occurrence_veto(pairs, nodes).collect()}
    assert kept == {("N1", "N2")}


def test_alias_chain_redirects_to_final_survivor(spark):
    """A⊂B⊂C: single-hop redirection would point A's edges at the deleted
    B — the closure must land everything on C."""
    from sparkdoc.dedup import apply_alias_merges

    nodes = spark.createDataFrame(
        [
            ("A", "d", "C", "hanns", {"k": "va"}, None),
            ("B", "d", "C", "johanns", {"j": "vb"}, None),
            ("C", "d", "C", "xjohanns", {}, None),
        ],
        "node_id string, doc_id string, node_class string, label string, "
        "attrs map<string,string>, provenance string",
    )
    edges = spark.createDataFrame(
        [("X", "A", "refs", None)], "src string, dst string, label string, props map<string,string>"
    )
    pairs = spark.createDataFrame(
        [("A", "B"), ("B", "C")], "base_id string, superset_id string"
    )
    n2, e2, audit = apply_alias_merges(nodes, edges, pairs)
    assert {r["node_id"] for r in n2.collect()} == {"X"} | {"C"} - {"X"} or True
    survivors = {r["node_id"] for r in n2.collect()}
    assert survivors == {"C"}
    e = e2.collect()
    assert len(e) == 1 and e[0]["dst"] == "C"  # not the deleted B
    c_attrs = {r["node_id"]: dict(r["attrs"]) for r in n2.collect()}["C"]
    assert c_attrs.get("k") == "va" and c_attrs.get("j") == "vb"  # absorbed through the chain


def test_content_dedup_never_collapses_across_classes(spark):
    from sparkdoc.dedup import content_hash_dedup
    from sparkdoc.schemas import EDGES

    nodes = spark.createDataFrame(
        [
            ("P_1", "d", "Person", "Smith", {"name": "Smith"}, None),
            ("O_1", "d", "Organization", "Smith", {"name": "Smith"}, None),
            ("U_1", "d", "Person", "u1", {"name": "Unknown"}, None),
            ("U_2", "d", "Person", "u2", {"name": "Unknown"}, None),
        ],
        "node_id string, doc_id string, node_class string, label string, "
        "attrs map<string,string>, provenance string",
    )
    survivors, _ = content_hash_dedup(nodes, spark.createDataFrame([], EDGES))
    ids = {r["node_id"] for r in survivors.collect()}
    assert ids == {"P_1", "O_1", "U_1", "U_2"}  # classes and placeholders never merge


def test_entities_to_nodes_empty_ids_label_fallback(spark):
    """ANSI regression: an entity with an EMPTY ids map must not crash
    element_at and must fall back to node_id for its label."""
    from sparkdoc.graph import entities_to_nodes

    ents = spark.createDataFrame(
        [
            ("d1", "T", {}, {"f": "v"}, ["c1"], "NID_EMPTY"),
            ("d1", "T", {"code": "x9"}, {"f": "v"}, ["c1"], "NID_CODE"),
            ("d1", "T", {"name": "Ada"}, None, ["c1"], "NID_NAME"),
        ],
        "doc_id string, class string, ids map<string,string>, "
        "fields map<string,string>, chunk_ids array<string>, node_id string",
    )
    got = {r["node_id"]: r["label"] for r in entities_to_nodes(ents).collect()}
    assert got["NID_EMPTY"] == "NID_EMPTY"  # fallback reachable, no throw
    assert got["NID_CODE"] == "x9"  # first map value
    assert got["NID_NAME"] == "Ada"


def test_remove_phantom_nodes_null_attrs(spark):
    """A node with NULL attrs is a phantom (not silently dropped from both
    sides by three-valued logic), and its edges are anti-joined out. NODES
    declares attrs non-nullable, but externally-supplied parquet does not
    enforce that — build with a lax schema to model such input."""
    from sparkdoc.graph import remove_phantom_nodes
    from sparkdoc.schemas import EDGES

    lax = (
        "node_id string, doc_id string, node_class string, label string, "
        "attrs map<string,string>, provenance string"
    )
    nodes = spark.createDataFrame(
        [("N1", "d1", "T", "n1", {"a": "1"}, None), ("NN", "d1", "T", "nn", None, None)],
        lax,
    )
    edges = spark.createDataFrame([("N1", "NN", "to_null", None)], EDGES)
    kept, e2, audit = remove_phantom_nodes(nodes, edges)
    assert {r["node_id"] for r in kept.collect()} == {"N1"}
    assert e2.count() == 0
    assert audit.count() == 1


def test_cap_keywords_custom_sep(spark):
    """sep parameter drives BOTH split and join (was split-hardcoded to '|')."""
    from sparkdoc.graph import cap_keywords
    from sparkdoc.schemas import NODES

    nodes = spark.createDataFrame(
        [("N1", "d1", "T", "n1", {"keywords": "a,b,c,d,e,f,g"}, None)],
        NODES,
    )
    got = cap_keywords(nodes, sep=",").collect()[0]["attrs"]["keywords"]
    assert got == "a,b,c,d,e"


def test_content_dedup_node_never_survivor_and_redirect(spark):
    """A node_id whose rows hash into DIFFERENT groups must not be both a
    survivor and a redirect source (review-confirmed: its edges moved away
    while it kept existing, orphaned)."""
    from sparkdoc.dedup import content_hash_dedup

    nodes = spark.createDataFrame(
        [
            ("d1", "N0", {"name": "x"}),
            ("d1", "N1", {"name": "x"}),  # groups with N0 → maps N1→N0...
            ("d2", "N1", {"name": "x", "extra": "y"}),  # ...but N1 survives here
        ],
        "doc_id string, node_id string, attrs map<string,string>",
    )
    edges = spark.createDataFrame(
        [("A", "N1", "ref")], "src string, dst string, label string"
    )
    out_nodes, out_edges = content_hash_dedup(nodes, edges)
    ids = {r["node_id"] for r in out_nodes.collect()}
    e = [(r["src"], r["dst"]) for r in out_edges.collect()]
    # N1 has a surviving row → it is a survivor, so its edge must NOT move
    assert "N1" in ids and ("A", "N1") in e and ("A", "N0") not in e


def test_ambiguous_base_vetoed_symmetrically(spark):
    """A base contained in 2+ supersets proposes NOTHING: without the
    symmetric veto, apply_alias_merges fans the base's edges/attrs into
    every superset (duplicated edges, wrong merge). "ACME" ⊂ {"ACME Corp",
    "ACME Holdings"} → no pair; an unambiguous pair in the same frame still
    survives."""
    from sparkdoc.dedup import containment_alias_groups

    nodes = spark.createDataFrame(
        [
            ("N1", "d1", "C", "ACME", [0]),
            ("N2", "d1", "C", "ACME Corp", [1]),
            ("N3", "d1", "C", "ACME Holdings", [2]),
            ("N4", "d1", "C", "Globex", [3]),
            ("N5", "d1", "C", "Globex International", [4]),
        ],
        "node_id string, doc_id string, node_class string, label string, chunk_ids array<int>",
    )
    got = {
        (p["base_id"], p["superset_id"])
        for p in containment_alias_groups(nodes).collect()
    }
    assert got == {("N4", "N5")}
