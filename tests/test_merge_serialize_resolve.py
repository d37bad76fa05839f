"""Merge, serialization views, chunk-owner map, parent ladder tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdoc.merge import (
    deep_merge_dicts,
    enforce_closed_catalogs,
    merge_descriptions,
    merge_graphs,
    truncate_at_sentence_boundary,
)


# --- pure python -----------------------------------------------------------


def test_truncate_sentence_boundary():
    t = "One. Two is longer. Three closes."
    assert truncate_at_sentence_boundary(t, 100) == t
    assert truncate_at_sentence_boundary(t, 10) == "One."
    assert truncate_at_sentence_boundary("no boundary here at all", 10) == "no boundar"


def test_merge_descriptions_dedup():
    # dedup is CASE-SENSITIVE substring, existing text verbatim — the
    # reference's rule (description_merger.py:90-104; r5 parity fix): the
    # case-variant "gamma delta." is NOT a substring of the existing text,
    # so it is kept
    out = merge_descriptions(["Alpha beta. Gamma delta.", "gamma delta. Epsilon zeta."])
    assert out == "Alpha beta. Gamma delta. gamma delta. Epsilon zeta."
    out = merge_descriptions(["Alpha beta. Gamma delta.", "Gamma delta. Epsilon zeta."])
    assert out == "Alpha beta. Gamma delta. Epsilon zeta."


def test_deep_merge_scalar_overwrite_and_lists():
    base = {"a": "x", "nested": {"k": "1"}, "tags": ["p"], "description": "First part."}
    extra = {"a": "y", "b": "new", "nested": {"k": "2", "m": "3"}, "tags": ["p", "q"], "description": "Second part."}
    out = deep_merge_dicts(base, extra)
    # non-empty scalar conflicts overwrite — dict_merger.py:152-168 (the
    # r5 reference-parity fuzz caught the old first-wins divergence)
    assert out["a"] == "y"
    assert out["b"] == "new"
    assert out["nested"] == {"k": "2", "m": "3"}
    assert out["tags"] == ["p", "q"]
    assert out["description"] == "First part. Second part."


def test_deep_merge_skips_empty():
    assert deep_merge_dicts({"a": "x"}, {"a": "", "b": None}) == {"a": "x"}


# --- spark ------------------------------------------------------------------


def test_merge_graphs_input_order_and_conflicts(spark):
    from sparkdoc.schemas import EDGES, NODES

    g1n = spark.createDataFrame([("N1", "d1", "T", "n1", {"a": "1"}, None)], NODES)
    g1e = spark.createDataFrame([("N1", "N2", "l", None)], EDGES)
    g2n = spark.createDataFrame(
        [("N1", "d2", "T", "n1b", {"a": "2", "b": "9"}, None), ("N2", "d2", "T", "n2", {"c": "3"}, None)],
        NODES,
    )
    g2e = spark.createDataFrame([("N1", "N2", "l", None)], EDGES)
    nodes, edges, conflicts = merge_graphs([(g1n, g1e), (g2n, g2e)])
    got = {r["node_id"]: r["attrs"] for r in nodes.collect()}
    assert got["N1"] == {"a": "1", "b": "9"}  # input order wins on a; b filled from 2nd
    assert got["N2"] == {"c": "3"}
    assert edges.count() == 1  # dedup
    cf = conflicts.collect()
    assert len(cf) == 1 and cf[0]["attr"] == "a" and cf[0]["n_variants"] == 2


def test_closed_catalog_label_scoped_marks(spark):
    """graph_converter.py:431-494: a target whose EVERY in-edge carries a
    label-matching _closed_catalog marker drops its reference edges (and
    itself when disconnected); any unmarked in-edge keeps everything; a
    stale marker not matching the surviving label does not count; the
    class-wipe guard skips classes with no independently anchored member;
    the transient marker is stripped from survivors."""
    from sparkdoc.schemas import EDGES, NODES

    nodes = spark.createDataFrame(
        [
            ("K_1", "d1", "Kind", "k1", {"name": "k1"}, None),      # catalog-only → dropped
            ("K_2", "d1", "Kind", "k2", {"name": "k2"}, None),      # independently anchored
            ("K_3", "d1", "Kind", "k3", {"name": "k3"}, None),      # stale marker → kept
            ("W_1", "d1", "Wiped", "w1", {"name": "w1"}, None),     # guard: whole class catalog-only
            ("X_1", "d1", "X", "x", {"name": "x"}, None),
        ],
        NODES,
    )
    edges = spark.createDataFrame(
        [
            ("X_1", "K_1", "of_kind", {"_closed_catalog": "of_kind"}),   # marked, label matches
            ("X_1", "K_2", "of_kind", {"_closed_catalog": "of_kind"}),
            ("X_1", "K_2", "mentions", None),                            # unmarked → K_2 anchored
            ("X_1", "K_3", "of_kind", {"_closed_catalog": "other"}),     # stale → unmarked
            ("X_1", "W_1", "of_w", {"_closed_catalog": "of_w"}),         # only member of Wiped
        ],
        EDGES,
    )
    kept_nodes, kept_edges = enforce_closed_catalogs(nodes, edges)
    ids = {r["node_id"] for r in kept_nodes.collect()}
    assert "K_1" not in ids  # dropped with its only (marked) edge
    assert {"K_2", "K_3", "W_1", "X_1"} <= ids
    got = {(r["src"], r["dst"], r["label"]) for r in kept_edges.collect()}
    assert ("X_1", "K_1", "of_kind") not in got
    assert ("X_1", "K_2", "of_kind") in got and ("X_1", "W_1", "of_w") in got
    # transient marker stripped from survivors
    for r in kept_edges.collect():
        assert not (r["props"] or {}).get("_closed_catalog")


def test_page_and_document_markdown(spark):
    from sparkdoc.serialize import document_markdown, page_markdowns

    rows = [
        ("d1", "heading", "# Title", "", 0),
        ("d1", "text", "para one.", "", 1),
        ("d1", "page_break", "", "", 2),
        ("d1", "furniture", "PAGE 2", "", 3),
        ("d1", "text", "para two.", "", 4),
        ("d1", "picture", "", "#/pictures/9", 5),
    ]
    spans = spark.createDataFrame(rows, "doc_id string, kind string, text string, media_ref string, offset int")
    pages = {r["page_no"]: r["markdown"] for r in page_markdowns(spans).collect()}
    assert pages[1] == "# Title\n\npara one."
    assert pages[2] == "para two.\n\n![#/pictures/9]"
    doc = document_markdown(spans).collect()[0]["markdown"]
    assert doc == "# Title\n\npara one.\n\npara two.\n\n![#/pictures/9]"


def test_documents_markdown_matches_grouped_twin(spark):
    """The zero-shuffle documents-table serializer must be byte-identical to
    the exploded-rows groupBy twin — same struct sort, same rendering, same
    furniture/page_break exclusion — on shuffled span order and a synth
    corpus slice."""
    from sparkdoc.serialize import document_markdown, documents_markdown
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    rows = [
        ("d1", "heading", "# Title", "", 0),
        ("d1", "text", "para one.", "", 1),
        ("d1", "page_break", "", "", 2),
        ("d1", "furniture", "PAGE 2", "", 3),
        ("d1", "caption", "fig cap", "", 4),
        ("d1", "picture", "", "#/pictures/9", 5),
        ("d2", "text", "solo", "", 0),
        # all-furniture doc: the grouped twin DROPS it, the documents-table
        # path keeps it as markdown="" (pinned divergence — see docstring)
        ("d3", "furniture", "PAGE 1", "", 0),
        ("d3", "page_break", "", "", 1),
    ]
    # deliberately out-of-offset-order arrays
    import random

    rng = random.Random(5)
    by_doc: dict[str, list] = {}
    for r in rng.sample(rows, len(rows)):
        by_doc.setdefault(r[0], []).append((r[1], r[2], r[3], r[4]))
    docs = spark.createDataFrame(
        [(d, s) for d, s in sorted(by_doc.items())],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {r["doc_id"]: r["markdown"] for r in documents_markdown(docs).collect()}
    spans = spark.createDataFrame(
        rows, "doc_id string, kind string, text string, media_ref string, offset int"
    )
    want = {r["doc_id"]: r["markdown"] for r in document_markdown(spans).collect()}
    # content-less d3: grouped twin loses the doc, documents path keeps ""
    assert "d3" not in want and got.pop("d3") == ""
    assert got == want

    synth_docs = extract_documents(raw_nodes_df(spark, 30, 11))
    got2 = {
        r["doc_id"]: r["markdown"]
        for r in documents_markdown(synth_docs).collect()
    }
    exploded = synth_docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.*")
    want2 = {
        r["doc_id"]: r["markdown"] for r in document_markdown(exploded).collect()
    }
    assert got2 == want2 and len(got2) == 30


def test_batch_markdown(spark):
    from sparkdoc.serialize import batch_markdown

    rows = [("d1", 0, 0, "first"), ("d1", 1, 0, "second"), ("d1", 2, 1, "third")]
    chunks = spark.createDataFrame(rows, "doc_id string, chunk_id int, batch_index int, text string")
    out = {r["batch_index"]: r["batch_md"] for r in batch_markdown(chunks).collect()}
    assert out[0] == "--- CHUNK 1 ---\nfirst\n\n--- CHUNK 2 ---\nsecond"
    assert out[1] == "--- CHUNK 3 ---\nthird"


def test_chunk_owner_map_ladder(spark):
    from sparkdoc.serialize import chunk_owner_map

    chunks = spark.createDataFrame(
        [
            ("d1", 0, "Contract with ACME Corp begins here."),  # head hit
            ("d1", 1, "no names at all"),  # carried from 0
            ("d1", 2, ("x" * 350) + " mentions Bolt Inc later"),  # body hit only
            ("d1", 3, "ACME Corp and Bolt Inc together"),  # ambiguous → carried
        ],
        "doc_id string, chunk_id int, text string",
    )
    parents = spark.createDataFrame(
        [("d1", "P_acme", "ACME Corp"), ("d1", "P_bolt", "Bolt Inc")],
        "doc_id string, node_id string, label string",
    )
    got = {r["chunk_id"]: (r["owner_id"], r["owner_kind"]) for r in chunk_owner_map(chunks, parents).collect()}
    assert got[0] == ("P_acme", "head")
    assert got[1] == ("P_acme", "carried")
    assert got[2] == ("P_bolt", "body")
    assert got[3] == ("P_acme", "carried")  # ambiguity vetoed, head carry wins


def test_parent_ladder_rungs(spark):
    from sparkdoc.resolve import resolve_parents

    parents = spark.createDataFrame(
        [
            ("d1", "P_a", "orgs[]", "ACME Corporation", [0], 0),
            ("d1", "P_b", "orgs[]", "Bolt Inc", [2], 5),
            ("d1", "P_solo", "departments[]", "R&D", [1], 1),
        ],
        "doc_id string, node_id string, path string, label string, chunk_ids array<int>, emission int",
    )
    children = spark.createDataFrame(
        [
            ("d1", 1, "orgs[]", "Bolt Inc", [9], 9),        # exact
            ("d1", 2, "departments[]", "", [9], 9),          # singleton
            ("d1", 3, "orgs[]", "ACME Corporation Holdings", [9], 2),  # none: key superset, falls to adjacent
            ("d1", 4, "orgs[]", "", [2], 9),                 # co-chunk with P_b
            ("d1", 5, "orgs[]", "", [9], 7),                 # adjacent: nearest preceding = P_b (emission 5)
            ("d1", 6, "missing[]", "", [9], 9),              # bucket
        ],
        "doc_id string, child_id int, parent_path string, parent_key string, chunk_ids array<int>, emission int",
    )
    got = {r["child_id"]: (r["parent_id"], r["resolved_by"]) for r in resolve_parents(children, parents).collect()}
    assert got[1] == ("P_b", "exact")
    assert got[2] == ("P_solo", "singleton")
    assert got[4] == ("P_b", "co_chunk")
    assert got[5] == ("P_b", "adjacent")
    assert got[6] == ("BUCKET_d1_missing[]", "bucket")
    assert got[3][1] in ("adjacent", "containment")


def test_merge_graphs_keeps_attrless_nodes(spark):
    """A node whose attrs are all empty must survive the merge (the reference
    merger keeps it); its edges must not dangle."""
    from sparkdoc.schemas import EDGES, NODES

    g1n = spark.createDataFrame(
        [("N1", "d1", "T", "n1", {"a": "1"}, None), ("N2", "d1", "T", "n2", {}, None)], NODES
    )
    g1e = spark.createDataFrame([("N1", "N2", "l", None)], EDGES)
    g2n = spark.createDataFrame([("N3", "d2", "T", "n3", {"x": ""}, None)], NODES)
    g2e = spark.createDataFrame([("N3", "N2", "l", None)], EDGES)
    nodes, edges, _ = merge_graphs([(g1n, g1e), (g2n, g2e)])
    got = {r["node_id"]: r["attrs"] for r in nodes.collect()}
    assert set(got) == {"N1", "N2", "N3"}
    assert got["N2"] == {} and got["N3"] == {}
    assert edges.count() == 2


# --- merge policy surface (merger.py:242-716 analogs) -----------------------


def _mk_inputs(spark):
    from sparkdoc.schemas import EDGES, NODES

    g1n = spark.createDataFrame(
        [("R", "d1", "T", "r", {"a": "1", "description": "Alpha fact. Shared fact."}, None),
         ("C", "d1", "T", "c", {"x": "1"}, None)],
        NODES,
    )
    g1e = spark.createDataFrame([("R", "C", "has", None)], EDGES)
    g2n = spark.createDataFrame(
        [("R", "d2", "T", "r", {"a": "2", "b": "9", "description": "Shared fact. Beta fact."}, None),
         ("C", "d2", "T", "c", {"x": "2"}, None)],
        NODES,
    )
    g2e = spark.createDataFrame([("R", "C", "has", None)], EDGES)
    return [(g1n, g1e), (g2n, g2e)]


def test_merge_policy_keep_all_packs_conflicts(spark):
    from sparkdoc.merge import MergePolicy, merge_graphs_policy

    out = merge_graphs_policy(_mk_inputs(spark), MergePolicy(conflicts="keep_all"))
    rows = {r["node_id"]: r["attrs"] for r in out["nodes"].collect()}
    c = rows["C"]
    assert c["x"] == "1" and "__conflicts__" in c and '"2"' in c["__conflicts__"]
    assert out["conflicts"].filter("node_id='C' and attr='x'").count() == 1


def test_merge_policy_variants_reified(spark):
    from sparkdoc.merge import HAS_CONFLICT_VARIANT, VARIANT_TYPE, MergePolicy, merge_graphs_policy

    out = merge_graphs_policy(_mk_inputs(spark), MergePolicy(conflicts="variants"))
    variants = out["nodes"].filter(f"node_class='{VARIANT_TYPE}'").collect()
    assert variants and any(v["attrs"].get("x") == "2" for v in variants)
    ve = out["edges"].filter(f"label='{HAS_CONFLICT_VARIANT}'").collect()
    assert ve and all(e["src"] in ("C", "R") for e in ve)
    # canonical node identical to keep_first
    c = {r["node_id"]: r["attrs"] for r in out["nodes"].collect()}["C"]
    assert c["x"] == "1" and "__conflicts__" not in c


def test_merge_policy_combine_fields_sentence_dedup(spark):
    from sparkdoc.merge import MergePolicy, merge_graphs_policy

    out = merge_graphs_policy(_mk_inputs(spark), MergePolicy())
    r = {x["node_id"]: x["attrs"] for x in out["nodes"].collect()}["R"]
    assert r["description"].count("Shared fact.") == 1
    assert "Alpha fact." in r["description"] and "Beta fact." in r["description"]


def test_merge_policy_skolemizes_stem_root_collisions(spark):
    """Same root id, distinct documents, identity value == doc_id (the
    filename-stem analog) → the later occurrence splits and its edges follow;
    content-derived identities (label != doc_id) are never touched."""
    from sparkdoc.merge import merge_graphs_policy
    from sparkdoc.schemas import EDGES, NODES

    g1n = spark.createDataFrame([("Root_1", "d1", "T", "d1", {"a": "1"}, None),
                                 ("K_1", "d1", "T", "kid", {"k": "1"}, None)], NODES)
    g1e = spark.createDataFrame([("Root_1", "K_1", "has", None)], EDGES)
    g2n = spark.createDataFrame([("Root_1", "d2", "T", "d2", {"a": "2"}, None),
                                 ("K_2", "d2", "T", "kid2", {"k": "2"}, None)], NODES)
    g2e = spark.createDataFrame([("Root_1", "K_2", "has", None)], EDGES)
    out = merge_graphs_policy([(g1n, g1e), (g2n, g2e)])
    ids = {r["node_id"] for r in out["nodes"].collect()}
    sk = [i for i in ids if i.startswith("Root_1__doc_")]
    assert "Root_1" in ids and len(sk) == 1
    attrs = {r["node_id"]: r["attrs"] for r in out["nodes"].collect()}
    assert attrs[sk[0]]["skolem_document_id"] == "d2"
    # skolemized root keeps its own child edge
    assert {(r["src"], r["dst"]) for r in out["edges"].collect()} == {
        ("Root_1", "K_1"), (sk[0], "K_2")
    }
    assert out["skolemized"].count() == 1


def test_merge_policy_schema_hash_gate(spark):
    import pytest as _pytest

    from sparkdoc.merge import MergePolicy, TemplateMismatchError, merge_graphs_policy

    with _pytest.raises(TemplateMismatchError):
        merge_graphs_policy(_mk_inputs(spark), schema_hashes=["h1", "h2"])
    out = merge_graphs_policy(
        _mk_inputs(spark),
        MergePolicy(strict_template_check=False),
        schema_hashes=["h1", "h2"],
    )
    assert out["report"]["warnings"]


def test_merge_policy_ledger_sidecar(spark):
    from sparkdoc.merge import merge_graphs_policy
    from sparkdoc.schemas import LEDGER

    l1 = spark.createDataFrame(
        [("d1", "K", "p[]", {"name": "x"}, [(0, "observed", [0, 0])])], LEDGER
    )
    l2 = spark.createDataFrame(
        [("d1", "K", "p[]", {"name": "x"}, [(0, "verbatim", [0, 0])])], LEDGER
    )
    out = merge_graphs_policy(_mk_inputs(spark), ledgers=[l1, l2])
    row = out["ledger"].collect()[0]
    # strength-max: verbatim beats observed for the same (chunk, span)
    assert [a["kind"] for a in row["anchors"]] == ["verbatim"]


def test_deep_merge_entity_lists_identity_and_jaccard():
    from sparkdoc.merge import deep_merge_dicts

    base = {"studies": [{"name": "S1", "n": 5}, {"name": "S2"}]}
    extra = {"studies": [{"name": "S1", "site": "Paris"}, {"name": "S3"}]}
    out = deep_merge_dicts(base, extra, identity_fields_map={"studies": ["name"]})
    byname = {s["name"]: s for s in out["studies"]}
    assert set(byname) == {"S1", "S2", "S3"}
    assert byname["S1"] == {"name": "S1", "n": 5, "site": "Paris"}  # folded, first wins

    # Jaccard >= 0.5 child-overlap fallback when no id/hash match
    a = {"items": [{"rows": [{"sku": "A"}, {"sku": "B"}], "note": "x"}]}
    b = {"items": [{"rows": [{"sku": "A"}, {"sku": "B"}], "extra": "y"}]}
    merged = deep_merge_dicts(a, b, merge_similarity_fallback=True)
    assert len(merged["items"]) == 1 and merged["items"][0]["extra"] == "y"
    # without the fallback the near-dup instance appends instead
    plain = deep_merge_dicts(a, b)
    assert len(plain["items"]) == 2


def test_variant_ids_collision_proof_on_remerge(spark):
    """Re-merging a merged graph (conflicts='variants') must not fold a
    pre-existing variant node into a NEW variant with different content:
    ids carry a content-hash suffix, so an id collision implies identical
    content and any fold is a no-op (idempotence)."""
    from sparkdoc.merge import VARIANT_TYPE, MergePolicy, merge_graphs_policy
    from sparkdoc.schemas import EDGES, NODES

    pol = MergePolicy(conflicts="variants")
    m1 = merge_graphs_policy(_mk_inputs(spark), pol, skolemize=False)
    v1 = {
        r["node_id"]: r["attrs"]
        for r in m1["nodes"].filter(f"node_class='{VARIANT_TYPE}'").collect()
    }
    assert v1  # the fixture conflicts on C.x and R.a/b

    # a third graph re-merged WITH the merged graph, conflicting on the
    # same base from the same source INDEX (1) but with different values —
    # the pre-fix bare "<base>__variant_1" id would collide with m1's
    g3n = spark.createDataFrame(
        [("C", "d3", "T", "c", {"x": "3"}, None)], NODES
    )
    g3e = spark.createDataFrame([], EDGES)
    m2 = merge_graphs_policy(
        [(m1["nodes"], m1["edges"]), (g3n, g3e)], pol, skolemize=False
    )
    nodes2 = m2["nodes"].collect()
    ids = [r["node_id"] for r in nodes2]
    assert len(ids) == len(set(ids)), "duplicate node ids after re-merge"
    v2 = {
        r["node_id"]: r["attrs"]
        for r in nodes2
        if r["node_class"] == VARIANT_TYPE
    }
    # every original variant survives with ITS content; the new conflict
    # minted a distinct id (x=3 never overwrites the x=2 variant)
    for vid, attrs in v1.items():
        assert v2.get(vid) == attrs
    assert any(a.get("x") == "3" for a in v2.values())
    assert any(a.get("x") == "2" for a in v2.values())

    # idempotence: merging the merged graph alone changes nothing
    m3 = merge_graphs_policy([(m2["nodes"], m2["edges"])], pol, skolemize=False)
    assert m3["nodes"].count() == len(nodes2)
    ids3 = [r["node_id"] for r in m3["nodes"].collect()]
    assert sorted(ids3) == sorted(ids)


def test_entity_list_merge_fingerprints_linear(monkeypatch):
    """The similarity fallback memoizes child fingerprints per entity
    (invalidated on mutation): merging n unmatched sources into n targets
    must fingerprint O(n) times, not O(n^2) — the pre-fix shape recomputed
    every candidate's fingerprints for every source."""
    import sparkdoc.merge as m

    calls = {"n": 0}
    real = m._child_fingerprints

    def counting(entity):
        calls["n"] += 1
        return real(entity)

    monkeypatch.setattr(m, "_child_fingerprints", counting)
    n = 300
    targets = [
        {"name": f"t{i}", "kids": [{"v": f"t{i}k"}]} for i in range(n)
    ]
    sources = [
        {"name": f"s{i}", "kids": [{"v": f"s{i}k"}]} for i in range(n)
    ]
    out = m._merge_entity_lists(
        targets, sources, "p", None, True, ("description",)
    )
    assert len(out) == 2 * n  # nothing matched; all appended
    # each existing entity fingerprinted at most once (cache) + one
    # fingerprint per source: well under the quadratic ~n^2/2 = 45000
    assert calls["n"] <= 4 * n, calls["n"]

    # cache invalidation: a mutated target's NEW fingerprint must be used
    # for the next source IN THE SAME CALL. s1 merges into t (j=2/3) and
    # grows it to {a,b,c}; s2={b,c} then matches the FRESH fingerprint
    # (j=2/3) but would miss the stale one (j({b,c},{a,b})=1/3 < 0.5).
    t = [{"kids": [{"v": "a"}, {"v": "b"}]}]
    s1 = {"kids": [{"v": "a"}, {"v": "b"}, {"v": "c"}]}
    s2 = {"kids": [{"v": "b"}, {"v": "c"}]}
    out2 = m._merge_entity_lists(t, [s1, s2], "p", None, True, ("description",))
    assert len(out2) == 1
    vals = {k["v"] for k in out2[0]["kids"]}
    assert vals == {"a", "b", "c"}
