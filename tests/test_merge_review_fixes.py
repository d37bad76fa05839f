"""Regression tests for the round-3 focused review of merge/provenance/resolve.

Each test pins a behavior that was silently wrong (or nondeterministic):
input mutation, re-merge duplicate map keys, precedence-inconsistent winner
rows, skolemized provenance linkage, audit schema stability, null-path bucket
parents, and short-ledger fuzzy binds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdoc.merge import MergePolicy, deep_merge_dicts, merge_graphs_policy


def _graph(spark, rows, edges=()):
    n = spark.createDataFrame(
        rows,
        "node_id string, doc_id string, node_class string, label string, "
        "attrs map<string,string>, provenance string",
    )
    e = spark.createDataFrame(
        list(edges), "src string, dst string, label string, props map<string,string>"
    )
    return n, e


class TestDeepMergeInputsUntouched:
    def test_extra_not_mutated_and_result_not_aliased(self):
        extra = {"items": [{"name": "a"}, {"name": "a", "desc": "x"}]}
        base = {"items": [{"name": "b"}]}
        out = deep_merge_dicts(base, extra, identity_fields_map={"items": ["name"]})
        # the two 'a' entities merged into one result entity...
        assert extra == {"items": [{"name": "a"}, {"name": "a", "desc": "x"}]}
        assert base == {"items": [{"name": "b"}]}
        # ...and mutating the result must not leak back into extra
        for item in out["items"]:
            item["poison"] = True
        assert all("poison" not in i for i in extra["items"])


class TestRemergeDuplicateKeys:
    def test_keep_all_remerge_does_not_raise(self, spark):
        """A previous merge's __conflicts__ attr must not collide with the
        fresh packing (Spark's default map-key dedup policy is EXCEPTION)."""
        a = _graph(spark, [("n1", "d", "C", "x", {"k": "v1", "__conflicts__": "[old]"}, None)])
        b = _graph(spark, [("n1", "d", "C", "x", {"k": "v2"}, None)])
        out = merge_graphs_policy([a, b], MergePolicy(conflicts="keep_all"))
        row = out["nodes"].collect()[0]
        assert row["attrs"]["k"] == "v1"
        assert "old" not in row["attrs"]["__conflicts__"]  # fresh packing won


class TestRichestWinsWholeRow:
    def test_label_follows_richest_input(self, spark):
        a = _graph(spark, [("n1", "d", "C", "stub", {"k": "v"}, None)])
        b = _graph(
            spark,
            [("n1", "d", "C", "Full Title", {"k": "w", "x": "1", "y": "2"}, "prov-b")],
        )
        out = merge_graphs_policy([a, b], MergePolicy(precedence="richest"))
        row = out["nodes"].collect()[0]
        assert row["label"] == "Full Title"  # winner row, not just winner attrs
        assert row["attrs"]["k"] == "w"

    def test_input_order_still_wins_by_default(self, spark):
        a = _graph(spark, [("n1", "d", "C", "first", {"k": "v"}, None)])
        b = _graph(spark, [("n1", "d", "C", "second", {"k": "w", "x": "1"}, None)])
        out = merge_graphs_policy([a, b])  # precedence='input_order'
        assert out["nodes"].collect()[0]["label"] == "first"


class TestEdgePropsDeterministic:
    def test_lowest_input_props_win(self, spark):
        a = _graph(
            spark,
            [("n1", "d", "C", "x", {}, None), ("n2", "d", "C", "y", {}, None)],
            [("n1", "n2", "REL", {"w": "1"})],
        )
        b = _graph(
            spark,
            [("n1", "d", "C", "x", {}, None), ("n2", "d", "C", "y", {}, None)],
            [("n1", "n2", "REL", {"w": "2"})],
        )
        for _ in range(3):  # stable across repeated runs
            out = merge_graphs_policy([a, b])
            e = out["edges"].collect()
            assert len(e) == 1 and e[0]["props"]["w"] == "1"


class TestSkolemizedAudit:
    def test_schema_stable_across_flag(self, spark):
        a = _graph(spark, [("n1", "dA", "C", "dA", {}, None)])
        b = _graph(spark, [("n1", "dB", "C", "dB", {}, None)])
        cols_on = set(merge_graphs_policy([a, b], skolemize=True)["skolemized"].columns)
        cols_off = set(merge_graphs_policy([a, b], skolemize=False)["skolemized"].columns)
        assert cols_on == cols_off == {
            "original_id", "skolemized_id", "document_id", "input_index",
        }

    def test_ledger_identity_follows_skolemized_root(self, spark):
        """bind_provenance rung 1 binds on identity_key == node_id — a
        skolemized root's ledger rows must carry the NEW id."""
        from sparkdoc.schemas import LEDGER

        a = _graph(spark, [("rootX", "dA", "C", "dA", {}, None)])
        b = _graph(spark, [("rootX", "dB", "C", "dB", {}, None)])
        led = lambda doc: spark.createDataFrame(  # noqa: E731
            [(doc, "rootX", "", {"id": "rootX"}, [(0, "verbatim", [0, 5])])], LEDGER
        )
        out = merge_graphs_policy([a, b], ledgers=[led("dA"), led("dB")], skolemize=True)
        audit = {r["document_id"]: r for r in out["skolemized"].collect()}
        assert audit  # a collision was skolemized
        ledger_keys = {(r["doc_id"], r["identity_key"]) for r in out["ledger"].collect()}
        node_ids = {r["node_id"] for r in out["nodes"].collect()}
        # every ledger identity still names a live node (old id would dangle)
        for doc, r in audit.items():
            assert (doc, r["skolemized_id"]) in ledger_keys
            assert r["skolemized_id"] in node_ids


    def test_partial_ledger_list_merges_present_sidecars(self, spark):
        """ledgers is index-aligned with inputs and may carry None entries
        (an input produced without a sidecar): the present ledgers merge and
        skolem-remap by THEIR index; None no longer forces all-or-nothing."""
        from sparkdoc.schemas import LEDGER

        a = _graph(spark, [("rootX", "dA", "C", "dA", {}, None)])
        b = _graph(spark, [("rootX", "dB", "C", "dB", {}, None)])
        led_b = spark.createDataFrame(
            [("dB", "rootX", "", {"id": "rootX"}, [(0, "verbatim", [0, 5])])], LEDGER
        )
        out = merge_graphs_policy([a, b], ledgers=[None, led_b], skolemize=True)
        assert out["ledger"] is not None
        rows = out["ledger"].collect()
        assert {r["doc_id"] for r in rows} == {"dB"}
        # dB root was skolemized at input_index 1 -> its ledger row follows
        audit = {r["document_id"]: r["skolemized_id"] for r in out["skolemized"].collect()}
        if "dB" in audit:
            assert {r["identity_key"] for r in rows} == {audit["dB"]}


class TestResolveNullParentPath:
    def test_null_parent_path_stays_unresolved(self, spark):
        from sparkdoc.resolve import resolve_parents

        children = spark.createDataFrame(
            [("d", "c1", None, "nobody", [0], 0)],
            "doc_id string, child_id string, parent_path string, parent_key string, "
            "chunk_ids array<int>, emission int",
        )
        parents = spark.createDataFrame(
            [],
            "doc_id string, node_id string, path string, label string, "
            "chunk_ids array<int>, emission int",
        )
        r = resolve_parents(children, parents).collect()[0]
        # concat null-propagation must not yield resolved_by='bucket' with a
        # NULL parent — unresolved means BOTH fields null
        assert r["parent_id"] is None and r["resolved_by"] is None

    def test_real_path_still_gets_bucket(self, spark):
        from sparkdoc.resolve import resolve_parents

        children = spark.createDataFrame(
            [("d", "c1", "sections[]", "nobody", [0], 0)],
            "doc_id string, child_id string, parent_path string, parent_key string, "
            "chunk_ids array<int>, emission int",
        )
        parents = spark.createDataFrame(
            [],
            "doc_id string, node_id string, path string, label string, "
            "chunk_ids array<int>, emission int",
        )
        r = resolve_parents(children, parents).collect()[0]
        assert r["parent_id"] == "BUCKET_d_sections[]" and r["resolved_by"] == "bucket"


class TestShortLedgerNeverFuzzyBinds:
    def test_two_char_ledger_identity_refused(self, spark):
        """The len>=3 containment guard applies to the LEDGER side too: a
        2-char canonical would containment-match nearly any node text."""
        from sparkdoc.provenance import bind_provenance
        from sparkdoc.schemas import LEDGER

        nodes = spark.createDataFrame(
            [("N_1", "d", "C", "Santiago", {"name": "Santiago"}, "p[]")],
            "node_id string, doc_id string, node_class string, label string, "
            "ids map<string,string>, path string",
        )
        ledger = spark.createDataFrame(
            [("d", "L_1", "p[]", {"name": "sa"}, [(0, "observed", [0, 2])])], LEDGER
        )
        import json

        bound, _stats = bind_provenance(nodes, ledger)
        prov = json.loads(bound.collect()[0]["provenance"])
        # 'sa' ⊂ 'santiago' must NOT fuzzy-bind: unresolved, never wrong
        assert prov.get("status") == "unresolved"


class TestAnchorScanFoldSafety:
    def test_length_changing_fold_never_misaligns_spans(self, spark):
        from sparkdoc.provenance import anchor_scan

        # U+0130 lowercases to 2 codepoints — offsets computed on lower(text)
        # would be shifted right of the fold point
        text = "İstanbul report code ZX-9981 end"
        chunks = spark.createDataFrame(
            [("d", 0, text)], "doc_id string, chunk_id int, text string"
        )
        ents = spark.createDataFrame(
            [("d", "N_1", {"code": "ZX-9981"})],
            "doc_id string, node_id string, ids map<string,string>",
        )
        rows = anchor_scan(ents, chunks).collect()
        assert rows, "case-sensitive fallback should still find the exact value"
        r = rows[0]
        assert text[r["start"] : r["end"]] == "ZX-9981"
