"""Round-2 parity additions: root-identity resolve/repair micro-passes,
cross-batch negative-handle resolution, reconciliation call batching, and the
§2.11 extension registry slots.

Reference cases mirrored:
  repair_root_identity         core/utils/root_identity.py:67-110
  _resolve_root_identity       dense/orchestrator.py:1867-1952
  negative handles             tests/unit/.../test_orchestrator.py:2878-3057
  reconciliation batching      dense/orchestrator.py:1775-1790
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdoc.catalog import build_node_catalog

TEMPLATE = {
    "class": "Report",
    "id_fields": ["reference_code"],
    "fields": {},
    "children": {},
}


def _entities(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, path string, class string, ids map<string,string>"
    )


# --------------------------------------------------------------------------
# repair_root_identity
# --------------------------------------------------------------------------


class TestRepairRootIdentity:
    def test_echo_cleared_then_stem_fallback(self, spark):
        from sparkdoc.rootid import repair_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = _entities(spark, [("doc-7", "", "Report", {"reference_code": "Report"})])
        out = repair_root_identity(ents, cat).collect()[0]
        # the echo is schema noise; after clearing, the stem fallback fires
        assert out["ids"]["reference_code"] == "doc-7"

    def test_partial_identity_never_touched(self, spark):
        from sparkdoc.rootid import repair_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = _entities(spark, [("doc-7", "", "Report", {"reference_code": "REF-1"})])
        out = repair_root_identity(ents, cat).collect()[0]
        assert out["ids"]["reference_code"] == "REF-1"

    def test_non_root_rows_pass_through(self, spark):
        from sparkdoc.rootid import repair_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = _entities(spark, [("d", "sections[]", "Section", {"name": "Section"})])
        out = repair_root_identity(ents, cat).collect()[0]
        # even a class-name echo survives on a NON-root row (root-only repair)
        assert out["ids"]["name"] == "Section"

    def test_overlong_stem_refused(self, spark):
        from sparkdoc.rootid import repair_root_identity

        cat = build_node_catalog(TEMPLATE)
        long_doc = "x" * 100
        ents = _entities(spark, [(long_doc, "", "Report", {})])
        out = repair_root_identity(ents, cat).collect()[0]
        assert "reference_code" not in out["ids"]


# --------------------------------------------------------------------------
# resolve_root_identity
# --------------------------------------------------------------------------


def _excerpts(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, head_excerpt string, tail_excerpt string, furniture_excerpt string",
    )


class TestResolveRootIdentity:
    def test_anchored_code_accepted_from_furniture(self, spark):
        from sparkdoc.rootid import resolve_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = _entities(spark, [("d1", "", "Report", {})])
        ex = _excerpts(spark, [("d1", "Welcome to the annual report.", "", "POL-2024A page 3")])
        out = resolve_root_identity(ents, ex, cat).collect()[0]
        assert out["ids"]["reference_code"] == "POL-2024A"

    def test_filled_identity_not_overwritten(self, spark):
        from sparkdoc.rootid import resolve_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = _entities(spark, [("d1", "", "Report", {"reference_code": "KEEP-ME1"})])
        ex = _excerpts(spark, [("d1", "REF-9999 header", "", "")])
        out = resolve_root_identity(ents, ex, cat).collect()[0]
        assert out["ids"]["reference_code"] == "KEEP-ME1"

    def test_unanchored_proposal_refused(self, spark):
        from sparkdoc.rootid import resolve_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = _entities(spark, [("d1", "", "Report", {})])
        ex = _excerpts(spark, [("d1", "no codes here", "", "")])
        props = spark.createDataFrame(
            [("d1", "reference_code", "HALLUCINATED-1")], "doc_id string, field string, value string"
        )
        out = resolve_root_identity(ents, ex, cat, proposals=props).collect()[0]
        assert "reference_code" not in out["ids"]

    def test_anchored_proposal_accepted(self, spark):
        from sparkdoc.rootid import resolve_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = _entities(spark, [("d1", "", "Report", {})])
        # anchor tolerates spacing/punctuation differences (squash containment)
        ex = _excerpts(spark, [("d1", "Ref: pol 2024 a", "", "")])
        props = spark.createDataFrame(
            [("d1", "reference_code", "POL-2024A")], "doc_id string, field string, value string"
        )
        out = resolve_root_identity(ents, ex, cat, proposals=props).collect()[0]
        assert out["ids"]["reference_code"] == "POL-2024A"

    def test_overlong_value_refused(self, spark):
        from sparkdoc.rootid import resolve_root_identity

        cat = build_node_catalog(TEMPLATE)
        long_code = "AB-" + "X" * 90
        ents = _entities(spark, [("d1", "", "Report", {})])
        ex = _excerpts(spark, [("d1", f"code {long_code} here", "", "")])
        props = spark.createDataFrame(
            [("d1", "reference_code", long_code)], "doc_id string, field string, value string"
        )
        out = resolve_root_identity(ents, ex, cat, proposals=props).collect()[0]
        assert "reference_code" not in out["ids"]

    def test_proposer_extension_slot(self, spark):
        from sparkdoc.extension import Extensions
        from sparkdoc.rootid import resolve_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = _entities(spark, [("d1", "", "Report", {})])
        ex = _excerpts(spark, [("d1", "header REF-777 text", "", "")])
        def take_ref(excerpt: str, field: str):
            import re

            m = re.search(r"\b(REF-\d+)\b", excerpt or "")
            return m.group(1) if m else None

        exts = Extensions(root_id_proposer=take_ref)
        out = resolve_root_identity(ents, ex, cat, extensions=exts).collect()[0]
        assert out["ids"]["reference_code"] == "REF-777"


# --------------------------------------------------------------------------
# resolve_batch_handles (negative-handle window)
# --------------------------------------------------------------------------


def _emissions(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id string, batch_index int, emission int, handle int, "
        "parent_handle int, path string, ids map<string,string>",
    )


class TestBatchHandles:
    def test_local_positive_handle(self, spark):
        from sparkdoc.resolve import resolve_batch_handles

        df = _emissions(
            spark,
            [
                ("d", 0, 0, 1, None, "sections[]", {"name": "S1"}),
                ("d", 0, 1, 2, 1, "sections[].contracts[]", {"code": "CT-1"}),
            ],
        )
        out = {r["ids"]["code"]: r for r in resolve_batch_handles(df).collect() if "code" in r["ids"]}
        r = out["CT-1"]
        assert r["parent_source"] == "local"
        assert r["parent_path"] == "sections[]"
        assert r["parent_ids"]["name"] == "S1"

    def test_negative_handle_resolves_against_prior_batch(self, spark):
        # mirror test_orchestrator.py:2921 — batch 1 parents onto batch 0's
        # most recent entity via -1
        from sparkdoc.resolve import resolve_batch_handles

        df = _emissions(
            spark,
            [
                ("d", 0, 0, 1, None, "sections[]", {"name": "S1"}),
                ("d", 0, 1, 2, None, "sections[]", {"name": "S2"}),
                ("d", 1, 0, 1, -1, "sections[].contracts[]", {"code": "CT-9"}),
                ("d", 1, 1, 2, -2, "sections[].contracts[]", {"code": "CT-8"}),
            ],
        )
        rows = {r["ids"].get("code"): r for r in resolve_batch_handles(df).collect()}
        assert rows["CT-9"]["parent_ids"]["name"] == "S2"  # -1 = most recent
        assert rows["CT-8"]["parent_ids"]["name"] == "S1"  # -2 = next
        assert rows["CT-9"]["parent_source"] == "already_found"

    def test_unknown_negative_handle_yields_no_parent(self, spark):
        # mirror test_orchestrator.py:2913
        from sparkdoc.resolve import resolve_batch_handles

        df = _emissions(
            spark,
            [("d", 0, 0, 1, -5, "sections[]", {"name": "S1"})],  # nothing before batch 0
        )
        r = resolve_batch_handles(df).collect()[0]
        assert r["parent_path"] is None and r["parent_source"] is None

    def test_window_depth_enforced(self, spark):
        from sparkdoc.resolve import resolve_batch_handles

        prior = [("d", 0, i, i + 1, None, "sections[]", {"name": f"S{i}"}) for i in range(60)]
        child_in = ("d", 1, 0, 1, -50, "c[]", {"code": "IN"})  # 50th most recent: inside
        child_out = ("d", 1, 1, 2, -51, "c[]", {"code": "OUT"})  # beyond the window
        rows = {
            r["ids"].get("code"): r
            for r in resolve_batch_handles(_emissions(spark, [*prior, child_in, child_out])).collect()
        }
        assert rows["IN"]["parent_ids"]["name"] == "S10"  # 60 prior, -50 → index 10
        assert rows["OUT"]["parent_path"] is None

    def test_local_handle_wins_over_window(self, spark):
        # "handles in the current response always win" — a batch-local node
        # declaring the same (negative) handle shadows the advertised map
        from sparkdoc.resolve import resolve_batch_handles

        df = _emissions(
            spark,
            [
                ("d", 0, 0, 1, None, "sections[]", {"name": "OLD"}),
                ("d", 1, 0, -1, None, "sections[]", {"name": "LOCAL"}),
                ("d", 1, 1, 2, -1, "c[]", {"code": "CT-1"}),
            ],
        )
        rows = {r["ids"].get("code"): r for r in resolve_batch_handles(df).collect()}
        assert rows["CT-1"]["parent_ids"]["name"] == "LOCAL"
        assert rows["CT-1"]["parent_source"] == "local"


# --------------------------------------------------------------------------
# reconciliation batching
# --------------------------------------------------------------------------


class TestReconcileBatches:
    def _ents(self, spark, n_per_path: dict[str, int]):
        rows = []
        for path, n in n_per_path.items():
            for i in range(n):
                rows.append(("d", path, "C", {"name": f"{path}-{i:03d}"}, [i], f"n{path}{i:03d}"))
        return spark.createDataFrame(
            rows,
            "doc_id string, path string, class string, ids map<string,string>, "
            "chunk_ids array<int>, node_id string",
        )

    def test_small_doc_single_combined_scope(self, spark):
        from sparkdoc.dedup import assign_reconcile_batches

        out = assign_reconcile_batches(self._ents(spark, {"a[]": 3, "b[]": 4}))
        got = {r["reconcile_batch"] for r in out.collect()}
        assert got == {"__combined__"}

    def test_large_doc_splits_per_path(self, spark):
        from sparkdoc.dedup import assign_reconcile_batches

        out = assign_reconcile_batches(self._ents(spark, {"a[]": 150, "b[]": 30})).collect()
        a = {r["reconcile_batch"] for r in out if r["path"] == "a[]"}
        b = {r["reconcile_batch"] for r in out if r["path"] == "b[]"}
        assert a == {"a[]#0", "a[]#1"} and b == {"b[]#0"}

    def test_singletons_and_root_excluded(self, spark):
        from sparkdoc.dedup import assign_reconcile_batches

        ents = self._ents(spark, {"a[]": 1, "": 1, "b[]": 2})
        out = assign_reconcile_batches(ents).collect()
        excl = [r for r in out if r["path"] in ("a[]", "")]
        assert all(r["reconcile_batch"] is None for r in excl)

    def test_batch_scoped_alias_proposals(self, spark):
        # pairs are only proposed within one call scope, as in the reference
        from sparkdoc.dedup import containment_alias_groups

        nodes = spark.createDataFrame(
            [
                ("n1", "C", "ACME", "b0"),
                ("n2", "C", "ACME Corporation", "b0"),
                ("n3", "C", "ACME Corporation Worldwide", "b1"),
            ],
            "node_id string, node_class string, label string, reconcile_batch string",
        )
        pairs = containment_alias_groups(
            nodes, scope_cols=("node_class", "reconcile_batch")
        ).collect()
        got = {(p["base_id"], p["superset_id"]) for p in pairs}
        assert ("n1", "n2") in got
        assert all(s != "n3" for _, s in got)  # cross-batch never proposed


# --------------------------------------------------------------------------
# fill extract_fields hardening branches
# --------------------------------------------------------------------------


class TestExtractFieldsHardening:
    def _cat(self, fields, context_text="ctx"):
        template = {
            "class": "Doc",
            "id_fields": ["name"],
            "fields": fields,
            "children": {},
        }
        return build_node_catalog(template)

    def test_malformed_user_regex_is_no_match_not_crash(self):
        from sparkdoc.fill import extract_fields

        cat = self._cat(
            {"bad": {"type": "string",
                     "rule": {"kind": "context", "pattern": r"(unclosed"}}}
        )
        out = extract_fields(cat.spec_by_path()[""], {"name": "x"}, "unclosed?", cat)
        assert "bad" not in out  # re.error swallowed, field simply absent

    def test_null_primary_id_value_does_not_crash_escape(self):
        from sparkdoc.fill import extract_fields

        cat = self._cat(
            {"near": {"type": "string",
                      "rule": {"kind": "context", "pattern": r"val={id}(\d+)"}}}
        )
        # ids key present but value None (schema-legal map value)
        out = extract_fields(cat.spec_by_path()[""], {"name": None}, "val=7", cat)
        assert out.get("near") == "7"  # {id} expands to '' and still matches

    def test_reference_alternation_nonparticipating_group_falls_back(self):
        from sparkdoc.fill import extract_fields

        template = {
            "class": "Doc",
            "id_fields": ["name"],
            "fields": {},
            "children": {
                "items": {
                    "list": True,
                    "model": {
                        "class": "Item",
                        "id_fields": ["code"],
                        "discover": r"ITEM-(\d+)|FALLBACK",
                        "fields": {},
                    },
                },
                "main_item": {
                    "list": False,
                    "reference": True,
                    "model": {"class": "Item", "id_fields": ["code"]},
                },
            },
        }
        cat = build_node_catalog(template)
        spec = cat.spec_by_path()[""]
        out = extract_fields(spec, {"name": "d"}, "see FALLBACK here", cat)
        # group 1 did not participate -> whole-match fallback, not a crash/None
        assert out.get("main_item") == "FALLBACK"


def test_alias_confirm_invoked_once_per_pair(spark, tmp_path):
    """confirm_alias_pairs feeds apply_alias_merges, whose transitive-closure
    loop self-joins the pair plan 3x — without lineage truncation the user
    confirm callable (a real LLM adapter) re-executes per plan copy, with
    copies free to DISAGREE. Pin: exactly one invocation per candidate pair
    across the whole merge, counted via a file the executor workers append."""
    from sparkdoc.dedup import apply_alias_merges
    from sparkdoc.extension import confirm_alias_pairs
    from sparkdoc.schemas import EDGES, NODES

    calls_log = str(tmp_path / "confirm_calls.log")

    def confirm(base: str, sup: str) -> bool:
        with open(calls_log, "a") as f:
            f.write(f"{base}|{sup}\n")
        return True

    nodes = spark.createDataFrame(
        [
            ("N_base", "d1", "T", "Annex 2", {"name": "Annex 2"}, None),
            ("N_sup", "d1", "T", "Annex 2 Technical", {"name": "Annex 2 Technical"}, None),
        ],
        NODES,
    )
    edges = spark.createDataFrame([("N_sup", "N_base", "refs", None)], EDGES)
    pairs = spark.createDataFrame(
        [("N_base", "N_sup", "Annex 2", "Annex 2 Technical")],
        "base_id string, superset_id string, base_label string, superset_label string",
    )
    confirmed = confirm_alias_pairs(pairs, confirm)
    n2, e2, audit = apply_alias_merges(nodes, edges, confirmed)
    n2.collect()
    e2.collect()
    audit.collect()
    with open(calls_log) as f:
        calls = [ln for ln in f.read().splitlines() if ln]
    assert calls == ["Annex 2|Annex 2 Technical"]  # once, not once per plan copy


def test_run_validators_wraps_plain_string_return(spark):
    """A validator returning a bare string (instead of a list) must yield ONE
    error, not one cryptic error per character."""
    from sparkdoc.extension import Extensions, run_validators

    exts = Extensions()
    exts.register_validator("Doc", lambda e: "missing id" if not e.get("id") else [])
    out = run_validators([{"id": ""}, {"id": "ok"}], "Doc", exts)
    assert out == [["missing id"], []]


def _upper_field(ids: dict, context: str):
    return (ids.get("name") or "").upper()


def _shout_summary(parts, max_length):
    return "SUMMARY: " + " | ".join(parts)


def _table_serializer(span: dict):
    return f"[TABLE {span['text']}]" if span["kind"] == "table" else span["text"]


class TestExtensionSlots:
    def test_field_extractor_fills_rule_less_field(self):
        from sparkdoc.extension import Extensions
        from sparkdoc.fill import extract_fields

        template = {
            "class": "Report",
            "id_fields": ["name"],
            "fields": {"shout": {"type": "string"}},  # no rule → §2.11 slot
            "children": {},
        }
        cat = build_node_catalog(template)
        exts = Extensions()
        exts.register_field_extractor("Report", "shout", _upper_field)
        out = extract_fields(cat.spec_by_path()[""], {"name": "acme"}, "ctx", cat, exts)
        assert out["shout"] == "ACME"

    def test_alias_confirm_vetoes(self, spark):
        from sparkdoc.dedup import containment_alias_groups
        from sparkdoc.extension import confirm_alias_pairs

        nodes = spark.createDataFrame(
            [("n1", "C", "CONFORT"), ("n2", "C", "CONFORT PLUS")],
            "node_id string, node_class string, label string",
        )
        pairs = containment_alias_groups(nodes)
        assert pairs.count() == 1

        def veto_all(base: str, sup: str) -> bool:
            return False

        assert confirm_alias_pairs(pairs, veto_all).count() == 0

    def test_description_summarizer_slot(self):
        from sparkdoc.merge import merge_descriptions

        out = merge_descriptions(["First.", "Second."], 1000, summarizer=_shout_summary)
        assert out.startswith("SUMMARY: First.")

    def test_chunk_serializer_slot(self):
        from sparkdoc.chunker import chunk_spans

        spans = [
            {"kind": "text", "text": "Intro paragraph.", "media_ref": None, "offset": 0},
            {"kind": "table", "text": "a|b", "media_ref": None, "offset": 1},
        ]
        chunks = chunk_spans(spans, serializer=_table_serializer)
        assert any("[TABLE a|b]" in c["text"] for c in chunks)

    def test_template_validator_gates_validity(self, spark):
        from sparkdoc.extension import Extensions
        from sparkdoc.salvage import salvage_entities

        template = {"class": "Report", "id_fields": ["name"], "fields": {}, "children": {}}
        cat = build_node_catalog(template)
        def require_digit(entity: dict):
            name = entity.get("name") or ""
            return [] if any(ch.isdigit() for ch in name) else ["name_needs_digit"]

        exts = Extensions()
        exts.register_validator("Report", require_digit)
        ents = spark.createDataFrame(
            [
                ("d", "", "Report", {"name": "Plan 9"}, {}, [0], "n1", -1),
                ("d", "", "Report", {"name": "NoDigits"}, {}, [0], "n2", -1),
            ],
            "doc_id string, path string, class string, ids map<string,string>, "
            "fields map<string,string>, chunk_ids array<int>, node_id string, fill_batch int",
        )
        out = {r["node_id"]: r for r in salvage_entities(ents, cat, extensions=exts).collect()}
        assert out["n1"]["valid"] == 1
        assert out["n2"]["valid"] == 0 and "name_needs_digit" in out["n2"]["errors"]


class TestEdgeLabelMetadata:
    def test_explicit_edge_label_carried_on_spec(self):
        # graph_converter._get_edge_label (graph_converter.py:717,753):
        # explicit field metadata overrides the field name as edge label
        template = {
            "class": "Report",
            "id_fields": ["name"],
            "fields": {},
            "children": {
                "sections": {
                    "list": True,
                    "edge_label": "HAS_SECTION",
                    "model": {"class": "Section", "id_fields": ["name"], "fields": {}, "children": {}},
                },
                "contacts": {
                    "list": True,
                    "model": {"class": "Contact", "id_fields": ["email"], "fields": {}, "children": {}},
                },
            },
        }
        cat = build_node_catalog(template)
        by = cat.spec_by_path()
        assert by["sections[]"].edge_label == "HAS_SECTION"
        assert by["contacts[]"].edge_label == ""  # falls back to field name


class TestBatchHandlesDifferential:
    def test_random_corpus_matches_python_model(self, spark):
        """Seeded random emissions vs a direct transcription of the
        reference's two-pass resolution (_skeleton_ledger_key +
        _reference_handle_prompt window semantics)."""
        import random

        from sparkdoc.resolve import ALREADY_FOUND_WINDOW, resolve_batch_handles

        rng = random.Random(7)
        rows = []
        for doc in ("dA", "dB", "dC"):
            n_batches = rng.randint(1, 5)
            for b in range(n_batches):
                n = rng.randint(1, 12)
                for e in range(n):
                    handle = rng.choice([None, e + 1, e + 1, rng.randint(-3, 15)])
                    p = rng.choice([None, None, rng.randint(-60, 14)])
                    rows.append((doc, b, e, handle, p, f"p{rng.randint(0,2)}",
                                 {"k": f"{doc}-{b}-{e}"}))

        # python model (reference semantics)
        expected = {}
        by_doc: dict[str, list] = {}
        for doc in sorted({r[0] for r in rows}):
            doc_rows = sorted([r for r in rows if r[0] == doc], key=lambda r: (r[1], r[2]))
            entries: list[tuple[str, dict]] = []
            for b in sorted({r[1] for r in doc_rows}):
                batch = [r for r in doc_rows if r[1] == b]
                by_handle = {}
                for r in batch:
                    if r[3] is not None and r[3] not in by_handle:
                        by_handle[r[3]] = r
                window = entries[-ALREADY_FOUND_WINDOW:]
                known = {-(pos + 1): ent for pos, ent in enumerate(reversed(window))}
                for r in batch:
                    p = r[4]
                    parent = None
                    src = None
                    if p is not None and p in by_handle and by_handle[p] is not r:
                        t = by_handle[p]
                        parent, src = (t[5], t[6]["k"]), "local"
                    elif p is not None and p in known:
                        parent, src = known[p], "already_found"
                    expected[(r[0], r[6]["k"])] = (parent, src)
                entries.extend((r[5], r[6]["k"]) for r in batch)
            by_doc[doc] = entries

        df = spark.createDataFrame(
            rows,
            "doc_id string, batch_index int, emission int, handle int, "
            "parent_handle int, path string, ids map<string,string>",
        )
        got = resolve_batch_handles(df).collect()
        assert len(got) == len(rows)
        for r in got:
            key = (r["doc_id"], r["ids"]["k"])
            exp_parent, exp_src = expected[key]
            got_parent = (
                (r["parent_path"], r["parent_ids"]["k"]) if r["parent_path"] is not None else None
            )
            assert got_parent == exp_parent, (key, got_parent, exp_parent)
            assert r["parent_source"] == exp_src, (key, r["parent_source"], exp_src)


class TestReviewFixes:
    """Regression tests for the round-2 review findings."""

    def test_salvage_keeps_reference_field_strings(self, spark):
        # a filled reference field is the bare target-id string; the ladder
        # must NOT rewrite it into a typed model dict (build_catalog_edges
        # keys the edge dst on the raw value)
        from sparkdoc.extractor import demo_catalog
        from sparkdoc.salvage import salvage_entities

        ents = spark.createDataFrame(
            [("d", "", "Report", {"name": "d"}, {"reporter": "alice@acme.com"}, [0], "n1", -1)],
            "doc_id string, path string, class string, ids map<string,string>, "
            "fields map<string,string>, chunk_ids array<int>, node_id string, fill_batch int",
        )
        out = salvage_entities(ents, demo_catalog()).collect()[0]
        assert out["fields"]["reporter"] == "alice@acme.com"
        assert out["valid"] == 1 and out["salvage_passes"] == 0

    def test_discover_pattern_without_capture_group(self, spark):
        from sparkdoc.catalog import build_node_catalog
        from sparkdoc.extractor import discover_entities

        template = {
            "class": "R", "id_fields": ["name"], "fields": {},
            "children": {
                "codes": {"list": True, "model": {
                    "class": "Code", "id_fields": ["code"],
                    "discover": r"\bCT-\d{4}\b",  # no parens: group 0 contract
                    "fields": {},
                }},
            },
        }
        chunks = spark.createDataFrame(
            [("d", 0, "see CT-1234 here", 4)],
            "doc_id string, chunk_id int, text string, token_count int",
        )
        rows = discover_entities(chunks, build_node_catalog(template)).collect()
        assert rows and rows[0]["ids"]["code"] == "CT-1234"

    def test_one_to_one_ids_carry_no_separator(self, spark):
        from sparkdoc.extractor import one_to_one_extract
        from sparkdoc.spans import explode_spans, extract_documents
        from sparkdoc.synth import raw_nodes_df

        spans = explode_spans(extract_documents(raw_nodes_df(spark, 4, 11, partitions=1)))
        out = one_to_one_extract(spans).collect()
        assert out
        for r in out:
            assert "\x1f" not in r["doc_id"]
            for v in r["ids"].values():
                assert "\x1f" not in v

    def test_closed_catalog_field_compiled_and_marked(self):
        from sparkdoc.catalog import DEMO_TEMPLATE, build_node_catalog

        cat = build_node_catalog(DEMO_TEMPLATE)
        root = cat.spec_by_path()[""]
        assert root.closed_catalog_fields == ("reporter",)

    def test_merge_graphs_legacy_shape_via_policy(self, spark):
        from sparkdoc.merge import merge_graphs

        def g(rows):
            n = spark.createDataFrame(
                rows,
                "node_id string, doc_id string, node_class string, label string, "
                "attrs map<string,string>, provenance string",
            )
            e = spark.createDataFrame(
                [], "src string, dst string, label string, props map<string,string>"
            )
            return n, e

        a = g([("n1", "d", "C", "x", {"k": "v1"}, None)])
        b = g([("n1", "d", "C", "x", {"k": "v2"}, None)])
        nodes, edges, conflicts = merge_graphs([a, b])
        row = nodes.collect()[0]
        assert row["attrs"]["k"] == "v1"  # input order wins
        c = conflicts.collect()[0]
        assert (c["node_id"], c["attr"], c["n_variants"]) == ("n1", "k", 2)


class TestRepairRekeysNodeId:
    def test_node_id_recomputed_after_repair(self, spark):
        """node_id = hash(class+ids) with NO doc component: two docs whose
        root ids echo the class name must NOT share one node_id after the
        echo-clear + stem fallback (the repair mutates ids, so keeping the
        stale node_id collapses cross-document roots into a single node and
        breaks the registry invariant behind reference-edge derivation)."""
        from sparkdoc.dedup import with_node_ids
        from sparkdoc.rootid import repair_root_identity

        cat = build_node_catalog(TEMPLATE)
        ents = with_node_ids(
            _entities(
                spark,
                [
                    ("doc-1", "", "Report", {"reference_code": "Report"}),
                    ("doc-2", "", "Report", {"reference_code": "REPORT"}),
                ],
            )
        )
        before = {r["doc_id"]: r["node_id"] for r in ents.collect()}
        assert before["doc-1"] == before["doc-2"]  # the collapse hazard
        out = {r["doc_id"]: r for r in repair_root_identity(ents, cat).collect()}
        assert out["doc-1"]["ids"]["reference_code"] == "doc-1"
        assert out["doc-2"]["ids"]["reference_code"] == "doc-2"
        assert out["doc-1"]["node_id"] != out["doc-2"]["node_id"]
        assert out["doc-1"]["node_id"] != before["doc-1"]  # rekeyed, not stale


class TestRescueInvalidRoots:
    def _validated(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "doc_id string, path string, class string, ids map<string,string>, "
            "valid int, errors array<string>",
        )

    def test_stem_rescue_flips_valid(self, spark):
        """Salvage marks empty-id roots invalid; running the repair BEFORE
        the valid filter (reference order) lets the stem fallback rescue a
        root whose ONLY failure was the missing identity."""
        from sparkdoc.rootid import rescue_invalid_roots

        cat = build_node_catalog(TEMPLATE)
        rows = [
            ("doc-1", "", "Report", {}, 0, ["missing_required:reference_code"]),
            # invalid for another reason too: stays invalid
            ("doc-2", "", "Report", {}, 0,
             ["missing_required:reference_code", "string_type@title"]),
            # non-root rows untouched
            ("doc-1", "items[]", "Item", {}, 0, ["missing_required:sku"]),
        ]
        out = {
            (r["doc_id"], r["path"]): r
            for r in rescue_invalid_roots(self._validated(spark, rows), cat).collect()
        }
        rescued = out[("doc-1", "")]
        assert rescued["valid"] == 1
        assert rescued["ids"]["reference_code"] == "doc-1"
        assert rescued["errors"] == []
        assert out[("doc-2", "")]["valid"] == 0  # terminal error kept
        assert out[("doc-1", "items[]")]["valid"] == 0  # non-root untouched


class TestExtensionsWiring:
    """convert_document_graph(extensions=...) routes every registry slot
    (regression: alias_confirm / chunk_serializer / description_summarizer
    were registry fields no pipeline code ever read)."""

    def test_chunk_serializer_and_alias_confirm_reach_pipeline(self, spark):
        from sparkdoc.extension import Extensions
        from sparkdoc.extractor import convert_document_graph
        from sparkdoc.synth import raw_nodes_df

        # local defs: cloudpickle serializes closures by VALUE (a test-module
        # top-level function pickles by reference and is unimportable on
        # executors)
        def mark_serializer(span):  # per-span contract (chunk_spans)
            t = span.get("text") or ""
            return f"SERIALIZED::{t}" if t else None

        def reject_all(base_label, superset_label):
            return False

        raw = raw_nodes_df(spark, 12, 42, partitions=2)
        ext = Extensions(chunk_serializer=mark_serializer, alias_confirm=reject_all)
        out = convert_document_graph(raw, extensions=ext)
        texts = [r["text"] for r in out["chunks"].select("text").limit(20).collect()]
        assert texts and any("SERIALIZED::" in t for t in texts)
        # reject-all confirm: no alias merge may survive
        assert out["alias_audit"].count() == 0

    def test_merge_summarizer_slot(self, spark):
        from sparkdoc.merge import MergePolicy, merge_graphs_policy
        from sparkdoc.schemas import EDGES, NODES

        def summarizer(parts, max_length):
            return " // ".join(sorted(parts))[:max_length]

        n1 = spark.createDataFrame(
            [("N1", "d1", "T", "n1", {"description": "alpha", "name": "n1"}, None)], NODES
        )
        n2 = spark.createDataFrame(
            [("N1", "d2", "T", "n1", {"description": "beta", "name": "n1"}, None)], NODES
        )
        e = spark.createDataFrame([], EDGES)
        out = merge_graphs_policy(
            [(n1, e), (n2, e)],
            MergePolicy(precedence="input_order", conflicts="keep_first",
                        combine_fields=("description",)),
            skolemize=False,
            summarizer=summarizer,
        )
        desc = out["nodes"].collect()[0]["attrs"]["description"]
        assert desc == "alpha // beta"
