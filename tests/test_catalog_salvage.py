"""NodeCatalog compilation + salvage fixer ladder unit tests (pure Python).

Ports the reference's behaviors: catalog walk rules (catalog.py:153-260),
projected fill schemas (catalog.py:326-358), bottom-up order, and the
llm_backend.py:224-855 fixer cases.
"""

from __future__ import annotations

from sparkdoc.catalog import (
    DEMO_TEMPLATE,
    bottom_up_path_order,
    build_node_catalog,
    build_projected_fill_schema,
    build_skeleton_semantic_guide,
    path_has_reference_fields,
)
from sparkdoc.salvage import (
    coerce_list_types,
    coerce_model_type_strings,
    coerce_quantities,
    coerce_string_types,
    drop_instances_missing_identity,
    fill_missing_required,
    salvage,
    validate,
)

# ---------------------------------------------------------------- catalog


def test_catalog_paths_and_parents():
    cat = build_node_catalog(DEMO_TEMPLATE)
    by = cat.spec_by_path()
    assert set(cat.paths()) == {"", "sections[]", "sections[].contracts[]", "contacts[]", "terms[]", "fees[]"}
    assert by["sections[].contracts[]"].parent_path == "sections[]"
    assert by["sections[]"].parent_path == ""
    assert by["sections[].contracts[]"].is_list and by["sections[]"].field_name == "sections"


def test_catalog_component_inlined_not_pathed():
    cat = build_node_catalog(DEMO_TEMPLATE)
    assert "meta" not in {s.field_name for s in cat.nodes if s.path}
    root_fields = {f.name for f in cat.spec_by_path()[""].fields}
    assert "meta.first_page_line" in root_fields  # component folded into parent schema


def test_catalog_reference_skipped_unless_included():
    cat = build_node_catalog(DEMO_TEMPLATE)
    assert not any(s.field_name == "reporter" for s in cat.nodes)
    assert dict(cat.spec_by_path()[""].reference_fields)["reporter"] == ("email",)
    cat2 = build_node_catalog(DEMO_TEMPLATE, include_references=True)
    assert any(s.field_name == "reporter" for s in cat2.nodes)


def test_catalog_recursion_pruned():
    t = {
        "class": "A",
        "id_fields": ["name"],
        "children": {
            "kids": {"list": True, "model": {"class": "A", "id_fields": ["name"]}},
            "b": {"list": False, "model": {"class": "B", "id_fields": ["name"]}},
        },
    }
    cat = build_node_catalog(t)
    assert set(cat.paths()) == {"", "b"}  # kids[] (A again) pruned


def test_bottom_up_order_deepest_first():
    cat = build_node_catalog(DEMO_TEMPLATE)
    order = bottom_up_path_order(cat)
    assert order.index("sections[].contracts[]") < order.index("sections[]")
    assert order[-1] == ""


def test_projected_schema_excludes_child_entity_fields():
    cat = build_node_catalog(DEMO_TEMPLATE)
    sec = build_projected_fill_schema(cat, cat.spec_by_path()["sections[]"])
    assert "contracts" not in sec["properties"]  # child entity field excluded
    assert "number" in sec["properties"]
    root = build_projected_fill_schema(cat, cat.spec_by_path()[""])
    assert root["properties"]["reporter"]["type"] == "reference"  # id-only projection
    assert path_has_reference_fields(cat.spec_by_path()[""])


def test_semantic_guide_truncates_at_budget():
    t = {"class": "X", "id_fields": ["name"], "description": "word " * 100}
    guide = build_skeleton_semantic_guide(build_node_catalog(t))
    assert "[…]" in guide and len(guide) < 360


# ---------------------------------------------------------------- salvage

SCHEMA = {
    "type": "object",
    "identity": ["name"],
    "required": ["name", "status"],
    "properties": {
        "name": {"type": "string"},
        "status": {"type": "enum", "enum": ["OPEN", "CLOSED", "OTHER"]},
        "count": {"type": "int"},
        "tags": {"type": "list", "items": {"type": "string"}},
        "weight": {"type": "quantity"},
        "owner": {"type": "object", "identity": ["name"], "required": ["name"],
                  "properties": {"name": {"type": "string"}}},
        "items": {
            "type": "list",
            "items": {
                "type": "object",
                "identity": ["sku"],
                "required": ["sku"],
                "properties": {"sku": {"type": "string"}, "qty": {"type": "int"}},
            },
        },
    },
}


def test_enum_default_prefers_other():
    data = {"name": "x"}
    errs = validate(data, SCHEMA)
    assert any(e["type"] == "missing" and e["loc"] == ("status",) for e in errs)
    assert fill_missing_required(data, errs, SCHEMA)
    assert data["status"] == "OTHER"


def test_scalar_to_string_coercion():
    data = {"name": 42, "status": "OPEN"}
    errs = validate(data, SCHEMA)
    assert coerce_string_types(data, errs)
    assert data["name"] == "42"


def test_none_string_becomes_empty():
    data = {"name": "x", "status": "OPEN", "owner": {"name": None}}
    # owner.name None → required missing error (None counts as missing)
    errs = validate(data, SCHEMA)
    assert any(e["type"] == "missing" for e in errs)


def test_list_coercion_literal_comma_and_wrap():
    d1 = {"name": "x", "status": "OPEN", "tags": "['a', 'b']"}
    coerce_list_types(d1, validate(d1, SCHEMA))
    assert d1["tags"] == ["a", "b"]
    d2 = {"name": "x", "status": "OPEN", "tags": "a, b"}
    coerce_list_types(d2, validate(d2, SCHEMA))
    assert d2["tags"] == ["a", "b"]
    d3 = {"name": "x", "status": "OPEN", "tags": "solo"}
    coerce_list_types(d3, validate(d3, SCHEMA))
    assert d3["tags"] == ["solo"]


def test_model_type_string_becomes_identity_only():
    data = {"name": "x", "status": "OPEN", "owner": "Jardin"}
    errs = validate(data, SCHEMA)
    assert coerce_model_type_strings(data, errs, SCHEMA)
    assert data["owner"] == {"name": "Jardin"}


def test_quantity_coercion():
    d = {"name": "x", "status": "OPEN", "weight": "12.5 kg"}
    coerce_quantities(d, validate(d, SCHEMA))
    assert d["weight"] == {"numeric_value": 12.5}
    d2 = {"name": "x", "status": "OPEN", "weight": "heavy"}
    coerce_quantities(d2, validate(d2, SCHEMA))
    assert d2["weight"] == {"text_value": "heavy"}


def test_drop_missing_identity_deepest_first_index_safe():
    # two list instances missing sku: both drop, and the deletions must not
    # shift each other (highest index first) — llm_backend.py:401-446
    data = {
        "name": "x",
        "status": "OPEN",
        "items": [{"qty": 1}, {"sku": "K-2"}, {"qty": 3}],
    }
    errs = validate(data, SCHEMA)
    assert drop_instances_missing_identity(data, errs, SCHEMA)
    assert data["items"] == [{"sku": "K-2"}]


def test_root_never_dropped_for_missing_identity():
    data = {"status": "OPEN"}
    errs = validate(data, SCHEMA)
    assert not drop_instances_missing_identity(data, errs, SCHEMA)


def test_generated_id_for_id_suffix_fields():
    schema = {
        "type": "object",
        "required": ["run_id"],
        "properties": {"run_id": {"type": "string"}, "note": {"type": "string"}},
    }
    data = {"note": "hello"}
    fill_missing_required(data, validate(data, schema), schema)
    assert data["run_id"].startswith("RUN-") and len(data["run_id"]) == 4 + 16


def test_full_ladder_converges_and_counts_passes():
    data = {
        "name": "x",
        "status": "OPEN",
        "count": "not-a-number",    # int_type → prune
        "tags": "a, b",             # list coercion
        "items": [{"qty": 2}],      # missing identity → instance drops (alone, round 1)
    }
    repaired, passes, terminal = salvage(data, SCHEMA)
    assert terminal == []
    assert repaired["tags"] == ["a", "b"]
    assert repaired["items"] == []
    assert "count" not in repaired
    assert 1 <= passes <= 3


def test_bogus_enum_pruned_then_refilled_with_default():
    data = {"name": "x", "status": "BOGUS"}
    repaired, passes, terminal = salvage(data, SCHEMA)
    assert terminal == [] and repaired["status"] == "OTHER" and passes == 2


def test_ladder_round_budget_is_a_real_bound():
    """Enough stacked error KINDS exhaust the 3 mutation rounds — the
    terminal error set is kept for audit (llm_backend.py:789-800), exactly
    like the reference (identity-drop consumes a full round alone)."""
    data = {
        "name": "x",
        "status": "BOGUS",          # prune round + refill round
        "count": "not-a-number",    # prune round (shared)
        "items": [{"qty": 2}],      # identity-drop round (alone)
        "tags": "a, b",
    }
    repaired, passes, terminal = salvage(data, SCHEMA)
    assert passes == 3 and terminal  # pruned 'status' never got its refill round


def test_ladder_terminal_error_set_kept():
    schema = {"type": "object", "required": ["name"], "identity": [],
              "properties": {"name": {"type": "string"}}}
    # name refilled as "" by fill_missing_required → validates; force terminal
    # with an unfixable shape instead: required field inside a non-dict
    data = "not an object"
    repaired, passes, terminal = salvage(data, schema)
    assert terminal and terminal[0]["type"] == "model_type"


def test_last_round_fixes_still_validated():
    """Fix applied on the final mutation round must still validate (the
    reference's one-more-validation-attempt rule)."""
    data = {"name": [], "status": "BOGUS", "count": []}
    repaired, passes, terminal = salvage(data, SCHEMA)
    # whatever the path taken, result is consistent: either valid or terminal
    if not terminal:
        assert isinstance(repaired.get("name", ""), str)


def test_bool_fields_are_salvageable(spark):
    """fill stringifies every value; bool-typed fields must accept
    'True'/'false'/'1' in lax mode or they are UNSALVAGEABLE (no coercer can
    turn a str into a bool instance) and every entity with one is dropped."""
    from sparkdoc.catalog import build_node_catalog
    from sparkdoc.salvage import salvage_entities

    template = {
        "class": "R", "id_fields": ["name"],
        "fields": {"active": {"type": "bool"}}, "children": {},
    }
    cat = build_node_catalog(template)
    ents = spark.createDataFrame(
        [
            ("d", "", "R", {"name": "x"}, {"active": "True"}, [0], "n1", -1),
            ("d", "", "R", {"name": "y"}, {"active": "false"}, [0], "n2", -1),
            ("d", "", "R", {"name": "z"}, {"active": "maybe"}, [0], "n3", -1),
        ],
        "doc_id string, path string, class string, ids map<string,string>, "
        "fields map<string,string>, chunk_ids array<int>, node_id string, fill_batch int",
    )
    out = {r["node_id"]: r for r in salvage_entities(ents, cat).collect()}
    # valid bool spellings survive WITHOUT a salvage pass (lax accept)…
    assert out["n1"]["valid"] == 1 and out["n1"]["salvage_passes"] == 0
    assert out["n1"]["fields"]["active"] == "True"
    assert out["n2"]["valid"] == 1 and out["n2"]["salvage_passes"] == 0
    # …while a non-bool spelling takes the ladder's optional-field prune
    # (previously EVERY spelling failed and the value was always pruned)
    assert out["n3"]["valid"] == 1 and out["n3"]["salvage_passes"] == 1
    assert "active" not in out["n3"]["fields"]


def test_list_string_dialect_validates(spark):
    """'list[string]' (the FieldSpec shorthand) must hit the list branch —
    previously it matched NO branch and passed through unvalidated."""
    from sparkdoc.salvage import validate

    assert validate(["a", "b"], {"type": "list[string]"}, ()) == []
    errs = validate("not-a-list", {"type": "list[string]"}, ())
    assert errs and errs[0]["type"] == "list_type"


def test_bracket_list_fallback_strips_brackets():
    """'[Alice, Bob]' (not a python literal) must split WITHOUT baking the
    brackets into the first/last elements."""
    from sparkdoc.salvage import coerce_list_types

    data = {"people": "[Alice, Bob]"}
    coerce_list_types(data, [{"type": "list_type", "loc": ("people",)}])
    assert data["people"] == ["Alice", "Bob"]


def test_nested_component_fields_fold_to_owner():
    """component-in-component scalar fields and references fold into the
    owning ENTITY's spec under dotted names (reference folds the whole
    component subtree, catalog.py:238-247)."""
    from sparkdoc.catalog import build_node_catalog

    template = {
        "class": "R", "id_fields": ["name"], "fields": {},
        "children": {
            "meta": {"list": False, "model": {
                "class": "Meta", "component": True, "fields": {"lang": {"type": "string"}},
                "children": {
                    "inner": {"list": False, "model": {
                        "class": "Inner", "component": True,
                        "fields": {"x": {"type": "string"}}, "children": {},
                    }},
                    "owner": {"list": False, "reference": True, "model": {
                        "class": "Party", "id_fields": ["email"], "fields": {},
                    }},
                },
            }},
            "parties": {"list": True, "model": {
                "class": "Party", "id_fields": ["email"], "fields": {}, "children": {},
            }},
        },
    }
    cat = build_node_catalog(template)
    root = cat.spec_by_path()[""]
    fnames = {f.name for f in root.fields}
    assert {"meta.lang", "meta.inner.x"} <= fnames
    ref_names = {fname for fname, _ in root.reference_fields}
    assert "meta.owner" in ref_names
    assert dict(root.reference_classes)["meta.owner"] == "Party"


def test_multi_id_root_rescued_on_primary(spark):
    """A root spec with TWO id fields: the stem/doc_id fills only the
    primary; the rescue must still flip valid (the secondary has no
    deterministic source — requiring it made every such root invalid)."""
    from sparkdoc.catalog import build_node_catalog
    from sparkdoc.rootid import rescue_invalid_roots

    template = {"class": "R", "id_fields": ["name", "code"], "fields": {}, "children": {}}
    cat = build_node_catalog(template)
    rows = [
        ("doc-1", "", "R", {"name": "doc-1"}, 0,
         ["missing_required:code"]),
        ("doc-2", "", "R", {}, 0,
         ["missing_required:name", "missing_required:code"]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, path string, class string, ids map<string,string>, "
        "valid int, errors array<string>",
    )
    out = {r["doc_id"]: r for r in rescue_invalid_roots(df, cat).collect()}
    assert out["doc-1"]["valid"] == 1  # primary filled → rescued
    assert out["doc-2"]["valid"] == 1  # stem fallback fills primary → rescued
    assert out["doc-2"]["ids"]["name"] == "doc-2"


def test_root_id_equal_to_doc_id_survives_echo_strip(spark):
    """A document whose doc_id squashes to the root class name must NOT lose
    its root id to the class-echo strip (the value IS the doc_id — ground
    truth, not a hallucinated echo)."""
    from sparkdoc.rootid import strip_mislabeled_root_ids

    ents = spark.createDataFrame(
        [
            ("report", "", "Report", {"name": "report"}),   # ground truth kept
            ("doc-9", "", "Report", {"name": "Report"}),    # true echo cleared
        ],
        "doc_id string, path string, class string, ids map<string,string>",
    )
    out = {r["doc_id"]: dict(r["ids"]) for r in strip_mislabeled_root_ids(ents).collect()}
    assert out["report"] == {"name": "report"}
    assert out["doc-9"] == {}
