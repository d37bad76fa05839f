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
