"""Pydantic template compiler: a reference user's template → this engine's
declarative dict template (catalog.build_node_catalog input), unchanged.

Reference conventions reproduced:
  model_config access           graph_converter.py:37-58 (get_model_config_value)
  is_entity / graph_id_fields   contracts/dense/catalog.py:34-55
  graph_reference fields        contracts/dense/catalog.py:58-74 — id-only
                                links filled by the parent, never discovered
  edge_label / closed catalog   graph_converter.py:824-853 (json_schema_extra
                                ``edge_label`` / ``reference_closed_catalog``)
  graph_max_instances           graph_converter.py:91-120 (cardinality bounds)
  recursion pruning             contracts/dense/catalog.py:221-228 (ancestry)

The reference template is a Pydantic ``BaseModel`` class tree; this engine's
native template is a plain dict (catalog.py docstring).  ``compile_template``
bridges them so a docling-graph user can hand their template class straight to
``convert_document_graph(template=compile_template(Invoice, rules=...))``.

What Pydantic templates do NOT carry — and this engine needs — are the
deterministic discover/fill rules that stand in for the LLM calls.  They come
from either:

* a ``rules`` overlay dict keyed by class name:
  ``{"Party": {"discover": r"...", "fields": {"tax_id": {...}}}}``; or
* engine-native metadata embedded in the template itself:
  ``model_config = ConfigDict(..., x_discover=r"...")`` and per-field
  ``Field(json_schema_extra={"x_rule": {"kind": "context", "pattern": ...}})``.

Without a rule a class is simply never skeleton-discovered (same behavior as
an empty ``discover`` in a native dict template).

The template's own Pydantic validators keep working: ``pydantic_validators``
wraps each entity class's ``model_validate`` (scalar fields only) as a
per-class validator for the ``Extensions.validators`` slot, so the generated
coercion/normalization validators (e.g. the golden invoice template's
numeric-string coercion) run as the final gate after the salvage ladder —
exactly where the reference runs them (llm_backend validation path).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import enum as _enum
import types as _types
import uuid as _uuid
from typing import Any, Callable, Union, get_args, get_origin

try:  # the engine runs fine without pydantic; the compiler needs it
    from pydantic import BaseModel
except ImportError:  # pragma: no cover
    BaseModel = None  # type: ignore[assignment]


def _require_pydantic() -> None:
    if BaseModel is None:  # pragma: no cover
        raise ImportError(
            "compile_template requires pydantic (the reference's template "
            "carrier). Install pydantic>=2 or author a native dict template."
        )


# --------------------------------------------------------------------------
# annotation unwrapping (reference catalog.py:21-31, extended for scalars)
# --------------------------------------------------------------------------

_NoneType = type(None)


def _strip_optional(annotation: Any) -> Any:
    """Unwrap Optional/Union-with-None down to the payload annotation."""
    origin = get_origin(annotation)
    if origin is Union or origin is _types.UnionType:  # PEP 604 `X | None`
        args = [a for a in get_args(annotation) if a is not _NoneType]
        if len(args) == 1:
            return _strip_optional(args[0])
    return annotation


def _unwrap_field(annotation: Any) -> tuple[Any, bool]:
    """(payload annotation, is_list) after Optional stripping."""
    ann = _strip_optional(annotation)
    if get_origin(ann) is list:
        args = get_args(ann)
        return (_strip_optional(args[0]) if args else str), True
    return ann, False


def _model_of(annotation: Any):
    ann = _strip_optional(annotation)
    if isinstance(ann, type) and BaseModel is not None and issubclass(ann, BaseModel):
        return ann
    # a NON-Optional Union containing entity models (e.g. a discriminated
    # union child) has no engine mapping — falling through to the scalar
    # branch would silently compile the whole declared subtree to a string
    # field (fail-loudly policy, same as the graph_reference misdeclaration)
    origin = get_origin(ann)
    if origin is Union or origin is _types.UnionType:
        models = [a for a in get_args(ann) if _model_of(a) is not None]
        if models:
            names = ", ".join(m.__name__ for m in models)
            raise ValueError(
                f"unsupported Union over entity models ({names}): the engine "
                "has no discriminated-union children — declare separate "
                "Optional fields per variant (or a common base class)"
            )
    return None


def _scalar_ftype(annotation: Any) -> tuple[str, tuple[str, ...]]:
    """Map a scalar annotation to the engine's FieldSpec type vocabulary
    (string | int | float | bool | enum), enums carrying their values
    (reference type system, SURVEY §1.2 / string_formatter.py:79-104)."""
    ann = _strip_optional(annotation)
    if isinstance(ann, type) and issubclass(ann, _enum.Enum):
        return "enum", tuple(str(m.value) for m in ann)
    if ann is bool:  # bool before int: bool is an int subclass
        return "bool", ()
    if ann is int:
        return "int", ()
    if ann is float or ann is _decimal.Decimal:
        return "float", ()
    # str, date/datetime/time, UUID, Path, bytes, Any → string (engine fields
    # are string-typed; dates stay ISO strings exactly like the exporters)
    _ = (_dt, _uuid)
    return "string", ()


# --------------------------------------------------------------------------
# model_config / field metadata accessors (graph_converter.py:37-58)
# --------------------------------------------------------------------------


def _cfg(model: type, key: str, default: Any = None) -> Any:
    config = getattr(model, "model_config", {}) or {}
    if hasattr(config, "get"):
        return config.get(key, default)
    return getattr(config, key, default)


def _extra(field_info: Any) -> dict:
    extra = getattr(field_info, "json_schema_extra", None)
    return extra if isinstance(extra, dict) else {}


def _id_fields(model: type) -> list[str]:
    raw = _cfg(model, "graph_id_fields", []) or []
    return [f for f in raw if isinstance(f, str)]


def _is_component(model: type) -> bool:
    return _cfg(model, "is_entity") is False


def _doc(model: type) -> str:
    return " ".join((model.__doc__ or "").split())[:400]


# --------------------------------------------------------------------------
# the compiler
# --------------------------------------------------------------------------


def compile_template(model_cls: type, rules: dict | None = None) -> dict:
    """Compile a Pydantic template class tree into the engine's dict template.

    ``rules`` overlays deterministic discover/fill rules keyed by catalog
    path (``"rows[]"``, ``"seller"`` — wins) or by class name (applies to
    every occurrence); metadata embedded via ``x_discover`` /
    ``x_coverage_discover`` in model_config and ``x_rule`` in a field's
    json_schema_extra is honored with the overlay taking precedence.
    Recursive nesting is pruned via the walk ancestry exactly like the
    reference catalog walk (catalog.py:221-228).
    """
    _require_pydantic()
    if not (isinstance(model_cls, type) and issubclass(model_cls, BaseModel)):
        raise TypeError(f"template must be a pydantic BaseModel subclass, got {model_cls!r}")
    rules = rules or {}

    def compile_model(model: type, ancestry: tuple[type, ...], path: str = "") -> dict:
        cls_rules = {**(rules.get(model.__name__, {}) or {}), **(rules.get(path, {}) or {} if path else {})}
        out: dict[str, Any] = {"class": model.__name__}
        ids = _id_fields(model)
        if ids:
            out["id_fields"] = ids
        if _is_component(model):
            out["component"] = True
        doc = _doc(model)
        if doc:
            out["description"] = doc
        discover = cls_rules.get("discover", _cfg(model, "x_discover", "")) or ""
        if discover:
            out["discover"] = discover
        cov = cls_rules.get(
            "coverage_discover", _cfg(model, "x_coverage_discover", "")
        ) or ""
        if cov:
            out["coverage_discover"] = cov
        bound = _cfg(model, "graph_max_instances")
        if isinstance(bound, int) and bound > 0:
            out["max_instances"] = bound
        if _cfg(model, "x_doc_scoped") is True or cls_rules.get("doc_scoped") is True:
            out["doc_scoped"] = True

        fields: dict[str, dict] = {}
        children: dict[str, dict] = {}
        field_rules = cls_rules.get("fields", {}) or {}
        for fname, finfo in model.model_fields.items():
            payload, is_list = _unwrap_field(finfo.annotation)
            target = _model_of(payload)
            extra = _extra(finfo)
            if target is not None:
                wants_ref = bool(extra.get("graph_reference"))
                if wants_ref and not _id_fields(target):
                    # a reference is an id-only link, never discovered
                    # (dense/catalog.py:58-74) — compiling it as a plain
                    # discoverable child would silently invert the graph
                    # topology the author declared, so fail loudly
                    raise ValueError(
                        f"{model.__name__}.{fname}: graph_reference=True but "
                        f"target {target.__name__} declares no graph_id_fields "
                        "— a reference target needs identity fields"
                    )
                is_ref = wants_ref
                child_path = f"{path}.{fname}" if path else fname
                if is_list:
                    child_path += "[]"
                if target in ancestry:
                    # recursion pruned from discovery, same as the reference
                    # walk — the child keeps a shallow stub (class + ids) so
                    # reference-field projections still know the target shape
                    child_model: dict[str, Any] = {"class": target.__name__}
                    if _id_fields(target):
                        child_model["id_fields"] = _id_fields(target)
                    if _is_component(target):
                        child_model["component"] = True
                else:
                    child_model = compile_model(target, (*ancestry, model), child_path)
                child: dict[str, Any] = {"list": is_list, "model": child_model}
                if is_ref:
                    child["reference"] = True
                    if extra.get("reference_closed_catalog"):
                        child["closed_catalog"] = True
                    ref_rule = field_rules.get(fname, extra.get("x_rule"))
                    if isinstance(ref_rule, dict) and ref_rule.get("pattern"):
                        child["rule"] = dict(ref_rule)
                if extra.get("edge_label"):
                    child["edge_label"] = str(extra["edge_label"])
                children[fname] = child
                continue
            # scalar (or list-of-scalar) field
            ftype, enum_vals = _scalar_ftype(payload)
            if is_list:
                # engine list fields are list[string]; enum values still
                # documented for the fill rule mapping
                ftype = "list[string]"
            entry: dict[str, Any] = {"type": ftype}
            if enum_vals:
                entry["enum"] = list(enum_vals)
            if finfo.is_required() and fname not in ids:
                entry["required"] = True
            desc = getattr(finfo, "description", None)
            if desc:
                entry["description"] = str(desc)[:400]
            rule = field_rules.get(fname, extra.get("x_rule"))
            if isinstance(rule, dict) and rule.get("kind"):
                entry["rule"] = dict(rule)
            if fname not in ids:  # id fields live in ids{}, never fill fields
                fields[fname] = entry
        if fields:
            out["fields"] = fields
        if children:
            out["children"] = children
        return out

    return compile_model(model_cls, ())


def iter_template_models(model_cls: type):
    """Every distinct model class reachable from the template root (cycle-safe,
    deterministic order)."""
    _require_pydantic()
    seen: dict[type, None] = {}

    def walk(model: type) -> None:
        if model in seen:
            return
        seen[model] = None
        for finfo in model.model_fields.values():
            payload, _ = _unwrap_field(finfo.annotation)
            target = _model_of(payload)
            if target is not None:
                walk(target)

    walk(model_cls)
    return list(seen)


def cardinality_bounds(model_cls: type) -> dict[str, int]:
    """{class name: graph_max_instances} for every reachable class that
    declares a positive bound (graph_converter.py:91-120)."""
    out: dict[str, int] = {}
    for model in iter_template_models(model_cls):
        bound = _cfg(model, "graph_max_instances")
        if isinstance(bound, int) and bound > 0:
            out[model.__name__] = bound
    return out


def template_id_fields_map(model_cls: type) -> dict[str, list[str]]:
    """{class name: graph_id_fields} for every reachable class — the
    cardinality rank key and empty-identity audit both consume this
    (graph_converter.py:61-76,399-420)."""
    return {m.__name__: _id_fields(m) for m in iter_template_models(model_cls) if _id_fields(m)}


# --------------------------------------------------------------------------
# template validators → the Extensions.validators slot
# --------------------------------------------------------------------------


def pydantic_validators(model_cls: type) -> dict[str, Callable[[dict], list[str]]]:
    """Per-class validators running the template's OWN Pydantic validation
    (field_validator coercions, model_validator invariants) over each salvaged
    entity's scalar payload — the engine-side home of the reference's
    generated-template validators (llm_backend validation path; golden
    invoice.py numeric/enum coercers).

    Each validator receives the flat ``{**fields, **ids}`` dict salvage built
    (component fields dotted). Model-typed fields (children/references) are
    extracted separately by the engine, so they are excluded from the payload
    before ``model_validate`` AND errors anchored on them (e.g. ``missing`` for
    a required child model) are discarded — only scalar fields are judged.
    (Limitation: when a required child is absent from the payload, Pydantic
    aborts before mode="after" model validators, so model-level invariants
    over children do not run here — the engine's own structural checks own
    that territory.) Returned strings become terminal salvage errors
    (valid=0), matching the reference's validators raising inside
    model_validate."""
    _require_pydantic()
    out: dict[str, Callable[[dict], list[str]]] = {}
    for model in iter_template_models(model_cls):
        scalar_fields = {
            fname
            for fname, finfo in model.model_fields.items()
            if _model_of(_unwrap_field(finfo.annotation)[0]) is None
        }
        # Field(alias=...) support: the salvage payload is keyed by PYTHON
        # field names, but an un-aliased model_validate expects (and reports
        # error locs by) the alias — without the two maps below, an aliased
        # field's missing/coercion errors were filtered out as "not a scalar"
        # and the whole gate silently no-opped for that field
        to_alias = {
            fname: (finfo.alias or fname)
            for fname, finfo in model.model_fields.items()
            if fname in scalar_fields
        }
        from_alias = {a: f for f, a in to_alias.items()}

        def make(
            m: type, scalars: frozenset, to_a: dict, from_a: dict
        ) -> Callable[[dict], list[str]]:
            def validate(entity: dict) -> list[str]:
                payload: dict[str, Any] = {}
                for k, v in (entity or {}).items():
                    if k in scalars and v not in (None, ""):
                        payload[to_a.get(k, k)] = v
                try:
                    m.model_validate(payload)
                    return []
                except Exception as e:  # pydantic.ValidationError shape
                    errors = getattr(e, "errors", None)
                    if callable(errors):
                        out_errs = []
                        for err in errors():
                            loc = err.get("loc", ())
                            loc0 = from_a.get(str(loc[0]), str(loc[0])) if loc else None
                            # errors rooted on a model-typed field (required
                            # child "missing", nested shape) are the engine's
                            # structural checks' territory, not this gate's
                            if loc and loc0 not in scalars:
                                continue
                            shown = (loc0,) + tuple(str(x) for x in loc[1:]) if loc else ()
                            out_errs.append(
                                f"template:{err.get('type', 'invalid')}@"
                                + ".".join(str(x) for x in shown)
                            )
                        return out_errs
                    return [f"template:{type(e).__name__}"]

            return validate

        out[model.__name__] = make(
            model, frozenset(scalar_fields), to_alias, from_alias
        )
    return out


def template_extensions(model_cls: type):
    """Extensions pre-loaded with the template's own validators — pass to
    salvage_entities/convert paths to run the Pydantic template's validation
    as the final gate."""
    from sparkdoc.extension import Extensions

    return Extensions(validators=pydantic_validators(model_cls))
