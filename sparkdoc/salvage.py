"""Validation-salvage fixer ladder: best-effort typed repair of extracted
instances — never raises, at most 3 mutation rounds, one more validation
attempt than rounds, terminal error set kept for audit.

Reference semantics reproduced (core/extractors/backends/llm_backend.py):
  ladder order + rounds      _validate_extraction, llm_backend.py:771-855 —
                             identity-drop first and ALONE (deletions shift
                             list indices), then quantity coercion (pass 0
                             only), fill-missing-required, scalar→string,
                             string→identity-only model, scalar→list; prune
                             invalid fields only when nothing else fixed.
  drop-missing-identity      llm_backend.py:401-446 — a missing graph-id
                             field never gets fabricated; the instance drops
                             (phantom-hub guard), deepest-first/highest-index
                             so deletions cannot shift later ones; the root
                             (loc length 1) is never dropped.
  fill-missing-required      llm_backend.py:448-518 — enum default (OTHER
                             else first), root document-identifier fields get
                             the template name, ``*_id`` fields get a stable
                             content-fingerprint id (PREFIX-blake2b8), other
                             strings get "".
  scalar→string coercion     llm_backend.py:595-636 — int/float/bool→str;
                             None→"" for string_type; list/dict→extracted
                             label unless the dict is a complex block (nested
                             containers or >=80-char prose — a child's name
                             must not become the parent's).
  string→identity-only model llm_backend.py:718-758 — a bare string where a
                             model is expected becomes {first_id_field: s}.
  scalar→list coercion       llm_backend.py:638-700 — Python list literals
                             parsed, comma-split strings, else wrap.
  quantity coercion          llm_backend.py:224-244 — scalar at a quantity
                             location becomes {numeric_value}/{text_value}.
  prune invalid              llm_backend.py:760-775 — deepest-first deletion.

Schema dialect: the NodeCatalog's projected fill schemas (plain dicts), with
``type`` in {string,int,float,bool,enum,list,object,quantity,reference} and
``identity`` naming the graph-id fields of an object.

The ladder itself is pure Python (unit-tested against the reference cases);
``salvage_entities`` wraps it in one mapInPandas over entity rows.
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

MAX_SALVAGE_PASSES = 3
_COMPLEX_TEXT_MIN_CHARS = 80
_LABEL_KEYS = ("nom", "name", "title", "id", "label")


# --------------------------------------------------------------------------
# validation
# --------------------------------------------------------------------------


def validate(data: Any, schema: dict, loc: tuple = ()) -> list[dict]:
    """Structural validation returning pydantic-v2-shaped error dicts
    ({loc, type, msg}) — the fixer ladder dispatches on ``type``."""
    errors: list[dict] = []
    stype = schema.get("type", "string")
    if stype == "object" or stype == "quantity" or stype == "reference":
        if isinstance(data, str) and stype in ("object", "reference"):
            errors.append({"loc": loc, "type": "model_type", "msg": "expected object"})
            return errors
        if not isinstance(data, dict):
            if stype == "quantity":
                errors.append({"loc": loc, "type": "quantity_type", "msg": "QuantityWithUnit expected"})
            else:
                errors.append({"loc": loc, "type": "model_type", "msg": "expected object"})
            return errors
        props = schema.get("properties") or {}
        for req in schema.get("required") or []:
            if req not in data or data.get(req) is None:
                errors.append({"loc": (*loc, req), "type": "missing", "msg": "field required"})
        for k, v in data.items():
            sub = props.get(k)
            if sub is None:
                continue
            if v is None:
                continue
            errors.extend(validate(v, sub, (*loc, k)))
        return errors
    if stype == "list" or (isinstance(stype, str) and stype.startswith("list[")):
        # both dialect spellings: 'list' (+items) and the catalog/FieldSpec
        # 'list[string]' shorthand — without this, catalog-produced list
        # fields matched NO branch and passed through unvalidated
        if not isinstance(data, list):
            errors.append({"loc": loc, "type": "list_type", "msg": "expected list"})
            return errors
        items = schema.get("items") or (
            {"type": stype[5:-1]} if stype.startswith("list[") else {"type": "string"}
        )
        for i, item in enumerate(data):
            errors.extend(validate(item, items, (*loc, i)))
        return errors
    if stype == "enum":
        allowed = schema.get("enum") or []
        if not isinstance(data, str) or (allowed and data not in allowed):
            errors.append({"loc": loc, "type": "enum", "msg": f"not in {allowed}"})
        return errors
    if stype == "string":
        if not isinstance(data, str):
            errors.append({"loc": loc, "type": "string_type", "msg": "expected string"})
        return errors
    if stype == "int":
        if isinstance(data, bool) or not isinstance(data, int):
            if isinstance(data, str) and re.fullmatch(r"-?\d+", data.strip()):
                return errors  # string-encoded int accepted (lax mode)
            errors.append({"loc": loc, "type": "int_type", "msg": "expected int"})
        return errors
    if stype == "float":
        if isinstance(data, bool) or not isinstance(data, (int, float)):
            if isinstance(data, str) and re.fullmatch(r"-?\d+(\.\d+)?([eE][+-]?\d+)?", data.strip()):
                return errors
            errors.append({"loc": loc, "type": "float_type", "msg": "expected float"})
        return errors
    if stype == "bool":
        if not isinstance(data, bool):
            # lax mode mirrors int/float: fill stringifies everything, so
            # 'True'/'false'/'1' must validate or bool fields are
            # UNSALVAGEABLE (no coercer can make a str a bool instance)
            if isinstance(data, str) and data.strip().lower() in (
                "true", "false", "yes", "no", "1", "0",
            ):
                return errors
            errors.append({"loc": loc, "type": "bool_type", "msg": "expected bool"})
        return errors
    return errors


# --------------------------------------------------------------------------
# path helpers (llm_backend.py:257-277)
# --------------------------------------------------------------------------


def _get_at(data: Any, loc: tuple) -> Any:
    cur = data
    for key in loc:
        cur = cur[key]
    return cur


def _set_at(data: Any, loc: tuple, value: Any) -> None:
    if not loc:
        return
    parent = _get_at(data, loc[:-1])
    if parent is not None:
        parent[loc[-1]] = value


def _delete_at(data: Any, loc: tuple) -> None:
    if not loc:
        return
    try:
        parent = _get_at(data, loc[:-1])
    except (KeyError, IndexError, TypeError):
        return
    leaf = loc[-1]
    if isinstance(parent, dict):
        parent.pop(leaf, None)
    elif isinstance(parent, list) and isinstance(leaf, int) and 0 <= leaf < len(parent):
        parent.pop(leaf)


def _schema_at(schema: dict, loc: tuple) -> dict | None:
    node = schema
    for key in loc:
        if not isinstance(node, dict):
            return None
        if isinstance(key, int):
            node = node.get("items") or {}
        else:
            node = (node.get("properties") or {}).get(key) or {}
        if not node:
            return None
    return node if isinstance(node, dict) else None


def _owner_schema(schema: dict, loc: tuple) -> dict:
    """Schema of the object owning the field at loc."""
    return _schema_at(schema, loc[:-1]) or schema


def content_fingerprint(entity: dict, exclude: set[str] | None = None) -> str:
    """Stable blake2b-8 of entity content (llm_backend.py:305-310)."""
    skip = (exclude or set()) | {"__class__"}
    stable = {k: v for k, v in entity.items() if k not in skip}
    blob = json.dumps(stable, sort_keys=True, default=str)
    return hashlib.blake2b(blob.encode(), digest_size=8).hexdigest()


# --------------------------------------------------------------------------
# fixers
# --------------------------------------------------------------------------


def _enum_default(field_schema: dict) -> Any:
    vals = field_schema.get("enum")
    if not isinstance(vals, list) or not vals:
        return None
    for v in vals:
        if isinstance(v, str) and v.upper() == "OTHER":
            return v
    return vals[0]


def drop_instances_missing_identity(data: Any, errors: list[dict], schema: dict) -> bool:
    """Identity is sacred: instances missing a graph-id field drop instead of
    minting a phantom hub. Deepest-first, highest index first; the root (loc
    length 1) is never dropped."""
    drop_locs: set[tuple] = set()
    for err in errors:
        if err.get("type") != "missing":
            continue
        loc = tuple(err.get("loc", ()))
        if len(loc) < 2 or not isinstance(loc[-1], str):
            continue
        owner = _owner_schema(schema, loc)
        identity = owner.get("identity") or []
        if loc[-1] in identity:
            drop_locs.add(loc[:-1])
    if not drop_locs:
        return False

    def order(loc: tuple) -> tuple:
        return (
            len(loc),
            tuple((0, str(seg)) if isinstance(seg, str) else (1, seg) for seg in loc),
        )

    for parent_loc in sorted(drop_locs, key=order, reverse=True):
        _delete_at(data, parent_loc)
    return True


def fill_missing_required(data: Any, errors: list[dict], schema: dict, template_name: str = "") -> bool:
    changed = False
    missing = sorted(
        (e for e in errors if e.get("type") == "missing"), key=lambda e: len(e.get("loc", ()))
    )
    seen: set[tuple] = set()
    for err in missing:
        loc = tuple(err.get("loc", ()))
        if not loc or loc in seen:
            continue
        field_name = loc[-1] if isinstance(loc[-1], str) else None
        if not field_name:
            continue
        try:
            parent = _get_at(data, loc[:-1])
        except (KeyError, IndexError, TypeError):
            continue
        if not (isinstance(parent, dict) and field_name not in parent):
            continue
        fn = field_name.lower()
        is_doc_id = ("reference" in fn and "document" in fn) or fn.endswith("_document")
        field_schema = _schema_at(schema, loc) or {}
        enum_default = _enum_default(field_schema)
        if len(loc) == 1 and is_doc_id and template_name:
            value: Any = template_name
        elif enum_default is not None:
            value = enum_default
        elif field_name.endswith("_id"):
            prefix = field_name[:-3].upper()
            prefix = prefix[:4] if len(prefix) > 4 else prefix
            value = f"{prefix}-{content_fingerprint(parent, exclude={field_name})}"
        else:
            value = ""
        _set_at(data, loc, value)
        seen.add(loc)
        changed = True
    return changed


def _looks_like_complex_block(d: dict) -> bool:
    if not isinstance(d, dict) or len(d) <= 1:
        return False
    for value in d.values():
        if isinstance(value, (list, dict)):
            return True
        if isinstance(value, str) and len(value) >= _COMPLEX_TEXT_MIN_CHARS:
            return True
    return False


def _extract_string(value: Any) -> str | None:
    if value is None:
        return None
    if isinstance(value, str) and value.strip():
        return value.strip()
    if isinstance(value, (int, float, bool)):
        return str(value)
    if isinstance(value, list):
        for item in value:
            if isinstance(item, str) and item.strip():
                return item.strip()
            if isinstance(item, dict):
                if _looks_like_complex_block(item):
                    continue
                got = _extract_string_from_dict(item)
                if got is not None:
                    return got
        return None
    if isinstance(value, dict):
        if _looks_like_complex_block(value):
            return None
        return _extract_string_from_dict(value)
    return None


def _extract_string_from_dict(d: dict) -> str | None:
    for key in _LABEL_KEYS:
        if key in d and d[key] is not None:
            s = d[key]
            if isinstance(s, str) and s.strip():
                return s.strip()
            if isinstance(s, (int, float, bool)):
                return str(s)
    for v in d.values():
        if isinstance(v, str) and v.strip():
            return v.strip()
    return None


def coerce_string_types(data: Any, errors: list[dict]) -> bool:
    changed = False
    seen: set[tuple] = set()
    for err in errors:
        et = err.get("type")
        if et not in ("int_type", "float_type", "bool_type", "string_type", "enum"):
            continue
        # enum errors coerce only non-strings (a wrong string enum value is
        # the enum-default fixer's job via prune+refill)
        loc = tuple(err.get("loc", ()))
        if not loc or loc in seen:
            continue
        try:
            value = _get_at(data, loc)
        except (KeyError, IndexError, TypeError):
            continue
        coerced: str | None = None
        if value is None:
            if et == "string_type":
                coerced = ""
        elif isinstance(value, (int, float, bool)) and et != "enum":
            coerced = str(value)
        elif isinstance(value, (list, dict)) and et in ("string_type",):
            coerced = _extract_string(value)
            if coerced is None:
                coerced = ""
        if coerced is None:
            continue
        _set_at(data, loc, coerced)
        seen.add(loc)
        changed = True
    return changed


def coerce_model_type_strings(data: Any, errors: list[dict], schema: dict) -> bool:
    """Bare string where an object is expected → identity-only instance
    ({first id field: value}) — saves id-only reference lists emitted as
    name strings (llm_backend.py:718-758)."""
    changed = False
    seen: set[tuple] = set()
    for err in errors:
        if err.get("type") != "model_type":
            continue
        loc = tuple(err.get("loc", ()))
        if not loc or loc in seen:
            continue
        try:
            value = _get_at(data, loc)
        except (KeyError, IndexError, TypeError):
            continue
        if not isinstance(value, str) or not value.strip():
            continue
        target = _schema_at(schema, loc) or {}
        id_fields = target.get("identity") or target.get("id_fields") or []
        if not id_fields:
            continue
        _set_at(data, loc, {id_fields[0]: value.strip()})
        seen.add(loc)
        changed = True
    return changed


def coerce_list_types(data: Any, errors: list[dict]) -> bool:
    changed = False
    seen: set[tuple] = set()
    for err in errors:
        if err.get("type") != "list_type":
            continue
        loc = tuple(err.get("loc", ()))
        if not loc or loc in seen:
            continue
        try:
            value = _get_at(data, loc)
        except (KeyError, IndexError, TypeError):
            continue
        if isinstance(value, list):
            continue
        if isinstance(value, str):
            s = value.strip()
            if s.startswith("[") and s.endswith("]"):
                try:
                    parsed = ast.literal_eval(s)
                    if isinstance(parsed, list):
                        _set_at(data, loc, list(parsed))
                        seen.add(loc)
                        changed = True
                        continue
                except (ValueError, SyntaxError):
                    pass
                # non-literal bracket form ('[Alice, Bob]'): strip the
                # brackets before the comma-split fallback, or the first and
                # last elements keep them baked in
                inner = s[1:-1].strip()
                lv = [p.strip() for p in inner.split(",") if p.strip()] if "," in inner else (
                    [inner] if inner else []
                )
                _set_at(data, loc, lv)
                seen.add(loc)
                changed = True
                continue
            lv = [p.strip() for p in value.split(",") if p.strip()] if "," in value else [value]
        else:
            lv = [value]
        _set_at(data, loc, lv)
        seen.add(loc)
        changed = True
    return changed


def coerce_quantities(data: Any, errors: list[dict]) -> bool:
    changed = False
    for err in errors:
        if err.get("type") != "quantity_type":
            continue
        loc = tuple(err.get("loc", ()))
        if not loc:
            continue
        try:
            value = _get_at(data, loc)
        except (KeyError, IndexError, TypeError):
            continue
        if isinstance(value, dict):
            continue
        if isinstance(value, (int, float)) and not isinstance(value, bool):
            coerced: dict = {"numeric_value": float(value)}
        elif isinstance(value, str):
            cleaned = re.sub(r"[^\d.\-eE]", "", value)
            try:
                coerced = {"numeric_value": float(cleaned)}
            except ValueError:
                coerced = {"text_value": value}
        else:
            coerced = {"numeric_value": None, "text_value": str(value)}
        _set_at(data, loc, coerced)
        changed = True
    return changed


def prune_invalid_fields(data: Any, errors: list[dict]) -> None:
    for err in sorted(errors, key=lambda e: len(e.get("loc", ())), reverse=True):
        loc = tuple(err.get("loc", ()))
        if loc:
            _delete_at(data, loc)


# --------------------------------------------------------------------------
# the ladder
# --------------------------------------------------------------------------


def salvage(data: Any, schema: dict, template_name: str = "") -> tuple[Any, int, list[dict]]:
    """Run the full ladder. Returns (repaired data, passes used, terminal
    errors — empty when validation succeeded). One more validation attempt
    than mutation rounds (fixes applied on the last round still validate)."""
    import copy

    data = copy.deepcopy(data)
    for pass_num in range(MAX_SALVAGE_PASSES + 1):
        errors = validate(data, schema)
        if not errors:
            return data, pass_num, []
        if pass_num == MAX_SALVAGE_PASSES:
            return data, pass_num, errors
        # identity guard first and ALONE: deletions shift list indices
        if drop_instances_missing_identity(data, errors, schema):
            continue
        any_fixed = False
        if pass_num == 0 and coerce_quantities(data, errors):
            any_fixed = True
        if fill_missing_required(data, errors, schema, template_name):
            any_fixed = True
        if coerce_string_types(data, errors):
            any_fixed = True
        if coerce_model_type_strings(data, errors, schema):
            any_fixed = True
        if coerce_list_types(data, errors):
            any_fixed = True
        if not any_fixed:
            prune_invalid_fields(data, errors)
    return data, MAX_SALVAGE_PASSES, validate(data, schema)


# --------------------------------------------------------------------------
# Spark stage
# --------------------------------------------------------------------------


def entity_schema_for_spec(catalog, spec) -> dict:
    """Schema an extracted instance validates against: the projected fill
    schema + the id fields as required identity strings."""
    from sparkdoc.catalog import build_projected_fill_schema

    schema = build_projected_fill_schema(catalog, spec)
    props = dict(schema["properties"])
    # reference projections are filled as the bare target-id STRING
    # (fill.extract_fields) — validating them as typed models would make the
    # ladder rewrite the string into a dict and break the registry edge
    # derivation downstream (build_catalog_edges keys on the raw id value)
    for fname, _ids in spec.reference_fields:
        if props.get(fname, {}).get("type") == "reference":
            props[fname] = {"type": "string"}
    for f in spec.id_fields:
        props.setdefault(f, {"type": "string"})
    required = sorted(set(schema.get("required") or []) | set(spec.id_fields))
    return {
        "type": "object",
        "properties": props,
        "required": required,
        "identity": list(spec.id_fields),
    }


MAX_ID_LEN = 300  # id-value truncation bound (shared: one_to_one pseudo-key scrub)


def salvage_entities(
    entities: DataFrame, catalog, max_id_len: int = MAX_ID_LEN, extensions=None
) -> DataFrame:
    """Vectorized ladder over entity rows: data = {**ids, **fields} validates
    against the path's schema; repaired values flow back to ``fields`` (ids
    are identity — a repaired/defaulted id would mint a phantom, so a bad id
    marks the row invalid instead). Adds (valid, errors, salvage_passes).

    Whitespace in id values is collapsed and over-long ids truncated with an
    audit error (the round-1 validate_salvage rules, kept — they mirror the
    reference's normalize-before-validate). A registered per-class template
    validator (SURVEY §2.11 slot, extension.Extensions.validators) runs after
    the ladder; its errors are terminal (valid=0) like the reference's
    generated-template validators raising in model_validate."""
    by_path = catalog.spec_by_path()
    schemas = {p: entity_schema_for_spec(catalog, s) for p, s in by_path.items()}
    template_name = by_path.get("").node_type if "" in by_path else ""

    out_schema = (
        "doc_id string, path string, class string, ids map<string,string>, "
        "fields map<string,string>, chunk_ids array<int>, node_id string, fill_batch int, "
        "valid int, errors array<string>, salvage_passes int"
    )
    cols = ["doc_id", "path", "class", "ids", "fields", "chunk_ids", "node_id", "fill_batch"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ws_re = re.compile(r"\s+")
        for pdf in batches:
            rows = []
            for doc_id, path, cls, ids, fields, chunk_ids, node_id, fill_batch in zip(
                *(pdf[c] for c in cols)
            ):
                ids = {k: ws_re.sub(" ", v or "").strip() for k, v in dict(ids or {}).items()}
                errs: list[str] = []
                for k, v in list(ids.items()):
                    if len(v) > max_id_len:
                        ids[k] = v[:max_id_len]
                        errs.append("truncated_identity")
                spec = by_path.get(path)
                schema = schemas.get(path)
                data = {**(dict(fields or {})), **ids}
                if schema is not None:
                    repaired, passes, terminal = salvage(data, schema, template_name)
                else:
                    repaired, passes, terminal = data, 0, []
                # identity may not be fabricated: a missing/blank id after the
                # ladder (which never fills identity fields — the drop guard
                # owns them) marks the row invalid
                id_ok = bool(spec is None or all(ids.get(f) for f in spec.id_fields))
                user_errs: list[str] = []
                if extensions is not None and extensions.validators.get(cls):
                    from sparkdoc.extension import run_validators

                    user_errs = run_validators([{**repaired, **ids}], cls, extensions)[0]
                    errs.extend(user_errs)
                for e in terminal:
                    errs.append(f"{e['type']}@{'.'.join(str(x) for x in e['loc'])}")
                if not id_ok:
                    errs.append(
                        "missing_required:" + ",".join(f for f in (spec.id_fields if spec else ()) if not ids.get(f))
                    )
                new_fields = {
                    k: (json.dumps(v) if isinstance(v, (list, dict)) else str(v))
                    for k, v in repaired.items()
                    if k not in ids and v not in (None, "")
                }
                cids = [] if chunk_ids is None else list(chunk_ids)
                rows.append(
                    (
                        doc_id, path, cls, ids, new_fields,
                        cids, node_id,
                        int(fill_batch) if fill_batch is not None else -1,
                        int(id_ok and not terminal and not user_errs), errs, passes,
                    )
                )
            yield pd.DataFrame(rows, columns=[*cols, "valid", "errors", "salvage_passes"])

    return entities.mapInPandas(run, schema=out_schema)
