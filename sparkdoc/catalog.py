"""NodeCatalog: compile a declarative template spec into per-path NodeSpecs,
projected fill schemas, and the bottom-up fill order.

Reference semantics reproduced (contracts/dense/catalog.py):
  build_node_catalog          catalog.py:153-260 — entity paths only;
                              components fold inline into their parent's fill
                              schema; reference fields are skipped unless
                              include_references (they are filled id-only by
                              the parent and resolved via the node-id
                              registry); recursive nesting is pruned via the
                              walk's ancestry.
  NodeSpec fields             catalog.py:114-139
  build_projected_fill_schema catalog.py:326-358 — model fields minus child
                              entity fields, reference fields projected down
                              to identity only.
  path_has_reference_fields   catalog.py:361-375 — such paths fill one
                              instance per call (first-instance dumping guard).
  build_skeleton_semantic_guide catalog.py:384-424 — per-path guide with the
                              240-char description budget.
  bottom_up_path_order        catalog.py:469-475 — deepest first.

Templates here are plain declarative dicts (no pydantic in this engine): the
same information a Pydantic template carries — class name, id fields,
entity/component kind, reference flags, child models — plus the deterministic
extraction rules that stand in for the LLM (a ``discover`` regex per entity
class and a fill rule per field). The catalog is small by construction
(dozens of paths), so it travels to executors inside closures; nothing here
runs a Spark job.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: description budget for the skeleton guide (catalog.py:381)
GUIDE_DESCRIPTION_CHARS = 240


@dataclass(frozen=True)
class FieldSpec:
    """One fill-schema field. ``rule`` is the deterministic extractor:

    kind='context'  — regex over the scoped context; ``{id}`` interpolates the
                      (escaped) primary id value; group 1 (or 0) is the value.
    kind='id'       — derive from an id value: regex group over ids[id_field],
                      optionally mapped through ``mapping`` (enum derivation).
    kind=''         — no deterministic rule: the field stays empty unless a
                      user-supplied extractor fills it (the §2.11 UDF slot).
    """

    name: str
    ftype: str = "string"  # string | int | float | bool | list[string] | enum
    enum: tuple[str, ...] = ()
    required: bool = False
    rule_kind: str = ""  # '' | 'context' | 'id'
    pattern: str = ""
    id_field: str = ""
    mapping: tuple[tuple[str, str], ...] = ()
    description: str = ""


@dataclass(frozen=True)
class NodeSpec:
    """Specification of a node type at a given catalog path (catalog.py:114)."""

    path: str
    node_type: str
    id_fields: tuple[str, ...] = ()
    kind: str = "entity"  # entity | component
    parent_path: str = ""
    field_name: str = ""
    #: explicit edge label from field metadata (graph_converter._get_edge_label,
    #: graph_converter.py:717,753); empty = the field name labels the edge
    edge_label: str = ""
    is_list: bool = False
    description: str = ""
    #: graph_max_instances bound (0 = unbounded) — enforce_cardinality_bounds
    #: demotes instances past it (graph_converter.py:91-120,360-429)
    max_instances: int = 0
    #: identity unique only WITHIN a document (billing-row numbers): doc_id is
    #: mixed into the registry fingerprint so instances do not collapse
    #: across documents (the reference registry is per-document-run)
    doc_scoped: bool = False
    discover: str = ""  # skeleton regex; group 1 (or 0) = primary id value
    #: looser second-chance pattern for the coverage pass (zero-yield chunks);
    #: empty = the coverage pass reuses ``discover``
    coverage_discover: str = ""
    fields: tuple[FieldSpec, ...] = ()
    #: child field names that are id-only references (field -> target id fields)
    reference_fields: tuple[tuple[str, tuple[str, ...]], ...] = ()
    #: field -> target CLASS name for reference fields — disambiguates targets
    #: when two entity classes share the same id-field names (fill resolves
    #: the target's discover pattern by class, not by id-field shape)
    reference_classes: tuple[tuple[str, str], ...] = ()
    #: field -> context pattern overriding the target class's discover for
    #: THIS reference field ("{id}" interpolates the owner's primary id) —
    #: lets per-instance references (billing row → its own item) resolve
    #: correctly where a first-match-of-target-discover would tie every
    #: instance in a chunk to the same target
    reference_rules: tuple[tuple[str, str], ...] = ()
    #: field -> explicit edge label for reference edges (edge_label metadata
    #: on the reference field — graph_converter.py:717,753); missing = the
    #: field name labels the edge
    reference_labels: tuple[tuple[str, str], ...] = ()
    #: reference fields declared as a CLOSED catalog (template metadata
    #: ``closed_catalog: True`` — graph_converter.py:842-852): their edges get
    #: the transient _closed_catalog marker and enforce_closed_catalogs drops
    #: targets that exist only through them
    closed_catalog_fields: tuple[str, ...] = ()


@dataclass
class NodeCatalog:
    nodes: list[NodeSpec] = field(default_factory=list)

    def paths(self) -> list[str]:
        return [n.path for n in self.nodes]

    def spec_by_path(self) -> dict[str, NodeSpec]:
        return {n.path: n for n in self.nodes}

    def children_of(self, path: str) -> list[NodeSpec]:
        return [n for n in self.nodes if n.path and n.parent_path == path]

    def doc_scoped_classes(self) -> tuple[str, ...]:
        return tuple(sorted({n.node_type for n in self.nodes if n.doc_scoped}))


def _field_specs(model: dict, prefix: str = "") -> list[FieldSpec]:
    """FieldSpecs for a model's scalar fields; component children are inlined
    with dotted names (the reference embeds component objects in the parent's
    fill schema — catalog.py:238-247)."""
    out: list[FieldSpec] = []
    for name, f in (model.get("fields") or {}).items():
        rule = f.get("rule") or {}
        out.append(
            FieldSpec(
                name=f"{prefix}{name}",
                ftype=f.get("type", "string"),
                enum=tuple(f.get("enum") or ()),
                required=bool(f.get("required")),
                rule_kind=rule.get("kind", ""),
                pattern=rule.get("pattern", ""),
                id_field=rule.get("id_field", ""),
                mapping=tuple((k, v) for k, v in (rule.get("mapping") or {}).items()),
                description=f.get("description", ""),
            )
        )
    return out


def build_node_catalog(template: dict, include_references: bool = False) -> NodeCatalog:
    """Walk the template exactly like the reference walk (catalog.py:193-259):

    * the root gets path "";
    * entity children get a path (``field[]`` for lists, dotted for nested),
      and the walk recurses with the new path as parent-entity path;
    * component children get NO path — their scalar fields are inlined into
      the nearest entity ancestor's fill schema (dotted names) and the walk
      still recurses below them so deeper entities keep paths;
    * reference children are skipped (id-only, filled by the parent) unless
      ``include_references`` — the provenance binder passes True so nodes that
      exist only through references are still walked;
    * a child class already on the walk's ancestry is pruned (recursion guard).
    """
    nodes: list[NodeSpec] = []

    def walk(path_prefix: str, model: dict, parent_entity_path: str, from_root: bool, ancestry: tuple[str, ...]) -> None:
        cls = model.get("class", "Unknown")
        if from_root:
            nodes.append(_make_spec("", model, "", "", False))
        ancestry = (*ancestry, cls)
        for fname, child in (model.get("children") or {}).items():
            child_model = child.get("model") or {}
            ccls = child_model.get("class", "Unknown")
            segment = f".{fname}" if path_prefix else fname
            path = f"{path_prefix}{segment}"
            is_list = bool(child.get("list"))
            if child.get("reference") and not include_references:
                continue
            if ccls in ancestry:
                continue
            is_component = bool(child_model.get("component"))
            if not is_component:
                node_path = f"{path}[]" if is_list else path
                nodes.append(
                    _make_spec(
                        node_path, child_model, parent_entity_path, fname, is_list,
                        edge_label=str(child.get("edge_label") or ""),
                    )
                )
                walk(node_path, child_model, node_path, False, ancestry)
            else:
                comp_path = f"{path}[]" if is_list else path
                walk(comp_path, child_model, parent_entity_path, False, ancestry)

    def _make_spec(
        path: str, model: dict, parent_path: str, field_name: str, is_list: bool,
        edge_label: str = "",
    ) -> NodeSpec:
        fields = list(_field_specs(model))
        refs: list[tuple[str, tuple[str, ...]]] = []
        ref_classes: list[tuple[str, str]] = []
        ref_rules: list[tuple[str, str]] = []
        ref_labels: list[tuple[str, str]] = []
        closed: list[str] = []

        def add_ref(rname: str, child: dict) -> None:
            child_model = child.get("model") or {}
            refs.append((rname, tuple(child_model.get("id_fields") or ())))
            # empty (not "Unknown") when the reference stub omits the
            # class: consumers fall back to id-field-shape matching —
            # a truthy placeholder would win over that fallback and
            # silently mint never-instantiated edge targets
            ref_classes.append((rname, child_model.get("class") or ""))
            rule = child.get("rule") or {}
            if rule.get("pattern"):
                ref_rules.append((rname, rule["pattern"]))
            if child.get("edge_label"):
                ref_labels.append((rname, str(child["edge_label"])))
            if child.get("closed_catalog"):
                closed.append(rname)

        def fold_component(comp_model: dict, prefix: str) -> None:
            # recurse through NESTED components too (the reference folds the
            # whole component subtree into the owning entity's fill schema,
            # catalog.py:238-247): scalar fields dot-prefix at every level,
            # and reference children inside components hoist to the entity
            # under their dotted name
            fields.extend(_field_specs(comp_model, prefix=prefix))
            for cname, cchild in (comp_model.get("children") or {}).items():
                c_model = cchild.get("model") or {}
                if cchild.get("reference"):
                    add_ref(f"{prefix}{cname}", cchild)
                elif c_model.get("component"):
                    fold_component(c_model, f"{prefix}{cname}.")

        for fname, child in (model.get("children") or {}).items():
            child_model = child.get("model") or {}
            if child.get("reference"):
                add_ref(fname, child)
            elif child_model.get("component"):
                fold_component(child_model, f"{fname}.")
        return NodeSpec(
            path=path,
            node_type=model.get("class", "Unknown"),
            id_fields=tuple(model.get("id_fields") or ()),
            kind="component" if model.get("component") else "entity",
            parent_path=parent_path,
            field_name=field_name,
            edge_label=edge_label,
            is_list=is_list,
            description=model.get("description", ""),
            max_instances=int(model.get("max_instances") or 0),
            doc_scoped=bool(model.get("doc_scoped")),
            discover=model.get("discover", ""),
            coverage_discover=model.get("coverage_discover", ""),
            fields=tuple(fields),
            reference_fields=tuple(refs),
            reference_classes=tuple(ref_classes),
            reference_rules=tuple(ref_rules),
            reference_labels=tuple(ref_labels),
            closed_catalog_fields=tuple(closed),
        )

    walk("", template, "", True, ())
    return NodeCatalog(nodes=nodes)


def bottom_up_path_order(catalog: NodeCatalog) -> list[str]:
    """Catalog paths deepest-first for the fill pass (catalog.py:469-475)."""

    def depth(p: str) -> int:
        return (p.count(".") + 1) if p else 0

    return sorted(catalog.paths(), key=depth, reverse=True)


def build_projected_fill_schema(catalog: NodeCatalog, spec: NodeSpec) -> dict:
    """The path's fill schema: own scalar fields minus child entity fields,
    reference children projected down to identity only (catalog.py:326-358)."""
    child_fields = {c.field_name for c in catalog.children_of(spec.path) if c.field_name}
    props: dict = {}
    for f in spec.fields:
        root = f.name.split(".", 1)[0]
        if root in child_fields:
            continue
        entry: dict = {"type": f.ftype}
        if f.enum:
            entry["enum"] = list(f.enum)
        if f.description:
            entry["description"] = f.description
        props[f.name] = entry
    for fname, id_fields in spec.reference_fields:
        props[fname] = {
            "type": "reference",
            "id_fields": list(id_fields),
            "description": f"Identity-only reference: output ONLY {', '.join(id_fields)}.",
        }
    return {
        "type": "object",
        "properties": props,
        "required": [f.name for f in spec.fields if f.required and f.name in props],
    }


def path_has_reference_fields(spec: NodeSpec) -> bool:
    """True when the fill schema carries id-only reference projections — such
    paths fill ONE instance per batch (catalog.py:361-375 + orchestrator
    first-instance-dumping guard)."""
    return bool(spec.reference_fields)


def build_skeleton_semantic_guide(catalog: NodeCatalog) -> str:
    """Per-path guide for Phase 1 (catalog.py:384-424): path, type, id fields,
    docstring truncated at the 240-char budget with a visible marker."""
    lines: list[str] = []
    for spec in catalog.nodes:
        path_label = '""' if spec.path == "" else spec.path
        ids_label = ", ".join(spec.id_fields) if spec.id_fields else "none (use ids={})"
        line = f"- {path_label} ({spec.node_type}) ids=[{ids_label}]"
        description = " ".join((spec.description or "").split())
        if description:
            shown = description[:GUIDE_DESCRIPTION_CHARS]
            if len(description) > GUIDE_DESCRIPTION_CHARS:
                shown = shown.rstrip() + " […]"
            line += f" — {shown}"
        lines.append(line)
    return "\n".join(lines)


# --------------------------------------------------------------------------
# The demo template driving the deterministic extraction shell: two-level
# entity nesting (Report → Section → Contract), a flat entity list with an
# enum field (Fee), an id-derived field (Contact.domain), a component inlined
# into its parent's fill schema (Meta), and an id-only reference projection
# (Report.reporter → Contact). Discover/fill rules target the synthetic
# corpus (synth.py:_entity_sentence / heading shapes).
# --------------------------------------------------------------------------

DEMO_TEMPLATE: dict = {
    "class": "Report",
    "id_fields": ["name"],
    "description": "A synthetic interleaved report document; one per doc_id.",
    "fields": {
        # chunk text strips '#' heading markers (chunker trail) but page/doc
        # markdown keeps them - the pattern tolerates both forms
        "title": {
            "type": "string",
            "rule": {"kind": "context", "pattern": r"(?m)^#{0,3}\s*(§\d+[^\n]*)"},
        },
    },
    "children": {
        "meta": {
            "list": False,
            "model": {
                "class": "Meta",
                "component": True,
                "fields": {
                    "first_page_line": {
                        "type": "string",
                        "rule": {"kind": "context", "pattern": r"^([^\n]{1,60})"},
                    },
                },
            },
        },
        "reporter": {
            "list": False,
            "reference": True,
            # closed catalog: a reporter must be an independently anchored
            # Contact; a contact that exists ONLY through this reference is
            # dropped by enforce_closed_catalogs (hallucination guard)
            "closed_catalog": True,
            "model": {"class": "Contact", "id_fields": ["email"]},
        },
        "sections": {
            "list": True,
            "model": {
                "class": "Section",
                "id_fields": ["name"],
                "description": "A numbered document section (§N heading).",
                "discover": r"(?m)^#{0,3}\s*(§\d+[^\n]*)",
                "fields": {
                    "number": {
                        "type": "int",
                        "rule": {"kind": "id", "id_field": "name", "pattern": r"§(\d+)"},
                    },
                },
                "children": {
                    "contracts": {
                        "list": True,
                        "model": {
                            "class": "Contract",
                            "id_fields": ["code"],
                            "description": "A contract/invoice/PO code mentioned in the section body.",
                            "discover": r"\b((?:CT|INV|PO)-\d{4,5})\b",
                            "fields": {
                                "kind": {
                                    "type": "enum",
                                    "enum": ["CONTRACT", "INVOICE", "PURCHASE_ORDER", "OTHER"],
                                    "required": True,
                                    "rule": {
                                        "kind": "id",
                                        "id_field": "code",
                                        "pattern": r"^(CT|INV|PO)-",
                                        "mapping": {
                                            "CT": "CONTRACT",
                                            "INV": "INVOICE",
                                            "PO": "PURCHASE_ORDER",
                                        },
                                    },
                                },
                                "sentence": {
                                    "type": "string",
                                    "rule": {
                                        "kind": "context",
                                        "pattern": r"([^.\n]*\b{id}\b[^.\n]*\.)",
                                    },
                                },
                            },
                        },
                    },
                },
            },
        },
        "contacts": {
            "list": True,
            "model": {
                "class": "Contact",
                "id_fields": ["email"],
                "description": "An email contact.",
                "discover": r"\b([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,})\b",
                "fields": {
                    "domain": {
                        "type": "string",
                        "rule": {"kind": "id", "id_field": "email", "pattern": r"@([A-Za-z0-9.-]+)$"},
                    },
                },
            },
        },
        "terms": {
            "list": True,
            "model": {
                "class": "Term",
                "id_fields": ["name"],
                "description": "Capitalized multi-word term — coverage-pass-only class: "
                "discovered only when a zero-yield chunk holds enough of the document.",
                "coverage_discover": r"\b([A-Z][a-z]{3,}(?: [A-Z][a-z]{3,}){1,3})\b",
                "fields": {},
            },
        },
        "fees": {
            "list": True,
            "model": {
                "class": "Fee",
                "id_fields": ["amount"],
                "description": "A monetary amount with currency.",
                "discover": r"\b(\d{1,9}\.\d{2}) (?:USD|EUR|GBP)\b",
                "fields": {
                    "currency": {
                        "type": "enum",
                        "enum": ["USD", "EUR", "GBP", "OTHER"],
                        "required": True,
                        "rule": {"kind": "context", "pattern": r"\b{id} (USD|EUR|GBP)\b"},
                    },
                },
            },
        },
    },
}
