"""Phase 2 (fill): per-path projected-schema field extraction over scoped
context — the dense contract's second phase, deterministic-extractor edition.

Reference semantics reproduced (contracts/dense/orchestrator.py):
  fill order            bottom-up (deepest paths first) — catalog.py:469-475
  fill batching         descriptors per path split into batches of
                        ``fill_nodes_cap``; reference-carrying paths fill ONE
                        instance per call (first-instance membership dumping
                        guard) — orchestrator.py:2797-2814
  scoped context        fill context = the batch texts the descriptor's
                        source chunks came from, with the global head
                        (document opening) prepended when chunk 0 is not
                        among them — orchestrator.py:2318-2347
  pad/truncate          exactly one filled object per requested instance:
                        short responses pad with empty objects, extras with
                        no descriptor are discarded — orchestrator.py:2400-2408
  sanitize              ids are restored from the descriptors — the fill may
                        never change identity — _sanitize_filled
  fill_batches ledger   every descriptor records which fill batch carried it

The "model call" is a vectorized deterministic extractor (regex rules from
the NodeCatalog field specs) running inside one mapInPandas — the same
extension surface a real LLM backend would replace (SURVEY §2.11).

Spark shape: one shuffle to assemble per-descriptor scoped context (explode
chunk_ids → join chunk text → re-group), then a streaming mapInPandas. No
driver-side loops; the catalog travels in the closure (it is tiny).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkdoc.catalog import (
    NodeCatalog,
    NodeSpec,
    bottom_up_path_order,
    build_projected_fill_schema,
    path_has_reference_fields,
)

DEFAULT_FILL_CAP = 8
GLOBAL_HEAD_CHARS = 2000


# --------------------------------------------------------------------------
# pure-Python core (unit-testable; runs vectorized inside mapInPandas)
# --------------------------------------------------------------------------


def prepare_fill(catalog: NodeCatalog) -> dict:
    """Per-path precomputation for the fill hot loop: projected-schema
    property set + reference-field discover patterns. Rebuilding these per
    descriptor row is O(rows x catalog) pure-Python overhead inside
    mapInPandas — compute once on the driver (the catalog is tiny) and close
    over the result."""
    prepared = {}
    for spec in catalog.nodes:
        props = set(build_projected_fill_schema(catalog, spec)["properties"])
        targets = dict(_reference_targets(catalog, spec))
        refs = [(fname, targets.get(fname, "")) for fname, _ids in spec.reference_fields]
        prepared[spec.path] = (props, refs)
    return prepared


def extract_fields(
    spec: NodeSpec, ids: dict, context: str, catalog: NodeCatalog, extensions=None,
    prepared: dict | None = None,
) -> dict:
    """Deterministic fill of one descriptor: apply each projected-schema
    field's rule; reference fields fill id-only via the target class's
    discover pattern (first match in scoped context). Missing → absent key
    (the pad semantics: an empty object, ids restored by the caller).
    Rule-less fields (FieldSpec.rule_kind '') consult the user extension
    registry (SURVEY §2.11 — extension.Extensions.field_extractors, the
    custom-model-backend slot)."""
    if prepared is not None and spec.path in prepared:
        props, ref_rules = prepared[spec.path]
    else:
        props = set(build_projected_fill_schema(catalog, spec)["properties"])
        targets = dict(_reference_targets(catalog, spec))
        ref_rules = [(fname, targets.get(fname, "")) for fname, _ids in spec.reference_fields]
    # `or ""`: a key PRESENT with a NULL map value is schema-legal and would
    # reach re.escape(None) below
    primary = (ids.get(spec.id_fields[0], "") or "") if spec.id_fields else ""
    out: dict = {}

    def _search(pattern: str, text: str):
        # one malformed user rule (re.error) or a Java-only construct must
        # not kill the whole mapInPandas stage — treat as no-match, same
        # contract as the extension-extractor guard above
        try:
            return re.search(pattern, text)
        except re.error:
            return None
    for f in spec.fields:
        if f.name not in props:
            continue
        value = None
        if f.rule_kind == "" and extensions is not None:
            fn = extensions.field_extractors.get((spec.node_type, f.name))
            if fn is not None:
                try:
                    value = fn(dict(ids), context or "")
                except Exception:
                    value = None  # user extractors must never kill the job
        if f.rule_kind == "id":
            m = _search(f.pattern, ids.get(f.id_field, "") or "")
            if m:
                value = m.group(1) if m.groups() else m.group(0)
                if f.mapping:
                    value = dict(f.mapping).get(value, value)
        elif f.rule_kind == "context" and context:
            pattern = f.pattern.replace("{id}", re.escape(primary))
            m = _search(pattern, context)
            if m:
                value = m.group(1) if m.groups() else m.group(0)
        if value is None:
            continue
        if f.ftype == "int":
            try:
                value = str(int(str(value).strip()))
            except ValueError:
                pass
        out[f.name] = str(value).strip()
    overrides = dict(getattr(spec, "reference_rules", ()) or ())
    for fname, discover in ref_rules:
        # a per-field rule override beats the target's discover: it can
        # anchor on the owner's own id ({id}) so per-instance references
        # (billing row -> its own item) resolve instance-correctly
        pattern = overrides.get(fname) or discover
        if not pattern or not context:
            continue
        if fname in overrides:
            pattern = pattern.replace("{id}", re.escape(primary))
        m = _search(pattern, context)
        if m:
            # a capture group that did not PARTICIPATE in the match yields
            # None (alternation like 'A-(\\d+)|FALLBACK') — fall back to the
            # whole match, matching the id/context branches' None guard
            value = m.group(1) if m.groups() else m.group(0)
            if value is None:
                value = m.group(0)
            out[fname] = value.strip()
    return out


def _reference_targets(catalog: NodeCatalog, spec: NodeSpec) -> list[tuple[str, str]]:
    """(field_name, discover pattern of the target class) for each reference
    field — the target's pattern lives on whatever catalog path instantiates
    that class (the canonical member the registry resolves onto)."""
    out = []
    by_class = {}
    for n in catalog.nodes:
        if n.discover and n.node_type not in by_class:
            by_class[n.node_type] = n.discover
    for fname, _ids in spec.reference_fields:
        # target class name is not stored on the tuple; recover it from the
        # catalog when include_references=True, else match by field name
        out.append((fname, by_class.get(_ref_class(catalog, spec, fname), "")))
    return out


def _ref_class(catalog: NodeCatalog, spec: NodeSpec, fname: str) -> str:
    # the spec records the target class explicitly (reference_classes) —
    # required once two entity classes share id-field names (e.g. Party and
    # Item both keyed on "name"); the id-field-shape match is the fallback
    # for older hand-built NodeSpecs
    explicit = dict(getattr(spec, "reference_classes", ()) or ()).get(fname, "")
    if explicit:
        return explicit
    want = dict(spec.reference_fields)[fname]
    for n in catalog.nodes:
        if n.id_fields == want and n.discover:
            return n.node_type
    return ""


def fill_paths(catalog: NodeCatalog) -> list[str]:
    """Paths with a non-empty projected fill schema, bottom-up."""
    by_path = catalog.spec_by_path()
    out = []
    for p in bottom_up_path_order(catalog):
        spec = by_path[p]
        if build_projected_fill_schema(catalog, spec)["properties"]:
            out.append(p)
    return out


# --------------------------------------------------------------------------
# Spark stage
# --------------------------------------------------------------------------


def assign_fill_batches(skeleton: DataFrame, catalog: NodeCatalog, fill_cap: int = DEFAULT_FILL_CAP) -> DataFrame:
    """Descriptor → fill batch assignment. Per (doc_id, path), descriptors
    are ordered by (first source chunk, node_id); reference-carrying paths
    get cap=1 (orchestrator.py:2797-2807), others ``fill_cap``. Adds
    ``fill_batch`` (the ledger's fill_batches entry)."""
    paths = fill_paths(catalog)
    by_path = catalog.spec_by_path()
    ref_paths = [p for p in paths if path_has_reference_fields(by_path[p])]
    w = Window.partitionBy("doc_id", "path").orderBy(
        F.coalesce(F.array_min("chunk_ids"), F.lit(2**31 - 1)), "node_id"
    )
    cap = F.when(F.col("path").isin(ref_paths), F.lit(1)).otherwise(F.lit(fill_cap))
    return (
        skeleton.filter(F.col("path").isin(paths))
        .withColumn("_rank", F.row_number().over(w))
        .withColumn("fill_batch", F.floor((F.col("_rank") - 1) / cap).cast("int"))
        .drop("_rank")
    )


def scoped_context(descriptors: DataFrame, chunks: DataFrame, head_chars: int = GLOBAL_HEAD_CHARS) -> DataFrame:
    """Per-descriptor scoped fill context (orchestrator.py:2318-2347): the
    texts of the descriptor's source chunks in chunk order, with the global
    head (first ``head_chars`` of chunk 0) prepended when chunk 0 is not a
    source chunk. Descriptors with no source chunks fall back to the head."""
    d = descriptors.select("doc_id", "node_id", "path", "chunk_ids")
    ex = d.select("doc_id", "node_id", "path", F.explode_outer("chunk_ids").alias("chunk_id"))
    joined = ex.join(
        chunks.select("doc_id", "chunk_id", F.col("text").alias("_ctext")),
        ["doc_id", "chunk_id"],
        "left",
    )
    ctx = joined.groupBy("doc_id", "node_id", "path").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("chunk_id"), F.col("_ctext").alias("t")))
                ),
                lambda s: s["t"],
            ),
            "\n\n",
        ).alias("_scoped"),
        F.max(F.when(F.col("chunk_id") == 0, 1).otherwise(0)).alias("_has_head"),
    )
    heads = chunks.filter(F.col("chunk_id") == 0).select(
        "doc_id", F.substring("text", 1, head_chars).alias("_head")
    )
    return (
        ctx.join(heads, "doc_id", "left")
        .withColumn(
            "context",
            F.when(
                (F.col("_has_head") == 0) & F.col("_head").isNotNull(),
                F.concat_ws("\n\n", F.col("_head"), F.col("_scoped")),
            ).otherwise(F.coalesce(F.col("_scoped"), F.col("_head"), F.lit(""))),
        )
        .select("doc_id", "node_id", "path", "context")
    )


def fill_phase(
    chunks: DataFrame,
    skeleton: DataFrame,
    catalog: NodeCatalog,
    fill_cap: int = DEFAULT_FILL_CAP,
    extensions=None,
) -> DataFrame:
    """Run Phase 2: returns the skeleton entities with their ``fields`` map
    filled from the projected schemas. Exactly one output row per descriptor
    (pad semantics by construction; fill never changes ids — sanitize), plus
    ``fill_batch`` for the ledger. Entities at paths with empty fill schemas
    pass through with fill_batch = -1 (no fill job, like the reference's
    skipped paths)."""
    by_path = catalog.spec_by_path()
    prepared = prepare_fill(catalog)
    desc = assign_fill_batches(skeleton, catalog, fill_cap)
    ctx = scoped_context(desc, chunks)
    jobs = desc.join(ctx, ["doc_id", "node_id", "path"], "left")

    out_schema = (
        "doc_id string, path string, class string, ids map<string,string>, "
        "fields map<string,string>, chunk_ids array<int>, node_id string, fill_batch int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "path", "class", "ids", "fields", "chunk_ids", "node_id", "fill_batch"]
        for pdf in batches:
            rows = []
            it = zip(*(pdf[c] for c in [*cols, "context"]))
            for doc_id, path, cls, ids, fields, chunk_ids, node_id, fill_batch, context in it:
                spec = by_path.get(path)
                ids = dict(ids or {})
                filled = (
                    extract_fields(spec, ids, context or "", catalog, extensions, prepared)
                    if spec
                    else {}
                )
                base = dict(fields or {})
                base.update(filled)
                cids = [] if chunk_ids is None else list(chunk_ids)
                rows.append((doc_id, path, cls, ids, base, cids, node_id, int(fill_batch)))
            yield pd.DataFrame(rows, columns=cols)

    filled = jobs.mapInPandas(run, schema=out_schema)
    # null-safe complement: a NULL path makes BOTH `isin` and `~isin` NULL,
    # silently dropping the row from filled AND skipped — coalesce so
    # NULL-path rows pass through on the skipped branch
    skipped = skeleton.filter(
        ~F.coalesce(F.col("path").isin(fill_paths(catalog)), F.lit(False))
    ).withColumn("fill_batch", F.lit(-1).cast("int"))
    return filled.unionByName(skipped.select(*[c for c in filled.columns]))
