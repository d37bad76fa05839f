"""Root-identity hygiene + audit gates.

Reference semantics reproduced:
  mislabeled-root-id strip   dense/orchestrator.py:147-183
  class-name echo check      core/utils/root_identity.py:47-52
  empty-identity integrity   graph_converter.py:61-76
  over-discovery warn        dense/orchestrator.py:1983-2008
  sparse-result check        llm_backend.py:857-918
  root-identity excerpts     dense/orchestrator.py:112-144 (head/tail +
                             furniture budget 1500 chars)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FURNITURE_BUDGET_CHARS = 1500  # orchestrator.py:115
SPARSE_FILL_THRESHOLD = 0.40  # llm_backend.py:857-918
SPARSE_MIN_DOC_CHARS = 400
SPARSE_MIN_LEAVES = 10
OVER_DISCOVERY_FACTOR = 5  # orchestrator.py:1983-2008


def is_class_name_echo(value, class_name: str) -> bool:
    """True when an id value merely echoes its class name
    (root_identity.py:47-52): non-string values are never echoes, and the
    comparison casefolds (parity-fuzzed in tests/test_reference_parity.py)."""
    if not isinstance(value, str) or not value.strip():
        return False
    v = re.sub(r"[^a-z0-9]", "", value.casefold())
    c = re.sub(r"[^a-z0-9]", "", (class_name or "").casefold())
    return bool(v) and (v == c)


def strip_mislabeled_root_ids(entities: DataFrame) -> DataFrame:
    """Clear id values that are (a) digit-free multi-word prose in a
    numeric-named field, or (b) class-name echoes
    (orchestrator.py:147-183)."""
    def numeric_field(e):
        return e["key"].rlike("(number|num|code|id)$")

    def proseish(e):
        return (~e["value"].rlike("[0-9]")) & (F.size(F.split(e["value"], "\\s+")) >= 3)

    def echo(e):
        return F.regexp_replace(F.lower(e["value"]), "[^a-z0-9]", "") == F.regexp_replace(
            F.lower(F.col("class")), "[^a-z0-9]", ""
        )

    # a value equal to the row's doc_id is GROUND TRUTH (root_entities keys
    # the root on doc_id), never a hallucinated echo — without this guard a
    # document named after the root class ('report' → class Report) loses
    # its root id here and the empty-ids filter drops the root row before
    # repair_root_identity can refill it
    cleaned = F.map_from_entries(
        F.filter(
            F.transform(
                F.map_entries("ids"),
                lambda e: F.struct(
                    e["key"].alias("key"),
                    F.when(
                        ((numeric_field(e) & proseish(e)) | echo(e))
                        & (e["value"] != F.col("doc_id")),
                        F.lit(None).cast("string"),
                    ).otherwise(e["value"]).alias("value"),
                ),
            ),
            lambda s: s["value"].isNotNull(),
        )
    )
    return entities.withColumn("ids", cleaned)


def empty_identity_nodes(entities: DataFrame) -> DataFrame:
    """Nodes whose declared id fields are all empty
    (graph_converter.py:61-76)."""
    empty = F.size(F.filter(F.map_values("ids"), lambda v: v.isNotNull() & (v != ""))) == 0
    return entities.filter(empty).select("doc_id", "path", "class", "node_id")


def over_discovery_warnings(entities: DataFrame, root_path: str = "") -> DataFrame:
    """Paths whose instance count exceeds 5× the median non-root count per
    doc (orchestrator.py:1983-2008). ``root_path`` defaults to this engine's
    root path '' — the root's single row must not enter (and drag down) the
    per-doc median."""
    counts = (
        entities.filter(F.col("path") != root_path)
        .groupBy("doc_id", "path")
        .agg(F.count("*").alias("n"))
    )
    med = counts.groupBy("doc_id").agg(
        F.percentile_approx("n", 0.5).alias("median_n")
    )
    return (
        counts.join(med, "doc_id")
        .filter(F.col("n") > OVER_DISCOVERY_FACTOR * F.col("median_n"))
        .select("doc_id", "path", "n", "median_n")
    )


def sparse_result_flags(
    filled: DataFrame,
    doc_chars_col: str = "n_chars",
    leaves_col: str = "attrs",
) -> DataFrame:
    """Per doc: non-empty leaf fraction < 0.40 (docs >= 400 chars, >= 10
    leaves) ⇒ sparse ⇒ re-extract candidate (llm_backend.py:857-918)."""
    total = F.size(F.map_keys(leaves_col))
    filled_n = F.size(F.filter(F.map_values(leaves_col), lambda v: v.isNotNull() & (v != "")))
    frac = F.when(total > 0, filled_n / total).otherwise(1.0)
    return filled.withColumn(
        "is_sparse",
        (
            (F.col(doc_chars_col) >= SPARSE_MIN_DOC_CHARS)
            & (total >= SPARSE_MIN_LEAVES)
            & (frac < SPARSE_FILL_THRESHOLD)
        ).cast("int"),
    ).withColumn("fill_fraction", F.round(frac, 4))


def root_identity_excerpts(
    spans: DataFrame, head_spans: int = 6, tail_spans: int = 4
) -> DataFrame:
    """Per doc: head+tail excerpt + page-furniture text (budgeted) — the
    input of the root-identity micro-pass (orchestrator.py:112-144)."""
    content = spans.filter(~F.col("kind").isin("page_break"))
    agg = content.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("offset", "kind", "text"))).alias("ss")
    )
    non_furn = F.filter(F.col("ss"), lambda s: s["kind"] != "furniture")
    furn = F.filter(F.col("ss"), lambda s: s["kind"] == "furniture")
    head = F.array_join(
        F.transform(F.slice(non_furn, 1, head_spans), lambda s: s["text"]), "\n"
    )
    n = F.size(non_furn)
    tail = F.when(
        n > head_spans,
        F.array_join(
            F.transform(
                F.slice(non_furn, F.greatest(n - tail_spans + 1, F.lit(head_spans + 1)), tail_spans),
                lambda s: s["text"],
            ),
            "\n",
        ),
    ).otherwise("")
    furniture = F.substring(
        F.array_join(F.array_distinct(F.transform(furn, lambda s: s["text"])), "\n"),
        1,
        FURNITURE_BUDGET_CHARS,
    )
    return agg.select("doc_id", head.alias("head_excerpt"), tail.alias("tail_excerpt"), furniture.alias("furniture_excerpt"))


# --------------------------------------------------------------------------
# Root-identity resolution micro-pass + repair (the reference's two root-only
# identity rescues, in pipeline order: resolve from excerpts, then repair).
# --------------------------------------------------------------------------

ROOT_ID_MAX_VALUE_CHARS = 80  # orchestrator.py:114 / root_identity.py:39
#: default deterministic proposer: a reference-code shape (letters+digits with
#: a separator) — the stand-in for the micro-pass LLM call (SURVEY §2.11 slot)
DEFAULT_ROOT_ID_PATTERN = r"\b([A-Z]{2,}[-_/][A-Z0-9][A-Z0-9-]{2,})\b"


def _squash(col):
    """Lowercased [a-z0-9]-only projection (orchestrator._squash_anchor)."""
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def resolve_root_identity(
    entities: DataFrame,
    excerpts: DataFrame,
    catalog,
    patterns: dict[str, str] | None = None,
    proposals: DataFrame | None = None,
    extensions=None,
) -> DataFrame:
    """Fill all-empty root identities from head/tail/furniture excerpts
    (orchestrator.py:1867-1952).

    Runs only for roots whose declared id fields are ALL empty after fill.
    Proposed values come from ``proposals`` (doc_id, field, value), from a
    registered ``extensions.root_id_proposer`` callable (the LLM micro-pass
    slot, SURVEY §2.11), or, by default, from per-field regexes over the
    excerpt.
    A value is accepted only when non-empty, <= 80 chars, and verbatim-anchored
    in the excerpt (squash containment) — fail-empty, never fail-wrong; a
    refused value leaves the field empty for the stem fallback
    (repair_root_identity).
    """
    spec = catalog.spec_by_path().get("")
    if spec is None or not spec.id_fields:
        return entities
    roots = entities.filter(F.col("path") == "")
    others = entities.filter(F.col("path") != "")

    excerpt = F.concat_ws(
        "\n[...]\n",
        F.coalesce(F.col("head_excerpt"), F.lit("")),
        F.coalesce(F.col("furniture_excerpt"), F.lit("")),
        F.coalesce(F.col("tail_excerpt"), F.lit("")),
    )
    ex = excerpts.select("doc_id", excerpt.alias("_excerpt"))

    all_empty = F.lit(True)
    for fld in spec.id_fields:
        v = F.element_at(F.col("ids"), fld)
        all_empty = all_empty & (v.isNull() | (F.trim(v) == ""))

    j = roots.join(ex, "doc_id", "left").withColumn("_resolve", all_empty)

    if proposals is not None:
        # pivot the proposal rows into one map per doc (the UDF slot output)
        pmap = proposals.groupBy("doc_id").agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("field"), F.col("value")))
            ).alias("_props")
        )
        j = j.join(pmap, "doc_id", "left")
        def _proposed(fld):
            return F.element_at(F.col("_props"), fld)
    elif extensions is not None and extensions.root_id_proposer is not None:
        from pyspark.sql.types import StringType

        proposer = extensions.root_id_proposer

        def _proposed(fld):
            @F.pandas_udf(StringType())
            def _p(excerpt: pd.Series) -> pd.Series:
                out = []
                for e in excerpt:
                    if e is None:
                        out.append(None)  # row not resolving — skip the call
                        continue
                    try:
                        out.append(proposer(e, fld))
                    except Exception:
                        out.append(None)  # the slot must never break the pass
                return pd.Series(out, dtype=object)

            # null out excerpts for rows that aren't resolving so the (LLM)
            # proposer is only invoked for roots that actually need identity
            # — F.when gates ASSIGNMENT, not evaluation, so feeding the raw
            # column would call the proposer for every root in the corpus
            return _p(F.when(F.col("_resolve"), F.col("_excerpt")))
    else:
        pats = patterns or {}

        def _proposed(fld):
            # user patterns without a capture group extract the whole match
            # (group 0) — hard-coded group 1 raises at runtime, the same
            # crash class fixed in discover_entities' group_idx fallback
            pat = pats.get(fld, DEFAULT_ROOT_ID_PATTERN)
            group_idx = 1 if re.compile(pat).groups >= 1 else 0
            return F.regexp_extract(
                F.coalesce(F.col("_excerpt"), F.lit("")), pat, group_idx
            )

    def _drop_key(m, fld):
        return F.map_filter(m, lambda k, _v: k != F.lit(fld))

    new_ids = F.col("ids")
    for fld in spec.id_fields:
        raw = F.trim(F.coalesce(_proposed(fld), F.lit("")))
        ok = (
            (F.length(raw) > 0)
            & (F.length(raw) <= ROOT_ID_MAX_VALUE_CHARS)
            & (F.length(_squash(raw)) > 0)
            & F.coalesce(_squash(F.col("_excerpt")).contains(_squash(raw)), F.lit(False))
        )
        new_ids = F.when(
            F.col("_resolve") & ok,
            F.map_concat(_drop_key(new_ids, fld), F.create_map(F.lit(fld), raw)),
        ).otherwise(new_ids)

    resolved = j.withColumn("ids", new_ids).drop("_excerpt", "_resolve", "_props")
    resolved = _rekey_after_id_mutation(resolved, entities.columns)
    keep = entities.columns
    return resolved.select(*keep).unionByName(others.select(*keep))


def _rekey_after_id_mutation(roots: DataFrame, columns: list[str]) -> DataFrame:
    """node_id = hash(class + canonical ids) with NO doc component — any pass
    that mutates root ids (echo clear, stem fallback, excerpt resolve) must
    recompute it, or every doc whose root id changed the same way collapses
    into ONE graph node and the registry invariant behind join-free
    reference-edge derivation (same class+ids ⇔ node_id) breaks."""
    if "node_id" not in columns:
        return roots
    from sparkdoc.dedup import node_id_expr

    return roots.withColumn("node_id", node_id_expr(F.col("class"), F.col("ids")))


def repair_root_identity(entities: DataFrame, catalog, stem_col: str = "doc_id") -> DataFrame:
    """Root-only identity repair (core/utils/root_identity.py:67-110):

    1. clear id values that echo the template class name (schema echo, never
       document data);
    2. when EVERY declared root id field is then empty, set the FIRST id field
       to the source stem (<= 80 chars) — the root is a singleton, so a
       synthetic identity is safe for the root ONLY; a partially-filled
       identity is document data and is never touched.
    """
    spec = catalog.spec_by_path().get("")
    if spec is None or not spec.id_fields:
        return entities
    id_fields = list(spec.id_fields)
    roots = entities.filter(F.col("path") == "")
    others = entities.filter(F.col("path") != "")

    cls_canon = _squash(F.col("class"))
    cleared = F.map_from_entries(
        F.filter(
            F.transform(
                F.map_entries("ids"),
                lambda e: F.struct(
                    e["key"].alias("key"),
                    F.when(_squash(e["value"]) == cls_canon, F.lit(None).cast("string"))
                    .otherwise(e["value"])
                    .alias("value"),
                ),
            ),
            lambda s: s["value"].isNotNull() & (F.trim(s["value"]) != ""),
        )
    )
    roots = roots.withColumn("ids", cleared)

    all_empty = F.lit(True)
    for fld in id_fields:
        v = F.element_at(F.col("ids"), fld)
        all_empty = all_empty & (v.isNull() | (F.trim(v) == ""))
    stem = F.trim(F.col(stem_col).cast("string"))
    fallback = all_empty & (F.length(stem) > 0) & (F.length(stem) <= ROOT_ID_MAX_VALUE_CHARS)
    roots = roots.withColumn(
        "ids",
        F.when(fallback, F.map_concat(F.col("ids"), F.create_map(F.lit(id_fields[0]), stem)))
        .otherwise(F.col("ids")),
    )
    roots = _rekey_after_id_mutation(roots, entities.columns)
    keep = entities.columns
    return roots.select(*keep).unionByName(others.select(*keep))


def rescue_invalid_roots(validated: DataFrame, catalog) -> DataFrame:
    """Run the root-identity repair on salvage output BEFORE the valid filter
    (reference order: root rescue precedes validation, root_identity.py:67-110
    via strategies/many_to_one.py:28).

    salvage_entities marks any row with an empty declared id invalid — so
    running repair only on valid rows makes the 'all id fields empty → stem
    fallback' branch dead code. Instead: repair all root rows, then flip
    ``valid`` back to 1 for roots whose ONLY failure was the missing-identity
    error and whose id fields are now all filled (the stem rescue). Rows
    invalid for other reasons (terminal salvage errors, user validators) stay
    invalid; non-root rows are untouched."""
    spec = catalog.spec_by_path().get("")
    if spec is None or not spec.id_fields or "valid" not in validated.columns:
        return repair_root_identity(validated, catalog)
    repaired = repair_root_identity(validated, catalog)
    # the PRIMARY id field carries the root's identity (root_entities keys it
    # on doc_id; the stem fallback refills it). Secondary root id fields have
    # no deterministic source in this shell (resolve_root_identity is the
    # opt-in completion micro-pass), so requiring ALL of them here would make
    # every multi-id-field root permanently invalid — the rescue accepts a
    # filled primary and drops only the missing-identity errors.
    primary = F.element_at(F.col("ids"), spec.id_fields[0])
    id_filled = primary.isNotNull() & (F.trim(primary) != "")
    only_missing_id = (
        F.size(F.filter("errors", lambda e: ~e.startswith("missing_required:"))) == 0
    )
    rescued = (
        (F.col("path") == "") & (F.col("valid") == 0) & only_missing_id & id_filled
    )
    return repaired.withColumn(
        "errors",
        F.when(rescued, F.filter("errors", lambda e: ~e.startswith("missing_required:")))
        .otherwise(F.col("errors")),
    ).withColumn("valid", F.when(rescued, F.lit(1)).otherwise(F.col("valid")))
