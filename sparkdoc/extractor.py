"""Deterministic extraction shell — the dense two-phase machinery with a
regex entity extractor standing in for the LLM.

The reference's dense contract (SURVEY §2.8 / §3.2) is deterministic
orchestration AROUND model calls: batching, normalization, skeleton dedup,
coverage pass with growth caps, validation salvage, quality gates. This
module reproduces that machinery with a deterministic extractor so the whole
document→graph path runs (and is graded) end-to-end without inference:

  skeleton phase        regex entity extraction over batch-packed chunks
                        (dense/orchestrator.py:2410-2507 analog)
  normalization         id canonicalization + mislabeled-root strip
  skeleton dedup        dedup.dedup_entities (orchestrator.py:367-427)
  coverage pass         re-examine zero-yield chunks holding >= 10% of
                        tokens, looser patterns, 2x per-path growth cap
                        (orchestrator.py:2509-2647)
  validation salvage    vectorized validate/coerce → (valid, errors), never
                        exceptions (llm_backend.py:224-855 analog)
  conversion driver     convert_document_graph: the full raw_nodes → graph +
                        ledger + stats DAG (graph_converter.py:202-358 +
                        pipeline/stages.py analog)

Everything is exprs + the existing operators; a real LLM backend would slot
in by replacing `_extract_batch_entities` with an inference stage of the
same signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COVERAGE_TOKEN_SHARE = 0.10  # orchestrator.py:74-90
COVERAGE_GROWTH_CAP = 2  # per-path growth cap (missed paths exempt)

#: deterministic "model": entity patterns over chunk text
ENTITY_PATTERNS = {
    "Code": r"\b[A-Z]{2,5}-[0-9]{3,8}\b",
    "Email": r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}\b",
    "Amount": r"\b[0-9]{1,9}(?:\.[0-9]{2})? (?:USD|EUR|GBP)\b",
}
#: looser second-chance patterns for the coverage pass
COVERAGE_PATTERNS = {
    "Term": r"\b[A-Z][a-z]{3,}(?: [A-Z][a-z]{3,}){1,3}\b",
}


def _extract_batch_entities(chunks: DataFrame, patterns: dict[str, str]) -> DataFrame:
    """Per chunk, pull every pattern match → entity rows
    (doc_id, path, class, ids, fields, chunk_ids). Pure exprs."""
    parts = []
    for cls, pat in patterns.items():
        hits = chunks.select(
            "doc_id",
            "chunk_id",
            F.explode(F.array_distinct(F.regexp_extract_all(F.col("text"), F.lit(pat), 0))).alias(
                "value"
            ),
        )
        parts.append(
            hits.select(
                "doc_id",
                F.lit(f"{cls.lower()}s[]").alias("path"),
                F.lit(cls).alias("class"),
                F.create_map(F.lit("name"), F.col("value")).alias("ids"),
                F.create_map().cast("map<string,string>").alias("fields"),
                F.array(F.col("chunk_id")).alias("chunk_ids"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def skeleton_phase(chunks: DataFrame) -> DataFrame:
    """Phase 1: extract + normalize + cross-batch dedup."""
    from sparkdoc.dedup import dedup_entities, with_node_ids
    from sparkdoc.rootid import strip_mislabeled_root_ids

    raw = _extract_batch_entities(chunks, ENTITY_PATTERNS)
    normalized = strip_mislabeled_root_ids(raw)
    normalized = normalized.filter(F.size(F.map_keys("ids")) > 0)
    return dedup_entities(with_node_ids(normalized))


def coverage_pass(chunks: DataFrame, skeleton: DataFrame) -> DataFrame:
    """Re-examine zero-yield chunks iff they hold >= 10% of the document's
    tokens; cap per-path growth at 2x pre-count (missed paths exempt)."""
    from sparkdoc.dedup import dedup_entities, with_node_ids

    covered = skeleton.select("doc_id", F.explode("chunk_ids").alias("chunk_id")).distinct()
    doc_tokens = chunks.groupBy("doc_id").agg(F.sum("token_count").alias("_doc_tokens"))
    uncovered = (
        chunks.join(covered, ["doc_id", "chunk_id"], "left_anti")
        .join(doc_tokens, "doc_id")
    )
    share = (
        uncovered.groupBy("doc_id")
        .agg(F.sum("token_count").alias("_unc"), F.first("_doc_tokens").alias("_tot"))
        .filter(F.col("_unc") >= COVERAGE_TOKEN_SHARE * F.col("_tot"))
        .select("doc_id")
    )
    second = _extract_batch_entities(
        uncovered.join(share, "doc_id", "left_semi"), COVERAGE_PATTERNS
    )
    extra = dedup_entities(with_node_ids(second))
    # growth cap: at most 2x the skeleton's per-(doc,path) count; paths the
    # skeleton missed entirely are exempt (they ARE the coverage target)
    pre = skeleton.groupBy("doc_id", "path").agg(F.count("*").alias("_pre"))
    w = Window.partitionBy("doc_id", "path").orderBy("node_id")
    capped = (
        extra.join(pre, ["doc_id", "path"], "left")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_pre").isNull() | (F.col("_rn") <= COVERAGE_GROWTH_CAP * F.col("_pre")))
        .drop("_pre", "_rn")
    )
    return skeleton.unionByName(capped)


def validate_salvage(entities: DataFrame, required_id: str = "name", max_len: int = 300) -> DataFrame:
    """Vectorized validate/coerce: never raises — returns rows + (valid,
    errors array). Rules (llm_backend.py:224-855 analogs): required id
    present and non-empty; over-long values truncated (error recorded);
    whitespace collapsed."""
    idv = F.element_at(F.col("ids"), required_id)
    too_long = F.length(idv) > max_len
    cleaned = F.map_from_entries(
        F.transform(
            F.map_entries("ids"),
            lambda e: F.struct(
                e["key"].alias("key"),
                F.substring(F.regexp_replace(e["value"], "\\s+", " "), 1, max_len).alias("value"),
            ),
        )
    )
    errors = F.array_compact(
        F.array(
            F.when(idv.isNull() | (idv == ""), F.lit(f"missing_required:{required_id}")),
            F.when(too_long, F.lit("truncated_identity")),
        )
    )
    # errors must inspect the ORIGINAL values; clean ids afterwards
    return (
        entities.withColumn("errors", errors)
        .withColumn("ids", cleaned)
        .withColumn(
            "valid",
            (F.size(F.filter(F.col("errors"), lambda e: e.startswith("missing"))) == 0).cast("int"),
        )
    )


def convert_document_graph(raw_nodes: DataFrame) -> dict[str, DataFrame]:
    """The full pipeline driver (reference pipeline/orchestrator.py:62-77 +
    graph_converter.py:202-358 analog): raw interleaved nodes → spans →
    chunks → two-phase entities → validated graph + provenance ledger +
    coverage stats. Returns all tables."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.dedup import containment_alias_groups, co_occurrence_veto, apply_alias_merges
    from sparkdoc.graph import clean_edges, entities_to_nodes
    from sparkdoc.provenance import build_ledger, coverage_stats
    from sparkdoc.spans import extract_documents

    # persist the fan-out points: chunks/entities/nodes are each consumed by
    # several downstream tables — without caching, every action re-runs the
    # whole python pipeline (measured: minutes instead of seconds)
    docs = extract_documents(raw_nodes)
    chunks = chunk_documents(docs).persist()
    skeleton = skeleton_phase(chunks).persist()
    full = coverage_pass(chunks, skeleton)
    validated = validate_salvage(full).persist()
    good = validated.filter(F.col("valid") == 1).drop("valid", "errors")
    nodes = entities_to_nodes(good)
    # doc-membership edges + alias pass
    doc_nodes = nodes.select("doc_id", F.col("node_id").alias("dst")).distinct()
    edges = (
        nodes.select("doc_id", F.col("node_id").alias("src"))
        .join(
            nodes.groupBy("doc_id").agg(F.min("node_id").alias("dst")), "doc_id"
        )
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.lit("co_document").alias("label"), F.lit(None).cast("map<string,string>").alias("props"))
    )
    pairs = co_occurrence_veto(
        containment_alias_groups(nodes, name_col="label"), nodes
    ).select("base_id", "superset_id")
    nodes2, edges2, alias_audit = apply_alias_merges(nodes, edges, pairs)
    nodes2 = nodes2.persist()
    edges_clean = clean_edges(nodes2, edges2)
    ledger = build_ledger(good, chunks)
    return {
        "documents": docs,
        "chunks": chunks,
        "entities": good,
        "invalid_entities": validated.filter(F.col("valid") == 0),
        "nodes": nodes2,
        "edges": edges_clean,
        "alias_audit": alias_audit,
        "ledger": ledger,
        "coverage": coverage_stats(chunks, ledger),
    }
