"""Canonical StructTypes for every table the engine reads or writes.

Shapes follow BASELINE.json ``input_hint`` (documents) and FIXTURES.md
F1-F5; the chunk record mirrors the reference's ChunkRecord
(reference: core/provenance/models.py:126-155), the graph tables mirror its
CSV export shape (reference: core/exporters/csv_exporter.py:61-111).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# --- F1: the authoritative input/output table -------------------------------

SPAN = StructType(
    [
        StructField("kind", StringType(), False),
        StructField("text", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("offset", IntegerType(), False),
    ]
)

#: kind vocabulary (reference DocLang tags, doclang_format.py:32-40; furniture
#: = page header/footer content, orchestrator.py:117,127-144)
SPAN_KINDS = (
    "heading",
    "text",
    "list",
    "table",
    "picture",
    "caption",
    "furniture",
    "page_break",
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN, False), False),
    ]
)

# --- F2: flattened DOM/layout node table (pre-span input) -------------------

RAW_NODES = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("node_id", IntegerType(), False),
        StructField("parent_id", IntegerType(), True),
        StructField("tag", StringType(), False),
        StructField("text", StringType(), True),
        StructField("n_chars", IntegerType(), False),
        # characters inside anchor text, NOT a link count: the boilerplate
        # rule is Boilerpipe link density (n_links / n_chars > 0.5)
        StructField("n_links", IntegerType(), False),
        StructField("page_no", IntegerType(), False),
        StructField("bbox", ArrayType(IntegerType(), False), True),  # [l,t,r,b]
        StructField("coord_origin", StringType(), False),  # TOPLEFT|BOTTOMLEFT
        StructField("page_width", IntegerType(), True),
        StructField("page_height", IntegerType(), True),
    ]
)

# --- F3: chunk table (reference ChunkRecord, provenance/models.py:126-155) --

CHUNKS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("chunk_id", IntegerType(), False),
        StructField("batch_index", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("token_count", IntegerType(), False),
        StructField("page_numbers", ArrayType(IntegerType(), False), False),
        StructField("doc_item_refs", ArrayType(StringType(), False), False),
        StructField("headings", ArrayType(StringType(), False), False),
        StructField("text_hash", StringType(), False),  # blake2b digest_size=8 hex
        StructField("char_length", IntegerType(), False),
        StructField("resplit_of", IntegerType(), True),
    ]
)

# --- F4: entity rows (identity/dedup layer input) ----------------------------

ENTITIES = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("path", StringType(), False),
        StructField("class", StringType(), False),
        StructField("ids", MapType(StringType(), StringType(), False), False),
        StructField("fields", MapType(StringType(), StringType(), True), False),
        StructField("chunk_ids", ArrayType(IntegerType(), False), False),
    ]
)

# --- graph tables (reference csv_exporter.py:61-111 shape) -------------------

NODES = StructType(
    [
        StructField("node_id", StringType(), False),
        StructField("doc_id", StringType(), True),
        StructField("node_class", StringType(), False),
        StructField("label", StringType(), False),
        StructField("attrs", MapType(StringType(), StringType(), True), False),
        StructField("provenance", StringType(), True),  # JSON compact view
    ]
)

EDGES = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
        StructField("label", StringType(), False),
        StructField("props", MapType(StringType(), StringType(), True), True),
    ]
)

# --- provenance ledger (reference provenance/models.py:157-225) --------------

ANCHOR = StructType(
    [
        StructField("chunk_id", IntegerType(), False),
        StructField("kind", StringType(), False),  # observed|verbatim|derived|reconciled
        StructField("span", ArrayType(IntegerType(), False), False),  # [start, end)
    ]
)

#: anchor kind strength ordering (reference provenance/models.py:22-27)
ANCHOR_KIND_STRENGTH = {"verbatim": 3, "observed": 2, "reconciled": 1, "derived": 0}

LEDGER = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("identity_key", StringType(), False),
        StructField("path", StringType(), False),
        StructField("ids", MapType(StringType(), StringType(), False), False),
        StructField("anchors", ArrayType(ANCHOR, False), False),
    ]
)

# --- metrics / lineage (north rule: per-partition commits) -------------------

METRICS = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("n_docs", LongType(), False),
        StructField("n_spans", LongType(), False),
        StructField("n_chunks", LongType(), False),
        StructField("wall_ms", LongType(), False),
        StructField("commit_seq", LongType(), False),
        # per-format doc counts as a sorted JSON object ('' for non-mixed
        # runs) — the lineage a mixed/WARC ingest commit carries so a
        # resumed/audited run can account for binary/json rejects per bucket
        StructField("fmt_counts", StringType(), True),
    ]
)
