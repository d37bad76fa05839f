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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FURNITURE_BUDGET_CHARS = 1500  # orchestrator.py:115
SPARSE_FILL_THRESHOLD = 0.40  # llm_backend.py:857-918
SPARSE_MIN_DOC_CHARS = 400
SPARSE_MIN_LEAVES = 10
OVER_DISCOVERY_FACTOR = 5  # orchestrator.py:1983-2008


def is_class_name_echo(value: str, class_name: str) -> bool:
    """True when an id value merely echoes its class name
    (root_identity.py:47-52)."""
    v = re.sub(r"[^a-z0-9]", "", (value or "").lower())
    c = re.sub(r"[^a-z0-9]", "", (class_name or "").lower())
    return bool(v) and (v == c)


def strip_mislabeled_root_ids(entities: DataFrame) -> DataFrame:
    """Clear id values that are (a) digit-free multi-word prose in a
    numeric-named field, or (b) class-name echoes
    (orchestrator.py:147-183)."""
    numeric_field = F.col("e.key").rlike("(number|num|code|id)$")
    proseish = (~F.col("e.value").rlike("[0-9]")) & (
        F.size(F.split(F.col("e.value"), "\\s+")) >= 3
    )
    echo = (
        F.regexp_replace(F.lower(F.col("e.value")), "[^a-z0-9]", "")
        == F.regexp_replace(F.lower(F.col("class")), "[^a-z0-9]", "")
    )
    cleaned = F.map_from_entries(
        F.filter(
            F.transform(
                F.map_entries("ids"),
                lambda e: F.struct(
                    e["key"].alias("key"),
                    F.when(
                        (
                            e["key"].rlike("(number|num|code|id)$")
                            & (~e["value"].rlike("[0-9]"))
                            & (F.size(F.split(e["value"], "\\s+")) >= 3)
                        )
                        | (
                            F.regexp_replace(F.lower(e["value"]), "[^a-z0-9]", "")
                            == F.regexp_replace(F.lower(F.col("class")), "[^a-z0-9]", "")
                        ),
                        F.lit(None).cast("string"),
                    ).otherwise(e["value"]).alias("value"),
                ),
            ),
            lambda s: s["value"].isNotNull(),
        )
    )
    _ = (numeric_field, proseish, echo)  # documented predicates above
    return entities.withColumn("ids", cleaned)


def empty_identity_nodes(entities: DataFrame) -> DataFrame:
    """Nodes whose declared id fields are all empty
    (graph_converter.py:61-76)."""
    empty = F.size(F.filter(F.map_values("ids"), lambda v: v.isNotNull() & (v != ""))) == 0
    return entities.filter(empty).select("doc_id", "path", "class", "node_id")


def over_discovery_warnings(entities: DataFrame, root_path: str = "docs[]") -> DataFrame:
    """Paths whose instance count exceeds 5× the median non-root count per
    doc (orchestrator.py:1983-2008)."""
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
