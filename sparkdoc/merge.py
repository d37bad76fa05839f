"""Merging: description merge, deep model merge, multi-graph union-fold.

Reference semantics reproduced:
  sentence-dedup description merge   core/utils/description_merger.py:20-105
  deep dict merge (first-wins)       core/utils/dict_merger.py:17-321
  multi-graph merge (union-fold)     core/merge/merger.py:242-289,
                                     node_folder.py, policy.py:40-48
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def truncate_at_sentence_boundary(text: str, max_length: int) -> str:
    """Cut at last .!? before max_length (description_merger.py:20-42)."""
    if len(text) <= max_length:
        return text
    head = text[:max_length]
    best = max(head.rfind("."), head.rfind("!"), head.rfind("?"))
    return head[: best + 1] if best > 0 else head


def merge_descriptions(parts: list[str], max_length: int = 1000) -> str:
    """Sentence-split dedup merge, order-preserving, boundary-truncated
    (description_merger.py:45-105)."""
    seen: set[str] = set()
    out: list[str] = []
    for part in parts:
        if not part:
            continue
        for sent in _SENT_RE.split(part.strip()):
            key = re.sub(r"\s+", " ", sent.strip().lower())
            if key and key not in seen:
                seen.add(key)
                out.append(sent.strip())
    return truncate_at_sentence_boundary(" ".join(out), max_length)


def deep_merge_dicts(base: dict, extra: dict, description_fields: tuple[str, ...] = ("description", "summary", "notes")) -> dict:
    """Recursive first-wins merge (dict_merger.py:17-321 core rules):
    skip empty incoming values; dicts recurse; lists union by content identity
    (dedup via canonical repr, order-preserving); description fields merge by
    sentence dedup; scalars keep base."""
    import json

    out = dict(base)
    for k, v in extra.items():
        if v in (None, "", [], {}):
            continue
        cur = out.get(k)
        if cur in (None, "", [], {}):
            out[k] = v
        elif isinstance(cur, dict) and isinstance(v, dict):
            out[k] = deep_merge_dicts(cur, v, description_fields)
        elif isinstance(cur, list) and isinstance(v, list):
            seen = {json.dumps(x, sort_keys=True, default=str) for x in cur}
            merged = list(cur)
            for x in v:
                key = json.dumps(x, sort_keys=True, default=str)
                if key not in seen:
                    seen.add(key)
                    merged.append(x)
            out[k] = merged
        elif k in description_fields and isinstance(cur, str) and isinstance(v, str):
            out[k] = merge_descriptions([cur, v])
        # else scalar conflict: first wins
    return out


# --- multi-graph merge (relational union-fold) -----------------------------------


def merge_graphs(
    inputs: list[tuple[DataFrame, DataFrame]],
    precedence: str = "input_order",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """N-way graph merge: unionByName + fold by node_id.

    precedence: 'input_order' (earlier input wins per attr) or 'richest'
    (most filled attrs wins per node, policy.py:19-23). Edges union-distinct.
    Returns (nodes, edges, conflicts) where conflicts records attr-level
    disagreements (merger report analog, merger.py:947-971).
    """
    tagged = []
    for i, (n, _) in enumerate(inputs):
        tagged.append(n.withColumn("_src", F.lit(i)))
    all_nodes = tagged[0]
    for t in tagged[1:]:
        all_nodes = all_nodes.unionByName(t)

    exploded = all_nodes.select(
        "node_id", "node_class", "label", "_src",
        F.explode_outer("attrs").alias("k", "v"),
    ).filter(F.col("v").isNotNull() & (F.col("v") != ""))
    richness = F.count("*").over(Window.partitionBy("node_id", "_src"))
    if precedence == "richest":
        order = F.struct((-richness).alias("r"), F.col("_src").alias("s"))
    else:
        order = F.struct(F.col("_src").alias("s"), F.lit(0).alias("r"))
    winner = exploded.withColumn("_ord", order).groupBy("node_id", "k").agg(
        F.min_by("v", F.col("_ord")).alias("v"),
        F.countDistinct("v").alias("_nvals"),
    )
    conflicts = winner.filter(F.col("_nvals") > 1).select(
        "node_id", F.col("k").alias("attr"), F.col("_nvals").alias("n_variants")
    )
    folded = winner.groupBy("node_id").agg(
        F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("attrs")
    )
    # node set = every distinct node_id (first occurrence wins for label/class/
    # provenance); the attr fold is LEFT-joined so a node whose attrs are all
    # empty still survives with an empty map — the reference merger keeps such
    # nodes, and dropping them here left dangling edges (validate_graph red).
    label_pick = all_nodes.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("node_id").orderBy("_src"))
    ).filter(F.col("_rn") == 1).select("node_id", "node_class", "label", "doc_id", "provenance")
    nodes = label_pick.join(folded, "node_id", "left").withColumn(
        "attrs", F.coalesce(F.col("attrs"), F.create_map().cast("map<string,string>"))
    )
    nodes = nodes.select("node_id", "doc_id", "node_class", "label", "attrs", "provenance")

    all_edges = inputs[0][1]
    for _, e in inputs[1:]:
        all_edges = all_edges.unionByName(e)
    edges = all_edges.dropDuplicates(["src", "dst", "label"])
    return nodes, edges, conflicts


def enforce_closed_catalogs(nodes: DataFrame, edges: DataFrame, catalog_classes: list[str]) -> tuple[DataFrame, DataFrame]:
    """graph_converter.py:431-494 analog: for catalog classes, drop reference
    edges pointing at catalog members that exist ONLY as catalog targets
    (every in-edge marked) — here simplified to: drop edges whose dst node of
    a catalog class has no meaningful attrs beyond its identity.

    Guard: if ALL members of the class would drop, keep everything."""
    cat = nodes.filter(F.col("node_class").isin(catalog_classes))
    rich = F.size(F.filter(F.map_values("attrs"), lambda v: v.isNotNull() & (v != "")))
    flagged = cat.withColumn("_catalog_only", (rich <= 1).cast("int"))
    guard = flagged.groupBy("node_class").agg(
        (F.sum("_catalog_only") == F.count("*")).alias("_all_catalog")
    )
    droppable = (
        flagged.join(guard, "node_class")
        .filter((F.col("_catalog_only") == 1) & ~F.col("_all_catalog"))
        .select(F.col("node_id").alias("dst"))
    )
    kept_edges = edges.join(droppable, "dst", "left_anti")
    return nodes, kept_edges
