"""Graph assembly, cleaning, and stats — nodes/edges DataFrames.

Relational re-expression of the reference's networkx passes:
  phantom-node removal           graph_cleaner.py:189-271
  self/orphan/duplicate edges    graph_cleaner.py:81-109,319-364
  keyword-list cap (5)           graph_cleaner.py:93-109
  validation                     graph_cleaner.py:415-474
  stats                          stats_calculator.py:10-71
  entity explode → nodes/edges   graph_converter.py:496-818
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.dedup import with_node_ids

KEYWORD_CAP = 5  # graph_cleaner.py:93-109
META_PREFIX = "__"


def entities_to_nodes(entities: DataFrame) -> DataFrame:
    """F4 entity rows → NODES-shaped table. The nodes pass: duplicate
    instances enrich the first (first non-empty wins) — expressed as
    map-concat fold with earliest-chunk precedence (graph_converter.py:
    496-689 analog, already folded by dedup_entities upstream)."""
    df = entities if "node_id" in entities.columns else with_node_ids(entities)
    # try_element_at / F.get: ANSI mode (Spark 4 default) makes plain
    # element_at THROW on a missing map key or an empty values array — the
    # node_id fallback must stay reachable for entities with empty ids.
    label = F.coalesce(
        F.try_element_at(F.col("ids"), F.lit("name")),
        F.try_element_at(F.col("ids"), F.lit("title")),
        F.get(F.map_values("ids"), F.lit(0)),
        F.col("node_id"),
    )
    return df.select(
        "node_id",
        "doc_id",
        F.col("class").alias("node_class"),
        label.alias("label"),
        # ids-first precedence made explicit: a fields key shadowing an id
        # key would raise DUPLICATED_MAP_KEY under Spark's default dedup
        # policy (salvage happens to keep them disjoint on the main path, but
        # external/pre-salvage entities must not crash here)
        F.map_concat(
            F.col("ids"),
            F.map_filter(
                F.coalesce(F.col("fields"), F.create_map()),
                lambda k, v: ~F.map_contains_key(F.col("ids"), k),
            ),
        ).alias("attrs"),
        F.lit(None).cast("string").alias("provenance"),
        F.col("chunk_ids"),
    )


def is_meaningful(col) -> F.Column:
    """graph_cleaner.py:37-78: None/''/empty-collection not meaningful;
    '0'/'false' ARE meaningful."""
    return col.isNotNull() & (col != "")


def remove_phantom_nodes(nodes: DataFrame, edges: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Drop nodes with no meaningful non-meta attr; audit each dropped
    (source,label,target) relationship (graph_cleaner.py:189-271).

    Returns (nodes, edges, dropped_rels_audit).
    """
    meaningful = F.coalesce(  # NULL attrs → phantom, not three-valued limbo
        F.exists(
            F.map_entries("attrs"),
            lambda e: (~e["key"].startswith(META_PREFIX)) & is_meaningful(e["value"]),
        ),
        F.lit(False),
    )
    flagged = nodes.withColumn("_keep", meaningful)
    phantoms = flagged.filter(~F.col("_keep")).select("node_id")
    audit = (
        edges.join(phantoms.withColumnRenamed("node_id", "src"), "src", "left_semi")
        .unionByName(edges.join(phantoms.withColumnRenamed("node_id", "dst"), "dst", "left_semi"))
        .dropDuplicates(["src", "dst", "label"])
    )
    kept = flagged.filter(F.col("_keep")).drop("_keep")
    e = (
        edges.join(phantoms.withColumnRenamed("node_id", "src"), "src", "left_anti")
        .join(phantoms.withColumnRenamed("node_id", "dst"), "dst", "left_anti")
    )
    return kept, e, audit


def clean_edges(
    nodes: DataFrame, edges: DataFrame, keys: tuple[str, ...] = ("src", "dst", "label")
) -> DataFrame:
    """Self-loop drop, endpoint-exists semi-joins, ``keys`` distinct
    (graph_cleaner.py:81-109,319-364). Pass doc-attributed keys
    (("doc_id","src","dst","label")) while edges still carry their minting
    document so per-document passes (cardinality demotion) stay exact; the
    pipeline collapses to (src,dst,label) at the output boundary."""
    ids = nodes.select("node_id")
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .join(ids.withColumnRenamed("node_id", "src"), "src", "left_semi")
        .join(ids.withColumnRenamed("node_id", "dst"), "dst", "left_semi")
        .dropDuplicates(list(keys))
    )


def cap_keywords(nodes: DataFrame, list_attr: str = "keywords", sep: str = "|") -> DataFrame:
    """Truncate a ``sep``-packed list attribute to KEYWORD_CAP entries."""
    import re as _re

    kw = F.try_element_at(F.col("attrs"), F.lit(list_attr))
    capped = F.array_join(F.slice(F.split(kw, _re.escape(sep)), 1, KEYWORD_CAP), sep)
    return nodes.withColumn(
        "attrs",
        F.when(
            kw.isNotNull(),
            F.map_concat(
                F.map_filter(F.col("attrs"), lambda k, v: k != list_attr),
                F.create_map(F.lit(list_attr), capped),
            ),
        ).otherwise(F.col("attrs")),
    )


def reverse_edges(edges: DataFrame) -> DataFrame:
    """reverse_edges option: add reverse_<label> mirror edges
    (graph_converter.py:257-266)."""
    rev = edges.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.concat(F.lit("reverse_"), F.col("label")).alias("label"),
        "props",
    )
    return edges.unionByName(rev)


def validate_graph(nodes: DataFrame, edges: DataFrame) -> dict:
    """graph_cleaner.py:415-474: endpoints exist, no empty nodes, non-empty
    graph. Returns violation counts (all zero = valid)."""
    ids = nodes.select("node_id")
    dangling = (
        edges.join(ids.withColumnRenamed("node_id", "src"), "src", "left_anti").count()
        + edges.join(ids.withColumnRenamed("node_id", "dst"), "dst", "left_anti").count()
    )
    empty_nodes = nodes.filter(F.size(F.map_keys("attrs")) == 0).count()
    n_nodes = nodes.count()
    return {
        "dangling_edges": int(dangling),
        "empty_nodes": int(empty_nodes),
        "n_nodes": int(n_nodes),
        "is_valid": dangling == 0 and empty_nodes == 0 and n_nodes > 0,
    }


def graph_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """stats_calculator.py:10-71: per-class node counts, per-label edge
    counts, average degree — one row per metric (metric, key, value)."""
    node_types = (
        nodes.groupBy("node_class")
        .count()
        .select(F.lit("nodes_per_class").alias("metric"), F.col("node_class").alias("key"), F.col("count").cast("double").alias("value"))
    )
    edge_types = (
        edges.groupBy("label")
        .count()
        .select(F.lit("edges_per_label").alias("metric"), F.col("label").alias("key"), F.col("count").cast("double").alias("value"))
    )
    # avg degree = 2E/N over ALL nodes (stats_calculator semantics): an
    # endpoint-only average excludes isolated nodes from the denominator and
    # inflates the metric (and yields null instead of 0 on an edgeless graph)
    avg_deg = (
        edges.agg(F.count("*").alias("_e"))
        .crossJoin(nodes.agg(F.count("*").alias("_n")))
        .select(
            F.lit("avg_degree").alias("metric"),
            F.lit("").alias("key"),
            F.when(F.col("_n") > 0, 2.0 * F.col("_e") / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias("value"),
        )
    )
    totals = nodes.agg(F.count("*").cast("double").alias("value")).select(
        F.lit("n_nodes").alias("metric"), F.lit("").alias("key"), "value"
    ).unionByName(
        edges.agg(F.count("*").cast("double").alias("value")).select(
            F.lit("n_edges").alias("metric"), F.lit("").alias("key"), "value"
        )
    )
    return totals.unionByName(node_types).unionByName(edge_types).unionByName(avg_deg)
