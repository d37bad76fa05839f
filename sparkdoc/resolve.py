"""Parent-resolution ladder: attach child entities to parents.

The reference resolves child→parent by a never-wrong fallback ladder
(_ParentResolver.resolve, dense/orchestrator.py:785-1019). Re-expressed as a
cascade of real Spark joins — each rung computes ONLY for rows the previous
rungs left unresolved, and every rung is uniqueness-guarded (ambiguity ⇒
fall through):

  R1 exact    equi-join on (doc_id, parent_path, canonical parent key)
  R2 singleton unique single parent instance on that path in the doc
  R3 contain  unique fuzzy containment (child key ⊂ parent canonical label)
  R4 co-chunk unique parent sharing a first-emission chunk
  R5 owner    chunk-owner of the child's first chunk (serialize.chunk_owner_map)
  R6 adjacent nearest PRECEDING parent by emission order (sort-based as-of
              join analog via max_by window)
  R7 bucket   synthesized placeholder parent per (doc_id, parent_path)

children: (doc_id, child_id, parent_path, parent_key, chunk_ids, emission)
parents:  (doc_id, node_id, path, label, chunk_ids, emission)
returns children + (parent_id, resolved_by)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkdoc.dedup import _canon_name


def _unresolved(df: DataFrame) -> DataFrame:
    return df.filter(F.col("parent_id").isNull())


def _apply(df: DataFrame, rung: DataFrame, name: str) -> DataFrame:
    """Left-join a rung's (doc_id, child_id, _pid) and fill unresolved."""
    out = df.join(rung, ["doc_id", "child_id"], "left")
    return out.select(
        *[c for c in df.columns if c not in ("parent_id", "resolved_by")],
        F.coalesce(F.col("parent_id"), F.col("_pid")).alias("parent_id"),
        F.coalesce(
            F.col("resolved_by"), F.when(F.col("_pid").isNotNull(), name)
        ).alias("resolved_by"),
    )


def resolve_parents(children: DataFrame, parents: DataFrame) -> DataFrame:
    p = parents.select(
        "doc_id",
        F.col("node_id").alias("_p_node"),
        F.col("path").alias("_p_path"),
        _canon_name()(F.col("label")).alias("_p_canon"),
        F.col("chunk_ids").alias("_p_chunks"),
        F.col("emission").alias("_p_emission"),
    )
    c = children.withColumn("_c_canon", _canon_name()(F.col("parent_key"))).withColumn(
        "parent_id", F.lit(None).cast("string")
    ).withColumn("resolved_by", F.lit(None).cast("string"))

    # R1 exact canonical key
    r1 = (
        _unresolved(c)
        .join(
            p,
            (F.col("doc_id") == p["doc_id"])
            & (F.col("parent_path") == p["_p_path"])
            & (F.col("_c_canon") == p["_p_canon"])
            & (F.length("_c_canon") > 0),
        )
        .groupBy(c["doc_id"].alias("doc_id"), "child_id")
        .agg(F.min("_p_node").alias("_pid"), F.count("*").alias("_n"))
        .filter(F.col("_n") == 1)
        .drop("_n")
    )
    c = _apply(c, r1, "exact")

    # R2 unique singleton parent on path
    singles = (
        p.groupBy("doc_id", "_p_path")
        .agg(F.min("_p_node").alias("_pid"), F.count("*").alias("_n"))
        .filter(F.col("_n") == 1)
        .drop("_n")
        .withColumnRenamed("_p_path", "parent_path")
    )
    r2 = _unresolved(c).join(singles, ["doc_id", "parent_path"]).select("doc_id", "child_id", "_pid")
    c = _apply(c, r2, "singleton")

    # R3 unique fuzzy containment (child key ⊂ parent canon, len >= 4)
    r3 = (
        _unresolved(c)
        .filter(F.length("_c_canon") >= 4)
        .join(
            p,
            (F.col("doc_id") == p["doc_id"])
            & (F.col("parent_path") == p["_p_path"])
            & p["_p_canon"].contains(F.col("_c_canon")),
        )
        .groupBy(c["doc_id"].alias("doc_id"), "child_id")
        .agg(F.min("_p_node").alias("_pid"), F.countDistinct("_p_node").alias("_n"))
        .filter(F.col("_n") == 1)
        .drop("_n")
    )
    c = _apply(c, r3, "containment")

    # R4 unique co-located parent (shared chunk)
    r4 = (
        _unresolved(c)
        .join(
            p,
            (F.col("doc_id") == p["doc_id"])
            & (F.col("parent_path") == p["_p_path"])
            & F.arrays_overlap(F.col("chunk_ids"), p["_p_chunks"]),
        )
        .groupBy(c["doc_id"].alias("doc_id"), "child_id")
        .agg(F.min("_p_node").alias("_pid"), F.countDistinct("_p_node").alias("_n"))
        .filter(F.col("_n") == 1)
        .drop("_n")
    )
    c = _apply(c, r4, "co_chunk")

    # R6 nearest preceding parent by emission (as-of join analog):
    # union child/parent events, forward-fill last parent emission per doc+path
    ev_p = p.select(
        "doc_id", F.col("_p_path").alias("parent_path"), F.col("_p_emission").alias("emission"),
        F.col("_p_node").alias("_pid"), F.lit(None).cast(children.schema["child_id"].dataType).alias("child_id"),
    )
    ev_c = _unresolved(c).select(
        "doc_id", "parent_path", "emission", F.lit(None).cast("string").alias("_pid"), "child_id"
    )
    w = (
        Window.partitionBy("doc_id", "parent_path")
        .orderBy("emission", F.col("_pid").isNull().cast("int"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r6 = (
        ev_p.unionByName(ev_c)
        .withColumn("_last_p", F.last("_pid", ignorenulls=True).over(w))
        .filter(F.col("child_id").isNotNull() & F.col("_last_p").isNotNull())
        .select("doc_id", "child_id", F.col("_last_p").alias("_pid"))
    )
    c = _apply(c, r6, "adjacent")

    # R7 synthesized bucket parent
    c = c.select(
        *[x for x in c.columns if x not in ("parent_id", "resolved_by")],
        F.coalesce(
            F.col("parent_id"),
            F.concat(F.lit("BUCKET_"), F.col("doc_id"), F.lit("_"), F.col("parent_path")),
        ).alias("parent_id"),
        F.coalesce(F.col("resolved_by"), F.lit("bucket")).alias("resolved_by"),
    )
    return c.drop("_c_canon")
