"""Parent-resolution ladder: attach child entities to parents.

The reference resolves child→parent by a never-wrong fallback ladder
(_ParentResolver.resolve, dense/orchestrator.py:785-1019). Re-expressed as a
cascade of real Spark joins — each rung computes ONLY for rows the previous
rungs left unresolved, and every rung is uniqueness-guarded (ambiguity ⇒
fall through):

  R1 exact     equi-join on (doc_id, parent_path, canonical parent key)
  R2 singleton unique single parent instance on that path in the doc
  R3 contain   unique fuzzy containment (child key ⊂ parent canonical label)
  R4 co-chunk  unique parent sharing a first-emission chunk
  R5 adjacent  nearest PRECEDING parent by emission order (sort-based as-of
               join analog via forward-fill window)
  R6 bucket    synthesized placeholder parent per (doc_id, parent_path)

children: (doc_id, child_id, parent_path, parent_key, chunk_ids, emission)
parents:  (doc_id, node_id, path, label, chunk_ids, emission)
returns children + (parent_id, resolved_by)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkdoc.dedup import _canon_name


def _pick(df: DataFrame, rung: DataFrame, name: str) -> DataFrame:
    """Fill unresolved rows from a rung's (doc_id, child_id, _pid)."""
    out = df.join(rung, ["doc_id", "child_id"], "left")
    keep = [x for x in df.columns if x not in ("parent_id", "resolved_by")]
    return out.select(
        *keep,
        F.coalesce(F.col("parent_id"), F.col("_pid")).alias("parent_id"),
        F.coalesce(F.col("resolved_by"), F.when(F.col("_pid").isNotNull(), name)).alias(
            "resolved_by"
        ),
    )


def resolve_parents(children: DataFrame, parents: DataFrame) -> DataFrame:
    p = parents.select(
        F.col("doc_id").alias("p_doc"),
        F.col("node_id").alias("p_node"),
        F.col("path").alias("p_path"),
        _canon_name()(F.col("label")).alias("p_canon"),
        F.col("chunk_ids").alias("p_chunks"),
        F.col("emission").alias("p_emission"),
    )
    c = (
        children.withColumn("_c_canon", _canon_name()(F.col("parent_key")))
        .withColumn("parent_id", F.lit(None).cast("string"))
        .withColumn("resolved_by", F.lit(None).cast("string"))
    )

    def unresolved_view():
        return c.filter(F.col("parent_id").isNull()).select(
            F.col("doc_id").alias("c_doc"),
            "child_id",
            F.col("parent_path").alias("c_path"),
            F.col("_c_canon").alias("c_canon"),
            F.col("chunk_ids").alias("c_chunks"),
            F.col("emission").alias("c_emission"),
        )

    def uniq_rung(joined: DataFrame) -> DataFrame:
        return (
            joined.groupBy(F.col("c_doc").alias("doc_id"), "child_id")
            .agg(F.min("p_node").alias("_pid"), F.countDistinct("p_node").alias("_n"))
            .filter(F.col("_n") == 1)
            .drop("_n")
        )

    # R1 exact canonical key
    u = unresolved_view()
    r1 = uniq_rung(
        u.join(
            p,
            (u["c_doc"] == p["p_doc"])
            & (u["c_path"] == p["p_path"])
            & (u["c_canon"] == p["p_canon"])
            & (F.length(u["c_canon"]) > 0),
        )
    )
    c = _pick(c, r1, "exact")

    # R2 unique singleton parent on path
    singles = (
        p.groupBy("p_doc", "p_path")
        .agg(F.min("p_node").alias("_pid"), F.count("*").alias("_n"))
        .filter(F.col("_n") == 1)
        .select(
            F.col("p_doc").alias("doc_id"), F.col("p_path").alias("parent_path"), "_pid"
        )
    )
    r2 = (
        c.filter(F.col("parent_id").isNull())
        .select("doc_id", "child_id", "parent_path")
        .join(singles, ["doc_id", "parent_path"])
        .select("doc_id", "child_id", "_pid")
    )
    c = _pick(c, r2, "singleton")

    # R3 unique fuzzy containment (child key ⊂ parent canon, len >= 4)
    u = unresolved_view().filter(F.length("c_canon") >= 4)
    r3 = uniq_rung(
        u.join(
            p,
            (u["c_doc"] == p["p_doc"])
            & (u["c_path"] == p["p_path"])
            & p["p_canon"].contains(u["c_canon"])
            & (u["c_canon"] != p["p_canon"]),
        )
    )
    c = _pick(c, r3, "containment")

    # R4 unique co-located parent (shared chunk)
    u = unresolved_view()
    r4 = uniq_rung(
        u.join(
            p,
            (u["c_doc"] == p["p_doc"])
            & (u["c_path"] == p["p_path"])
            & F.arrays_overlap(u["c_chunks"], p["p_chunks"]),
        )
    )
    c = _pick(c, r4, "co_chunk")

    # R5 nearest preceding parent by emission (as-of join analog): union
    # parent/child events, forward-fill last parent per (doc, path). Parents
    # sort before children at equal emission.
    ev_p = p.select(
        F.col("p_doc").alias("doc_id"),
        F.col("p_path").alias("parent_path"),
        F.col("p_emission").alias("emission"),
        F.col("p_node").alias("_pid"),
        F.lit(None).cast(children.schema["child_id"].dataType).alias("child_id"),
    )
    ev_c = c.filter(F.col("parent_id").isNull()).select(
        "doc_id", "parent_path", "emission", F.lit(None).cast("string").alias("_pid"), "child_id"
    )
    w = (
        Window.partitionBy("doc_id", "parent_path")
        .orderBy("emission", F.col("_pid").isNull().cast("int"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r5 = (
        ev_p.unionByName(ev_c)
        .withColumn("_last_p", F.last("_pid", ignorenulls=True).over(w))
        .filter(F.col("child_id").isNotNull() & F.col("_last_p").isNotNull())
        .select("doc_id", "child_id", F.col("_last_p").alias("_pid"))
    )
    c = _pick(c, r5, "adjacent")

    # R6 synthesized bucket parent — guarded: concat null-propagates, so a
    # child with a NULL parent_path must stay unresolved (parent_id NULL,
    # resolved_by NULL) rather than claim resolved_by='bucket' with no parent
    keep = [x for x in c.columns if x not in ("parent_id", "resolved_by")]
    bucket_id = F.when(
        F.col("parent_path").isNotNull(),
        F.concat(F.lit("BUCKET_"), F.col("doc_id"), F.lit("_"), F.col("parent_path")),
    )
    final_pid = F.coalesce(F.col("parent_id"), bucket_id)
    c = c.select(
        *keep,
        final_pid.alias("parent_id"),
        F.when(
            final_pid.isNotNull(), F.coalesce(F.col("resolved_by"), F.lit("bucket"))
        ).alias("resolved_by"),
    )
    return c.drop("_c_canon")


# --------------------------------------------------------------------------
# Batch-handle resolution (dense/orchestrator.py:285-360 + 189-208): a batch's
# nodes reference parents by integer handle — positive = a node of the SAME
# batch ("i"), negative = an already-extracted entity advertised in the
# sliding ALREADY-FOUND window (-1 = the most recent entity before this
# batch; window depth 50, orchestrator.py:69-72). Handles in the current
# batch always win (the key spaces are disjoint); an unknown handle yields
# parent=None.
# --------------------------------------------------------------------------

ALREADY_FOUND_WINDOW = 50  # orchestrator.py:72


def resolve_batch_handles(emissions: DataFrame, window: int = ALREADY_FOUND_WINDOW) -> DataFrame:
    """Resolve per-batch parent handles into (path, ids) references.

    emissions: (doc_id, batch_index:int, emission:int, handle:int?,
    parent_handle:int?, path:string, ids:map<string,string>) — one row per
    accepted node, `emission` ordering rows within a batch, `handle` the
    node's batch-local "i" (first occurrence of a duplicate handle wins),
    `parent_handle` the "p" reference (positive = local, negative = k-th most
    recent entity of PRIOR batches, k <= window).

    Returns the input + parent_path/parent_ids/parent_source, where
    parent_source ∈ ('local', 'already_found', null) — the bind_stats
    ``parents_from_already_found`` counter is a groupBy away.
    """
    w_doc = Window.partitionBy("doc_id").orderBy("batch_index", "emission")
    base = emissions.withColumn("_g", F.row_number().over(w_doc))
    w_batch = Window.partitionBy("doc_id", "batch_index")
    base = base.withColumn("_batch_start", F.min("_g").over(w_batch))

    # batch-local targets: first row per (doc, batch, handle), never self
    w_h = Window.partitionBy("doc_id", "batch_index", "handle").orderBy("emission")
    local_t = (
        base.filter(F.col("handle").isNotNull())
        .withColumn("_rn", F.row_number().over(w_h))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("doc_id").alias("l_doc"),
            F.col("batch_index").alias("l_batch"),
            F.col("handle").alias("l_handle"),
            F.col("_g").alias("l_g"),
            F.col("path").alias("l_path"),
            F.col("ids").alias("l_ids"),
        )
    )
    out = base.join(
        local_t,
        (F.col("doc_id") == F.col("l_doc"))
        & (F.col("batch_index") == F.col("l_batch"))
        & (F.col("parent_handle") == F.col("l_handle"))
        & (F.col("_g") != F.col("l_g")),
        "left",
    ).drop("l_doc", "l_batch", "l_handle", "l_g")

    # already-found targets: parent_handle = -k → the k-th most recent entity
    # before this batch's start, k <= window (sliding handle map,
    # orchestrator.py:189-208)
    k = -F.col("parent_handle")
    target_g = F.col("_batch_start") - 1 - k + 1
    out = out.withColumn(
        "_tg",
        F.when(
            (F.col("parent_handle") < 0) & (k <= window) & (target_g >= 1), target_g
        ),
    )
    prior = base.select(
        F.col("doc_id").alias("p_doc"),
        F.col("_g").alias("p_g"),
        F.col("path").alias("a_path"),
        F.col("ids").alias("a_ids"),
    )
    out = out.join(
        prior,
        (F.col("doc_id") == F.col("p_doc")) & (F.col("_tg") == F.col("p_g")),
        "left",
    ).drop("p_doc", "p_g", "_tg")

    return (
        out.withColumn(
            "parent_source",
            F.when(F.col("l_path").isNotNull(), "local").when(
                F.col("a_path").isNotNull(), "already_found"
            ),
        )
        .withColumn("parent_path", F.coalesce(F.col("l_path"), F.col("a_path")))
        .withColumn("parent_ids", F.coalesce(F.col("l_ids"), F.col("a_ids")))
        .drop("l_path", "l_ids", "a_path", "a_ids", "_g", "_batch_start")
    )
