"""Iterative graph analytics: PageRank with all-integer rank updates.

Completes the graph-operator family (dedup.py's connected components join
it) with the canonical iterative fixed-point algorithm, built the way the
k-means fit (cluster.py) is: every floating-point hazard is removed so the
result is bit-identical across runs, partitionings and engines, and a
DuckDB twin can replay the ENTIRE iteration history exactly.

Integer contract (``mass_units`` integer units = total mass 1.0):
- init rank        = U div N                      (BIGINT floor-div)
- edge contribution = rank div outdeg             (BIGINT floor-div)
- new rank         = (round((1-d)·U) div N) + round(d · Σ contributions)
  where Σ is a BIGINT sum (order-independent) and the single double
  multiply d·Σ is exact-to-round because Σ ≤ U ≤ 2^53.

Quantization honesty: every floor-div drips mass. The per-iteration loss
is bounded by one unit per (node, out-edge) — about |E| units of the U
total — so RESOLUTION is a sizing decision, not a free constant:
``mass_units`` must be ≥ ~1000 × N for per-node ranks to carry ≥3
significant digits, and the function REFUSES (plan-time raise_error) when
N > mass_units, where every rank would silently floor to 0. The default
1e9 serves graphs to ~10^6 nodes; pass mass_units=10**15 for 10^12-node
scale (still < 2^53, so the damping multiply stays exact).

Dangling nodes (no out-edges) keep only the teleport term — their mass
drips out of the system, the simplified variant most bulk implementations
(GraphX's default PageRank included) ship; documented, twinned.

Scale shape (100 TB): per iteration ONE equi-join of the edge table with
the current rank table on src (both hash-partitioned on the same key, so
with bucketed edges the join is shuffle-free) plus one map-side-combined
groupBy(dst). The node-sized outdeg table is never broadcast — it folds
into the static edge table once by an equi-join. ``checkpoint_every``
truncates lineage with localCheckpoint the same way the extraction
pipeline does at its fan-out points (extractor.py) — mandatory past ~10
iterations or Catalyst analysis time explodes exponentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default unit scale: total PageRank mass 1.0 == 1e9 integer units
E9 = 1_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
    mass_units: int = E9,
) -> DataFrame:
    """(node, rank_e9) after ``iters`` synchronous power iterations over the
    distinct directed edge list. rank_e9 is BIGINT units of
    ``1/mass_units`` (divide by mass_units for the conventional score).
    Duplicate (src, dst) rows are collapsed first — multi-edges do not
    double-count. Size ``mass_units`` ≥ ~1000 × |nodes| (module docstring);
    a graph with more nodes than units fails fast instead of silently
    returning all-zero ranks."""
    if mass_units > (1 << 53):
        raise ValueError(
            f"pagerank: mass_units={mass_units} exceeds 2^53 — the damping "
            "multiply d·Σ would round and the engine-exact contract breaks"
        )
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ncnt = nodes.agg(F.count("*").alias("n"))
    # outdeg is NODE-sized — never broadcast it (at web scale that is a
    # driver OOM). It is static across iterations, so it folds into the edge
    # table ONCE via a src-keyed equi-join (window-free: a count over the
    # same groupBy key Spark plans as partial+final agg, then one co-
    # partitioned join); each iteration then pays exactly one equi-join of
    # (edges+outdeg) with the current ranks on src.
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    e_deg = e.join(outdeg, "src")
    base_u = int(round((1.0 - damping) * mass_units))  # plan literal, python round

    # resolution guard rides the init expression: rank would floor to 0
    init = F.when(
        F.col("n") > F.lit(mass_units),
        F.raise_error(
            F.format_string(
                "pagerank: %s nodes exceed mass_units=%s — every rank "
                "would quantize to 0; raise mass_units (>= ~1000x nodes, "
                "<= 2^53)",
                F.col("n").cast("string"),
                F.lit(str(mass_units)),
            )
        ).cast("long"),
    ).otherwise(F.expr(f"CAST({mass_units} DIV n AS BIGINT)"))
    ranks = nodes.join(F.broadcast(ncnt)).select("node", init.alias("r_e9"))
    for i in range(iters):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("CAST(r_e9 DIV outdeg AS BIGINT)").alias("c_e9"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c_e9").alias("s_e9"))
        ranks = (
            nodes.join(F.broadcast(ncnt))
            .join(sums, "node", "left")
            .select(
                "node",
                (
                    F.expr(f"CAST({base_u} DIV n AS BIGINT)")
                    + F.round(F.lit(damping) * F.coalesce(F.col("s_e9"), F.lit(0))).cast(
                        "long"
                    )
                ).alias("r_e9"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
