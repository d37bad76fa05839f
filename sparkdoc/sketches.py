"""Streaming-sketch operators for unbounded-cardinality corpus statistics.

The exact way to find frequent terms is groupBy(term).count() — one shuffle
whose state is the FULL vocabulary. At 100 TB the vocabulary (URLs, hosts,
shingles, tokens) can be billions of keys; the shuffle works but is the
dominant cost when all you want is the head of the distribution. The
Misra-Gries summary bounds the state at k counters per partition with the
classic guarantee: any item with frequency > n/(k+1) SURVIVES the sketch
(recall-complete); counts are under-estimates. We then restore exactness
with a second pass that counts ONLY the candidates (a broadcast semi-join —
the same candidates-then-verify shape as the dedup/LSH operators), so the
emitted counts are exact and the operator's output is provably equal to the
exact heavy-hitter query. Public algorithm: Misra & Gries 1982, "Finding
repeated elements"; merge-by-union correctness per Agarwal et al. 2012,
"Mergeable summaries".
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.02,
    exact: bool = False,
) -> DataFrame:
    """Distinct-value cardinality per group via HyperLogLog++ (Heule et al.
    2013 — Spark's `approx_count_distinct`): mergeable constant-size sketch
    state per group, ONE map-side-combined shuffle keyed on the group —
    the only way to count a 100 TB corpus vocabulary without shuffling every
    distinct value. The estimate is deterministic for a given dataset and
    ``rsd`` (the sketch hash has no seed), so results are reproducible
    run-to-run, but NOT bit-portable across engines.

    ``exact=True`` adds ``n_distinct`` (true count — a full shuffle of the
    distinct pairs; use only where that is affordable, e.g. validation) and
    ``within_tol`` = |estimate − exact| ≤ 5·rsd·exact, the self-check the
    correctness gate pins (the DuckDB twin verifies the exact count and
    asserts the tolerance held).

    Returns (group_col, n_estimate[, n_distinct, within_tol])."""
    aggs = [F.approx_count_distinct(value_col, rsd).alias("n_estimate")]
    if exact:
        aggs.append(F.count_distinct(value_col).alias("n_distinct"))
    out = df.groupBy(group_col).agg(*aggs)
    if exact:
        out = out.withColumn(
            "within_tol",
            (
                F.abs(F.col("n_estimate") - F.col("n_distinct"))
                <= F.lit(5 * rsd) * F.col("n_distinct")
            ),
        )
    return out


def _mg_partition(k: int, col: str):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one Misra-Gries summary per PARTITION: the dict persists across the
        # partition's Arrow batches, so state is ≤ k counters regardless of
        # how many distinct items the partition holds
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf[col]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "mg_count": list(counters.values())}
            )

    return summarize


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 100,
    exact: bool = True,
) -> DataFrame:
    """Items of ``df[col]`` with frequency strictly above n/(k+1), with
    EXACT counts, computed in bounded memory:

      pass 1  per-partition Misra-Gries summaries (≤ k counters each) —
              merged by union, any global heavy hitter survives in at least
              one partition summary (union of MG summaries is itself an MG
              summary of the concatenated stream, Agarwal et al. 2012)
      pass 2  ONE scan that counts candidates exactly AND totals the stream:
              a broadcast left join marks candidate rows, every non-candidate
              row folds into a single NULL group (map-side combine collapses
              them immediately, so agg state stays ≤ candidates + 1), and
              n = the sum of ALL group counts — recovered with an
              unpartitioned window over the tiny aggregated set. The integer
              threshold cnt·(k+1) > n has no float division, so the kept set
              is engine-exact.

    ``exact=False`` skips pass 2 and returns (item, mg_count) lower bounds —
    the single-pass streaming shape.

    Returns (item, cnt) sorted nowhere; the caller orders. State per
    executor is O(k); the data is scanned exactly twice (the information-
    theoretic floor for exact heavy hitters), and the only full-data shuffle
    is keyed on ≤ k·partitions candidate items (+1 NULL group).
    """
    from pyspark.sql import Window

    rows = df.select(F.col(col).alias("item")).filter(F.col("item").isNotNull())
    cands = (
        rows.mapInPandas(_mg_partition(k, "item"), schema="item string, mg_count long")
        .groupBy("item")
        .agg(F.sum("mg_count").alias("mg_count"))
    )
    if not exact:
        return cands
    marked = rows.join(
        F.broadcast(cands.select("item").withColumn("_cand", F.lit(1))), "item", "left"
    )
    detail = marked.groupBy(
        F.when(F.col("_cand") == 1, F.col("item")).alias("item")
    ).agg(F.count("*").alias("cnt"))
    # the detail groups partition the whole stream, so sum(cnt) over the
    # (tiny: ≤ candidates + 1 rows) aggregate IS the stream length n
    n = F.sum("cnt").over(Window.partitionBy())
    return (
        detail.withColumn("_n", n)
        .filter(F.col("item").isNotNull() & (F.col("cnt") * (k + 1) > F.col("_n")))
        .select("item", "cnt")
    )
