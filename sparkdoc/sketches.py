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

    # cast to string up front: the pass-1 summary schema is 'item string',
    # and a long/int column (user ids, keys) would otherwise die at Arrow
    # conversion when the per-partition counts are emitted
    rows = df.select(F.col(col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
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


# --- Bloom filter ----------------------------------------------------------------


class BloomFilter:
    """Fixed-size membership sketch: ``might_contain`` is True for EVERY
    inserted value (no false negatives — build and probe hash identically:
    JVM ``xxhash64`` double-hashed per Kirsch & Mitzenmacher 2006,
    "Less hashing, same performance") and True for a non-member with
    probability ≈ ``fpp``. The bitmap is a plain ``bytes`` value — ship it
    with ``sc.broadcast`` or persist it next to the index it summarizes.
    """

    __slots__ = ("bits", "m", "k")

    def __init__(self, bits: bytes, m: int, k: int):
        self.bits, self.m, self.k = bits, m, k

    @staticmethod
    def params(n_expected: int, fpp: float) -> tuple[int, int]:
        """Optimal (m_bits, k_hashes) for n items at false-positive rate p:
        m = -n·ln p / (ln 2)², k = (m/n)·ln 2. m is rounded up to a whole
        number of bytes."""
        import math

        n = max(1, n_expected)
        m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
        m = ((m + 7) // 8) * 8
        k = max(1, round(m / n * math.log(2)))
        return m, k

    def to_dict(self) -> dict:
        import base64

        return {"m": self.m, "k": self.k, "bits_b64": base64.b64encode(self.bits).decode()}

    @classmethod
    def from_dict(cls, d: dict) -> "BloomFilter":
        import base64

        return cls(base64.b64decode(d["bits_b64"]), d["m"], d["k"])


_BLOOM_H2_SEED = -1640531527  # golden-ratio constant; any fixed literal works


def _bloom_hash_cols(col):
    """The two JVM-side 64-bit hashes both build and probe derive positions
    from — computing them in Spark (not Python) keeps the hot path codegen
    and guarantees build/probe hash agreement byte-for-byte. ``xxhash64``
    never returns NULL (a NULL input hashes to the seed), so NULL inputs
    are masked explicitly: NULL value → NULL hashes → skipped/NULL probe."""
    null = F.lit(None).cast("long")
    return (
        F.when(col.isNull(), null).otherwise(F.xxhash64(col)),
        F.when(col.isNull(), null).otherwise(F.xxhash64(col, F.lit(_BLOOM_H2_SEED))),
    )


def _bloom_positions(h1, h2, m: int, k: int):
    """Vectorized Kirsch-Mitzenmacher positions: (h1 + i·h2) mod m for
    i in [0, k), computed in uint64 wraparound arithmetic. Returns a
    (len, k) index array."""
    import numpy as np

    u1 = h1.to_numpy(dtype="int64").view("uint64")[:, None]
    u2 = h2.to_numpy(dtype="int64").view("uint64")[:, None]
    i = np.arange(k, dtype="uint64")[None, :]
    return ((u1 + i * u2) % np.uint64(m)).astype("int64")


def bloom_build(df: DataFrame, col: str, n_expected: int, fpp: float = 0.01) -> BloomFilter:
    """Build a Bloom filter over ``df[col]`` (NULLs skipped). One pass:
    each partition sets bits in its own m/8-byte bitmap (vectorized numpy
    over Arrow batches), emits the bitmap once, and the per-partition
    bitmaps are OR-merged. Merge traffic is partitions × m/8 bytes —
    independent of row count, the property that makes the sketch usable as
    a 100 TB index summary. ``n_expected`` is explicit (no mid-plan count):
    size it from the index build, which is a job boundary anyway."""
    import numpy as np

    m, k = BloomFilter.params(n_expected, fpp)
    hashes = df.select(*(h.alias(n) for h, n in zip(_bloom_hash_cols(F.col(col)), ("h1", "h2")))).filter(
        F.col("h1").isNotNull()
    )

    def set_bits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bmp = np.zeros(m // 8, dtype="uint8")
        seen = False
        for b in batches:
            if not len(b):
                continue
            seen = True
            pos = _bloom_positions(b["h1"], b["h2"], m, k).ravel()
            np.bitwise_or.at(bmp, pos >> 3, np.uint8(1) << (pos & 7).astype("uint8"))
        if seen:
            yield pd.DataFrame({"bmp": [bmp.tobytes()]})

    def or_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros(m // 8, dtype="uint8")
        seen = False
        for b in batches:
            for blob in b["bmp"]:
                acc |= np.frombuffer(blob, dtype="uint8")
                seen = True
        if seen:
            yield pd.DataFrame({"bmp": [acc.tobytes()]})

    # executor-side tree merge (fan-in 16): the driver never holds more
    # than a handful of m/8-byte bitmaps — with one bitmap PER PARTITION a
    # plain collect() at n_expected=1e9 (m/8 ≈ 1.2 GB) would blow
    # spark.driver.maxResultSize on the first partition
    bmps = hashes.mapInPandas(set_bits, schema="bmp binary")
    n_parts = bmps.rdd.getNumPartitions()
    while n_parts > 16:
        n_parts = max(16, n_parts // 16)
        bmps = bmps.repartition(n_parts).mapInPandas(or_merge, schema="bmp binary")
    parts = bmps.collect()
    acc = np.zeros(m // 8, dtype="uint8")
    for r in parts:
        acc |= np.frombuffer(r["bmp"], dtype="uint8")
    return BloomFilter(acc.tobytes(), m, k)


def bloom_might_contain(df: DataFrame, col: str, bloom: BloomFilter, out: str = "might_contain") -> DataFrame:
    """Adds boolean ``out``: False ⇒ the value was definitely never
    inserted; True ⇒ it may have been (verify exactly downstream). NULL
    values probe NULL. The bitmap rides the closure (Spark broadcasts task
    binaries); the probe is a vectorized Arrow-batched pandas UDF."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    bits, m, k = bloom.bits, bloom.m, bloom.k

    @pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series, isnull: pd.Series) -> pd.Series:
        bmp = np.frombuffer(bits, dtype="uint8")
        if not len(h1):
            return pd.Series([], dtype="object")
        pos = _bloom_positions(h1, h2, m, k)
        hit = (bmp[pos >> 3] & (np.uint8(1) << (pos & 7).astype("uint8"))) != 0
        res = pd.Series(hit.all(axis=1))
        return res.mask(isnull.astype("bool"), None)

    # NULLs are coalesced to 0 JVM-SIDE with a separate null-mask column:
    # a nullable int64 batch reaches pandas as float64, and float64 loses
    # bits for |hash| > 2^53 — every row in that batch would then probe the
    # WRONG positions, i.e. false negatives on the no-false-negative
    # contract. Non-nullable hashes arrive as true int64.
    h1, h2 = _bloom_hash_cols(F.col(col))
    return df.withColumn(
        out,
        _probe(
            F.coalesce(h1, F.lit(0)),
            F.coalesce(h2, F.lit(0)),
            F.col(col).isNull(),
        ),
    )


# --- Count-Min sketch -----------------------------------------------------------


def _cms_pos(col, row: int, w: int):
    """Engine-portable CMS position: uint60 of md5('<v>:cms:<row>') mod w.
    md5 hex is identical in Spark and DuckDB (binary-collated), so the
    sketch table and every estimate twin exactly — unlike xxhash64, which
    is Spark-only (fine for the Bloom filter, whose probes never leave
    Spark; the CMS table is a persisted artifact other engines may read)."""
    return (
        F.conv(F.substring(F.md5(F.concat(col.cast("string"), F.lit(f":cms:{row}"))), 1, 15), 16, 10)
        .cast("bigint")
        % w
    )


def cms_build(df: DataFrame, col: str, w: int = 1024, d: int = 4) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over ``df[col]``
    occurrences, as a TABLE (row, pos, cnt) of at most d·w rows — the
    mergeable frequency summary: merging two corpora's sketches is
    sum-by-(row, pos), and the build is ONE map-side-combined shuffle of
    d·w cells regardless of corpus size or vocabulary (the state bound
    groupBy(term) can't give). Estimates are over-counts only:
    est(v) = min over rows of cell(row, pos(v)) >= true(v), within
    eps = e/w of total mass with probability 1 - e^-d. NULLs are skipped."""
    vals = df.select(F.col(col).alias("_v")).filter(F.col("_v").isNotNull())
    cells = vals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_pos(F.col("_v"), i, w).alias("pos")
                    )
                    for i in range(d)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select(F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
        .groupBy("row", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """(value, est_cnt): the CMS point estimate for each DISTINCT probe
    value — min over the d rows of the probed cell, absent cells counting
    as 0. The probe side is d rows per distinct value, joined to the d·w
    sketch table (broadcastable both ways); never touches the corpus."""
    p = probes.select(F.col(col).alias("value")).filter(F.col("value").isNotNull()).distinct()
    pp = p.select(
        "value",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_pos(F.col("value"), i, w).alias("pos")
                    )
                    for i in range(d)
                ]
            )
        ).alias("c"),
    ).select("value", F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    joined = pp.join(sketch, ["row", "pos"], "left").select(
        "value", F.coalesce(F.col("cnt"), F.lit(0)).alias("cell")
    )
    return joined.groupBy("value").agg(F.min("cell").alias("est_cnt"))
