"""Incremental (delta) dedup: dedup a NEW batch against an already-curated
corpus through persisted indexes, without re-scanning the corpus.

At 100 TB you never re-dedup the whole corpus to ingest a delta. The corpus
is summarized ONCE into two indexes (plain DataFrames here; parquet tables
bucketed by their join key in production, so delta joins are shuffle-free
on the index side):

  * exact index:  (fp, keep_id)        one row per distinct normalized text
  * band index:   (band, key, doc_id)  `bands` rows per bandable doc

A delta batch then
  1. flags exact dups with ONE equi-join on the 16-byte fp,
  2. computes MinHash signatures for the DELTA ONLY and joins its band keys
     against the band index for candidates (the corpus signature work is
     already sunk into the index),
  3. verifies exact Jaccard by fetching ONLY candidate old docs' texts — a
     left-semi-pruned, column-pruned scan of the corpus.

Surviving new docs' keys append to the indexes (update_*), closing the
ingest cycle. Reference relation: the batch-global cross-batch dedup lives
in sparkdoc/dedup.py (dedup_entities) and dedup_text.py; this module is the
ingestion-time variant of the same contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.dedup_text import band_keys, ngram_jaccard
from sparkdoc.textops import doc_fingerprint

# --- index construction ----------------------------------------------------------


def build_exact_index(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(fp, keep_id): one row per distinct normalized text, keep_id = min id.
    One shuffle on the 16-byte key, map-side combined. NULL-text docs are
    excluded (unknown contents are not duplicates of each other)."""
    return (
        docs.withColumn("fp", doc_fingerprint(F.col(text_col)))
        .filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"))
    )


def build_band_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """(band, key, doc_id): LSH band keys of every bandable corpus doc —
    the one-time signature pass over the corpus that delta ingestion reuses
    forever. In production write this bucketed by (band, key)."""
    return band_keys(docs, text_col, id_col, k, bands, n, out_id=id_col)


# --- delta dedup -----------------------------------------------------------------


def delta_exact_dups(
    new_docs: DataFrame,
    exact_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, dup_of) for every NEW doc whose normalized text already exists
    in the corpus. One equi-join on fp; new docs that miss the index are
    simply absent from the result (they are the keepers)."""
    fps = new_docs.select(
        id_col, doc_fingerprint(F.col(text_col)).alias("fp")
    ).filter(F.col("fp").isNotNull())
    return fps.join(exact_index, "fp").select(id_col, F.col("keep_id").alias("dup_of"))


def delta_exact_dups_full(
    new_docs: DataFrame,
    exact_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Like `delta_exact_dups`, but ALSO catches duplicates INSIDE the
    delta batch (two identical new docs, neither in the corpus): per fp the
    keeper is the corpus keep_id when the index has the fp, else the min
    new id; every other delta doc with that fp reports (id, dup_of=keeper).
    When the fp is in the corpus, every delta copy is a dup (dup_of points
    at the corpus keeper), matching `delta_exact_dups`."""
    fps = new_docs.select(
        id_col, doc_fingerprint(F.col(text_col)).alias("fp")
    ).filter(F.col("fp").isNotNull())
    resolved = (
        fps.groupBy("fp")
        .agg(F.min(id_col).alias("_min_new"))
        .join(exact_index, "fp", "left")
        .select(
            "fp",
            F.coalesce("keep_id", "_min_new").alias("_keeper"),
            F.col("keep_id").isNotNull().alias("_in_corpus"),
        )
    )
    return (
        fps.join(resolved, "fp")
        .filter(F.col("_in_corpus") | (F.col(id_col) != F.col("_keeper")))
        .select(id_col, F.col("_keeper").alias("dup_of"))
    )


def delta_near_dups(
    new_docs: DataFrame,
    corpus: DataFrame,
    band_index: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """(id, dup_of, jaccard) for every NEW doc near-duplicating some corpus
    doc: the delta's band keys join the persisted band index for candidates
    (signatures computed for the DELTA only), then exact n-gram Jaccard
    verifies each candidate pair with the corpus scan pruned to candidate
    ids. A new doc matching several corpus docs reports the single best
    match (max jaccard, min dup_of).

    Precondition: delta ids are disjoint from corpus ids (globally unique
    doc ids) — the verify stage unions both text sets under one id column."""
    new_bands = band_keys(new_docs, text_col, id_col, k, bands, n, out_id="a")
    cands = (
        new_bands.join(band_index.withColumnRenamed(id_col, "b"), ["band", "key"])
        .select("a", "b")
        .dropDuplicates(["a", "b"])
        .persist()
    )
    # texts for verification: the delta side + the candidate-pruned corpus
    a_ids = cands.select(F.col("a").alias(id_col)).distinct()
    b_ids = cands.select(F.col("b").alias(id_col)).distinct()
    texts = (
        new_docs.select(id_col, text_col).join(a_ids, id_col, "left_semi")
        .unionByName(corpus.select(id_col, text_col).join(b_ids, id_col, "left_semi"))
    )
    jac = ngram_jaccard(cands, texts, text_col, id_col, n)
    verified = jac.filter(F.col("jaccard") >= threshold)
    # best = max jaccard, then min b — min_by over (-jaccard, b) orders the
    # DOUBLE negatively and the id ASCENDING natively, so string doc ids
    # work too (arithmetic negation of the id column would throw
    # CAST_INVALID_INPUT under ANSI for any non-numeric id)
    best = verified.groupBy("a").agg(
        F.min_by(
            F.struct(F.col("b"), F.col("jaccard")),
            F.struct((-F.col("jaccard")).alias("nj"), F.col("b")),
        ).alias("_m")
    )
    out = best.select(
        F.col("a").alias(id_col),
        F.col("_m.b").alias("dup_of"),
        F.col("_m.jaccard").alias("jaccard"),
    )
    # materialize the (small) result so the candidate AND shingle caches can
    # be released immediately — otherwise every delta ingest leaks pinned
    # frames for the session's lifetime
    out = out.localCheckpoint(eager=True)
    cands.unpersist()
    for c in getattr(jac, "_sparkdoc_caches", []):
        c.unpersist()
    return out


# --- index maintenance -------------------------------------------------------------


def update_exact_index(
    exact_index: DataFrame,
    kept_new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fold the kept delta docs into the exact index. Fps already present
    keep their original keep_id (the corpus copy stays canonical); genuinely
    new fps enter with the min new id."""
    incoming = build_exact_index(kept_new_docs, text_col, id_col)
    # min_by over (corpus-first flag, keep_id): the existing corpus copy
    # stays canonical, ties break on the SMALLEST id — struct ordering
    # compares string ids natively (negating the id column would throw
    # CAST_INVALID_INPUT under ANSI for non-numeric ids)
    return (
        exact_index.withColumn("_old", F.lit(0))
        .unionByName(incoming.withColumn("_old", F.lit(1)))
        .groupBy("fp")
        .agg(
            F.min_by("keep_id", F.struct(F.col("_old"), F.col("keep_id"))).alias(
                "keep_id"
            )
        )
    )


def update_band_index(
    band_index: DataFrame,
    kept_new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Append the kept delta docs' band keys (pure union — band rows are
    per-doc, no dedup needed)."""
    return band_index.unionByName(
        build_band_index(kept_new_docs, text_col, id_col, k, bands, n)
    )


def delta_new_docs(
    new_docs: DataFrame,
    exact_index: DataFrame,
    bloom=None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The delta docs that are NOT exact duplicates of any corpus doc — the
    admission set delta ingestion appends. Without ``bloom``: one anti-join
    on the fp. With a ``BloomFilter`` built over the index's fp column
    (sketches.bloom_build), the join is PRE-PRUNED: a constant-size
    broadcast probe clears 'definitely new' docs without touching the
    index, and only the 'maybe' docs (true members + ~fpp false positives)
    anti-join it. On a mostly-fresh crawl the join traffic drops from
    |delta| to ≈ fpp·|delta| rows while the result stays EXACT — no false
    negatives means a probe-False doc cannot be in the index, and every
    probe-True doc is verified by the join. NULL-text docs are always
    admitted (unknown contents are not duplicates)."""
    fps = new_docs.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    idx = exact_index.select(F.col("fp").alias("_fp"))
    if bloom is None:
        verified = fps.filter(F.col("_fp").isNotNull()).join(idx, "_fp", "left_anti")
    else:
        from sparkdoc.sketches import bloom_might_contain

        probed = bloom_might_contain(
            fps.filter(F.col("_fp").isNotNull()), "_fp", bloom, out="_maybe"
        )
        definite_new = probed.filter(~F.col("_maybe")).drop("_maybe")
        maybes = probed.filter(F.col("_maybe")).drop("_maybe")
        verified = definite_new.unionByName(maybes.join(idx, "_fp", "left_anti"))
    return verified.unionByName(fps.filter(F.col("_fp").isNull())).drop("_fp")
