"""Document deduplication at corpus scale: exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Design notes for 100 TB:
  * exact dedup is a hash-groupBy on a normalized md5 — one shuffle on a
    16-byte key, map-side partial agg free via Catalyst
  * MinHash signatures are computed WITHOUT Python: shingle → md5 per seed →
    array_min, all JVM exprs; LSH banding turns the O(n²) pair search into a
    self-equi-join on (band, signature) — shuffle on band keys, AQE splits
    hot bands; candidate pairs then verify exact Jaccard on the (small)
    candidate set only
  * SimHash is a 64-bit vectorized pandas UDF (bit-parallel in numpy);
    near-dup = hamming distance via xor + bit_count, a JVM expr
  * md5-based hashing keeps the whole MinHash path reproducible in ANSI SQL
    (the DuckDB oracle runs the identical algorithm)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sparkdoc.textops import doc_fingerprint, words

# --- exact dedup ---------------------------------------------------------------


def exact_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ids: int = 1000,
) -> DataFrame:
    """Groups of exact duplicates (normalized md5): (fingerprint, n_docs,
    keep_id = min id, doc_ids). NULL-text docs are excluded — unknown
    contents are not duplicates of each other.

    ``doc_ids`` holds at most ``max_ids`` (smallest) members per group —
    n_docs stays the TRUE count. A boilerplate fingerprint shared by 10^7
    docs would otherwise materialize one aggregation row holding a
    10^7-element id array (the single-row OOM curate_split's min+join-back
    design explicitly avoids); this is the diagnostic API, so it keeps a
    bounded sample instead."""
    from pyspark.sql import Window

    fpd = df.withColumn("fp", doc_fingerprint(F.col(text_col))).filter(
        F.col("fp").isNotNull()
    )
    ranked = fpd.withColumn(
        "_r", F.row_number().over(Window.partitionBy("fp").orderBy(id_col))
    )
    return (
        ranked.groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.array_sort(
                F.collect_list(F.when(F.col("_r") <= max_ids, F.col(id_col)))
            ).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def drop_exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep min-id representative per fingerprint. Window-free: groupBy +
    semi-join back (two narrow shuffles, no sort). NULL-text rows pass
    through untouched: md5(NULL)=NULL would land every failed-extraction doc
    in ONE group and silently delete all but one of them — unknown contents
    are not equal contents."""
    fp = doc_fingerprint(F.col(text_col))
    keep = (
        df.filter(fp.isNotNull())
        .withColumn("fp", fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep.select(id_col), id_col, "left_semi").unionByName(
        df.filter(fp.isNull())
    )


# --- shingles / MinHash / LSH -----------------------------------------------------


def shingles_of(words_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a MATERIALIZED word-array column.

    PERFORMANCE CONTRACT: pass a bound column (withColumn'd), never the raw
    `words(text)` expression — interpreted higher-order lambdas re-evaluate
    captured subexpressions per element, turning O(words) into O(words²)
    string splits. CollapseProject will not inline a multi-referenced alias,
    so the two-step withColumn pipeline keeps it linear.
    """
    w = words_col
    return F.array_distinct(
        F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3, out: str = "shingles") -> DataFrame:
    """Add a distinct word-n-gram shingle column (linear-time pipeline)."""
    tmp = f"_{out}_words"
    return (
        df.withColumn(tmp, words(F.col(text_col)))
        .withColumn(out, shingles_of(F.col(tmp), n))
        .drop(tmp)
    )


#: Kirsch-Mitzenmacher modulus: 2^31 - 1 (prime). Keeps every intermediate
#: (h1 + i*h2 < 2^35 + 2^31) far inside long range — no overflow even under
#: ANSI mode, and the identical arithmetic is expressible in any SQL engine.
MINHASH_MODULUS = 2_147_483_647

#: sentinel signature value for docs with NO shingles (null/empty/short
#: text) — outside the hash range [0, MODULUS)
MINHASH_EMPTY = -1


def minhash_agg(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    n: int = 3,
    out: str = "minhash",
) -> DataFrame:
    """(id, minhash array<long>) via explode → ONE codegen md5 per shingle →
    k derived integer hashes → min aggs.

    Hash family (Kirsch-Mitzenmacher 2006, public double-hashing result —
    two base hashes generate a full universal family for Bloom/MinHash use):
    take h1, h2 = the md5 digest's two 60-bit hex halves mod M (M = 2^31-1),
    then h_i(s) = (h1 + i*h2) mod M. Reproducible in any engine with md5 +
    integer arithmetic (the DuckDB oracle runs the identical ops). Docs with
    no shingles get MINHASH_EMPTY at every position.

    Scale shape (two generations of fixes, both measured):
    - nested-lambda `transform(transform(...))` evaluates INTERPRETED
      (~1 µs/element — 30 s for 5 000 docs × k=16); exploding shingles to
      rows turns the hashing into whole-stage-codegen projections and the
      per-doc minima into a map-side-combined hash agg.
    - k md5s per shingle made md5 the pipeline's dominant CPU (k×shingles
      digests + 32-char string minima + k×32-byte shuffle partials); the
      double-hashing family computes ONE md5 per shingle and k long adds —
      integer mins, k×8-byte partials, same collision behaviour for banding.
    One narrow shuffle on id_col.
    """
    M = MINHASH_MODULUS
    sh = with_shingles(df.select(id_col, text_col), text_col, n, out="_sh")
    ex = sh.select(id_col, F.explode_outer("_sh").alias("_s"))
    d = F.md5(F.col("_s"))
    # 15 hex chars = 60 bits: conv() stays exact (< 2^63) before the mod
    hashed = ex.select(
        id_col,
        (F.conv(F.substring(d, 1, 15), 16, 10).cast("long") % M).alias("_h1"),
        (F.conv(F.substring(d, 17, 15), 16, 10).cast("long") % M).alias("_h2"),
    )
    mins = [
        F.min((F.col("_h1") + F.lit(i) * F.col("_h2")) % M).alias(f"_h{i}")
        for i in range(k)
    ]
    agg = hashed.groupBy(id_col).agg(*mins)
    sig = F.array(
        *[F.coalesce(F.col(f"_h{i}"), F.lit(MINHASH_EMPTY).cast("long")) for i in range(k)]
    )
    return agg.select(id_col, sig.alias(out))


def with_minhash(df: DataFrame, text_col: str = "text", k: int = 16, n: int = 3, out: str = "minhash", id_col: str = "doc_id") -> DataFrame:
    """documents → + minhash signature column (join of minhash_agg — keeps
    the column API; prefer minhash_agg directly when only (id, sig) is
    needed)."""
    return df.join(minhash_agg(df, id_col, text_col, k, n, out), id_col, "left")


def lsh_bands(sig: Column, bands: int, rows: int) -> Column:
    """array<struct<band, key>>: md5 over each band's slice (long signature
    values joined as decimal strings — engine-portable)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.slice(sig, b * rows + 1, rows), lambda x: x.cast("string")
                    ),
                    "|",
                )
            ).alias("key"),
        ),
    )


def band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    out_id: str = "_id",
) -> DataFrame:
    """(id, band, key) LSH band-key rows for every doc with at least one
    shingle — the shared signature stage of minhash_lsh_candidates and the
    incremental band index (sparkdoc/incremental.py). Docs with NO shingles
    (null/empty/short text) are excluded: they would all share the empty
    signature and band every such doc with every other (O(m²) explosion)
    while exact-Jaccard verification defines their overlap as 0 anyway."""
    if bands < 1 or k % bands != 0:
        raise ValueError(
            f"band_keys: k={k} must be a positive multiple of "
            f"bands={bands} (bands>k would hash EMPTY slices — every doc "
            "collides on every band; a non-dividing bands silently ignores "
            "trailing signature entries)"
        )
    rows = k // bands
    return (
        minhash_agg(df.select(F.col(id_col).alias(out_id), text_col), out_id, text_col, k, n, out="_sig")
        .filter(F.element_at(F.col("_sig"), 1) != MINHASH_EMPTY)
        .select(out_id, F.explode(lsh_bands(F.col("_sig"), bands, rows)).alias("bk"))
        .select(out_id, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band key.

    Returns distinct (a, b) with a < b. The expensive O(n²) comparison never
    happens — the self-join keys on (band, key), and duplicate-pair explosion
    across bands collapses with dropDuplicates before verification.
    """
    sig = band_keys(df, text_col, id_col, k, bands, n)
    # persist before the self-join: the signature pipeline (shingle explode →
    # k md5s per shingle → min agg) is the dominant cost of the whole method
    # — without this, BOTH join sides recompute it (measured 2× 12 s vs
    # 2.4 s joined from cache at 57k docs / 8 cores). The cached frame is
    # tiny ((id, band, key) rows); at 100 TB this is the bucketed
    # signature-table write the docstring describes.
    sig = sig.persist()
    a = sig.withColumnRenamed("_id", "a")
    b = sig.withColumnRenamed("_id", "b")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: join texts, set overlap.

    ``docs`` should already be reduced to the documents that appear in
    ``df_pairs`` (near_dup_pairs does this); the shingled frame is persisted
    because it feeds BOTH join sides — without the cache the shingle pass
    runs twice."""
    sh = with_shingles(docs.select(id_col, text_col), text_col, n, out="sh").select(id_col, "sh").persist()
    a = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    joined = df_pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    out = joined.select(
        "a", "b", F.when(union > 0, inter / union).otherwise(0.0).alias("jaccard")
    )
    # hand the cached shingle frame to callers that MATERIALIZE the result
    # (delta ingest does) so they can release it — otherwise one pinned
    # shingle cache leaks per call for the session's lifetime. Lazy callers
    # (near_dup_pairs) must leave it cached while their plan is live.
    out._sparkdoc_caches = [sh]  # type: ignore[attr-defined]
    return out


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """LSH candidates → exact Jaccard ≥ threshold.

    The verify stage only needs shingles for documents that appear in some
    candidate pair — a small fraction of the corpus by design — so the
    candidate set is materialized (it is tiny) and the corpus is left-semi
    reduced to candidate ids BEFORE the shingle recomputation. Without this,
    ngram_jaccard re-shingles the ENTIRE corpus twice (once per join side):
    at 100 TB that is two full extra corpus passes; measured locally it is
    the difference between the verify stage scaling with candidates vs with
    input size. Restricting docs to pair ids provably cannot change any
    pair's Jaccard."""
    cands = minhash_lsh_candidates(df, text_col, id_col, k, bands, n).persist()
    pair_ids = (
        cands.select(F.col("a").alias(id_col))
        .unionByName(cands.select(F.col("b").alias(id_col)))
        .distinct()
    )
    docs_c = df.join(pair_ids, id_col, "left_semi")
    return ngram_jaccard(cands, docs_c, text_col, id_col, n).filter(
        F.col("jaccard") >= threshold
    )


# --- SimHash ------------------------------------------------------------------------


def simhash64(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over word features (vectorized numpy pandas UDF).

    Word hash = first 8 bytes of md5, big-endian — the same portable md5
    family as MinHash, so the signature has an exact DuckDB twin
    (('0x' || substr(md5(w),1,16))::UBIGINT) and the driver gate can verify
    it value-for-value. Repeated words keep their weight (classic SimHash)."""
    @pandas_udf("long")
    def _simhash(s: pd.Series) -> pd.Series:
        import re

        wre = re.compile(r"[a-z0-9]+")

        def sh(text: str) -> int:
            ws = wre.findall((text or "").lower())
            if not ws:
                return 0
            hs = np.frombuffer(
                b"".join(hashlib.md5(w.encode()).digest()[:8] for w in ws),
                dtype=np.dtype(">u8"),
            ).astype(np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            v = bits.sum(axis=0) * 2 - len(ws)
            out = np.uint64(0)
            for i in range(64):
                if v[i] > 0:
                    out |= np.uint64(1) << np.uint64(i)
            return int(out.astype(np.int64))

        return s.map(sh)

    return df.withColumn(out_col, _simhash(F.col(text_col)))


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash, recall-COMPLETE for the given radius:
    classic pigeonhole blocking splits the 64-bit hash into max_hamming+1
    blocks, so any pair within hamming ≤ max_hamming must agree on at least
    one whole block (≤ max_hamming differing bits cannot touch all
    max_hamming+1 blocks). Candidates come from a self-equi-join on
    (block index, block key); exact hamming via xor+bit_count (JVM expr)
    verifies. df must carry 'simhash'. max_hamming is clamped to [0, 63].

    Contentless docs (NULL/empty/no-word text → sentinel simhash 0) are
    EXCLUDED: they'd all agree on every block and pair all-with-all — the
    O(m²) explosion band_keys' MINHASH_EMPTY guard prevents on the MinHash
    path. Sharing no content, they are not near-duplicates of anything."""
    max_hamming = max(0, min(int(max_hamming), 63))
    n_blocks = max_hamming + 1
    # Variable-width blocks covering all 64 bits: floor widths + remainder
    # spread over the first blocks (e.g. 64/4 → 16,16,16,16; 64/5 → 13,13,13,13,12).
    base, rem = divmod(64, n_blocks)
    specs = []
    offset = 0
    for i in range(n_blocks):
        width = base + (1 if i < rem else 0)
        specs.append((i, offset, width))
        offset += width
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                # width 64 (max_hamming=0, single block): (1<<64)-1 does not
                # fit a signed long — AND with -1 (all ones) is the identity
                F.shiftrightunsigned(F.col("simhash"), off).bitwiseAND(
                    F.lit(-1 if width >= 64 else (1 << width) - 1)
                ).alias("key"),
            )
            for i, off, width in specs
        ]
    )
    keyed = (
        df.filter(F.col("simhash") != 0)
        .select(F.col(id_col).alias("_id"), F.col("simhash"), F.explode(blocks).alias("b"))
        .select("_id", "simhash", F.col("b.blk").alias("blk"), F.col("b.key").alias("key"))
        # persisted: both self-join sides read this frame — without the
        # cache the upstream simhash pandas UDF (the dominant cost) runs
        # twice end-to-end, the same measured 2x minhash_lsh_candidates
        # caches against
        .persist()
    )
    a = keyed.select(F.col("_id").alias("a"), F.col("simhash").alias("ha"), "blk", "key")
    b = keyed.select(F.col("_id").alias("b"), F.col("simhash").alias("hb"), "blk", "key")
    pairs = (
        a.join(b, ["blk", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.expr("ha ^ hb")).alias("hamming"))
        .dropDuplicates(["a", "b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    # materialize the (bounded: verified pairs) result, then release the
    # block cache — the delta_near_dups convention
    out = pairs.localCheckpoint(eager=True)
    keyed.unpersist()
    return out


# --- duplicate-group labeling (connected components) ---------------------------


def dup_group_labels(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b", max_iters: int = 30
) -> DataFrame:
    """Connected components over an undirected duplicate-pair graph: every
    document that appears in ``pairs`` gets ``group_id`` = the minimum doc id
    in its component, turning pairwise near-dup evidence (LSH/SimHash/exact
    verify output) into actionable dedup clusters (keep ``group_id``, drop
    the rest — or sample per group).

    Algorithm: min-label propagation with pointer jumping. Each round
      1. label(v) <- min(label(v), min over neighbors u of label(u))
      2. label(v) <- label(label(v))   (shortcut through the label forest)
    Step 2 halves the distance to the component minimum, so convergence is
    O(log component-diameter) rounds, not O(diameter) — the classic
    Hash-to-Min bound (Rastogi et al., "Finding Connected Components in
    Map-Reduce in Logarithmic Rounds").

    Scale shape for 100 TB: each round is two equi-joins on (node, label)
    frames — no all-pairs work, shuffles keyed on node ids; lineage is cut
    per round (localCheckpoint) so the iterative plan never grows; the
    convergence probe is sum(label), a scalar aggregate that strictly
    decreases until fixpoint (labels only move down), so no row-level
    old-vs-new join is needed. Duplicate components are overwhelmingly tiny
    (pairs, triangles), so typical convergence is 2-3 rounds; max_iters only
    bounds adversarial chain graphs.

    Returns (doc_id, group_id), one row per distinct node in ``pairs``.
    """
    a = F.col(a_col)
    b = F.col(b_col)
    edges = (
        pairs.select(a.alias("src"), b.alias("dst"))
        .unionByName(pairs.select(b.alias("src"), a.alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # convergence probe: ORDER-INDEPENDENT checksum of the label assignment.
    # xxhash64 makes it type-agnostic — doc ids are STRINGS repo-wide
    # (schemas.py), and sum("label") on strings throws under ANSI (or goes
    # NULL and falsely "converges" after one round without it)
    def _label_sum(lbl):
        # decimal sum: long would ARITHMETIC_OVERFLOW under ANSI after a few
        # rows of 64-bit hashes; decimal(30,0) headroom covers 10^10 rows
        return lbl.agg(
            F.sum(F.xxhash64("node", "label").cast("decimal(20,0)"))
        ).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iters):
        nb_min = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nb_label"))
            .withColumnRenamed("src", "node")
        )
        stepped = (
            labels.join(nb_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nb_label", "label")).alias("label"),
            )
        )
        # pointer jump: follow the current label one hop (label of my label);
        # stepped is keyed by node (one row each), so this is a plain lookup
        hop = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("jumped")
        )
        labels = (
            stepped.join(hop, "label", "left")
            .select("node", F.least("label", F.coalesce("jumped", "label")).alias("label"))
            .localCheckpoint()
        )
        cur_sum = _label_sum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("group_id"))


def near_dup_groups(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Near-duplicate clusters end-to-end: MinHash-LSH candidates → exact
    Jaccard ≥ threshold → connected components. Returns (doc_id, group_id)
    for every document that has at least one verified near-duplicate; keep
    one representative per group_id (or sample within groups) to dedup."""
    return dup_group_labels(
        near_dup_pairs(df, threshold, text_col, id_col, k, bands, n)
    )


# --- paragraph-level exact dedup -------------------------------------------------


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\\n{2,}",
    joiner: str = "\n\n",
    group_col: str | None = None,
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (boilerplate removal): split
    each document into paragraphs, keep only the FIRST occurrence of every
    distinct normalized paragraph across the whole corpus (first = smallest
    (id, para_idx)), and reassemble the surviving paragraphs in original
    order. The public pattern from Lee et al., "Deduplicating Training Data
    Makes Language Models Better", at paragraph granularity — repeated
    navigation/footer/licence paragraphs survive document-level dedup because
    the SURROUNDING text differs; this removes them corpus-wide.

    ``group_col`` restricts dedup to within a group (e.g. per-domain repeated
    lines, the CCNet trick) instead of corpus-wide.

    Scale shape for 100 TB: one groupBy on the 16-byte paragraph key with a
    map-side-combined min(struct) — NOT a window over the key (a boilerplate
    paragraph duplicated 10^8 times would pile one window partition; partial
    aggregation keeps hot keys bounded) — then an equi-join back on the key
    and one groupBy(doc) to reassemble. Empty/whitespace-only paragraphs are
    dropped outright.

    Returns (id, text [deduped], n_paras, n_kept) — one row per input doc,
    even when every paragraph was dropped (text = '').
    """
    gcols = [group_col] if group_col else []
    paras = (
        df.select(
            id_col,
            *gcols,
            F.posexplode(F.split(F.col(text_col), sep)).alias("_pidx", "_para"),
        )
        .filter(F.trim(F.col("_para")) != "")
        .withColumn(
            "_pkey", F.md5(F.trim(F.regexp_replace(F.lower(F.col("_para")), "\\s+", " ")))
        )
    )
    winners = paras.groupBy(*gcols, "_pkey").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("_pidx").alias("p"))).alias("_w")
    )
    kept = (
        paras.join(winners, gcols + ["_pkey"])
        .withColumn(
            "_keep",
            ((F.col("_w.i") == F.col(id_col)) & (F.col("_w.p") == F.col("_pidx"))).cast("int"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_paras"),
            F.sum("_keep").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep") == 1, F.struct("_pidx", "_para"))
                        )
                    ),
                    lambda s: s["_para"],
                ),
                joiner,
            ).alias("_text"),
        )
    )
    # left join so docs whose every paragraph was blank still come back.
    # NULL text stays NULL — it marks a failed extraction, and rewriting it
    # to '' would let a later exact-dup pass collapse every failed doc into
    # one fingerprint group and mass-delete them (the exact catastrophe
    # drop_exact_dups' NULL-passthrough exists to prevent)
    return (
        df.select(id_col, F.col(text_col).isNull().alias("_tnull"))
        .join(kept, id_col, "left")
        .select(
            id_col,
            F.when(F.col("_tnull"), F.lit(None).cast("string"))
            .otherwise(F.coalesce("_text", F.lit("")))
            .alias(text_col),
            F.coalesce("n_paras", F.lit(0)).cast("int").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        )
    )


# --- exact substring dedup (duplicated k-word windows) ----------------------------


def _gram_occurrences(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """One row per k-word window: (id, nw, start, h) where h = md5 of the
    space-joined lowercase window and start is the 0-based word index.
    Tokens are lowercase [a-z0-9]+ runs (the engine's `words`), so the hash
    family is reproducible in ANSI SQL. Pure codegen exprs — the per-doc
    window enumeration is a `transform` over `sequence`, never Python."""
    ws = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(words(F.col(text_col)), F.array().cast("array<string>")).alias("_ws"),
    ).withColumn("_nw", F.size("_ws"))
    grams = ws.withColumn(
        "_g",
        F.when(
            F.col("_nw") >= k,
            F.transform(
                F.sequence(F.lit(0), F.col("_nw") - k),
                lambda i: F.struct(
                    i.alias("start"),
                    F.md5(F.concat_ws(" ", F.slice(F.col("_ws"), i + 1, k))).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<start:int,h:string>>")),
    )
    return grams.select(
        F.col("_id"), F.col("_nw"), F.explode("_g").alias("_occ")
    ).select("_id", "_nw", F.col("_occ.start").alias("_start"), F.col("_occ.h").alias("_h"))


def substring_dup_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 12
) -> DataFrame:
    """Exact substring dedup, discovery pass (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr variant,
    re-expressed over word windows instead of a suffix array): a span is
    duplicated when its k-word window occurs anywhere else in the corpus
    earlier in (id, start) order. Overlapping/adjacent duplicated windows
    are merged into maximal intervals, so a shared 50-word passage comes
    back as ONE span, not 39 overlapping windows.

    Returns one row per merged duplicated interval:
      (id, span_start, span_end, n_words) with word-index spans [start, end).
    The FIRST corpus occurrence of every window (min (id, start)) is never
    marked — keep-first semantics; later occurrences (cross-document AND
    in-document repeats) are.

    Scale shape for 100 TB: window enumeration is map-side codegen; the
    winner per window hash is a map-side-combined min(struct) agg (a
    boilerplate passage shared by 10^8 docs stays bounded — no window over
    the hash key); dup detection is an equi-join back on the 16-byte hash;
    interval merge is a per-document window (partition key = doc, never a
    hot key). Suffix arrays find duplicates of ANY length >= threshold;
    this k-gram form trades that generality for a shuffle-friendly plan —
    the standard large-corpus approximation.
    """
    from pyspark.sql.window import Window

    occ = _gram_occurrences(df, text_col, id_col, k)
    winners = occ.groupBy("_h").agg(
        F.min(F.struct(F.col("_id").alias("i"), F.col("_start").alias("s"))).alias("_w"),
        F.count("*").alias("_c"),
    )
    dup = (
        occ.join(winners.filter(F.col("_c") > 1).drop("_c"), "_h")
        .filter(~((F.col("_w.i") == F.col("_id")) & (F.col("_w.s") == F.col("_start"))))
        .select("_id", "_start", (F.col("_start") + k).alias("_end"))
    )
    w = Window.partitionBy("_id").orderBy("_start")
    prev_max_end = F.max("_end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    merged = (
        dup.withColumn(
            "_new", F.when(prev_max_end.isNull() | (F.col("_start") > prev_max_end), 1).otherwise(0)
        )
        .withColumn("_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("_id", "_island")
        .agg(F.min("_start").alias("span_start"), F.max("_end").alias("span_end"))
    )
    return merged.select(
        F.col("_id").alias(id_col),
        F.col("span_start").cast("int"),
        F.col("span_end").cast("int"),
        (F.col("span_end") - F.col("span_start")).cast("int").alias("n_words"),
    )


def substring_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 12
) -> DataFrame:
    """Apply pass for exact substring dedup: remove every word covered by a
    duplicated interval (see `substring_dup_spans`) and reassemble the
    survivors in order. Output text is token-normalized (lowercase words
    joined by single spaces) — the interval coordinate system IS the word
    sequence, so the rewrite happens in that space; callers needing byte
    fidelity use the spans against the original text instead.

    Returns (id, text, n_words, n_dup_words, dup_frac) — one row per input
    doc, including docs with nothing removed and docs too short to window.
    """
    spans = substring_dup_spans(df, text_col, id_col, k)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_ivs"),
        F.sum("n_words").alias("_ndup"),
    )
    ws = df.select(
        id_col,
        F.coalesce(words(F.col(text_col)), F.array().cast("array<string>")).alias("_ws"),
        F.col(text_col).isNull().alias("_tnull"),
    )
    joined = ws.join(per_doc, id_col, "left").withColumn(
        "_ivs", F.coalesce(F.col("_ivs"), F.array().cast("array<struct<span_start:int,span_end:int>>"))
    )
    idx_words = F.transform(F.col("_ws"), lambda w_, i: F.struct(w_.alias("w"), i.alias("i")))
    kept = F.filter(
        idx_words,
        lambda s: ~F.exists(
            F.col("_ivs"), lambda iv: (s["i"] >= iv["span_start"]) & (s["i"] < iv["span_end"])
        ),
    )
    return joined.select(
        id_col,
        # NULL text stays NULL (failed-extraction marker — see
        # paragraph_dedup's note on the exact-dup mass-delete hazard)
        F.when(F.col("_tnull"), F.lit(None).cast("string"))
        .otherwise(F.array_join(F.transform(kept, lambda s: s["w"]), " "))
        .alias(text_col),
        F.size("_ws").cast("int").alias("n_words"),
        F.coalesce(F.col("_ndup"), F.lit(0)).cast("int").alias("n_dup_words"),
        F.when(F.size("_ws") > 0, F.coalesce(F.col("_ndup"), F.lit(0)) / F.size("_ws"))
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
