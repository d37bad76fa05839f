"""BM25 full-text retrieval over the documents table.

The missing "search" capability for a curation pipeline: query-based data
selection (pull the top-k corpus documents for each probe query), built the
way a 100 TB deployment would:

- ``bm25_postings`` is the INDEX: one explode + one (doc, term) groupBy
  (map-side combined) per corpus pass, producing (term, doc_id, tf, dl).
  At scale you compute it once and WRITE it bucketed by term — query time
  then touches only the probed terms' buckets.
- ``bm25_topk`` is the QUERY: the query-term table is tiny and broadcast;
  scoring is a broadcast hash join + one aggregation, never a corpus
  shuffle.

Determinism contract: the per-(query, doc, term) BM25 contribution is
quantized to integer micro-units (round(1e6 · idf · tf_part) AS BIGINT) and
summed as BIGINT — addition order can't change the score, so ranks are
bit-identical in any engine/partitioning (same trick as cluster.py /
classifier.py). idf = ln(1 + (N - df + ½)/(df + ½)) (Robertson-Spärck
Jones, the Lucene variant); tf_part = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).

Tokenization is textops.words (one shared definition with the language-ID /
TF-IDF twins); duplicate query terms count once.

No counterpart in the reference repo; LLM-data-pipeline addition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkdoc.textops import word_count, words

#: micro-unit scale for the integer score quantization
E6 = 1e6

#: nano-unit scale for the RRF integer quantization
E9 = 1e9


def bm25_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf, dl): the inverted-index postings table. dl is the
    word count of the document (the same words() the terms come from). One
    shuffle on (doc_id, term) with map-side combine; write this bucketed by
    term at corpus scale."""
    w = docs.select(
        F.col(id_col).alias("doc_id"), words(F.col(text_col)).alias("_w")
    ).withColumn("dl", F.size("_w"))
    return (
        w.select("doc_id", "dl", F.explode("_w").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
        .select("term", "doc_id", "tf", "dl")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    postings: DataFrame | None = None,
    max_df_frac: float | None = None,
    n_docs: int | None = None,
    sum_dl: int | None = None,
) -> DataFrame:
    """Top-k corpus documents per query by BM25, as (query_id, doc_id, rank,
    score_e6). score_e6 is the BIGINT micro-unit sum (divide by 1e6 for the
    conventional score). Ties break on ascending doc_id.

    Plan shape: postings (corpus-side, precomputable) ⨝ broadcast(query
    terms) on term → integer-sum per (query, doc) → window top-k. The
    corpus statistics (N, avgdl) are single scalar aggregates; at 100 TB
    they come from the index manifest, not a fresh scan.

    Pass ``postings`` (a persisted or bucketed-table read of
    ``bm25_postings``) to score against a prebuilt index — the postings
    branch feeds both the score join and the df aggregate, so without it
    each ``bm25_topk`` call recomputes the explode+groupBy twice. Building
    once and sharing is the production shape (multiple scoring variants /
    query batches against one index).

    ``max_df_frac`` prunes query terms whose document frequency exceeds
    that fraction of the corpus BEFORE the postings join — classic
    common-term (stopword) pruning. A term at df = 0.5·N contributes
    idf = ln(1 + 1/3·…) ≈ 0.6 nats spread over half the corpus: nearly
    rank-neutral, but it drags df·|queries| rows through the score join.
    Default None keeps exact BM25 (the oracle-gated semantics); the pruned
    variant is the production knob for high-volume query batches."""
    if postings is None:
        postings = bm25_postings(docs, text_col, id_col)
    if (n_docs is None) != (sum_dl is None):
        raise ValueError("bm25_topk: pass n_docs and sum_dl together (manifest stats)")
    if n_docs is not None:
        # manifest literals: with a prebuilt postings frame this skips the
        # ONLY remaining full-corpus pass (re-tokenizing every doc for two
        # scalars) — at 100 TB these numbers come from the index manifest
        stats = docs.sparkSession.range(1).select(
            F.lit(int(n_docs)).alias("n_docs"), F.lit(int(sum_dl)).alias("sum_dl")
        )
    else:
        # word_count, not size(words()): size(NULL) is -1/NULL by ANSI mode
        # and silently poisons n_docs/sum_dl/avgdl for NULL-text docs
        doclen = docs.select(
            F.col(id_col).alias("doc_id"), word_count(F.col(text_col)).alias("dl")
        )
        stats = doclen.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
        )
    dfreq = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df_docs"))
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(words(F.col(query_text_col)))).alias("term"),
        )
    )
    # assemble the query side FIRST, broadcasting the TINY frames into the
    # bigger streams (qterms into the vocab-sized dfreq, the 1-row stats into
    # the result): no vocab-wide broadcast, no vocab shuffle beyond the df
    # agg itself, and the corpus-sized postings stream pays exactly one
    # broadcast join — pruned terms never emit a row from it
    qside = dfreq.join(F.broadcast(qterms), "term").crossJoin(F.broadcast(stats))
    if max_df_frac is not None:
        qside = qside.filter(
            F.col("df_docs") <= F.lit(float(max_df_frac)) * F.col("n_docs")
        )
    scored = postings.join(F.broadcast(qside), "term")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    return _bm25_score_topk(scored, avgdl, k1, b, k)


def _bm25_score_topk(
    scored: DataFrame, avgdl: Column, k1: float, b: float, k: int
) -> DataFrame:
    """THE definition of the integer micro-unit BM25 scoring tail — shared
    by :func:`bm25_topk` and :func:`bm25_query_index`, whose bit-identical
    contract hangs on there being exactly one copy of this math. ``scored``
    carries (query_id, doc_id, tf, dl, df_docs, n_docs); ``avgdl`` is a
    double Column (column arithmetic or a manifest literal — IEEE-identical
    either way). The per-(query, doc, term) contribution is quantized to
    BIGINT micro-units so the cross-term sum is addition-order-independent;
    ties break on ascending doc_id."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_docs") + F.lit(0.5)) / (F.col("df_docs") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib = F.round(F.lit(E6) * idf * tf_part).cast("long")
    agg = (
        scored.select("query_id", "doc_id", contrib.alias("c_e6"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c_e6").alias("score_e6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score_e6")
    )


def _term_bucket_expr(term: Column, n_buckets: int) -> Column:
    """md5-prefix bucket of a term — engine-portable (any engine/driver can
    recompute it; same convention as the LSH plan-time md5 literals), stable
    across Spark versions, uniform over [0, n_buckets)."""
    return (
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("bigint") % n_buckets
    ).cast("int")


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`_term_bucket_expr` (byte-identical)."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def bm25_write_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Build the durable inverted index: postings written PARTITIONED BY an
    md5 term-bucket (``postings/bucket=K/``), corpus statistics (N, Σdl) in
    ``manifest.json``. This is the 100 TB shape the bm25_topk docstring
    promises: the corpus is tokenized and shuffled ONCE at build time; a
    query batch computes its terms' buckets driver-side and reads ONLY those
    partitions (partition pruning on the scan), and the scalar stats come
    from the manifest — no corpus scan at query time, ever.

    Bucketing by term HASH (not raw term) keeps the partition count fixed
    and uniform regardless of vocabulary size; every posting row of one term
    lands in one partition, so per-term df at query time is exact from the
    pruned read alone. Returns the manifest dict.

    ``path`` may live on any Spark-reachable filesystem (hdfs://, s3a://,
    local) — the manifest goes through the Hadoop FS API like the parquet
    parts, not the driver's local disk."""
    import json
    import os

    from sparkdoc.io import hadoop_write_text

    posts = bm25_postings(docs, text_col, id_col).withColumn(
        "bucket", _term_bucket_expr(F.col("term"), n_buckets)
    )
    posts.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "postings")
    )
    stats = (
        docs.select(word_count(F.col(text_col)).alias("dl"))
        .agg(F.count("*").alias("n_docs"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"))
        .collect()[0]
    )
    manifest = {
        "format": "bm25_postings_v1",
        "n_buckets": n_buckets,
        "n_docs": int(stats["n_docs"]),
        "sum_dl": int(stats["sum_dl"]),
        # the postings schema rides the manifest so query-side reads never
        # infer (faster, and an all-empty-docs corpus writes zero part
        # files — inference would fail outright on it)
        "schema": posts.schema.json(),
    }
    hadoop_write_text(
        docs.sparkSession,
        os.path.join(path, "manifest.json"),
        json.dumps(manifest, sort_keys=True),
    )
    return manifest


def bm25_update_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Append a delta corpus to an existing :func:`bm25_write_index` dir —
    the incremental-ingest path (same shape as jobs/dedup_delta.py's
    persisted-index updates). The delta is tokenized once and its postings
    APPENDED into the same bucket partitions (a term's rows stay in its one
    bucket, old + new, so per-term df from a pruned read remains exact);
    n_docs / Σdl accumulate in the manifest. Afterwards queries score
    bit-identically to a fresh index over the union.

    Caller contract: delta doc_ids are DISJOINT from the indexed corpus —
    re-ingesting a doc would double-count its postings. Run the delta
    through the incremental dedup first (sparkdoc/incremental.py) when that
    isn't guaranteed. Returns the updated manifest."""
    import json
    import os

    from pyspark.sql.types import StructType

    from sparkdoc.io import hadoop_read_text, hadoop_write_text

    spark = new_docs.sparkSession
    mpath = os.path.join(path, "manifest.json")
    pending = os.path.join(path, "update_pending.json")
    # append + manifest rewrite cannot be atomic on a bare parquet dir (an
    # Iceberg table would make this transactional); a pending marker turns
    # a mid-update crash from SILENT corruption (postings appended, stats
    # not) into a detected, refusing state
    from sparkdoc.io import hadoop_delete, hadoop_exists

    if hadoop_exists(spark, pending):
        raise RuntimeError(
            f"bm25_update_index: {pending} exists — a previous update died "
            "between the postings append and the manifest rewrite; the index "
            "may hold uncounted postings. Rebuild it (bm25_write_index) or "
            "restore from backup, then delete the marker."
        )
    manifest = json.loads(hadoop_read_text(spark, mpath))
    n_buckets = int(manifest["n_buckets"])

    posts = bm25_postings(new_docs, text_col, id_col).withColumn(
        "bucket", _term_bucket_expr(F.col("term"), n_buckets)
    )
    want = StructType.fromJson(json.loads(manifest["schema"]))
    # compare (name, type) only: StructType equality includes NULLABILITY,
    # which differs by construction path (parquet reads are nullable,
    # range-derived frames are not) and rejects type-identical deltas with
    # two identical-looking simpleStrings in the message
    got_sig = [(f.name, f.dataType.simpleString()) for f in posts.schema.fields]
    want_sig = [(f.name, f.dataType.simpleString()) for f in want.fields]
    if got_sig != want_sig:
        raise ValueError(
            "bm25_update_index: delta postings schema "
            f"{got_sig} != index schema {want_sig} — "
            "doc_id type must match the indexed corpus"
        )
    # delta stats FIRST (pure function of new_docs) so the only crash window
    # is append→manifest, which the marker brackets
    stats = (
        new_docs.select(word_count(F.col(text_col)).alias("dl"))
        .agg(F.count("*").alias("n_docs"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"))
        .collect()[0]
    )
    hadoop_write_text(
        spark, pending,
        json.dumps({"n_docs": int(stats["n_docs"]), "sum_dl": int(stats["sum_dl"])}),
    )
    posts.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(path, "postings")
    )
    manifest["n_docs"] = int(manifest["n_docs"]) + int(stats["n_docs"])
    manifest["sum_dl"] = int(manifest["sum_dl"]) + int(stats["sum_dl"])
    hadoop_write_text(spark, mpath, json.dumps(manifest, sort_keys=True))
    hadoop_delete(spark, pending)
    return manifest


def bm25_query_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float | None = None,
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    cache_pruned: bool = True,
) -> DataFrame:
    """Score a query batch against a :func:`bm25_write_index` directory,
    bit-identical to ``bm25_topk`` over the same corpus (same integer
    micro-unit quantization, same ties). The query batch is collected
    driver-side to enumerate its term buckets — queries are small by
    contract (the corpus never is); the postings scan then carries a
    partition filter on exactly those buckets, df per probed term is exact
    from the pruned read (a term's postings all live in one bucket), and
    N / avgdl are manifest literals.

    ``cache_pruned`` persists the pruned postings read (default True): the
    pruned rows feed both the df aggregate and the score join, and for a
    one-shot query job caching them halves the bucket IO. Pass False when
    composing into a long-lived session that manages its own caching. A
    query batch with no tokenizable terms returns an empty frame with the
    index-derived schema (no synthetic schema drift)."""
    import json
    import os

    from sparkdoc.io import hadoop_read_text

    manifest = json.loads(
        hadoop_read_text(spark, os.path.join(path, "manifest.json"))
    )
    n_buckets = int(manifest["n_buckets"])
    n_docs = int(manifest["n_docs"])
    sum_dl = int(manifest["sum_dl"])

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(words(F.col(query_text_col)))).alias("term"),
    )
    # driver-side bucket enumeration from the DISTINCT probed terms (small)
    probed = [r["term"] for r in qterms.select("term").distinct().collect()]
    buckets = sorted({term_bucket(t, n_buckets) for t in probed})

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(manifest["schema"]))
    posts = (
        spark.read.schema(schema)
        .parquet(os.path.join(path, "postings"))
        .filter(F.col("bucket").isin(buckets) if buckets else F.lit(False))
    )
    if cache_pruned and buckets:
        posts = posts.persist()
    dfreq = posts.groupBy("term").agg(F.countDistinct("doc_id").alias("df_docs"))
    qside = dfreq.join(F.broadcast(qterms), "term").withColumn(
        "n_docs", F.lit(n_docs).cast("long")
    )
    if max_df_frac is not None:
        qside = qside.filter(
            F.col("df_docs") <= F.lit(float(max_df_frac)) * F.col("n_docs")
        )
    scored = posts.join(F.broadcast(qside), "term")
    avgdl = F.lit(float(sum_dl) / n_docs) if n_docs else F.lit(1.0)
    out = _bm25_score_topk(scored, avgdl, k1, b, k)
    if cache_pruned and buckets:
        # hand the pinned pruned-postings frame to the caller via the
        # package's cache-handle convention (ngram_jaccard does the same):
        # after materializing the result, release it with
        #   for c in getattr(result, "_sparkdoc_caches", []): c.unpersist()
        # — without the handle a long-lived session leaked one cached frame
        # per query batch (the CLI jobs release it; an eager checkpoint here
        # would truncate the plan and hide the partition-filter shape the
        # pruning test asserts)
        out._sparkdoc_caches = [posts]  # type: ignore[attr-defined]
    return out


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k_rrf: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher SIGIR'09) of two or
    more per-query rankings — the standard hybrid-retrieval combiner (BM25 +
    dense ANN). Each input carries (query_id, <id_col>, rank); output is
    (query_id, doc_id, rank, rrf_e9, n_systems) with
    rrf_e9 = Σ_r round(1e9 / (k_rrf + rank_r)) summed as BIGINT — the
    integer quantization makes the fused score order-independent, so ranks
    are engine/partitioning-exact (same trick as bm25_topk). A (query, doc)
    seen by only some rankers contributes only those terms (n_systems says
    how many). Ties break on ascending doc_id.

    Scale shape: the inputs are already top-k-per-query tables — tiny
    relative to the corpus — so fusion is one union + one (query_id, doc_id)
    groupBy + one per-query window; the corpus is never touched again. At
    100 TB the heavy work lives in the retrievers (bucketed BM25 postings,
    ANN index); this post-merge is O(queries · k · systems).
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse: need at least two rankings to fuse")
    contrib = F.round(F.lit(E9) / (F.lit(k_rrf) + F.col("rank"))).cast("long")
    parts = [
        r.select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            contrib.alias("c_e9"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy("query_id", "doc_id").agg(
        F.sum("c_e9").alias("rrf_e9"),
        F.count("*").alias("n_systems"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_e9").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "rank", "rrf_e9", "n_systems")
    )
