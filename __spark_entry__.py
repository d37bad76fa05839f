"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship composite over sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2 +
training-data ops); each callable takes (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twins. Column names/aliases match
the Spark side exactly; float-bearing outputs use integer-cents arithmetic or
int/int division (bit-exact across engines); md5-keyed hashing keeps MinHash
reproducible in both engines. Non-SQL-expressible ops (span extraction,
chunking, simhash, LSH-ANN) have no oracle → driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve against module globals
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SYNTH_DOCS = 200  # deterministic synthetic interleaved corpus size for rows-only ops
SYNTH_SEED = 42


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _windows_120(docs: DataFrame, doc_col=None) -> DataFrame:
    """(doc_id, chunk_id, text): 120-char windows of documents.text — the
    shared derived-chunk input for the anchor/ledger/bind/coverage/owner
    twins. Mirrored by the `wins`/window CTEs in oracle_sql(); a change to
    the window size or the ceil/greatest guard must land in BOTH places."""
    dcol = F.col("doc_id") if doc_col is None else doc_col
    return docs.select(
        dcol.alias("doc_id"),
        F.posexplode(
            F.expr(
                "transform(sequence(1, greatest(int(ceil(length(text)/120.0)), 1)),"
                " i -> substring(text, (i-1)*120 + 1, 120))"
            )
        ).alias("chunk_id", "text"),
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-file parquet → ONE scan partition; the similarity kernels run
    # interpreted HOF folds per element, so without a repartition the whole
    # normalize+dot pipeline runs single-threaded (measured: knn wall 2.4 s
    # → 0.6 s at sf0.1 with the spread; a real corpus has many files and
    # parallelizes naturally, this mirrors that shape)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# hostile derived corpus: the synthetic documents are clean alnum English, so
# several text-operator gates were VACUOUS on them (no dups, no markup, no
# control chars, one language, nothing quality-rejected — every branch
# untaken on both engines agrees trivially). Union deterministic adversarial
# twins derived from doc_id so each twin regime is exercised; the DuckDB
# oracle derives the IDENTICAL corpus via _HOSTILE_SQL.
# --------------------------------------------------------------------------

_FR_TEXT = "le la les et un une est que dans pour du de des"
_DE_TEXT = "der die das und ist von mit den nicht ein eine zu"
_ES_TEXT = "el la los las de y que en un una es por con"
_JUNK_TEXT = "!!! ??? ### $$$ %%% ^^^ &&& ***"
_MARKUP_PRE = "<b>"
_MARKUP_POST = "</b>\x07<![CDATA[raw & markup]]> End."

_HOSTILE_SQL = (
    "SELECT doc_id, text FROM documents"
    " UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0"
    " UNION ALL SELECT doc_id + 2000000,"
    " '<b>' || substring(text, 1, 80) || '</b>' || chr(7) ||"
    " '<![CDATA[raw & markup]]>' || ' End.' FROM documents WHERE doc_id % 5 = 0"
    f" UNION ALL SELECT doc_id + 3000000, '{_FR_TEXT}' FROM documents WHERE doc_id % 11 = 0"
    f" UNION ALL SELECT doc_id + 4000000, '{_DE_TEXT}' FROM documents WHERE doc_id % 13 = 0"
    f" UNION ALL SELECT doc_id + 5000000, '{_ES_TEXT}' FROM documents WHERE doc_id % 17 = 0"
    f" UNION ALL SELECT doc_id + 6000000, '{_JUNK_TEXT}' FROM documents WHERE doc_id % 19 = 0"
)


def _docs_hostile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")

    def twin(mod: int, offset: int, text_col) -> DataFrame:
        return (
            d.filter(F.col("doc_id") % mod == 0)
            .select((F.col("doc_id") + offset).alias("doc_id"), text_col.alias("text"))
        )

    markup = F.concat(
        F.lit(_MARKUP_PRE), F.substring(F.col("text"), 1, 80), F.lit(_MARKUP_POST)
    )
    return (
        d.unionByName(twin(7, 1_000_000, F.col("text")))  # exact duplicates
        .unionByName(twin(5, 2_000_000, markup))  # tags + control char + CDATA
        .unionByName(twin(11, 3_000_000, F.lit(_FR_TEXT)))
        .unionByName(twin(13, 4_000_000, F.lit(_DE_TEXT)))
        .unionByName(twin(17, 5_000_000, F.lit(_ES_TEXT)))
        .unionByName(twin(19, 6_000_000, F.lit(_JUNK_TEXT)))  # quality-reject
    )


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: training-data enrichment over sf0.001 documents — quality
    features + language ID + exact-dup fingerprint + MinHash signature."""
    from sparkdoc.dedup_text import with_minhash
    from sparkdoc.textops import doc_fingerprint, quality_filter, token_count, with_language

    sf_dir = "/root/testdata/sf0.001"
    docs = _docs(spark, sf_dir)
    out = quality_filter(docs)
    out = with_language(out)
    out = out.withColumn("fp", doc_fingerprint(F.col("text")))
    out = out.withColumn("n_tokens", token_count(F.col("text")))
    out = with_minhash(out, k=8, out="_mh")
    out = out.withColumn("minhash", F.md5(F.concat_ws("|", F.col("_mh")))).drop("_mh")
    return out.select(
        "doc_id", "n_words", "n_tokens", "lang_pred", "quality_keep", "fp", "minhash"
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog (agg pushdown; exact integer-cents arithmetic)."""
    li = _t(spark, sf_dir, "lineitem")
    cents = lambda c, scale: F.round(F.col(c) * scale).cast("long")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("sum_qty"),
            F.sum(cents("l_extendedprice", 100)).alias("sum_base_price_cents"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
            ).alias("sum_disc_price_e4"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q3_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: 3-way join + top-10 (broadcast dims, deterministic tie-break)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
            ).alias("revenue_e4")
        )
        .orderBy(F.col("revenue_e4").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def _q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join, group by nation."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    # Join order (same inner-join predicate set as the textbook ladder, so
    # the result multiset is identical): the region/nation filter reaches
    # the supplier dim FIRST, and lineitem is pruned by the broadcast
    # supplier join BEFORE the only large-table shuffle (li ⨝ orders) —
    # at sf where orders exceeds the broadcast threshold, the sort-merge
    # join then shuffles ~1/|regions| of lineitem instead of all of it
    # (guide §3.2: reduce the big side before shuffling it).
    supp_asia = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        li.join(F.broadcast(supp_asia), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), (F.col("o_custkey") == F.col("c_custkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
            ).alias("revenue_e4")
        )
        .orderBy(F.col("revenue_e4").desc(), F.col("n_name").asc())
    )


def _top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: top-2 customers per nation by order revenue."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("revenue_cents"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc())
    return (
        rev.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("n_name", "c_custkey", "revenue_cents", "rnk")
    )


def _events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap via lag window."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flag = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_session", flag)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


def _events_latest_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup: last event per (user_id, event_type)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round(F.col("value") * 10000).cast("long").alias("value_e4"))
    )


def _events_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame analytic: carry last non-null 'click' value ≤12 rows forward per
    user (the chunk-owner carry window shape, SURVEY §2.9)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-12, 0)
    click_val = F.when(F.col("event_type") == "click", F.round(F.col("value") * 10000).cast("long"))
    return ev.select(
        "user_id",
        "event_id",
        F.last(click_val, ignorenulls=True).over(w).alias("last_click_e4"),
    )


def _events_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (sparkdoc/temporal.py): each purchase picks up the latest
    click at-or-before it per user, within a 24 h tolerance — Spark's
    missing ASOF JOIN as ONE union+window shuffle (no join node), twinned
    against DuckDB's LATERAL most-recent-row subquery."""
    from sparkdoc.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    out = asof_join(
        purchases,
        clicks,
        ["user_id"],
        right_vals=["event_id"],
        tiebreak="event_id",
        tolerance_s=86400,
    )
    return out.select("user_id", "event_id", "asof_event_id", "asof_lag_us")


def _events_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join: all (purchase, click) pairs within 1 h per
    user as an EQUI-join on (user, time-bucket) with the right side exploded
    to 3 adjacent buckets — never a theta-join, so skewed users hit AQE's
    skew split instead of a nested loop."""
    from sparkdoc.temporal import interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    return interval_join(
        purchases,
        clicks,
        ["user_id"],
        max_gap_s=3600,
        left_cols=["event_id"],
        right_cols=["event_id"],
    )


def _events_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops per user: distinct event types of even event_ids vs
    multiples-of-3 event_ids — OVERLAPPING, asymmetric sets, so intersect /
    union / except each produce non-degenerate sizes (the old even/odd split
    made both sets identical for every user: n_only_first was always 0 and
    the gate never exercised array_except) (SURVEY §2.9 set ops)."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.array_sort(
            F.array_distinct(F.collect_list(F.when(F.col("event_id") % 2 == 0, F.col("event_type"))))
        ).alias("first_types"),
        F.array_sort(
            F.array_distinct(F.collect_list(F.when(F.col("event_id") % 3 == 0, F.col("event_type"))))
        ).alias("second_types"),
    )
    return agg.select(
        "user_id",
        F.size(F.array_intersect("first_types", "second_types")).alias("n_common"),
        F.size(F.array_union("first_types", "second_types")).alias("n_union"),
        F.size(F.array_except("first_types", "second_types")).alias("n_only_first"),
    )


def _events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (F.window, 1h) per event_type: count,
    exact cents-sum, distinct users — the batch twin of
    streaming.stream_windowed_event_metrics (same window boundaries the
    watermarked streaming path finalizes; epoch-aligned, so DuckDB's
    date_trunc is the exact oracle). Sum in integer cents: summing doubles
    would hash-differ across partition orders."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_e2"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value_e2",
            "n_users",
        )
    )


def _doc_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.clean import content_chars, sanitize_text, squash_anchor

    docs = _docs_hostile(spark, sf_dir)  # markup/control/CDATA twins exercise all 3 regimes
    return docs.select(
        "doc_id",
        F.length(sanitize_text(F.col("text"))).alias("clean_len"),
        content_chars(F.col("text")).alias("content_len"),
        F.length(squash_anchor(F.col("text"))).alias("squash_len"),
    )


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.textops import token_count, word_count

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        word_count(F.col("text")).alias("n_words"),
        token_count(F.col("text")).alias("n_tokens"),
    )


def _doc_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.textops import with_language

    # hostile twins add fr/de/es texts: every language branch and the
    # strict-vs-non-strict precedence comparisons actually fire
    return with_language(_docs_hostile(spark, sf_dir)).select("doc_id", "lang_pred")


def _doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.textops import quality_filter

    # hostile twins add symbol-only junk (quality_keep=0 path) and
    # punctuation-terminated markup twins (ends_with_punct=1 path)
    return quality_filter(_docs_hostile(spark, sf_dir)).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "stop_fraction",
        "distinct_word_fraction",
        "ends_with_punct",
        "quality_keep",
    )


def _doc_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.textops import doc_fingerprint

    # hostile twins add verbatim duplicates (n_docs=2 groups, min-survivor)
    # and shared-text language twins (many-member groups): the grouping
    # semantics are actually exercised, not just 1-row groups
    return (
        _docs_hostile(spark, sf_dir)
        .withColumn("fp", doc_fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def _doc_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.dedup_text import minhash_agg

    return minhash_agg(_docs(spark, sf_dir), k=16, n=3, out="_mh").select(
        "doc_id",
        F.md5(
            F.array_join(F.transform(F.col("_mh"), lambda x: x.cast("string")), "|")
        ).alias("sig_hash"),
    )


def _doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard among the first 40 docs — top 20 most similar."""
    from sparkdoc.dedup_text import ngram_jaccard

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 40)
    ids = docs.select(F.col("doc_id").alias("a"))
    pairs = ids.crossJoin(docs.select(F.col("doc_id").alias("b"))).filter(F.col("a") < F.col("b"))
    j = ngram_jaccard(pairs, docs, text_col="text", id_col="doc_id", n=3)
    return j.orderBy(F.col("jaccard").desc(), F.col("a").asc(), F.col("b").asc()).limit(20).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard_r")
    )


def _doc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span segmentation of flat text: 24-word windows → ordered (kind, text,
    offset) spans — the SQL-expressible slice of the span pipeline."""
    from sparkdoc.textops import words

    W = 24
    docs = _docs(spark, sf_dir).withColumn("_w", words(F.col("text")))
    w = F.col("_w")
    segs = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(w) - 1) / W).cast("int")),
        lambda i: F.struct(
            i.cast("int").alias("offset"),
            F.concat_ws(" ", F.slice(w, i * W + 1, W)).alias("seg_text"),
        ),
    )
    out = docs.filter(F.size(w) > 0).select("doc_id", F.explode(segs).alias("s"))
    return out.select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.lit("text").alias("kind"),
        F.col("s.seg_text").alias("seg_text"),
    )


def _emb_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.similarity import _as_double, norm

    # the synthetic embeddings are unit vectors — every norm is exactly 1.0,
    # so the fold was only ever checked at one magnitude. Scale each row by
    # (1 + vec_id % 3) BEFORE the fold (same op order in the oracle): norms
    # {1,2,3} exercise the magnitude path, not just the fixed point
    scale = (F.lit(1) + F.col("vec_id") % 3).cast("double")
    scaled = F.transform(_as_double(F.col("embedding")), lambda x: x * scale)
    return _emb(spark, sf_dir).select(
        "vec_id", F.round(norm(scaled), 6).alias("l2_norm")
    )


def _emb_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.similarity import brute_force_topk

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(emb, queries_df, k=5)


def _emb_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: benchmark = every 97th
    vector, PERTURBED per dimension (×(1 + ((vec_id+i)%5)·0.01)) so its
    corpus source scores ≈0.9998 — the ≥0.95 comparison runs on genuine
    near-boundary float math, not an exact 1.0 — while unrelated docs top
    out ≈0.47. The oracle replays the perturbation, unit-normalize,
    sequential-fold dot and the row_number tie rule op-for-op."""
    from sparkdoc.similarity import semantic_decontam

    emb = _emb(spark, sf_dir)
    pert = F.transform(
        F.col("embedding"),
        lambda x, i: x.cast("double")
        * (
            F.lit(1.0)
            + ((F.col("vec_id") + i) % 5).cast("double") * F.lit(0.01)
        ),
    )
    bench = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("bench_id"), pert.alias("embedding")
    )
    return semantic_decontam(
        emb, bench, threshold=0.95, bench_id_col="bench_id"
    ).orderBy("vec_id")


def _emb_label_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority label among 5 NN — the eval-style similarity rollup."""
    from sparkdoc.similarity import brute_force_topk

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    knn = brute_force_topk(emb, queries_df, k=5)
    lbl = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label"))
    return (
        knn.join(F.broadcast(lbl), "neighbor_id")
        .groupBy("query_id", "n_label")
        .agg(F.count("*").alias("votes"))
    )


# --- rows-only (non-SQL-expressible) ops over the synthetic interleaved corpus


def _synth_raw(spark: SparkSession):
    from sparkdoc.synth import raw_nodes_df

    return raw_nodes_df(spark, SYNTH_DOCS, SYNTH_SEED, partitions=16)


def _extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule flagship: interleaved raw nodes → ordered spans.
    ORACLE-EXACT (r5): text md5-compressed, compared against a VALUES table
    generated by the INDEPENDENT pure-Python golden extractor over the full
    SYNTH_DOCS corpus (extract_spans_pinned does the same on 24 docs; this
    gate extends the independent check to the whole gate corpus)."""
    from sparkdoc.spans import explode_spans, extract_documents

    spans = explode_spans(extract_documents(_synth_raw(spark)))
    return spans.select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _scalarize(df: DataFrame) -> DataFrame:
    """Project array/map/struct columns through to_json so the driver's
    sort-by-all-columns canonicalizer (pandas) sees only scalars. The nested
    tables remain the real API; this only adapts the gate's output shape."""
    cols = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t in ("array", "map", "struct"):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunker over the full SYNTH_DOCS corpus. ORACLE-EXACT (r5): same
    md5-compressed projection as chunks_pinned, compared against the
    committed golden_chunks_main fixture (a deliberate drift pin, like
    every chunk-derived golden — regenerate via scripts/regen_goldens.py
    when the chunking spec changes)."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.spans import extract_documents

    ch = chunk_documents(extract_documents(_synth_raw(spark)))
    return ch.select(
        "doc_id",
        "chunk_id",
        "batch_index",
        F.md5(F.col("text")).alias("text_md5"),
        "token_count",
        F.array_join(F.transform("page_numbers", lambda x: x.cast("string")), ",").alias("pages"),
        F.md5(F.concat_ws("\x1f", "headings")).alias("headings_md5"),
        "text_hash",
        "char_length",
        F.coalesce(F.col("resplit_of"), F.lit(-1)).alias("resplit_of"),
    )


def _ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end provenance: extract → chunk → heading entities → anchor
    scan → ledger."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.dedup import with_node_ids
    from sparkdoc.provenance import build_ledger
    from sparkdoc.spans import explode_spans, extract_documents

    docs = extract_documents(_synth_raw(spark))
    chunks = chunk_documents(docs)
    spans = explode_spans(docs)
    entities = (
        spans.filter(F.col("kind") == "heading")
        .select(
            "doc_id",
            F.lit("sections[]").alias("path"),
            F.lit("Section").alias("class"),
            F.create_map(F.lit("name"), F.regexp_replace(F.col("text"), "^#+\\s*", "")).alias("ids"),
            F.create_map().cast("map<string,string>").alias("fields"),
            F.array().cast("array<int>").alias("chunk_ids"),
        )
    )
    # ORACLE-EXACT (r5): ids/anchors md5-compressed via canonical JSON,
    # compared against the committed golden_ledger_main fixture (drift pin)
    led = build_ledger(with_node_ids(entities), chunks)
    return led.select(
        "doc_id",
        "identity_key",
        "path",
        F.md5(F.to_json(F.col("ids"))).alias("ids_md5"),
        F.md5(F.to_json(F.col("anchors"))).alias("anchors_md5"),
    )


def _doc_fold_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode fold + phrase-key normalizers (identity layer, SURVEY §2.2)."""
    from sparkdoc.identity import fold_text_udf, phrase_key_udf

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        fold_text_udf()(F.col("text")).alias("folded"),
        phrase_key_udf()(F.col("text")).alias("pkey"),
    )


def _doc_digit_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-signature projection over event props (alias guard input)."""
    from sparkdoc.identity import digit_signature_udf

    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", digit_signature_udf()(F.col("props")).alias("digit_sig"))


_SIZED_CASE = (
    "CASE WHEN doc_id % 500 = 0 THEN 1700 WHEN doc_id % 9 = 8 THEN 300 "
    "WHEN doc_id % 9 = 4 THEN 40 ELSE 1 END"
)
_SIZED_SQL = f"SELECT doc_id, repeat(text, {_SIZED_CASE}) AS text FROM documents"


def _docs_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents inflated by a deterministic repeat factor so the contract
    cost model's thresholds actually cross: the raw gate corpus maxes at
    ~600 chars vs the 32768-char direct bound, making contract/llm_format
    constant ('direct'/'doclang-geo') for every doc — an inverted threshold
    was invisible. ~11% of docs now resolve dense."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.expr(f"repeat(text, {_SIZED_CASE})").alias("text")
    )


def _doc_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document plan choice (direct vs dense cost model, SURVEY §4)."""
    from sparkdoc.contracts import with_contract

    return with_contract(_docs_sized(spark, sf_dir)).select("doc_id", "contract", "est_tokens")


def _page_markdowns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page markdown serialization. ORACLE-EXACT (r5): markdown
    md5-compressed, compared against a VALUES table computed by an
    INDEPENDENT Python twin (page split + render + join) over the golden
    extractor's span sequences."""
    from sparkdoc.serialize import page_markdowns
    from sparkdoc.spans import explode_spans, extract_documents

    pm = page_markdowns(explode_spans(extract_documents(_synth_raw(spark))))
    return pm.select("doc_id", "page_no", F.md5(F.col("markdown")).alias("md_md5"))


def _chunk_owner_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end chunk-owner correlation over the synth corpus."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.serialize import chunk_owner_map
    from sparkdoc.spans import explode_spans, extract_documents

    docs = extract_documents(_synth_raw(spark))
    chunks = chunk_documents(docs)
    parents = (
        explode_spans(docs)
        .filter(F.col("kind") == "heading")
        .select(
            "doc_id",
            F.concat(F.lit("H_"), F.col("offset").cast("string")).alias("node_id"),
            F.regexp_replace(F.col("text"), "^#+\\s*", "").alias("label"),
        )
    )
    return chunk_owner_map(chunks, parents).filter(F.col("owner_id").isNotNull())


def _graph_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entities → node ids → dedup → nodes/edges → clean → per-class stats."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.dedup import dedup_entities, with_node_ids
    from sparkdoc.graph import clean_edges, entities_to_nodes, graph_stats
    from sparkdoc.spans import explode_spans, extract_documents

    docs = extract_documents(_synth_raw(spark))
    spans = explode_spans(docs)
    chunks = chunk_documents(docs)
    sections = spans.filter(F.col("kind") == "heading").select(
        "doc_id",
        F.lit("sections[]").alias("path"),
        F.lit("Section").alias("class"),
        F.create_map(F.lit("name"), F.regexp_replace(F.col("text"), "^#+\\s*", "")).alias("ids"),
        F.create_map().cast("map<string,string>").alias("fields"),
        F.array(F.col("offset")).cast("array<int>").alias("chunk_ids"),
    )
    doc_entities = chunks.groupBy("doc_id").agg(F.count("*").alias("n")).select(
        "doc_id",
        F.lit("docs[]").alias("path"),
        F.lit("Document").alias("class"),
        F.create_map(F.lit("name"), F.col("doc_id")).alias("ids"),
        F.create_map(F.lit("n_chunks"), F.col("n").cast("string")).alias("fields"),
        F.array().cast("array<int>").alias("chunk_ids"),
    )
    entities = sections.unionByName(doc_entities)
    nodes = entities_to_nodes(dedup_entities(with_node_ids(entities)))
    edges = (
        nodes.filter(F.col("node_class") == "Section")
        .select(F.col("node_id").alias("src"), "doc_id")
        .join(
            nodes.filter(F.col("node_class") == "Document").select(
                F.col("node_id").alias("dst"), "doc_id"
            ),
            "doc_id",
        )
        .select("src", "dst", F.lit("in_document").alias("label"), F.lit(None).cast("map<string,string>").alias("props"))
    )
    return graph_stats(nodes, clean_edges(nodes, edges))


def _extraction_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full catalog-driven document→graph conversion driver (extractor.py):
    extract → chunk → skeleton+coverage → FILL → salvage ladder → graph with
    resolve-ladder parent edges + reference-field edges + alias merge."""
    from sparkdoc.extractor import convert_document_graph
    from sparkdoc.synth import raw_nodes_df

    out = convert_document_graph(raw_nodes_df(spark, 64, SYNTH_SEED, partitions=8))
    return out["nodes"].select("node_id", "doc_id", "node_class", "label")


def _fill_phase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 2 (dense fill): projected per-path schemas over scoped context,
    one filled object per descriptor, ids sanitize-restored (fill.py)."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.extractor import coverage_pass, demo_catalog, skeleton_phase
    from sparkdoc.fill import fill_phase
    from sparkdoc.spans import extract_documents

    cat = demo_catalog()
    chunks = chunk_documents(extract_documents(_synth_raw(spark))).localCheckpoint()
    filled = fill_phase(chunks, coverage_pass(chunks, skeleton_phase(chunks, cat), cat), cat)
    return _scalarize(filled)


def _one_to_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page extraction strategy (one_to_one.py:27-219 analog): one model
    per page over the synth corpus."""
    from sparkdoc.extractor import one_to_one_extract
    from sparkdoc.spans import explode_spans, extract_documents

    spans = explode_spans(extract_documents(_synth_raw(spark)))
    return _scalarize(one_to_one_extract(spans))


def _doc_format_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract + llm_input_format auto-resolution branch (many_to_one.py:
    274-313): direct→doclang-geo, dense→doclang."""
    from sparkdoc.contracts import with_resolved_format

    return with_resolved_format(_docs_sized(spark, sf_dir)).select(
        "doc_id", "contract", "llm_format"
    )


def _graph_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-complete 3-way graph merge (merge.merge_graphs_policy) with a
    DuckDB-checkable outcome: input-order keep-first fold + per-node conflict
    count, over synthetic per-document node tables."""
    from sparkdoc.merge import merge_graphs_policy
    from sparkdoc.schemas import EDGES

    docs = _docs(spark, sf_dir).select("doc_id")
    empty_edges = spark.createDataFrame([], EDGES)

    def mk(attrs, where=None):
        d = docs if where is None else docs.filter(where)
        return d.select(
            F.concat(F.lit("N"), F.col("doc_id").cast("string")).alias("node_id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit("T").alias("node_class"),
            F.concat(F.lit("n"), F.col("doc_id").cast("string")).alias("label"),
            attrs.alias("attrs"),
            F.lit(None).cast("string").alias("provenance"),
        )

    # conflict regimes VARY per node (0, 1, or 2 conflicts): g2 agrees with
    # g1 on 'a' when doc_id%3==0 (agreement is NOT a conflict), and g3
    # contradicts g2's 'b' only when doc_id%4==1 — a policy that emitted a
    # constant one conflict per node would no longer match the oracle
    g1 = mk(F.create_map(F.lit("a"), F.concat(F.lit("a"), (F.col("doc_id") % 3).cast("string"))))
    g2 = mk(
        F.create_map(
            F.lit("a"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("a0")).otherwise(F.lit("z")),
            F.lit("b"), F.concat(F.lit("b"), (F.col("doc_id") % 2).cast("string")),
        )
    )
    g3 = mk(
        F.map_concat(
            F.create_map(F.lit("c"), F.lit("c")),
            F.when(
                F.col("doc_id") % 4 == 1, F.create_map(F.lit("b"), F.lit("zz"))
            ).otherwise(F.create_map().cast("map<string,string>")),
        ),
        where=F.col("doc_id") % 2 == 1,
    )
    out = merge_graphs_policy([(g1, empty_edges), (g2, empty_edges), (g3, empty_edges)])
    nconf = out["conflicts"].groupBy("node_id").agg(F.count("*").alias("n_conflicts"))
    return (
        out["nodes"]
        .join(nconf, "node_id", "left")
        .select(
            "node_id",
            F.element_at("attrs", "a").alias("a"),
            F.element_at("attrs", "b").alias("b"),
            F.element_at("attrs", "c").alias("c"),
            F.coalesce("n_conflicts", F.lit(0)).cast("long").alias("n_conflicts"),
        )
    )


def _doc_salvage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salvage fixer ladder with a DuckDB-expressible truth table: synthetic
    Fee instances carrying (bad enum | valid enum | missing enum) × (blank |
    present) identity — the ladder's outcome (fixed enum value, validity,
    rounds used) is deterministic, so the oracle can assert it exactly."""
    from sparkdoc.extractor import demo_catalog
    from sparkdoc.salvage import salvage_entities

    docs = _docs(spark, sf_dir)
    ents = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("fees[]").alias("path"),
        F.lit("Fee").alias("class"),
        F.create_map(
            F.lit("amount"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("")).otherwise(F.col("doc_id").cast("string")),
        ).alias("ids"),
        F.when(F.col("doc_id") % 3 == 0, F.create_map(F.lit("currency"), F.lit("JPY")))
        .when(F.col("doc_id") % 3 == 1, F.create_map(F.lit("currency"), F.lit("USD")))
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("fields"),
        F.array().cast("array<int>").alias("chunk_ids"),
        F.concat(F.lit("Fee_"), F.col("doc_id").cast("string")).alias("node_id"),
        F.lit(0).alias("fill_batch"),
    )
    out = salvage_entities(ents, demo_catalog())
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.element_at("fields", "currency").alias("currency_out"),
        F.col("valid").cast("long").alias("valid"),
        F.col("salvage_passes").cast("long").alias("salvage_passes"),
    )


def _domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe per-domain rollup: two-phase salted aggregation over the
    zipf-skewed domain key (north rule: explicit salting). ORACLE-EXACT
    (r5): the salted split + re-combine must equal the plain rollup the
    INDEPENDENT golden extractor's Python twin computes (VALUES oracle)."""
    from sparkdoc.skew import domain_stats
    from sparkdoc.spans import extract_documents

    out = domain_stats(extract_documents(_synth_raw(spark)))
    return out.select(
        "domain",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_spans").cast("long").alias("total_spans"),
        F.col("max_spans").cast("long").alias("max_spans"),
    )


def _source_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the documents table keyed by
    ``source`` — oracle-exact: the salt split + re-combine must equal a plain
    GROUP BY (the correctness contract of skew.salted_agg)."""
    from sparkdoc.skew import salted_agg

    docs = _docs(spark, sf_dir)
    out = salted_agg(
        docs,
        ["source"],
        {
            "n_docs": ("count", "doc_id"),
            "total_chars": ("sum", "n_chars"),
            "max_chars": ("max", "n_chars"),
        },
    )
    return out.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("max_chars").cast("long").alias("max_chars"),
    )


def _doclang_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocLang-style serialization with byte-exact 512-grid geometry."""
    from sparkdoc.serialize import doclang_documents
    from sparkdoc.spans import extract_span_rows_geo

    return doclang_documents(extract_span_rows_geo(_synth_raw(spark)))


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: picture spans → binary media table → decode-stub
    features (hash, dims, embedding)."""
    from sparkdoc.multimodal import image_features, synth_media_df
    from sparkdoc.spans import extract_documents

    docs = extract_documents(_synth_raw(spark))
    feats = image_features(synth_media_df(spark, docs))
    return feats.select("media_ref", "doc_id", "sha256", "n_bytes", "width", "height")


def _media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (sparkdoc.imagecodec: BMP 24/32bpp bottom-up and
    top-down, binary PPM/PGM) pinned against a closed-form oracle: the synth
    corpus draws pixels from an arithmetic formula, so DuckDB recomputes the
    channel sums and the position-weighted luma sum (row-order + channel-
    order + padding sensitive) WITHOUT decoding — any decoder bug (BGR swap,
    bottom-up flip, stride padding, PNM header parse) breaks the match."""
    from sparkdoc.multimodal import image_pixel_stats, synth_decodable_media_df

    media = synth_decodable_media_df(spark, 40)
    return image_pixel_stats(media).select(
        "doc_id", "media_ref", "decoded", "width", "height",
        "sum_r", "sum_g", "sum_b", "wsum_luma",
    ).orderBy("doc_id")


def _media_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode (sparkdoc.imagecodec: stdlib-zlib DEFLATE, all five
    scanline filters via the per-row round-robin, color types 0/2/3/4/6)
    pinned against a closed-form oracle: formula pixels, so DuckDB
    recomputes channel sums and the position-weighted luma sum WITHOUT
    decoding — an unfilter bug (wrong Paeth predictor, missed bpp offset),
    a palette-index slip, or a kept alpha byte breaks the match."""
    from sparkdoc.multimodal import image_pixel_stats, synth_png_media_df

    media = synth_png_media_df(spark, 40)
    return image_pixel_stats(media).select(
        "doc_id", "media_ref", "decoded", "width", "height",
        "sum_r", "sum_g", "sum_b", "wsum_luma",
    ).orderBy("doc_id")


def _media_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode (sparkdoc.imagecodec: 12-bit variable-width LZW,
    4-pass interlace, CLEAR handling) pinned against a closed-form oracle:
    all four container shapes (LZW/uncompressed × sequential/interlaced)
    decode to the same formula pixels, so a table-growth desync, a wrong
    interlace pass order, or a palette slip breaks the match."""
    from sparkdoc.multimodal import image_pixel_stats, synth_gif_media_df

    media = synth_gif_media_df(spark, 40)
    return image_pixel_stats(media).select(
        "doc_id", "media_ref", "decoded", "width", "height",
        "sum_r", "sum_g", "sum_b", "wsum_luma",
    ).orderBy("doc_id")


def _media_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode (sparkdoc.jpegcodec: Huffman entropy decode,
    DC prediction, dequant + IDCT, 4:2:0 upsample, DRI/RSTn) pinned against
    a closed-form oracle: flat-block images with the all-8s quant table are
    reconstructed EXACTLY (DC-only path), so DuckDB replays the fixed
    floor(x+0.5) YCbCr→RGB conversion over the block formulas — a Huffman
    desync, DC-predictor slip, IDCT scale error, or upsample bug breaks it."""
    from sparkdoc.multimodal import image_pixel_stats, synth_jpeg_media_df

    media = synth_jpeg_media_df(spark, 40)
    return image_pixel_stats(media).select(
        "doc_id", "media_ref", "decoded", "width", "height",
        "sum_r", "sum_g", "sum_b", "wsum_luma",
    ).orderBy("doc_id")


def _media_jpeg_prog_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG decode (sparkdoc.jpegcodec SOF2: multi-scan
    coefficient accumulation — spectral selection, successive-approximation
    DC and AC refinement, EOB runs) pinned against the SAME closed-form
    oracle as the sequential gate: identical formula images coded
    progressively must decode to identical pixels. A scan-assembly slip, a
    refinement-bit desync, or an EOB-run miscount breaks the match."""
    from sparkdoc.multimodal import image_pixel_stats, synth_jpeg_prog_media_df

    media = synth_jpeg_prog_media_df(spark, 40)
    return image_pixel_stats(media).select(
        "doc_id", "media_ref", "decoded", "width", "height",
        "sum_r", "sum_g", "sum_b", "wsum_luma",
    ).orderBy("doc_id")


def _media_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL TIFF decode (sparkdoc.imagecodec: II/MM IFD parse, multi-strip
    reassembly, PackBits, TIFF-LZW with the early-change code-width rule,
    horizontal predictor 2, WhiteIsZero inversion) pinned against a
    closed-form oracle: formula pixels, so DuckDB recomputes channel sums
    and the position-weighted luma sum WITHOUT decoding — an endianness
    slip, a strip-boundary error, an LZW width desync, a predictor
    off-by-one, or a missed gray inversion breaks the match."""
    from sparkdoc.multimodal import image_pixel_stats, synth_tiff_media_df

    media = synth_tiff_media_df(spark, 42)
    return image_pixel_stats(media).select(
        "doc_id", "media_ref", "decoded", "width", "height",
        "sum_r", "sum_g", "sum_b", "wsum_luma",
    ).orderBy("doc_id")


def _media_webp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP-lossless decode (sparkdoc.webpcodec: VP8L prefix codes,
    LZ77 with the 2D distance map, color cache, and the four inverse
    transforms — predictor/color/subtract-green/palette) pinned against the
    same closed-form formula-pixel oracle as the TIFF gate: DuckDB
    recomputes channel sums and the position-weighted luma sum WITHOUT
    decoding — a prefix-code desync, a wrong distance mapping, a cache-hash
    slip, or an inverse-transform error breaks the match."""
    from sparkdoc.multimodal import image_pixel_stats, synth_webp_media_df

    media = synth_webp_media_df(spark, 42)
    return image_pixel_stats(media).select(
        "doc_id", "media_ref", "decoded", "width", "height",
        "sum_r", "sum_g", "sum_b", "wsum_luma",
    ).orderBy("doc_id")


def _media_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling (sparkdoc.videocodec: Y4M with
    C420/C444/Cmono chroma layouts) pinned against a closed-form oracle:
    formula luma planes, every-2nd-frame sampling, true fps timestamps. The
    per-frame position-weighted sum catches chroma-skip desync — a wrong
    plane size shifts every subsequent frame's bytes."""
    from sparkdoc.multimodal import synth_decodable_video_df, video_frame_stats

    media = synth_decodable_video_df(spark, 20)
    return video_frame_stats(media, every_n=2).select(
        "doc_id", "media_ref", "decoded", "frame_index", "ts_ms",
        "width", "height", "sum_y", "wsum_y",
    ).orderBy("doc_id", "frame_index")


def _doc_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-structure recovery (tableops.split_table_cells): pipe-row table
    text (the chunker's rendering of table spans) → one row per cell with
    0-based (row_idx, col_idx). Derived input: a 3-row table built from each
    document's words; every third document drops the last cell of the last
    row so RAGGED tables are exercised. The oracle constructs the expected
    cell grid directly from the same word formulas — any split/trim/indexing
    drift breaks the match."""
    from sparkdoc.tableops import split_table_cells

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    fbs = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta", "iota"]

    def word(i: int, fb: str):
        # try_element_at: under ANSI (default in this session) element_at on a
        # short array THROWS instead of returning NULL, so the fallback
        # below would be unreachable exactly when needed (docs with fewer
        # words than the highest index used)
        c = F.regexp_replace(F.lower(F.try_element_at(w, F.lit(i))), "[^a-z]", "")
        return F.coalesce(F.nullif(c, F.lit("")), F.lit(fb))

    rows = []
    for r in range(3):
        cells = [word(3 * r + c + 1, fbs[3 * r + c]) for c in range(3)]
        full = F.concat_ws(" | ", *cells)
        if r == 2:
            rows.append(
                F.when(F.col("doc_id") % 3 == 0, F.concat_ws(" | ", *cells[:2])).otherwise(full)
            )
        else:
            rows.append(full)
    tbl = docs.select("doc_id", F.concat_ws("\n", *rows).alias("text"))
    return split_table_cells(tbl, keep=["doc_id"]).orderBy("doc_id", "row_idx", "col_idx")


def _doc_table_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape rollup chained on the cell grid (tableops.table_shapes):
    n_rows / n_cells / min-max width / raggedness per table."""
    from sparkdoc.tableops import table_shapes

    cells = _doc_table_cells(spark, sf_dir)
    return table_shapes(cells, keys=["doc_id"]).orderBy("doc_id")


def _media_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM WAV decode (sparkdoc.audiocodec: 8/16-bit, multi-channel,
    chunk-walk header) pinned the same way as media_decode: formula samples,
    closed-form oracle; the interleave-position-weighted sum catches channel
    or byte-order mistakes."""
    from sparkdoc.multimodal import audio_features, synth_decodable_audio_df

    media = synth_decodable_audio_df(spark, 30)
    return audio_features(media).select(
        "doc_id", "media_ref", "decoded", "sample_rate", "n_frames", "channels",
        "duration_ms", "sum_s", "sum_abs", "wsum_s",
    ).orderBy("doc_id")


def _doc_simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 64-bit SimHash signature — md5 word-hash family, so the
    DuckDB twin reproduces it bit-for-bit (oracle-exact fingerprints)."""
    from sparkdoc.dedup_text import simhash64

    return simhash64(_docs(spark, sf_dir)).select("doc_id", "simhash")


def _doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.dedup_text import simhash64, simhash_near_dups

    docs = simhash64(_docs(spark, sf_dir))
    # pigeonhole blocking is recall-complete for the advertised radius
    # (max_hamming+1 blocks); radius 6 ≈ 90% bit agreement, a meaningful
    # near-dup bar (the old 4-block split only guaranteed radius 3)
    return simhash_near_dups(docs, max_hamming=6)


def _emb_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    return lsh_topk(emb, queries_df, k=5, n_bits=4)


def _emb_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(emb, queries_df, k=5, n_cells=16, nprobe=3, dim=64)


def _emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality gate: recall@5 of the LSH and IVF paths vs exact brute
    force, per method (mean over queries)."""
    from sparkdoc.similarity import ann_recall, brute_force_topk, ivf_topk, lsh_topk

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries_df, k=5)
    lsh = lsh_topk(emb, queries_df, k=5, n_bits=4)
    ivf = ivf_topk(emb, queries_df, k=5, n_cells=16, nprobe=3, dim=64)
    return ann_recall(exact, {"lsh": lsh, "ivf": ivf})


def _doc_resolve_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.4 parent-resolution ladder (resolve.resolve_parents, all six
    rungs) over engine-reproducible derived inputs: parents/children built
    from words of documents.text so that different docs exercise different
    rungs (exact, singleton, containment, co-chunk, adjacent, bucket). The
    whole cascade is uniqueness-guarded joins + one forward-fill window —
    the DuckDB twin mirrors it rung for rung, including rung attribution
    (`resolved_by`). Canonicalization on this ASCII corpus is
    lower+strip-non-alnum, identical in both engines."""
    from sparkdoc.resolve import resolve_parents

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")

    def wd(i):
        return F.element_at(w, i)

    def pstruct(node, path, label, chunk, emission):
        return F.struct(
            F.lit(node).alias("node_id"),
            F.lit(path).alias("path"),
            label.alias("label"),
            F.array(F.lit(chunk)).alias("chunk_ids"),
            F.lit(emission).alias("emission"),
        )

    parents = (
        docs.select(
            "doc_id",
            F.explode(
                F.array(
                    pstruct("P1", "secs[]", wd(1), 0, 0),
                    pstruct("P5", "secs[]", wd(5), 1, 4),
                    pstruct("P9", "secs[]", wd(9), 2, 8),
                    pstruct("T1", "tabs[]", wd(3), 0, 2),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.*")
        .filter(F.length("label") > 0)
    )

    def cstruct(child, path, key, chunk, emission):
        return F.struct(
            F.lit(child).alias("child_id"),
            F.lit(path).alias("parent_path"),
            key.alias("parent_key"),
            F.array(F.lit(chunk)).alias("chunk_ids"),
            F.lit(emission).alias("emission"),
        )

    children = docs.select(
        "doc_id",
        F.explode(
            F.array(
                cstruct("C1", "secs[]", wd(1), 5, 1),
                cstruct("C2", "tabs[]", wd(2), 7, 3),
                cstruct("C3", "secs[]", F.substring(wd(9), 1, 4), 8, 5),
                cstruct("C4", "secs[]", F.lit("zzzz"), 2, 6),
                cstruct("C5", "secs[]", F.lit("qqqq"), 9, 6),
                cstruct("C6", "none[]", wd(1), 0, 0),
            )
        ).alias("c"),
    ).select("doc_id", "c.*")
    out = resolve_parents(children, parents)
    return out.select("doc_id", "child_id", "parent_id", "resolved_by")


def _doc_anchor_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim anchor scan (provenance.anchor_scan) over derived inputs:
    chunks = 120-char windows of documents.text, entity id values = words
    1/5 (node N1) and 2 (node N2). Every guard — min length 3, numeric≥4
    digits, escape retry, >6-chunk distinctiveness drop, first-occurrence
    span — is JVM SQL, so the DuckDB twin reproduces hits and [start,end)
    byte offsets exactly."""
    from sparkdoc.provenance import anchor_scan

    docs = _docs(spark, sf_dir)
    chunks = _windows_120(docs)
    w = F.split(F.col("text"), " ")
    entities = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("N1").alias("node_id"),
                    F.create_map(
                        F.lit("code"), F.element_at(w, 1), F.lit("name"), F.element_at(w, 5)
                    ).alias("ids"),
                ),
                F.struct(
                    F.lit("N2").alias("node_id"),
                    F.create_map(F.lit("code"), F.element_at(w, 2)).alias("ids"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "e.*")
    return anchor_scan(entities, chunks)


def _doc_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance ledger (provenance.build_ledger) over the same derived
    inputs as doc_anchor_scan, anchors exploded with their in-list index:
    verbatim anchors sorted (chunk_id, span) capped at MAX_ANCHORS=8, nodes
    with no verbatim hit fall back to 'observed' at their declared chunks —
    the DuckDB twin reproduces membership, order, and spans exactly."""
    from sparkdoc.provenance import build_ledger

    docs = _docs(spark, sf_dir)
    chunks = _windows_120(docs)
    w = F.split(F.col("text"), " ")
    entities = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("N1").alias("node_id"),
                    F.lit("a[]").alias("path"),
                    F.create_map(
                        F.lit("code"), F.element_at(w, 1), F.lit("name"), F.element_at(w, 5)
                    ).alias("ids"),
                    F.array(F.lit(0)).alias("chunk_ids"),
                ),
                F.struct(
                    F.lit("N2").alias("node_id"),
                    F.lit("b[]").alias("path"),
                    F.create_map(F.lit("code"), F.element_at(w, 2)).alias("ids"),
                    F.array(F.lit(1)).alias("chunk_ids"),
                ),
            )
        ).alias("ent"),
    ).select("doc_id", "ent.*")
    led = build_ledger(entities, chunks)
    return led.select(
        "doc_id", "identity_key", "path", F.posexplode("anchors").alias("idx", "a")
    ).select(
        "doc_id",
        "identity_key",
        "path",
        F.col("idx").cast("int").alias("idx"),
        F.col("a.chunk_id").alias("chunk_id"),
        F.col("a.kind").alias("kind"),
        F.element_at("a.span", 1).alias("s"),
        F.element_at("a.span", 2).alias("e"),
    )


def _doc_alias_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 alias reconciliation over derived nodes: containment alias
    groups (canonical containment + equal digit signatures + min base len 4
    + unique-base-per-superset + unique-superset-per-base — ambiguous on
    EITHER side proposes nothing) then the co-occurrence veto (shared
    first-emission chunk ⇒ siblings, not aliases). Per-doc scoped via
    scope_cols — every guard is SQL-mirrorable, so the DuckDB twin must
    reproduce surviving pairs exactly."""
    from sparkdoc.dedup import co_occurrence_veto, containment_alias_groups

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")

    def wd(i):
        return F.element_at(w, i)

    def nstruct(nid, label, chunk):
        return F.struct(
            F.lit(nid).alias("nid"), label.alias("label"), F.array(F.lit(chunk)).alias("chunk_ids")
        )

    nodes = docs.select(
        "doc_id",
        F.explode(
            F.array(
                nstruct("A1", wd(1), 0),
                nstruct("A2", F.concat_ws(" ", wd(1), wd(2)), 1),
                nstruct("B1", wd(3), 2),
                nstruct("B2", F.concat_ws(" ", wd(3), wd(4)), 2),
            )
        ).alias("n"),
    ).select(
        F.concat(F.col("doc_id").cast("string"), F.lit("_"), F.col("n.nid")).alias("node_id"),
        "doc_id",
        F.lit("T").alias("node_class"),
        F.col("n.label").alias("label"),
        F.col("n.chunk_ids").alias("chunk_ids"),
    )
    pairs = containment_alias_groups(nodes, scope_cols=("node_class", "doc_id"))
    kept = co_occurrence_veto(pairs, nodes)
    return kept.select("doc_id", "base_id", "base_canon", "superset_id", "superset_canon")


def _doc_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-bound demotion audit (dedup.enforce_cardinality_bounds)
    over derived nodes: the FULL rank key — filled-attr richness desc,
    chunk-weight desc, external in-degree desc (root-class sources excluded),
    canonical identity asc, node_id asc — drives a global top-600 per class;
    the DuckDB twin reproduces every demoted row's rank exactly."""
    from sparkdoc.dedup import enforce_cardinality_bounds

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")

    def wd(i):
        return F.element_at(w, i)

    def node(nid, cls, attrs, chunks):
        return F.struct(
            F.lit(nid).alias("nid"), F.lit(cls).alias("cls"),
            attrs.alias("attrs"), chunks.alias("chunk_ids"),
        )

    nodes = docs.select(
        "doc_id",
        F.explode(
            F.array(
                node("X1", "X", F.create_map(F.lit("a"), wd(1), F.lit("b"), wd(2)), F.array(F.lit(0))),
                node("X2", "X", F.create_map(F.lit("a"), wd(2), F.lit("b"), F.lit("")), F.array(F.lit(0), F.lit(1))),
                node("X3", "X", F.create_map(F.lit("a"), wd(3)), F.array().cast("array<int>")),
                node("Y4", "Y", F.create_map(F.lit("a"), wd(4)), F.array(F.lit(0))),
            )
        ).alias("n"),
    ).select(
        F.concat(F.col("doc_id").cast("string"), F.lit("_"), F.col("n.nid")).alias("node_id"),
        F.col("n.cls").alias("node_class"),
        F.col("n.attrs").alias("attrs"),
        F.col("n.chunk_ids").alias("chunk_ids"),
    )
    d = F.col("doc_id").cast("string")
    edges = docs.select(
        F.explode(
            F.array(
                F.struct(F.concat(d, F.lit("_Y4")).alias("src"), F.concat(d, F.lit("_X3")).alias("dst")),
                F.struct(F.concat(d, F.lit("_X1")).alias("src"), F.concat(d, F.lit("_X2")).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    kept, demoted = enforce_cardinality_bounds(
        nodes, {"X": 600}, edges=edges, root_classes=("X",),
        id_fields_map={"X": ["a"], "Y": ["a"]},
    )
    return demoted.select("node_id", "node_class", F.col("_rank").cast("int").alias("rank"))


def _doc_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes pass + edge cleaning + stats (§2.7) over derived inputs with
    deliberately dirty edges: per doc a duplicate edge, a self-loop, and a
    dangling endpoint — clean_edges must drop all three, and graph_stats'
    (metric, key, value) rollup is then pure count arithmetic the DuckDB
    twin reproduces from the same derivation."""
    from sparkdoc.graph import clean_edges, entities_to_nodes, graph_stats

    docs = _docs(spark, sf_dir)
    d = F.col("doc_id").cast("string")

    def ent(nid, cls, where=None):
        frame = docs if where is None else docs.filter(where)
        return frame.select(
            F.concat(F.lit(nid + "_"), F.col("doc_id").cast("string")).alias("node_id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit("secs[]").alias("path"),
            F.lit(cls).alias("class"),
            F.create_map(F.lit("name"), F.concat(F.lit(nid), F.col("doc_id").cast("string"))).alias("ids"),
            F.create_map().cast("map<string,string>").alias("fields"),
            F.array().cast("array<int>").alias("chunk_ids"),
        )

    entities = (
        ent("S", "Section")
        .unionByName(ent("D", "Document"))
        .unionByName(ent("E", "Extra", where=F.col("doc_id") % 2 == 0))
    )
    nodes = entities_to_nodes(entities)
    edges = docs.select(
        F.explode(
            F.array(
                F.struct(F.concat(F.lit("S_"), d).alias("src"), F.concat(F.lit("D_"), d).alias("dst"), F.lit("in_document").alias("label")),
                F.struct(F.concat(F.lit("S_"), d).alias("src"), F.concat(F.lit("D_"), d).alias("dst"), F.lit("in_document").alias("label")),
                F.struct(F.concat(F.lit("D_"), d).alias("src"), F.concat(F.lit("D_"), d).alias("dst"), F.lit("self").alias("label")),
                F.struct(F.concat(F.lit("S_"), d).alias("src"), F.concat(F.lit("ghost_"), d).alias("dst"), F.lit("ref").alias("label")),
                F.struct(F.concat(F.lit("E_"), d).alias("src"), F.concat(F.lit("D_"), d).alias("dst"), F.lit("in_document").alias("label")),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.label")
    return graph_stats(nodes, clean_edges(nodes, edges))


def _doc_merge_ledgers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compact-view ledger merge (provenance.merge_ledgers): two synthetic
    per-doc ledgers with overlapping (chunk, span) anchors of different
    kinds — strength-max must pick verbatim over observed over derived,
    then sort (chunk_id, kind, span) and cap at 8; anchors exploded with
    their in-list index for the DuckDB twin."""
    from sparkdoc.provenance import merge_ledgers

    docs = _docs(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"))

    def anchor(c, k, s, e):
        return F.struct(
            F.lit(c).cast("int").alias("chunk_id"),
            F.lit(k).alias("kind"),
            F.array(F.lit(s), F.lit(e)).cast("array<int>").alias("span"),
        )

    base = docs.select(
        "doc_id",
        F.lit("K").alias("identity_key"),
        F.lit("p").alias("path"),
        F.create_map(F.lit("code"), F.lit("x")).alias("ids"),
    )
    l1 = base.withColumn("anchors", F.array(anchor(0, "observed", 0, 0), anchor(1, "verbatim", 2, 5)))
    l2 = base.withColumn(
        "anchors",
        F.array(anchor(0, "verbatim", 0, 0), anchor(1, "observed", 0, 0), anchor(2, "derived", 1, 3)),
    )
    merged = merge_ledgers([l1, l2])
    return merged.select(
        "doc_id", "identity_key", "path", F.posexplode("anchors").alias("idx", "a")
    ).select(
        "doc_id", "identity_key", "path",
        F.col("idx").cast("int").alias("idx"),
        "a.chunk_id", "a.kind",
        F.element_at("a.span", 1).alias("s"),
        F.element_at("a.span", 2).alias("e"),
    )


def _doc_dedup_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skeleton cross-batch dedup (dedup.dedup_entities) over three derived
    instances of the same node per doc: earliest-first-chunk emission wins
    ids/fields (min_by on the (first_chunk, ids) order struct), chunk sets
    union sorted-distinct. The DuckDB twin mirrors the min_by and the set
    union exactly."""
    from sparkdoc.dedup import dedup_entities

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")

    def inst(word_i, chunks):
        return F.struct(
            F.create_map(F.lit("name"), F.lit("nm")).alias("ids"),
            F.create_map(F.lit("v"), F.element_at(w, word_i)).alias("fields"),
            chunks.alias("chunk_ids"),
        )

    entities = docs.select(
        "doc_id",
        F.explode(
            F.array(
                inst(1, F.array(F.lit(3))),
                inst(2, F.array(F.lit(1), F.lit(3))),
                inst(3, F.array().cast("array<int>")),
            )
        ).alias("i"),
    ).select(
        "doc_id",
        F.lit("p[]").alias("path"),
        F.lit("C").alias("class"),
        F.concat(F.lit("N_"), F.col("doc_id").cast("string")).alias("node_id"),
        F.col("i.ids").alias("ids"),
        F.col("i.fields").alias("fields"),
        F.col("i.chunk_ids").alias("chunk_ids"),
    )
    out = dedup_entities(entities)
    return out.select(
        "doc_id", "path", F.col("class"), "node_id",
        F.element_at("ids", "name").alias("name_id"),
        F.element_at("fields", "v").alias("v_field"),
        F.array_join(F.col("chunk_ids"), ",").alias("chunks_str"),
    )


def _doc_doclang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocLang XML serialization + 512-grid quantization
    (serialize.doclang_documents / layout.quantize_bbox_512) over derived
    geo spans: every word of documents.text gets an md5-keyed bbox on a
    612x792 page, page breaks every 20 words. Quantization is
    clamp(bround(512*c/dim), 0, 511); with 612/792 dims the rational grid
    never lands on exact .5, so round-half-even == SQL round and the DuckDB
    twin must rebuild every dclg string byte-for-byte."""
    from sparkdoc.serialize import doclang_documents

    docs = _docs(spark, sf_dir)
    words = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("offset", "word")
    ).filter(F.length("word") > 0)

    def h(salt):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":" + salt + ":"),
                        F.col("offset").cast("string"),
                    )
                ),
                1, 4,
            ),
            16, 10,
        ).cast("int")

    kinds = F.array(*[F.lit(k) for k in ["text", "heading", "table", "picture", "caption"]])
    l = (h("l") % 400).cast("double")
    t = (h("t") % 600).cast("double")
    geo = words.select(
        "doc_id",
        F.col("offset").cast("int").alias("offset"),
        (F.lit(1) + F.floor(F.col("offset") / 20)).cast("int").alias("page_no"),
        F.element_at(kinds, (h("k") % 5) + 1).alias("kind"),
        F.col("word").alias("text"),
        F.when(
            F.element_at(kinds, (h("k") % 5) + 1) == "picture",
            F.concat(F.lit("m"), F.col("offset").cast("string")),
        ).otherwise(F.lit("")).alias("media_ref"),
        F.array(l, t, l + 50 + (h("r") % 100).cast("double"), t + 10 + (h("b") % 20).cast("double")).alias("bbox"),
        F.lit(612.0).alias("page_width"),
        F.lit(792.0).alias("page_height"),
    )
    return doclang_documents(geo)


def _doc_deep_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep model merge (merge.deep_merge_dicts, dict_merger.py semantics)
    as a DuckDB-checkable truth table: per doc, a base/extra model pair built
    from words 1-3 exercises the empty-incoming skip (empty never overwrites),
    path-scoped identity-hash entity-list merge (w2==w3 collapses the list),
    and sentence-dedup description merge. Runs vectorized in one pandas UDF;
    outcomes are deterministic so the oracle states them exactly."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from sparkdoc.merge import deep_merge_dicts

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")

    import json as _json

    @pandas_udf("string")
    def _dm(w1: pd.Series, w2: pd.Series, w3: pd.Series) -> pd.Series:
        out = []
        for a, b, c in zip(w1, w2, w3):
            base = {"name": a, "items": [{"id": b, "val": "x"}], "description": "A. B."}
            extra = {
                "name": "",
                "items": [{"id": b, "extra": "y"}, {"id": c, "val": "z"}],
                "description": "B. C.",
            }
            m = deep_merge_dicts(base, extra, identity_fields_map={"items": ["id"]})
            first = m["items"][0]
            out.append(
                _json.dumps(
                    {
                        "name_out": m.get("name"),
                        "n_items": len(m["items"]),
                        "w2_val": first.get("val"),
                        "w2_extra": first.get("extra"),
                        "desc_out": m.get("description"),
                    }
                )
            )
        return pd.Series(out)

    schema = "name_out string, n_items int, w2_val string, w2_extra string, desc_out string"
    return docs.select(
        "doc_id",
        F.from_json(
            _dm(
                F.coalesce(F.element_at(w, 1), F.lit("")),
                F.coalesce(F.element_at(w, 2), F.lit("")),
                F.coalesce(F.element_at(w, 3), F.lit("")),
            ),
            schema,
        ).alias("m"),
    ).select("doc_id", "m.*")


def _doc_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash node dedup (dedup.content_hash_dedup) — GLOBAL: every
    node whose attrs are {v: <word>} folds into the min-node_id survivor of
    that word ACROSS documents; redirected edges drop self-loops and dedupe
    on (src, dst, label). The DuckDB twin mirrors the grouping by attr
    equality (hash-free; identical JSON == same hash, collisions aside),
    the min-id survivor choice, and the redirect/cleanup — the ADVICE-fix
    semantics proven oracle-exactly."""
    from sparkdoc.dedup import content_hash_dedup

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    d = F.col("doc_id").cast("string")

    def node(nid, val):
        return F.struct(
            F.concat(d, F.lit("_" + nid)).alias("node_id"),
            F.create_map(F.lit("v"), val).alias("attrs"),
        )

    nodes = docs.select(
        "doc_id",
        F.explode(
            F.array(
                node("N1", F.element_at(w, 1)),
                node("N2", F.element_at(w, 2)),
                node("N3", F.element_at(w, 1)),
            )
        ).alias("n"),
    ).select(F.col("n.node_id").alias("node_id"), F.col("n.attrs").alias("attrs"), "doc_id")

    def edge(src, dst, label):
        return F.struct(
            F.concat(d, F.lit("_" + src)).alias("src"),
            F.concat(d, F.lit("_" + dst)).alias("dst"),
            F.lit(label).alias("label"),
        )

    edges = docs.select(
        "doc_id",
        F.explode(
            F.array(
                edge("N3", "N2", "a"),
                edge("N1", "N3", "a"),
                edge("N2", "N1", "r"),
                edge("N2", "N3", "r"),
            )
        ).alias("e"),
    ).select("doc_id", "e.src", "e.dst", "e.label")
    survivors, clean = content_hash_dedup(nodes.drop("doc_id"), edges.drop("doc_id"))
    out_nodes = survivors.select(
        F.lit("node").alias("kind"), F.col("node_id").alias("a"),
        F.lit(None).cast("string").alias("b"), F.lit(None).cast("string").alias("label"),
    )
    out_edges = clean.select(
        F.lit("edge").alias("kind"), F.col("src").alias("a"), F.col("dst").alias("b"), "label"
    )
    return out_nodes.unionByName(out_edges)


def _doc_bind_kinds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binder ladder (provenance.bind_provenance, binder.py:172-356 analog)
    over derived inputs: per doc a ledger entry {K1, p[], code=w1} and four
    nodes — A binds exact (identity key), B binds via the unique same-path
    canonical-containment fuzzy rung (ids drift w1→w1+'x'), C binds verbatim
    (its value w2 located in the 120-char chunk windows, distinctiveness ≤6),
    D stays unresolved. The DuckDB twin reproduces each node's bind kind
    through the same guard cascade."""
    from sparkdoc.provenance import bind_provenance

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    d = F.col("doc_id").cast("string")
    chunks = _windows_120(docs, doc_col=d)
    ledger = docs.select(
        d.alias("doc_id"),
        F.lit("K1").alias("identity_key"),
        F.lit("p[]").alias("path"),
        F.create_map(F.lit("code"), F.element_at(w, 1)).alias("ids"),
        F.array(
            F.struct(
                F.lit(0).cast("int").alias("chunk_id"),
                F.lit("observed").alias("kind"),
                F.array(F.lit(0), F.lit(0)).cast("array<int>").alias("span"),
            )
        ).alias("anchors"),
    )

    def node(nid, path, val):
        return F.struct(
            F.lit(nid).alias("node_id"),
            F.lit(path).alias("path"),
            F.create_map(F.lit("code"), val).alias("ids"),
        )

    nodes = docs.select(
        d.alias("doc_id"),
        F.explode(
            F.array(
                node("K1", "p[]", F.element_at(w, 1)),
                node("B", "p[]", F.concat(F.element_at(w, 1), F.lit("x"))),
                node("C", "q[]", F.element_at(w, 2)),
                node("D", "q[]", F.lit("zzqq")),
            )
        ).alias("n"),
    ).select("doc_id", "n.node_id", "n.path", "n.ids")
    bound, _stats = bind_provenance(nodes, ledger, chunks=chunks)
    return bound.select(
        "doc_id",
        "node_id",
        F.coalesce(F.get_json_object("provenance", "$.kind"), F.lit("unresolved")).alias(
            "kind_out"
        ),
    )


def _doc_name_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-name normalization (identity.normalize_entity_name,
    entity_name_normalizer.py:16-51 parity): per doc, name 1 = "w1's w2-w3"
    exercises possessive drop + [\\s_-] split + '_'.join.upper(); name 2 =
    "the w2" exercises leading-article strip and the bare-article empty
    result. The DuckDB twin states both outcomes exactly."""
    from sparkdoc.identity import normalize_entity_name_udf

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    udf = normalize_entity_name_udf()
    # guard: words 1-3 all non-empty on BOTH sides — element_at on a short
    # array NULL-propagates through concat while the oracle's split_part
    # returns '', so an unguarded <3-word doc diverges (sibling queries use
    # the same both-sides filter pattern)
    w3ok = (
        (F.length(F.coalesce(F.element_at(w, 1), F.lit(""))) > 0)
        & (F.length(F.coalesce(F.element_at(w, 2), F.lit(""))) > 0)
        & (F.length(F.coalesce(F.element_at(w, 3), F.lit(""))) > 0)
    )
    n1 = F.concat(F.element_at(w, 1), F.lit("'s "), F.element_at(w, 2), F.lit("-"), F.element_at(w, 3))
    n2 = F.concat(F.lit("the "), F.element_at(w, 2))
    return docs.filter(w3ok).select(
        "doc_id",
        udf(n1).alias("norm_possessive"),
        udf(n2).alias("norm_article"),
    )


def _doc_graph_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phantom-node removal + keyword cap (graph.remove_phantom_nodes /
    cap_keywords): per doc, P2 carries only meta/empty attrs (phantom —
    dropped, its edge audited), P3 carries a 7-entry keywords list (capped
    to 5). The DuckDB twin states kept nodes, surviving edges, the audit
    rows, and the capped keyword string exactly."""
    from sparkdoc.graph import cap_keywords, remove_phantom_nodes

    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")
    d = F.col("doc_id").cast("string")
    kw7 = F.concat_ws("|", *[F.element_at(w, i) for i in range(1, 8)])

    def node(nid, attrs):
        return F.struct(F.concat(d, F.lit("_" + nid)).alias("node_id"), attrs.alias("attrs"))

    nodes = docs.select(
        "doc_id",
        F.explode(
            F.array(
                node("P1", F.create_map(F.lit("a"), F.element_at(w, 1), F.lit("__meta"), F.lit("x"))),
                node("P2", F.create_map(F.lit("a"), F.lit(""), F.lit("__m"), F.lit("z"))),
                node("P3", F.create_map(F.lit("keywords"), kw7)),
            )
        ).alias("n"),
    ).select("doc_id", "n.node_id", "n.attrs")

    def edge(src, dst, label):
        return F.struct(
            F.concat(d, F.lit("_" + src)).alias("src"),
            F.concat(d, F.lit("_" + dst)).alias("dst"),
            F.lit(label).alias("label"),
        )

    edges = docs.select(
        F.explode(F.array(edge("P1", "P2", "r"), edge("P1", "P3", "s"))).alias("e")
    ).select("e.src", "e.dst", "e.label")
    kept, e, audit = remove_phantom_nodes(nodes, edges)
    kept = cap_keywords(kept)
    out_nodes = kept.select(
        "doc_id", F.lit("node").alias("kind"), F.col("node_id").alias("a"),
        F.lit(None).cast("string").alias("b"), F.lit(None).cast("string").alias("label"),
        F.element_at("attrs", "keywords").alias("kw"),
    )

    def edge_rows(df, kind):
        return df.select(
            F.split(F.col("src"), "_").getItem(0).cast("long").alias("doc_id"),
            F.lit(kind).alias("kind"), F.col("src").alias("a"), F.col("dst").alias("b"),
            "label", F.lit(None).cast("string").alias("kw"),
        )

    return out_nodes.unionByName(edge_rows(e, "edge")).unionByName(edge_rows(audit, "audit"))


def _doc_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covered-chunk accounting (provenance.coverage_stats): 120-char chunk
    windows vs a derived ledger anchoring chunks 0 and 1 (with a duplicate
    anchor on chunk 0 that must NOT double-count). For single-chunk docs the
    chunk-1 anchor is a PHANTOM (no such chunk) and must not count — the
    operator intersects anchors with the real chunk set, so n_covered =
    least(2, n_chunks) and coverage never exceeds 1.0; the DuckDB twin
    restates that arithmetic."""
    from sparkdoc.provenance import coverage_stats

    docs = _docs(spark, sf_dir)
    chunks = _windows_120(docs)

    def anchor(c, k, s, e):
        return F.struct(
            F.lit(c).cast("int").alias("chunk_id"),
            F.lit(k).alias("kind"),
            F.array(F.lit(s), F.lit(e)).cast("array<int>").alias("span"),
        )

    ledger = docs.select(
        "doc_id",
        F.lit("K1").alias("identity_key"),
        F.lit("p[]").alias("path"),
        F.create_map(F.lit("code"), F.lit("x")).alias("ids"),
        F.array(
            anchor(0, "observed", 0, 0), anchor(0, "verbatim", 3, 9), anchor(1, "observed", 0, 0)
        ).alias("anchors"),
    )
    return coverage_stats(chunks, ledger)


#: coverage-threshold probes: (doc_id, chunk_id, n_words) with chunk text =
#: n_words x "the" (single WordPiece piece — counts are exact); chunks 0/1
#: covered, chunk 2 uncovered. Doc A sits at EXACTLY the 10% share boundary
#: (10/100 -> triggers, the rule is >=), doc B one token below (10/101 ->
#: no trigger), doc C far above (50/100).
_COVERAGE_PROBES = [
    ("A", 0, 45), ("A", 1, 45), ("A", 2, 10),
    ("B", 0, 46), ("B", 1, 45), ("B", 2, 10),
    ("C", 0, 20), ("C", 1, 30), ("C", 2, 50),
]


def _doc_coverage_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-true coverage trigger (extractor.coverage_candidates): the
    >= 10%-token-share rule of the coverage pass, measured in REAL
    tokenizer tokens (the chunker's count), exercised exactly AT the
    boundary — doc A's uncovered chunk holds exactly 10% of its WordPiece
    tokens and must trigger; doc B is one token below and must not. The
    oracle twin recomputes every chunk's count with the independent
    maximal-munch tokenizer (_tokenize_twin) and replays the share
    arithmetic, so the tokenizer swap's downstream threshold semantics are
    driver-gated (reference: orchestrator.py:74-90)."""
    from sparkdoc.extractor import coverage_candidates
    from sparkdoc.textops import tokenize_ids

    rows = [
        (d, c, " ".join(["the"] * n)) for d, c, n in _COVERAGE_PROBES
    ]
    chunks = tokenize_ids(
        spark.createDataFrame(rows, "doc_id string, chunk_id int, text string")
    ).select("doc_id", "chunk_id", F.col("n_tokens").alias("token_count"))
    skeleton = spark.createDataFrame(
        [(d, [0, 1]) for d in ("A", "B", "C")], "doc_id string, chunk_ids array<int>"
    )
    return (
        coverage_candidates(chunks, skeleton)
        .select(
            "doc_id",
            F.col("uncovered_tokens").cast("bigint").alias("uncovered_tokens"),
            F.col("doc_tokens").cast("bigint").alias("doc_tokens"),
            "triggered",
        )
        .orderBy("doc_id")
    )


def _extract_spans_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE north-rule invariant, oracle-checked by the driver gate: the Spark
    extraction pipeline's span sequences (kind, text, media_ref, order) over
    a 24-doc seeded corpus, text md5-compressed — the oracle is a VALUES
    table generated at oracle_sql() build time by the INDEPENDENT pure-Python
    golden extractor (sparkdoc/golden.py), so span-sequence equality is
    recorded in CORRECTNESS_r{N}.json itself, not only in pytest."""
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import raw_nodes_df

    spans = explode_spans(extract_documents(raw_nodes_df(spark, 24, SYNTH_SEED, partitions=8)))
    return spans.select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _doclang_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DocLang ingest closes the loop: serialize the seeded corpus to DocLang
    (doclang_documents) and parse it BACK to span rows (parse_doclang) — the
    result must equal the INDEPENDENT golden extractor's span sequences
    (same VALUES oracle as extract_spans_pinned), proving a corpus delivered
    as DocLang files round-trips into the engine's spans table exactly."""
    from sparkdoc.serialize import doclang_documents, parse_doclang
    from sparkdoc.spans import extract_span_rows_geo
    from sparkdoc.synth import raw_nodes_df

    geo = extract_span_rows_geo(raw_nodes_df(spark, 24, SYNTH_SEED, partitions=8))
    spans = parse_doclang(doclang_documents(geo))
    return spans.select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _chunks_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunker drift pin in the driver gate: chunk_documents over the seeded
    corpus vs the checked-in golden_chunks fixture (tests/fixtures/), text
    md5-compressed, all metadata columns. Regenerate the fixture deliberately
    if the chunking spec changes."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    ch = chunk_documents(extract_documents(raw_nodes_df(spark, 32, SYNTH_SEED, partitions=8)))
    return ch.select(
        "doc_id",
        "chunk_id",
        "batch_index",
        F.md5(F.col("text")).alias("text_md5"),
        "token_count",
        F.array_join(F.transform("page_numbers", lambda x: x.cast("string")), ",").alias("pages"),
        F.md5(F.concat_ws("\x1f", "headings")).alias("headings_md5"),
        "text_hash",
        "char_length",
        F.coalesce(F.col("resplit_of"), F.lit(-1)).alias("resplit_of"),
    )


def _graph_pin_encode(out: dict) -> DataFrame:
    """Shared node/edge → (kind, a, b, c, d, payload_md5) encoding for the
    graph-pipeline pins (attrs canonicalized as sorted k=v '|'-join, md5) —
    mirrors _graph_values_from_fixture in oracle_sql(); one implementation so
    graph_pinned and template_graph_pinned can never drift apart."""
    attrs_md5 = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("attrs")),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            "|",
        )
    )
    nodes = out["nodes"].select(
        F.lit("node").alias("kind"),
        F.col("node_id").alias("a"),
        F.col("doc_id").alias("b"),
        F.col("node_class").alias("c"),
        F.col("label").alias("d"),
        attrs_md5.alias("payload_md5"),
    )
    edges = out["edges"].select(
        F.lit("edge").alias("kind"),
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        F.col("label").alias("c"),
        F.lit("").alias("d"),
        F.lit("").alias("payload_md5"),
    )
    return nodes.unionByName(edges)


def _graph_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole extraction-graph pipeline pin in the driver gate: nodes+edges of
    convert_document_graph over the seeded corpus vs the committed
    golden_graph fixture (attrs canonicalized as sorted k=v join, md5)."""
    from sparkdoc.extractor import convert_document_graph
    from sparkdoc.synth import raw_nodes_df

    out = convert_document_graph(raw_nodes_df(spark, 32, SYNTH_SEED, partitions=4))
    return _graph_pin_encode(out)


def _template_graph_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pydantic-template-compiler acceptance pin: compile the invoice-style
    Pydantic template (tests/fixtures/invoice_template.py — the reference's
    template-authoring conventions: graph_id_fields / is_entity metadata,
    json_schema_extra edge_label / graph_reference / reference_closed_catalog)
    via sparkdoc.template.compile_template and run the FULL
    convert_document_graph pipeline over the deterministic invoice corpus;
    nodes+edges vs the committed golden_invoice fixture."""
    import os as _os
    import sys as _sys

    _fx_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "tests", "fixtures")
    if _fx_dir not in _sys.path:
        _sys.path.insert(0, _fx_dir)
    from invoice_template import INVOICE_RULES, InvoiceDoc

    from sparkdoc.extractor import convert_document_graph
    from sparkdoc.synth import invoice_nodes_df
    from sparkdoc.template import compile_template

    template = compile_template(InvoiceDoc, rules=INVOICE_RULES)
    out = convert_document_graph(invoice_nodes_df(spark, 12, SYNTH_SEED, partitions=2), template=template)
    return _graph_pin_encode(out)


def _ledger_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end provenance ledger pin in the driver gate: extract → chunk
    → heading entities → anchor scan → build_ledger over the seeded corpus
    vs the committed golden_ledger fixture (ids/anchors canonicalized, md5)."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.dedup import with_node_ids
    from sparkdoc.provenance import build_ledger
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import raw_nodes_df

    docs = extract_documents(raw_nodes_df(spark, 32, SYNTH_SEED, partitions=4))
    chunks = chunk_documents(docs)
    spans = explode_spans(docs)
    entities = spans.filter(F.col("kind") == "heading").select(
        "doc_id",
        F.lit("sections[]").alias("path"),
        F.lit("Section").alias("class"),
        F.create_map(F.lit("name"), F.regexp_replace(F.col("text"), "^#+\\s*", "")).alias("ids"),
        F.create_map().cast("map<string,string>").alias("fields"),
        F.array().cast("array<int>").alias("chunk_ids"),
    )
    led = build_ledger(with_node_ids(entities), chunks)
    ids_md5 = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("ids")),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            ),
            "|",
        )
    )
    anchors_enc = F.md5(
        F.array_join(
            F.transform(
                F.col("anchors"),
                lambda a: F.concat(
                    a["chunk_id"].cast("string"), F.lit(":"), a["kind"], F.lit(":"),
                    F.element_at(a["span"], 1).cast("string"), F.lit("-"),
                    F.element_at(a["span"], 2).cast("string"),
                ),
            ),
            "|",
        )
    )
    return led.select(
        "doc_id", "identity_key", "path",
        ids_md5.alias("ids_md5"), anchors_enc.alias("anchors_md5"),
    )


def _map_enc(col: str):
    """Canonical map encoding shared with the fixture generators: sorted
    'k=v' entries '|'-joined."""
    return F.array_join(
        F.transform(
            F.array_sort(F.map_entries(col)), lambda e: F.concat(e["key"], F.lit("="), e["value"])
        ),
        "|",
    )


def _fill_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense FILL phase pin in the driver gate: skeleton+coverage+fill over
    the seeded corpus vs the committed golden_fill fixture (canonical k=v
    encodings)."""
    from sparkdoc.chunker import chunk_documents
    from sparkdoc.extractor import coverage_pass, demo_catalog, skeleton_phase
    from sparkdoc.fill import fill_phase
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    cat = demo_catalog()
    chunks = chunk_documents(
        extract_documents(raw_nodes_df(spark, 64, SYNTH_SEED, partitions=8))
    ).localCheckpoint()
    filled = fill_phase(chunks, coverage_pass(chunks, skeleton_phase(chunks, cat), cat), cat)
    return filled.select(
        "doc_id", "path", F.col("class"), F.coalesce("node_id", F.lit("")).alias("node_id"),
        F.coalesce("fill_batch", F.lit(0)).cast("int").alias("fill_batch"),
        _map_enc("ids").alias("ids_enc"), _map_enc("fields").alias("fields_enc"),
        F.array_join(F.transform("chunk_ids", lambda x: x.cast("string")), ",").alias("chunks_enc"),
    )


def _one_to_one_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-one (per-page) strategy pin vs the committed fixture."""
    from sparkdoc.extractor import one_to_one_extract
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import raw_nodes_df

    spans = explode_spans(extract_documents(raw_nodes_df(spark, 64, SYNTH_SEED, partitions=8)))
    out = one_to_one_extract(spans)
    return out.select(
        "doc_id", "path", F.col("class"), F.coalesce("node_id", F.lit("")).alias("node_id"),
        F.coalesce("fill_batch", F.lit(0)).cast("int").alias("fill_batch"),
        F.coalesce("page_no", F.lit(0)).cast("int").alias("page_no"),
        _map_enc("ids").alias("ids_enc"), _map_enc("fields").alias("fields_enc"),
        F.array_join(F.transform("chunk_ids", lambda x: x.cast("string")), ",").alias("chunks_enc"),
    )


def _emb_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded hyperplane-LSH self-join +
    exact cosine verify ≥ 0.4 (similarity.embedding_near_dups). Oracle-exact:
    the md5-keyed band buckets and the dot folds are rebuilt in SQL."""
    from sparkdoc.similarity import embedding_near_dups

    return embedding_near_dups(_emb(spark, sf_dir), threshold=0.4, n_bits=4, bands=4)


def _doc_rolling_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints. Oracle-exact: the polynomial
    window hash (base 257 mod 2^61-1) is position-local under the Rabin-Karp
    identity, so the DuckDB twin hashes each 16-byte window directly and must
    reproduce the sampled set — min/max pin the actual hash values, not just
    the count. (Corpus is ASCII, so SQL code points == utf-8 bytes.)"""
    from sparkdoc.textops import rolling_fingerprints

    return rolling_fingerprints(_docs(spark, sf_dir)).select(
        "doc_id",
        F.size("fingerprints").alias("n_fp"),
        F.try_element_at("fingerprints", F.lit(1)).alias("fp_min"),
        F.when(
            F.size("fingerprints") > 0,
            F.element_at("fingerprints", F.size("fingerprints")),
        ).alias("fp_max"),
    )


def _doc_chunk_owner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chunk_owner_map semantics over engine-reproducible derived inputs:
    chunks = fixed 120-char windows of documents.text, parents = words
    1/5/9 of each doc. The head/body/carry ladder (unique-head → unique-body
    → forward-carry ≤12) is pure windowed SQL, so the DuckDB twin must
    reproduce owner assignment exactly (oracle-exact twin of the rows-only
    synth-corpus `chunk_owner` entry)."""
    from sparkdoc.serialize import chunk_owner_map

    docs = _docs(spark, sf_dir)
    chunks = _windows_120(docs)
    w = F.split(F.col("text"), " ")
    parents = (
        docs.select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(F.lit("P1").alias("node_id"), F.element_at(w, 1).alias("label")),
                    F.struct(F.lit("P5").alias("node_id"), F.element_at(w, 5).alias("label")),
                    F.struct(F.lit("P9").alias("node_id"), F.element_at(w, 9).alias("label")),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.node_id").alias("node_id"), F.col("p.label").alias("label"))
        .filter(F.length("label") > 0)
    )
    return chunk_owner_map(chunks, parents, head_chars=40)


def _doc_page_markdowns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """page_markdowns serializer semantics over engine-reproducible derived
    spans: each word of documents.text becomes a span whose kind is keyed by
    md5(doc_id:offset) % 10 (page_breaks included), pictures get a synthetic
    media_ref. The window page-numbering, furniture exclusion, per-kind
    markdown rendering, and offset-ordered join are pure SQL — the DuckDB
    twin must rebuild every page string byte-for-byte (oracle-exact twin of
    the rows-only synth-corpus `page_markdowns` entry)."""
    from sparkdoc.serialize import page_markdowns

    docs = _docs(spark, sf_dir)
    kinds = F.array(
        *[
            F.lit(k)
            for k in [
                "text", "text", "text", "heading", "list",
                "table", "caption", "picture", "page_break", "furniture",
            ]
        ]
    )
    spans = (
        docs.select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("offset", "word"))
        .filter(F.length("word") > 0)
        .withColumn(
            "_k",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("offset").cast("string"))),
                    1, 2,
                ),
                16, 10,
            ).cast("int") % 10,
        )
        .select(
            "doc_id",
            F.element_at(kinds, F.col("_k") + 1).alias("kind"),
            F.col("word").alias("text"),
            F.when(
                F.element_at(kinds, F.col("_k") + 1) == "picture",
                F.concat(F.lit("m"), F.col("offset").cast("string")),
            ).alias("media_ref"),
            F.col("offset").cast("int").alias("offset"),
        )
    )
    return page_markdowns(spans)


def _doc_root_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Root-identity repair (root_identity.py:67-110): echo-clear + stem
    fallback over a deterministic truth table — doc_id%3 selects (class-name
    echo | empty | real code), so the oracle asserts the repaired identity
    exactly."""
    from sparkdoc.catalog import build_node_catalog
    from sparkdoc.rootid import repair_root_identity

    tmpl = {"class": "Report", "id_fields": ["reference_code"], "fields": {}, "children": {}}
    docs = _docs(spark, sf_dir)
    roots = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("").alias("path"),
        F.lit("Report").alias("class"),
        F.create_map(
            F.lit("reference_code"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("Report"))
            .when(F.col("doc_id") % 3 == 1, F.lit(""))
            .otherwise(F.concat(F.lit("CODE-"), F.col("doc_id").cast("string"))),
        ).alias("ids"),
    )
    out = repair_root_identity(roots, build_node_catalog(tmpl))
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.element_at("ids", "reference_code").alias("ref_out"),
    )


def _events_batch_handles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch handle resolution (dense/orchestrator.py:285-360): events
    become emission rows (batches of 10 per user; handle = position+1;
    parent_handle = -1 at batch heads, a local back-reference elsewhere,
    null every third) — both the local rung and the negative already-found
    window are exercised, and the whole ladder is SQL-expressible."""
    from pyspark.sql import Window

    from sparkdoc.resolve import resolve_batch_handles

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w) - 1
    pos = rn % 10
    em = ev.select(
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_id").alias("_eid"),
        F.floor(rn / 10).cast("int").alias("batch_index"),
        pos.cast("int").alias("emission"),
        (pos + 1).cast("int").alias("handle"),
        F.when(pos == 0, F.lit(-1))
        .when(pos % 3 == 0, F.lit(None))
        .otherwise(pos)
        .cast("int")
        .alias("parent_handle"),
        F.col("event_type").alias("path"),
        F.create_map(F.lit("eid"), F.col("event_id").cast("string")).alias("ids"),
    )
    out = resolve_batch_handles(em)
    return out.select(
        F.col("doc_id").cast("long").alias("user_id"),
        F.col("_eid").alias("event_id"),
        F.col("parent_source"),
        F.element_at("parent_ids", "eid").alias("parent_eid"),
        F.col("parent_path"),
    )


# --------------------------------------------------------------------------
# corpus filters (sparkdoc/filters.py): Gopher repetition, PII, decontam
# --------------------------------------------------------------------------


def _docs_lined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-structured derived corpus: the synthetic documents carry no
    newlines, so the repetition gate derives a 3-line text per doc (every
    doc_id % 3 == 0 repeats its first line → real duplicate lines); the
    oracle builds the IDENTICAL corpus in SQL (lines_c CTE)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    seg = lambda a: F.substring("text", a, 60)  # noqa: E731
    third = F.when(F.col("doc_id") % 3 == 0, seg(1)).otherwise(seg(121))
    return d.select(
        "doc_id", F.concat_ws("\n", seg(1), seg(61), third).alias("text")
    )


def _doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.filters import with_repetition_stats

    return with_repetition_stats(_docs_lined(spark, sf_dir)).select(
        "doc_id",
        "n_lines",
        "n_dup_lines",
        "dup_line_chars",
        "total_line_chars",
        "top_bigram",
        "top_bigram_cnt",
        "top_bigram_chars",
        "dup_trigram_chars",
        "total_trigram_chars",
        "total_word_chars",
    )


def _docs_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-injected derived corpus (the synthetic text contains none):
    deterministic email/phone/IP/SSN snippets keyed off doc_id, mirrored
    exactly by the oracle's pii_c CTE. doc_id % 12 == 0 docs carry several
    kinds at once."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    s = lambda c: c.cast("string")  # noqa: E731
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" mail user"), s(did), F.lit("@ex-"), s(did % 7), F.lit(".org now")
    )
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad(s(did % 1000), 3, "0"),
        F.lit("-"),
        F.lpad(s(did % 10000), 4, "0"),
        F.lit(" x"),
    )
    ip = F.concat(
        F.lit(" host 10."), s(did % 256), F.lit(".0."), s((did * 3) % 256), F.lit(" up")
    )
    ssn = F.concat(
        F.lit(" ssn 078-05-"), F.lpad(s(did % 10000), 4, "0"), F.lit(" leak")
    )
    blank = F.lit("")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, email).otherwise(blank),
            F.when(did % 4 == 0, phone).otherwise(blank),
            F.when(did % 5 == 0, ip).otherwise(blank),
            F.when(did % 6 == 0, ssn).otherwise(blank),
        ).alias("text"),
    )


def _doc_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.filters import with_pii_stats

    return with_pii_stats(_docs_pii(spark, sf_dir)).select(
        "doc_id", "n_email", "n_ipv4", "n_ssn", "n_phone", "redacted"
    )


def _doc_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the hostile corpus: the benchmark set
    is the original docs with doc_id % 21 == 0 — each has an exact
    duplicate twin at +1_000_000 (21 = 3·7 ⊆ the %7 twin regime), so the
    graded corpus (hostile minus the benchmark docs themselves) contains
    guaranteed fully-contaminated members plus partial overlaps from the
    markup twins."""
    from sparkdoc.filters import decontaminate

    docs = _docs_hostile(spark, sf_dir).filter(
        ~((F.col("doc_id") < 1000000) & (F.col("doc_id") % 21 == 0))
    )
    bench = _docs(spark, sf_dir).filter(F.col("doc_id") % 21 == 0).select("doc_id", "text")
    return decontaminate(docs, bench, n=8)


def _emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sparkdoc.similarity import semantic_dedup

    return semantic_dedup(_emb(spark, sf_dir), threshold=0.4, n_cells=16, dim=64)


def _doc_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup clustering: exact-dup fingerprint groups
    are chained into PATH graphs (consecutive doc_ids within each group), so
    the iterative min-label/pointer-jump operator must propagate labels over
    multi-hop chains (the shared-language twin groups are ~n/11 docs long) —
    not just pairs. The oracle recomputes components independently via a
    recursive transitive-closure CTE over the same edges."""
    from pyspark.sql import Window

    from sparkdoc.dedup_text import dup_group_labels
    from sparkdoc.textops import doc_fingerprint

    d = _docs_hostile(spark, sf_dir).withColumn("fp", doc_fingerprint(F.col("text")))
    w = Window.partitionBy("fp").orderBy("doc_id")
    pairs = (
        d.select("fp", "doc_id", F.lead("doc_id").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("doc_id").alias("a"), F.col("nxt").alias("b"))
    )
    return dup_group_labels(pairs).orderBy("doc_id")


def _doc_leak_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval split: duplicate clusters (the doc_dup_groups
    chain graphs over the hostile corpus) move to one side as a unit — the
    split key is the cluster representative, singletons key on themselves.
    The oracle recomputes components via the recursive transitive-closure
    CTE, then replays the identical md5 ppm rule on the representative."""
    from pyspark.sql import Window

    from sparkdoc.dedup_text import dup_group_labels
    from sparkdoc.filters import leakage_safe_split
    from sparkdoc.textops import doc_fingerprint

    d = _docs_hostile(spark, sf_dir).withColumn("fp", doc_fingerprint(F.col("text")))
    w = Window.partitionBy("fp").orderBy("doc_id")
    pairs = (
        d.select("fp", "doc_id", F.lead("doc_id").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("doc_id").alias("a"), F.col("nxt").alias("b"))
    )
    groups = dup_group_labels(pairs)
    return leakage_safe_split(d.select("doc_id"), groups, 0.3, salt="gate").orderBy(
        "doc_id"
    )


def _doc_temp_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (alpha=0.5) mixture rebalancing over skewed strata:
    A≈60% / B≈30% / C≈10% of docs plus a singleton stratum D (doc_id=0)
    whose keep fraction saturates the 1e6 ppm cap — both threshold branches
    are exercised at every sf. The oracle replays the exact integer/IEEE
    pipeline: s=floor(1e6·sqrt(n)), Z=Σs (BIGINT), ppm=floor(((t·s)/Z/n)·1e6)."""
    from sparkdoc.filters import temperature_sample

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") == 0, F.lit("D"))
        .when(F.col("doc_id") % 10 < 6, F.lit("A"))
        .when(F.col("doc_id") % 10 < 9, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("stratum"),
    )
    return temperature_sample(
        d, "stratum", target_total=300, alpha=0.5, salt="temp"
    ).orderBy("doc_id")


# authored tokenizer probes (sf-independent, like url_admission's truth
# table): casing, punctuation splits, digits, subword compositions, an
# out-of-vocab character ([UNK]), empty and NULL text
_TOKENIZE_PROBES: list[tuple[int, str | None]] = [
    (1, "The quick brown fox jumps over the lazy dog."),
    (2, "Hello, world! HELLO WORLD hello world"),
    (3, "unbelievable preprocessing tokenization internationalization"),
    (4, "order #4521 shipped 2026-08-20 at 14:30 (cost: $1,234.56)"),
    (5, "naïve café résumé 日本語"),  # accented latin is trained; CJK → [UNK]
    (6, "a b c d e f g h i j k"),
    (7, "!!!???...;;;:::"),
    (8, "supercalifragilisticexpialidocious antidisestablishmentarianism"),
    (9, ""),
    (10, None),
    (11, "mixed12case34words56 CamelCaseRuns snake_case_names kebab-case-too"),
]


def _tokenize_twin(text: str | None) -> list[int]:
    """INDEPENDENT WordPiece twin for the doc_token_ids oracle: maximal munch
    via per-(continuation, first-char) piece lists sorted longest-first and
    str.startswith — no shared code with sparkdoc.wordpiece's
    decreasing-window scan (same greedy longest-match-first SPEC, separately
    implemented, so a kernel bug cannot hide in its own oracle)."""
    import gzip
    import os
    import re

    import sparkdoc.wordpiece as wp

    with gzip.open(
        os.path.join(os.path.dirname(os.path.abspath(wp.__file__)), "data", wp.DEFAULT_VOCAB),
        "rt",
        encoding="utf-8",
    ) as f:
        ordered = f.read().splitlines()
    ids = {p: i for i, p in enumerate(ordered)}
    by_head: dict[tuple[bool, str], list[str]] = {}
    for p in ordered:
        cont = p.startswith("##")
        body = p[2:] if cont else p
        if not body:
            continue
        by_head.setdefault((cont, body[0]), []).append(body)
    for lst in by_head.values():
        lst.sort(key=len, reverse=True)

    out: list[int] = []
    for word in re.findall(r"\w+|[^\w\s]", (text or "").lower(), re.UNICODE):
        word_ids: list[int] = []
        i = 0
        while i < len(word):
            cont = i > 0
            match = None
            for body in by_head.get((cont, word[i]), ()):
                if word.startswith(body, i):
                    match = body
                    break
            if match is None:
                word_ids = [-1]
                break
            word_ids.append(ids[("##" + match) if cont else match])
            i += len(match)
        out.extend(word_ids)
    return out


def _doc_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-id emission (the training-shard path): the kernel tokenizes the
    authored probes; the oracle is a VALUES table computed by the
    independent maximal-munch twin over the same committed vocab. The id
    array is emitted JSON-encoded (``to_json``) because the driver's pandas
    canonicalizer cannot sort/hash a raw list column (r3 driver err:
    ``unhashable type: 'list'``); the JSON string pins the same bytes."""
    from sparkdoc.textops import tokenize_ids

    df = spark.createDataFrame(_TOKENIZE_PROBES, "probe_id int, text string")
    return (
        tokenize_ids(df)
        .select(
            "probe_id",
            F.to_json(F.col("token_ids")).alias("token_ids_json"),
            "n_tokens",
        )
        .orderBy("probe_id")
    )


def _doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified hash sampling: strata = doc_id % 3 with
    per-stratum keep fractions (1.0 / 0.5 / 0.1); membership is a pure
    function of md5(doc_id || salt), so the oracle reproduces the exact
    kept set."""
    from sparkdoc.filters import stratified_hash_sample

    d = _docs(spark, sf_dir).select(
        "doc_id", (F.col("doc_id") % 3).cast("int").alias("stratum")
    )
    return stratified_hash_sample(
        d, "stratum", {0: 1.0, 1: 0.5, 2: 0.1}, default=0.0, salt="gate"
    ).orderBy("doc_id")


_BOILER_NAV = "Subscribe to our newsletter for updates and exclusive offers."
_BOILER_FOOT = "Copyright 2026 Example Corp. All rights reserved worldwide."


def _docs_paras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-structured derived corpus: 3 paragraphs per doc (80-char
    slices), with boilerplate paragraphs injected cross-doc (doc_id % 4 → a
    shared nav paragraph, doc_id % 6 → a shared footer) so paragraph-level
    dedup has real corpus-wide duplicates to remove. The oracle builds the
    IDENTICAL corpus in SQL (paras_src CTE)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    p1 = F.substring("text", 1, 80)
    p2 = F.when(F.col("doc_id") % 4 == 0, F.lit(_BOILER_NAV)).otherwise(
        F.substring("text", 81, 80)
    )
    p3 = F.when(F.col("doc_id") % 6 == 0, F.lit(_BOILER_FOOT)).otherwise(
        F.substring("text", 161, 80)
    )
    return d.select("doc_id", F.concat_ws("\n\n", p1, p2, p3).alias("text"))


def _doc_para_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup: first occurrence (min doc_id, para_idx)
    of each normalized paragraph survives; docs are reassembled from their
    surviving paragraphs. The oracle recomputes the winner set with a
    row_number window (vs the engine's skew-safe min-struct agg + join)."""
    from sparkdoc.dedup_text import paragraph_dedup

    return paragraph_dedup(_docs_paras(spark, sf_dir)).orderBy("doc_id")


_SHARED_A = (
    "terms of service apply to all content on this site and use constitutes "
    "acceptance of the binding agreement herein"
)
_SHARED_B = "breaking news update this story is developing and will be refreshed"


def _docs_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived corpus with duplicated passages for exact substring dedup:
    doc_id % 3 appends a shared 19-word licence passage, doc_id % 7 prepends
    a shared 12-word news stub, doc_id % 11 re-appends its own first 60
    chars (an IN-document repeat). The oracle builds the identical corpus
    in SQL (concat_ws skips the NULL branches in both engines)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.when(F.col("doc_id") % 7 == 0, F.lit(_SHARED_B)),
            F.col("text"),
            F.when(F.col("doc_id") % 11 == 0, F.substring("text", 1, 60)),
            F.when(F.col("doc_id") % 3 == 0, F.lit(_SHARED_A)),
        ).alias("text"),
    )


def _doc_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, discovery pass: merged word-index intervals of
    duplicated 12-word windows (keep-first). The oracle recomputes winners
    with a row_number window and the interval merge with the classic
    islands cumulative-max window — vs the engine's skew-safe min-struct
    agg + equi-join."""
    from sparkdoc.dedup_text import substring_dup_spans

    return substring_dup_spans(_docs_substr(spark, sf_dir), k=12).orderBy(
        "doc_id", "span_start"
    )


def _doc_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, apply pass: duplicated-interval words removed,
    survivors reassembled in order, with per-doc dup mass accounting."""
    from sparkdoc.dedup_text import substring_dedup

    return substring_dedup(_docs_substr(spark, sf_dir), k=12).orderBy("doc_id")


def _doc_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized linear-classifier inference (hashed bag-of-words, integer
    milli-weights): margin_e6 = bias + sum(cnt * w[bucket(word)]) as an
    exact BIGINT — order-independent, so the DuckDB twin matches bit-for-bit.
    Weights here are a deterministic pseudo-model ((bucket*2654435761) %
    2001 - 1000) so both engines can derive them; TRAINED weights are pinned
    by the numpy-twin unit suite (tests/test_classifier.py)."""
    from sparkdoc.classifier import score_quantized

    wdf = spark.range(512).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 2001 - 1000).cast("bigint").alias("w"),
    )
    return score_quantized(
        _docs(spark, sf_dir), None, 37, weights_df=wdf, n_buckets=512, salt="clf"
    ).orderBy("doc_id")


def _docs_skewed_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with 80% of rows collapsed onto one hub domain — the skew
    shape per-domain caps and rebalancing exist for."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 5 != 0, F.lit("hub.example"))
        .otherwise(F.col("source"))
        .alias("source"),
    )


def _doc_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-domain cap: keep the 10 smallest-hash docs per
    source (two-phase skew-bounded top-k; the oracle is a single
    row_number window over the same md5 bucket ordering)."""
    from sparkdoc.filters import cap_per_group

    return cap_per_group(
        _docs_skewed_source(spark, sf_dir), "source", 10, salt="cap"
    ).orderBy("doc_id")


def _doc_domain_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-proportional domain downweighting: groups over 15 docs are
    hash-sampled to ≈15 in expectation (keep ppm = floor(15e6/n)); small
    groups pass whole (the least(1e6, ...) branch is exercised by the
    doc_id % 5 sources, 5 docs each)."""
    from sparkdoc.filters import downweight_frequent_groups

    return (
        downweight_frequent_groups(
            _docs_skewed_source(spark, sf_dir), "source", target=15, salt="rb"
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _doc_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (sparkdoc/retrieval.py): every 100th document's first
    8 words become a probe query; top-5 corpus docs per query by BM25 with
    integer micro-unit scoring (order-independent BIGINT sums, so ranks are
    engine-exact). The self-document should usually win rank 1 — a built-in
    sanity signal the oracle also checks implicitly."""
    from sparkdoc.retrieval import bm25_topk
    from sparkdoc.textops import words

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    queries = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(words(F.col("text")), 1, 8), " ").alias("text"),
    )
    return bm25_topk(docs, queries, k=5)


def _doc_bm25_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with the common-term pruning knob (max_df_frac=0.5): query terms
    whose df exceeds half the corpus are dropped BEFORE the postings join —
    the production latency knob for stopword-heavy query batches. Probes mix
    each query doc's 4 RAREST + 4 most COMMON distinct terms (the realistic
    query shape, same recipe as bench/retrieval_scaling.py) — lead-of-doc
    words alone all sit at df ≈ 0.74·N in this synth corpus and would ALL be
    pruned, making the gate vacuous (r3 finding: 0 rows == 0 rows). With
    rare terms present, pruning drops only the common half and the gate
    compares non-empty ranked output. The synth corpus's ENTIRE vocab is
    common (min df ≈ 0.75·N — no real rare terms exist), so the corpus is
    deterministically augmented with per-doc group tags g<id%50> / h<id%97>
    (df ≈ 0.02·N / 0.01·N): real rare vocabulary that survives pruning and
    retrieves each query's group cohort. The oracle twin replays the
    identical augmentation, probe construction AND df filter, so the pruned
    semantics (not just the exact path) are gate-pinned."""
    from pyspark.sql import Window

    from sparkdoc.retrieval import bm25_topk
    from sparkdoc.textops import words

    docs = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" g"),
                (F.col("doc_id") % 50).cast("string"),
                F.lit(" h"),
                (F.col("doc_id") % 97).cast("string"),
            ).alias("text"),
        )
    )
    dfreq = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(words(F.col("text")))).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    qterms = docs.filter(F.col("doc_id") % 100 == 0).select(
        "doc_id", F.explode(F.array_distinct(words(F.col("text")))).alias("term")
    )
    j = qterms.join(F.broadcast(dfreq), "term")
    w_rare = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    w_comm = Window.partitionBy("doc_id").orderBy(
        F.col("df").desc(), F.col("term").asc()
    )
    picked = (
        j.withColumn("rr", F.row_number().over(w_rare))
        .withColumn("rc", F.row_number().over(w_comm))
        .filter((F.col("rr") <= 4) | (F.col("rc") <= 4))
    )
    queries = picked.groupBy("doc_id").agg(
        F.array_join(F.sort_array(F.collect_set("term")), " ").alias("text")
    ).select(F.col("doc_id").alias("query_id"), "text")
    return bm25_topk(docs, queries, k=5, max_df_frac=0.5)


def _doc_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (sparkdoc/retrieval.py
    rrf_fuse): BM25 top-10 over the documents table fused with exact dense
    cosine top-10 over the embeddings table, on a shared query-id set
    (doc_id == vec_id, every 100th id present in both tables). Fused score
    is the integer nano-unit RRF sum (k=60), so ranks are engine-exact;
    n_systems records how many retrievers surfaced each (query, doc)."""
    from sparkdoc.retrieval import bm25_topk, rrf_fuse
    from sparkdoc.similarity import brute_force_topk
    from sparkdoc.textops import words

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    emb = _emb(spark, sf_dir)
    dense = brute_force_topk(
        emb, emb.filter(F.col("vec_id") % 100 == 0), k=10
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    lex_q = (
        docs.join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi")
        .filter(F.col("doc_id") % 100 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(words(F.col("text")), 1, 8), " ").alias("text"),
        )
    )
    lex = bm25_topk(docs, lex_q, k=10).select("query_id", "doc_id", "rank")
    return rrf_fuse([lex, dense], k_rrf=60, topk=10)


def _graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (sparkdoc/graphalgo.py) over the symmetrized supplier <->
    customer trade graph (distinct pairs via lineitem x orders; custkeys
    shifted to their own id space). 3 power iterations, all-integer
    nano-unit ranks — the DuckDB twin replays the full iteration history
    exactly, like the k-means fit oracle."""
    from sparkdoc.graphalgo import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("l_suppkey").alias("s"),
            (F.col("o_custkey") + 10000000).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionByName(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    return pagerank(edges, iters=3)


def _doc_cms_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (sketches.cms_build/cms_estimate): term-frequency
    estimates from a d=4 x w=256 sketch table vs the exact counts, for the
    distinct terms of every 100th document. w is deliberately small so
    collisions DO occur — the gate then checks the over-count bound
    est >= exact holds cell-for-cell, not just on easy inputs."""
    from sparkdoc.sketches import cms_build, cms_estimate
    from sparkdoc.textops import words

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    terms = docs.select(F.explode(words(F.col("text"))).alias("term"))
    sketch = cms_build(terms, "term", w=256, d=4)
    probes = docs.filter(F.col("doc_id") % 100 == 0).select(
        F.explode(words(F.col("text"))).alias("term")
    )
    est = cms_estimate(sketch, probes, "term", w=256, d=4)
    exact = terms.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    return est.join(exact, est.value == exact.term).select(
        "value", "est_cnt", "exact_cnt"
    )


def _doc_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (clean.nfc_normalize_text): every 10th doc
    gets a deterministic DECOMPOSED suffix (NFD 'café Å' spelled with
    combining marks) so the normalizer has real work; output is the changed
    flag plus md5 of the normalized text (byte-exact UTF-8 digest in both
    engines), pinning CPython unicodedata == DuckDB utf8proc."""
    from sparkdoc.clean import nfc_normalize_text

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    suffix = " cafe\u0301 A\u030a ga\u0308rden"
    seeded = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(suffix))
        ).otherwise(F.col("text")),
    )
    out = nfc_normalize_text(seeded, "text")
    return out.select("doc_id", "nfc_changed", F.md5(F.col("text")).alias("nfc_md5"))


def _emb_semantic_dedup_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over TRAINED k-means cells (the paper's actual recipe —
    Abbas et al. cluster with k-means, not a hash quantizer): same
    lowest-id shadow rule, cells from cluster.kmeans_fit. The twin replays
    fit + assignment + within-cell pairwise cosine exactly."""
    from sparkdoc.cluster import kmeans_fit
    from sparkdoc.similarity import semantic_dedup

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit(emb, k=4, iters=2, dim=64, seed=13)
    return semantic_dedup(emb, threshold=0.4, cents=cents, dim=64)


def _doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed TF-IDF top-3 terms per doc (tf · ln((N+1)/(df+1)), rank by
    score desc then term asc). N rides in as a broadcast 1-row frame — no
    driver action inside the plan."""
    from sparkdoc.textops import tfidf_top_terms

    return (
        tfidf_top_terms(_docs(spark, sf_dir).select("doc_id", "text"), k=3)
        .withColumn("rank", F.col("rank").cast("int"))
        .orderBy("doc_id", "rank")
    )


_DELTA_NEAR_TAIL = " extra tail words appended here"
_DELTA_FRESH_TAIL = (
    " completely different continuation about penguins and glaciers in the far south"
)


def _docs_delta(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(corpus, delta): the delta batch mixes exact twins of corpus docs
    (doc_id % 7, +1e6), near twins (doc_id % 9, +2e6, tail appended) and
    prefix-sharing fresh docs (doc_id % 11, +3e6) — the three ingestion
    outcomes delta dedup must separate. Oracle mirrors this construction."""
    d = _docs(spark, sf_dir).select("doc_id", "text")

    def twin(mod: int, offset: int, text_col) -> DataFrame:
        return d.filter(F.col("doc_id") % mod == 0).select(
            (F.col("doc_id") + offset).alias("doc_id"), text_col.alias("text")
        )

    new = (
        twin(7, 1_000_000, F.col("text"))
        .unionByName(twin(9, 2_000_000, F.concat(F.col("text"), F.lit(_DELTA_NEAR_TAIL))))
        .unionByName(
            twin(
                11,
                3_000_000,
                F.concat(F.substring("text", 1, 40), F.lit(_DELTA_FRESH_TAIL)),
            )
        )
    )
    return d, new


def _doc_delta_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ingestion, exact stage: new docs join the persisted (fp,
    keep_id) index; only index hits return. Oracle: independent md5 join."""
    from sparkdoc.incremental import build_exact_index, delta_exact_dups

    old, new = _docs_delta(spark, sf_dir)
    return delta_exact_dups(new, build_exact_index(old)).orderBy("doc_id")


def _doc_delta_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ingestion, near stage: the delta's MinHash band keys join the
    corpus band index (signatures computed for the delta ONLY), candidates
    verify exact Jaccard against the candidate-pruned corpus, best match per
    new doc. Oracle replays the identical double-hash banding + verify."""
    from sparkdoc.incremental import build_band_index, delta_near_dups

    old, new = _docs_delta(spark, sf_dir)
    out = delta_near_dups(new, old, build_band_index(old), threshold=0.8)
    return out.withColumn("jaccard", F.round("jaccard", 6)).orderBy("doc_id")


def _doc_delta_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned delta admission: a constant-size membership sketch over
    the corpus fp index clears 'definitely new' delta docs without touching
    the index; only the maybes anti-join it. Output = the admitted (non-
    duplicate) delta doc ids — EXACT regardless of sketch false positives
    (no false negatives + join-verified maybes), so the oracle is the plain
    anti-join."""
    from sparkdoc.incremental import build_exact_index, delta_new_docs
    from sparkdoc.sketches import bloom_build

    old, new = _docs_delta(spark, sf_dir)
    idx = build_exact_index(old)
    # index build is a job boundary: sizing the sketch with one count is the
    # documented production pattern (no mid-plan action downstream)
    bloom = bloom_build(idx, "fp", n_expected=idx.count(), fpp=0.01)
    return delta_new_docs(new, idx, bloom=bloom).select("doc_id").orderBy("doc_id")


def _doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one bigram LM quality score (self-contained CCNet
    perplexity analog); the hostile corpus mixes real docs with junk/markup
    twins so the score actually separates."""
    from sparkdoc.textops import bigram_lm_score

    return bigram_lm_score(_docs_hostile(spark, sf_dir)).orderBy("doc_id")


def _doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard packing: md5-grouped, id-ordered running
    token cumsum cut at a 512-token budget."""
    from sparkdoc.filters import pack_sequences
    from sparkdoc.textops import token_count

    d = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(d, budget=512, n_groups=8).orderBy("doc_id")


#: DSIR gate parameters — target corpus = every 17th doc (a deterministic
#: topical-slice stand-in); small bucket space so collisions are exercised.
_DSIR_BUCKETS = 256
_DSIR_TARGET_MOD = 17
_DSIR_K = 50
_DSIR_SEED = 7


def _dsir_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.filter(F.col("doc_id") % _DSIR_TARGET_MOD == 0), d


def _doc_dsir_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR bucket model fit (Xie et al. 2023): hashed unigram+bigram counts
    on a target slice vs the raw pool, add-one smoothed log-ratio quantized
    to integer micro-units. Oracle recomputes the whole chain (md5 bucket
    hash, dense spine, ln ratio) in SQL."""
    from sparkdoc.selection import fit_dsir_model

    target, raw = _dsir_frames(spark, sf_dir)
    return fit_dsir_model(target, raw, n_buckets=_DSIR_BUCKETS).orderBy("bucket")


def _doc_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel-top-k selection: exact BIGINT importance weights
    (cnt · lr_e6 sums) + deterministic md5-derived Gumbel keys; top-50 by
    score. The full fit→weight→sample chain is replayed by the SQL twin."""
    from sparkdoc.selection import dsir_select, fit_dsir_model

    target, raw = _dsir_frames(spark, sf_dir)
    model = fit_dsir_model(target, raw, n_buckets=_DSIR_BUCKETS)
    return dsir_select(
        raw, model, k=_DSIR_K, seed=_DSIR_SEED, n_buckets=_DSIR_BUCKETS
    ).orderBy("rank")


def _emb_sq8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN: corpus encoded to 8-bit codes against exact
    per-dimension min/max (order-independent aggregates — bit-identical
    codebook in any engine), queries full-precision, cosine on dequantized
    bucket centers."""
    from sparkdoc.similarity import sq8_topk

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    return sq8_topk(emb, queries_df, k=5)


def _emb_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the SQ8 path vs exact top-k — grades quantization
    quality, not just plan shape."""
    from sparkdoc.similarity import ann_recall, brute_force_topk, sq8_topk

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    exact = brute_force_topk(emb, queries_df, k=5)
    return ann_recall(exact, {"sq8": sq8_topk(emb, queries_df, k=5)})


def _emb_kmeans_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=4, 2 iterations, hash-ranked seeds):
    the fit runs as one Spark job per iteration (shuffle-free plan-literal
    assignment + BIGINT micro-unit sums), then the integer-exact next-
    iteration state (cell, j, s_e6, cnt) is emitted — the DuckDB twin
    re-derives the ENTIRE training loop bit-for-bit, no float tolerance."""
    from sparkdoc.cluster import kmeans_fit, kmeans_stats

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit(emb, k=4, iters=2, dim=64, seed=13)
    return kmeans_stats(emb, cents, dim=64)


def _emb_ivf_trained_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over TRAINED centroids (vs emb_ivf_knn's deterministic
    untrained ones): sampled fit would be train_mod at 100 TB; here the gate
    corpus is small so the fit sees everything. nprobe=2 of k=4 cells."""
    from sparkdoc.cluster import ivf_topk_trained, kmeans_fit

    emb = _emb(spark, sf_dir)
    cents = kmeans_fit(emb, k=4, iters=2, dim=64, seed=13)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk_trained(emb, queries_df, cents, k=5, nprobe=2)


def _emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (m=8 subspaces × ksub=4 cells, one joint
    Lloyd iteration): the compressed representation a 100 TB corpus stores
    (m bytes/vector vs dim·4). Long form (vec_id, sub, code) so the gate
    hashes scalar values."""
    from sparkdoc.cluster import pq_encode, pq_fit

    emb = _emb(spark, sf_dir)
    cb = pq_fit(emb, m=8, ksub=4, iters=1, dim=64, seed=13)
    return pq_encode(emb, cb).select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    )


def _emb_pq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k: per-query LUT of subspace dots,
    candidate score = fixed-order sum of m lookups — the classic IVF-PQ
    scan's scoring half, exactly twinned in SQL."""
    from sparkdoc.cluster import pq_fit, pq_topk

    emb = _emb(spark, sf_dir)
    cb = pq_fit(emb, m=8, ksub=4, iters=1, dim=64, seed=13)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    return pq_topk(emb, queries_df, cb, k=5)


def _emb_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the trained-IVF and PQ-ADC paths vs exact top-k — grades
    the trained quantizers on retrieval QUALITY, mirroring emb_ann_recall's
    treatment of the untrained paths."""
    from sparkdoc.cluster import ivf_topk_trained, kmeans_fit, pq_fit, pq_topk
    from sparkdoc.similarity import ann_recall, brute_force_topk

    emb = _emb(spark, sf_dir)
    queries_df = emb.filter(F.col("vec_id") % 100 == 0)
    cents = kmeans_fit(emb, k=4, iters=2, dim=64, seed=13)
    cb = pq_fit(emb, m=8, ksub=4, iters=1, dim=64, seed=13)
    exact = brute_force_topk(emb, queries_df, k=5)
    return ann_recall(
        exact,
        {
            "ivf_trained": ivf_topk_trained(emb, queries_df, cents, k=5, nprobe=2),
            "pq": pq_topk(emb, queries_df, cb, k=5),
        },
    )


def _doc_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters over the corpus term stream (k=30 →
    threshold n/31): bounded-memory sketch candidates, exact verify counts,
    integer threshold — provably equal to the exact frequent-terms query
    (recall-completeness of the union-merged MG summary)."""
    from sparkdoc.sketches import heavy_hitters
    from sparkdoc.textops import words

    terms = _docs(spark, sf_dir).select(
        F.explode(words(F.col("text"))).alias("term")
    )
    return heavy_hitters(terms, "term", k=30).orderBy("item")


_MOJ_SNIP = " cafÃ© naÃ¯ve â€œquoteâ€ Â£5"  # singly-encoded mojibake
_MOJ_SNIP2 = " itÃ¢â‚¬â„¢s dÃ©jÃ  vu"  # doubly-encoded ’ + single pairs


def _doc_fix_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair (ftfy-class cp1252 mis-decoding fix) over a corpus
    with injected mojibake: doc_id%3 gets singly-encoded snippets, doc_id%5
    a doubly-encoded one — two passes of the ordered replace chain repair
    both; clean docs flag had_mojibake = 0."""
    from sparkdoc.textops import with_fixed_encoding

    did = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, F.lit(_MOJ_SNIP)).otherwise(F.lit("")),
            F.when(did % 5 == 0, F.lit(_MOJ_SNIP2)).otherwise(F.lit("")),
        ).alias("text"),
    )
    return with_fixed_encoding(d).orderBy("doc_id")


def _html_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HTML ingestion closes the web first mile: flatten_html (stdlib
    HTMLParser, Arrow-batched, zero-shuffle) over a 24-doc seeded messy-HTML
    corpus, fed straight into the SAME classify→XY-cut→spans pipeline — the
    oracle is a VALUES table from synth.expected_html_spans, the CLOSED-FORM
    block plan the renderer was authored from (the parser never sees the
    plan, only the HTML strings)."""
    from sparkdoc.htmlparse import flatten_html
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import html_corpus_df

    nodes = flatten_html(html_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    spans = explode_spans(extract_documents(nodes))
    return spans.select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _html_fused_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ZERO-shuffle fused html→documents path (one mapInPandas stage,
    no exchange — the 10^12-doc production shape when input is raw HTML)
    must land on the SAME closed-form block-plan oracle as the two-stage
    flatten→classify→XY-cut path: one independent oracle pins both."""
    from sparkdoc.htmlparse import html_to_documents_fused
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import html_corpus_df

    docs = html_to_documents_fused(html_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _md_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Markdown closes the .md first mile (reference: .txt/.md sources,
    handlers.py:44-105): the stdlib CommonMark-subset block parser over a
    24-doc seeded messy-Markdown corpus, through the fused zero-shuffle
    spans path — the oracle is a VALUES table from synth.expected_md_spans,
    the closed-form authored block plan (the parser never sees the plan)."""
    from sparkdoc.mdparse import md_to_documents
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import md_corpus_df

    docs = md_to_documents(md_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _md_generic_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic path (flatten_markdown → classify → XY-cut → spans) must
    land on the SAME closed-form plan as the fused path — one independent
    oracle pins both, so the two implementations can never drift apart."""
    from sparkdoc.mdparse import flatten_markdown
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import md_corpus_df

    nodes = flatten_markdown(md_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(extract_documents(nodes)).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _pdf_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw PDF closes the north rule's named first mile ("parses PDF layout
    blocks, reading-order sort via XY-cut over bounding boxes"): real PDF
    bytes (Flate streams, per-row positioned tables, image XObjects,
    two-column pages) parsed from scratch by pdfparse, blocks carrying REAL
    multi-page bboxes into the generic classify → XY-cut → spans pipeline.
    The oracle is a VALUES table from synth.expected_pdf_spans — the
    closed-form authored plan incl. page breaks, positional furniture, and
    picture media_refs (the parser only ever sees the bytes)."""
    from sparkdoc.pdfparse import flatten_pdf
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import pdf_corpus_df

    nodes = flatten_pdf(pdf_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(extract_documents(nodes)).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _docx_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw DOCX closes the Office first mile (reference: input-type
    catch-all DOCUMENT → docling's MS-Word backend, core/input/types.py):
    real OOXML zip packages parsed by docxparse (split runs, hyperlink
    link-density accounting, heading/Title styles, numPr lists, tables
    with multi-paragraph cells, drawings with alt text, header/footer
    parts) through the fused zero-shuffle spans path — oracle is a VALUES
    table from synth.expected_docx_spans (closed-form authored plan)."""
    from sparkdoc.docxparse import docx_to_documents
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import docx_corpus_df

    docs = docx_to_documents(docx_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _dljson_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoclingDocument JSON closes the reference's conversion-skipping input
    (DoclingDocumentHandler, core/input/handlers.py:573-673; detector peek
    core/input/types.py:206-233): real schema_name-marked dumps with
    body.children $ref walks, groups, offset-indexed table cells, and prov
    geometry in BOTH origins, parsed from scratch into the generic classify
    → XY-cut pipeline. Emission order in the JSON is SHUFFLED against the
    authored reading order — the oracle (VALUES from
    synth.expected_docling_json_spans) proves the geometry recovers it."""
    from sparkdoc.dljson import flatten_docling_json
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import docling_json_corpus_df

    nodes = flatten_docling_json(docling_json_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(extract_documents(nodes)).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _xlsx_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw XLSX extends the Office first mile (reference: input-type
    catch-all DOCUMENT → docling's MS-Excel backend, core/input/types.py):
    real SpreadsheetML zip packages parsed by xlsxparse (shared + rich-text
    + inline strings, numbers/booleans/errors verbatim, column gaps from
    r= cell refs, blank-row skips, rels-resolved sheet order with
    deliberately mismatched part numbering) through the fused zero-shuffle
    spans path — oracle is a VALUES table from synth.expected_xlsx_spans
    (closed-form authored plan)."""
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import xlsx_corpus_df
    from sparkdoc.xlsxparse import xlsx_to_documents

    docs = xlsx_to_documents(xlsx_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _pptx_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw PPTX completes the Office first mile (reference: input-type
    catch-all DOCUMENT → docling's MS-PowerPoint backend). Slides carry
    REAL geometry: the synth corpus SHUFFLES shape order in the XML, so the
    pinned span order proves XY-cut recovers reading order from the EMU
    boxes; page_breaks between slides, ftr/sldNum furniture placeholders,
    and the repeated-text furniture rule (decoration boxes on >= 3 slides)
    all come from the SAME assemble_spans kernel the PDF path runs. Oracle
    is a VALUES table from synth.expected_pptx_spans (closed-form authored
    plan, parser never consulted)."""
    from sparkdoc.pptxparse import pptx_to_documents
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import pptx_corpus_df

    docs = pptx_to_documents(pptx_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _adoc_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw AsciiDoc (the reference's generic handler runs a bare docling
    DocumentConverter — core/input/handlers.py:560-563 — whose default
    format matrix includes AsciiDoc): line-based subset parser (title /
    section levels, bullets, |=== tables, image:: macros, literal fences,
    link macros feeding link-density, attribute/comment skips) through the
    fused zero-shuffle spans path — oracle is a VALUES table from
    synth.expected_adoc_spans (closed-form authored plan)."""
    from sparkdoc.adocparse import adoc_to_documents
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import adoc_corpus_df

    docs = adoc_to_documents(adoc_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _vtt_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebVTT transcripts (docling's subtitle/audio-transcript route, in the
    same DocumentConverter default matrix): cue parser — NOTE/STYLE skips,
    optional identifiers, voice tags as 'Speaker:' turns, inline/timestamp
    tags stripped, multi-line payloads — one p block per cue through the
    fused zero-shuffle spans path. Oracle = VALUES from
    synth.expected_vtt_spans (closed-form authored plan)."""
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import vtt_corpus_df
    from sparkdoc.vttparse import vtt_to_documents

    docs = vtt_to_documents(vtt_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _jats_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JATS XML scholarly articles (the NISO Z39.96 tag suite, in docling's
    DocumentConverter default matrix like the other raw formats): stdlib
    ElementTree walk over a documented subset — front/article-meta title +
    contributors + abstracts, sec-depth headings, lists, figs as
    figcaption+picture, table-wraps, preformat verbatim, ext-link anchors
    feeding link density, back ack/ref-list — through the fused
    zero-shuffle spans path. Oracle = VALUES from
    synth.expected_jats_spans (closed-form authored plan)."""
    from sparkdoc.jatsparse import jats_to_documents
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import jats_corpus_df

    docs = jats_to_documents(jats_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _uspto_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USPTO patent XML (grants + applications, in docling's
    DocumentConverter default matrix): stdlib ElementTree walk over a
    documented subset — invention-title, abstract, description heading/p
    runs with CALS tables, drawings figures as pictures, claims with
    nested claim-text and claim-ref markers — through the fused
    zero-shuffle spans path. Oracle = VALUES from
    synth.expected_uspto_spans (closed-form authored plan)."""
    from sparkdoc.spans import explode_spans
    from sparkdoc.synth import uspto_corpus_df
    from sparkdoc.usptoparse import uspto_to_documents

    docs = uspto_to_documents(uspto_corpus_df(spark, 24, SYNTH_SEED, partitions=8))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _mets_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METS/ALTO scan bundles (docling's Google-Books route, same
    DocumentConverter default matrix): tar.gz archives of one METS
    manifest + per-page ALTO OCR, parsed with stdlib tarfile+ElementTree
    into REAL multi-page geometry — reading order comes from the SAME
    XY-cut/page-break/furniture pipeline as PDF (the generic extract path,
    one doc_id exchange; blocks are deliberately file-order-shuffled so
    XY-cut is doing real work). Oracle = VALUES from
    synth.expected_mets_spans (closed-form authored plan)."""
    from sparkdoc.metsparse import flatten_mets
    from sparkdoc.spans import explode_spans, extract_documents
    from sparkdoc.synth import mets_corpus_df

    docs = extract_documents(flatten_mets(mets_corpus_df(spark, 24, SYNTH_SEED, partitions=8)))
    return explode_spans(docs).select(
        "doc_id", "offset", "kind", F.md5(F.col("text")).alias("text_md5"), "media_ref"
    )


def _mixed_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format ingest closes the input-routing first mile (reference
    InputTypeDetector.detect, core/input/types.py:44-233): ONE (doc_id,
    blob) table interleaving real PDF/DOCX/XLSX/PPTX/HTML/Markdown/CSV/
    AsciiDoc/WebVTT/DocLang bytes, standalone images, plus binary and
    graph-JSON rejects,
    sniffed and parsed per row inside one
    zero-shuffle mapInPandas. The oracle is a VALUES table from
    synth.expected_mixed_spans — the same per-format closed-form
    restatements the per-format gates pin, composed (the router only ever
    sees the bytes)."""
    from sparkdoc.ingest import mixed_to_documents
    from sparkdoc.synth import mixed_corpus_df

    out = mixed_to_documents(mixed_corpus_df(spark, 52, SYNTH_SEED, partitions=8))
    s = out.select("doc_id", "fmt", F.explode("spans").alias("s"))
    return s.select(
        "doc_id", "fmt", F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"),
        F.md5(F.col("s.text")).alias("text_md5"), F.col("s.media_ref").alias("media_ref"),
    )


def _mixed_formats_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc sniff accounting over the same mixed corpus: EVERY input row
    appears — including binary/json rejects with zero spans (the reference
    raises on graph exports, types.py:180-190; a batch engine records and
    moves on)."""
    from sparkdoc.ingest import mixed_to_documents
    from sparkdoc.synth import mixed_corpus_df

    out = mixed_to_documents(mixed_corpus_df(spark, 52, SYNTH_SEED, partitions=8))
    return out.select("doc_id", "fmt", F.size("spans").alias("n_spans"))


def _url_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSRF URL-admission gate, static subset (reference URLValidator ladder,
    core/input/validators.py:162-340: scheme → host → per-address checks in
    metadata/loopback/link-local/multicast/reserved/private order; every
    resolved address must pass — handlers.py:238-241). No DNS in the DAG:
    IP-literal hosts and a pre-resolved ips column go through the identical
    ladder. Oracle = VALUES of the authored truth table
    (synth.URL_ADMISSION_CASES — the kernel never reads the verdicts)."""
    from sparkdoc.synth import url_admission_cases_df
    from sparkdoc.urlops import url_admission

    out = url_admission(url_admission_cases_df(spark), ips_col="resolved_ips")
    return out.select(
        "case_id",
        F.col("admitted").cast("int").alias("admitted"),
        F.coalesce("reject_reason", F.lit("")).alias("reject_reason"),
    )


def _warc_extract_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC container ingest (beyond-reference: crawl corpora arrive as ISO
    28500 archives — Common Crawl ships per-record-gzip members): record
    split by Content-Length discipline, HTTP header strip + chunked
    transfer decode, warcinfo/request noise skipped, every payload routed
    through the mixed sniffer. Oracle = VALUES from
    synth.expected_warc_spans (the mixed closed forms re-keyed to the
    container-derived doc_ids)."""
    from sparkdoc.synth import warc_corpus_df
    from sparkdoc.warc import warc_extract

    out = warc_extract(warc_corpus_df(spark, 6, SYNTH_SEED, partitions=3))
    s = out.select("doc_id", "fmt", F.explode("spans").alias("s"))
    return s.select(
        "doc_id", "fmt", F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"),
        F.md5(F.col("s.text")).alias("text_md5"), F.col("s.media_ref").alias("media_ref"),
    )


def _docs_boiler_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived node table for the Boilerpipe gate: each document's text is
    chunked into per-doc fixed-width word windows (width 6+doc_id%20 so word
    counts straddle every NumWordsRules threshold), and n_links is spelled
    deterministically from (node_id, n_chars) so link densities hit the
    0.8 / 0.5 / 0 regimes — the oracle builds the IDENTICAL table in SQL."""
    did = F.col("doc_id")
    sz = (did % 20 + 6).cast("int")
    # triple the text so wide-window docs still yield enough nodes for the
    # prev-link-dense → next_words>17 → CONTENT path to fire (branch
    # coverage verified: every leaf of the tree is populated at sf0.01)
    t3 = F.concat_ws(" ", F.col("text"), F.col("text"), F.col("text"))
    ws = F.split(F.trim(t3), r"\s+")
    d = _docs(spark, sf_dir).select(
        "doc_id", ws.alias("ws"), sz.alias("sz"),
        F.ceil(F.size(ws) / sz).cast("int").alias("nchunks"),
    )
    d = d.select(
        "doc_id", "ws", "sz",
        F.explode(F.sequence(F.lit(0), F.col("nchunks") - 1)).alias("i"),
    )
    sent = F.array_join(F.slice(F.col("ws"), F.col("i") * F.col("sz") + 1, F.col("sz")), " ")
    d = d.select("doc_id", (F.col("i") + 1).alias("node_id"), sent.alias("text"))
    n_chars = F.length(F.col("text"))
    n_links = (
        F.when(F.col("node_id") % 4 == 0, F.floor(n_chars * 4 / 5))
        .when(F.col("node_id") % 7 == 0, F.floor(n_chars / 2))
        .otherwise(F.lit(0))
    ).cast("int")
    return d.withColumn("n_chars", n_chars.cast("int")).withColumn("n_links", n_links)


def _doc_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerpipe NumWordsRulesClassifier (Kohlschütter et al., WSDM 2010 —
    text density + link density over lag/lead neighbours) as pure exprs +
    one doc-keyed window; the DuckDB twin restates the published decision
    tree independently."""
    from sparkdoc.htmlparse import numwords_content

    out = numwords_content(_docs_boiler_nodes(spark, sf_dir))
    return out.select(
        "doc_id",
        "node_id",
        "words",
        F.round(F.col("link_density"), 6).alias("link_density"),
        F.col("is_content").cast("int").alias("is_content"),
    ).orderBy("doc_id", "node_id")


def _docs_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived URL corpus: one synthetic URL per document, deterministically
    spelled from doc_id so many spellings collapse to the same canonical
    form — mixed-case scheme/host (%2 / %3), default port (%4), trailing
    slash (%5), param order + a utm_source tracker (%2), fragment (%7).
    The oracle builds the IDENTICAL strings in SQL (urls_src CTE)."""
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("http://")),
        F.when(did % 3 == 0, F.concat(F.lit("Site"), (did % 40).cast("string"), F.lit(".COM")))
        .otherwise(F.concat(F.lit("site"), (did % 40).cast("string"), F.lit(".com"))),
        F.when(did % 4 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Page/"),
        (did % 25).cast("string"),
        F.when(did % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 2 == 0, F.concat(F.lit("?b=2&a="), (did % 10).cast("string"), F.lit("&utm_source=s")))
        .otherwise(F.concat(F.lit("?a="), (did % 10).cast("string"), F.lit("&b=2"))),
        F.when(did % 7 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return _docs(spark, sf_dir).select("doc_id", url.alias("url"))


def _doc_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (RefinedWeb §3.2-class normalization): lowercase
    scheme/authority, default-port + fragment + trailing-slash + tracking-
    param removal, bytewise query-param sort — pure codegen exprs."""
    from sparkdoc.urlops import with_canonical_url

    return with_canonical_url(_docs_urls(spark, sf_dir)).orderBy("doc_id")


def _doc_url_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed dedup: one row per canonical URL with the deterministic
    keeper (min doc_id), row count, and distinct-spelling count — the
    window-free keep-min shape, one shuffle on the canonical key."""
    from sparkdoc.urlops import url_dedup

    return url_dedup(_docs_urls(spark, sf_dir)).orderBy("url_canon")


def _doc_vocab_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary size via HLL++ sketch with exact validation:
    the gate pins the EXACT distinct-word count per source plus the sketch's
    within-tolerance self-check (the oracle asserts TRUE — an estimate
    drifting past 5·rsd fails the hash compare). n_estimate itself is
    engine-specific and excluded from the compared columns."""
    from sparkdoc.sketches import approx_distinct_by
    from sparkdoc.textops import words

    terms = _docs(spark, sf_dir).select(
        "source", F.explode(words(F.col("text"))).alias("w")
    )
    return (
        approx_distinct_by(terms, "source", "w", rsd=0.02, exact=True)
        .select("source", "n_distinct", F.col("within_tol").cast("int").alias("within_tol"))
        .orderBy("source")
    )


def _doc_url_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host + registrable-domain extraction (PSL-subset rule): synthetic
    hosts mix www/sub prefixes, .com vs .co.uk suffixes, ports and
    userinfo; the oracle rebuilds the same strings and mirrors the
    label-slice rule."""
    from sparkdoc.urlops import with_url_domain

    did = F.col("doc_id")
    url = F.concat(
        F.lit("http://"),
        F.when(did % 7 == 0, F.lit("User@")).otherwise(F.lit("")),
        F.when(did % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.lit("sub.")).otherwise(F.lit("")),
        F.lit("Site"), (did % 30).cast("string"),
        F.when(did % 4 == 0, F.lit(".co.uk")).otherwise(F.lit(".Com")),
        F.when(did % 5 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/p/"), (did % 10).cast("string"),
    )
    d = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
    return with_url_domain(d).orderBy("doc_id")


# Committed BPE merge list: fit_bpe_py over sf0.001 word counts (n=12) —
# the encode/token gates apply a FIXED ruleset so the oracle can replay the
# exact replace chain; fit itself is gated separately (doc_bpe_fit replays
# the whole training loop in SQL) and unit-pinned against the python twin.
_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"),
]


def _doc_bpe_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained BPE: the full greedy merge-learning loop (8 iterations of
    pair-count argmax + fuse) — the oracle replays EVERY iteration in SQL
    (chained CTEs: pair explode, deterministic argmax, 7-pass replace)."""
    from sparkdoc.bpe import fit_bpe, word_counts

    merges = fit_bpe(word_counts(_docs(spark, sf_dir)), n_merges=8)
    rows = [(i + 1, a, b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(rows, "rank int, merge_a string, merge_b string").orderBy("rank")


def _doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encode of the distinct-word vocabulary under the committed merge
    list — a pure-JVM replace chain (no UDF); the oracle applies the
    identical chain."""
    from sparkdoc.bpe import encode_words, word_counts

    enc = encode_words(word_counts(_docs(spark, sf_dir)), _BPE_MERGES)
    return enc.select(
        "word", "cnt", F.concat_ws(" ", "tokens").alias("tokens_str"), "n_tokens"
    ).orderBy("word")


def _doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts: corpus explodes once, the encoded
    vocabulary broadcast-joins on (plan-asserted broadcast)."""
    from sparkdoc.bpe import bpe_token_counts

    return bpe_token_counts(_docs(spark, sf_dir), _BPE_MERGES).orderBy("doc_id")


def _bpe_sql_words(docs_table: str = "documents") -> str:
    return f"""(
        SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
            FROM {docs_table})
        WHERE length(word) > 0 GROUP BY word)"""


_BPE_SQL_INIT = "' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' || ' '"


def _bpe_encode_expr(merges: list[tuple[str, str]], fix_passes: int) -> str:
    expr = _BPE_SQL_INIT
    for a, b in merges:
        for _ in range(fix_passes):
            expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    return expr


def _bpe_fit_oracle_sql(n_merges: int, fix_passes: int) -> str:
    """Generate the SQL that replays the ENTIRE BPE training loop: per
    iteration, adjacent-pair counting via a 1-based list zip, the
    deterministic argmax (count desc, pair asc), and the 7-pass fuse."""
    parts = [f"w0 AS (SELECT {_BPE_SQL_INIT} AS syms, cnt FROM {_bpe_sql_words()} )"]
    for k in range(n_merges):
        parts.append(
            f"""p{k} AS (
            SELECT arr[i] AS a, arr[i + 1] AS b, sum(cnt) AS n
            FROM (SELECT arr, cnt, unnest(generate_series(1, len(arr) - 1)) AS i
                  FROM (SELECT string_split(trim(syms), ' ') AS arr, cnt FROM w{k}))
            GROUP BY 1, 2),
        m{k} AS (
            SELECT a, b, ' ' || a || ' ' || b || ' ' AS pat, ' ' || a || b || ' ' AS rep
            FROM p{k} ORDER BY n DESC, a ASC, b ASC LIMIT 1)"""
        )
        rep = "w.syms"
        for _ in range(fix_passes):
            rep = f"replace({rep}, m.pat, m.rep)"
        parts.append(f"w{k + 1} AS (SELECT {rep} AS syms, w.cnt FROM w{k} w, m{k} m)")
    union = "\nUNION ALL\n".join(
        f"SELECT {k + 1} AS rank, a AS merge_a, b AS merge_b FROM m{k}"
        for k in range(n_merges)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union + "\nORDER BY rank"


_EVAL_ID_FIELDS = {"R": ["title"], "E": ["name"]}


def _eval_graph_inputs(spark: SparkSession, sf_dir: str):
    """Deterministic per-document (truth, got) graph pair for the evaluation
    harness gates (evaluate.py; reference 16_extraction_evaluation.py).

    Per doc, words 1-5 (letters-only, canonical fallbacks) build:
      truth: root R(title=w1 w2) + entities E(w1), E(w2), E(w3), E(w3 12)
      got:   R(w1-w2) [strict via canonicalization], E(upper w1) [strict],
             E(w2+w4+q) [relaxed superset of w2], E(qz+w5) [fp noise],
             E(w3 1234) [digit-signature veto vs 'w3 12' -> stays fp/fn]
    so strict, relaxed, veto, and noise rows all populate at every SF."""
    docs = _docs(spark, sf_dir)
    w = F.split(F.col("text"), " ")

    def word(i: int, fb: str):
        # try_element_at: under ANSI (default in this session) element_at on a
        # short array THROWS instead of returning NULL, so the fallback
        # below would be unreachable exactly when needed (docs with fewer
        # words than the highest index used)
        c = F.regexp_replace(F.lower(F.try_element_at(w, F.lit(i))), "[^a-z]", "")
        return F.coalesce(F.nullif(c, F.lit("")), F.lit(fb))

    w1, w2, w3 = word(1, "alpha"), word(2, "beta"), word(3, "gamma")
    w4, w5 = word(4, "delta"), word(5, "epsilon")

    def node(cls, nid, field, val, attrs):
        return F.struct(
            F.lit(cls).alias("class"),
            F.lit(nid).alias("node_id"),
            F.create_map(F.lit(field), val).alias("ids"),
            attrs.alias("attrs"),
        )

    def shape(df):
        return df.select(
            "doc_id", F.col("n.class").alias("class"), F.col("n.node_id").alias("node_id"),
            F.col("n.ids").alias("ids"), F.col("n.attrs").alias("attrs"),
        )

    org = F.create_map(F.lit("kind"), F.lit("org"))
    truth = shape(
        docs.select(
            "doc_id",
            F.explode(
                F.array(
                    node("R", "tR", "title", F.concat(w1, F.lit(" "), w2),
                         F.create_map(F.lit("year"), F.lit("2024"), F.lit("desc"), w3)),
                    node("E", "te1", "name", w1,
                         F.create_map(F.lit("kind"), F.lit("org"), F.lit("city"), w4)),
                    node("E", "te2", "name", w2, org),
                    node("E", "te3", "name", w3,
                         F.create_map(F.lit("m3"), w4)),
                    node("E", "te4", "name", F.concat(w3, F.lit(" 12")),
                         F.create_map(F.lit("m4"), w5)),
                )
            ).alias("n"),
        )
    )
    got = shape(
        docs.select(
            "doc_id",
            F.explode(
                F.array(
                    node("R", "gR", "title", F.concat(w1, F.lit("-"), w2),
                         F.create_map(F.lit("year"), F.lit("2024"), F.lit("desc"), F.lit(""))),
                    node("E", "ge1", "name", F.upper(w1),
                         F.create_map(F.lit("kind"), F.lit("org"), F.lit("city"), F.lit(""))),
                    node("E", "ge2", "name", F.concat(w2, w4, F.lit("q")), org),
                    # ge9: fp at strict+relaxed, but its m3 attr equals te3's
                    # -> the structural-alignment rung pairs them (score 1.0).
                    node("E", "ge9", "name", F.concat(F.lit("qz"), w5),
                         F.create_map(F.lit("m3"), w4)),
                    # ge4: digit-sig veto partner; m4 never matches te4's
                    # (w5 vs literal 'zz') -> stays unmatched at every rung.
                    node("E", "ge4", "name", F.concat(w3, F.lit(" 1234")),
                         F.create_map(F.lit("m4"), F.lit("zz"))),
                )
            ).alias("n"),
        )
    )

    def edges(df, rows):
        arr = F.array(
            *[
                F.struct(F.lit(s).alias("src"), F.lit(d).alias("dst"), F.lit(lb).alias("label"))
                for s, d, lb in rows
            ]
        )
        return df.select("doc_id", F.explode(arr).alias("e")).select(
            "doc_id", F.col("e.src").alias("src"), F.col("e.dst").alias("dst"),
            F.col("e.label").alias("label"),
        )

    tedges = edges(docs, [("tR", "te1", "has"), ("tR", "te2", "has"), ("te1", "te3", "rel")])
    gedges = edges(
        docs,
        [("gR", "ge1", "has"), ("gR", "ge1", "has"), ("gR", "ge2", "has"), ("ge1", "ge9", "rel")],
    )
    return truth, got, tedges, gedges


def _doc_eval_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node P/R/F1 at strict + relaxed rungs (evaluate.eval_nodes) over the
    synthesized truth/got pair; the DuckDB twin rebuilds the full ladder
    (canonical keys -> distinct -> strict equi-join -> symmetric-unique
    containment pairs with digit-signature guard -> prf arithmetic)."""
    from sparkdoc.evaluate import eval_nodes

    truth, got, _, _ = _eval_graph_inputs(spark, sf_dir)
    return eval_nodes(truth, got, _EVAL_ID_FIELDS)


def _doc_eval_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge P/R/F1 with relaxed alias folding (evaluate.eval_edges): the got
    edge into the relaxed-matched alias counts at the relaxed rung only;
    duplicate got edges collapse (set semantics)."""
    from sparkdoc.evaluate import eval_edges

    truth, got, tedges, gedges = _eval_graph_inputs(spark, sf_dir)
    return eval_edges(truth, got, tedges, gedges, _EVAL_ID_FIELDS)


def _doc_eval_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute completeness on strictly matched nodes
    (evaluate.attribute_completeness): per (class, field) filled/expected."""
    from sparkdoc.evaluate import attribute_completeness

    truth, got, _, _ = _eval_graph_inputs(spark, sf_dir)
    return attribute_completeness(truth, got, _EVAL_ID_FIELDS).orderBy("class", "field")


def _doc_eval_aligned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aligned rung (evaluate.eval_nodes_aligned): structural pairing of the
    post-relaxed remainders by attribute overlap (ge9's m3 attr equals
    te3's). The synthesized attrs partition by field name, so each remainder
    node has at most ONE >=1.0 candidate — the greedy best-first result then
    equals the SQL twin's mutual-unique exact-field-match pairing (greedy tie
    ordering itself is unit-pinned in tests/test_evaluate.py)."""
    from sparkdoc.evaluate import eval_nodes_aligned

    truth, got, _, _ = _eval_graph_inputs(spark, sf_dir)
    return eval_nodes_aligned(truth, got, _EVAL_ID_FIELDS)


def _doc_eval_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-fidelity ratio (evaluate.verbatim_ratio): per doc, one long
    attr lifted verbatim from the source (hit) and one with a fabricated
    tail (miss); short attrs excluded by the >=80-char gate."""
    from sparkdoc.evaluate import verbatim_ratio

    docs = _docs(spark, sf_dir)
    got = docs.select(
        "doc_id",
        F.create_map(
            F.lit("quote"), F.substring(F.col("text"), 1, 100),
            F.lit("fabricated"), F.concat(F.substring(F.col("text"), 1, 100), F.lit(" qqzzqq")),
            F.lit("short"), F.lit("abc"),
        ).alias("attrs"),
    )
    return verbatim_ratio(got, docs)


def _doc_eval_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-matrix rollup (evaluate.eval_rollup, 17_benchmark_aggregate
    micro): per class across all docs, micro P/R/F1 both rungs + mean per-doc
    strict F1 (rounded 6dp, the gate's float convention)."""
    from sparkdoc.evaluate import eval_nodes, eval_rollup

    truth, got, _, _ = _eval_graph_inputs(spark, sf_dir)
    out = eval_rollup(eval_nodes(truth, got, _EVAL_ID_FIELDS))
    return out.withColumn("mean_f1_strict", F.round("mean_f1_strict", 6))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational operator coverage (joins/aggs/windows/top-k)
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_unshipped": _q3_unshipped,
        "q5_local_supplier": _q5_local_supplier,
        "top_customer_per_nation": _top_customer_per_nation,
        "events_sessionize": _events_sessionize,
        "events_latest_per_type": _events_latest_per_type,
        "events_carry_forward": _events_carry_forward,
        "events_asof_click": _events_asof_click,
        "events_interval_pairs": _events_interval_pairs,
        "events_type_sets": _events_type_sets,
        "events_window_agg": _events_window_agg,
        # text / cleaning operators (SURVEY §2.2)
        "doc_sanitize": _doc_sanitize,
        "doc_tokens": _doc_tokens,
        "doc_lang": _doc_lang,
        "doc_quality": _doc_quality,
        "doc_segments": _doc_segments,
        # dedup family
        "doc_exact_dups": _doc_exact_dups,
        "doc_minhash": _doc_minhash,
        "doc_jaccard_pairs": _doc_jaccard_pairs,
        "doc_simhash_pairs": _doc_simhash_pairs,
        "doc_simhash_sig": _doc_simhash_sig,
        "doc_rolling_fp": _doc_rolling_fp,
        "doc_dup_groups": _doc_dup_groups,
        "doc_leak_split": _doc_leak_split,
        "doc_temp_sample": _doc_temp_sample,
        "doc_token_ids": _doc_token_ids,
        "doc_sample": _doc_sample,
        "doc_para_dedup": _doc_para_dedup,
        "doc_substr_spans": _doc_substr_spans,
        "doc_substr_dedup": _doc_substr_dedup,
        "doc_classifier_score": _doc_classifier_score,
        "doc_domain_cap": _doc_domain_cap,
        "doc_domain_rebalance": _doc_domain_rebalance,
        "doc_top_terms": _doc_top_terms,
        "doc_bm25": _doc_bm25,
        "doc_bm25_pruned": _doc_bm25_pruned,
        "doc_rrf_hybrid": _doc_rrf_hybrid,
        "graph_pagerank": _graph_pagerank,
        "doc_cms_terms": _doc_cms_terms,
        "doc_nfc": _doc_nfc,
        "doc_delta_exact": _doc_delta_exact,
        "doc_delta_near": _doc_delta_near,
        "doc_delta_bloom": _doc_delta_bloom,
        "doc_lm_score": _doc_lm_score,
        "doc_pack": _doc_pack,
        "doc_dsir_model": _doc_dsir_model,
        "doc_dsir_select": _doc_dsir_select,
        "doc_heavy_hitters": _doc_heavy_hitters,
        "doc_url_canon": _doc_url_canon,
        "doc_url_dups": _doc_url_dups,
        "doc_fix_encoding": _doc_fix_encoding,
        "html_extract_pinned": _html_extract_pinned,
        "html_fused_pinned": _html_fused_pinned,
        "md_extract_pinned": _md_extract_pinned,
        "md_generic_pinned": _md_generic_pinned,
        "pdf_extract_pinned": _pdf_extract_pinned,
        "docx_extract_pinned": _docx_extract_pinned,
        "dljson_extract_pinned": _dljson_extract_pinned,
        "xlsx_extract_pinned": _xlsx_extract_pinned,
        "pptx_extract_pinned": _pptx_extract_pinned,
        "adoc_extract_pinned": _adoc_extract_pinned,
        "vtt_extract_pinned": _vtt_extract_pinned,
        "jats_extract_pinned": _jats_extract_pinned,
        "uspto_extract_pinned": _uspto_extract_pinned,
        "mets_extract_pinned": _mets_extract_pinned,
        "mixed_extract_pinned": _mixed_extract_pinned,
        "mixed_formats_pinned": _mixed_formats_pinned,
        "warc_extract_pinned": _warc_extract_pinned,
        "url_admission": _url_admission,
        "doc_boilerplate": _doc_boilerplate,
        "doc_url_domain": _doc_url_domain,
        "doc_vocab_sketch": _doc_vocab_sketch,
        # trained BPE tokenizer (fit loop + committed-ruleset encode)
        "doc_bpe_fit": _doc_bpe_fit,
        "doc_bpe_encode": _doc_bpe_encode,
        "doc_bpe_tokens": _doc_bpe_tokens,
        # extraction evaluation harness (16/17_… analogs)
        "doc_eval_nodes": _doc_eval_nodes,
        "doc_eval_edges": _doc_eval_edges,
        "doc_eval_fill": _doc_eval_fill,
        "doc_eval_rollup": _doc_eval_rollup,
        "doc_eval_aligned": _doc_eval_aligned,
        "doc_eval_verbatim": _doc_eval_verbatim,
        # corpus filters (Gopher repetition, PII, decontamination)
        "doc_repetition": _doc_repetition,
        "doc_pii": _doc_pii,
        "doc_decontam": _doc_decontam,
        "doc_chunk_owner": _doc_chunk_owner,
        "doc_page_markdowns": _doc_page_markdowns,
        "emb_near_dups": _emb_near_dups,
        "doc_resolve_parents": _doc_resolve_parents,
        "doc_anchor_scan": _doc_anchor_scan,
        "doc_ledger": _doc_ledger,
        "doc_alias_pairs": _doc_alias_pairs,
        "doc_cardinality": _doc_cardinality,
        "doc_graph_stats": _doc_graph_stats,
        "doc_merge_ledgers": _doc_merge_ledgers,
        "doc_dedup_entities": _doc_dedup_entities,
        "doc_doclang": _doc_doclang,
        "doc_deep_merge": _doc_deep_merge,
        "doc_content_dedup": _doc_content_dedup,
        "doc_bind_kinds": _doc_bind_kinds,
        "doc_name_norm": _doc_name_norm,
        "doc_graph_hygiene": _doc_graph_hygiene,
        "doc_coverage": _doc_coverage,
        "doc_coverage_threshold": _doc_coverage_threshold,
        "extract_spans_pinned": _extract_spans_pinned,
        "doclang_roundtrip": _doclang_roundtrip,
        "chunks_pinned": _chunks_pinned,
        "graph_pinned": _graph_pinned,
        "template_graph_pinned": _template_graph_pinned,
        "ledger_pinned": _ledger_pinned,
        "fill_pinned": _fill_pinned,
        "one_to_one_pinned": _one_to_one_pinned,
        # similarity search
        "emb_norms": _emb_norms,
        "emb_knn": _emb_knn,
        "emb_decontam": _emb_decontam,
        "emb_label_knn": _emb_label_knn,
        "emb_lsh_knn": _emb_lsh_knn,
        "emb_ivf_knn": _emb_ivf_knn,
        "emb_ann_recall": _emb_ann_recall,
        "emb_sq8_knn": _emb_sq8_knn,
        "emb_sq8_recall": _emb_sq8_recall,
        "emb_kmeans_stats": _emb_kmeans_stats,
        "emb_ivf_trained_knn": _emb_ivf_trained_knn,
        "emb_pq_codes": _emb_pq_codes,
        "emb_pq_knn": _emb_pq_knn,
        "emb_trained_recall": _emb_trained_recall,
        "emb_semantic_dedup_trained": _emb_semantic_dedup_trained,
        "emb_semantic_dedup": _emb_semantic_dedup,
        # identity normalizers + plan choice
        "doc_fold_phrase": _doc_fold_phrase,
        "doc_digit_sig": _doc_digit_sig,
        "doc_contract": _doc_contract,
        # span pipeline + orchestration surfaces. NOT all rows-only: entries
        # with an oracle_sql() twin (doc_salvage, doc_root_repair,
        # events_batch_handles, graph_merge, doc_format_resolution,
        # media_features, source_stats_salted) are graded oracle-exact; only
        # the entries WITHOUT an oracle key fall back to the rows-only check
        # (each of those has an oracle-exact *_pinned counterpart above)
        "extract_spans": _extract_spans,
        "chunk_documents": _chunk_docs,
        "provenance_ledger": _ledger,
        "page_markdowns": _page_markdowns_q,
        "chunk_owner": _chunk_owner_q,
        "graph_pipeline": _graph_pipeline_q,
        "extraction_graph": _extraction_graph,
        "fill_phase": _fill_phase_q,
        "doc_salvage": _doc_salvage,
        "doc_root_repair": _doc_root_repair,
        "events_batch_handles": _events_batch_handles,
        "graph_merge": _graph_merge,
        "one_to_one_extract": _one_to_one,
        "doc_format_resolution": _doc_format_resolution,
        "media_features": _media_features,
        "media_decode": _media_decode,
        "media_png_decode": _media_png_decode,
        "media_gif_decode": _media_gif_decode,
        "media_jpeg_decode": _media_jpeg_decode,
        "media_tiff_decode": _media_tiff_decode,
        "media_webp_decode": _media_webp_decode,
        "media_jpeg_prog_decode": _media_jpeg_prog_decode,
        "media_audio_decode": _media_audio_decode,
        "media_video_decode": _media_video_decode,
        "doc_table_cells": _doc_table_cells,
        "doc_table_shapes": _doc_table_shapes,
        "domain_stats_salted": _domain_stats,
        "source_stats_salted": _source_stats_salted,
        "doclang_serialize": _doclang_docs,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB)
# --------------------------------------------------------------------------

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"


def oracle_sql() -> dict[str, str]:
    q = {}
    q["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """
    q["q3_unshipped"] = """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate > TIMESTAMP '1995-03-15'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_e4 DESC, o_orderkey ASC
        LIMIT 10
    """
    q["q5_local_supplier"] = """
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue_e4 DESC, n_name ASC
    """
    q["top_customer_per_nation"] = """
        WITH rev AS (
            SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM orders GROUP BY o_custkey
        )
        SELECT n_name, c_custkey, revenue_cents, rnk FROM (
            SELECT n_name, c_custkey, revenue_cents,
                   row_number() OVER (PARTITION BY n_name ORDER BY revenue_cents DESC, c_custkey ASC) AS rnk
            FROM rev JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
        ) WHERE rnk <= 2
    """
    q["events_sessionize"] = """
        SELECT user_id,
               CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM (
            SELECT user_id,
                   CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ) GROUP BY user_id
    """
    q["events_latest_per_type"] = """
        SELECT user_id, event_type, event_id,
               CAST(round(value * 10000) AS BIGINT) AS value_e4
        FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """
    q["events_carry_forward"] = """
        SELECT user_id, event_id,
               last_value(CASE WHEN event_type = 'click'
                               THEN CAST(round(value * 10000) AS BIGINT) END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 12 PRECEDING AND CURRENT ROW) AS last_click_e4
        FROM events
    """
    q["events_type_sets"] = """
        WITH agg AS (
            SELECT user_id,
                   list_sort(list_distinct(list_filter(
                       list(CASE WHEN event_id % 2 = 0 THEN event_type END), x -> x IS NOT NULL))) AS first_types,
                   list_sort(list_distinct(list_filter(
                       list(CASE WHEN event_id % 3 = 0 THEN event_type END), x -> x IS NOT NULL))) AS second_types
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               len(list_intersect(first_types, second_types)) AS n_common,
               len(first_types) + len(second_types) - len(list_intersect(first_types, second_types)) AS n_union,
               len(list_filter(first_types, x -> NOT list_contains(second_types, x))) AS n_only_first
        FROM agg
    """
    q["events_window_agg"] = """
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_e2,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """
    q["doc_sanitize"] = rf"""
        WITH documents_h AS ({_HOSTILE_SQL})
        SELECT doc_id,
               length(regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g')) AS clean_len,
               length(regexp_replace(regexp_replace(text, '(?s)<!\[CDATA\[(.*?)\]\]>', '\1', 'g'), '<[^>]+>', '', 'g')) AS content_len,
               length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS squash_len
        FROM documents_h
    """
    q["doc_tokens"] = f"""
        SELECT doc_id,
               len({_WORDS_SQL}) AS n_words,
               len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS n_tokens
        FROM documents
    """
    en = "['the','and','of','to','in','is','that','it','was','for','with','as','on']"
    fr = "['le','la','les','de','des','et','un','une','est','que','dans','pour','du']"
    de = "['der','die','das','und','ist','von','mit','den','nicht','ein','eine','zu','für']"
    es = "['el','la','los','las','de','y','que','en','un','una','es','por','con']"
    q["doc_lang"] = f"""
        WITH documents_h AS ({_HOSTILE_SQL}),
        h AS (
            SELECT doc_id,
                   len(list_filter({_WORDS_SQL}, w -> list_contains({en}, w))) AS en_h,
                   len(list_filter({_WORDS_SQL}, w -> list_contains({fr}, w))) AS fr_h,
                   len(list_filter({_WORDS_SQL}, w -> list_contains({de}, w))) AS de_h,
                   len(list_filter({_WORDS_SQL}, w -> list_contains({es}, w))) AS es_h
            FROM documents_h
        )
        SELECT doc_id,
               CASE
                 WHEN en_h > 0 AND en_h >= fr_h AND en_h >= de_h AND en_h >= es_h THEN 'en'
                 WHEN fr_h > 0 AND fr_h > en_h AND fr_h >= de_h AND fr_h >= es_h THEN 'fr'
                 WHEN de_h > 0 AND de_h > en_h AND de_h > fr_h AND de_h >= es_h THEN 'de'
                 WHEN es_h > 0 AND es_h > en_h AND es_h > fr_h AND es_h > de_h THEN 'es'
                 ELSE 'und'
               END AS lang_pred
        FROM h
    """
    q["doc_quality"] = f"""
        WITH documents_h AS ({_HOSTILE_SQL}),
        w AS (
            SELECT doc_id, text, {_WORDS_SQL} AS ws,
                   length(text) AS nc,
                   length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alnum
            FROM documents_h
        )
        SELECT doc_id,
               len(ws) AS n_words,
               CASE WHEN len(ws) > 0 THEN CAST(list_reduce(list_transform(ws, x -> CAST(length(x) AS BIGINT)), (a,b) -> a + b) AS BIGINT) / len(ws) ELSE 0.0 END AS mean_word_len,
               CASE WHEN nc > 0 THEN (nc - alnum) / nc ELSE 0.0 END AS symbol_ratio,
               CASE WHEN len(ws) > 0 THEN len(list_filter(ws, x -> list_contains({en}, x))) / len(ws) ELSE 0.0 END AS stop_fraction,
               CASE WHEN len(ws) > 0 THEN len(list_distinct(ws)) / len(ws) ELSE 0.0 END AS distinct_word_fraction,
               CASE WHEN regexp_matches(text, '[.!?]\\s*$') THEN 1 ELSE 0 END AS ends_with_punct,
               CASE WHEN len(ws) >= 10
                     AND (CASE WHEN nc > 0 THEN (nc - alnum) / nc ELSE 0.0 END) <= 0.6
                     AND (CASE WHEN len(ws) > 0 THEN len(list_distinct(ws)) / len(ws) ELSE 0.0 END) >= 0.2
                    THEN 1 ELSE 0 END AS quality_keep
        FROM w
    """
    q["doc_exact_dups"] = f"""
        WITH documents_h AS ({_HOSTILE_SQL})
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
               count(*) AS n_docs,
               min(doc_id) AS keep_id
        FROM documents_h
        GROUP BY 1
    """
    _sh = (
        f"list_distinct(CASE WHEN len({_WORDS_SQL}) >= 3 THEN "
        f"list_transform(generate_series(1, len({_WORDS_SQL}) - 2), "
        f"i -> {_WORDS_SQL}[i] || ' ' || {_WORDS_SQL}[i+1] || ' ' || {_WORDS_SQL}[i+2]) "
        f"ELSE [] END)"
    )
    # Kirsch-Mitzenmacher family (dedup_text.minhash_agg): ONE md5 per
    # shingle → two 60-bit hex halves mod M=2^31-1 → h_i = (h1 + i*h2) mod M;
    # identical integer arithmetic in both engines, -1 sentinel for
    # shingle-less docs
    q["doc_minhash"] = f"""
        WITH s AS (SELECT doc_id, {_sh} AS sh FROM documents),
        hp AS (
            SELECT doc_id,
                   list_transform(sh, x ->
                       CAST(('0x' || substr(md5(x), 1, 15))::UBIGINT % 2147483647 AS BIGINT)) AS h1s,
                   list_transform(sh, x ->
                       CAST(('0x' || substr(md5(x), 17, 15))::UBIGINT % 2147483647 AS BIGINT)) AS h2s
            FROM s
        ),
        sig AS (
            SELECT doc_id,
                   list_transform(generate_series(0, 15),
                     i -> CASE WHEN len(h1s) > 0
                               THEN list_min(list_transform(list_zip(h1s, h2s),
                                      p -> (p[1] + i * p[2]) % 2147483647))
                               ELSE -1 END) AS mh
            FROM hp
        )
        SELECT doc_id,
               md5(list_aggregate(list_transform(mh, x -> CAST(x AS VARCHAR)),
                                  'string_agg', '|')) AS sig_hash
        FROM sig
    """
    q["doc_jaccard_pairs"] = f"""
        WITH s AS (SELECT doc_id, {_sh} AS sh FROM documents WHERE doc_id < 40)
        SELECT a.doc_id AS a, b.doc_id AS b,
               round(CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
                 THEN len(list_intersect(a.sh, b.sh)) /
                      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                 ELSE 0.0 END, 6) AS jaccard_r
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        ORDER BY CASE WHEN len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) > 0
                 THEN len(list_intersect(a.sh, b.sh)) /
                      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                 ELSE 0.0 END DESC, a.doc_id ASC, b.doc_id ASC
        LIMIT 20
    """
    # independent recomputation of connected components: transitive closure
    # by recursive CTE (no pointer jumping, no label propagation) over the
    # same chained exact-dup edges, then min-reachable-node per source
    q["doc_dup_groups"] = f"""
        WITH RECURSIVE documents_h AS ({_HOSTILE_SQL}),
        fps AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents_h
        ),
        prs AS (
            SELECT a, b FROM (
                SELECT doc_id AS a,
                       lead(doc_id) OVER (PARTITION BY fp ORDER BY doc_id) AS b
                FROM fps
            ) WHERE b IS NOT NULL
        ),
        edges AS (
            SELECT a AS src, b AS dst FROM prs
            UNION
            SELECT b AS src, a AS dst FROM prs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc_id, least(src, min(dst)) AS group_id
        FROM reach
        GROUP BY src
        ORDER BY doc_id
    """
    # leakage-safe split: components via the same recursive transitive-closure
    # CTE as doc_dup_groups, representative = coalesce(group_id, doc_id), then
    # the identical md5 ppm rule (hash_sample) on the representative string
    q["doc_leak_split"] = f"""
        WITH RECURSIVE documents_h AS ({_HOSTILE_SQL}),
        fps AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents_h
        ),
        prs AS (
            SELECT a, b FROM (
                SELECT doc_id AS a,
                       lead(doc_id) OVER (PARTITION BY fp ORDER BY doc_id) AS b
                FROM fps
            ) WHERE b IS NOT NULL
        ),
        edges AS (
            SELECT a AS src, b AS dst FROM prs
            UNION
            SELECT b AS src, a AS dst FROM prs
        ),
        reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        comp AS (
            SELECT src AS doc_id, least(src, min(dst)) AS group_id
            FROM reach
            GROUP BY src
        ),
        rep AS (
            SELECT f.doc_id,
                   COALESCE(CAST(c.group_id AS VARCHAR),
                            CAST(f.doc_id AS VARCHAR)) AS rep_id
            FROM fps f LEFT JOIN comp c ON f.doc_id = c.doc_id
        )
        SELECT doc_id, rep_id,
               CASE WHEN ('0x' || substr(md5(rep_id || 'gate'), 1, 15))::UBIGINT
                         % 1000000 < 300000
                    THEN 'eval' ELSE 'train' END AS split
        FROM rep
        ORDER BY doc_id
    """
    # temperature sampling: the whole fit is replayed — BIGINT s/Z, the
    # parenthesization-pinned IEEE threshold, and the md5 ppm membership
    q["doc_temp_sample"] = """
        WITH s AS (
            SELECT doc_id,
                   CASE WHEN doc_id = 0 THEN 'D'
                        WHEN doc_id % 10 < 6 THEN 'A'
                        WHEN doc_id % 10 < 9 THEN 'B'
                        ELSE 'C' END AS stratum
            FROM documents
        ),
        cnt AS (SELECT stratum, COUNT(*) AS n FROM s GROUP BY stratum),
        sc AS (
            SELECT stratum, n,
                   CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS sv
            FROM cnt
        ),
        z AS (SELECT SUM(sv) AS zz FROM sc),
        th AS (
            SELECT stratum,
                   least(CAST(1000000 AS BIGINT),
                         CAST(floor((((300.0 * CAST(sv AS DOUBLE))
                                      / CAST(zz AS DOUBLE))
                                     / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
                   ) AS keep_ppm
            FROM sc CROSS JOIN z
        )
        SELECT s.doc_id, s.stratum, th.keep_ppm
        FROM s JOIN th ON s.stratum = th.stratum
        WHERE ('0x' || substr(md5(CAST(s.doc_id AS VARCHAR) || 'temp'), 1, 15))::UBIGINT
              % 1000000 < th.keep_ppm
        ORDER BY s.doc_id
    """
    # token ids: VALUES computed by the INDEPENDENT maximal-munch twin
    # (_tokenize_twin) over the same committed vocab the kernel loads
    _tok_rows = []
    for _pid, _ptext in _TOKENIZE_PROBES:
        _tids = _tokenize_twin(_ptext)
        _json = "[" + ",".join(map(str, _tids)) + "]"  # matches Spark to_json bytes
        _tok_rows.append(
            f"(CAST({_pid} AS INTEGER), '{_json}', CAST({len(_tids)} AS INTEGER))"
        )
    q["doc_token_ids"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(_tok_rows)
        + ") AS t(probe_id, token_ids_json, n_tokens) ORDER BY probe_id"
    )
    q["doc_sample"] = """
        SELECT doc_id, CAST(doc_id % 3 AS INT) AS stratum
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'gate'), 1, 15))::UBIGINT
              % 1000000
              < CASE doc_id % 3 WHEN 0 THEN 1000000 WHEN 1 THEN 500000 ELSE 100000 END
        ORDER BY doc_id
    """
    # paragraph dedup: winners recomputed via a row_number window (the engine
    # uses a skew-safe min-struct agg + join); corpus derivation mirrors
    # _docs_paras exactly
    q["doc_para_dedup"] = f"""
        WITH paras_src AS (
            SELECT doc_id,
                   substr(text, 1, 80) AS p1,
                   CASE WHEN doc_id % 4 = 0 THEN '{_BOILER_NAV}'
                        ELSE substr(text, 81, 80) END AS p2,
                   CASE WHEN doc_id % 6 = 0 THEN '{_BOILER_FOOT}'
                        ELSE substr(text, 161, 80) END AS p3
            FROM documents
        ),
        pl AS (
            SELECT doc_id, 0 AS pidx, p1 AS para FROM paras_src
            UNION ALL SELECT doc_id, 1, p2 FROM paras_src
            UNION ALL SELECT doc_id, 2, p3 FROM paras_src
        ),
        keyed AS (
            SELECT doc_id, pidx, para,
                   md5(trim(regexp_replace(lower(para), '\\s+', ' ', 'g'))) AS pkey
            FROM pl WHERE trim(para) <> ''
        ),
        win AS (
            SELECT *, row_number() OVER (PARTITION BY pkey ORDER BY doc_id, pidx) AS rn
            FROM keyed
        ),
        agg AS (
            SELECT doc_id,
                   CAST(count(*) AS INT) AS n_paras,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
                   string_agg(CASE WHEN rn = 1 THEN para END,
                              chr(10) || chr(10) ORDER BY pidx) AS text2
            FROM win GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.text2, '') AS text,
               coalesce(a.n_paras, 0) AS n_paras,
               coalesce(a.n_kept, 0) AS n_kept
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
    """
    # exact substring dedup: the oracle recomputes window winners via a
    # row_number window (engine: min-struct agg + join) and the interval
    # merge via the classic islands cumulative-max window. Corpus derivation
    # mirrors _docs_substr exactly (concat_ws skips NULL branches in both
    # engines).
    _SUBSTR_CTES = f"""
        src AS (
            SELECT doc_id,
                   concat_ws(' ',
                       CASE WHEN doc_id % 7 = 0 THEN '{_SHARED_B}' END,
                       text,
                       CASE WHEN doc_id % 11 = 0 THEN substr(text, 1, 60) END,
                       CASE WHEN doc_id % 3 = 0 THEN '{_SHARED_A}' END) AS text
            FROM documents
        ),
        toks AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM src),
        starts AS (
            SELECT doc_id, unnest(range(0, len(ws) - 11)) AS start
            FROM toks WHERE len(ws) >= 12
        ),
        occ AS (
            SELECT s.doc_id, s.start,
                   md5(array_to_string(t.ws[s.start + 1 : s.start + 12], ' ')) AS h
            FROM starts s JOIN toks t USING (doc_id)
        ),
        win AS (
            SELECT doc_id, start,
                   row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
            FROM occ
        ),
        dup AS (SELECT doc_id, start, start + 12 AS e FROM win WHERE rn > 1),
        m AS (
            SELECT doc_id, start, e,
                   max(e) OVER (PARTITION BY doc_id ORDER BY start
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
            FROM dup
        ),
        isl AS (
            SELECT doc_id, start, e,
                   sum(CASE WHEN pme IS NULL OR start > pme THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY start
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
            FROM m
        ),
        spans AS (
            SELECT doc_id, min(start) AS s, max(e) AS e2
            FROM isl GROUP BY doc_id, island
        )
    """
    q["doc_substr_spans"] = f"""
        WITH {_SUBSTR_CTES}
        SELECT doc_id, CAST(s AS INT) AS span_start, CAST(e2 AS INT) AS span_end,
               CAST(e2 - s AS INT) AS n_words
        FROM spans ORDER BY doc_id, span_start
    """
    q["doc_substr_dedup"] = f"""
        WITH {_SUBSTR_CTES},
        widx AS (
            SELECT doc_id, unnest(range(0, len(ws))) AS j, ws
            FROM toks WHERE len(ws) > 0
        ),
        w2 AS (SELECT doc_id, j, ws[j + 1] AS w FROM widx),
        dropws AS (
            SELECT DISTINCT w2.doc_id, w2.j
            FROM w2 JOIN spans USING (doc_id)
            WHERE w2.j >= spans.s AND w2.j < spans.e2
        ),
        keptagg AS (
            SELECT doc_id, string_agg(w, ' ' ORDER BY j) AS text2
            FROM (SELECT * FROM w2 ANTI JOIN dropws USING (doc_id, j))
            GROUP BY doc_id
        ),
        dupmass AS (SELECT doc_id, sum(e2 - s) AS ndup FROM spans GROUP BY doc_id)
        SELECT t.doc_id,
               coalesce(k.text2, '') AS text,
               CAST(len(t.ws) AS INT) AS n_words,
               CAST(coalesce(d.ndup, 0) AS INT) AS n_dup_words,
               CASE WHEN len(t.ws) > 0 THEN coalesce(d.ndup, 0) / len(t.ws)
                    ELSE 0.0 END AS dup_frac
        FROM toks t
        LEFT JOIN keptagg k USING (doc_id)
        LEFT JOIN dupmass d USING (doc_id)
        ORDER BY t.doc_id
    """
    # quantized classifier inference: integer margins are exact in both
    # engines; pseudo-weights derived from the bucket id so the oracle can
    # rebuild the model without a fixture
    q["doc_classifier_score"] = f"""
        WITH wts AS (
            SELECT i AS bucket, (i * 2654435761) % 2001 - 1000 AS w
            FROM range(512) t(i)
        ),
        toks AS (SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents),
        bk AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(word || 'clf'), 1, 15))::UBIGINT % 512
                        AS BIGINT) AS bucket
            FROM toks
        ),
        cnts AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk GROUP BY doc_id, bucket),
        dots AS (
            SELECT c.doc_id, sum(c.cnt * w.w) AS dot
            FROM cnts c JOIN wts w USING (bucket) GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(t.dot, 0) + 37 AS BIGINT) AS margin_e6,
               CAST(CASE WHEN coalesce(t.dot, 0) + 37 > 0 THEN 1 ELSE 0 END AS INT) AS label
        FROM documents d LEFT JOIN dots t USING (doc_id)
        ORDER BY d.doc_id
    """
    _SKEW_SRC_SQL = (
        "SELECT doc_id, CASE WHEN doc_id % 5 <> 0 THEN 'hub.example' "
        "ELSE source END AS source FROM documents"
    )
    q["doc_domain_cap"] = f"""
        WITH d AS ({_SKEW_SRC_SQL}),
        b AS (
            SELECT doc_id, source,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'cap'), 1, 15))::UBIGINT
                       % 1000000 AS bkt
            FROM d
        )
        SELECT doc_id, source FROM (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source ORDER BY bkt, doc_id) AS rn
            FROM b
        ) WHERE rn <= 10
        ORDER BY doc_id
    """
    q["doc_domain_rebalance"] = f"""
        WITH d AS ({_SKEW_SRC_SQL}),
        c AS (SELECT source, count(*) AS n FROM d GROUP BY source)
        SELECT doc_id, d.source
        FROM d JOIN c USING (source)
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'rb'), 1, 15))::UBIGINT
              % 1000000
              < least(1000000, CAST(floor(15 * 1000000.0 / n) AS BIGINT))
        ORDER BY doc_id
    """
    q["doc_top_terms"] = f"""
        WITH w AS (SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
        dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
        n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
        s AS (
            SELECT doc_id, term, tf, df_docs,
                   round(tf * ln((nd + 1.0) / (df_docs + 1.0)), 6) AS score
            FROM tf JOIN dfq USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df_docs, score, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
            FROM s
        ) WHERE rank <= 3
        ORDER BY doc_id, rank
    """
    _DELTA_SQL = f"""
            SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
            UNION ALL
            SELECT doc_id + 2000000, text || '{_DELTA_NEAR_TAIL}'
            FROM documents WHERE doc_id % 9 = 0
            UNION ALL
            SELECT doc_id + 3000000, substr(text, 1, 40) || '{_DELTA_FRESH_TAIL}'
            FROM documents WHERE doc_id % 11 = 0
    """
    _FP = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    q["doc_delta_exact"] = f"""
        WITH newdocs AS ({_DELTA_SQL}),
        idx AS (
            SELECT {_FP} AS fp, min(doc_id) AS keep_id
            FROM documents WHERE text IS NOT NULL GROUP BY 1
        )
        SELECT n.doc_id, i.keep_id AS dup_of
        FROM (SELECT doc_id, {_FP} AS fp FROM newdocs WHERE text IS NOT NULL) n
        JOIN idx i USING (fp)
        ORDER BY n.doc_id
    """

    # bloom-pruned admission is EXACT (sketch has no false negatives and
    # maybes are join-verified), so its oracle is the plain anti-join —
    # NULL-fp (NULL-text) delta docs are always admitted
    q["doc_delta_bloom"] = f"""
        WITH newdocs AS ({_DELTA_SQL}),
        idx AS (
            SELECT DISTINCT {_FP} AS fp
            FROM documents WHERE text IS NOT NULL
        )
        SELECT n.doc_id
        FROM (SELECT doc_id, {_FP} AS fp FROM newdocs) n
        LEFT JOIN idx i ON n.fp = i.fp
        WHERE i.fp IS NULL
        ORDER BY n.doc_id
    """

    # delta near-dup: replay the engine's exact algorithm — KM double-hash
    # MinHash, 4-band LSH keys on each side, band-key equi-join, exact
    # shingle-Jaccard verify, best match per new doc
    def _band_union(sig_cte: str) -> str:
        parts = []
        for b in range(4):
            cols = " || '|' || ".join(
                f"CAST(mh[{b * 4 + j + 1}] AS VARCHAR)" for j in range(4)
            )
            parts.append(
                f"SELECT doc_id, {b} AS band, md5({cols}) AS key "
                f"FROM {sig_cte} WHERE mh[1] <> -1"
            )
        return " UNION ALL ".join(parts)

    _KM_HASHES = """
            SELECT doc_id, sh,
                   list_transform(sh, x ->
                       CAST(('0x' || substr(md5(x), 1, 15))::UBIGINT % 2147483647 AS BIGINT)) AS h1s,
                   list_transform(sh, x ->
                       CAST(('0x' || substr(md5(x), 17, 15))::UBIGINT % 2147483647 AS BIGINT)) AS h2s
    """
    _SIG = """
            SELECT doc_id, sh,
                   list_transform(generate_series(0, 15),
                     i -> CASE WHEN len(h1s) > 0
                               THEN list_min(list_transform(list_zip(h1s, h2s),
                                      p -> (p[1] + i * p[2]) % 2147483647))
                               ELSE -1 END) AS mh
    """
    q["doc_delta_near"] = f"""
        WITH newdocs AS ({_DELTA_SQL}),
        s_o AS (SELECT doc_id, {_sh} AS sh FROM documents),
        s_n AS (SELECT doc_id, {_sh} AS sh FROM newdocs),
        hp_o AS ({_KM_HASHES} FROM s_o),
        hp_n AS ({_KM_HASHES} FROM s_n),
        sig_o AS ({_SIG} FROM hp_o),
        sig_n AS ({_SIG} FROM hp_n),
        bk_o AS ({_band_union("sig_o")}),
        bk_n AS ({_band_union("sig_n")}),
        cands AS (
            SELECT DISTINCT n.doc_id AS a, o.doc_id AS b
            FROM bk_n n JOIN bk_o o USING (band, key)
        ),
        jac AS (
            SELECT c.a, c.b,
                   CASE WHEN len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) > 0
                        THEN len(list_intersect(sa.sh, sb.sh)) /
                             (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
                        ELSE 0.0 END AS j
            FROM cands c
            JOIN s_n sa ON sa.doc_id = c.a
            JOIN s_o sb ON sb.doc_id = c.b
        )
        SELECT a AS doc_id, b AS dup_of, round(j, 6) AS jaccard
        FROM (
            SELECT *, row_number() OVER (PARTITION BY a ORDER BY j DESC, b ASC) AS rn
            FROM jac WHERE j >= 0.8
        )
        WHERE rn = 1
        ORDER BY doc_id
    """
    q["doc_lm_score"] = f"""
        WITH documents_h AS ({_HOSTILE_SQL}),
        w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents_h),
        bg AS (
            SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
            FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 1)) AS i FROM w)
        ),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
        v AS (
            SELECT count(DISTINCT t) AS v
            FROM (SELECT unnest(ws) AS t FROM w)
        ),
        sc AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(ln((c12 + 1) / (c1 + v))), 6) AS lm_score
            FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(s.n_bigrams, 0) AS INT) AS n_bigrams,
               s.lm_score
        FROM documents_h d LEFT JOIN sc s USING (doc_id)
        ORDER BY d.doc_id
    """
    q["doc_pack"] = """
        WITH t AS (
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))
                       AS n_tokens,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'pack'), 1, 15))::UBIGINT
                        % 1000000 % 8 AS INT) AS pack_group
            FROM documents
        )
        SELECT doc_id, n_tokens, pack_group,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id)
                           - n_tokens) / 512.0) AS INT) AS shard_seq
        FROM t
        ORDER BY doc_id
    """
    # DSIR twins (sparkdoc/selection.py): the same hashed-ngram bucket model,
    # integer micro-unit log-ratios, BIGINT weight sums and md5-Gumbel keys,
    # replayed end-to-end in SQL. Shared CTE chain for both entries.
    _dsir_cte = f"""
        w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
        uni AS (SELECT doc_id, 'u:' || unnest(ws) AS f FROM w),
        bi AS (
            SELECT doc_id, 'b:' || ws[i] || ' ' || ws[i + 1] AS f
            FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws) - 1)) AS i FROM w)
        ),
        feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        fb AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(f || 'dsir'), 1, 15))::UBIGINT
                        % 256 AS BIGINT) AS bucket
            FROM feats
        ),
        cnts AS (SELECT doc_id, bucket, count(*) AS cnt
                 FROM fb GROUP BY doc_id, bucket),
        tc AS (SELECT bucket, sum(cnt) AS t_cnt FROM cnts
               WHERE doc_id % 17 = 0 GROUP BY bucket),
        rc AS (SELECT bucket, sum(cnt) AS r_cnt FROM cnts GROUP BY bucket),
        spine AS (SELECT unnest(generate_series(0, 255)) AS bucket),
        m AS (
            SELECT spine.bucket,
                   coalesce(t_cnt, 0) AS t_cnt, coalesce(r_cnt, 0) AS r_cnt
            FROM spine LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
        ),
        tot AS (SELECT sum(t_cnt) AS tt, sum(r_cnt) AS rt FROM m),
        model AS (
            SELECT bucket, CAST(t_cnt AS BIGINT) AS t_cnt,
                   CAST(r_cnt AS BIGINT) AS r_cnt,
                   CAST(round((ln((t_cnt + 1.0) / (tt + 256.0))
                             - ln((r_cnt + 1.0) / (rt + 256.0))) * 1000000)
                        AS BIGINT) AS lr_e6
            FROM m CROSS JOIN tot
        )
    """
    q["doc_dsir_model"] = f"""
        WITH {_dsir_cte}
        SELECT bucket, t_cnt, r_cnt, lr_e6 FROM model ORDER BY bucket
    """
    q["doc_dsir_select"] = f"""
        WITH {_dsir_cte},
        wts AS (
            SELECT c.doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats,
                   CAST(sum(cnt * lr_e6) AS BIGINT) AS logw_e6
            FROM cnts c JOIN model USING (bucket) GROUP BY c.doc_id
        ),
        g AS (
            SELECT doc_id,
                   CAST(round(-ln(-ln(
                       ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 15))::UBIGINT
                         % 2147483647) + 1) / 2147483649.0)) * 1000000)
                        AS BIGINT) AS gumbel_e6
            FROM documents
        ),
        sel AS (
            SELECT doc_id, n_feats, logw_e6, gumbel_e6,
                   logw_e6 + gumbel_e6 AS score_e6
            FROM wts JOIN g USING (doc_id)
            WHERE n_feats > 0
        )
        SELECT CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS INT)
                   AS rank,
               doc_id, n_feats, logw_e6, gumbel_e6,
               CAST(score_e6 AS BIGINT) AS score_e6
        FROM sel
        ORDER BY score_e6 DESC, doc_id
        LIMIT 50
    """
    # heavy hitters: the oracle is the EXACT frequent-terms query — the
    # engine's MG sketch must match it exactly (recall-complete candidates +
    # exact verify counts + integer threshold)
    q["doc_heavy_hitters"] = f"""
        WITH w AS (SELECT unnest({_WORDS_SQL}) AS item FROM documents),
        n AS (SELECT count(*) AS n FROM w)
        SELECT item, cnt FROM (
            SELECT item, count(*) AS cnt FROM w GROUP BY item
        ) CROSS JOIN n
        WHERE cnt * 31 > n
        ORDER BY item
    """
    # URL canonicalization twins (_docs_urls / urlops.canonical_url): the
    # urls_src CTE builds byte-identical synthetic URLs; the canon ladder
    # mirrors urlops.canonical_url step for step (DuckDB backrefs are \1
    # where Spark's are $1 — same RE2-class patterns).
    _urls_canon_sql = """
        urls_src AS (
            SELECT doc_id,
                   (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END)
                   || (CASE WHEN doc_id % 3 = 0
                            THEN 'Site' || CAST(doc_id % 40 AS VARCHAR) || '.COM'
                            ELSE 'site' || CAST(doc_id % 40 AS VARCHAR) || '.com' END)
                   || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END)
                   || '/Page/' || CAST(doc_id % 25 AS VARCHAR)
                   || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
                   || (CASE WHEN doc_id % 2 = 0
                            THEN '?b=2&a=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_source=s'
                            ELSE '?a=' || CAST(doc_id % 10 AS VARCHAR) || '&b=2' END)
                   || (CASE WHEN doc_id % 7 = 0 THEN '#sec' ELSE '' END) AS url
            FROM documents
        ),
        u1 AS (SELECT doc_id, url, trim(regexp_replace(trim(url), '#.*$', '')) AS u FROM urls_src),
        u2 AS (
            SELECT *, regexp_extract(u, '^([^?]*)', 1) AS base,
                   CASE WHEN contains(u, '?') THEN regexp_replace(u, '^[^?]*\\?', '')
                        ELSE '' END AS query
            FROM u1
        ),
        u3 AS (
            SELECT *,
                   regexp_replace(regexp_replace(
                       lower(regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)),
                       '^(http://.*):80$', '\\1'), '^(https://.*):443$', '\\1') AS auth,
                   regexp_replace(regexp_replace(base,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', ''), '/+$', '') AS path,
                   array_to_string(list_sort(list_filter(string_split(query, '&'),
                       p -> p <> '' AND NOT starts_with(p, 'utm_')
                            AND regexp_extract(p, '^([^=]*)', 1) NOT IN
                                ('fbclid','gclid','msclkid','mc_cid','mc_eid','igshid','ref')
                   )), '&') AS qcanon
            FROM u2
        ),
        url_canon_t AS (
            SELECT doc_id, url,
                   CASE WHEN auth = '' THEN u
                        ELSE auth || path ||
                             CASE WHEN qcanon <> '' THEN '?' || qcanon ELSE '' END
                   END AS url_canon
            FROM u3
        )
    """
    q["doc_url_canon"] = f"""
        WITH {_urls_canon_sql}
        SELECT doc_id, url, url_canon FROM url_canon_t ORDER BY doc_id
    """
    q["doc_url_dups"] = f"""
        WITH {_urls_canon_sql}
        SELECT url_canon,
               min(doc_id) AS keep_id,
               count(*) AS n_rows,
               count(DISTINCT url) AS n_spellings
        FROM url_canon_t
        GROUP BY url_canon
        ORDER BY url_canon
    """
    # Mojibake repair twin (_doc_fix_encoding): the replace chain is
    # generated from the SAME MOJIBAKE_TABLE data constant the engine uses
    # (the table itself is unit-pinned against the real cp1252/utf-8 codecs
    # in tests/test_mojibake.py) — 2 passes, order-preserving.
    from sparkdoc.textops import MOJIBAKE_TABLE

    # DuckDB binds at most 128 nested expressions, so the 2x-pass replace
    # chain is staged through CTEs of <=40 replaces each
    _steps = [(b, g) for _ in range(2) for b, g in MOJIBAKE_TABLE]
    _fix_ctes, _prev, _i = [], "text", 0
    while _steps:
        _chunk, _steps = _steps[:40], _steps[40:]
        _e = _prev if _i else "text"
        for _bad, _good in _chunk:
            _e = f"replace({_e}, '{_bad}', '{_good}')"
        _i += 1
        _fix_ctes.append(
            f"fx{_i} AS (SELECT doc_id, text, {_e} AS t FROM {'moj' if _i == 1 else f'fx{_i-1}'})"
        )
        _prev = "t"
    q["doc_fix_encoding"] = f"""
        WITH moj AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0 THEN '{_MOJ_SNIP}' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0 THEN '{_MOJ_SNIP2}' ELSE '' END
                   AS text
            FROM documents
        ),
        {', '.join(_fix_ctes)}
        SELECT doc_id, text, t AS text_fixed,
               CASE WHEN text IS DISTINCT FROM t THEN 1 ELSE 0 END AS had_mojibake
        FROM fx{_i} ORDER BY doc_id
    """
    # HTML-ingest pin: flatten_html over the seeded messy-HTML corpus must
    # land on the closed-form block plan the renderer was authored from
    # (synth.expected_html_spans — never touches the parser or the engine).
    import hashlib as _hl

    from sparkdoc.synth import expected_html_spans as _html_expected

    _hrows = []
    for _s in _html_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _hrows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["html_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_hrows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # the fused zero-shuffle path must land on the SAME closed-form plan
    q["html_fused_pinned"] = q["html_extract_pinned"]
    # Markdown first mile, same construction: VALUES from the authored plan
    from sparkdoc.synth import expected_md_spans as _md_expected

    _mrows = []
    for _s in _md_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _mrows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["md_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_mrows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    q["md_generic_pinned"] = q["md_extract_pinned"]
    # PDF first mile, same construction (multi-page: includes page_break
    # rows, furniture kinds, node-order-derived picture media_refs)
    from sparkdoc.synth import expected_pdf_spans as _pdf_expected

    _prows = []
    for _s in _pdf_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _prows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["pdf_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_prows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # DOCX first mile, same construction
    from sparkdoc.synth import expected_docx_spans as _docx_expected

    _xrows = []
    for _s in _docx_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _xrows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["docx_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_xrows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # DoclingDocument JSON first mile, same construction
    from sparkdoc.synth import expected_docling_json_spans as _dlj_expected

    _jrows = []
    for _s in _dlj_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _jrows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["dljson_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_jrows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # XLSX first mile, same construction
    from sparkdoc.synth import expected_xlsx_spans as _xlsx_expected

    _sxrows = []
    for _s in _xlsx_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _sxrows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["xlsx_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_sxrows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # PPTX first mile, same construction
    from sparkdoc.synth import expected_pptx_spans as _pptx_expected

    _pxrows = []
    for _s in _pptx_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _pxrows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["pptx_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_pxrows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # AsciiDoc first mile, same construction
    from sparkdoc.synth import expected_adoc_spans as _adoc_expected

    _adrows = []
    for _s in _adoc_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _adrows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["adoc_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_adrows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # WebVTT first mile, same construction
    from sparkdoc.synth import expected_vtt_spans as _vtt_expected

    _vtrows = []
    for _s in _vtt_expected(24, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _vtrows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["vtt_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_vtrows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # JATS / USPTO / METS first miles, same construction as the rows above
    # (one loop so the row shape cannot drift between them)
    from sparkdoc.synth import (
        expected_jats_spans as _jats_expected,
        expected_mets_spans as _mets_expected,
        expected_uspto_spans as _uspto_expected,
    )

    for _gate, _expected_fn in (
        ("jats_extract_pinned", _jats_expected),
        ("uspto_extract_pinned", _uspto_expected),
        ("mets_extract_pinned", _mets_expected),
    ):
        _rows = []
        for _s in _expected_fn(24, SYNTH_SEED):
            _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
            _d = _s["doc_id"].replace("'", "''")
            _mr = _s["media_ref"].replace("'", "''")
            _rows.append(
                f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')"
            )
        q[_gate] = (
            'SELECT * FROM (VALUES '
            + ", ".join(_rows)
            + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
        )
    # Mixed-format ingest, same construction: the VALUES plan composes the
    # SAME per-format closed-form restatements the per-format gates pin.
    from sparkdoc.synth import expected_mixed_formats as _mix_fmt_expected
    from sparkdoc.synth import expected_mixed_spans as _mix_expected

    _mixrows = []
    for _s in _mix_expected(52, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _mixrows.append(
            f"('{_d}', '{_s['fmt']}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')"
        )
    q["mixed_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_mixrows)
        + ') AS t(doc_id, fmt, "offset", kind, text_md5, media_ref)'
    )
    _mfrows = []
    for _s in _mix_fmt_expected(52, SYNTH_SEED):
        _d = _s["doc_id"].replace("'", "''")
        _mfrows.append(f"('{_d}', '{_s['fmt']}', {_s['n_spans']})")
    q["mixed_formats_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_mfrows)
        + ') AS t(doc_id, fmt, n_spans)'
    )
    # WARC container ingest, same construction (mixed closed forms re-keyed
    # to container-derived doc_ids)
    from sparkdoc.synth import expected_warc_spans as _warc_expected

    _wrows = []
    for _s in _warc_expected(6, SYNTH_SEED):
        _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
        _d = _s["doc_id"].replace("'", "''")
        _mr = _s["media_ref"].replace("'", "''")
        _wrows.append(
            f"('{_d}', '{_s['fmt']}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')"
        )
    q["warc_extract_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_wrows)
        + ') AS t(doc_id, fmt, "offset", kind, text_md5, media_ref)'
    )
    # URL admission truth table (authored verdicts; kernel never reads them)
    from sparkdoc.synth import URL_ADMISSION_CASES as _url_cases

    _urows = []
    for _i, (_u, _ips, _a, _r) in enumerate(_url_cases):
        _urows.append(f"({_i}, {_a}, '{(_r or '')}')")
    q["url_admission"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_urows)
        + ') AS t(case_id, admitted, reject_reason)'
    )
    # Boilerpipe NumWordsRulesClassifier twin: identical derived node table
    # (per-doc word windows + deterministic n_links), identical published
    # decision tree, restated in SQL with lag/lead neighbours.
    q["doc_boilerplate"] = r"""
        WITH d AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text || ' ' || text || ' ' || text), '\s+') AS ws,
                   CAST(doc_id % 20 + 6 AS INT) AS sz
            FROM documents
        ),
        chunks AS (
            SELECT doc_id,
                   CAST(i + 1 AS INT) AS node_id,
                   array_to_string(ws[i * sz + 1 : i * sz + sz], ' ') AS sent
            FROM d, unnest(generate_series(0, CAST(ceil(len(ws) / CAST(sz AS DOUBLE)) AS INT) - 1)) AS t(i)
        ),
        nodes AS (
            SELECT doc_id, node_id, sent,
                   length(sent) AS n_chars,
                   CASE WHEN node_id % 4 = 0 THEN CAST(floor(length(sent) * 4 / 5) AS INT)
                        WHEN node_id % 7 = 0 THEN CAST(floor(length(sent) / 2) AS INT)
                        ELSE 0 END AS n_links
            FROM chunks
        ),
        feats AS (
            SELECT doc_id, node_id,
                   CASE WHEN trim(sent) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(sent), '\s+')) END AS words,
                   CASE WHEN n_chars > 0 THEN CAST(n_links AS DOUBLE) / n_chars ELSE 0.0 END AS link_density
            FROM nodes
        ),
        nbr AS (
            SELECT doc_id, node_id, words, link_density,
                   coalesce(lag(words) OVER w, 0) AS prev_words,
                   coalesce(lead(words) OVER w, 0) AS next_words,
                   coalesce(lag(link_density) OVER w, 0.0) AS prev_link_density
            FROM feats
            WINDOW w AS (PARTITION BY doc_id ORDER BY node_id)
        )
        SELECT doc_id, node_id, words,
               round(link_density, 6) AS link_density,
               CASE WHEN link_density <= 0.333333 THEN
                      CASE WHEN prev_link_density <= 0.555556 THEN
                             CASE WHEN words > 16 OR next_words > 15 OR prev_words > 4 THEN 1 ELSE 0 END
                           ELSE
                             CASE WHEN words > 40 OR next_words > 17 THEN 1 ELSE 0 END
                      END
                    ELSE 0 END AS is_content
        FROM nbr ORDER BY doc_id, node_id
    """
    # Closed-form twin of the REAL PCM WAV decoder (see media_decode note):
    # clip i (i%4=3 → 8-bit quantized, else 16-bit) with formula samples.
    q["media_audio_decode"] = """
        WITH clips AS (
            SELECT CAST(i AS INT) AS i,
                   CAST(20 + i % 13 AS BIGINT) AS frames,
                   CAST(1 + i % 3 AS INT) AS channels,
                   CAST(8000 * (1 + i % 3) AS INT) AS rate
            FROM range(0, 30) t(i)),
        samp1 AS (
            SELECT i, frames, channels, rate,
                   unnest(generate_series(0, frames - 1)) AS t
            FROM clips),
        samp AS (
            SELECT i, frames, channels, rate, t,
                   CAST(c AS BIGINT) AS c,
                   CASE WHEN i % 4 = 3
                        THEN ((5 * t + 3 * c + i) % 256 - 128) * 256
                        ELSE ((5 * t + 3 * c + i) * 2641) % 65536 - 32768
                   END AS s
            FROM (SELECT *, unnest(generate_series(0, CAST(channels AS BIGINT) - 1)) AS c
                  FROM samp1))
        SELECT 'aud' || lpad(CAST(i AS VARCHAR), 4, '0') AS doc_id,
               '#/audio/' || CAST(i AS VARCHAR) AS media_ref,
               1 AS decoded, rate AS sample_rate, frames AS n_frames, channels,
               CAST(frames * 1000 // rate AS BIGINT) AS duration_ms,
               CAST(sum(s) AS BIGINT) AS sum_s,
               CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
               CAST(sum((t * channels + c) * s) AS BIGINT) AS wsum_s
        FROM samp GROUP BY i, frames, channels, rate
        ORDER BY doc_id
    """
    # Closed-form twin of the REAL Y4M decoder: every-2nd-frame sampling,
    # ts from the true fps, per-frame luma sums from the generating formula.
    q["media_video_decode"] = """
        WITH clips AS (
            SELECT CAST(i AS INT) AS i,
                   CAST(3 + i % 4 AS BIGINT) AS nf,
                   CAST(4 + (i % 3) * 2 AS INT) AS w,
                   CAST(4 + (i % 2) * 2 AS INT) AS h,
                   CAST(10 + i % 5 AS BIGINT) AS fps
            FROM range(0, 20) t(i)),
        fr AS (
            SELECT i, w, h, fps,
                   unnest(generate_series(0, nf - 1, 2)) AS f
            FROM clips),
        px1 AS (
            SELECT i, w, h, fps, f,
                   unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
            FROM fr),
        px AS (
            SELECT i, w, h, fps, f, x,
                   unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
            FROM px1),
        vals AS (
            SELECT i, w, h, fps, f, x, y,
                   (3 * x + 5 * y + 7 * f + i) % 256 AS yv
            FROM px)
        SELECT 'vid' || lpad(CAST(i AS VARCHAR), 4, '0') AS doc_id,
               '#/video/' || CAST(i AS VARCHAR) AS media_ref,
               1 AS decoded, CAST(f AS INT) AS frame_index,
               CAST(f * 1000 // fps AS BIGINT) AS ts_ms,
               w AS width, h AS height,
               CAST(sum(yv) AS BIGINT) AS sum_y,
               CAST(sum((y * w + x) * yv) AS BIGINT) AS wsum_y
        FROM vals GROUP BY i, w, h, fps, f
        ORDER BY doc_id, frame_index
    """
    # Table-cell twins: the oracle constructs the expected grid directly
    # from the word formulas (no string splitting on its side).
    _TBL_W = ", ".join(
        "coalesce(nullif(regexp_replace(lower(split_part(text, ' ', {i})), '[^a-z]', '', 'g'), ''), '{fb}') AS tw{i}".format(
            i=i + 1,
            fb=["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta", "iota"][i],
        )
        for i in range(9)
    )
    _tbl_rows = []
    for r in range(3):
        for c in range(3):
            sel = (
                f"SELECT doc_id, {r} AS row_idx, {c} AS col_idx, tw{3 * r + c + 1} AS cell FROM tw"
            )
            if r == 2 and c == 2:
                sel += " WHERE doc_id % 3 <> 0"
            _tbl_rows.append(sel)
    q["doc_table_cells"] = f"""
        WITH tw AS (SELECT doc_id, {_TBL_W} FROM documents)
        {' UNION ALL '.join(_tbl_rows)}
        ORDER BY doc_id, row_idx, col_idx
    """
    q["doc_table_shapes"] = """
        SELECT doc_id,
               CAST(3 AS BIGINT) AS n_rows,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 9 END AS BIGINT) AS n_cells,
               CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 3 END AS min_cols,
               3 AS max_cols,
               CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS is_ragged
        FROM documents ORDER BY doc_id
    """
    # Trained-BPE twins: doc_bpe_fit replays the whole training loop in SQL
    # (generated CTE chain — pair zip, argmax, 7-pass fuse per iteration);
    # encode/tokens apply the committed merge list via the identical
    # replace chain the engine uses.
    q["doc_bpe_fit"] = _bpe_fit_oracle_sql(8, 7)
    _bpe_e = _bpe_encode_expr(_BPE_MERGES, 7)
    q["doc_bpe_encode"] = f"""
        WITH enc AS (
            SELECT word, cnt, {_bpe_e} AS e FROM {_bpe_sql_words()} )
        SELECT word, cnt, trim(e) AS tokens_str,
               CAST(len(string_split(trim(e), ' ')) AS INT) AS n_tokens
        FROM enc ORDER BY word
    """
    q["doc_bpe_tokens"] = f"""
        WITH words AS (
            SELECT doc_id, word FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
                FROM documents)
            WHERE length(word) > 0),
        enc AS (
            SELECT word, CAST(len(string_split(trim({_bpe_e}), ' ')) AS BIGINT) AS n_tokens
            FROM (SELECT DISTINCT word FROM words))
        SELECT w.doc_id, CAST(sum(e.n_tokens) AS BIGINT) AS bpe_tokens,
               count(*) AS bpe_words
        FROM words w JOIN enc e USING (word)
        GROUP BY w.doc_id ORDER BY w.doc_id
    """
    # Vocabulary-sketch twin (_doc_vocab_sketch): DuckDB verifies the exact
    # per-source distinct-word count and asserts the HLL tolerance held
    # (within_tol literal 1 — a drifting estimate fails the value hash).
    q["doc_vocab_sketch"] = f"""
        WITH w AS (SELECT source, unnest({_WORDS_SQL}) AS w FROM documents)
        SELECT source, count(DISTINCT w) AS n_distinct, 1 AS within_tol
        FROM w GROUP BY source ORDER BY source
    """
    # Host/registrable-domain twin (_doc_url_domain / urlops.url_host +
    # registered_domain): the two-level-suffix predicate is generated from
    # the SAME TWO_LEVEL_SUFFIXES constant the engine uses.
    from sparkdoc.urlops import TWO_LEVEL_SUFFIXES

    _suf_pred = " OR ".join(
        f"host LIKE '%.{s}' OR host = '{s}'" for s in TWO_LEVEL_SUFFIXES
    )
    q["doc_url_domain"] = f"""
        WITH urls2 AS (
            SELECT doc_id,
                   'http://'
                   || (CASE WHEN doc_id % 7 = 0 THEN 'User@' ELSE '' END)
                   || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
                   || (CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END)
                   || 'Site' || CAST(doc_id % 30 AS VARCHAR)
                   || (CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.Com' END)
                   || (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END)
                   || '/p/' || CAST(doc_id % 10 AS VARCHAR) AS url
            FROM documents
        ),
        hosts AS (
            SELECT doc_id, url,
                   regexp_replace(regexp_replace(
                       lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)),
                       '^[^@]*@', ''), ':[0-9]*$', '') AS host
            FROM urls2
        ),
        doms AS (
            SELECT *, string_split(host, '.') AS labels,
                   CASE WHEN {_suf_pred} THEN 3 ELSE 2 END AS keep
            FROM hosts
        )
        SELECT doc_id, url, host,
               CASE WHEN len(labels) <= keep THEN host
                    ELSE array_to_string(labels[(len(labels) - keep + 1):], '.')
               END AS domain
        FROM doms ORDER BY doc_id
    """
    q["doc_segments"] = f"""
        WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents)
        SELECT doc_id,
               CAST(i AS INT) AS offset,
               'text' AS kind,
               array_to_string(ws[(i*24+1):(i*24+24)], ' ') AS seg_text
        FROM w, LATERAL unnest(generate_series(0, CAST(floor((len(ws)-1)/24) AS BIGINT))) AS t(i)
        WHERE len(ws) > 0
    """
    q["doc_fold_phrase"] = """
        SELECT doc_id,
               trim(regexp_replace(lower(strip_accents(text)), '\\s+', ' ', 'g')) AS folded,
               CASE WHEN len(regexp_extract_all(lower(strip_accents(text)), '[a-z0-9]+')) > 0
                    THEN '_' || array_to_string(regexp_extract_all(lower(strip_accents(text)), '[a-z0-9]+'), '_') || '_'
                    ELSE '' END AS pkey
        FROM documents WHERE doc_id < 100
    """
    q["doc_digit_sig"] = """
        SELECT event_id,
               array_to_string(regexp_extract_all(coalesce(props, ''), '[0-9]+'), '-') AS digit_sig
        FROM events
    """
    q["doc_contract"] = rf"""
        WITH documents_s AS ({_SIZED_SQL}),
        c AS (
            SELECT doc_id,
                   length(regexp_replace(regexp_replace(text, '(?s)<!\[CDATA\[(.*?)\]\]>', '\1', 'g'), '<[^>]+>', '', 'g')) AS cc
            FROM documents_s
        )
        SELECT doc_id,
               CASE WHEN (CAST(ceil(cc / 4) AS BIGINT) + 8192 <= 128000) AND cc <= 32768
                    THEN 'direct' ELSE 'dense' END AS contract,
               CAST(ceil(cc / 4) AS BIGINT) AS est_tokens
        FROM c
    """
    q["doc_format_resolution"] = rf"""
        WITH documents_s AS ({_SIZED_SQL}),
        c AS (
            SELECT doc_id,
                   length(regexp_replace(regexp_replace(text, '(?s)<!\[CDATA\[(.*?)\]\]>', '\1', 'g'), '<[^>]+>', '', 'g')) AS cc
            FROM documents_s
        )
        SELECT doc_id,
               CASE WHEN (CAST(ceil(cc / 4) AS BIGINT) + 8192 <= 128000) AND cc <= 32768
                    THEN 'direct' ELSE 'dense' END AS contract,
               CASE WHEN (CAST(ceil(cc / 4) AS BIGINT) + 8192 <= 128000) AND cc <= 32768
                    THEN 'doclang-geo' ELSE 'doclang' END AS llm_format
        FROM c
    """
    q["graph_merge"] = """
        SELECT 'N' || CAST(doc_id AS VARCHAR) AS node_id,
               'a' || CAST(doc_id % 3 AS VARCHAR) AS a,
               'b' || CAST(doc_id % 2 AS VARCHAR) AS b,
               CASE WHEN doc_id % 2 = 1 THEN 'c' END AS c,
               CAST((CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END)
                  + (CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_conflicts
        FROM documents
    """
    q["doc_salvage"] = """
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 1 THEN 'USD' ELSE 'OTHER' END AS currency_out,
               CASE WHEN doc_id % 7 = 0 THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS valid,
               CASE WHEN doc_id % 3 = 0 THEN CAST(2 AS BIGINT)
                    WHEN doc_id % 3 = 2 THEN CAST(1 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS salvage_passes
        FROM documents
    """
    q["source_stats_salted"] = """
        SELECT source,
               count(doc_id) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY source
    """
    q["doc_simhash_sig"] = """
        WITH words AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w <> '')) AS w
            FROM documents
        ), h AS (
            SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS hv FROM words
        ), bits AS (
            SELECT doc_id, b AS bit,
                   sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM h, (SELECT unnest(generate_series(0, 63)) AS b)
            GROUP BY doc_id, b
        ), sim AS (
            SELECT doc_id,
                   sum(CASE WHEN v > 0 THEN CAST(1::UBIGINT << bit AS HUGEINT) ELSE 0 END) AS u
            FROM bits GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(s.u - CASE WHEN s.u >= 9223372036854775808
                                        THEN 18446744073709551616 ELSE 0 END, 0) AS BIGINT) AS simhash
        FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
    """
    # anchor-scan twin: distinct-value containment join, escape retry,
    # numeric/length guards, >6-chunk distinctiveness drop, [start,end).
    # Shared between doc_anchor_scan and doc_ledger.
    _anchor_cte = """docs AS (SELECT doc_id, text FROM documents),
        chunks AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS chunk_id,
                   lower(substr(text, CAST((i-1)*120 + 1 AS BIGINT), 120)) AS lt
            FROM docs, LATERAL (SELECT unnest(generate_series(
                1, greatest(CAST(ceil(length(text)/120.0) AS BIGINT), 1))) AS i)
        ),
        vals AS (
            SELECT doc_id, node_id, field, value, lower(value) AS lv FROM (
                SELECT doc_id, 'N1' AS node_id, 'code' AS field, split_part(text, ' ', 1) AS value FROM docs
                UNION ALL SELECT doc_id, 'N1', 'name', split_part(text, ' ', 5) FROM docs
                UNION ALL SELECT doc_id, 'N2', 'code', split_part(text, ' ', 2) FROM docs
            )
            WHERE value IS NOT NULL AND length(value) >= 3
              AND NOT (regexp_matches(value, '^[0-9]+$') AND length(value) < 4)
        ),
        dv AS (
            SELECT DISTINCT doc_id, lv,
                   lower(replace(replace(replace(lv, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')) AS le
            FROM vals
        ),
        hits AS (
            SELECT doc_id, lv, chunk_id,
                   CASE WHEN pos_raw > 0 THEN pos_raw ELSE pos_esc END AS pos,
                   CASE WHEN pos_raw > 0 THEN length(lv) ELSE length(le) END AS len
            FROM (
                SELECT d.doc_id, d.lv, d.le, c.chunk_id,
                       strpos(c.lt, d.lv) AS pos_raw, strpos(c.lt, d.le) AS pos_esc
                FROM dv d JOIN chunks c ON d.doc_id = c.doc_id
            ) WHERE pos_raw > 0 OR pos_esc > 0
        ),
        fanned AS (
            SELECT v.doc_id, v.node_id, v.field, v.value, h.chunk_id,
                   CAST(h.pos - 1 AS INT) AS start,
                   CAST(h.pos - 1 + h.len AS INT) AS "end",
                   count(*) OVER (PARTITION BY v.doc_id, v.node_id, v.field) AS n
            FROM vals v JOIN hits h ON v.doc_id = h.doc_id AND v.lv = h.lv
        ),
        anchor_rows AS (
            SELECT doc_id, node_id, field, value, chunk_id, start, "end"
            FROM fanned WHERE n <= 6
        )"""
    q["doc_anchor_scan"] = f"""
        WITH {_anchor_cte}
        SELECT doc_id, node_id, field, value, chunk_id, start, "end" FROM anchor_rows
    """
    # ledger twin: verbatim anchors sorted (chunk_id, span) capped at 8,
    # observed fallback at declared chunk_ids for nodes with no verbatim hit;
    # idx pins anchor order inside the capped list.
    q["doc_ledger"] = f"""
        WITH {_anchor_cte},
        nodes AS (
            SELECT doc_id, 'N1' AS node_id, 'a[]' AS path, 0 AS chunk0 FROM docs
            UNION ALL SELECT doc_id, 'N2', 'b[]', 1 FROM docs
        ),
        verb AS (
            SELECT doc_id, node_id, CAST(rn - 1 AS INT) AS idx, chunk_id,
                   'verbatim' AS kind, start AS s, "end" AS e
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id, node_id ORDER BY chunk_id, start, "end") AS rn
                FROM anchor_rows
            ) WHERE rn <= 8
        ),
        obs AS (
            SELECT n.doc_id, n.node_id, 0 AS idx, n.chunk0 AS chunk_id,
                   'observed' AS kind, 0 AS s, 0 AS e
            FROM nodes n
            WHERE NOT EXISTS (
                SELECT 1 FROM verb v WHERE v.doc_id = n.doc_id AND v.node_id = n.node_id
            )
        )
        SELECT n.doc_id, n.node_id AS identity_key, n.path, a.idx, a.chunk_id, a.kind, a.s, a.e
        FROM nodes n JOIN (
            SELECT doc_id, node_id, idx, chunk_id, kind, s, e FROM verb
            UNION ALL SELECT doc_id, node_id, idx, chunk_id, kind, s, e FROM obs
        ) a ON n.doc_id = a.doc_id AND n.node_id = a.node_id
    """
    # north-rule pin: the golden extractor (pure Python, independent of the
    # Spark pipeline) generates the expected span rows as a VALUES literal.
    import hashlib as _hl

    from sparkdoc.golden import extract_corpus_golden as _gold
    from sparkdoc.synth import synth_corpus as _synthc

    _rows = []
    for _did, _spans in _gold(_synthc(24, SYNTH_SEED)).items():
        for _s in _spans:
            _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
            _d = _did.replace("'", "''")
            _mr = _s["media_ref"].replace("'", "''")
            _rows.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["extract_spans_pinned"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_rows)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # DocLang roundtrip (serialize → parse) must land on the SAME golden
    # span sequences — one independent oracle pins both directions.
    q["doclang_roundtrip"] = q["extract_spans_pinned"]
    # chunker drift pin: committed golden_chunks fixture → VALUES literal.
    import gzip as _gz
    import json as _js
    import os as _os

    _fx = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                        "tests", "fixtures", "golden_chunks_seed42_n32.json.gz")
    with _gz.open(_fx, "rt") as _f:
        _chunk_rows = []
        for _r in _js.load(_f):
            (_cd, _cid, _bi, _tx, _tc, _pg, _refs, _hd, _th, _cl, _ro) = _r
            _tmd5 = _hl.md5(_tx.encode("utf-8")).hexdigest()
            _pages = ",".join(str(x) for x in _js.loads(_pg))
            _hmd5 = _hl.md5("\x1f".join(_js.loads(_hd)).encode("utf-8")).hexdigest()
            _chunk_rows.append(
                f"('{_cd}', {_cid}, {_bi}, '{_tmd5}', {_tc}, '{_pages}', '{_hmd5}', '{_th}', {_cl}, {_ro})"
            )
    q["chunks_pinned"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(_chunk_rows)
        + ") AS t(doc_id, chunk_id, batch_index, text_md5, token_count, pages, headings_md5, text_hash, char_length, resplit_of)"
    )
    # ---- r5 rows-only → oracle-exact conversions -------------------------
    # (1) extract_spans over the FULL SYNTH_DOCS gate corpus: the same
    # independent golden-extractor VALUES as extract_spans_pinned, at scale.
    _gold_full = _gold(_synthc(SYNTH_DOCS, SYNTH_SEED))
    _rows_full = []
    for _did, _spans in _gold_full.items():
        _d = _did.replace("'", "''")
        for _s in _spans:
            _md5 = _hl.md5(_s["text"].encode("utf-8")).hexdigest()
            _mr = _s["media_ref"].replace("'", "''")
            _rows_full.append(f"('{_d}', {_s['offset']}, '{_s['kind']}', '{_md5}', '{_mr}')")
    q["extract_spans"] = (
        'SELECT * FROM (VALUES '
        + ", ".join(_rows_full)
        + ') AS t(doc_id, "offset", kind, text_md5, media_ref)'
    )
    # (2) page_markdowns: INDEPENDENT Python twin of the page split
    # (_page_no_col: a page_break opens the following page), the per-kind
    # markdown rendering, and the '\n\n' join — over the same golden spans.
    _pm_rows = []
    for _did, _spans in _gold_full.items():
        _d = _did.replace("'", "''")
        _page = 1
        _pages: dict[int, list[str]] = {}
        for _s in sorted(_spans, key=lambda s: s["offset"]):
            if _s["kind"] == "page_break":
                _page += 1
                continue
            if _s["kind"] == "furniture":
                continue
            if _s["kind"] == "picture":
                _md = "![" + _s["media_ref"] + "]"
            elif _s["kind"] == "caption":
                _md = "*" + _s["text"] + "*"
            else:
                _md = _s["text"]
            _pages.setdefault(_page, []).append(_md)
        for _pno, _mds in _pages.items():
            _m = _hl.md5("\n\n".join(_mds).encode("utf-8")).hexdigest()
            _pm_rows.append(f"('{_d}', {_pno}, '{_m}')")
    q["page_markdowns"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(_pm_rows)
        + ") AS t(doc_id, page_no, md_md5)"
    )
    # (3) domain_stats_salted: the salted two-phase agg must equal the plain
    # per-domain rollup of the golden extractor's span counts.
    _dstats: dict[str, list[int]] = {}
    for _did, _spans in _gold_full.items():
        _dom = _did.split("-", 1)[0]
        _st = _dstats.setdefault(_dom, [0, 0, 0])
        _st[0] += 1
        _st[1] += len(_spans)
        _st[2] = max(_st[2], len(_spans))
    q["domain_stats_salted"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"('{_dom}', {_st[0]}, {_st[1]}, {_st[2]})"
            for _dom, _st in sorted(_dstats.items())
        )
        + ") AS t(domain, n_docs, total_spans, max_spans)"
    )
    # (4-6) chunk_documents / provenance_ledger / chunk_owner: committed
    # drift-pin fixtures over the full gate corpus (the chunks_pinned model
    # extended — regenerate deliberately via scripts/regen_goldens.py when
    # the chunking/ledger spec changes). Until a fixture exists the gate
    # simply stays rows-only.

    def _values_from_rows_fixture(fname: str, colspec: str):
        _p = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "tests", "fixtures", fname)
        if not _os.path.exists(_p):
            return None
        with _gz.open(_p, "rt") as _f:
            _rows = _js.load(_f)

        def _lit(v):
            if v is None:
                return "NULL"
            if isinstance(v, str):
                return "'" + v.replace("'", "''") + "'"
            return str(v)

        return (
            "SELECT * FROM (VALUES "
            + ", ".join("(" + ", ".join(_lit(c) for c in _r) + ")" for _r in _rows)
            + f") AS t({colspec})"
        )

    for _gate, _fx_name, _cols in [
        (
            "chunk_documents",
            f"golden_chunks_main_seed{SYNTH_SEED}_n{SYNTH_DOCS}.json.gz",
            "doc_id, chunk_id, batch_index, text_md5, token_count, pages, "
            "headings_md5, text_hash, char_length, resplit_of",
        ),
        (
            "provenance_ledger",
            f"golden_ledger_main_seed{SYNTH_SEED}_n{SYNTH_DOCS}.json.gz",
            "doc_id, identity_key, path, ids_md5, anchors_md5",
        ),
        (
            "chunk_owner",
            f"golden_chunk_owner_main_seed{SYNTH_SEED}_n{SYNTH_DOCS}.json.gz",
            "doc_id, chunk_id, owner_id, owner_kind",
        ),
    ]:
        _sqlq = _values_from_rows_fixture(_fx_name, _cols)
        if _sqlq:
            q[_gate] = _sqlq
    # graph pipeline pins: committed graph fixtures → VALUES literal (attrs
    # canonicalized as sorted k=v '|'-join, md5). ONE encoder for both pins —
    # graph_pinned and template_graph_pinned must never drift apart.
    def _graph_values_from_fixture(fname):
        _p = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "tests", "fixtures", fname)
        with _gz.open(_p, "rt") as _f:
            _data = _js.load(_f)
        _rows = []
        for _nid, _gdoc, _cls, _lbl, _attrs_json in _data["nodes"]:
            _attrs = _js.loads(_attrs_json)
            _amd5 = _hl.md5(
                "|".join(f"{k}={v}" for k, v in sorted(_attrs.items())).encode("utf-8")
            ).hexdigest()
            _lbl_esc = _lbl.replace("'", "''")
            _rows.append(f"('node', '{_nid}', '{_gdoc}', '{_cls}', '{_lbl_esc}', '{_amd5}')")
        for _src, _dst, _elbl in _data["edges"]:
            _rows.append(f"('edge', '{_src}', '{_dst}', '{_elbl}', '', '')")
        return (
            "SELECT * FROM (VALUES "
            + ", ".join(_rows)
            + ") AS t(kind, a, b, c, d, payload_md5)"
        )

    q["graph_pinned"] = _graph_values_from_fixture("golden_graph_seed42_n32.json.gz")
    # Pydantic-template acceptance pin (same node/edge encoding).
    q["template_graph_pinned"] = _graph_values_from_fixture(
        "golden_invoice_seed42_n12.json.gz"
    )
    # ledger pipeline pin: committed golden_ledger fixture → VALUES literal.
    _lfx = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "tests", "fixtures", "golden_ledger_seed42_n32.json.gz")
    with _gz.open(_lfx, "rt") as _f:
        _ldata = _js.load(_f)
    _lrows = []
    for _ldoc, _lkey, _lpath, _lids_json, _lanch_json in _ldata:
        _lids = _js.loads(_lids_json)
        _imd5 = _hl.md5(
            "|".join(f"{k}={v}" for k, v in sorted(_lids.items())).encode("utf-8")
        ).hexdigest()
        _anch = _js.loads(_lanch_json)
        _amd5 = _hl.md5(
            "|".join(f"{c}:{k}:{sp[0]}-{sp[1]}" for c, k, sp in _anch).encode("utf-8")
        ).hexdigest()
        _lrows.append(f"('{_ldoc}', '{_lkey}', '{_lpath}', '{_imd5}', '{_amd5}')")
    q["ledger_pinned"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(_lrows)
        + ") AS t(doc_id, identity_key, path, ids_md5, anchors_md5)"
    )
    # fill-phase / one-to-one / media pins from committed fixtures.
    def _values_from_fixture(fname, cols, quote_idx):
        _p = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           "tests", "fixtures", fname)
        with _gz.open(_p, "rt") as _f:
            _data = _js.load(_f)
        _out = []
        for _row in _data:
            _vals = []
            for _i, _v in enumerate(_row):
                if _i in quote_idx:
                    _vals.append("'" + str(_v).replace("'", "''") + "'")
                else:
                    _vals.append(str(_v))
            _out.append("(" + ", ".join(_vals) + ")")
        return "SELECT * FROM (VALUES " + ", ".join(_out) + ") AS t(" + ", ".join(cols) + ")"

    q["fill_pinned"] = _values_from_fixture(
        "golden_fill_seed42_n64.json.gz",
        ["doc_id", "path", "class", "node_id", "fill_batch", "ids_enc", "fields_enc", "chunks_enc"],
        {0, 1, 2, 3, 5, 6, 7},
    )
    q["one_to_one_pinned"] = _values_from_fixture(
        "golden_onetoone_seed42_n64.json.gz",
        ["doc_id", "path", "class", "node_id", "fill_batch", "page_no", "ids_enc", "fields_enc", "chunks_enc"],
        {0, 1, 2, 3, 6, 7, 8},
    )
    q["media_features"] = _values_from_fixture(
        "golden_media_seed42_n200.json.gz",
        ["media_ref", "doc_id", "sha256", "n_bytes", "width", "height"],
        {0, 1, 2},
    )
    # Closed-form twin of the REAL image decoder: pixel values come from an
    # arithmetic formula, so the oracle recomputes every statistic over a
    # generate_series grid without touching any container bytes. PGM images
    # (i%5=4) are grayscale: all three channels equal the r-formula.
    q["media_decode"] = """
        WITH imgs AS (
            SELECT CAST(i AS INT) AS i,
                   CAST(5 + i % 6 AS INT) AS w,
                   CAST(4 + i % 7 AS INT) AS h
            FROM range(0, 40) t(i)),
        px1 AS (
            SELECT i, w, h,
                   unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
            FROM imgs),
        px AS (
            SELECT i, w, h, x,
                   unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
            FROM px1),
        vals AS (
            SELECT i, w, h, x, y,
                   (7 * x + 13 * y + i) % 256 AS r,
                   CASE WHEN i % 5 = 4 THEN (7 * x + 13 * y + i) % 256
                        ELSE (3 * x + 5 * y + 2 * i) % 251 END AS g,
                   CASE WHEN i % 5 = 4 THEN (7 * x + 13 * y + i) % 256
                        ELSE (11 * x + 17 * y + 3 * i) % 241 END AS b
            FROM px)
        SELECT 'img' || lpad(CAST(i AS VARCHAR), 4, '0') AS doc_id,
               '#/pictures/' || CAST(i AS VARCHAR) AS media_ref,
               1 AS decoded, w AS width, h AS height,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(sum(g) AS BIGINT) AS sum_g,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum((y * w + x) * ((77 * r + 150 * g + 29 * b) // 256)) AS BIGINT) AS wsum_luma
        FROM vals GROUP BY i, w, h
        ORDER BY doc_id
    """
    # Closed-form twin of the REAL PNG decoder (DEFLATE + unfilter + color-
    # type expansion): same formula-pixel trick as media_decode. Gray color
    # types (i%5 in (2,3)) collapse all channels to the r-formula; palette
    # images (i%5=4) go through the index formula p=(x+2y+i)%64 into the
    # formula-built PLTE; alpha (types 4/6) never appears — a decoder that
    # keeps it would shift every sum.
    q["media_png_decode"] = """
        WITH imgs AS (
            SELECT CAST(i AS INT) AS i,
                   CAST(5 + i % 6 AS INT) AS w,
                   CAST(4 + i % 7 AS INT) AS h
            FROM range(0, 40) t(i)),
        px1 AS (
            SELECT i, w, h,
                   unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
            FROM imgs),
        px AS (
            SELECT i, w, h, x,
                   unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
            FROM px1),
        vals AS (
            SELECT i, w, h, x, y,
                   CASE WHEN i % 5 = 4 THEN (7 * ((x + 2 * y + i) % 64) + i) % 256
                        ELSE (7 * x + 13 * y + i) % 256 END AS r,
                   CASE WHEN i % 5 IN (2, 3) THEN (7 * x + 13 * y + i) % 256
                        WHEN i % 5 = 4 THEN (3 * ((x + 2 * y + i) % 64) + 2 * i) % 251
                        ELSE (3 * x + 5 * y + 2 * i) % 251 END AS g,
                   CASE WHEN i % 5 IN (2, 3) THEN (7 * x + 13 * y + i) % 256
                        WHEN i % 5 = 4 THEN (11 * ((x + 2 * y + i) % 64) + 3 * i) % 241
                        ELSE (11 * x + 17 * y + 3 * i) % 241 END AS b
            FROM px)
        SELECT 'png' || lpad(CAST(i AS VARCHAR), 4, '0') AS doc_id,
               '#/pictures/' || CAST(i AS VARCHAR) AS media_ref,
               1 AS decoded, w AS width, h AS height,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(sum(g) AS BIGINT) AS sum_g,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum((y * w + x) * ((77 * r + 150 * g + 29 * b) // 256)) AS BIGINT) AS wsum_luma
        FROM vals GROUP BY i, w, h
        ORDER BY doc_id
    """
    # Closed-form twin of the REAL GIF decoder (LZW + interlace + palette):
    # every synth GIF is palette-indexed with the same index/palette
    # formulas as the PNG type-3 branch, and the four container shapes
    # (i%4: LZW/uncompressed × sequential/interlaced) all decode to the
    # SAME pixels — so one formula covers the whole rotation.
    q["media_gif_decode"] = """
        WITH imgs AS (
            SELECT CAST(i AS INT) AS i,
                   CAST(5 + i % 6 AS INT) AS w,
                   CAST(4 + i % 7 AS INT) AS h
            FROM range(0, 40) t(i)),
        px1 AS (
            SELECT i, w, h,
                   unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
            FROM imgs),
        px AS (
            SELECT i, w, h, x,
                   unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
            FROM px1),
        vals AS (
            SELECT i, w, h, x, y,
                   (7 * ((x + 2 * y + i) % 64) + i) % 256 AS r,
                   (3 * ((x + 2 * y + i) % 64) + 2 * i) % 251 AS g,
                   (11 * ((x + 2 * y + i) % 64) + 3 * i) % 241 AS b
            FROM px)
        SELECT 'gif' || lpad(CAST(i AS VARCHAR), 4, '0') AS doc_id,
               '#/pictures/' || CAST(i AS VARCHAR) AS media_ref,
               1 AS decoded, w AS width, h AS height,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(sum(g) AS BIGINT) AS sum_g,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum((y * w + x) * ((77 * r + 150 * g + 29 * b) // 256)) AS BIGINT) AS wsum_luma
        FROM vals GROUP BY i, w, h
        ORDER BY doc_id
    """
    # Closed-form twin of the REAL TIFF decoder (IFD both byte orders,
    # strips, PackBits, LZW early-change, predictor 2, WhiteIsZero): same
    # formula-pixel trick — gray container shapes (i%6 in (3,4)) collapse
    # all channels to the r-formula; the other four carry full RGB. The
    # WhiteIsZero kind stores INVERTED samples, so a decoder that skips the
    # re-inversion (or applies it to BlackIsZero) breaks every sum.
    q["media_tiff_decode"] = """
        WITH imgs AS (
            SELECT CAST(i AS INT) AS i,
                   CAST(5 + i % 6 AS INT) AS w,
                   CAST(4 + i % 7 AS INT) AS h
            FROM range(0, 42) t(i)),
        px1 AS (
            SELECT i, w, h,
                   unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
            FROM imgs),
        px AS (
            SELECT i, w, h, x,
                   unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
            FROM px1),
        vals AS (
            SELECT i, w, h, x, y,
                   (7 * x + 13 * y + i) % 256 AS r,
                   CASE WHEN i % 6 IN (3, 4) THEN (7 * x + 13 * y + i) % 256
                        ELSE (3 * x + 5 * y + 2 * i) % 251 END AS g,
                   CASE WHEN i % 6 IN (3, 4) THEN (7 * x + 13 * y + i) % 256
                        ELSE (11 * x + 17 * y + 3 * i) % 241 END AS b
            FROM px)
        SELECT 'tif' || lpad(CAST(i AS VARCHAR), 4, '0') AS doc_id,
               '#/pictures/' || CAST(i AS VARCHAR) AS media_ref,
               1 AS decoded, w AS width, h AS height,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(sum(g) AS BIGINT) AS sum_g,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum((y * w + x) * ((77 * r + 150 * g + 29 * b) // 256)) AS BIGINT) AS wsum_luma
        FROM vals GROUP BY i, w, h
        ORDER BY doc_id
    """
    # WebP-lossless twin: the formula-pixel corpus is shared with the TIFF
    # gate, so the oracle is the same closed-form recomputation (the six
    # rotated VP8L feature shapes must all decode to identical pixels).
    q["media_webp_decode"] = """
        WITH imgs AS (
            SELECT CAST(i AS INT) AS i,
                   CAST(5 + i % 6 AS INT) AS w,
                   CAST(4 + i % 7 AS INT) AS h
            FROM range(0, 42) t(i)),
        px1 AS (
            SELECT i, w, h,
                   unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
            FROM imgs),
        px AS (
            SELECT i, w, h, x,
                   unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
            FROM px1),
        vals AS (
            SELECT i, w, h, x, y,
                   (7 * x + 13 * y + i) % 256 AS r,
                   (3 * x + 5 * y + 2 * i) % 251 AS g,
                   (11 * x + 17 * y + 3 * i) % 241 AS b
            FROM px)
        SELECT 'wbp' || lpad(CAST(i AS VARCHAR), 4, '0') AS doc_id,
               '#/pictures/' || CAST(i AS VARCHAR) AS media_ref,
               1 AS decoded, w AS width, h AS height,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(sum(g) AS BIGINT) AS sum_g,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum((y * w + x) * ((77 * r + 150 * g + 29 * b) // 256)) AS BIGINT) AS wsum_luma
        FROM vals GROUP BY i, w, h
        ORDER BY doc_id
    """
    # Closed-form twin of the REAL baseline-JPEG decoder: flat blocks with
    # the all-8s quant table reconstruct exactly (DC-only), so the oracle
    # replays the codec's fixed floor(x+0.5) YCbCr→RGB conversion over the
    # block formulas. e-notation literals (1.402e0) force DOUBLE arithmetic
    # so DuckDB's float math is bit-identical to the numpy decoder's.
    q["media_jpeg_decode"] = """
        WITH imgs AS (
            SELECT CAST(i AS INT) AS i,
                   CASE WHEN i % 4 = 2 THEN 16 ELSE 8 END AS s,
                   CAST(CASE WHEN i % 4 = 2 THEN 16 * (1 + i % 2)
                             ELSE 8 * (1 + i % 4) END AS INT) AS w,
                   CAST(CASE WHEN i % 4 = 2 THEN 16 * (1 + (i // 4) % 2)
                             ELSE 8 * (1 + i % 3) END AS INT) AS h
            FROM range(0, 40) t(i)),
        px1 AS (
            SELECT i, s, w, h,
                   unnest(generate_series(0, CAST(w AS BIGINT) - 1)) AS x
            FROM imgs),
        px AS (
            SELECT i, s, w, h, x,
                   unnest(generate_series(0, CAST(h AS BIGINT) - 1)) AS y
            FROM px1),
        ycc AS (
            SELECT i, w, h, x, y,
                   (37 * (x // s) + 53 * (y // s) + 11 + i) % 256 AS yy,
                   (29 * (x // s) + 71 * (y // s) + 5 + 2 * i) % 256 AS cb,
                   (41 * (x // s) + 13 * (y // s) + 101 + 3 * i) % 256 AS cr
            FROM px),
        vals AS (
            SELECT i, w, h, x, y,
                   CASE WHEN i % 4 = 0 THEN yy
                        ELSE CAST(least(255e0, greatest(0e0, floor(
                            yy + 1.402e0 * (cr - 128) + 0.5e0))) AS BIGINT)
                   END AS r,
                   CASE WHEN i % 4 = 0 THEN yy
                        ELSE CAST(least(255e0, greatest(0e0, floor(
                            yy - 0.344136e0 * (cb - 128)
                               - 0.714136e0 * (cr - 128) + 0.5e0))) AS BIGINT)
                   END AS g,
                   CASE WHEN i % 4 = 0 THEN yy
                        ELSE CAST(least(255e0, greatest(0e0, floor(
                            yy + 1.772e0 * (cb - 128) + 0.5e0))) AS BIGINT)
                   END AS b
            FROM ycc)
        SELECT 'jpg' || lpad(CAST(i AS VARCHAR), 4, '0') AS doc_id,
               '#/pictures/' || CAST(i AS VARCHAR) AS media_ref,
               1 AS decoded, w AS width, h AS height,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(sum(g) AS BIGINT) AS sum_g,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum((y * w + x) * ((77 * r + 150 * g + 29 * b) // 256)) AS BIGINT) AS wsum_luma
        FROM vals GROUP BY i, w, h
        ORDER BY doc_id
    """
    # progressive-JPEG twin: the SAME images coded as SOF2 multi-scan must
    # decode to the SAME closed-form pixels — only the doc_id prefix
    # differs (the sequential corpus's i%4==3 DRI rotation codes as plain
    # 4:4:4 progressive; restart framing never changes pixels)
    q["media_jpeg_prog_decode"] = q["media_jpeg_decode"].replace("'jpg'", "'jpp'")
    # coverage twin: distinct covered chunks (duplicate anchors collapse),
    # retention = covered / total windows.
    q["doc_coverage"] = """
        WITH n AS (
            SELECT doc_id,
                   greatest(CAST(ceil(length(text)/120.0) AS BIGINT), 1) AS n_chunks
            FROM documents
        )
        SELECT doc_id,
               CAST(n_chunks AS BIGINT) AS n_chunks,
               CAST(least(2, n_chunks) AS BIGINT) AS n_covered,
               least(2, n_chunks) * 1.0 / n_chunks AS coverage
        FROM n
    """
    # coverage-threshold twin: per-chunk WordPiece counts recomputed by the
    # INDEPENDENT maximal-munch tokenizer at oracle-build time (a VALUES
    # table), then the >= 10%-share trigger arithmetic replayed in SQL —
    # doc A sits exactly AT the boundary and must trigger, doc B one token
    # below must not
    _cov_rows = []
    for _d, _c, _n in _COVERAGE_PROBES:
        _cnt = len(_tokenize_twin(" ".join(["the"] * _n)))
        _cov_rows.append(f"('{_d}', CAST({_c} AS INTEGER), CAST({_cnt} AS BIGINT))")
    q["doc_coverage_threshold"] = (
        "WITH ch AS (SELECT * FROM (VALUES "
        + ", ".join(_cov_rows)
        + """) AS t(doc_id, chunk_id, tokens)),
        tot AS (SELECT doc_id, CAST(sum(tokens) AS BIGINT) AS doc_tokens FROM ch GROUP BY doc_id),
        unc AS (
            SELECT doc_id, CAST(sum(tokens) AS BIGINT) AS uncovered_tokens
            FROM ch WHERE chunk_id NOT IN (0, 1) GROUP BY doc_id
        )
        SELECT u.doc_id, u.uncovered_tokens, t.doc_tokens,
               u.uncovered_tokens >= 0.10 * t.doc_tokens AS triggered
        FROM unc u JOIN tot t USING (doc_id)
        ORDER BY doc_id
    """
    )
    # graph-hygiene twin: phantom drop (no meaningful non-meta attr), edge
    # pruning + audit, keywords capped at 5 of 7.
    q["doc_graph_hygiene"] = """
        WITH docs AS (
            SELECT doc_id, CAST(doc_id AS VARCHAR) AS doc,
                   split_part(text, ' ', 1) AS w1,
                   array_to_string(list_slice(string_split(text, ' '), 1, 5), '|') AS kw5
            FROM documents
        )
        SELECT doc_id, 'node' AS kind, doc || '_P1' AS a,
               CAST(NULL AS VARCHAR) AS b, CAST(NULL AS VARCHAR) AS label,
               CAST(NULL AS VARCHAR) AS kw FROM docs
        UNION ALL
        SELECT doc_id, 'node', doc || '_P3', NULL, NULL, kw5 FROM docs
        UNION ALL
        SELECT doc_id, 'edge', doc || '_P1', doc || '_P3', 's', NULL FROM docs
        UNION ALL
        SELECT doc_id, 'audit', doc || '_P1', doc || '_P2', 'r', NULL FROM docs
    """
    # name-normalization twin: possessive drop + split-join-upper, and
    # leading-article strip with the bare-article empty result.
    q["doc_name_norm"] = """
        SELECT doc_id,
               upper(split_part(text, ' ', 1)) || '_' ||
               upper(split_part(text, ' ', 2)) || '_' ||
               upper(split_part(text, ' ', 3)) AS norm_possessive,
               CASE WHEN split_part(text, ' ', 2) IN ('The', 'the', 'A', 'a', 'An', 'an')
                    THEN '' ELSE upper(split_part(text, ' ', 2)) END AS norm_article
        FROM documents
        WHERE length(split_part(text, ' ', 1)) > 0
          AND length(split_part(text, ' ', 2)) > 0
          AND length(split_part(text, ' ', 3)) > 0
    """
    # binder-ladder twin: exact key → unique same-path canonical containment
    # (fuzzy) → verbatim locate with anchor guards → unresolved; per-node
    # bind-kind attribution mirrored through the same guard cascade.
    q["doc_bind_kinds"] = """
        WITH docs AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc, text,
                   split_part(text, ' ', 1) AS w1, split_part(text, ' ', 2) AS w2
            FROM documents
        ),
        wins AS (
            SELECT doc, lower(substr(text, CAST((i-1)*120 + 1 AS BIGINT), 120)) AS wlt
            FROM docs, LATERAL (SELECT unnest(generate_series(
                1, greatest(CAST(ceil(length(text)/120.0) AS BIGINT), 1))) AS i)
        ),
        base AS (
            SELECT d.doc, d.w1, d.w2,
                   regexp_replace(lower(d.w1), '[^a-z0-9]', '', 'g') AS c1,
                   (SELECT count(*) FROM wins w WHERE w.doc = d.doc
                        AND strpos(w.wlt, lower(d.w1 || 'x')) > 0) AS bhits,
                   (SELECT count(*) FROM wins w WHERE w.doc = d.doc
                        AND strpos(w.wlt, lower(d.w2)) > 0) AS chits,
                   (SELECT count(*) FROM wins w WHERE w.doc = d.doc
                        AND strpos(w.wlt, 'zzqq') > 0) AS dhits
            FROM docs d
        )
        SELECT doc AS doc_id, 'K1' AS node_id, 'observed' AS kind_out FROM base
        UNION ALL
        SELECT doc, 'B',
               CASE WHEN length(c1) >= 2 THEN 'fuzzy'
                    WHEN length(w1 || 'x') >= 3
                         AND NOT (regexp_matches(w1 || 'x', '^[0-9]+$') AND length(w1 || 'x') < 4)
                         AND bhits BETWEEN 1 AND 6 THEN 'verbatim'
                    ELSE 'unresolved' END FROM base
        UNION ALL
        SELECT doc, 'C',
               CASE WHEN length(w2) >= 3
                         AND NOT (regexp_matches(w2, '^[0-9]+$') AND length(w2) < 4)
                         AND chits BETWEEN 1 AND 6 THEN 'verbatim'
                    ELSE 'unresolved' END FROM base
        UNION ALL
        SELECT doc, 'D',
               CASE WHEN dhits BETWEEN 1 AND 6 THEN 'verbatim' ELSE 'unresolved' END FROM base
    """
    # content-hash dedup mirror (GLOBAL): group by attr value, min-id
    # survivor, redirect both edge endpoints, drop self-loops, distinct
    # (src, dst, label).
    q["doc_content_dedup"] = """
        WITH docs AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc,
                   split_part(text, ' ', 1) AS w1, split_part(text, ' ', 2) AS w2
            FROM documents
        ),
        nodes0 AS (
            SELECT doc || '_N1' AS node_id, w1 AS val FROM docs
            UNION ALL SELECT doc || '_N2', w2 FROM docs
            UNION ALL SELECT doc || '_N3', w1 FROM docs
        ),
        canon AS (
            SELECT node_id, val, min(node_id) OVER (PARTITION BY val) AS cid FROM nodes0
        ),
        mapping AS (SELECT node_id AS f, cid AS t FROM canon WHERE node_id <> cid),
        edges0 AS (
            SELECT doc || '_N3' AS src, doc || '_N2' AS dst, 'a' AS label FROM docs
            UNION ALL SELECT doc || '_N1', doc || '_N3', 'a' FROM docs
            UNION ALL SELECT doc || '_N2', doc || '_N1', 'r' FROM docs
            UNION ALL SELECT doc || '_N2', doc || '_N3', 'r' FROM docs
        ),
        red AS (
            SELECT coalesce(ms.t, e.src) AS src, coalesce(md.t, e.dst) AS dst, e.label
            FROM edges0 e
            LEFT JOIN mapping ms ON e.src = ms.f
            LEFT JOIN mapping md ON e.dst = md.f
        ),
        clean AS (SELECT DISTINCT src, dst, label FROM red WHERE src <> dst)
        SELECT 'node' AS kind, node_id AS a, CAST(NULL AS VARCHAR) AS b,
               CAST(NULL AS VARCHAR) AS label
        FROM canon WHERE node_id = cid
        UNION ALL SELECT 'edge', src, dst, label FROM clean
    """
    # deep-merge truth table: empty incoming name never overwrites, id-hash
    # entity-list merge (w2==w3 collapses to one item), NON-EMPTY SCALARS
    # OVERWRITE within the merged item (dict_merger.py:152-168, r5 parity
    # fix: the collapsed item's val ends 'z', not first-wins 'x'),
    # sentence-dedup description.
    q["doc_deep_merge"] = """
        SELECT doc_id,
               split_part(text, ' ', 1) AS name_out,
               CASE WHEN split_part(text, ' ', 3) = split_part(text, ' ', 2)
                    THEN 1 ELSE 2 END AS n_items,
               CASE WHEN split_part(text, ' ', 3) = split_part(text, ' ', 2)
                    THEN 'z' ELSE 'x' END AS w2_val,
               'y' AS w2_extra,
               'A. B. C.' AS desc_out
        FROM documents
    """
    # DocLang twin: md5-keyed geo spans → 512-grid quantization (round ==
    # bround here: 612/792 rational grid never hits exact .5) → XML tags →
    # page_break insertion at page transitions → byte-exact dclg strings.
    q["doc_doclang"] = """
        WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        words AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS off, list_extract(ws, i) AS w
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
        ),
        geo AS (
            SELECT doc_id, off, w,
                   1 + off // 20 AS page_no,
                   ['text','heading','table','picture','caption']
                       [CAST(('0x' || substr(md5(doc_id || ':k:' || off), 1, 4))::UBIGINT % 5 AS INT) + 1] AS kind,
                   CAST(('0x' || substr(md5(doc_id || ':l:' || off), 1, 4))::UBIGINT % 400 AS DOUBLE) AS l,
                   CAST(('0x' || substr(md5(doc_id || ':t:' || off), 1, 4))::UBIGINT % 600 AS DOUBLE) AS t,
                   CAST(('0x' || substr(md5(doc_id || ':r:' || off), 1, 4))::UBIGINT % 100 AS DOUBLE) AS dr,
                   CAST(('0x' || substr(md5(doc_id || ':b:' || off), 1, 4))::UBIGINT % 20 AS DOUBLE) AS db
            FROM words WHERE length(w) > 0
        ),
        quant AS (
            SELECT doc_id, off, w, page_no, kind,
                   least(greatest(CAST(round(512 * l / 612) AS INT), 0), 511) AS ql,
                   least(greatest(CAST(round(512 * t / 792) AS INT), 0), 511) AS qt,
                   least(greatest(CAST(round(512 * (l + 50 + dr) / 612) AS INT), 0), 511) AS qr,
                   least(greatest(CAST(round(512 * (t + 10 + db) / 792) AS INT), 0), 511) AS qb
            FROM geo
        ),
        tags AS (
            SELECT doc_id, off, page_no,
                   '<' || kind || ' loc="' || least(ql, qr) || ',' || least(qt, qb) || ','
                       || greatest(ql, qr) || ',' || greatest(qt, qb) || '"'
                       || ' page="' || page_no || '"'
                       || CASE WHEN kind = 'picture' THEN ' ref="m' || off || '"' ELSE '' END
                       || '>' || replace(replace(replace(w, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
                       || '</' || kind || '>' AS tag
            FROM quant
        ),
        seq AS (
            SELECT doc_id, off, tag,
                   CASE WHEN lag(page_no) OVER (PARTITION BY doc_id ORDER BY off) IS NOT NULL
                             AND page_no <> lag(page_no) OVER (PARTITION BY doc_id ORDER BY off)
                        THEN '<page_break/>' || chr(10) || tag ELSE tag END AS tag2
            FROM tags
        )
        SELECT doc_id,
               '<doc>' || chr(10) || string_agg(tag2, chr(10) ORDER BY off) || chr(10) || '</doc>' AS dclg
        FROM seq GROUP BY doc_id
    """
    # skeleton-dedup twin: min_by on first-chunk emission order picks the
    # winning fields; chunk sets union sorted-distinct.
    q["doc_dedup_entities"] = """
        WITH docs AS (
            SELECT doc_id, split_part(text, ' ', 1) AS w1,
                   split_part(text, ' ', 2) AS w2, split_part(text, ' ', 3) AS w3
            FROM documents
        ),
        inst AS (
            SELECT doc_id, 3 AS fc, w1 AS v, [3] AS chunks FROM docs
            UNION ALL SELECT doc_id, 1, w2, [1, 3] FROM docs
            UNION ALL SELECT doc_id, 2147483647, w3, CAST([] AS INT[]) FROM docs
        ),
        win AS (
            SELECT doc_id, min_by(v, fc) AS v,
                   array_to_string(list_sort(list_distinct(flatten(list(chunks)))), ',') AS chunks_str
            FROM inst GROUP BY doc_id
        )
        SELECT doc_id, 'p[]' AS path, 'C' AS class,
               'N_' || doc_id AS node_id, 'nm' AS name_id, v AS v_field, chunks_str
        FROM win
    """
    # ledger-merge twin: strength-max per (chunk, span) with the pinned
    # kind strengths (verbatim 3 > observed 2 > reconciled 1 > derived 0),
    # (chunk_id, kind, span) sort, cap 8, idx pins order.
    q["doc_merge_ledgers"] = """
        WITH docs AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM documents),
        anchors AS (
            SELECT doc_id, 'K' AS identity_key, 'p' AS path, chunk_id, kind, s, e, st FROM (
                SELECT doc_id, 0 AS chunk_id, 'observed' AS kind, 0 AS s, 0 AS e, 2 AS st FROM docs
                UNION ALL SELECT doc_id, 1, 'verbatim', 2, 5, 3 FROM docs
                UNION ALL SELECT doc_id, 0, 'verbatim', 0, 0, 3 FROM docs
                UNION ALL SELECT doc_id, 1, 'observed', 0, 0, 2 FROM docs
                UNION ALL SELECT doc_id, 2, 'derived', 1, 3, 0 FROM docs
            )
        ),
        best AS (
            SELECT doc_id, identity_key, path, chunk_id, s, e, max_by(kind, st) AS kind
            FROM anchors GROUP BY doc_id, identity_key, path, chunk_id, s, e
        ),
        ordered AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id, identity_key, path ORDER BY chunk_id, kind, s, e) AS rn
            FROM best
        )
        SELECT doc_id, identity_key, path, CAST(rn - 1 AS INT) AS idx,
               CAST(chunk_id AS INT) AS chunk_id, kind, CAST(s AS INT) AS s, CAST(e AS INT) AS e
        FROM ordered WHERE rn <= 8
    """
    # graph-stats twin: after clean_edges drops the per-doc duplicate,
    # self-loop, and dangling edges, every metric is count arithmetic over
    # the documents table (ne = even docs carry the Extra node + edge).
    q["doc_graph_stats"] = """
        WITH d AS (
            SELECT count(*) AS n,
                   sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ne
            FROM documents
        )
        SELECT 'n_nodes' AS metric, '' AS key, CAST(2*n + ne AS DOUBLE) AS value FROM d
        UNION ALL SELECT 'n_edges', '', CAST(n + ne AS DOUBLE) FROM d
        UNION ALL SELECT 'nodes_per_class', 'Section', CAST(n AS DOUBLE) FROM d
        UNION ALL SELECT 'nodes_per_class', 'Document', CAST(n AS DOUBLE) FROM d
        UNION ALL SELECT 'nodes_per_class', 'Extra', CAST(ne AS DOUBLE) FROM d
        UNION ALL SELECT 'edges_per_label', 'in_document', CAST(n + ne AS DOUBLE) FROM d
        UNION ALL SELECT 'avg_degree', '', CAST(2*(n + ne) AS DOUBLE) / CAST(2*n + ne AS DOUBLE) FROM d
    """
    # cardinality rank-key twin: per-class global top-k window over
    # (richness desc, weight desc, external in-degree desc, canonical id asc,
    # node_id asc); Y-sourced edges count, X-sourced are root-excluded.
    q["doc_cardinality"] = """
        WITH docs AS (
            SELECT doc_id,
                   split_part(text, ' ', 1) AS w1, split_part(text, ' ', 2) AS w2,
                   split_part(text, ' ', 3) AS w3, split_part(text, ' ', 4) AS w4
            FROM documents
        ),
        xnodes AS (
            SELECT CAST(doc_id AS VARCHAR) || '_X1' AS node_id,
                   (CASE WHEN w1 <> '' THEN 1 ELSE 0 END) + (CASE WHEN w2 <> '' THEN 1 ELSE 0 END) AS rich,
                   1 AS wt, 0 AS ext, regexp_replace(lower(w1), '[^a-z0-9]', '', 'g') AS canon
            FROM docs
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR) || '_X2',
                   CASE WHEN w2 <> '' THEN 1 ELSE 0 END,
                   2, 0, regexp_replace(lower(w2), '[^a-z0-9]', '', 'g')
            FROM docs
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR) || '_X3',
                   CASE WHEN w3 <> '' THEN 1 ELSE 0 END,
                   0, 1, regexp_replace(lower(w3), '[^a-z0-9]', '', 'g')
            FROM docs
        ),
        ranked AS (
            SELECT node_id, 'X' AS node_class,
                   row_number() OVER (ORDER BY rich DESC, wt DESC, ext DESC, canon ASC, node_id ASC) AS rank
            FROM xnodes
        )
        SELECT node_id, node_class, CAST(rank AS INT) AS rank FROM ranked WHERE rank > 600
    """
    # alias-reconciliation twin: canonical containment + digit-signature
    # guard + unique-base-per-superset window + co-occurrence chunk veto.
    q["doc_alias_pairs"] = """
        WITH docs AS (SELECT doc_id, text FROM documents),
        n0 AS (
            SELECT CAST(doc_id AS VARCHAR) || '_' || nid AS node_id, doc_id, label, chunk FROM (
                SELECT doc_id, 'A1' AS nid, split_part(text, ' ', 1) AS label, 0 AS chunk FROM docs
                UNION ALL SELECT doc_id, 'A2',
                    concat_ws(' ', split_part(text, ' ', 1), split_part(text, ' ', 2)), 1 FROM docs
                UNION ALL SELECT doc_id, 'B1', split_part(text, ' ', 3), 2 FROM docs
                UNION ALL SELECT doc_id, 'B2',
                    concat_ws(' ', split_part(text, ' ', 3), split_part(text, ' ', 4)), 2 FROM docs
            )
        ),
        canon AS (
            SELECT *, regexp_replace(lower(coalesce(label, '')), '[^a-z0-9]', '', 'g') AS c,
                   coalesce(array_to_string(regexp_extract_all(coalesce(label, ''), '[0-9]+'), '-'), '') AS sig
            FROM n0
        ),
        pairs AS (
            SELECT b.doc_id, b.node_id AS base_id, b.c AS base_canon,
                   s.node_id AS superset_id, s.c AS superset_canon,
                   b.chunk AS bchunk, s.chunk AS schunk
            FROM canon b JOIN canon s ON b.doc_id = s.doc_id
                 AND b.c <> s.c AND strpos(s.c, b.c) > 0 AND b.sig = s.sig
            WHERE length(b.c) >= 4
        ),
        uniq AS (
            SELECT * FROM (
                SELECT *, count(*) OVER (PARTITION BY superset_id) AS n,
                       count(*) OVER (PARTITION BY base_id) AS nb
                FROM pairs)
            WHERE n = 1 AND nb = 1
        )
        SELECT doc_id, base_id, base_canon, superset_id, superset_canon
        FROM uniq WHERE bchunk <> schunk
    """
    # parent-resolution ladder twin: rung-for-rung SQL mirror of the
    # uniqueness-guarded join cascade + forward-fill as-of rung, including
    # resolved_by attribution. Singleton chunk arrays become scalar equality.
    q["doc_resolve_parents"] = """
        WITH docs AS (SELECT doc_id, text FROM documents),
        parents0 AS (
            SELECT doc_id, node_id, path, label, chunk, emission FROM (
                SELECT doc_id, 'P1' AS node_id, 'secs[]' AS path, split_part(text,' ',1) AS label, 0 AS chunk, 0 AS emission FROM docs
                UNION ALL SELECT doc_id, 'P5', 'secs[]', split_part(text,' ',5), 1, 4 FROM docs
                UNION ALL SELECT doc_id, 'P9', 'secs[]', split_part(text,' ',9), 2, 8 FROM docs
                UNION ALL SELECT doc_id, 'T1', 'tabs[]', split_part(text,' ',3), 0, 2 FROM docs
            ) WHERE label IS NOT NULL AND length(label) > 0
        ),
        p AS (SELECT doc_id, node_id, path, regexp_replace(lower(label), '[^a-z0-9]', '', 'g') AS canon, chunk, emission FROM parents0),
        children0 AS (
            SELECT doc_id, child_id, parent_path, key, chunk, emission FROM (
                SELECT doc_id, 'C1' AS child_id, 'secs[]' AS parent_path, split_part(text,' ',1) AS key, 5 AS chunk, 1 AS emission FROM docs
                UNION ALL SELECT doc_id, 'C2', 'tabs[]', split_part(text,' ',2), 7, 3 FROM docs
                UNION ALL SELECT doc_id, 'C3', 'secs[]', substr(split_part(text,' ',9), 1, 4), 8, 5 FROM docs
                UNION ALL SELECT doc_id, 'C4', 'secs[]', 'zzzz', 2, 6 FROM docs
                UNION ALL SELECT doc_id, 'C5', 'secs[]', 'qqqq', 9, 6 FROM docs
                UNION ALL SELECT doc_id, 'C6', 'none[]', split_part(text,' ',1), 0, 0 FROM docs
            )
        ),
        c0 AS (SELECT doc_id, child_id, parent_path, regexp_replace(lower(key), '[^a-z0-9]', '', 'g') AS canon, chunk, emission FROM children0),
        r1 AS (
            SELECT c.doc_id, c.child_id, min(p.node_id) AS pid
            FROM c0 c JOIN p ON c.doc_id = p.doc_id AND c.parent_path = p.path
                 AND c.canon = p.canon AND length(c.canon) > 0
            GROUP BY c.doc_id, c.child_id HAVING count(DISTINCT p.node_id) = 1
        ),
        s1 AS (SELECT c.*, r1.pid AS pid1 FROM c0 c LEFT JOIN r1 ON c.doc_id = r1.doc_id AND c.child_id = r1.child_id),
        singles AS (
            SELECT doc_id, path, min(node_id) AS pid FROM p GROUP BY doc_id, path HAVING count(*) = 1
        ),
        s2 AS (
            SELECT s1.*, CASE WHEN s1.pid1 IS NULL THEN sg.pid END AS pid2
            FROM s1 LEFT JOIN singles sg ON s1.doc_id = sg.doc_id AND s1.parent_path = sg.path
        ),
        r3 AS (
            SELECT c.doc_id, c.child_id, min(p.node_id) AS pid
            FROM s2 c JOIN p ON c.doc_id = p.doc_id AND c.parent_path = p.path
                 AND strpos(p.canon, c.canon) > 0 AND c.canon <> p.canon
            WHERE c.pid1 IS NULL AND c.pid2 IS NULL AND length(c.canon) >= 4
            GROUP BY c.doc_id, c.child_id HAVING count(DISTINCT p.node_id) = 1
        ),
        s3 AS (SELECT s2.*, r3.pid AS pid3 FROM s2 LEFT JOIN r3 ON s2.doc_id = r3.doc_id AND s2.child_id = r3.child_id),
        r4 AS (
            SELECT c.doc_id, c.child_id, min(p.node_id) AS pid
            FROM s3 c JOIN p ON c.doc_id = p.doc_id AND c.parent_path = p.path AND c.chunk = p.chunk
            WHERE c.pid1 IS NULL AND c.pid2 IS NULL AND c.pid3 IS NULL
            GROUP BY c.doc_id, c.child_id HAVING count(DISTINCT p.node_id) = 1
        ),
        s4 AS (SELECT s3.*, r4.pid AS pid4 FROM s3 LEFT JOIN r4 ON s3.doc_id = r4.doc_id AND s3.child_id = r4.child_id),
        ev AS (
            SELECT doc_id, path AS parent_path, emission, node_id AS pid, NULL AS child_id, 0 AS flag FROM p
            UNION ALL
            SELECT doc_id, parent_path, emission, NULL, child_id, 1 FROM s4
            WHERE pid1 IS NULL AND pid2 IS NULL AND pid3 IS NULL AND pid4 IS NULL
        ),
        filled AS (
            SELECT doc_id, child_id,
                   last_value(pid IGNORE NULLS) OVER (
                       PARTITION BY doc_id, parent_path ORDER BY emission, flag
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastp
            FROM ev
        ),
        r5 AS (SELECT doc_id, child_id, lastp AS pid FROM filled WHERE child_id IS NOT NULL AND lastp IS NOT NULL),
        s5 AS (SELECT s4.*, r5.pid AS pid5 FROM s4 LEFT JOIN r5 ON s4.doc_id = r5.doc_id AND s4.child_id = r5.child_id)
        SELECT doc_id, child_id,
               coalesce(pid1, pid2, pid3, pid4, pid5,
                        'BUCKET_' || doc_id || '_' || parent_path) AS parent_id,
               CASE WHEN pid1 IS NOT NULL THEN 'exact'
                    WHEN pid2 IS NOT NULL THEN 'singleton'
                    WHEN pid3 IS NOT NULL THEN 'containment'
                    WHEN pid4 IS NOT NULL THEN 'co_chunk'
                    WHEN pid5 IS NOT NULL THEN 'adjacent'
                    ELSE 'bucket' END AS resolved_by
        FROM s5
    """
    # chunk-owner ladder twin over derived inputs (120-char chunk windows,
    # word-1/5/9 parents): unique-head → unique-body → forward-carry ≤12.
    q["doc_chunk_owner"] = """
        WITH docs AS (SELECT doc_id, text FROM documents),
        chunks AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS chunk_id,
                   substr(text, CAST((i-1)*120 + 1 AS BIGINT), 120) AS ctext
            FROM docs, LATERAL (SELECT unnest(generate_series(
                1, greatest(CAST(ceil(length(text)/120.0) AS BIGINT), 1))) AS i)
        ),
        parents AS (
            SELECT doc_id, node_id, label FROM (
                SELECT doc_id, 'P1' AS node_id, split_part(text, ' ', 1) AS label FROM docs
                UNION ALL SELECT doc_id, 'P5', split_part(text, ' ', 5) FROM docs
                UNION ALL SELECT doc_id, 'P9', split_part(text, ' ', 9) FROM docs
            ) WHERE label IS NOT NULL AND length(label) > 0
        ),
        ch AS (SELECT doc_id, chunk_id, lower(ctext) AS lt, lower(substr(ctext, 1, 40)) AS head FROM chunks),
        hits AS (
            SELECT doc_id, chunk_id, owner_id, strength FROM (
                SELECT c.doc_id, c.chunk_id, p.node_id AS owner_id,
                       CASE WHEN strpos(c.head, lower(p.label)) > 0 THEN 2
                            WHEN strpos(c.lt, lower(p.label)) > 0 THEN 1
                            ELSE 0 END AS strength
                FROM ch c JOIN parents p ON c.doc_id = p.doc_id
            ) WHERE strength > 0
        ),
        per_chunk AS (
            SELECT doc_id, chunk_id, strength, count(*) AS n, min(owner_id) AS mn
            FROM hits GROUP BY doc_id, chunk_id, strength
        ),
        best AS (
            SELECT doc_id, chunk_id, mn AS owner_id,
                   CASE WHEN strength = 2 THEN 'head' ELSE 'body' END AS owner_kind
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, chunk_id ORDER BY strength DESC) AS rk
                  FROM per_chunk)
            WHERE rk = 1 AND n = 1
        ),
        allc AS (
            SELECT c.doc_id, c.chunk_id, b.owner_id, b.owner_kind
            FROM chunks c LEFT JOIN best b ON c.doc_id = b.doc_id AND c.chunk_id = b.chunk_id
        ),
        fin AS (
            SELECT doc_id, chunk_id, owner_id, owner_kind,
                   last_value(CASE WHEN owner_kind = 'head' THEN owner_id END IGNORE NULLS)
                       OVER (PARTITION BY doc_id ORDER BY chunk_id
                             ROWS BETWEEN 12 PRECEDING AND CURRENT ROW) AS carried
            FROM allc
        )
        SELECT doc_id, chunk_id,
               coalesce(owner_id, carried) AS owner_id,
               coalesce(owner_kind, CASE WHEN carried IS NOT NULL THEN 'carried' END) AS owner_kind
        FROM fin
    """
    # page-markdown serializer twin over md5-keyed derived spans: window
    # page numbering (cumulative page_breaks incl. current row), furniture/
    # page_break exclusion, per-kind rendering, offset-ordered '\n\n' join.
    q["doc_page_markdowns"] = """
        WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        words AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS off, list_extract(ws, i) AS w
            FROM docs, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
        ),
        spans AS (
            SELECT doc_id, off, w,
                   ['text','text','text','heading','list','table','caption','picture','page_break','furniture']
                       [CAST(('0x' || substr(md5(doc_id || ':' || off), 1, 2))::UBIGINT % 10 AS INT) + 1] AS kind
            FROM words WHERE length(w) > 0
        ),
        paged AS (
            SELECT doc_id, off, w, kind,
                   1 + CAST(sum(CASE WHEN kind = 'page_break' THEN 1 ELSE 0 END)
                            OVER (PARTITION BY doc_id ORDER BY off
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS page_no
            FROM spans
        ),
        content AS (
            SELECT doc_id, page_no, off,
                   CASE kind WHEN 'picture' THEN '![' || 'm' || off || ']'
                             WHEN 'caption' THEN '*' || w || '*'
                             ELSE w END AS md
            FROM paged WHERE kind NOT IN ('page_break', 'furniture')
        )
        SELECT doc_id, page_no, string_agg(md, chr(10) || chr(10) ORDER BY off) AS markdown
        FROM content GROUP BY doc_id, page_no
    """
    # Winnowing twin: each 16-byte window hashed directly (Rabin-Karp
    # identity == the streaming recurrence, exact under mod 2^61-1);
    # 1/8 min-sampling, distinct, sorted, cap 128. list_reduce's first-element
    # seed equals Python's h=0 fold since (0*257+b) = b.
    q["doc_rolling_fp"] = """
        WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
        hs AS (
            SELECT doc_id,
                CASE WHEN length(s) < 16 THEN [] ELSE
                    list_transform(generate_series(1, length(s) - 15), i ->
                        list_reduce(
                            list_transform(generate_series(i, i + 15),
                                           j -> CAST(ascii(substr(s, j, 1)) AS HUGEINT)),
                            (acc, b) -> (acc * 257 + b) % 2305843009213693951))
                END AS hl
            FROM t
        ),
        fp AS (
            SELECT doc_id,
                   list_slice(list_sort(list_distinct(list_filter(hl, h -> h % 8 = 0))), 1, 128) AS f
            FROM hs
        )
        SELECT doc_id, CAST(len(f) AS INT) AS n_fp,
               CAST(f[1] AS BIGINT) AS fp_min,
               CAST(f[len(f)] AS BIGINT) AS fp_max
        FROM fp
    """
    # Gopher repetition stats over the line-structured derived corpus
    # (_docs_lined twin): integer counters only — see sparkdoc/filters.py on
    # why fractions are never hashed. n-gram char length is length(gram)
    # minus its joining spaces (words contain no spaces).
    _WS = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"
    q["doc_repetition"] = f"""
        WITH lines_c AS (
            SELECT doc_id,
                   substr(text, 1, 60) || chr(10) || substr(text, 61, 60) || chr(10) ||
                   CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 60)
                        ELSE substr(text, 121, 60) END AS text
            FROM documents
        ),
        base AS (
            SELECT doc_id,
                   list_filter(string_split(text, chr(10)), l -> l <> '') AS ls,
                   {_WS} AS ws
            FROM lines_c
        ),
        linestats AS (
            SELECT doc_id,
                   CAST(len(ls) AS BIGINT) AS n_lines,
                   CAST(len(ls) - len(list_distinct(ls)) AS BIGINT) AS n_dup_lines,
                   CAST(coalesce(list_sum(list_transform(ls, l -> length(l))), 0)
                        - coalesce(list_sum(list_transform(list_distinct(ls), l -> length(l))), 0)
                        AS BIGINT) AS dup_line_chars,
                   CAST(coalesce(list_sum(list_transform(ls, l -> length(l))), 0) AS BIGINT)
                       AS total_line_chars,
                   CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT)
                       AS total_word_chars
            FROM base
        ),
        g2 AS (
            SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                                                 i -> ws[i] || ' ' || ws[i+1])) AS g
            FROM base
        ),
        g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
        g2top AS (
            SELECT doc_id, g AS top_bigram, CAST(c AS BIGINT) AS top_bigram_cnt,
                   CAST(c * (length(g) - 1) AS BIGINT) AS top_bigram_chars
            FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
                  FROM g2c) WHERE rn = 1
        ),
        g3 AS (
            SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 2),
                                                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
            FROM base
        ),
        g3c AS (SELECT doc_id, g, count(*) AS c, count(*) * (length(g) - 2) AS chars
                FROM g3 GROUP BY doc_id, g),
        g3agg AS (
            SELECT doc_id,
                   CAST(coalesce(sum(CASE WHEN c >= 2 THEN chars END), 0) AS BIGINT) AS dup_trigram_chars,
                   CAST(coalesce(sum(chars), 0) AS BIGINT) AS total_trigram_chars
            FROM g3c GROUP BY doc_id
        )
        SELECT l.doc_id, l.n_lines, l.n_dup_lines, l.dup_line_chars, l.total_line_chars,
               t.top_bigram,
               coalesce(t.top_bigram_cnt, 0) AS top_bigram_cnt,
               coalesce(t.top_bigram_chars, 0) AS top_bigram_chars,
               coalesce(a.dup_trigram_chars, 0) AS dup_trigram_chars,
               coalesce(a.total_trigram_chars, 0) AS total_trigram_chars,
               l.total_word_chars
        FROM linestats l
        LEFT JOIN g2top t ON l.doc_id = t.doc_id
        LEFT JOIN g3agg a ON l.doc_id = a.doc_id
    """
    # PII counts + redaction over the PII-injected derived corpus (_docs_pii
    # twin). Patterns are shared literals from sparkdoc.filters.PII_PATTERNS
    # (Java-regex/RE2 common subset); redaction applies them in PII_ORDER.
    from sparkdoc.filters import PII_ORDER as _PII_ORDER
    from sparkdoc.filters import PII_PATTERNS as _PII_PATTERNS

    _pii_counts = ",\n               ".join(
        f"CAST(len(regexp_extract_all(text, '{_PII_PATTERNS[k][0]}')) AS BIGINT) AS n_{k}"
        for k in _PII_ORDER
    )
    _pii_red = "text"
    for _k in _PII_ORDER:
        _pii_red = (
            f"regexp_replace({_pii_red}, '{_PII_PATTERNS[_k][0]}', "
            f"'{_PII_PATTERNS[_k][1]}', 'g')"
        )
    q["doc_pii"] = f"""
        WITH pii_c AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0 THEN ' mail user' || doc_id || '@ex-' || (doc_id % 7) || '.org now' ELSE '' END
                   || CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' x' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0 THEN ' host 10.' || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256) || ' up' ELSE '' END
                   || CASE WHEN doc_id % 6 = 0 THEN ' ssn 078-05-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' leak' ELSE '' END
                   AS text
            FROM documents
        )
        SELECT doc_id,
               {_pii_counts},
               {_pii_red} AS redacted
        FROM pii_c
    """
    # Benchmark decontamination (_doc_decontam twin): benchmark = original
    # doc_id % 21 == 0 docs; graded corpus = hostile minus those; overlap =
    # DISTINCT word 8-grams (shingles_of semantics: list_distinct) meeting
    # on md5.
    q["doc_decontam"] = f"""
        WITH documents_h AS ({_HOSTILE_SQL}),
        dc_docs AS (
            SELECT doc_id, text FROM documents_h
            WHERE NOT (doc_id < 1000000 AND doc_id % 21 = 0)
        ),
        dc_bw AS (SELECT {_WS} AS ws FROM documents WHERE doc_id % 21 = 0),
        dc_bg AS (
            SELECT DISTINCT md5(g) AS h FROM (
                SELECT unnest(list_distinct(list_transform(
                    generate_series(1, len(ws) - 7),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                         ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]))) AS g
                FROM dc_bw
            )
        ),
        dc_dg AS (
            SELECT doc_id, md5(g) AS h FROM (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(ws) - 7),
                    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                         ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]))) AS g
                FROM (SELECT doc_id, {_WS} AS ws FROM dc_docs)
            )
        ),
        dc_hits AS (
            SELECT doc_id, count(*) AS n FROM dc_dg JOIN dc_bg USING (h) GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(h.n, 0) AS BIGINT) AS n_contaminated,
               coalesce(h.n, 0) > 0 AS contaminated
        FROM dc_docs d LEFT JOIN dc_hits h USING (doc_id)
    """
    # Brute-force O(n^2) twin of the blocked self-join: pigeonhole blocking
    # with max_hamming+1 blocks is recall-COMPLETE for radius 6, so the
    # candidate-generation path must equal the exhaustive pair scan exactly.
    q["doc_simhash_pairs"] = """
        WITH words AS (
            SELECT doc_id,
                   unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), w -> w <> '')) AS w
            FROM documents
        ), h AS (
            SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS hv FROM words
        ), bits AS (
            SELECT doc_id, b AS bit,
                   sum(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM h, (SELECT unnest(generate_series(0, 63)) AS b)
            GROUP BY doc_id, b
        ), sim AS (
            SELECT doc_id,
                   sum(CASE WHEN v > 0 THEN CAST(1::UBIGINT << bit AS HUGEINT) ELSE 0 END) AS u
            FROM bits GROUP BY doc_id
        ), sig AS (
            SELECT d.doc_id,
                   CAST(COALESCE(s.u - CASE WHEN s.u >= 9223372036854775808
                                            THEN 18446744073709551616 ELSE 0 END, 0) AS BIGINT) AS simhash
            FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
        )
        SELECT x.doc_id AS a, y.doc_id AS b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
        FROM sig x JOIN sig y ON x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= 6
    """
    q["doc_root_repair"] = """
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CASE WHEN doc_id % 3 = 2 THEN 'CODE-' || CAST(doc_id AS VARCHAR)
                    ELSE CAST(doc_id AS VARCHAR) END AS ref_out
        FROM documents
    """
    # the negative-handle ladder re-expressed in pure SQL: same emission
    # synthesis (batches of 10), same local-first precedence, same window-50
    # already-found lookup (target g = batch_start + parent_handle)
    q["events_batch_handles"] = """
        WITH ordered AS (
            SELECT user_id, event_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rn
            FROM events
        ), em AS (
            SELECT user_id, event_id, event_type AS path,
                   CAST(rn // 10 AS INT) AS batch_index,
                   CAST(rn % 10 AS INT) AS emission,
                   CAST(rn % 10 + 1 AS INT) AS handle,
                   CASE WHEN rn % 10 = 0 THEN -1
                        WHEN (rn % 10) % 3 = 0 THEN NULL
                        ELSE CAST(rn % 10 AS INT) END AS parent_handle
            FROM ordered
        ), gg AS (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY batch_index, emission) AS g
            FROM em
        ), bs AS (
            SELECT *, min(g) OVER (PARTITION BY user_id, batch_index) AS batch_start FROM gg
        ), local_t AS (
            SELECT user_id AS l_user, batch_index AS l_batch, handle AS l_handle,
                   g AS l_g, event_id AS l_eid, path AS l_path
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, batch_index, handle ORDER BY emission) AS hrn
                FROM bs
            ) WHERE hrn = 1
        ), with_local AS (
            SELECT b.*, l.l_eid, l.l_path
            FROM bs b LEFT JOIN local_t l
              ON b.user_id = l.l_user AND b.batch_index = l.l_batch
             AND b.parent_handle = l.l_handle AND b.g <> l.l_g
        ), with_tg AS (
            SELECT *, CASE WHEN parent_handle < 0 AND -parent_handle <= 50
                            AND batch_start + parent_handle >= 1
                           THEN batch_start + parent_handle END AS tg
            FROM with_local
        ), joined AS (
            SELECT w.*, p.event_id AS a_eid, p.path AS a_path
            FROM with_tg w LEFT JOIN gg p ON w.user_id = p.user_id AND w.tg = p.g
        )
        SELECT user_id, event_id,
               CASE WHEN l_eid IS NOT NULL THEN 'local'
                    WHEN a_eid IS NOT NULL THEN 'already_found' END AS parent_source,
               CASE WHEN l_eid IS NOT NULL THEN CAST(l_eid AS VARCHAR)
                    WHEN a_eid IS NOT NULL THEN CAST(a_eid AS VARCHAR) END AS parent_eid,
               COALESCE(l_path, a_path) AS parent_path
        FROM joined
    """
    q["emb_norms"] = """
        WITH s AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(1 + vec_id % 3 AS DOUBLE)) AS e
            FROM embeddings
        )
        SELECT vec_id,
               round(sqrt(list_reduce(list_transform(e, x -> x * x), (a,b) -> a + b)), 6) AS l2_norm
        FROM s
    """
    # pre-normalized cosine (matches similarity._with_unit): divide each
    # element by the row norm FIRST, then a single sequential-fold dot —
    # identical op order in both engines keeps round(cos, 6) bit-exact
    _cos = "list_reduce(list_transform(list_zip(qa.e, ca.e), p -> p[1] * p[2]), (x,y) -> x + y)"
    _unit_e = (
        "list_transform(e0, x -> x / sqrt(list_reduce(list_transform(e0, y -> y*y), (a,b) -> a + b)))"
    )
    q["emb_knn"] = f"""
        WITH e_raw AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0 FROM embeddings),
        e AS (SELECT vec_id, {_unit_e} AS e FROM e_raw),
        qa AS (SELECT vec_id AS query_id, e FROM e WHERE vec_id % 100 = 0),
        ca AS (SELECT vec_id AS neighbor_id, e FROM e),
        scored AS (
            SELECT query_id, neighbor_id, {_cos} AS cos
            FROM qa, ca WHERE query_id <> neighbor_id
        )
        SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored
        ) WHERE rank <= 5
    """
    # semantic decontamination: same unit-normalize + fold dot as emb_knn
    # (self-pairs INCLUDED — the benchmark is a separate logical table), per-doc
    # max via a window, ties to the smallest bench id (the min_by struct rule)
    q["emb_decontam"] = f"""
        WITH e_raw AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0 FROM embeddings),
        e AS (SELECT vec_id, {_unit_e} AS e FROM e_raw),
        b_raw AS (
            SELECT vec_id AS bid,
                   list_transform(generate_series(1, len(embedding)), i ->
                       CAST(embedding[i] AS DOUBLE)
                       * (CAST(1.0 AS DOUBLE)
                          + CAST((vec_id + (i - 1)) % 5 AS DOUBLE) * CAST(0.01 AS DOUBLE))) AS e0
            FROM embeddings WHERE vec_id % 97 = 0
        ),
        ba AS (SELECT bid, {_unit_e} AS e FROM b_raw),
        scored AS (
            SELECT ca.vec_id, bid,
                   list_reduce(list_transform(list_zip(ca.e, ba.e), p -> p[1] * p[2]), (x,y) -> x + y) AS cos
            FROM e ca, ba
        ),
        sel AS (
            SELECT vec_id, bid, cos,
                   row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bid ASC) AS r,
                   max(cos) OVER (PARTITION BY vec_id) AS mx
            FROM scored
        )
        SELECT vec_id, round(mx, 6) AS max_cos, bid AS nearest_bench,
               CAST(mx >= 0.95 AS INT) AS contaminated
        FROM sel WHERE r = 1
        ORDER BY vec_id
    """
    # SQ8: the codebook is exact per-dimension min/max (order-independent
    # aggregates), so the oracle rebuilds codes, bucket-center dequant and
    # the sequential-fold cosine bit-for-bit
    _mins64 = ", ".join(f"min(e0[{i}])" for i in range(1, 65))
    _maxs64 = ", ".join(f"max(e0[{i}])" for i in range(1, 65))
    _sq8_cte = f"""e_raw AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0 FROM embeddings),
        st AS (SELECT [{_mins64}] AS mins, [{_maxs64}] AS maxs FROM e_raw),
        cd AS (
            SELECT vec_id, list_transform(generate_series(1, 64), i ->
                CASE WHEN maxs[i] > mins[i]
                     THEN least(255, CAST(floor((e0[i] - mins[i]) / (maxs[i] - mins[i]) * 256) AS INT))
                     ELSE 0 END) AS codes
            FROM e_raw CROSS JOIN st
        ),
        dq AS (
            SELECT vec_id AS neighbor_id,
                   list_transform(generate_series(1, 64), i ->
                       mins[i] + (codes[i] + 0.5) * (maxs[i] - mins[i]) / 256) AS dq
            FROM cd CROSS JOIN st
        ),
        dqn AS (
            SELECT neighbor_id, dq,
                   sqrt(list_reduce(list_transform(dq, y -> y * y), (a, b) -> a + b)) AS dq_norm
            FROM dq
        ),
        qa8 AS (
            SELECT vec_id AS query_id, {_unit_e} AS e
            FROM e_raw WHERE vec_id % 100 = 0
        ),
        sq8_scored AS (
            SELECT query_id, neighbor_id,
                   list_reduce(list_transform(list_zip(qa8.e, dqn.dq), p -> p[1] * p[2]),
                               (x, y) -> x + y) / dq_norm AS cos
            FROM qa8, dqn WHERE query_id <> neighbor_id
        ),
        sq8_top AS (
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM sq8_scored
            ) WHERE rank <= 5
        )"""
    q["emb_sq8_knn"] = f"""
        WITH {_sq8_cte}
        SELECT query_id, neighbor_id, rank, cos FROM sq8_top
    """
    q["emb_sq8_recall"] = f"""
        WITH {_sq8_cte},
        e AS (SELECT vec_id, {_unit_e} AS e FROM e_raw),
        qa AS (SELECT vec_id AS query_id, e FROM e WHERE vec_id % 100 = 0),
        ca AS (SELECT vec_id AS neighbor_id, e FROM e),
        ex_scored AS (
            SELECT query_id, neighbor_id,
                   list_reduce(list_transform(list_zip(qa.e, ca.e), p -> p[1] * p[2]),
                               (x, y) -> x + y) AS cos
            FROM qa, ca WHERE query_id <> neighbor_id
        ),
        ex_top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM ex_scored
            ) WHERE rank <= 5
        ),
        per_q AS (
            SELECT e.query_id,
                   count(*) AS k_,
                   sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS hits
            FROM ex_top e
            LEFT JOIN sq8_top s
              ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id
            GROUP BY e.query_id
        )
        SELECT 'sq8' AS method,
               count(*) AS n_queries,
               round(avg(hits * 1.0 / k_), 6) AS mean_recall_at_k
        FROM per_q
    """
    # Shared CTE bodies for the ANN twins (LSH planes / IVF centroids are
    # md5-derived, so pure SQL rebuilds them bit-for-bit; every fold is a
    # sequential list_reduce matching Spark's aggregate order).
    _e_cte = f"""e_raw AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0 FROM embeddings),
        e AS (SELECT vec_id, {_unit_e} AS e FROM e_raw)"""
    def _dot2(a: str, b: str) -> str:
        return (
            f"list_reduce(list_transform(list_zip({a}.e, {b}.e), "
            "pr -> pr[1] * pr[2]), (x, y) -> x + y)"
        )

    _lsh_cte = f"""planes AS (
            SELECT b, list_transform(generate_series(0, 63), j ->
                CASE WHEN ('0x' || substr(md5('7:' || b || ':' || j), 1, 2))::UBIGINT % 2 = 0
                     THEN 1.0 ELSE -1.0 END) AS p
            FROM (SELECT unnest(generate_series(0, 3)) AS b)
        ),
        bucketed AS (
            SELECT vec_id, any_value(e) AS e,
                   CAST(sum(CASE WHEN list_reduce(list_transform(list_zip(e, p), pr -> pr[1] * pr[2]), (x, y) -> x + y) >= 0
                            THEN 1 << b ELSE 0 END) AS INT) AS bucket
            FROM e, planes GROUP BY vec_id
        ),
        lq AS (SELECT vec_id AS query_id, e, bucket FROM bucketed WHERE vec_id % 100 = 0),
        lc AS (SELECT vec_id AS neighbor_id, e, bucket FROM bucketed),
        lsh_scored AS (
            SELECT query_id, neighbor_id, {_dot2('lq', 'lc')} AS cos
            FROM lq JOIN lc ON lq.bucket = lc.bucket AND query_id <> neighbor_id
        ),
        lsh AS (
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM lsh_scored
            ) WHERE rank <= 5
        )"""

    # IVF twin: centroids are an md5-chunked uint16-LE stream (rebuilt via
    # hex decode), argmax-cell assignment, nprobe=3 probe join, exact cosine
    # within probed cells — scores (and therefore ranks) are bit-identical.
    _cent_cte = f"""cent AS (
            SELECT cell,
                   (SELECT string_agg(md5('ivf:11:' || cell || ':' || i), '' ORDER BY i)
                    FROM (SELECT unnest(generate_series(0, 7)) AS i)) AS hx
            FROM (SELECT unnest(generate_series(0, 15)) AS cell)
        ),
        craw AS (
            SELECT cell, list_transform(generate_series(0, 63), j ->
                CAST(('0x' || substr(hx, j*4 + 3, 2) || substr(hx, j*4 + 1, 2))::UBIGINT AS DOUBLE) - 32767.5) AS v
            FROM cent
        ),
        cnorm AS (
            SELECT cell, list_transform(v, x -> x / sqrt(list_reduce(list_transform(v, y -> y*y), (a,b) -> a+b))) AS cvec
            FROM craw
        ),
        assigned AS (
            SELECT vec_id, e, cell FROM (
                SELECT e.vec_id, e.e, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                           list_reduce(list_transform(list_zip(e.e, c.cvec), pr -> pr[1] * pr[2]), (x,y) -> x+y) DESC,
                           c.cell ASC) AS rn
                FROM e, cnorm c
            ) WHERE rn = 1
        )"""

    _ivf_cte = f"""{_cent_cte},
        probes AS (
            SELECT query_id, e, cell FROM (
                SELECT q.vec_id AS query_id, q.e, c.cell,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                           list_reduce(list_transform(list_zip(q.e, c.cvec), pr -> pr[1] * pr[2]), (x,y) -> x+y) DESC,
                           c.cell ASC) AS rn
                FROM (SELECT * FROM e WHERE vec_id % 100 = 0) q, cnorm c
            ) WHERE rn <= 3
        ),
        ivf_scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id, {_dot2('p', 'a')} AS cos
            FROM probes p JOIN assigned a ON p.cell = a.cell AND p.query_id <> a.vec_id
        ),
        ivf AS (
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM ivf_scored
            ) WHERE rank <= 5
        )"""

    _exact_cte = f"""xq AS (SELECT vec_id AS query_id, e FROM e WHERE vec_id % 100 = 0),
        xc AS (SELECT vec_id AS neighbor_id, e FROM e),
        x_scored AS (
            SELECT query_id, neighbor_id, {_dot2('xq', 'xc')} AS cos
            FROM xq, xc WHERE query_id <> neighbor_id
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM x_scored
            ) WHERE rank <= 5
        )"""

    # Embedding-cosine near-dup twin: banded sign-buckets (seeds 7+band),
    # DISTINCT candidate pairs across bands, exact cosine verify at 0.4
    # (filter on the unrounded fold, round after — matching Spark).
    q["emb_near_dups"] = f"""
        WITH {_e_cte},
        bplanes AS (
            SELECT band, b, list_transform(generate_series(0, 63), j ->
                CASE WHEN ('0x' || substr(md5((7 + band) || ':' || b || ':' || j), 1, 2))::UBIGINT % 2 = 0
                     THEN 1.0 ELSE -1.0 END) AS p
            FROM (SELECT unnest(generate_series(0, 3)) AS band),
                 (SELECT unnest(generate_series(0, 3)) AS b)
        ),
        bkeyed AS (
            SELECT vec_id, band,
                   CAST(sum(CASE WHEN list_reduce(list_transform(list_zip(e, p), pr -> pr[1] * pr[2]), (x, y) -> x + y) >= 0
                            THEN 1 << b ELSE 0 END) AS INT) AS key
            FROM e, bplanes GROUP BY vec_id, band, e
        ),
        cand AS (
            SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
            FROM bkeyed x JOIN bkeyed y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
        ),
        nd_scored AS (
            SELECT c.a, c.b, {_dot2('ea', 'eb')} AS cos
            FROM cand c JOIN e ea ON ea.vec_id = c.a JOIN e eb ON eb.vec_id = c.b
        )
        SELECT a, b, round(cos, 6) AS cos FROM nd_scored WHERE cos >= 0.4
    """
    q["emb_lsh_knn"] = f"WITH {_e_cte}, {_lsh_cte} SELECT query_id, neighbor_id, rank, cos FROM lsh"
    q["emb_ivf_knn"] = f"WITH {_e_cte}, {_ivf_cte} SELECT query_id, neighbor_id, rank, cos FROM ivf"
    # The recall rollup itself is oracle-exact: both ANN twins and the exact
    # top-k are deterministic, so |ANN ∩ exact| / k per query is too.
    q["emb_ann_recall"] = f"""
        WITH {_e_cte}, {_lsh_cte}, {_ivf_cte}, {_exact_cte},
        denom AS (SELECT query_id, count(*) AS k FROM exact GROUP BY query_id),
        lsh_hits AS (
            SELECT x.query_id, count(*) AS hits FROM exact x
            JOIN lsh l ON x.query_id = l.query_id AND x.neighbor_id = l.neighbor_id
            GROUP BY x.query_id
        ),
        ivf_hits AS (
            SELECT x.query_id, count(*) AS hits FROM exact x
            JOIN ivf v ON x.query_id = v.query_id AND x.neighbor_id = v.neighbor_id
            GROUP BY x.query_id
        )
        SELECT 'lsh' AS method, count(*) AS n_queries,
               round(avg(CAST(coalesce(h.hits, 0) AS DOUBLE) / d.k), 6) AS mean_recall_at_k
        FROM denom d LEFT JOIN lsh_hits h ON d.query_id = h.query_id
        UNION ALL
        SELECT 'ivf' AS method, count(*) AS n_queries,
               round(avg(CAST(coalesce(h.hits, 0) AS DOUBLE) / d.k), 6) AS mean_recall_at_k
        FROM denom d LEFT JOIN ivf_hits h ON d.query_id = h.query_id
    """
    # SemDeDup twin (similarity.semantic_dedup): same cell assignment as the
    # IVF oracle, within-cell pairwise cosine (identical fold order →
    # bit-identical doubles → identical >= 0.4 outcomes), shadow = min
    # lower-id near-twin.
    q["emb_semantic_dedup"] = f"""
        WITH {_e_cte}, {_cent_cte},
        sd_pairs AS (
            SELECT a.vec_id AS u, b.vec_id AS w, {_dot2('a', 'b')} AS cos
            FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
        ),
        sd_shadow AS (SELECT w, min(u) AS shadow FROM sd_pairs WHERE cos >= 0.4 GROUP BY w)
        SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
               (s.shadow IS NULL) AS kept, CAST(s.shadow AS BIGINT) AS shadow
        FROM assigned a LEFT JOIN sd_shadow s ON a.vec_id = s.w
    """
    q["emb_label_knn"] = f"""
        WITH e_raw AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0 FROM embeddings),
        e AS (SELECT vec_id, label, {_unit_e} AS e FROM e_raw),
        qa AS (SELECT vec_id AS query_id, e FROM e WHERE vec_id % 100 = 0),
        ca AS (SELECT vec_id AS neighbor_id, label, e FROM e),
        knn AS (
            SELECT query_id, neighbor_id, label FROM (
                SELECT query_id, neighbor_id, ca.label,
                       row_number() OVER (PARTITION BY query_id ORDER BY {_cos} DESC, neighbor_id ASC) AS rank
                FROM qa, ca WHERE query_id <> neighbor_id
            ) WHERE rank <= 5
        )
        SELECT query_id, label AS n_label, count(*) AS votes
        FROM knn GROUP BY query_id, label
    """

    # Trained-quantizer twins (sparkdoc/cluster.py): the ENTIRE Lloyd
    # training loop unrolled in SQL — hash-ranked seeds, argmin-L2
    # assignment as row_number over (dot - ||c||²/2 DESC, cell ASC), BIGINT
    # micro-unit centroid updates (order-independent, bit-exact), empty
    # cells carrying the previous centroid via LEFT JOIN + COALESCE. Every
    # float op is the same sequential fold Spark runs, so scores, fits,
    # codes and ranks are bit-identical.
    def _l2s(vec: str, cvec: str) -> str:
        return (
            f"(list_reduce(list_transform(list_zip({vec}, {cvec}), pr -> pr[1] * pr[2]), (x, y) -> x + y)"
            f" - list_reduce(list_transform({cvec}, x -> x * x), (a, b) -> a + b) / 2)"
        )

    def _km_assign(name: str, cents: str) -> str:
        return f"""{name} AS (
            SELECT vec_id, e, cell FROM (
                SELECT e.vec_id, e.e, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY {_l2s('e.e', 'c.cvec')} DESC, c.cell ASC) AS rn
                FROM e, {cents} c
            ) WHERE rn = 1
        )"""

    def _km_update(name: str, assigned: str, prev: str) -> str:
        return f"""{name}_s AS (
            SELECT a.cell, g.j, SUM(CAST(round(a.e[g.j + 1] * 1000000.0) AS BIGINT)) AS s, COUNT(*) AS cnt
            FROM {assigned} a, (SELECT unnest(generate_series(0, 63)) AS j) g
            GROUP BY a.cell, g.j
        ),
        {name} AS (
            SELECT c.cell, COALESCE(u.cvec, c.cvec) AS cvec
            FROM {prev} c LEFT JOIN (
                SELECT cell, list(s / (cnt * 1000000.0) ORDER BY j) AS cvec FROM {name}_s GROUP BY cell
            ) u USING (cell)
        )"""

    _seed_cte = """seedrank AS (
            SELECT e, row_number() OVER (ORDER BY md5(vec_id::VARCHAR || ':13') ASC, vec_id ASC) AS rn FROM e
        )"""

    _km_cte = f"""kc0 AS (SELECT rn - 1 AS cell, e AS cvec FROM seedrank WHERE rn <= 4),
        {_km_assign('ka1', 'kc0')}, {_km_update('kc1', 'ka1', 'kc0')},
        {_km_assign('ka2', 'kc1')}, {_km_update('kc2', 'ka2', 'kc1')},
        {_km_assign('ka3', 'kc2')}"""

    q["emb_kmeans_stats"] = f"""
        WITH {_e_cte}, {_seed_cte}, {_km_cte},
        ks3 AS (
            SELECT a.cell, g.j, SUM(CAST(round(a.e[g.j + 1] * 1000000.0) AS BIGINT)) AS s_e6, COUNT(*) AS cnt
            FROM ka3 a, (SELECT unnest(generate_series(0, 63)) AS j) g
            GROUP BY a.cell, g.j
        )
        SELECT cell, j, s_e6, cnt FROM ks3
    """

    _ivt_cte = f"""{_km_cte},
        ivtp AS (
            SELECT query_id, e, cell FROM (
                SELECT q.vec_id AS query_id, q.e, c.cell,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY {_l2s('q.e', 'c.cvec')} DESC, c.cell ASC) AS rn
                FROM (SELECT * FROM e WHERE vec_id % 100 = 0) q, kc2 c
            ) WHERE rn <= 2
        ),
        ivt_scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   list_reduce(list_transform(list_zip(p.e, a.e), pr -> pr[1] * pr[2]), (x, y) -> x + y) AS cos
            FROM ivtp p JOIN ka3 a ON p.cell = a.cell AND p.query_id <> a.vec_id
        ),
        ivt AS (
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM ivt_scored
            ) WHERE rank <= 5
        )"""

    q["emb_ivf_trained_knn"] = f"""
        WITH {_e_cte}, {_seed_cte}, {_ivt_cte}
        SELECT query_id, neighbor_id, rank, cos FROM ivt
    """

    # PQ twin: m=8 subspaces of dsub=8 dims, ksub=4 cells, ONE joint Lloyd
    # iteration over the exploded (vec, sub) slice frame; ADC score is a
    # fixed ascending-sub fold of per-sub LUT lookups.
    def _pq_assign(name: str, cents: str) -> str:
        return f"""{name} AS (
            SELECT vec_id, sub, sv, cell FROM (
                SELECT s.vec_id, s.sub, s.sv, c.cell,
                       row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY {_l2s('s.sv', 'c.cvec')} DESC, c.cell ASC) AS rn
                FROM pslices s JOIN {cents} c ON s.sub = c.sub
            ) WHERE rn = 1
        )"""

    _pq_cte = f"""psub AS (SELECT unnest(generate_series(0, 7)) AS sub),
        pc0 AS (
            SELECT g.sub, p.rn - 1 AS cell, list_slice(p.e, g.sub * 8 + 1, g.sub * 8 + 8) AS cvec
            FROM seedrank p, psub g WHERE p.rn <= 4
        ),
        pslices AS (
            SELECT e.vec_id, g.sub, list_slice(e.e, g.sub * 8 + 1, g.sub * 8 + 8) AS sv
            FROM e, psub g
        ),
        {_pq_assign('pa1', 'pc0')},
        ps1 AS (
            SELECT a.sub, a.cell, g.j, SUM(CAST(round(a.sv[g.j + 1] * 1000000.0) AS BIGINT)) AS s, COUNT(*) AS cnt
            FROM pa1 a, (SELECT unnest(generate_series(0, 7)) AS j) g
            GROUP BY a.sub, a.cell, g.j
        ),
        pc1 AS (
            SELECT c.sub, c.cell, COALESCE(u.cvec, c.cvec) AS cvec
            FROM pc0 c LEFT JOIN (
                SELECT sub, cell, list(s / (cnt * 1000000.0) ORDER BY j) AS cvec FROM ps1 GROUP BY sub, cell
            ) u USING (sub, cell)
        ),
        pcodes AS (
            SELECT vec_id, sub, cell AS code FROM (
                SELECT s.vec_id, s.sub, c.cell,
                       row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY {_l2s('s.sv', 'c.cvec')} DESC, c.cell ASC) AS rn
                FROM pslices s JOIN pc1 c ON s.sub = c.sub
            ) WHERE rn = 1
        )"""

    q["emb_pq_codes"] = f"""
        WITH {_e_cte}, {_seed_cte}, {_pq_cte}
        SELECT vec_id, sub, code FROM pcodes
    """

    _pqt_cte = f"""{_pq_cte},
        plut AS (
            SELECT q.vec_id AS query_id, c.sub, c.cell,
                   list_reduce(list_transform(list_zip(list_slice(q.e, c.sub * 8 + 1, c.sub * 8 + 8), c.cvec), pr -> pr[1] * pr[2]), (x, y) -> x + y) AS lv
            FROM (SELECT * FROM e WHERE vec_id % 100 = 0) q, pc1 c
        ),
        padc AS (
            SELECT l.query_id, pc.vec_id AS neighbor_id,
                   list_reduce(list(l.lv ORDER BY l.sub ASC), (x, y) -> x + y) AS cos
            FROM plut l JOIN pcodes pc ON l.sub = pc.sub AND l.cell = pc.code
            WHERE l.query_id <> pc.vec_id
            GROUP BY l.query_id, pc.vec_id
        ),
        pqt AS (
            SELECT query_id, neighbor_id, rank, round(cos, 6) AS cos FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM padc
            ) WHERE rank <= 5
        )"""

    q["emb_pq_knn"] = f"""
        WITH {_e_cte}, {_seed_cte}, {_pqt_cte}
        SELECT query_id, neighbor_id, rank, cos FROM pqt
    """

    q["emb_trained_recall"] = f"""
        WITH {_e_cte}, {_seed_cte}, {_exact_cte}, {_ivt_cte}, {_pqt_cte},
        tdenom AS (SELECT query_id, count(*) AS k FROM exact GROUP BY query_id),
        ivt_hits AS (
            SELECT x.query_id, count(*) AS hits FROM exact x
            JOIN ivt v ON x.query_id = v.query_id AND x.neighbor_id = v.neighbor_id
            GROUP BY x.query_id
        ),
        pqt_hits AS (
            SELECT x.query_id, count(*) AS hits FROM exact x
            JOIN pqt p ON x.query_id = p.query_id AND x.neighbor_id = p.neighbor_id
            GROUP BY x.query_id
        )
        SELECT 'ivf_trained' AS method, count(*) AS n_queries,
               round(avg(CAST(coalesce(h.hits, 0) AS DOUBLE) / d.k), 6) AS mean_recall_at_k
        FROM tdenom d LEFT JOIN ivt_hits h ON d.query_id = h.query_id
        UNION ALL
        SELECT 'pq' AS method, count(*) AS n_queries,
               round(avg(CAST(coalesce(h.hits, 0) AS DOUBLE) / d.k), 6) AS mean_recall_at_k
        FROM tdenom d LEFT JOIN pqt_hits h ON d.query_id = h.query_id
    """

    # Temporal-join twins (sparkdoc/temporal.py): the LATERAL most-recent-
    # row subquery IS the as-of definition; lag arithmetic is integer
    # microseconds end to end.
    q["events_asof_click"] = """
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
             c AS (SELECT * FROM events WHERE event_type = 'click')
        SELECT p.user_id, p.event_id,
               CASE WHEN epoch_us(p.ts) - r.tsus <= 86400000000 THEN r.event_id END AS asof_event_id,
               CASE WHEN epoch_us(p.ts) - r.tsus <= 86400000000 THEN epoch_us(p.ts) - r.tsus END AS asof_lag_us
        FROM p LEFT JOIN LATERAL (
            SELECT c.event_id, epoch_us(c.ts) AS tsus FROM c
            WHERE c.user_id = p.user_id AND c.ts <= p.ts
            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
        ) r ON true
    """
    q["doc_bm25"] = f"""
        WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
        dl AS (SELECT doc_id, len(ws) AS dl FROM w),
        post AS (
            SELECT doc_id, term, count(*) AS tf FROM (
                SELECT doc_id, unnest(ws) AS term FROM w
            ) GROUP BY doc_id, term
        ),
        dfq AS (SELECT term, count(DISTINCT doc_id) AS df_docs FROM post GROUP BY term),
        st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        qt AS (
            SELECT doc_id AS query_id, unnest(list_distinct(list_slice(ws, 1, 8))) AS term
            FROM w WHERE doc_id % 100 = 0
        ),
        contrib AS (
            SELECT q.query_id, p.doc_id,
                   CAST(round(1000000.0
                        * ln(1.0 + (st.n_docs - f.df_docs + 0.5) / (f.df_docs + 0.5))
                        * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
                   ) AS BIGINT) AS c_e6
            FROM post p JOIN qt q USING (term)
            JOIN dfq f USING (term)
            JOIN dl d ON p.doc_id = d.doc_id
            CROSS JOIN st
        ),
        agg AS (SELECT query_id, doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6 FROM contrib GROUP BY query_id, doc_id)
        SELECT query_id, doc_id, rank, score_e6 FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY score_e6 DESC, doc_id ASC) AS INT) AS rank
            FROM agg
        ) WHERE rank <= 5
    """
    # pruned BM25: same scoring chain as doc_bm25, with (a) the corpus
    # augmented with per-doc rare group tags (the synth vocab is uniformly
    # common — min df ≈ 0.75·N — so without injected rare terms EVERY query
    # term would be pruned and the gate would compare 0 rows to 0 rows), (b)
    # the probe set rebuilt as each query doc's 4 rarest + 4 most common
    # distinct terms (identical windows + tie-breaks as the Spark gate), and
    # (c) the max_df_frac=0.5 filter applied to query terms before the
    # postings join — the SQL twin filters on the identical df/N predicate
    q["doc_bm25_pruned"] = f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' g' || CAST(doc_id % 50 AS VARCHAR)
                        || ' h' || CAST(doc_id % 97 AS VARCHAR) AS text
            FROM documents
        ),
        w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM aug),
        dl AS (SELECT doc_id, len(ws) AS dl FROM w),
        post AS (
            SELECT doc_id, term, count(*) AS tf FROM (
                SELECT doc_id, unnest(ws) AS term FROM w
            ) GROUP BY doc_id, term
        ),
        dfq AS (SELECT term, count(DISTINCT doc_id) AS df_docs FROM post GROUP BY term),
        st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        qt0 AS (
            SELECT doc_id, unnest(list_distinct(ws)) AS term
            FROM w WHERE doc_id % 100 = 0
        ),
        qdf AS (SELECT t.doc_id, t.term, f.df_docs FROM qt0 t JOIN dfq f USING (term)),
        qt AS (
            SELECT doc_id AS query_id, term FROM (
                SELECT doc_id, term,
                       row_number() OVER (PARTITION BY doc_id ORDER BY df_docs ASC, term ASC) AS rr,
                       row_number() OVER (PARTITION BY doc_id ORDER BY df_docs DESC, term ASC) AS rc
                FROM qdf
            ) WHERE rr <= 4 OR rc <= 4
        ),
        contrib AS (
            SELECT q.query_id, p.doc_id,
                   CAST(round(1000000.0
                        * ln(1.0 + (st.n_docs - f.df_docs + 0.5) / (f.df_docs + 0.5))
                        * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
                   ) AS BIGINT) AS c_e6
            FROM post p JOIN qt q USING (term)
            JOIN dfq f USING (term)
            JOIN dl d ON p.doc_id = d.doc_id
            CROSS JOIN st
            WHERE f.df_docs <= 0.5 * st.n_docs
        ),
        agg AS (SELECT query_id, doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6 FROM contrib GROUP BY query_id, doc_id)
        SELECT query_id, doc_id, rank, score_e6 FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY score_e6 DESC, doc_id ASC) AS INT) AS rank
            FROM agg
        ) WHERE rank <= 5
    """
    # hybrid RRF: the full BM25 chain (k=10, queries restricted to ids that
    # also carry an embedding) + the full dense-cosine chain (emb_knn's CTEs
    # at k=10), fused with integer nano-unit 1/(60+rank) contributions —
    # every stage order-independent, so the fused ranks are engine-exact
    q["doc_rrf_hybrid"] = f"""
        WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
        dl AS (SELECT doc_id, len(ws) AS dl FROM w),
        post AS (
            SELECT doc_id, term, count(*) AS tf FROM (
                SELECT doc_id, unnest(ws) AS term FROM w
            ) GROUP BY doc_id, term
        ),
        dfq AS (SELECT term, count(DISTINCT doc_id) AS df_docs FROM post GROUP BY term),
        st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        qt AS (
            SELECT doc_id AS query_id, unnest(list_distinct(list_slice(ws, 1, 8))) AS term
            FROM w WHERE doc_id % 100 = 0 AND doc_id IN (SELECT vec_id FROM embeddings)
        ),
        contrib AS (
            SELECT q.query_id, p.doc_id,
                   CAST(round(1000000.0
                        * ln(1.0 + (st.n_docs - f.df_docs + 0.5) / (f.df_docs + 0.5))
                        * (p.tf * 2.2) / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
                   ) AS BIGINT) AS c_e6
            FROM post p JOIN qt q USING (term)
            JOIN dfq f USING (term)
            JOIN dl d ON p.doc_id = d.doc_id
            CROSS JOIN st
        ),
        bagg AS (SELECT query_id, doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6 FROM contrib GROUP BY query_id, doc_id),
        lex AS (
            SELECT query_id, doc_id, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY score_e6 DESC, doc_id ASC) AS rank
                FROM bagg
            ) WHERE rank <= 10
        ),
        e_raw AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e0 FROM embeddings),
        e AS (SELECT vec_id, {_unit_e} AS e FROM e_raw),
        qa AS (SELECT vec_id AS query_id, e FROM e WHERE vec_id % 100 = 0),
        ca AS (SELECT vec_id AS neighbor_id, e FROM e),
        dscored AS (
            SELECT query_id, neighbor_id, {_cos} AS cos
            FROM qa, ca WHERE query_id <> neighbor_id
        ),
        dense AS (
            SELECT query_id, neighbor_id AS doc_id, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM dscored
            ) WHERE rank <= 10
        ),
        uni AS (
            SELECT query_id, doc_id, CAST(round(1000000000.0 / (60 + rank)) AS BIGINT) AS c_e9 FROM lex
            UNION ALL
            SELECT query_id, doc_id, CAST(round(1000000000.0 / (60 + rank)) AS BIGINT) FROM dense
        ),
        fagg AS (
            SELECT query_id, doc_id, CAST(sum(c_e9) AS BIGINT) AS rrf_e9, count(*) AS n_systems
            FROM uni GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, rank, rrf_e9, n_systems FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY rrf_e9 DESC, doc_id ASC) AS INT) AS rank
            FROM fagg
        ) WHERE rank <= 10
    """
    q["graph_pagerank"] = """
        WITH pairs AS (
            SELECT DISTINCT l_suppkey AS s, o_custkey + 10000000 AS c
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        e AS (SELECT s AS src, c AS dst FROM pairs UNION SELECT c, s FROM pairs),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT count(*) AS n FROM nodes),
        od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT node, 1000000000 // nn.n AS r FROM nodes CROSS JOIN nn),
        ps1 AS (
            SELECT e.dst AS node, sum(r0.r // od.outdeg) AS s
            FROM e JOIN r0 ON e.src = r0.node JOIN od ON e.src = od.src
            GROUP BY e.dst
        ),
        r1 AS (
            SELECT nodes.node, (150000000 // nn.n) + CAST(round(0.85 * COALESCE(ps1.s, 0)) AS BIGINT) AS r
            FROM nodes CROSS JOIN nn LEFT JOIN ps1 ON nodes.node = ps1.node
        ),
        ps2 AS (
            SELECT e.dst AS node, sum(r1.r // od.outdeg) AS s
            FROM e JOIN r1 ON e.src = r1.node JOIN od ON e.src = od.src
            GROUP BY e.dst
        ),
        r2 AS (
            SELECT nodes.node, (150000000 // nn.n) + CAST(round(0.85 * COALESCE(ps2.s, 0)) AS BIGINT) AS r
            FROM nodes CROSS JOIN nn LEFT JOIN ps2 ON nodes.node = ps2.node
        ),
        ps3 AS (
            SELECT e.dst AS node, sum(r2.r // od.outdeg) AS s
            FROM e JOIN r2 ON e.src = r2.node JOIN od ON e.src = od.src
            GROUP BY e.dst
        ),
        r3 AS (
            SELECT nodes.node, (150000000 // nn.n) + CAST(round(0.85 * COALESCE(ps3.s, 0)) AS BIGINT) AS r
            FROM nodes CROSS JOIN nn LEFT JOIN ps3 ON nodes.node = ps3.node
        )
        SELECT node, r AS r_e9 FROM r3
    """
    q["doc_cms_terms"] = f"""
        WITH w AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
        t AS (SELECT unnest(ws) AS term FROM w),
        cells AS (
            SELECT g.row,
                   ('0x' || substr(md5(term || ':cms:' || g.row), 1, 15))::UBIGINT % 256 AS pos,
                   count(*) AS cnt
            FROM t, (SELECT unnest(generate_series(0, 3)) AS row) g
            GROUP BY g.row, pos
        ),
        probes AS (
            SELECT DISTINCT unnest(ws) AS value FROM w WHERE doc_id % 100 = 0
        ),
        pp AS (
            SELECT p.value, g.row,
                   ('0x' || substr(md5(p.value || ':cms:' || g.row), 1, 15))::UBIGINT % 256 AS pos
            FROM probes p, (SELECT unnest(generate_series(0, 3)) AS row) g
        ),
        est AS (
            SELECT pp.value, min(COALESCE(c.cnt, 0)) AS est_cnt
            FROM pp LEFT JOIN cells c ON pp.row = c.row AND pp.pos = c.pos
            GROUP BY pp.value
        ),
        exact AS (SELECT term, count(*) AS exact_cnt FROM t GROUP BY term)
        SELECT e.value, e.est_cnt, x.exact_cnt
        FROM est e JOIN exact x ON e.value = x.term
    """
    q["doc_nfc"] = """
        WITH seeded AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 = 0
                        THEN text || ' cafe' || chr(769) || ' A' || chr(778) || ' ga' || chr(776) || 'rden'
                        ELSE text END AS text
            FROM documents
        )
        SELECT doc_id,
               coalesce(nfc_normalize(text) <> text, false) AS nfc_changed,
               md5(nfc_normalize(text)) AS nfc_md5
        FROM seeded
    """
    q["emb_semantic_dedup_trained"] = f"""
        WITH {_e_cte}, {_seed_cte}, {_km_cte},
        sdt_pairs AS (
            SELECT a.vec_id AS u, b.vec_id AS w,
                   list_reduce(list_transform(list_zip(a.e, b.e), pr -> pr[1] * pr[2]), (x, y) -> x + y) AS cos
            FROM ka3 a JOIN ka3 b ON a.cell = b.cell AND a.vec_id < b.vec_id
        ),
        sdt_shadow AS (SELECT w, min(u) AS shadow FROM sdt_pairs WHERE cos >= 0.4 GROUP BY w)
        SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
               (s.shadow IS NULL) AS kept, CAST(s.shadow AS BIGINT) AS shadow
        FROM ka3 a LEFT JOIN sdt_shadow s ON a.vec_id = s.w
    """
    q["events_interval_pairs"] = """
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
             c AS (SELECT * FROM events WHERE event_type = 'click')
        SELECT p.user_id, p.event_id AS l_event_id, c.event_id AS r_event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM p JOIN c ON p.user_id = c.user_id
         AND abs(epoch_us(p.ts) - epoch_us(c.ts)) <= 3600000000
    """

    # --- extraction evaluation harness: shared CTE ladder -------------------
    # Mirrors evaluate.py exactly: canonical keys (lower + [^a-z0-9] strip) ->
    # per-side DISTINCT keys (min node wins) -> strict equi-join ->
    # symmetric-unique containment pairs gated on equal digit signatures ->
    # P/R/F1 arithmetic (exact double divisions, no rounding).
    _ev_cte = """
        ev_docs AS (SELECT doc_id, text FROM documents),
        ev_w AS (
            SELECT doc_id,
              coalesce(nullif(regexp_replace(lower(split_part(text,' ',1)),'[^a-z]','','g'),''),'alpha') AS w1,
              coalesce(nullif(regexp_replace(lower(split_part(text,' ',2)),'[^a-z]','','g'),''),'beta') AS w2,
              coalesce(nullif(regexp_replace(lower(split_part(text,' ',3)),'[^a-z]','','g'),''),'gamma') AS w3,
              coalesce(nullif(regexp_replace(lower(split_part(text,' ',4)),'[^a-z]','','g'),''),'delta') AS w4,
              coalesce(nullif(regexp_replace(lower(split_part(text,' ',5)),'[^a-z]','','g'),''),'epsilon') AS w5
            FROM ev_docs),
        ev_tn AS (
            SELECT doc_id, 'R' AS class, 'tR' AS node_id, w1 || ' ' || w2 AS rawid FROM ev_w
            UNION ALL SELECT doc_id, 'E', 'te1', w1 FROM ev_w
            UNION ALL SELECT doc_id, 'E', 'te2', w2 FROM ev_w
            UNION ALL SELECT doc_id, 'E', 'te3', w3 FROM ev_w
            UNION ALL SELECT doc_id, 'E', 'te4', w3 || ' 12' FROM ev_w),
        ev_gn AS (
            SELECT doc_id, 'R' AS class, 'gR' AS node_id, w1 || '-' || w2 AS rawid FROM ev_w
            UNION ALL SELECT doc_id, 'E', 'ge1', upper(w1) FROM ev_w
            UNION ALL SELECT doc_id, 'E', 'ge2', w2 || w4 || 'q' FROM ev_w
            UNION ALL SELECT doc_id, 'E', 'ge9', 'qz' || w5 FROM ev_w
            UNION ALL SELECT doc_id, 'E', 'ge4', w3 || ' 1234' FROM ev_w),
        ev_tkn AS (SELECT doc_id, class, node_id,
              regexp_replace(lower(rawid),'[^a-z0-9]','','g') AS key
            FROM ev_tn),
        ev_gkn AS (SELECT doc_id, class, node_id,
              regexp_replace(lower(rawid),'[^a-z0-9]','','g') AS key
            FROM ev_gn),
        ev_tk AS (SELECT doc_id, class, key, min(node_id) AS node_id,
              coalesce(array_to_string(regexp_extract_all(key,'[0-9]+'),'-'), '') AS sig
            FROM ev_tkn WHERE length(key) > 0 GROUP BY doc_id, class, key),
        ev_gk AS (SELECT doc_id, class, key, min(node_id) AS node_id,
              coalesce(array_to_string(regexp_extract_all(key,'[0-9]+'),'-'), '') AS sig
            FROM ev_gkn WHERE length(key) > 0 GROUP BY doc_id, class, key),
        ev_strict AS (
            SELECT t.doc_id, t.class, t.key, t.node_id AS t_node, g.node_id AS g_node
            FROM ev_tk t JOIN ev_gk g USING (doc_id, class, key)),
        ev_trem AS (SELECT t.* FROM ev_tk t ANTI JOIN ev_strict s USING (doc_id, class, key)),
        ev_grem AS (SELECT g.* FROM ev_gk g ANTI JOIN ev_strict s USING (doc_id, class, key)),
        ev_cand AS (
            SELECT t.doc_id, t.class, t.key AS tkey, g.key AS gkey
            FROM ev_trem t JOIN ev_grem g
              ON t.doc_id = g.doc_id AND t.class = g.class AND t.sig = g.sig
             AND (strpos(g.key, t.key) > 0 OR strpos(t.key, g.key) > 0)),
        ev_pairs AS (
            SELECT doc_id, class, tkey, gkey FROM (
              SELECT *, count(*) OVER (PARTITION BY doc_id, class, tkey) AS nt,
                        count(*) OVER (PARTITION BY doc_id, class, gkey) AS ng
              FROM ev_cand)
            WHERE nt = 1 AND ng = 1),
        ev_nm AS (
            SELECT tc.doc_id, tc.class, tc.truth_n, gc.got_n,
                   coalesce(sc.tp, 0) AS tp, coalesce(rc.rx, 0) AS rx
            FROM (SELECT doc_id, class, count(*) AS truth_n FROM ev_tk GROUP BY 1, 2) tc
            JOIN (SELECT doc_id, class, count(*) AS got_n FROM ev_gk GROUP BY 1, 2) gc USING (doc_id, class)
            LEFT JOIN (SELECT doc_id, class, count(*) AS tp FROM ev_strict GROUP BY 1, 2) sc USING (doc_id, class)
            LEFT JOIN (SELECT doc_id, class, count(*) AS rx FROM ev_pairs GROUP BY 1, 2) rc USING (doc_id, class)),
        ev_nodes AS (
            SELECT doc_id, class, truth_n, got_n,
                   tp AS tp_strict, got_n - tp AS fp_strict, truth_n - tp AS fn_strict,
                   p_s AS p_strict, r_s AS r_strict,
                   CASE WHEN p_s + r_s > 0 THEN 2.0 * p_s * r_s / (p_s + r_s) ELSE 0.0 END AS f1_strict,
                   tp + rx AS tp_relaxed, got_n - tp - rx AS fp_relaxed, truth_n - tp - rx AS fn_relaxed,
                   p_r AS p_relaxed, r_r AS r_relaxed,
                   CASE WHEN p_r + r_r > 0 THEN 2.0 * p_r * r_r / (p_r + r_r) ELSE 0.0 END AS f1_relaxed
            FROM (SELECT *,
                    CASE WHEN got_n > 0 THEN CAST(tp AS DOUBLE) / got_n ELSE 0.0 END AS p_s,
                    CASE WHEN truth_n > 0 THEN CAST(tp AS DOUBLE) / truth_n ELSE 0.0 END AS r_s,
                    CASE WHEN got_n > 0 THEN CAST(tp + rx AS DOUBLE) / got_n ELSE 0.0 END AS p_r,
                    CASE WHEN truth_n > 0 THEN CAST(tp + rx AS DOUBLE) / truth_n ELSE 0.0 END AS r_r
                  FROM ev_nm))
    """
    q["doc_eval_nodes"] = f"""
        WITH {_ev_cte}
        SELECT * FROM ev_nodes
    """
    q["doc_eval_rollup"] = f"""
        WITH {_ev_cte},
        roll AS (
            SELECT class, CAST(count(DISTINCT doc_id) AS BIGINT) AS docs,
                   CAST(sum(tp_strict) AS BIGINT) AS tps, CAST(sum(fp_strict) AS BIGINT) AS fps,
                   CAST(sum(fn_strict) AS BIGINT) AS fns,
                   CAST(sum(tp_relaxed) AS BIGINT) AS tpr, CAST(sum(fp_relaxed) AS BIGINT) AS fpr,
                   CAST(sum(fn_relaxed) AS BIGINT) AS fnr,
                   round(avg(f1_strict), 6) AS mean_f1_strict
            FROM ev_nodes GROUP BY class)
        SELECT class, docs,
               tps AS tp_strict, fps AS fp_strict, fns AS fn_strict,
               p_s AS p_strict, r_s AS r_strict,
               CASE WHEN p_s + r_s > 0 THEN 2.0 * p_s * r_s / (p_s + r_s) ELSE 0.0 END AS f1_strict,
               tpr AS tp_relaxed, fpr AS fp_relaxed, fnr AS fn_relaxed,
               p_r AS p_relaxed, r_r AS r_relaxed,
               CASE WHEN p_r + r_r > 0 THEN 2.0 * p_r * r_r / (p_r + r_r) ELSE 0.0 END AS f1_relaxed,
               mean_f1_strict
        FROM (SELECT *,
                CASE WHEN tps + fps > 0 THEN CAST(tps AS DOUBLE) / (tps + fps) ELSE 0.0 END AS p_s,
                CASE WHEN tps + fns > 0 THEN CAST(tps AS DOUBLE) / (tps + fns) ELSE 0.0 END AS r_s,
                CASE WHEN tpr + fpr > 0 THEN CAST(tpr AS DOUBLE) / (tpr + fpr) ELSE 0.0 END AS p_r,
                CASE WHEN tpr + fnr > 0 THEN CAST(tpr AS DOUBLE) / (tpr + fnr) ELSE 0.0 END AS r_r
              FROM roll)
    """
    q["doc_eval_edges"] = f"""
        WITH {_ev_cte},
        ev_te AS (
            SELECT doc_id, 'tR' AS src, 'te1' AS dst, 'has' AS label FROM ev_w
            UNION ALL SELECT doc_id, 'tR', 'te2', 'has' FROM ev_w
            UNION ALL SELECT doc_id, 'te1', 'te3', 'rel' FROM ev_w),
        ev_ge AS (
            SELECT doc_id, 'gR' AS src, 'ge1' AS dst, 'has' AS label FROM ev_w
            UNION ALL SELECT doc_id, 'gR', 'ge1', 'has' FROM ev_w
            UNION ALL SELECT doc_id, 'gR', 'ge2', 'has' FROM ev_w
            UNION ALL SELECT doc_id, 'ge1', 'ge9', 'rel' FROM ev_w),
        ev_tmap AS (SELECT doc_id, node_id, class, key FROM ev_tkn WHERE length(key) > 0),
        ev_gmap AS (SELECT doc_id, node_id, class, key FROM ev_gkn WHERE length(key) > 0),
        ev_tek AS (
            SELECT DISTINCT e.doc_id, e.label, s.class AS sclass, s.key AS skey,
                   d.class AS dclass, d.key AS dkey
            FROM ev_te e
            JOIN ev_tmap s ON e.doc_id = s.doc_id AND e.src = s.node_id
            JOIN ev_tmap d ON e.doc_id = d.doc_id AND e.dst = d.node_id),
        ev_gek AS (
            SELECT DISTINCT e.doc_id, e.label, s.class AS sclass, s.key AS skey,
                   d.class AS dclass, d.key AS dkey
            FROM ev_ge e
            JOIN ev_gmap s ON e.doc_id = s.doc_id AND e.src = s.node_id
            JOIN ev_gmap d ON e.doc_id = d.doc_id AND e.dst = d.node_id),
        ev_gek_r AS (
            SELECT DISTINCT g.doc_id, g.label, g.sclass,
                   coalesce(ps.tkey, g.skey) AS skey, g.dclass,
                   coalesce(pd.tkey, g.dkey) AS dkey
            FROM ev_gek g
            LEFT JOIN ev_pairs ps ON g.doc_id = ps.doc_id AND g.sclass = ps.class AND g.skey = ps.gkey
            LEFT JOIN ev_pairs pd ON g.doc_id = pd.doc_id AND g.dclass = pd.class AND g.dkey = pd.gkey),
        ev_labels AS (
            SELECT DISTINCT doc_id, label FROM ev_tek
            UNION SELECT DISTINCT doc_id, label FROM ev_gek),
        ev_em AS (
            SELECT l.doc_id, l.label,
                   coalesce(tn.truth_n, 0) AS truth_n,
                   coalesce(gs.got_s, 0) AS got_s, coalesce(ts.tp_s, 0) AS tp_s,
                   coalesce(gr.got_r, 0) AS got_r, coalesce(tr.tp_r, 0) AS tp_r
            FROM ev_labels l
            LEFT JOIN (SELECT doc_id, label, count(*) AS truth_n FROM ev_tek GROUP BY 1, 2) tn USING (doc_id, label)
            LEFT JOIN (SELECT doc_id, label, count(*) AS got_s FROM ev_gek GROUP BY 1, 2) gs USING (doc_id, label)
            LEFT JOIN (SELECT t.doc_id, t.label, count(*) AS tp_s FROM ev_tek t
                       SEMI JOIN ev_gek g ON t.doc_id = g.doc_id AND t.label = g.label
                         AND t.sclass = g.sclass AND t.skey = g.skey
                         AND t.dclass = g.dclass AND t.dkey = g.dkey
                       GROUP BY 1, 2) ts USING (doc_id, label)
            LEFT JOIN (SELECT doc_id, label, count(*) AS got_r FROM ev_gek_r GROUP BY 1, 2) gr USING (doc_id, label)
            LEFT JOIN (SELECT t.doc_id, t.label, count(*) AS tp_r FROM ev_tek t
                       SEMI JOIN ev_gek_r g ON t.doc_id = g.doc_id AND t.label = g.label
                         AND t.sclass = g.sclass AND t.skey = g.skey
                         AND t.dclass = g.dclass AND t.dkey = g.dkey
                       GROUP BY 1, 2) tr USING (doc_id, label))
        SELECT doc_id, label, truth_n, got_s AS got_n,
               tp_s AS tp_strict, got_s - tp_s AS fp_strict, truth_n - tp_s AS fn_strict,
               p_s AS p_strict, r_s AS r_strict,
               CASE WHEN p_s + r_s > 0 THEN 2.0 * p_s * r_s / (p_s + r_s) ELSE 0.0 END AS f1_strict,
               tp_r AS tp_relaxed, got_r - tp_r AS fp_relaxed, truth_n - tp_r AS fn_relaxed,
               p_r AS p_relaxed, r_r AS r_relaxed,
               CASE WHEN p_r + r_r > 0 THEN 2.0 * p_r * r_r / (p_r + r_r) ELSE 0.0 END AS f1_relaxed
        FROM (SELECT *,
                CASE WHEN got_s > 0 THEN CAST(tp_s AS DOUBLE) / got_s ELSE 0.0 END AS p_s,
                CASE WHEN truth_n > 0 THEN CAST(tp_s AS DOUBLE) / truth_n ELSE 0.0 END AS r_s,
                CASE WHEN got_r > 0 THEN CAST(tp_r AS DOUBLE) / got_r ELSE 0.0 END AS p_r,
                CASE WHEN truth_n > 0 THEN CAST(tp_r AS DOUBLE) / truth_n ELSE 0.0 END AS r_r
              FROM ev_em)
    """
    _ev_attrs = """
        ev_ta AS (
            SELECT doc_id, 'tR' AS node_id, 'year' AS field, '2024' AS val FROM ev_w
            UNION ALL SELECT doc_id, 'tR', 'desc', w3 FROM ev_w
            UNION ALL SELECT doc_id, 'te1', 'kind', 'org' FROM ev_w
            UNION ALL SELECT doc_id, 'te1', 'city', w4 FROM ev_w
            UNION ALL SELECT doc_id, 'te2', 'kind', 'org' FROM ev_w
            UNION ALL SELECT doc_id, 'te3', 'm3', w4 FROM ev_w
            UNION ALL SELECT doc_id, 'te4', 'm4', w5 FROM ev_w),
        ev_ga AS (
            SELECT doc_id, 'gR' AS node_id, 'year' AS field, '2024' AS val FROM ev_w
            UNION ALL SELECT doc_id, 'gR', 'desc', '' FROM ev_w
            UNION ALL SELECT doc_id, 'ge1', 'kind', 'org' FROM ev_w
            UNION ALL SELECT doc_id, 'ge1', 'city', '' FROM ev_w
            UNION ALL SELECT doc_id, 'ge2', 'kind', 'org' FROM ev_w
            UNION ALL SELECT doc_id, 'ge9', 'm3', w4 FROM ev_w
            UNION ALL SELECT doc_id, 'ge4', 'm4', 'zz' FROM ev_w)
    """
    q["doc_eval_fill"] = f"""
        WITH {_ev_cte},
        {_ev_attrs},
        ev_fill AS (
            SELECT s.class, a.field,
                   CASE WHEN ga.val IS NOT NULL AND length(trim(ga.val)) > 0 THEN 1 ELSE 0 END AS ok
            FROM ev_strict s
            JOIN ev_ta a ON a.doc_id = s.doc_id AND a.node_id = s.t_node
            LEFT JOIN ev_ga ga ON ga.doc_id = s.doc_id AND ga.node_id = s.g_node AND ga.field = a.field
            WHERE a.val IS NOT NULL AND length(trim(a.val)) > 0)
        SELECT class, field, CAST(sum(ok) AS BIGINT) AS filled, count(*) AS expected
        FROM ev_fill GROUP BY class, field
        ORDER BY class, field
    """
    # Aligned rung: the synthesized attrs partition by field name, so the
    # operator's greedy best-first pairing reduces to mutual-unique
    # exact-field-match pairing — expressible relationally.
    q["doc_eval_aligned"] = f"""
        WITH {_ev_cte},
        {_ev_attrs},
        ev_trem2 AS (
            SELECT t.* FROM ev_trem t
            ANTI JOIN ev_pairs p ON t.doc_id = p.doc_id AND t.class = p.class AND t.key = p.tkey),
        ev_grem2 AS (
            SELECT g.* FROM ev_grem g
            ANTI JOIN ev_pairs p ON g.doc_id = p.doc_id AND g.class = p.class AND g.key = p.gkey),
        ev_acand AS (
            SELECT t.doc_id, t.class, t.key AS tkey, g.key AS gkey
            FROM ev_trem2 t
            JOIN ev_grem2 g ON t.doc_id = g.doc_id AND t.class = g.class
            JOIN ev_ta a ON a.doc_id = t.doc_id AND a.node_id = t.node_id
            JOIN ev_ga b ON b.doc_id = g.doc_id AND b.node_id = g.node_id AND b.field = a.field
            WHERE length(trim(a.val)) > 0 AND length(trim(b.val)) > 0
              AND trim(regexp_replace(lower(a.val), '\\s+', ' ', 'g'))
                = trim(regexp_replace(lower(b.val), '\\s+', ' ', 'g'))
            GROUP BY 1, 2, 3, 4),
        ev_apairs AS (
            SELECT doc_id, class, tkey, gkey FROM (
              SELECT *, count(*) OVER (PARTITION BY doc_id, class, tkey) AS nt,
                        count(*) OVER (PARTITION BY doc_id, class, gkey) AS ng
              FROM ev_acand)
            WHERE nt = 1 AND ng = 1),
        ev_ax AS (SELECT doc_id, class, count(*) AS ax FROM ev_apairs GROUP BY 1, 2),
        ev_full AS (
            SELECT n.*, coalesce(x.ax, 0) AS ax
            FROM ev_nodes n LEFT JOIN ev_ax x USING (doc_id, class))
        SELECT doc_id, class, truth_n, got_n,
               tp_strict, fp_strict, fn_strict, p_strict, r_strict, f1_strict,
               tp_relaxed, fp_relaxed, fn_relaxed, p_relaxed, r_relaxed, f1_relaxed,
               tp_relaxed + ax AS tp_aligned,
               fp_relaxed - ax AS fp_aligned,
               fn_relaxed - ax AS fn_aligned,
               p_a AS p_aligned, r_a AS r_aligned,
               CASE WHEN p_a + r_a > 0 THEN 2.0 * p_a * r_a / (p_a + r_a) ELSE 0.0 END AS f1_aligned
        FROM (SELECT *,
                CASE WHEN tp_relaxed + ax + fp_relaxed - ax > 0
                     THEN CAST(tp_relaxed + ax AS DOUBLE) / (tp_relaxed + fp_relaxed) ELSE 0.0 END AS p_a,
                CASE WHEN tp_relaxed + ax + fn_relaxed - ax > 0
                     THEN CAST(tp_relaxed + ax AS DOUBLE) / (tp_relaxed + fn_relaxed) ELSE 0.0 END AS r_a
              FROM ev_full)
    """
    q["doc_eval_verbatim"] = """
        WITH vdocs AS (
            SELECT doc_id, text,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS src
            FROM documents),
        vattrs AS (
            SELECT doc_id, substr(text, 1, 100) AS val FROM vdocs
            UNION ALL SELECT doc_id, substr(text, 1, 100) || ' qqzzqq' FROM vdocs
            UNION ALL SELECT doc_id, 'abc' FROM vdocs),
        vlong AS (
            SELECT a.doc_id,
                   trim(regexp_replace(lower(a.val), '\\s+', ' ', 'g')) AS v,
                   d.src
            FROM vattrs a JOIN vdocs d USING (doc_id)
            WHERE length(a.val) >= 80)
        SELECT doc_id, count(*) AS verbatim_n,
               CAST(sum(CASE WHEN strpos(src, v) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS verbatim_hits,
               CAST(sum(CASE WHEN strpos(src, v) > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS verbatim_ratio
        FROM vlong GROUP BY doc_id
    """
    return q
