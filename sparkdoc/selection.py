"""Data selection via importance resampling (DSIR) — pick training docs
whose hashed n-gram distribution looks like a TARGET corpus.

Method (public): Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023. Features are hashed unigrams+bigrams
(bag-of-ngrams); a smoothed bucket distribution is fit on the target and on
the raw pool; each raw doc gets an importance weight
``log w(x) = sum_b count_b(x) * (log p_target[b] - log p_raw[b])``; the
selected subset is the Gumbel-top-k over ``log w + g`` (equivalent to
sampling without replacement with probability proportional to ``w``).

Engine-portability contract (same trick as sparkdoc/classifier.py): the
per-bucket log-ratio is quantized to integer MICRO-units (``lr_e6``), so a
document's weight is an exact BIGINT sum — order-independent, bit-identical
in any engine (double summation is order-dependent; integer summation is
not). The Gumbel key is derived from md5(doc_id:seed) — deterministic,
reproducible in ANSI SQL (the DuckDB gate twins recompute the whole chain).

Scale shape (100 TB story):
  * feature hashing is explode → ONE codegen md5 per n-gram → integer mod —
    whole-stage codegen end-to-end, no Python;
  * the fitted model is ``n_buckets`` rows (default 4096) → broadcast join;
    fitting itself is two map-side-combined count aggs + one tiny join;
  * per-doc weights are one narrow shuffle on the id;
  * top-k selection is ``orderBy(...).limit(k)`` → Spark's
    TakeOrderedAndProject (per-partition top-k, merge of k·partitions rows
    on the driver) — never a global sort.

The word split is textops.words (ONE definition shared with language-ID /
quality / TF-IDF so every text operator tokenizes identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdoc.textops import words

#: micro-unit scale for quantized log-ratios / Gumbel keys
E6 = 1_000_000
#: 2^31 - 1 — same modulus family as dedup_text.MINHASH_MODULUS
_M31 = 2_147_483_647


def _hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT (< 2^63, conv-exact) —
    the repo's standard engine-portable hash (dedup_text.py idiom)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ngram_feature_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """(id, bucket, cnt) hashed unigram+bigram counts per document.

    Features are tagged strings (``u:<w>`` / ``b:<w1> <w2>``) so a unigram
    can never collide with a bigram before hashing. The word array is
    materialized as a bound column FIRST (PLANS lesson #3: a multi-referenced
    array subexpression inside an HOF lambda re-evaluates per element).
    Docs with no words contribute no rows (callers left-join + coalesce 0).
    """
    w = df.select(id_col, words(F.col(text_col)).alias("_w"))
    feats = w.select(id_col, F.explode(_tagged_ngrams()).alias("_f"))
    bucket = (_hash60(F.concat(F.col("_f"), F.lit(salt))) % n_buckets).alias("bucket")
    return (
        feats.select(id_col, bucket)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _tagged_ngrams():
    """THE DSIR feature definition (tagged unigrams + bigrams over a bound
    ``_w`` word array) — one copy shared by the per-doc and corpus-total
    paths, so the model can never be fit on one feature space and documents
    scored on another."""
    uni = F.transform(F.col("_w"), lambda x: F.concat(F.lit("u:"), x))
    bi = F.when(
        F.size("_w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - 1),
            lambda i: F.concat(
                F.lit("b:"),
                F.element_at("_w", i),
                F.lit(" "),
                F.element_at("_w", i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(uni, bi)


def _corpus_bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, salt: str
) -> DataFrame:
    """(bucket, cnt) totals over a whole corpus — explode → md5 → one
    map-side-combined count agg (no per-doc intermediate)."""
    w = df.select(words(F.col(text_col)).alias("_w"))
    feats = w.select(F.explode(_tagged_ngrams()).alias("_f"))
    bucket = (_hash60(F.concat(F.col("_f"), F.lit(salt))) % n_buckets).alias("bucket")
    return feats.select(bucket).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def fit_dsir_model(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """Fit the DSIR bucket model: (bucket, t_cnt, r_cnt, lr_e6).

    ``lr_e6 = round(1e6 * (ln p_target[b] - ln p_raw[b]))`` with add-alpha
    smoothing ``p[b] = (cnt_b + alpha) / (total + alpha * n_buckets)``
    (Xie et al. §3; smoothing keeps unseen buckets finite). The output is
    ``n_buckets`` rows — tiny; persist/broadcast it. All buckets are emitted
    (dense spine via spark.range) so the join side never misses a key.
    """
    # derive the session from an input frame — getActiveSession() is None on
    # non-creating threads (e.g. a ThreadPoolExecutor fanning out fits)
    spark = target.sparkSession
    tc = _corpus_bucket_counts(target, text_col, n_buckets, salt)
    rc = _corpus_bucket_counts(raw, text_col, n_buckets, salt)
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    m = (
        spine.join(tc.withColumnRenamed("cnt", "t_cnt"), "bucket", "left")
        .join(rc.withColumnRenamed("cnt", "r_cnt"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
    )
    # scalar totals ride in on a 1-row cross join (never a driver action)
    totals = m.agg(
        F.sum("t_cnt").alias("_tt"), F.sum("r_cnt").alias("_rt")
    )
    a, b = F.lit(float(alpha)), F.lit(float(alpha * n_buckets))
    lr = F.log((F.col("t_cnt") + a) / (F.col("_tt") + b)) - F.log(
        (F.col("r_cnt") + a) / (F.col("_rt") + b)
    )
    return (
        m.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.col("t_cnt").cast("long").alias("t_cnt"),
            F.col("r_cnt").cast("long").alias("r_cnt"),
            F.round(lr * E6).cast("long").alias("lr_e6"),
        )
    )


def dsir_weights(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """(id, n_feats, logw_e6) — exact BIGINT importance weight per doc.

    ``logw_e6 = sum_b cnt_b * lr_e6[b]`` (integer, order-independent).
    Docs with no features keep weight 0 (left join + coalesce), matching the
    paper's empty-product convention. One shuffle on the id; the model join
    is an explicit broadcast.
    """
    cnts = ngram_feature_rows(df, text_col, id_col, n_buckets, salt)
    per_doc = (
        cnts.join(F.broadcast(model.select("bucket", "lr_e6")), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("lr_e6")).alias("logw_e6"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("logw_e6", F.lit(0)).cast("long").alias("logw_e6"),
        )
    )


def gumbel_e6(id_col: Column, seed: int) -> Column:
    """Deterministic Gumbel(0,1) key in micro-units, derived from
    md5(id:seed): u = (h31 + 1) / (2^31 + 1) ∈ (0,1), g = -ln(-ln(u)).
    Same double in any engine (exact integer → double, one division, two
    lns — the ln-parity idiom doc_top_terms/doc_lm_score already rely on).
    """
    h = _hash60(F.concat(id_col.cast("string"), F.lit(":"), F.lit(str(seed)))) % _M31
    u = (h + 1) / F.lit(float(_M31 + 2))
    return F.round(-F.log(-F.log(u)) * E6).cast("long")


def dsir_select(
    df: DataFrame,
    model: DataFrame,
    k: int,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    salt: str = "dsir",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k selection: top ``k`` docs by
    ``score_e6 = logw_e6 / temperature + gumbel_e6`` (ties broken on id).

    temperature=1 is the paper's sampling-without-replacement; temperature→0
    approaches deterministic top-k by weight (pass ``temperature=0`` for
    exactly that: the Gumbel term is dropped, not divided). The sort+limit
    compiles to TakeOrderedAndProject — per-partition top-k, no global sort.
    Output: (rank, id, n_feats, logw_e6, gumbel_e6, score_e6).

    Docs with NO features are excluded: their log-weight is the empty sum 0,
    i.e. w=1, which would outrank every doc with negative log-weight — an
    empty document is not "most target-like"; it carries no evidence at all.
    """
    wts = dsir_weights(df, model, text_col, id_col, n_buckets, salt).where(
        F.col("n_feats") > 0
    )
    g = gumbel_e6(F.col(id_col), seed).alias("gumbel_e6")
    if temperature == 0:
        score = F.col("logw_e6")
    elif temperature == 1.0:
        score = F.col("logw_e6") + F.col("gumbel_e6")
    else:
        score = (
            F.round(F.col("logw_e6") / F.lit(float(temperature))).cast("long")
            + F.col("gumbel_e6")
        )
    scored = wts.select(id_col, "n_feats", "logw_e6", g).select(
        id_col, "n_feats", "logw_e6", "gumbel_e6", score.cast("long").alias("score_e6")
    )
    top = scored.orderBy(F.desc("score_e6"), F.col(id_col)).limit(k)
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.orderBy(F.desc("score_e6"), F.col(id_col))
    )
    return top.select(
        rk.cast("int").alias("rank"),
        id_col,
        "n_feats",
        "logw_e6",
        "gumbel_e6",
        "score_e6",
    )
