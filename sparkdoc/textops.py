"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

All hot-path operators are pure Spark exprs (whole-stage codegen); the only
pandas UDF is the rolling-hash fingerprint (sequential per string). Every
expr here has an exact ANSI-SQL twin used by the DuckDB oracle — keep the
two in sync (see __spark_entry__.py oracle_sql)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# --- tokenization -------------------------------------------------------------

#: BPE-ish token pattern: alnum runs OR single non-alnum-non-space marks
TOKEN_PATTERN = "[a-z0-9]+|[^a-z0-9\\s]"


def words(col: Column) -> Column:
    """Lowercased alphanumeric word array."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda w: w != "")


def word_count(col: Column) -> Column:
    """0 for NULL text — size(NULL) is -1/NULL depending on ANSI mode, and a
    negative count silently poisons every downstream aggregate (avgdl,
    quality features, histograms)."""
    return F.when(col.isNull(), F.lit(0)).otherwise(F.size(words(col)))


def token_count(col: Column) -> Column:
    """BPE-ish token count (words + punctuation marks); 0 for NULL text
    (same trap as word_count)."""
    return F.when(col.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0))
    )


def tokenize_ids(
    df: DataFrame, text_col: str = "text", out: str = "token_ids"
) -> DataFrame:
    """Emit WordPiece token ids per document — the step that turns a curated
    corpus into ACTUAL training shards (ids, not counts): ``out`` is
    ``array<int>`` in committed-vocab file order (id stability pinned by the
    vocab hash in FIXTURES.md), plus ``n_tokens`` = its length (equals
    :func:`sparkdoc.wordpiece.WordPiece.count` by construction — an
    uncoverable word is one ``UNK_ID``); NULL text → empty array, n_tokens 0.

    Scale shape: ONE Arrow-batched pandas UDF, zero shuffles — composes with
    :func:`sparkdoc.filters.pack_sequences` (budget on ``n_tokens``, then
    write shards carrying the ids). The tokenizer memoizes per-word id
    sequences, loaded once per executor process.
    """
    from pyspark.sql.types import ArrayType, IntegerType

    @pandas_udf(ArrayType(IntegerType()))
    def _enc(s: pd.Series) -> pd.Series:
        from sparkdoc.wordpiece import default_tokenizer

        tok = default_tokenizer()
        return s.map(lambda t: tok.encode(t) if t is not None else [])

    return df.withColumn(out, _enc(F.col(text_col))).withColumn(
        "n_tokens", F.size(F.col(out))
    )


# --- language ID (n-gram/stopword heuristic) -----------------------------------

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "with", "as", "on"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "dans", "pour", "du"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu", "für"],
    "es": ["el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por", "con"],
}
LANG_ORDER = ("en", "fr", "de", "es")  # deterministic tie-break precedence


def lang_hits(col: Column, lang: str) -> Column:
    # delegate so the hit-counting expr (and its DuckDB oracle twin) has ONE
    # definition to keep in sync
    return _lang_hits_of(words(col), lang)


def _lang_hits_of(words_col: Column, lang: str) -> Column:
    wl = STOPWORDS[lang]
    return F.size(F.filter(words_col, lambda w: w.isin(*wl)))


def with_language(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Language-ID as a column pipeline: the word array is materialized ONCE
    (see dedup_text.shingles_of performance contract), then each language's
    stopword hits scan the bound array."""
    df = df.withColumn("_lid_words", words(F.col(text_col)))
    return df.withColumn(out, detect_language_of(F.col("_lid_words"))).drop("_lid_words")


def detect_language_of(words_col: Column) -> Column:
    """argmax over stopword hits (fixed precedence) from a word-array column."""
    hits = {lang: _lang_hits_of(words_col, lang) for lang in LANG_ORDER}
    best = None
    for lang in LANG_ORDER:
        cond = hits[lang] > 0
        for other in LANG_ORDER:
            if other == lang:
                continue
            # strict > for later-precedence langs, >= for earlier
            if LANG_ORDER.index(other) < LANG_ORDER.index(lang):
                cond = cond & (hits[lang] > hits[other])
            else:
                cond = cond & (hits[lang] >= hits[other])
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("und")


def detect_language(col: Column) -> Column:
    """Column-style wrapper (re-derives the word array per language — prefer
    with_language for hot paths)."""
    return detect_language_of(words(col))


# --- encoding repair (mojibake) ---------------------------------------------------

#: characters whose UTF-8 bytes, mis-decoded as Windows-1252, produce the
#: classic web mojibake ('Ã©' for 'é', 'â€™' for a right quote, ...). The
#: repair table is GENERATED from these lists by round-tripping each char
#: through the actual encodings, so the table cannot drift from the bytes.
#: Scope: Latin-1 supplement letters + punctuation/symbols — the
#: deterministic, oracle-checkable core of what ftfy (Speer 2019, "ftfy:
#: fixes text for you", zenodo 2591652) fixes heuristically.
#: 3-byte UTF-8 (E2/E2-82 sequences): fixed FIRST (their mojibake contains
#: 'â' = a C3-pair lead that must not be consumed early)
_MOJIBAKE_3BYTE = "€’‘“”–—…•™‰‚„†‡‹›"
#: C2-xx pairs: the FULL U+00A0..U+00BF symbol block (incl. nbsp and soft
#: hyphen) + 'Ÿ' (the cp1252 spelling of ß's second byte). Fixed BEFORE the
#: C3 pairs so doubly-encoded letters ('ÃƒÂ¼') resolve: bridge -> 'ÃÂ¼',
#: C2 pass -> 'Ã¼', second pass -> 'ü'.
_MOJIBAKE_C2 = "\xa0¡¢£¤¥¦§¨©ª«¬\xad®¯°±²³´µ¶·¸¹º»¼½¾¿"
#: other 2-byte pairs (C5/C6/CB leads): cp1252's 0x80-0x9F printables —
#: these appear both as direct mojibake and as intermediates of doubly-
#: encoded text ('Ÿ' is ß's second byte, '‚' is €'s)
_MOJIBAKE_MISC2 = "ŸšŠžŽœŒƒˆ˜"
#: C3-xx pairs: Latin-1 supplement letters + math symbols (Å/Æ/Ë double as
#: the lead-byte bridges for the MISC2 class's double encodings)
_MOJIBAKE_C3 = "éèêëáàâäãåóòôöõúùûüíìîïñçßÉÅÆË÷×"


def _mojibake_of(ch: str) -> str:
    """The cp1252 mis-decoding of ch's UTF-8 bytes; bytes undefined in
    cp1252 (0x81 8D 8F 90 9D) pass through as their Latin-1 control char,
    matching how browsers and lenient decoders render them."""
    out = []
    for b in ch.encode("utf-8"):
        if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
            out.append(chr(b))
        else:
            out.append(bytes([b]).decode("cp1252"))
    return "".join(out)


#: ordered (bad, good) pairs. Order matters within a pass: 3-byte sequences,
#: then the double-encode bridges ('Ãƒ' = C3 83 -> 'Ã', 'Ã‚' = C2 82 lead
#: -> 'Â' — the mojibake of the mojibake lead bytes), then C2 pairs, then
#: C3 pairs — so a doubly-encoded char resolves within the two passes.
MOJIBAKE_TABLE: list[tuple[str, str]] = (
    [(_mojibake_of(c), c) for c in _MOJIBAKE_3BYTE]
    # bridges: the mojibake of the C3/C2 lead bytes themselves, plus the
    # cp1252-undefined 0x9D ('”'s third byte) behind a C2 lead
    + [("Ãƒ", "Ã"), ("Ã‚", "Â"), ("Â\x9d", "\x9d")]
    + [(_mojibake_of(c), c) for c in _MOJIBAKE_C2]
    + [(_mojibake_of(c), c) for c in _MOJIBAKE_MISC2]
    + [(_mojibake_of(c), c) for c in _MOJIBAKE_C3]
)


def fix_mojibake(col: Column, passes: int = 2) -> Column:
    """Repair UTF-8-bytes-decoded-as-cp1252 mojibake by the ordered literal
    replace chain in MOJIBAKE_TABLE, applied ``passes`` times (two passes
    resolve doubly-encoded text — 'Ã¢â‚¬â„¢' -> 'â€™' -> '’'). Pure
    codegen string replaces; NULL in -> NULL out.

    Heuristic caveat (inherent to all mojibake repair): text that GENUINELY
    contains a sequence like 'Ã©' is rewritten; on web corpora the
    mis-encoding reading is overwhelmingly the correct one."""
    for _ in range(passes):
        for bad, good in MOJIBAKE_TABLE:
            col = F.replace(col, F.lit(bad), F.lit(good))
    return col


def with_fixed_encoding(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_fixed`` (mojibake-repaired text) and ``had_mojibake``
    (1 where the repair changed anything). Map-side only, no shuffle."""
    fixed = fix_mojibake(F.col(text_col))
    return df.withColumn("text_fixed", fixed).withColumn(
        "had_mojibake",
        (~F.col(text_col).eqNullSafe(F.col("text_fixed"))).cast("int"),
    )


# --- quality scoring ------------------------------------------------------------


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shallow quality features (Gopher/C4-style public heuristics):
    word count, mean word length, punctuation-terminated, stopword fraction,
    symbol ratio, repetition (distinct-word fraction)."""
    t = F.col(text_col)
    df = df.withColumn("_qf_words", words(t))  # materialized once (linear)
    w = F.col("_qf_words")
    n_words = F.size(w)
    n_chars = F.length(t)
    alnum_chars = F.length(F.regexp_replace(F.lower(t), "[^a-z0-9]", ""))
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS["en"])))
    distinct_frac = F.when(n_words > 0, F.size(F.array_distinct(w)) / n_words).otherwise(0.0)
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars_obs", n_chars)
        .withColumn(
            "mean_word_len",
            F.when(n_words > 0, F.aggregate(w, F.lit(0), lambda a, x: a + F.length(x)) / n_words).otherwise(0.0),
        )
        .withColumn("symbol_ratio", F.when(n_chars > 0, (n_chars - alnum_chars) / n_chars).otherwise(0.0))
        .withColumn("stop_fraction", F.when(n_words > 0, stop_hits / n_words).otherwise(0.0))
        .withColumn("distinct_word_fraction", distinct_frac)
        .withColumn(
            "ends_with_punct", F.when(F.regexp_like(t, F.lit("[.!?]\\s*$")), 1).otherwise(0)
        )
        .drop("_qf_words")
    )


def quality_filter(df: DataFrame, text_col: str = "text", min_words: int = 10, max_symbol_ratio: float = 0.6) -> DataFrame:
    """C4-style keep/drop flag over the features."""
    feats = quality_features(df, text_col)
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("distinct_word_fraction") >= 0.2)
    )
    return feats.withColumn("quality_keep", keep.cast("int"))


# --- fingerprinting ---------------------------------------------------------------


def doc_fingerprint(col: Column) -> Column:
    """md5 of whitespace-normalized lowercase text — the cheap exact-dup key."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), "\\s+", " ")))


def rolling_fingerprints(df: DataFrame, text_col: str = "text", window: int = 16, mod_bits: int = 61) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint set per doc (pandas UDF —
    sequential per string, Arrow-batched; scale path for fuzzy containment).
    Emits min-sampled polynomial hashes of char windows."""
    MOD = (1 << mod_bits) - 1
    BASE = 257

    @pandas_udf("array<long>")
    def _fp(s: pd.Series) -> pd.Series:
        def fps(text: str) -> list[int]:
            # gate on BYTE length only — windows are byte windows, and a
            # short-in-chars multibyte text can still hold >= window bytes
            if not text:
                return []
            data = text.lower().encode("utf-8", "ignore")
            if len(data) < window:
                return []
            poww = pow(BASE, window - 1, MOD)
            h = 0
            out = set()
            for i, b in enumerate(data):
                if i >= window:
                    h = (h - data[i - window] * poww) % MOD
                h = (h * BASE + b) % MOD
                if i >= window - 1 and h % 8 == 0:  # 1/8 min-sampling
                    out.add(h)
            return sorted(out)[:128]

        return s.map(fps)

    return df.withColumn("fingerprints", _fp(F.col(text_col)))


# --- TF-IDF top terms ---------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (tf · ln((N+1)/(df+1))): the standard keyword/topic signal for corpus
    exploration and quality triage. Pure DataFrame ops: explode → two
    aggregations → window top-k; the corpus size N rides in as a broadcast
    1-row frame, so there is NO driver action inside the plan.

    Determinism: ranking is (score DESC, term ASC); equal (tf, df) pairs
    give bit-identical scores, so the tiebreak is exact. Scale shape: the
    (doc, term) tf agg and the term df agg are both map-side combined;
    the df join is an equi-join on term (hot terms are ONE row on the agg
    side); the top-k window partitions by doc (bounded per-partition).

    Returns (id, term, tf, df_docs, score, rank), rank 1..k per doc.
    """
    terms = df.select(id_col, F.explode(words(F.col(text_col))).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_docs"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log((F.col("_n") + 1) / (F.col("df_docs") + 1)), 6
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df_docs", "score", "rank")
    )


# --- corpus-trained bigram LM scoring ------------------------------------------------


def bigram_lm_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average bigram log-probability under an add-one-smoothed
    bigram model trained on the corpus ITSELF — the self-contained version of
    KenLM-perplexity quality filtering (CCNet's public recipe): documents
    that look unlike the corpus (gibberish, wrong language, boilerplate
    soup) score low, without any external model artifact.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), score = mean over the doc's
    bigram instances of ln P. Docs with < 2 words get score NULL (0 bigrams).

    Scale shape: bigram instances explode once; the count model is two
    map-side-combined aggs over (w1,w2) and w1; the vocabulary size V is a
    broadcast 1-row frame; scoring is an equi-join of instances against the
    count tables (hot bigrams are ONE row on the agg side). No Python, no
    window, no driver action.

    Returns (id, n_bigrams, lm_score) with lm_score rounded to 6 decimals.
    """
    w = df.select(id_col, words(F.col(text_col)).alias("_ws"))
    bg = w.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_ws"), 1, F.greatest(F.size("_ws") - 1, F.lit(0))).alias("w1"),
                F.slice(F.col("_ws"), 2, F.greatest(F.size("_ws") - 1, F.lit(0))).alias("w2"),
            )
        ).alias("_bg"),
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = w.select(F.explode("_ws").alias("_t")).agg(
        F.count_distinct("_t").alias("_v")
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("_lp", F.log((F.col("c12") + 1) / (F.col("c1") + F.col("_v"))))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_bigrams"), F.round(F.avg("_lp"), 6).alias("lm_score"))
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("int").alias("n_bigrams"),
            "lm_score",
        )
    )
