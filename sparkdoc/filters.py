"""Corpus-level filters for training-data pipelines: Gopher-style repetition
statistics, PII detection/redaction, and benchmark decontamination.

These extend the reference's quality surface (docling-graph has no corpus
filters — its gates are per-document admission checks,
core/input/handlers.py) with the standard web-corpus curation operators
published in Gopher (Rae et al. 2021, §A1.1 repetition filters) and the
decontamination procedure of GPT-3 (Brown et al. 2020, §C) — n-gram overlap
against a benchmark set.

Scale shape:
- repetition stats: per-document map-side computation ONLY (JVM exprs for
  line stats, one Arrow-batched pandas UDF for n-gram counting — a Counter
  pass is O(words), where the pure-expr alternative is O(distinct·words)
  interpreted array scans). No shuffle anywhere.
- PII: pure JVM regexp exprs (whole-stage codegen), no Python.
- decontamination: benchmark n-gram hash set is small by construction →
  broadcast hash join against exploded document shingles; at 100 TB swap the
  broadcast for a bloom filter pushed into the scan, same plan shape.

Every operator is deterministic and has an exact DuckDB twin (see
__spark_entry__.oracle_sql): counts are emitted as integers, never rounded
floats — Python's banker's rounding and SQL half-away-from-zero disagree on
exact .5 boundaries (e.g. 1/128 at 6 dp), so fractions are derived by the
caller from the integer numerators/denominators.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sparkdoc.textops import STOPWORDS, words

# --- Gopher-style repetition statistics --------------------------------------


def _nonempty_lines(col: Column) -> Column:
    # NULL-safe: split(NULL) is NULL and size(NULL) is -1 — a NULL-text doc
    # would otherwise report n_lines = -1 instead of 0
    return F.filter(F.split(F.coalesce(col, F.lit("")), "\n"), lambda l: l != "")


def with_line_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate-line statistics (Gopher §A1.1 'duplicate line fraction'),
    pure JVM exprs: lines are the nonempty '\\n'-separated segments.

    Adds integer columns:
      n_lines            nonempty lines
      n_dup_lines        occurrences beyond the first of each distinct line
      dup_line_chars     characters in those beyond-first occurrences
      total_line_chars   characters across all nonempty lines
    """
    sum_len = lambda arr: F.aggregate(  # noqa: E731 — shared fold shape
        arr, F.lit(0).cast("long"), lambda acc, l: acc + F.length(l)
    )
    df = df.withColumn("_lines", _nonempty_lines(F.col(text_col)))
    df = df.withColumn("_dlines", F.array_distinct(F.col("_lines")))
    return (
        df.withColumn("n_lines", F.size("_lines").cast("long"))
        .withColumn(
            "n_dup_lines",
            (F.size("_lines") - F.size("_dlines")).cast("long"),
        )
        .withColumn("total_line_chars", sum_len(F.col("_lines")))
        .withColumn(
            "dup_line_chars",
            sum_len(F.col("_lines")) - sum_len(F.col("_dlines")),
        )
        .drop("_lines", "_dlines")
    )


#: must match textops.words(): lowercase, alnum runs, empties dropped
_WORD_SPLIT = re.compile(r"[^a-z0-9]+")

_NGRAM_SCHEMA = StructType(
    [
        StructField("top_bigram", StringType()),
        StructField("top_bigram_cnt", LongType()),
        StructField("top_bigram_chars", LongType()),
        StructField("dup_trigram_chars", LongType()),
        StructField("total_trigram_chars", LongType()),
        StructField("total_word_chars", LongType()),
    ]
)


def _py_words(text: str) -> list[str]:
    return [w for w in _WORD_SPLIT.split(text.lower()) if w]


def _ngram_stats_py(ws: list[str]) -> tuple:
    """THE per-document n-gram counter pass (Gopher 'top n-gram char
    fraction' n=2 and 'duplicated n-gram char fraction' n=3) — one O(words)
    Counter pass. Character length of an n-gram is the sum of its word
    lengths (the joining space is presentation, not content). Tie-break for
    the top bigram: lexicographically smallest among max-count. Shared by
    `_ngram_stats_udf` and the fused gate kernel so the semantics have one
    definition."""
    total_word_chars = sum(len(w) for w in ws)
    bi = Counter(zip(ws, ws[1:]))
    if bi:
        top, cnt = min(bi.items(), key=lambda kv: (-kv[1], kv[0]))
        top_s = " ".join(top)
        top_chars = cnt * (len(top[0]) + len(top[1]))
    else:
        top_s, cnt, top_chars = None, 0, 0
    tri = Counter(zip(ws, ws[1:], ws[2:]))
    tri_total = tri_dup = 0
    for gram, c in tri.items():
        chars = c * sum(len(w) for w in gram)
        tri_total += chars
        if c >= 2:
            tri_dup += chars
    return (top_s, cnt, top_chars, tri_dup, tri_total, total_word_chars)


@pandas_udf(_NGRAM_SCHEMA)
def _ngram_stats_udf(texts: pd.Series) -> pd.DataFrame:
    """Arrow wrapper for :func:`_ngram_stats_py` (the public per-gate
    operator's kernel)."""
    rows = [_ngram_stats_py(_py_words(text or "")) for text in texts]
    return pd.DataFrame(rows, columns=[f.name for f in _NGRAM_SCHEMA.fields])


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full Gopher repetition feature set: line stats (JVM exprs) + word
    n-gram stats (Arrow-batched Counter pass). All integers — derive
    fractions with :func:`repetition_flags` or downstream arithmetic."""
    df = with_line_stats(df, text_col)
    s = _ngram_stats_udf(F.col(text_col))
    return df.withColumn("_ng", s).select("*", "_ng.*").drop("_ng")


def repetition_flags(
    df: DataFrame,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_top_bigram_char_frac: float = 0.2,
    max_dup_trigram_char_frac: float = 0.3,
) -> DataFrame:
    """Boolean keep/reject per Gopher's published thresholds, derived from
    the integer stats (guards zero denominators: empty docs pass — the
    length gates elsewhere own those)."""

    def frac(num: str, den: str) -> Column:
        return F.when(
            F.col(den) > 0, F.col(num).cast("double") / F.col(den)
        ).otherwise(F.lit(0.0))

    return df.withColumn(
        "repetition_ok",
        (frac("n_dup_lines", "n_lines") <= max_dup_line_frac)
        & (frac("dup_line_chars", "total_line_chars") <= max_dup_line_char_frac)
        # a bigram occurring ONCE is not repetition — without the cnt >= 2
        # guard, any short doc whose longest bigram exceeds the char share
        # (e.g. 11 words with two long ones) is falsely rejected
        & (
            (F.col("top_bigram_cnt") < 2)
            | (frac("top_bigram_chars", "total_word_chars") <= max_top_bigram_char_frac)
        )
        & (frac("dup_trigram_chars", "total_trigram_chars") <= max_dup_trigram_char_frac),
    )


# --- fused per-document gate kernel (round 6) --------------------------------

#: output schema of the fused gate pass — field names/types/order match the
#: chained quality_filter → with_language → with_repetition_stats →
#: repetition_flags column additions exactly, plus n_tokens (token_count)
_GATE_SCHEMA = StructType(
    [
        StructField("n_words", IntegerType()),
        StructField("n_chars_obs", IntegerType()),
        StructField("mean_word_len", DoubleType()),
        StructField("symbol_ratio", DoubleType()),
        StructField("stop_fraction", DoubleType()),
        StructField("distinct_word_fraction", DoubleType()),
        StructField("ends_with_punct", IntegerType()),
        StructField("quality_keep", IntegerType()),
        StructField("lang_pred", StringType()),
        StructField("n_lines", LongType()),
        StructField("n_dup_lines", LongType()),
        StructField("total_line_chars", LongType()),
        StructField("dup_line_chars", LongType()),
        StructField("top_bigram", StringType()),
        StructField("top_bigram_cnt", LongType()),
        StructField("top_bigram_chars", LongType()),
        StructField("dup_trigram_chars", LongType()),
        StructField("total_trigram_chars", LongType()),
        StructField("total_word_chars", LongType()),
        StructField("repetition_ok", BooleanType()),
        StructField("n_tokens", IntegerType()),
    ]
)

#: Java-regex-compatible compilations (re.ASCII pins \s/\b/\d to the same
#: ASCII classes Java uses by default; the alnum classes are explicit)
_ENDS_PUNCT_RE = re.compile(r"[.!?]\s*$", re.ASCII)
_TOKEN_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]", re.ASCII)


def _pii_row_py(text):
    """(n_email, n_ipv4, n_ssn, n_phone, redacted) — the Python twin of
    with_pii_stats for one document. Counts are over the (coalesced)
    original text; redaction applies the patterns in PII_ORDER so earlier
    placeholders can't re-match later patterns; NULL text keeps a NULL
    redaction. The patterns are restricted to syntax Java regex, RE2 and
    Python re agree on (with re.ASCII pinning \\b/\\d/\\s)."""
    t = text or ""
    counts = [len(p.findall(t)) for p, _ in _PII_RES]
    if text is None:
        return counts + [None]
    red = text
    for p, repl in _PII_RES:
        red = p.sub(repl, red)
    return counts + [red]


def _gate_row_py(text, min_words: int, max_symbol_ratio: float, stopsets) -> tuple:
    """One document through every per-doc gate — the Python twin of the
    chained JVM operators, pinned bit-equal (kept/rejected and every
    surfaced column) by tests/test_filters_fused.py. Fractions are computed
    as int/int double divisions in the same shape as the SQL exprs, so the
    doubles are IEEE-identical."""
    ws = _py_words(text) if text else []
    # NULL text propagates NULL through size(words(t)) and length(t) in the
    # chained exprs (the when-guards then route every derived column to its
    # otherwise-branch); n_words/n_chars stay None to match, and the local
    # integers drive the guards identically (None > 0 is false in SQL)
    n_words = len(ws) if text is not None else None
    n_chars = len(text) if text is not None else None
    nw = n_words or 0
    nc = n_chars or 0
    sum_wlen = sum(len(w) for w in ws)
    mean_word_len = (sum_wlen / nw) if nw > 0 else 0.0
    if nc > 0:
        # alnum chars of the LOWERED text == the characters of the word
        # array (words are exactly the [a-z0-9] runs of the lowered text),
        # so the count is the word-length sum already in hand
        low = text.lower()
        symbol_ratio = (nc - sum_wlen) / nc
    else:
        low = ""
        symbol_ratio = 0.0
    en, fr, de, es = stopsets
    stop_hits = sum(1 for w in ws if w in en)
    stop_fraction = (stop_hits / nw) if nw > 0 else 0.0
    distinct_frac = (len(set(ws)) / nw) if nw > 0 else 0.0
    ends_punct = 1 if (text is not None and _ENDS_PUNCT_RE.search(text)) else 0
    quality_keep = int(
        nw >= min_words
        and symbol_ratio <= max_symbol_ratio
        and distinct_frac >= 0.2
    )
    # language: argmax over stopword hits, fixed precedence (en,fr,de,es):
    # strict > against earlier-precedence langs, >= against later
    hits = [
        stop_hits,
        sum(1 for w in ws if w in fr),
        sum(1 for w in ws if w in de),
        sum(1 for w in ws if w in es),
    ]
    lang_pred = "und"
    for i, lang in enumerate(("en", "fr", "de", "es")):
        if hits[i] > 0 and all(
            (hits[i] > hits[j]) if j < i else (hits[i] >= hits[j])
            for j in range(4)
            if j != i
        ):
            lang_pred = lang
            break
    # line stats (nonempty '\n' segments)
    lines = [l for l in text.split("\n") if l != ""] if text else []
    n_lines = len(lines)
    total_line_chars = sum(len(l) for l in lines)
    seen = dict.fromkeys(lines)  # first-occurrence-ordered distinct
    n_dup_lines = n_lines - len(seen)
    dup_line_chars = total_line_chars - sum(len(l) for l in seen)
    # n-gram repetition (shared kernel)
    top_s, bi_cnt, bi_chars, tri_dup, tri_total, total_word_chars = _ngram_stats_py(ws)
    def _frac(num, den):
        return (num / den) if den > 0 else 0.0
    repetition_ok = (
        _frac(n_dup_lines, n_lines) <= 0.3
        and _frac(dup_line_chars, total_line_chars) <= 0.2
        and (bi_cnt < 2 or _frac(bi_chars, total_word_chars) <= 0.2)
        and _frac(tri_dup, tri_total) <= 0.3
    )
    n_tokens = len(_TOKEN_RE.findall(low)) if text else 0
    return (
        n_words, n_chars, mean_word_len, symbol_ratio, stop_fraction,
        distinct_frac, ends_punct, quality_keep, lang_pred,
        n_lines, n_dup_lines, total_line_chars, dup_line_chars,
        top_s, bi_cnt, bi_chars, tri_dup, tri_total, total_word_chars,
        repetition_ok, n_tokens,
    )


#: with_pii=True prefix of the fused output (before the _GATE_SCHEMA fields)
_PII_SCHEMA_FIELDS = [
    StructField("n_email", LongType()),
    StructField("n_ipv4", LongType()),
    StructField("n_ssn", LongType()),
    StructField("n_phone", LongType()),
    StructField("redacted", StringType()),
]


def fused_gate_stats(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_symbol_ratio: float = 0.6,
    with_pii: bool = False,
) -> DataFrame:
    """ONE Arrow pass computing every per-document gate column — the same
    columns (names, types, values) the chained public operators produce via
    repetition_flags(with_repetition_stats(with_language(quality_filter(df))))
    plus ``n_tokens`` (token_count). The public per-gate operators are
    unchanged and keep their oracles; this kernel exists because the chain
    costs ~10 separate full-text JVM regex/array passes plus a dedicated
    Python stage for the n-gram counters — fused, the text crosses the
    Python boundary once and every per-doc statistic comes out of the words
    list that pass already built (measured: the 240k-doc gate stage drops
    ~2x, see OPTIMIZATION_r06.md). Equality with the chain is pinned by
    tests/test_filters_fused.py on hostile corpora (null/empty/unicode/
    CRLF/PII/repetitive docs)."""
    stopsets = tuple(frozenset(STOPWORDS[lang]) for lang in ("en", "fr", "de", "es"))
    mw, msr = int(min_words), float(max_symbol_ratio)
    # mapInPandas, not a struct pandas_udf: a physical map node takes the
    # child's rows however they were computed, while a UDF EXPRESSION must
    # be extracted by the planner — and a caller whose text column is itself
    # a complex derived expression (e.g. curate.py's substring_dedup trim)
    # can leave the UDF in a projection the extractor never rewrites
    # ("Cannot generate code for expression: _gates(...)", hit in round 6).
    # Callers should project to the columns they need first — every column
    # of `df` crosses the Python boundary and back.
    extra_fields = (
        list(_PII_SCHEMA_FIELDS) if with_pii else []
    ) + list(_GATE_SCHEMA.fields)
    out_schema = StructType(list(df.schema.fields) + extra_fields)
    extra_names = [f.name for f in extra_fields]

    def _gates(batches):
        for pdf in batches:
            texts = pdf[text_col]
            if with_pii:
                rows = []
                for t in texts:
                    t = t if isinstance(t, str) else None
                    pii = _pii_row_py(t)
                    rows.append(tuple(pii) + _gate_row_py(pii[4], mw, msr, stopsets))
            else:
                rows = [
                    _gate_row_py(t if isinstance(t, str) else None, mw, msr, stopsets)
                    for t in texts
                ]
            gates = pd.DataFrame(rows, columns=extra_names)
            yield pd.concat(
                [pdf.reset_index(drop=True), gates], axis=1
            )

    return df.mapInPandas(_gates, out_schema)


# --- PII detection / redaction -----------------------------------------------

#: patterns restricted to syntax Java regex and RE2 (DuckDB) agree on:
#: character classes, bounded repetition, \b, non-capturing groups — no
#: lookaround, no backreferences. Applied in PII_ORDER, sequentially.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
}
PII_ORDER = ("email", "ipv4", "ssn", "phone")

#: Python compilations of PII_PATTERNS in PII_ORDER for the fused kernel —
#: re.ASCII pins \b/\d to the ASCII classes Java regex uses by default
_PII_RES = [
    (re.compile(PII_PATTERNS[k][0], re.ASCII), PII_PATTERNS[k][1])
    for k in PII_ORDER
]


def with_pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and redact PII matches — pure JVM regexps, codegen'd, no
    Python. Adds ``n_<kind>`` counts per PII_ORDER kind and ``redacted``
    (matches replaced by their placeholder, in PII_ORDER so earlier
    redactions can't be re-matched by later, looser patterns — e.g. the
    digits of an IP never re-match the phone pattern)."""
    # NULL-safe counts (size(regexp_extract_all(NULL)) is -1, not 0); the
    # redacted column stays NULL for NULL text — redaction must not invent
    # content for a failed extraction
    t = F.coalesce(F.col(text_col), F.lit(""))
    for kind in PII_ORDER:
        pat, _ = PII_PATTERNS[kind]
        df = df.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long"),
        )
    red = F.col(text_col)
    for kind in PII_ORDER:
        pat, repl = PII_PATTERNS[kind]
        red = F.regexp_replace(red, pat, repl)
    return df.withColumn("redacted", red)


# --- benchmark decontamination -----------------------------------------------


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark contamination: how many DISTINCT word
    ``n``-grams of the document appear in any benchmark text (GPT-3 §C uses
    13-grams; ``n`` is a knob because short-document corpora need smaller
    windows to have any n-grams at all).

    Returns one row per input doc: (id_col, n_contaminated, contaminated).

    Plan shape: both sides shingle via dedup_text.shingles_of (distinct
    word n-grams, materialized word arrays per its performance contract),
    hash to md5, and meet in an equi-join on the hash; the benchmark side
    is aggregated to DISTINCT hashes and broadcast (benchmark suites are
    tiny vs the corpus). At 100 TB the same set feeds
    ``spark.sql.optimizer.runtime.bloomFilter`` or a static bloom filter
    pushed below the explode — the join stays map-side either way. A left
    join keeps zero-hit docs (n_contaminated = 0) so the output is a total
    verdict over the corpus, not just the hit list.
    """
    from sparkdoc.dedup_text import shingles_of

    bench_hashes = (
        benchmark.withColumn("_w", words(F.col(text_col)))
        .withColumn("_sh", shingles_of(F.col("_w"), n))
        .select(F.explode("_sh").alias("_s"))
        .select(F.md5(F.col("_s")).alias("_h"))
        .distinct()
    )
    doc_grams = (
        docs.withColumn("_w", words(F.col(text_col)))
        .withColumn("_sh", shingles_of(F.col("_w"), n))
        .select(id_col, F.explode("_sh").alias("_s"))
        .select(id_col, F.md5(F.col("_s")).alias("_h"))
    )
    hits = (
        doc_grams.join(F.broadcast(bench_hashes), "_h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# --- the full curation split (shared by the CLI job and the scaling bench) ---

KEPT_COLS = [
    "doc_id", "text",
    "n_email", "n_ipv4", "n_ssn", "n_phone",
    "n_words", "symbol_ratio", "stop_fraction", "distinct_word_fraction",
    "lang_pred",
    "n_dup_lines", "top_bigram_cnt", "dup_trigram_chars",
]


def curate_split(
    docs: DataFrame,
    min_words: int = 10,
    near_dup: bool = False,
    jaccard: float = 0.85,
    benchmark: DataFrame | None = None,
    decontam_n: int = 8,
    with_tokens: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """The full curation pipeline over (doc_id, text): PII redaction →
    quality → repetition → exact dedup → optional near-dup → optional
    decontamination. Returns (kept, rejected); every input doc lands in
    exactly one, rejected carries the FIRST failing gate as reject_reason.
    See jobs/curate.py for the gate-order rationale; the intermediate
    ``flagged`` frame is persisted (both branches read it) — callers that
    materialize the outputs may unpersist via kept.sparkSession.catalog.
    """
    from sparkdoc.dedup_text import near_dup_pairs
    from sparkdoc.textops import doc_fingerprint, quality_filter, with_language

    # round 6: PII redaction AND the chained per-gate operators
    # (quality_filter → with_language → with_repetition_stats →
    # repetition_flags, ~10 full-text JVM passes + a separate Arrow n-gram
    # stage + a redaction materialization barrier) are computed by ONE
    # fused Arrow pass — same columns, same values
    # (tests/test_filters_fused.py pins fused == chained); the public
    # per-gate operators and their oracles are untouched. The old pii
    # persist existed so Catalyst wouldn't re-inline the regexp_replace
    # chain into every consumer; the kernel computes the redaction exactly
    # once by construction, so the barrier (and its cache) is gone.
    feats = fused_gate_stats(docs, min_words=min_words, with_pii=True).select(
        "doc_id",
        F.col("redacted").alias("text"),
        "n_email", "n_ipv4", "n_ssn", "n_phone",
        *[f.name for f in _GATE_SCHEMA.fields],
    )
    flagged = feats.withColumn(
        "reject_reason",
        F.when(F.col("quality_keep") == 0, "quality").when(
            ~F.col("repetition_ok"), "repetition"
        ),
    )
    flagged.persist()
    alive = flagged.filter(F.col("reject_reason").isNull())

    # exact dedup: min-per-fingerprint + join back (never collect_list — a
    # pathological fingerprint with millions of members is a single-row OOM)
    fp = doc_fingerprint(F.col("text"))
    # persisted: fp_docs feeds BOTH the min-per-fingerprint agg and the
    # join-back side, and the fingerprint itself is a full-text
    # lower+regexp_replace+md5 pass — without the cache that pass runs
    # twice (the two consumers' plans don't share an exchange). The frame
    # is only (doc_id, fp).
    fp_docs = (
        alive.filter(fp.isNotNull()).select("doc_id", fp.alias("fp")).persist()
    )
    keep_min = fp_docs.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    # each drop list is persisted: it feeds BOTH outputs (the kept branch's
    # left_anti and the rejected union), and without the cache the rejected
    # count re-runs the entire upstream candidate generation — for the
    # near-dup gate that is the full MinHash pipeline, the single most
    # expensive stage of the job (measured: halves the 8-core wall)
    exact_drops = (
        fp_docs.join(keep_min, "fp")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id", F.lit("exact_dup").alias("reject_reason"))
    ).persist()
    alive2 = alive.join(exact_drops.select("doc_id"), "doc_id", "left_anti")
    drops = [exact_drops]

    extra_caches = []
    if near_dup:
        # the MinHash candidate/verify subtree references its input several
        # times (signatures, candidate pairs, both verify sides) — without a
        # cache each reference re-runs the anti-join lineage (measured 4x
        # the persisted-input wall at 40k docs)
        alive2 = alive2.persist()
        extra_caches.append(alive2)
        near_drops = (
            near_dup_pairs(alive2, threshold=jaccard)
            .select(F.col("b").alias("doc_id"))
            .distinct()
            .select("doc_id", F.lit("near_dup").alias("reject_reason"))
        ).persist()
        alive2 = alive2.join(near_drops.select("doc_id"), "doc_id", "left_anti")
        drops.append(near_drops)

    if benchmark is not None:
        contam = (
            decontaminate(alive2, benchmark, n=decontam_n)
            .filter(F.col("contaminated"))
            .select("doc_id", F.lit("contaminated").alias("reject_reason"))
        ).persist()
        alive2 = alive2.join(contam.select("doc_id"), "doc_id", "left_anti")
        drops.append(contam)

    kept = alive2.select(*(KEPT_COLS + (["n_tokens"] if with_tokens else [])))
    rejected = flagged.filter(F.col("reject_reason").isNotNull()).select(
        "doc_id", "reject_reason"
    )
    for d in drops:
        rejected = rejected.unionByName(d)
    # cache-handle convention (same as bm25_query_index): the persisted
    # intermediates feed BOTH outputs, so neither output can safely own
    # them — after materializing both, callers release with
    #   for c in getattr(kept, "_sparkdoc_caches", []): c.unpersist()
    # (repeated mix runs in one session otherwise accumulate cached
    # frames until eviction)
    kept._sparkdoc_caches = [flagged, fp_docs] + drops + extra_caches  # type: ignore[attr-defined]
    return kept, rejected


# --- deterministic corpus sampling ---------------------------------------------


def _hash_bucket(key_col: str, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from the first 60 bits of md5(key||salt).
    Engine-portable: DuckDB twin is
    ('0x' || substr(md5(key || salt), 1, 15))::UBIGINT % 1000000."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic corpus sampling: keep a row iff
    hash_bucket(key, salt) < fraction * 1e6.

    Unlike ``df.sample``, the kept set is a pure function of the key — stable
    across runs, partitionings, and engines (so a 1% dev slice of a 100 TB
    corpus is the SAME slice everywhere), and different salts give
    independent draws (held-out splits). Scale shape: a single map-side
    codegen expression, zero shuffles, combines with partition pruning."""
    ppm = int(round(fraction * 1_000_000))
    return df.filter(_hash_bucket(key_col, salt) < F.lit(ppm))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    default: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages or
    domains in a training mix): each stratum value gets its own keep
    fraction; unlisted strata keep ``default``. Same map-side, shuffle-free
    shape as hash_sample — the stratum threshold is a chained CASE, so the
    whole filter stays inside whole-stage codegen."""
    thresh = F.lit(int(round(default * 1_000_000)))
    for val, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        thresh = F.when(
            F.col(strata_col) == F.lit(val), F.lit(int(round(frac * 1_000_000)))
        ).otherwise(thresh)
    return df.filter(_hash_bucket(key_col, salt) < thresh)


# --- per-group caps and frequency rebalancing ------------------------------------


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
    fan_in: int = 32,
) -> DataFrame:
    """Keep at most ``k`` rows per group (e.g. per domain/source), chosen
    deterministically: the k rows with the smallest md5 hash bucket (ties by
    key) — a stable uniform sample of each group, not "whatever k rows the
    scan met first". Common-Crawl-style curation caps pathological domains
    this way so one link farm can't dominate the training mix.

    Scale shape: top-k per group is computed in TWO phases to bound skew —
    phase 1 ranks within (group, subgroup) where subgroup = crc32(key) %
    fan_in, discarding all but k rows per subgroup (a giant group's rows
    never pile into ONE window partition); phase 2 ranks the ≤ k·fan_in
    survivors per group. Both phases are window row_numbers over equi-shuffle
    keys; the global top-k is provably inside the union of subgroup top-ks.
    """
    b = _hash_bucket(key_col, salt)
    out = df.withColumn("_cap_b", b)
    if fan_in > 1:
        sub = F.pmod(F.crc32(F.col(key_col).cast("string")), F.lit(fan_in))
        w1 = Window.partitionBy(F.col(group_col), sub).orderBy("_cap_b", key_col)
        out = (
            out.withColumn("_cap_r1", F.row_number().over(w1))
            .filter(F.col("_cap_r1") <= k)
            .drop("_cap_r1")
        )
    w2 = Window.partitionBy(group_col).orderBy("_cap_b", key_col)
    return (
        out.withColumn("_cap_r", F.row_number().over(w2))
        .filter(F.col("_cap_r") <= k)
        .drop("_cap_r", "_cap_b")
    )


def downweight_frequent_groups(
    df: DataFrame,
    group_col: str,
    target: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Frequency-proportional group rebalancing: groups with ≤ ``target``
    rows keep everything; larger groups are hash-sampled down to ≈ target
    rows in expectation (keep fraction = target / group_count). The smooth
    cousin of cap_per_group — membership stays a pure function of
    (key, salt, group size), so reruns and engines agree exactly.

    Fully distributed: group counts come from a groupBy (map-side combined),
    rejoined on the group key — no driver-side collect, so 10^8 distinct
    domains are fine. The per-group keep threshold is floor(target·1e6 /
    count) ppm, integer-exact across engines.
    """
    # NULL groups are one group like any other (cap_per_group semantics):
    # a plain equi-join would never match NULL = NULL and silently DELETE
    # every NULL-group row, so both sides key on a coalesced shadow column
    gk = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null-group>"))
    with_gk = df.withColumn("_gk", gk)
    counts = with_gk.groupBy("_gk").agg(F.count("*").alias("_grp_n"))
    thresh = F.least(
        F.lit(1_000_000).cast("bigint"),
        F.floor(F.lit(target) * 1_000_000.0 / F.col("_grp_n")).cast("bigint"),
    )
    return (
        with_gk.join(counts, "_gk")
        .filter(_hash_bucket(key_col, salt) < thresh)
        .drop("_grp_n", "_gk")
    )


# --- training-shard packing --------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_groups: int = 1024,
) -> DataFrame:
    """Assign documents to fixed-token-budget training shards,
    deterministically: docs are hashed into ``n_groups`` independent packing
    groups (md5 bucket — stable across runs, partitionings AND engines),
    ordered by id within the group, and cut into shards wherever the running
    token total crosses ``budget``. shard_id = (group, seq) is stable under
    re-partitioning and resumable ingestion — the property df.repartition +
    monotonically increasing ids do NOT give you.

    Contract: a shard's total is ≤ budget + (its last doc's tokens) — the
    boundary doc goes to the shard it STARTS in (docs are never split); a
    doc larger than the whole budget therefore occupies its own shard tail.

    Scale shape: one window cumsum per group; groups are hash-balanced so
    no window partition exceeds ~|corpus|/n_groups regardless of skew. Raise
    n_groups with corpus size (shards never span groups, so more groups only
    adds ragged shard tails, ~budget/2 wasted tokens each).
    """
    grp = (_hash_bucket(id_col, "pack") % n_groups).alias("pack_group")
    w = Window.partitionBy("pack_group").orderBy(id_col)
    run = F.sum(tokens_col).over(w)
    return (
        df.select(id_col, tokens_col, grp)
        .withColumn("shard_seq", F.floor((run - F.col(tokens_col)) / F.lit(budget)).cast("int"))
        .withColumn("pack_group", F.col("pack_group").cast("int"))
    )


# --- leakage-safe train/eval splitting ------------------------------------------


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame,
    frac_eval: float,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Train/eval split that near-duplicate clusters can never straddle.

    A plain hash split leaks: two near-duplicate documents land on opposite
    sides and the eval set scores memorization (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", §6 measures
    exactly this). Here the split key is the document's duplicate-cluster
    REPRESENTATIVE (``group_id`` from :func:`sparkdoc.dedup_text.
    dup_group_labels` / ``near_dup_groups``), so every member of a cluster
    moves together; singleton documents (no row in ``groups``) key on
    themselves.

    Returns ``df`` + ``rep_id`` (the split key used) + ``split``
    ('eval' | 'train'). Membership is the same md5 ppm rule as
    :func:`hash_sample` — a pure function of (rep_id, salt), stable across
    runs, partitionings and engines.

    Scale shape: ONE left equi-join on the doc id (groups is the dedup
    output — orders of magnitude smaller than the corpus since it only
    carries docs WITH duplicates) + a map-side hash filter. No window, no
    skew: the join key is the unique doc id, never the (hot) group id.
    """
    g = groups.select(
        F.col(id_col).alias("_lss_id"), F.col("group_id").alias("_lss_gid")
    )
    ppm = int(round(frac_eval * 1_000_000))
    joined = df.join(g, F.col(id_col) == F.col("_lss_id"), "left").withColumn(
        # both sides cast to string: group ids inherit the id column's type
        # (bigint in the parquet tables, string in the doc pipeline), and an
        # implicit bigint/string coalesce is an ANSI cast error
        "rep_id",
        F.coalesce(F.col("_lss_gid").cast("string"), F.col(id_col).cast("string")),
    )
    return (
        joined.withColumn(
            "split",
            F.when(_hash_bucket("rep_id", salt) < F.lit(ppm), F.lit("eval")).otherwise(
                F.lit("train")
            ),
        )
        .drop("_lss_id", "_lss_gid")
    )


# --- temperature-based mixture sampling ------------------------------------------


def _quarter_power(n: Column, alpha: float) -> Column:
    """n^alpha for alpha in {0.25, 0.5, 0.75, 1.0} via IEEE-exact sqrt chains.

    sqrt is correctly rounded per IEEE-754 (unlike pow, which Java permits
    1 ulp off), so sqrt compositions are BIT-IDENTICAL across Spark and
    DuckDB — the whole sampling rule stays engine-exact. Multiplications are
    single IEEE ops mirrored in the same order by the oracle SQL."""
    d = n.cast("double")
    if alpha == 1.0:
        return d
    if alpha == 0.5:
        return F.sqrt(d)
    if alpha == 0.25:
        return F.sqrt(F.sqrt(d))
    if alpha == 0.75:
        return F.sqrt(d) * F.sqrt(F.sqrt(d))
    raise ValueError(
        f"temperature_sample: alpha={alpha} not in {{0.25, 0.5, 0.75, 1.0}} — "
        "quarter powers compose from IEEE-exact sqrt; arbitrary pow() differs "
        "by ulps across engines and would break the deterministic membership "
        "contract (use stratified_hash_sample with precomputed fractions "
        "if you need another exponent)"
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    target_total: int,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-based mixture rebalancing: sample group g with
    probability ∝ count(g)^alpha (the multilingual sampling rule of
    mBERT/XLM-R, Conneau & Lample 2019 §3.1 — alpha < 1 upweights
    low-resource groups relative to proportional sampling), scaled so the
    expected total kept is ≈ ``target_total``.

    Per group: keep_ppm = floor(1e6 · target_total · s_g / (Z · n_g)),
    capped at 1e6, where s_g = floor(1e6 · n_g^alpha) and Z = Σ s_g (an
    exact BIGINT sum — no float addition-order dependence). Membership is
    the md5 ppm rule of :func:`hash_sample`: deterministic across runs,
    partitionings and engines; alpha is restricted to quarter powers so
    n^alpha is IEEE-exact (see :func:`_quarter_power`).

    Scale shape: one map-side-combined groupBy for the counts (|groups|
    rows), the tiny per-group threshold table broadcast-joined back, then a
    map-side hash filter — the corpus is scanned once and never shuffled.

    Returns kept rows + ``keep_ppm`` (the applied per-group threshold).
    """
    gk = F.coalesce(F.col(group_col).cast("string"), F.lit("\x00<null-group>"))
    with_gk = df.withColumn("_tk", gk)
    counts = with_gk.groupBy("_tk").agg(F.count("*").alias("_n"))
    scaled = counts.withColumn(
        "_s", F.floor(_quarter_power(F.col("_n"), alpha) * F.lit(1_000_000.0)).cast("bigint")
    )
    z = scaled.agg(F.sum("_s").alias("_z"))
    # fixed parenthesization — the oracle mirrors ((((t*s)/z)/n)*1e6) op by op
    thresh = scaled.crossJoin(F.broadcast(z)).withColumn(
        "keep_ppm",
        F.least(
            F.lit(1_000_000).cast("bigint"),
            F.floor(
                (
                    (F.lit(float(target_total)) * F.col("_s").cast("double"))
                    / F.col("_z").cast("double")
                    / F.col("_n").cast("double")
                )
                * F.lit(1_000_000.0)
            ).cast("bigint"),
        ),
    )
    return (
        with_gk.join(
            F.broadcast(thresh.select("_tk", "keep_ppm")), "_tk"
        )
        .filter(_hash_bucket(key_col, salt) < F.col("keep_ppm"))
        .drop("_tk", "_n", "_s", "_z")
    )
