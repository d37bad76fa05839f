"""Round-6 fused gate kernel: `fused_gate_stats` (one Arrow pass) must be
BIT-EQUAL to the chained public operators
repetition_flags(with_repetition_stats(with_language(quality_filter(df))))
plus token_count — on every column, on hostile inputs. And `curate_split`
(which now runs the fused kernel) must produce identical kept/rejected
frames to the chained formulation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkdoc.filters import (
    curate_split,
    fused_gate_stats,
    repetition_flags,
    with_pii_stats,
    with_repetition_stats,
)
from sparkdoc.textops import quality_filter, token_count, with_language


@pytest.fixture(scope="module")
def spark():
    from sparkdoc.session import get_spark

    s = get_spark("test-filters-fused", master="local[4]", shuffle_partitions=4)
    yield s


HOSTILE = [
    (0, None),
    (1, ""),
    (2, "   \n\n \t "),
    (3, "short text"),
    (4, "the quick brown fox jumps over the lazy dog and then the dog sleeps. "
        "the quick brown fox jumps over the lazy dog again and again today."),
    (5, "le la les et un une est que dans pour du de des le la les et un"),
    (6, "der die das und ist von mit den nicht ein eine zu der die das und ist"),
    (7, "el la los las de y que en un una es por con el la los las de y"),
    (8, "!!! ??? ### $$$ %%% ^^^ &&& ***"),
    (9, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (10, "a\nb\na\nb\na\nb\nc c c c c c c c c c c c"),
    (11, "mail me at alice@example.com or 10.0.0.1 ssn 123-45-6789 ph 555-123-4567 "
         "and the rest of this document is long enough to pass the word gates "
         "with many distinct words in it for sure absolutely certainly"),
    (12, "Ünïcödé Στίγμα ΟΣ İstanbul K kelvin 𝄞 music ß sharp"),
    (13, "line one has words\r\nline two has words\r\nline one has words\r\n"),
    (14, "ends with question? "),
    (15, "ends with period.\n"),
    (16, "x " * 600),
    (17, "one two three four five six seven eight nine ten eleven twelve "
         "thirteen fourteen fifteen sixteen"),
    (18, "<b>markup</b>\x07<![CDATA[raw & markup]]> End."),
    (19, "word-with-dash under_score CamelCase 123numbers45"),
]

GATE_COLS = [
    "n_words", "n_chars_obs", "mean_word_len", "symbol_ratio",
    "stop_fraction", "distinct_word_fraction", "ends_with_punct",
    "quality_keep", "lang_pred", "n_lines", "n_dup_lines",
    "total_line_chars", "dup_line_chars", "top_bigram", "top_bigram_cnt",
    "top_bigram_chars", "dup_trigram_chars", "total_trigram_chars",
    "total_word_chars", "repetition_ok",
]


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v.hex()  # bit-exact double comparison
    return v


def _rows(df, cols):
    return sorted(
        tuple(_canon(r[c]) for c in cols) for r in df.collect()
    )


def test_fused_matches_chained_on_hostile_corpus(spark):
    df = spark.createDataFrame(HOSTILE, "doc_id long, text string").repartition(3)
    fused = fused_gate_stats(df, min_words=10)
    chained = repetition_flags(
        with_repetition_stats(with_language(quality_filter(df, min_words=10)))
    ).withColumn("n_tokens", token_count(F.col("text")))
    cols = ["doc_id"] + GATE_COLS + ["n_tokens"]
    got = _rows(fused, cols)
    want = _rows(chained, cols)
    assert got == want


def test_fused_matches_chained_on_synth_docs(spark):
    from sparkdoc.synth import synth_text_documents

    df = synth_text_documents(spark, 300, 11, partitions=5)
    fused = fused_gate_stats(df, min_words=10)
    chained = repetition_flags(
        with_repetition_stats(with_language(quality_filter(df, min_words=10)))
    ).withColumn("n_tokens", token_count(F.col("text")))
    cols = ["doc_id"] + GATE_COLS + ["n_tokens"]
    assert _rows(fused, cols) == _rows(chained, cols)


def _chained_curate_split(docs, min_words=10):
    """The pre-round-6 curate_split composition, kept here as the parity
    reference for the fused path."""
    from sparkdoc.textops import doc_fingerprint

    pii = with_pii_stats(docs).select(
        "doc_id", F.col("redacted").alias("text"),
        "n_email", "n_ipv4", "n_ssn", "n_phone",
    )
    feats = repetition_flags(
        with_repetition_stats(with_language(quality_filter(pii, min_words=min_words)))
    )
    flagged = feats.withColumn(
        "reject_reason",
        F.when(F.col("quality_keep") == 0, "quality").when(
            ~F.col("repetition_ok"), "repetition"
        ),
    )
    alive = flagged.filter(F.col("reject_reason").isNull())
    fp = doc_fingerprint(F.col("text"))
    fp_docs = alive.filter(fp.isNotNull()).select("doc_id", fp.alias("fp"))
    keep_min = fp_docs.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    exact_drops = (
        fp_docs.join(keep_min, "fp")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id", F.lit("exact_dup").alias("reject_reason"))
    )
    alive2 = alive.join(exact_drops.select("doc_id"), "doc_id", "left_anti")
    from sparkdoc.filters import KEPT_COLS

    kept = alive2.select(*KEPT_COLS)
    rejected = flagged.filter(F.col("reject_reason").isNotNull()).select(
        "doc_id", "reject_reason"
    ).unionByName(exact_drops)
    return kept, rejected


def test_curate_split_identical_to_chained(spark):
    base = HOSTILE + [
        (100 + i, t) for i, (j, t) in enumerate(HOSTILE) if t  # exact dups
    ]
    docs = spark.createDataFrame(base, "doc_id long, text string").repartition(3)
    kept_f, rej_f = curate_split(docs, min_words=10)
    kept_c, rej_c = _chained_curate_split(docs, min_words=10)
    cols = kept_c.columns
    assert kept_f.columns == cols
    assert _rows(kept_f, cols) == _rows(kept_c, cols)
    assert _rows(rej_f, ["doc_id", "reject_reason"]) == _rows(
        rej_c, ["doc_id", "reject_reason"]
    )
    for c in getattr(kept_f, "_sparkdoc_caches", []):
        c.unpersist()


def test_curate_split_with_tokens_column(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in HOSTILE if t], "doc_id long, text string"
    )
    kept, _ = curate_split(docs, min_words=3, with_tokens=True)
    assert kept.columns[-1] == "n_tokens"
    rows = {r["doc_id"]: r["n_tokens"] for r in kept.collect()}
    # n_tokens must equal token_count over the SAME (redacted) text
    pii = with_pii_stats(docs).select("doc_id", F.col("redacted").alias("text"))
    want = {
        r["doc_id"]: r["n"]
        for r in pii.select("doc_id", token_count(F.col("text")).alias("n")).collect()
        if r["doc_id"] in rows
    }
    assert rows == want
    for c in getattr(kept, "_sparkdoc_caches", []):
        c.unpersist()
