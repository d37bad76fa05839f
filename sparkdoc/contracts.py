"""Per-document plan choice: the direct-vs-dense contract cost model.

Reference: resolve_auto_contract (contracts/auto.py:66-132) with constants
CHARS_PER_TOKEN=4 and DIRECT_OVERFLOW_RATIO=1.0 (auto.py:31-39). The sizing
is markup-blind (content_chars, doclang_format.py:74-86) so the decision is
stable across serializations. Expressed as a `when()` branch column — each
branch then runs as its own filtered sub-DAG (SURVEY §4 row 1)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkdoc.clean import content_chars

CHARS_PER_TOKEN = 4
DIRECT_OVERFLOW_RATIO = 1.0
DEFAULT_CONTEXT_TOKENS = 128_000
DEFAULT_OUTPUT_BUDGET_TOKENS = 8_192


def estimate_tokens(col: Column) -> Column:
    """tokens ≈ content_chars / 4 (conservative, auto.py:31-39)."""
    return F.ceil(content_chars(col) / CHARS_PER_TOKEN).cast("long")


def resolve_contract(
    col: Column,
    context_tokens: int = DEFAULT_CONTEXT_TOKENS,
    output_budget_tokens: int = DEFAULT_OUTPUT_BUDGET_TOKENS,
) -> Column:
    """'direct' iff the doc fits context AND chars <= output_budget*4*ratio;
    else 'dense' (auto.py:66-132)."""
    chars = content_chars(col)
    est = estimate_tokens(col)
    fits_context = (est + output_budget_tokens) <= context_tokens
    fits_output = chars <= F.lit(
        int(output_budget_tokens * CHARS_PER_TOKEN * DIRECT_OVERFLOW_RATIO)
    )
    return F.when(fits_context & fits_output, "direct").otherwise("dense")


def with_contract(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    return df.withColumn("contract", resolve_contract(F.col(text_col), **kw)).withColumn(
        "est_tokens", estimate_tokens(F.col(text_col))
    )


def resolve_llm_format(contract: Column, text_input: Column | bool = False) -> Column:
    """llm_input_format='auto' resolution once the contract is known
    (many_to_one.py:274-313, 2026-07-06 benchmark pairing): direct →
    'doclang-geo' (geometry recovers footer identifiers and table matrices
    in one-call extraction), dense → 'doclang' (structure without geometry
    keeps chunk batches content-dense); raw-text inputs have no document to
    serialize → 'markdown'."""
    ti = F.lit(text_input) if isinstance(text_input, bool) else text_input
    return (
        F.when(ti, F.lit("markdown"))
        .when(contract == "direct", F.lit("doclang-geo"))
        .otherwise(F.lit("doclang"))
    )


def with_resolved_format(df: DataFrame, text_col: str = "text", text_input: bool = False, **kw) -> DataFrame:
    """with_contract + the format auto-resolution branch column; each
    (contract, llm_format) pair then runs as its own filtered sub-DAG against
    the matching serializer (serialize.doclang_documents for -geo,
    serialize.document_markdown for markdown, batch_markdown for dense)."""
    out = with_contract(df, text_col, **kw)
    return out.withColumn("llm_format", resolve_llm_format(F.col("contract"), text_input))


def preflight_filter(df: DataFrame, text_col: str = "text", context_tokens: int = DEFAULT_CONTEXT_TOKENS) -> DataFrame:
    """Admission control: refuse docs that cannot fit the context at all
    (llm_backend.py:1209-1239) — filtered out BEFORE any expensive stage.
    NULL text estimates as 0 tokens (admitted): resolve_contract routes the
    same doc to 'dense', and a NULL predicate would otherwise drop the row
    with no trace."""
    return df.filter(
        F.coalesce(estimate_tokens(F.col(text_col)), F.lit(0)) <= context_tokens
    )
