"""Sanitization + boilerplate/furniture classification — pure Spark exprs.

Everything here stays inside whole-stage codegen (no Python). The
sequence-dependent parts of extraction (XY-cut order, repeated-text furniture,
offset assignment) live in spans.py's per-document applyInPandas.

Spec (shared with the single-node golden implementation in golden.py — the
two implementations are independent on purpose; drift fails the golden tests):

  sanitize   strip C0 control chars except \\t \\n \\r
             (reference: core/utils/doclang_sanitizer.py:22-71)
  drop       tag == 'nav'  OR  link-density > 0.5 (n_links*2 > n_chars>0)
             (north rule: Boilerpipe/Readability-style shallow features)
  drop       non-picture nodes whose sanitized text is blank
  drop       BOTTOMLEFT nodes with unknown page height
             (reference: document_processor.py:87-94)
  kind       h1..h6→heading  li→list  table→table  img→picture
             figcaption→caption  header|footer→furniture  else text
  media_ref  pictures get '#/pictures/<node_id>', else ''
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C0 controls except tab/newline/carriage-return
CONTROL_CHAR_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

#: DocLang-style markup (CDATA unwrap + tag strip) — reference
#: doclang_format.py:58-71
_CDATA_RE = r"(?s)<!\[CDATA\[(.*?)\]\]>"  # (?s): CDATA content spans lines
_TAG_RE = r"<[^>]+>"


#: characters Python's str.strip()/str.isspace() treats as whitespace that
#: can survive sanitize: ASCII \t\n\r + space, C1 NEL, and the unicode
#: space family. A text of ONLY these must count as blank exactly like the
#: reference's `.strip()` (Spark `trim` strips spaces alone).
PY_BLANK_RE = (
    "^[ \\t\\n\\r\\u000b\\u000c\\u001c-\\u001f\\u0085\\u00a0\\u1680"
    "\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]*$"
)


def sanitize_text(col: Column) -> Column:
    """Strip C0 control chars except tab/newline/CR."""
    return F.regexp_replace(col, CONTROL_CHAR_RE, "")


def strip_markup(col: Column) -> Column:
    """Unwrap CDATA then drop all XML/HTML tags (markup-blind sizing).

    Reference: strip_doclang_markup, doclang_format.py:58-71.
    """
    return F.regexp_replace(F.regexp_replace(col, _CDATA_RE, "$1"), _TAG_RE, "")


def content_chars(col: Column) -> Column:
    """Markup-invariant character count (reference doclang_format.py:74-86)."""
    return F.length(strip_markup(col))


def squash_anchor(col: Column) -> Column:
    """Lowercase [a-z0-9]-only projection for OCR-tolerant matching.

    Reference: _squash_anchor, dense/orchestrator.py:121-124.
    """
    return F.regexp_replace(F.lower(col), "[^a-z0-9]", "")


def is_boilerplate(tag: Column, n_chars: Column, n_links: Column) -> Column:
    """Link-density boilerplate predicate (drop)."""
    return (tag == "nav") | ((n_links > 0) & (n_links * 2 > n_chars))


KIND_BY_TAG = {
    "h1": "heading",
    "h2": "heading",
    "h3": "heading",
    "h4": "heading",
    "h5": "heading",
    "h6": "heading",
    "li": "list",
    "table": "table",
    "img": "picture",
    "figcaption": "caption",
    "header": "furniture",
    "footer": "furniture",
}


def kind_for_tag(tag: Column) -> Column:
    expr = None
    for t, k in KIND_BY_TAG.items():
        expr = F.when(tag == t, k) if expr is None else expr.when(tag == t, k)
    return expr.otherwise("text")


def heading_text_py(tag: str, text: str) -> str:
    """Heading-span text convention: ``'#'*level + ' ' + title`` — the level
    the source carried (h1..h6) is preserved IN the span text, since the
    north-rule span schema (kind/text/media_ref/offset) has no level column.
    The chunker reads it back (heading_level counts leading '#'s) so heading
    trails NEST across levels instead of replacing (reference HybridChunker
    contextualizes with the full hierarchy, document_chunker.py:50-154; the
    DocLang serializer carries <heading level>, doclang_format.py:32-40).
    Idempotent: text already carrying its exact level prefix (the layout
    corpus authors titles that way) passes through unchanged.

    DOCUMENTED CORRUPTION CASE (accepted trade-off, r4 ADVICE): the
    idempotency check cannot distinguish authored text from markup — an h2
    whose genuine title literally begins ``"## "`` passes through
    unprefixed, and the chunker later strips those author hashes as level
    markers, silently dropping them from trails/enriched text. An hN title
    beginning with a *different* level's prefix (h1 titled ``"## x"``)
    double-prefixes instead (``"# ## x"``) and keeps the author hashes.
    Always-prefixing would flip the damage onto every pre-marked corpus
    (the layout goldens author titles prefixed); carrying the level
    out-of-band needs a schema column the north rule does not grant. A
    literal-``'#'``-leading title at its own exact level is the rarest of
    those shapes, so idempotency wins."""
    if len(tag) == 2 and tag[0] == "h" and tag[1].isdigit() and tag[1] != "0":
        prefix = "#" * int(tag[1]) + " "
        if not text.startswith(prefix):
            return prefix + text
    return text


def heading_prefixed(tag: Column, text: Column) -> Column:
    """Expr twin of :func:`heading_text_py` (generic classify path)."""
    expr = text
    for lvl in range(1, 7):
        prefix = "#" * lvl + " "
        expr = F.when(
            (tag == f"h{lvl}") & ~text.startswith(prefix),
            F.concat(F.lit(prefix), text),
        ).otherwise(expr)
    return expr


def classify_raw_nodes(raw: DataFrame) -> DataFrame:
    """Sanitize + filter + classify the flattened node table (exprs only).

    Output keeps layout columns for the reading-order stage; ``kind`` and
    ``media_ref`` are final span fields.
    """
    # NULL text coerces to '' (golden: `n["text"] or ""`) so img spans carry
    # '' not NULL through the non-nullable SPAN.text field
    df = raw.withColumn("text", sanitize_text(F.coalesce(F.col("text"), F.lit(""))))
    df = df.filter(~is_boilerplate(F.col("tag"), F.col("n_chars"), F.col("n_links")))
    # blank test must match Python str.strip() (golden/reference): Spark's
    # trim removes ONLY spaces, so a text of '\n' or '\t' would survive here
    # while golden drops it — shifting every later span offset
    df = df.filter((F.col("tag") == "img") | ~F.col("text").rlike(PY_BLANK_RE))
    df = df.filter(
        ~((F.col("coord_origin") == "BOTTOMLEFT") & F.col("page_height").isNull())
    )
    # un-renderable geometry: no bbox at all (golden drops these too)
    df = df.filter(F.col("bbox").isNotNull())
    df = df.withColumn("kind", kind_for_tag(F.col("tag")))
    # carry the heading LEVEL into the span text ('#'*level prefix) — after
    # the boilerplate/blank filters so feature word counts see clean text
    df = df.withColumn("text", heading_prefixed(F.col("tag"), F.col("text")))
    df = df.withColumn(
        "media_ref",
        F.when(
            F.col("kind") == "picture",
            F.concat(F.lit("#/pictures/"), F.col("node_id").cast("string")),
        ).otherwise(F.lit("")),
    )
    return df


def nfc_normalize_text(
    df: "DataFrame", text_col: str = "text", out: str | None = None
) -> "DataFrame":
    """Unicode NFC normalization (the curation-standard canonical form:
    combining sequences compose, singletons map — mojibake repair's
    complement for text that is VALID but decomposed, e.g. NFD output from
    macOS pipelines or OCR). Writes ``out`` (default: replaces
    ``text_col``) plus boolean ``nfc_changed``; NULL text passes through
    NULL, but the flag is False (never NULL — a NULL flag silently drops
    the row from boolean filters).

    Spark has no NFC builtin, so this is a vectorized Arrow-batched pandas
    UDF over CPython's unicodedata — which agrees byte-for-byte with
    DuckDB's utf8proc ``nfc_normalize`` on the ranges real corpora hit
    (the doc_nfc oracle pins that agreement)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    target = out or text_col
    return (
        df.withColumn("_nfc_out", _nfc(F.col(text_col)))
        # coalesce: NULL != NULL is NULL and would silently drop NULL-text
        # rows from any boolean filter on this flag
        .withColumn(
            "nfc_changed",
            F.coalesce(F.col("_nfc_out") != F.col(text_col), F.lit(False)),
        )
        .withColumn(target, F.col("_nfc_out"))
        .drop("_nfc_out")
    )
