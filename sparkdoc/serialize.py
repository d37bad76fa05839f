"""Serialization views over spans/chunks + chunk-owner correlation.

Reference semantics reproduced:
  per-page serialization      document_processor.py:481-499
  batch markdown format       contracts/dense/prompts.py:12-17
  markdown-ish span rendering document_processor.py:478-479 (export analog)
  chunk-owner map             dense/orchestrator.py:709-754
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _page_no_col() -> F.Column:
    """Page number per span row = 1 + page_breaks seen before it (window
    cumulative sum over span order)."""
    w = Window.partitionBy("doc_id").orderBy("offset").rowsBetween(Window.unboundedPreceding, 0)
    return (F.lit(1) + F.sum(F.when(F.col("kind") == "page_break", 1).otherwise(0)).over(w)).cast("int")


def render_span_md(kind, text, media_ref) -> F.Column:
    """Markdown-ish rendering per span kind."""
    return (
        F.when(kind == "heading", text)
        .when(kind == "list", text)
        .when(kind == "table", text)
        .when(kind == "picture", F.concat(F.lit("!["), media_ref, F.lit("]")))
        .when(kind == "caption", F.concat(F.lit("*"), text, F.lit("*")))
        .otherwise(text)
    )


def page_markdowns(span_rows: DataFrame) -> DataFrame:
    """(doc_id, page_no, markdown): one serialized string per page, span
    order preserved; furniture/page_break excluded
    (document_processor.py:481-499)."""
    df = span_rows.withColumn("page_no", _page_no_col())
    content = df.filter(~F.col("kind").isin("page_break", "furniture"))
    rendered = content.withColumn(
        "md", render_span_md(F.col("kind"), F.col("text"), F.col("media_ref"))
    )
    return (
        rendered.groupBy("doc_id", "page_no")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("offset", "md"))), lambda s: s["md"]
                ),
                "\n\n",
            ).alias("markdown")
        )
    )


def document_markdown(span_rows: DataFrame) -> DataFrame:
    """(doc_id, markdown): full-document serialization, reading order."""
    content = span_rows.filter(~F.col("kind").isin("page_break", "furniture"))
    rendered = content.withColumn(
        "md", render_span_md(F.col("kind"), F.col("text"), F.col("media_ref"))
    )
    return rendered.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("offset", "md"))), lambda s: s["md"]),
            "\n\n",
        ).alias("markdown")
    )


def documents_markdown(
    documents: DataFrame, spans_col: str = "spans", out_col: str = "markdown"
) -> DataFrame:
    """Full-document serialization directly over a documents table — the
    ZERO-SHUFFLE twin of :func:`document_markdown` (which serves exploded
    span ROWS and must groupBy to reassemble). A documents row already
    co-locates its whole spans array, so rendering is pure expressions:
    filter furniture/page_break, struct-sort by offset (the same
    (offset, md) struct ordering document_markdown's collect_list path
    sorts, so output is identical byte-for-byte for every document WITH
    content spans). Row-set semantics differ on content-less documents,
    deliberately: the grouped twin silently loses a doc whose spans are all
    furniture/page_break (no group rows survive the filter), while this
    path keeps the row with ``markdown = ""`` (NULL spans → NULL) — so a
    downstream curation gate rejects it WITH attribution instead of the
    document vanishing between pipeline stages.

    At 100 TB this is the serialization to reach for: scan → project, no
    Exchange — the groupBy twin exists only for pipelines that already
    operate on exploded spans."""
    spans = F.col(spans_col)
    content = F.filter(
        spans, lambda s: ~s["kind"].isin("page_break", "furniture")
    )
    with_md = F.transform(
        content,
        lambda s: F.struct(
            s["offset"].alias("offset"),
            render_span_md(s["kind"], s["text"], s["media_ref"]).alias("md"),
        ),
    )
    text = F.array_join(
        F.transform(F.array_sort(with_md), lambda x: x["md"]), "\n\n"
    )
    return documents.withColumn(out_col, text)


def batch_markdown(chunks: DataFrame) -> DataFrame:
    """(doc_id, batch_index, batch_md): '--- CHUNK N ---' concatenation with
    1-based ids, order-preserving (dense/prompts.py:12-17)."""
    return (
        chunks.groupBy("doc_id", "batch_index")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "text"))),
                    lambda s: F.concat(
                        F.lit("--- CHUNK "),
                        (s["chunk_id"] + 1).cast("string"),
                        F.lit(" ---\n"),
                        s["text"],
                    ),
                ),
                "\n\n",
            ).alias("batch_md")
        )
    )


def chunk_owner_map(
    chunks: DataFrame,
    parents: DataFrame,
    head_chars: int = 300,
    carry_rows: int = 12,
) -> DataFrame:
    """dense/orchestrator.py:709-754 analog: per chunk, the unique parent
    entity named in it.

    Ladder: unique parent named in the head `head_chars` folded chars
    (strong) → unique parent named anywhere (weak) → carry last strong
    owner forward ≤ `carry_rows` chunks (forward-fill window).

    parents: (doc_id, node_id, label). Returns (doc_id, chunk_id, owner_id,
    owner_kind ∈ {head, body, carried}).
    """
    ch = chunks.select(
        "doc_id", "chunk_id", F.lower(F.col("text")).alias("_lt"),
        F.lower(F.substring(F.col("text"), 1, head_chars)).alias("_head"),
    )
    # empty labels never match: locate('', s) = 1 in Spark, so one ''-label
    # parent would "hit" every chunk at head strength and the n==1 uniqueness
    # filter would strip owner attribution from the whole document
    p = parents.filter(F.length("label") > 0).select(
        "doc_id", F.col("node_id").alias("owner_id"), F.lower("label").alias("_lp")
    )
    j = ch.join(p, "doc_id")
    hits = j.select(
        "doc_id", "chunk_id", "owner_id",
        F.when(F.expr("locate(_lp, _head)") > 0, F.lit(2))
        .when(F.expr("locate(_lp, _lt)") > 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("strength"),
    ).filter(F.col("strength") > 0)
    per_chunk = hits.groupBy("doc_id", "chunk_id", "strength").agg(
        F.count("*").alias("_n"), F.min("owner_id").alias("_min")
    )
    # unique head owner wins; else unique body owner; ambiguity (n>1) → none
    best = (
        per_chunk.withColumn(
            "_rank", F.row_number().over(Window.partitionBy("doc_id", "chunk_id").orderBy(F.col("strength").desc()))
        )
        .filter((F.col("_rank") == 1) & (F.col("_n") == 1))
        .select(
            "doc_id", "chunk_id", F.col("_min").alias("owner_id"),
            F.when(F.col("strength") == 2, "head").otherwise("body").alias("owner_kind"),
        )
    )
    allc = chunks.select("doc_id", "chunk_id").join(best, ["doc_id", "chunk_id"], "left")
    # carry HEAD owners forward up to carry_rows chunks
    wcarry = (
        Window.partitionBy("doc_id").orderBy("chunk_id").rowsBetween(-carry_rows, 0)
    )
    head_only = F.when(F.col("owner_kind") == "head", F.col("owner_id"))
    carried = F.last(head_only, ignorenulls=True).over(wcarry)
    return allc.select(
        "doc_id",
        "chunk_id",
        F.coalesce(F.col("owner_id"), carried).alias("owner_id"),
        F.coalesce(F.col("owner_kind"), F.when(carried.isNotNull(), "carried")).alias("owner_kind"),
    )


def _xml_escape_text(col):
    """Minimal XML text escaping (&, <, >) — without it a span containing a
    literal '<' corrupts the serialization and the roundtrip parser
    (doclang_format escapes markup in the reference)."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def _xml_escape_attr(col):
    return F.replace(_xml_escape_text(col), F.lit('"'), F.lit("&quot;"))


_DCLG_TAG_RE = None  # compiled lazily (re import kept function-local pattern)


def _dclg_tag_re():
    global _DCLG_TAG_RE
    if _DCLG_TAG_RE is None:
        import re as _re

        _DCLG_TAG_RE = _re.compile(
            r"<page_break/>|<(\w+) loc=\"([0-9,\-]*)\" page=\"(\d+)\"(?: ref=\"([^\"]*)\")?>(.*?)</\1>",
            _re.DOTALL,
        )
    return _DCLG_TAG_RE


def _dclg_unescape(s: str) -> str:
    return (
        s.replace("&quot;", '"').replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    )


def doclang_spans_doc(dclg: str) -> list[dict]:
    """Per-document DocLang parse kernel (reference DoclangInputHandler,
    core/input/handlers.py:526-570): one ``<doc>``-wrapped serialization →
    ordered span dicts (kind, text, media_ref, offset, page_no, loc).

    ``<page_break/>`` entries become page_break spans (empty text) and every
    entry consumes an offset, so the reconstructed offsets equal the
    extraction pipeline's. Shared by ``parse_doclang`` (distributed ingest)
    and ``ingest.mixed_to_documents`` (format-sniffed routing)."""
    body = dclg or ""
    if body.startswith("<doc>"):
        body = body[len("<doc>"):]
    if body.endswith("</doc>"):
        body = body[: -len("</doc>")]
    offset = 0
    page = 1
    rows: list[dict] = []
    for m in _dclg_tag_re().finditer(body):
        if m.group(1) is None:  # <page_break/>
            # _page_no_col convention: the break row belongs to the
            # FOLLOWING page (cumulative sum includes self)
            page += 1
            rows.append({
                "kind": "page_break", "text": "", "media_ref": "",
                "offset": offset, "page_no": page, "loc": None,
            })
            offset += 1
            continue
        kind, loc, pg, ref, text = m.groups()
        page = int(pg)
        rows.append({
            "kind": kind,
            "text": _dclg_unescape(text),
            "media_ref": _dclg_unescape(ref or ""),
            "offset": offset,
            "page_no": page,
            "loc": [int(x) for x in loc.split(",")] if loc else None,
        })
        offset += 1
    return rows


def parse_doclang(dclg_docs: DataFrame, text_col: str = "dclg") -> DataFrame:
    """Inverse of ``doclang_documents`` — the DocLang ingest path (reference
    DoclangInputHandler, core/input/handlers.py:526-570): parse each
    ``<doc>``-wrapped serialization back into ordered span rows
    (doc_id, offset, kind, text, media_ref, page_no, loc).

    A corpus delivered as DocLang files round-trips into the engine's spans
    table exactly (the ``doclang_roundtrip`` gate entry pins this against
    the independent golden extractor)."""
    import pandas as pd

    schema = (
        "doc_id string, offset int, kind string, text string, media_ref string, "
        "page_no int, loc array<int>"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, dclg in zip(pdf["doc_id"], pdf[text_col]):
                for s in doclang_spans_doc(dclg):
                    rows.append(
                        (doc_id, s["offset"], s["kind"], s["text"],
                         s["media_ref"], s["page_no"], s["loc"])
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "offset", "kind", "text", "media_ref", "page_no", "loc"]
            )

    return dclg_docs.mapInPandas(run, schema=schema)


def doclang_documents(geo_rows: DataFrame) -> DataFrame:
    """(doc_id, dclg) DocLang-style XML serialization with 512-grid
    locations — byte-exact quantization per provenance/models.py:72-94
    (layout.quantize_bbox_512). Input: spans.extract_span_rows_geo output.

    Tag shape: <kind loc="l,t,r,b" page="n">text</kind> with <page_break/>
    between pages (reference doclang_format.py:32-40,108-119 analog)."""
    from sparkdoc.layout import quantize_bbox_512

    q = geo_rows.withColumn(
        "qbox", quantize_bbox_512(F.col("bbox"), F.col("page_width"), F.col("page_height"))
    )
    rendered = q.select(
        "doc_id",
        "offset",
        "page_no",
        F.concat(
            F.lit("<"), F.col("kind"),
            F.lit(' loc="'), F.array_join(F.col("qbox"), ","), F.lit('"'),
            F.lit(' page="'), F.col("page_no").cast("string"), F.lit('"'),
            F.when(
                F.col("media_ref") != "",
                F.concat(F.lit(' ref="'), _xml_escape_attr(F.col("media_ref")), F.lit('"')),
            ).otherwise(F.lit("")),
            F.lit(">"),
            _xml_escape_text(F.col("text")),
            F.lit("</"), F.col("kind"), F.lit(">"),
        ).alias("tag"),
    )
    per_doc = rendered.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("offset", "page_no", "tag"))).alias("tags")
    )
    # insert <page_break/> between page transitions using the offset gaps
    body = F.array_join(
        F.transform(
            F.col("tags"),
            lambda t, i: F.when(
                (i > 0) & (t["page_no"] != F.element_at(F.col("tags"), i)["page_no"]),
                F.concat(F.lit("<page_break/>\n"), t["tag"]),
            ).otherwise(t["tag"]),
        ),
        "\n",
    )
    return per_doc.select("doc_id", F.concat(F.lit("<doc>\n"), body, F.lit("\n</doc>")).alias("dclg"))
