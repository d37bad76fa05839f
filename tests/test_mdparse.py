"""Raw-Markdown ingestion: block parser, inline stripping, span parity.

Reference analog: DocumentInputHandler routes .md/.txt straight into docling
conversion (core/input/handlers.py:44-105); docling's Markdown backend emits
the item sequence our spans table models.  The correctness bar here is the
same as HTML's: parser blocks == the closed-form authored plan, and the
fused zero-shuffle path == the generic flatten→XY-cut path span-for-span.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdoc.mdparse import (
    _strip_inline,
    flatten_markdown,
    md_blocks_doc,
    md_spans_doc,
    md_to_documents,
)
from sparkdoc.synth import expected_md_spans, md_corpus_df, synth_md_doc


def blocks(md: str) -> list[tuple]:
    return [(b["tag"], b["text"], b["n_links"]) for b in md_blocks_doc(md)]


# --------------------------------------------------------------------------
# Block parser unit cases
# --------------------------------------------------------------------------


def test_atx_headings_and_closing_hashes():
    assert blocks("# A\n\n### Head ###") == [("h1", "A", 0), ("h3", "Head", 0)]


def test_setext_headings():
    assert blocks("Alpha\n=====\n\nBeta\n-----") == [
        ("h1", "Alpha", 0),
        ("h2", "Beta", 0),
    ]


def test_hr_emits_nothing_but_setext_wins_after_paragraph():
    # bare --- is a thematic break; --- directly under text is a setext h2
    assert blocks("---") == []
    assert blocks("x\n---") == [("h2", "x", 0)]
    assert blocks("x\n\n---") == [("p", "x", 0)]


def test_paragraph_soft_wrap_joins_with_space():
    assert blocks("one two\nthree four") == [("p", "one two three four", 0)]


def test_fenced_code_verbatim_backtick_and_tilde():
    md = "```python\na = 1  # *x*\n```\n\n~~~\n_b_\n~~~"
    assert blocks(md) == [("pre", "a = 1  # *x*", 0), ("pre", "_b_", 0)]


def test_unclosed_fence_runs_to_eof():
    assert blocks("```\nnever closed") == [("pre", "never closed", 0)]


def test_list_markers_and_continuation():
    assert blocks("- a\n* b\n+ c\n1. d\n2) e") == [
        ("li", "a", 0), ("li", "b", 0), ("li", "c", 0),
        ("li", "d", 0), ("li", "e", 0),
    ]
    assert blocks("- item\n  continued here") == [("li", "item continued here", 0)]


def test_pipe_table_cells_and_separator():
    md = "| a | b |\n|:--|--:|\n|c|  d |"
    assert blocks(md) == [("table", "a | b\nc | d", 0)]


def test_table_header_only():
    assert blocks("| h1 | h2 |\n|---|---|") == [("table", "h1 | h2", 0)]


def test_standalone_image_and_empty_alt():
    assert blocks('![Fig 1](/i.png)\n\n![](/j.png "t")') == [
        ("img", "Fig 1", 0), ("img", "", 0),
    ]


def test_blockquote_run_joined():
    assert blocks("> a **b**\n> c") == [("blockquote", "a b c", 0)]


def test_inline_strip_links_emphasis_code_escapes():
    text, n_links = _strip_inline(
        r"a \*lit\* **b** `c *d*` [e f](/g) <https://h.i>"
    )
    assert text == "a *lit* b c *d* e f https://h.i"
    assert n_links == len("e f") + len("https://h.i")


def test_inline_image_inside_paragraph_becomes_alt():
    assert blocks("see ![alt text](/x.png) here") == [("p", "see alt text here", 0)]


def test_emphasis_inside_link_text_counts_stripped_chars():
    text, n_links = _strip_inline("[**bold link**](/x)")
    assert text == "bold link"
    assert n_links == len("bold link")


def test_snake_case_underscores_survive():
    assert blocks("use snake_case_name here") == [("p", "use snake_case_name here", 0)]


def test_empty_and_none_inputs():
    assert md_blocks_doc("") == []
    assert md_blocks_doc(None) == []


# --------------------------------------------------------------------------
# Closed-form corpus parity (driver-side, no Spark)
# --------------------------------------------------------------------------


def test_parser_matches_authored_plan_two_seeds():
    for seed in (42, 7):
        for i in range(40):
            d = synth_md_doc(i, seed)
            got = [(b["tag"], b["text"], b["n_links"]) for b in md_blocks_doc(d["markdown"])]
            assert got == d["expected"], (seed, d["doc_id"])


def test_spans_kernel_matches_expected_spans():
    exp: dict[str, list] = {}
    for s in expected_md_spans(30, 42):
        exp.setdefault(s["doc_id"], []).append(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
        )
    for i in range(30):
        d = synth_md_doc(i, 42)
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in md_spans_doc(d["doc_id"], d["markdown"])
        ]
        assert got == exp.get(d["doc_id"], [])


# --------------------------------------------------------------------------
# Spark paths: fused == generic, zero-shuffle plan shape
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    return md_corpus_df(spark, 16, 42, partitions=4)


def test_fused_path_parity_with_generic_xy_cut_path(spark, corpus):
    from sparkdoc.spans import explode_spans, extract_documents

    dirty = corpus.unionByName(
        spark.createDataFrame(
            [("dirty-doc", "bell\x07inside\n\n[x](/y) link farm only")],
            "doc_id string, markdown string",
        )
    )
    a = sorted(tuple(r) for r in explode_spans(md_to_documents(dirty)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_markdown(dirty))).collect()
    )
    assert a == b
    assert ("dirty-doc", "text", "bellinside", "", 0) in a


def test_fused_plan_is_zero_shuffle(spark, corpus):
    df = md_to_documents(corpus)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_corpus_spans_match_closed_form(spark, corpus):
    from sparkdoc.spans import explode_spans

    got = sorted(
        tuple(r)
        for r in explode_spans(md_to_documents(corpus))
        .select("doc_id", "kind", "text", "media_ref", "offset")
        .collect()
    )
    want = sorted(
        (s["doc_id"], s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expected_md_spans(16, 42)
    )
    assert got == want


def test_chunker_runs_on_markdown_documents(spark, corpus):
    from sparkdoc.chunker import chunk_documents

    chunks = chunk_documents(md_to_documents(corpus))
    n = chunks.count()
    assert n > 0
    assert chunks.filter(F.col("token_count") <= 0).count() == 0
