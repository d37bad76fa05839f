"""HTML flattener + Boilerpipe NumWordsRules tests.

The closed-form gate (html_extract_pinned) pins the whole html→spans path;
these cases pin the parser semantics one rule at a time.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sparkdoc.htmlparse import (
    flatten_html,
    flatten_html_doc,
    numwords_content,
    strip_boilerplate,
)
from sparkdoc.synth import expected_html_spans, html_corpus_df, synth_html_doc


def blocks(html: str) -> list[tuple[str, str, int]]:
    return [(r["tag"], r["text"], r["n_links"]) for r in flatten_html_doc("d", html)]


# ---------------------------------------------------------------- kernel


def test_entities_and_unicode():
    assert blocks("<p>R&amp;D &lt;5% caf&eacute; naïve</p>") == [
        ("p", "R&D <5% café naïve", 0)
    ]


def test_inline_markup_collapses():
    html = "<p>quick <b>brown</b> <em>fox</em>\n  jumps</p>"
    assert blocks(html) == [("p", "quick brown fox jumps", 0)]


def test_anchor_chars_counted_single_and_adjacent():
    # one anchor split across chunks by an entity: collapsed count = 9
    assert blocks("<p>see <a href='#'>foo &amp; bar</a> now</p>") == [
        ("p", "see foo & bar now", 9)
    ]
    # adjacent anchors gain no phantom separator chars
    assert blocks("<p><a>x</a><a>y</a></p>") == [("p", "xy", 2)]


def test_table_rows_cells_and_links():
    html = """<table>
      <tr><th> a </th><th>b</th></tr>
      <tr><td>c</td><td><a href='#'>dd</a></td></tr>
    </table>"""
    assert blocks(html) == [("table", "a | b\nc | dd", 2)]


def test_unclosed_p_streak_stays_in_order():
    html = "<p>one<p>two<div><p>three</div>"
    assert blocks(html) == [("p", "one", 0), ("p", "two", 0), ("p", "three", 0)]


def test_unclosed_li_and_nested_list_order():
    # sibling <li> auto-closes an open li; text before a nested list emits
    # before its items; trailing loose text flattens as an implicit p —
    # reading order is preserved throughout
    html = "<ul><li>a<li>b<ul><li>c</li></ul>d</ul>"
    assert blocks(html) == [
        ("li", "a", 0), ("li", "b", 0), ("li", "c", 0), ("p", "d", 0)
    ]


def test_pre_preserves_whitespace():
    code = "def f(x):\n    return  x * 2"
    assert blocks(f"<pre>{code}</pre>") == [("pre", code, 0)]


def test_head_dropped_title_becomes_h1():
    html = ("<head><style>p{}</style><script>x()</script><title>The Doc</title>"
            "</head><body><p>body</p></body>")
    assert blocks(html) == [("h1", "The Doc", 0), ("p", "body", 0)]


def test_script_style_comment_dropped_in_body():
    html = "<p>a</p><script>var x='<p>ghost</p>';</script><!-- hidden --><p>b</p>"
    assert blocks(html) == [("p", "a", 0), ("p", "b", 0)]


def test_img_inside_p_splits_in_reading_order():
    html = "<p>before <img src='x' alt='pic'> after</p>"
    assert blocks(html) == [
        ("p", "before", 0), ("img", "pic", 0), ("p", "after", 0)
    ]


def test_img_inside_li_keeps_order():
    html = "<ul><li>text <img alt=''> tail</li></ul>"
    assert blocks(html) == [("li", "text", 0), ("img", "", 0), ("li", "tail", 0)]


def test_blockquote_with_nested_p_splits_in_order():
    html = "<blockquote>intro<p>quoted</p>outro</blockquote>"
    assert blocks(html) == [
        ("blockquote", "intro", 0), ("p", "quoted", 0), ("blockquote", "outro", 0)
    ]


def test_container_and_hr_flush_implicit_text():
    html = "<div>loose text<hr>more</div>"
    assert blocks(html) == [("p", "loose text", 0), ("p", "more", 0)]


def test_malformed_and_empty():
    assert flatten_html_doc("d", "") == []
    assert flatten_html_doc("d", None) == []
    assert blocks("<p><<<>>&&& <b>ok") == [("p", "<<<>>&&& ok", 0)]


def test_geometry_single_unpaginated_canvas():
    d = synth_html_doc(0, 42)
    rows = flatten_html_doc(d["doc_id"], d["html"])
    assert all(r["page_no"] == 1 for r in rows)
    ys = [r["bbox"][1] for r in rows]
    assert ys == sorted(ys) and len(set(ys)) == len(ys)
    assert all(r["page_height"] >= r["bbox"][3] for r in rows)
    assert [r["node_id"] for r in rows] == list(range(1, len(rows) + 1))


def test_kernel_matches_closed_form_plan_200_docs():
    for i in range(200):
        d = synth_html_doc(i, 42)
        got = [(r["tag"], r["text"], r["n_links"])
               for r in flatten_html_doc(d["doc_id"], d["html"])]
        assert got == d["expected"], f"doc {i}"


# ---------------------------------------------------------------- spark


def test_flatten_html_spark_equals_kernel(spark):
    docs = html_corpus_df(spark, 12, 42, partitions=3)
    got = sorted(
        (r["doc_id"], r["node_id"], r["tag"], r["text"], r["n_links"])
        for r in flatten_html(docs).collect()
    )
    exp = []
    for i in range(12):
        d = synth_html_doc(i, 42)
        exp.extend(
            (r["doc_id"], r["node_id"], r["tag"], r["text"], r["n_links"])
            for r in flatten_html_doc(d["doc_id"], d["html"])
        )
    assert got == sorted(exp)


def test_html_to_spans_pipeline_matches_expected(spark):
    from sparkdoc.spans import explode_spans, extract_documents

    nodes = flatten_html(html_corpus_df(spark, 16, 42, partitions=4))
    spans = explode_spans(extract_documents(nodes)).select(
        "doc_id", "offset", "kind", "text", "media_ref"
    )
    got = sorted(tuple(r) for r in spans.collect())
    exp = sorted(
        (d["doc_id"], d["offset"], d["kind"], d["text"], d["media_ref"])
        for d in expected_html_spans(16, 42)
    )
    assert got == exp


# ------------------------------------------------- NumWordsRules classifier


def _nodes_df(spark, rows):
    return spark.createDataFrame(
        [("d", i + 1, t, len(t), l) for i, (t, l) in enumerate(rows)],
        "doc_id string, node_id int, text string, n_chars int, n_links int",
    )


def test_numwords_truth_table(spark):
    w = lambda n: " ".join(["w"] * n)  # noqa: E731
    rows = [
        (w(5), 0),     # 1: words 5, next 20>15 → content
        (w(20), 0),    # 2: words 20>16 → content
        (w(3), 0),     # 3: prev 20>4 → content
        (w(10), 19),   # 4: link_density 19/19=1 > 0.333 → boilerplate
        (w(20), 0),    # 5: prev_ld 1 > 0.555, words 20≤40, next 50>17 → content
        (w(50), 0),    # 6: words 50>16, prev_ld 0 → content
        (w(2), 0),     # 7: prev 50>4 → content
        (w(1), 0),     # 8: words 1, next 0, prev 2≤4 → boilerplate
    ]
    out = {r["node_id"]: r["is_content"]
           for r in numwords_content(_nodes_df(spark, rows)).collect()}
    assert out == {1: True, 2: True, 3: True, 4: False, 5: True, 6: True,
                   7: True, 8: False}


def test_numwords_prev_high_small_next_is_boilerplate(spark):
    w = lambda n: " ".join(["w"] * n)  # noqa: E731
    rows = [(w(10), 29), (w(20), 0), (w(5), 0)]
    out = {r["node_id"]: r["is_content"]
           for r in numwords_content(_nodes_df(spark, rows)).collect()}
    # node 2: prev_ld 29/29 > 0.555, words 20 ≤ 40, next 5 ≤ 17 → boilerplate
    assert out[2] is False


def test_strip_boilerplate_keeps_structure_drops_nav(spark):
    d = synth_html_doc(2, 42)  # has a nav farm by construction
    nodes = flatten_html(
        spark.createDataFrame([(d["doc_id"], d["html"])], "doc_id string, html string")
    )
    kept = strip_boilerplate(nodes)
    tags = [r["tag"] for r in kept.collect()]
    assert "nav" not in tags
    src_tags = {t for t, _, _ in d["expected"]}
    for structural in ("h1", "img", "table"):
        if structural in src_tags:
            assert structural in tags
    # no helper columns leak
    assert set(kept.columns) == set(nodes.columns)


def test_word_count_blank_is_zero(spark):
    df = spark.createDataFrame([("",), ("  ",), ("a b",)], "text string")
    from sparkdoc.htmlparse import word_count

    got = [r["w"] for r in df.select(word_count(F.col("text")).alias("w")).collect()]
    assert got == [0, 0, 2]


def test_fused_path_parity_with_two_stage(spark):
    """html_to_documents_fused (zero-shuffle) == extract_documents(
    flatten_html(...)) span-for-span, including control-char sanitize."""
    from sparkdoc.htmlparse import html_to_documents_fused
    from sparkdoc.spans import explode_spans, extract_documents

    corpus = html_corpus_df(spark, 16, 42, partitions=4)
    # inject a control char through the html side: entity &#7; decodes to \x07
    dirty = corpus.unionByName(
        spark.createDataFrame(
            [("dirty-doc", "<p>bell&#7;inside</p><nav><a>xxxx</a></nav>")],
            "doc_id string, html string",
        )
    )
    a = sorted(tuple(r) for r in explode_spans(html_to_documents_fused(dirty)).collect())
    b = sorted(
        tuple(r)
        for r in explode_spans(extract_documents(flatten_html(dirty))).collect()
    )
    assert a == b
    assert ("dirty-doc", "text", "bellinside", "", 0) in {
        (d, k, t, m, o) for (d, k, t, m, o) in
        ((r[0], r[1], r[2], r[3], r[4]) for r in a)
    }


def test_fused_plan_is_zero_shuffle(spark):
    from sparkdoc.htmlparse import html_to_documents_fused

    df = html_to_documents_fused(html_corpus_df(spark, 8, 42, partitions=2))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
