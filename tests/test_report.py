"""Report + graph.html exporters (pipeline/stages.py:905-1001,
core/visualizers/ analogs): deterministic markdown snapshot, self-contained
HTML with zero external fetches, visible truncation notes."""

from __future__ import annotations

from sparkdoc.report import (
    MAX_HTML_EDGES,
    MAX_HTML_NODES,
    graph_html,
    run_report_markdown,
)


def test_report_markdown_snapshot():
    md = run_report_markdown(
        "convert",
        counts={"nodes": 10, "edges": 7},
        class_counts=[("Section", 6), ("Contract", 4)],
        edge_counts=[("sections", 6)],
        coverage={"mean_coverage": 0.75},
        validation={"is_valid": True, "dangling_edges": 0},
        warnings=["over-discovery on path terms[]"],
        config={"fill_cap": 8},
    )
    expected_order = [
        "# Run report — convert",
        "## Table counts",
        "| edges | 7 |",
        "| nodes | 10 |",
        "## Nodes by class",
        "| Contract | 4 |",
        "| Section | 6 |",
        "## Edges by label",
        "## Coverage",
        "## Validation",
        "## Warnings",
        "- over-discovery on path terms[]",
        "## Effective config",
        '"fill_cap": 8',
    ]
    pos = -1
    for marker in expected_order:
        nxt = md.find(marker)
        assert nxt > pos, f"missing/misordered: {marker}"
        pos = nxt
    # deterministic: same inputs, same bytes
    assert md == run_report_markdown(
        "convert",
        counts={"nodes": 10, "edges": 7},
        class_counts=[("Section", 6), ("Contract", 4)],
        edge_counts=[("sections", 6)],
        coverage={"mean_coverage": 0.75},
        validation={"is_valid": True, "dangling_edges": 0},
        warnings=["over-discovery on path terms[]"],
        config={"fill_cap": 8},
    )


def test_graph_html_self_contained():
    nodes = [{"node_id": f"N{i}", "node_class": "Section", "label": f"§{i}"} for i in range(5)]
    edges = [{"src": "N0", "dst": f"N{i}", "label": "sections"} for i in range(1, 5)]
    out = graph_html(nodes, edges)
    assert "<script>" in out and "N3" in out and "§2" in out
    # zero network fetches: no src/href attributes, no fetch/import calls
    # (the SVG xmlns constant is a namespace identifier, not a fetch)
    assert 'src="' not in out and "href=" not in out
    assert "fetch(" not in out and "import(" not in out and "https://" not in out


def test_graph_html_cap_is_visible():
    nodes = [
        {"node_id": f"N{i}", "node_class": "C", "label": str(i)}
        for i in range(MAX_HTML_NODES + 50)
    ]
    edges = [
        {"src": "N0", "dst": f"N{i % 100}", "label": "e"} for i in range(MAX_HTML_EDGES + 10)
    ]
    out = graph_html(nodes, edges)
    assert "full graph in parquet" in out  # never silently truncates
    small = graph_html(nodes[:3], edges[:2])
    assert "full graph in parquet" not in small


def test_graph_html_cap_note_counts_rendered_edges():
    """The cap note must report edges actually DRAWN: an edge whose endpoint
    fell outside the kept node sample cannot render, so counting it in
    'showing K/total' overstates coverage."""
    nodes = [
        {"node_id": f"N{i}", "node_class": "C", "label": str(i)}
        for i in range(MAX_HTML_NODES + 50)
    ]
    # every edge touches a node BEYOND the kept first MAX_HTML_NODES
    edges = [
        {"src": f"N{MAX_HTML_NODES + (i % 50)}", "dst": "N0", "label": "e"}
        for i in range(200)
    ]
    out = graph_html(nodes, edges)
    assert f"showing {MAX_HTML_NODES}/{MAX_HTML_NODES + 50} nodes, 0/200 edges" in out
    # and no dangling edge is embedded in the payload
    assert '"s": "N' + str(MAX_HTML_NODES) + '"' not in out


def test_report_from_convert_and_export(spark, tmp_path):
    import os

    from sparkdoc.report import export_report_and_html

    nodes = spark.createDataFrame(
        [("N1", "d1", "Section", "§1"), ("N2", "d1", "Contract", "CT-1")],
        "node_id string, doc_id string, node_class string, label string",
    )
    edges = spark.createDataFrame(
        [("N1", "N2", "contracts")], "src string, dst string, label string"
    )
    cov = spark.createDataFrame([("d1", 4, 3, 0.75)], "doc_id string, n_chunks int, n_covered int, coverage double")
    out = {"nodes": nodes, "edges": edges, "ledger": edges.limit(0), "entities": nodes,
           "invalid_entities": nodes.limit(0), "alias_audit": edges.limit(0), "coverage": cov}
    paths = export_report_and_html(out, str(tmp_path))
    assert os.path.isfile(paths["report"]) and os.path.isfile(paths["graph_html"])
    md = open(paths["report"]).read()
    assert "| Contract | 1 |" in md and "| mean_coverage | 0.75 |" in md
    html = open(paths["graph_html"]).read()
    assert "N1" in html and "contracts" not in ""  # html written with node data


def test_report_escapes_pipes_and_newlines():
    from sparkdoc.report import run_report_markdown

    md = run_report_markdown(
        "job",
        counts={"a|b": 1},
        validation={"pattern": "x|y\nz"},
        warnings=["bad | value\nwith newline"],
    )
    import re

    # one '|'-bearing value must not add phantom table columns: each row has
    # exactly 3 UNESCAPED pipes (| key | value |)
    for ln in md.splitlines():
        if ln.startswith("|") and "---" not in ln:
            assert len(re.findall(r"(?<!\\)\|", ln)) == 3, ln
    assert "a\\|b" in md and "x\\|y z" in md
    assert "- bad \\| value with newline" in md
