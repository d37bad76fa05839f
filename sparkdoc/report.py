"""Run-report and graph-visualization exporters.

Reference analogs:
  report.md            pipeline export stages, pipeline/stages.py:905-1001
                       (run summary: config, counts, coverage, validation)
  graph.html           core/visualizers/ (bundled-asset interactive view —
                       NO CDN fetches; the reference vendors its JS, this
                       engine inlines a dependency-free force layout)

Both are DRIVER-SIDE artifacts over already-aggregated/small data — the
same "single-file artifact per run" shape as the reference's exports. The
corpus-scale outputs stay in the partitioned parquet tables; these renderers
must only ever see collected summaries (graph_html caps nodes/edges and says
so in the artifact rather than silently truncating).
"""

from __future__ import annotations

import html
import json
from typing import Any, Iterable

from pyspark.sql import functions as F

MAX_HTML_NODES = 600
MAX_HTML_EDGES = 1200


# --------------------------------------------------------------------------
# report.md
# --------------------------------------------------------------------------


def run_report_markdown(
    job: str,
    counts: dict[str, int] | None = None,
    stats: dict[str, Any] | None = None,
    validation: dict[str, Any] | None = None,
    coverage: dict[str, Any] | None = None,
    class_counts: Iterable[tuple[str, int]] = (),
    edge_counts: Iterable[tuple[str, int]] = (),
    warnings: Iterable[str] = (),
    config: dict[str, Any] | None = None,
    extra_tables: Iterable[tuple[str, Iterable[tuple[str, Any]]]] = (),
) -> str:
    """Markdown run report (stages.py:905-1001 analog): deterministic section
    order, sorted keys — snapshot-testable."""
    lines: list[str] = [f"# Run report — {job}", ""]

    def cell(v: Any) -> str:
        # a '|' or newline inside a value would add phantom columns / split
        # the row — escape them so the table structure survives any value
        return str(v).replace("|", "\\|").replace("\n", " ")

    def table(title: str, rows: Iterable[tuple[str, Any]]) -> None:
        rows = list(rows)
        if not rows:
            return
        lines.extend([f"## {title}", "", "| key | value |", "|---|---|"])
        for k, v in rows:
            lines.append(f"| {cell(k)} | {cell(v)} |")
        lines.append("")

    if counts:
        table("Table counts", sorted(counts.items()))
    if class_counts:
        table("Nodes by class", sorted(class_counts))
    if edge_counts:
        table("Edges by label", sorted(edge_counts))
    for title, rows in extra_tables:
        table(title, rows)
    if coverage:
        table("Coverage", sorted(coverage.items()))
    if validation:
        table("Validation", sorted(validation.items()))
    if stats:
        table("Stats", sorted(stats.items()))
    ws = list(warnings)
    if ws:
        lines.extend(["## Warnings", ""])
        lines.extend(f"- {cell(w)}" for w in ws)
        lines.append("")
    if config:
        lines.extend(["## Effective config", "", "```json",
                      json.dumps(config, indent=2, sort_keys=True, default=str), "```", ""])
    return "\n".join(lines)


def report_from_convert(out: dict, collect_cap: int = 10000, counts: dict | None = None) -> str:
    """Build the report from a convert_document_graph output dict (driver
    side; aggregates only — each input is a groupBy count, never raw rows).

    Pass ``counts`` when table counts are already known (the convert job
    counts its written parquet): counting the live ``entities``/``ledger``
    DAGs here re-executes the whole extraction pipeline once per table.
    ``collect_cap`` bounds the per-class/per-label breakdown rows collected
    to the driver (largest classes first, deterministic tie-break)."""
    if counts is None:
        counts = {}
        for name in ("nodes", "edges", "entities", "invalid_entities", "ledger", "alias_audit"):
            if name in out:
                counts[name] = out[name].count()
    class_counts = [
        (r["node_class"], r["count"])
        for r in out["nodes"].groupBy("node_class").count()
        .orderBy(F.desc("count"), "node_class").limit(collect_cap).collect()
    ]
    edge_counts = [
        (r["label"], r["count"])
        for r in out["edges"].groupBy("label").count()
        .orderBy(F.desc("count"), "label").limit(collect_cap).collect()
    ]
    cov = out["coverage"].agg({"coverage": "avg", "n_chunks": "sum", "n_covered": "sum"}).collect()[0]
    coverage = {
        "mean_coverage": round(float(cov["avg(coverage)"] or 0), 6),
        "total_chunks": int(cov["sum(n_chunks)"] or 0),
        "covered_chunks": int(cov["sum(n_covered)"] or 0),
    }
    return run_report_markdown("convert", counts=dict(counts), class_counts=class_counts,
                               edge_counts=edge_counts, coverage=coverage)


# --------------------------------------------------------------------------
# graph.html — self-contained, zero external assets
# --------------------------------------------------------------------------

_HTML_SHELL = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>sparkdoc graph</title>
<style>
 body {{ margin:0; font:13px system-ui, sans-serif; background:#fafafa; }}
 #bar {{ padding:8px 12px; background:#fff; border-bottom:1px solid #ddd; }}
 #cap {{ color:#a40; margin-left:12px; }}
 svg {{ width:100vw; height:calc(100vh - 40px); }}
 line {{ stroke:#bbb; stroke-width:1; }}
 circle {{ stroke:#fff; stroke-width:1.5; cursor:pointer; }}
 text.lbl {{ font-size:10px; fill:#333; pointer-events:none; }}
</style></head>
<body>
<div id="bar"><b>sparkdoc graph</b> — {n_nodes} nodes, {n_edges} edges
<span id="cap">{cap_note}</span><span id="info"></span></div>
<svg id="g"></svg>
<script>
const NODES = {nodes_json};
const EDGES = {edges_json};
const COLORS = ["#4c78a8","#f58518","#54a24b","#e45756","#72b7b2","#b279a2","#ff9da6","#9d755d"];
const classes = [...new Set(NODES.map(n => n.c))].sort();
const color = c => COLORS[classes.indexOf(c) % COLORS.length];
const W = innerWidth, H = innerHeight - 40;
// deterministic init: class-banded circles (no RNG — stable artifact)
NODES.forEach((n, i) => {{
  const band = classes.indexOf(n.c) + 1, k = i / NODES.length * 2 * Math.PI;
  n.x = W/2 + (band / (classes.length + 1)) * Math.min(W,H)/2.5 * Math.cos(k * 7 + band);
  n.y = H/2 + (band / (classes.length + 1)) * Math.min(W,H)/2.5 * Math.sin(k * 7 + band);
  n.vx = 0; n.vy = 0;
}});
const byId = Object.fromEntries(NODES.map(n => [n.id, n]));
const links = EDGES.filter(e => byId[e.s] && byId[e.t]);
function tick() {{
  for (const e of links) {{
    const a = byId[e.s], b = byId[e.t];
    const dx = b.x - a.x, dy = b.y - a.y, d = Math.hypot(dx, dy) || 1;
    const f = (d - 90) * 0.004;
    a.vx += f * dx / d; a.vy += f * dy / d; b.vx -= f * dx / d; b.vy -= f * dy / d;
  }}
  for (let i = 0; i < NODES.length; i++) for (let j = i + 1; j < NODES.length; j++) {{
    const a = NODES[i], b = NODES[j];
    const dx = b.x - a.x, dy = b.y - a.y, d2 = dx*dx + dy*dy + 1;
    if (d2 < 22500) {{ const f = 220 / d2; a.vx -= f*dx; a.vy -= f*dy; b.vx += f*dx; b.vy += f*dy; }}
  }}
  for (const n of NODES) {{
    n.vx += (W/2 - n.x) * 0.0006; n.vy += (H/2 - n.y) * 0.0006;
    n.x += n.vx *= 0.85; n.y += n.vy *= 0.85;
  }}
}}
const svg = document.getElementById("g");
svg.setAttribute("viewBox", `0 0 ${{W}} ${{H}}`);
const NS = "http://www.w3.org/2000/svg";
const lineEls = links.map(() => svg.appendChild(document.createElementNS(NS, "line")));
const nodeEls = NODES.map(n => {{
  const c = document.createElementNS(NS, "circle");
  c.setAttribute("r", 6); c.setAttribute("fill", color(n.c));
  c.addEventListener("mouseenter", () =>
    document.getElementById("info").textContent = ` — ${{n.c}}: ${{n.l}} (${{n.id}})`);
  return svg.appendChild(c);
}});
function render() {{
  links.forEach((e, i) => {{
    const a = byId[e.s], b = byId[e.t], el = lineEls[i];
    el.setAttribute("x1", a.x); el.setAttribute("y1", a.y);
    el.setAttribute("x2", b.x); el.setAttribute("y2", b.y);
  }});
  NODES.forEach((n, i) => {{
    nodeEls[i].setAttribute("cx", n.x); nodeEls[i].setAttribute("cy", n.y);
  }});
}}
let steps = 0;
(function loop() {{ tick(); render(); if (++steps < 300) requestAnimationFrame(loop); }})();
</script></body></html>
"""


def graph_html(
    nodes: list[dict],
    edges: list[dict],
    total_nodes: int | None = None,
    total_edges: int | None = None,
) -> str:
    """Self-contained interactive graph view (core/visualizers/ analog):
    inline force layout, zero network fetches. Inputs are collected row
    dicts — nodes need (node_id, node_class, label), edges (src, dst,
    label). Oversized graphs are capped with a visible note (never a silent
    truncation); pass ``total_nodes``/``total_edges`` when the lists were
    already limit()-collected so the note reports the TRUE table sizes
    rather than the collected-sample size."""
    total_nodes = len(nodes) if total_nodes is None else total_nodes
    total_edges = len(edges) if total_edges is None else total_edges
    capped = total_nodes > MAX_HTML_NODES or total_edges > MAX_HTML_EDGES
    nodes = nodes[:MAX_HTML_NODES]
    edges = edges[:MAX_HTML_EDGES]
    # an edge whose endpoint fell outside the kept node sample cannot render;
    # drop it HERE so the cap note reports the count actually drawn (the
    # "first K/total edges" phrasing was a lie when most sampled edges
    # touched un-sampled nodes)
    kept_ids = {n["node_id"] for n in nodes}
    edges = [e for e in edges if e["src"] in kept_ids and e["dst"] in kept_ids]
    cap_note = ""
    if capped:
        cap_note = (
            f"showing {len(nodes)}/{total_nodes} nodes, "
            f"{len(edges)}/{total_edges} edges — full graph in parquet"
        )
    njson = json.dumps(
        [
            {"id": n["node_id"], "c": n.get("node_class", ""), "l": (n.get("label") or "")[:60]}
            for n in nodes
        ],
        ensure_ascii=False,
    )
    ejson = json.dumps(
        [{"s": e["src"], "t": e["dst"], "l": e.get("label", "")} for e in edges],
        ensure_ascii=False,
    )
    return _HTML_SHELL.format(
        n_nodes=len(nodes),
        n_edges=len(edges),
        cap_note=html.escape(cap_note),
        nodes_json=njson.replace("</", "<\\/"),
        edges_json=ejson.replace("</", "<\\/"),
    )


def export_report_and_html(out: dict, out_dir: str, counts: dict | None = None) -> dict[str, str]:
    """Write report.md + graph.html next to a convert job's tables (the
    reference's DoclingExport/Visualization stages). Returns paths.
    ``counts`` is forwarded to report_from_convert (precomputed table counts
    avoid re-executing live pipeline DAGs). Artifacts are written through the
    Hadoop FS API so they land on the DATA filesystem (hdfs://|s3a:// out
    dirs on a cluster), not the driver's local disk."""
    import os

    from sparkdoc.io import write_text_file

    spark = out["nodes"].sparkSession
    report_path = os.path.join(out_dir, "report.md")
    # compute the two totals ONCE and hand them to report_from_convert too —
    # letting both paths self-count doubled the Spark actions over the
    # many-stage extraction plan (the cost the counts parameter exists to
    # avoid)
    if counts is None:
        # build the FULL counts dict report_from_convert would otherwise
        # build internally, so every table is counted exactly once here
        counts = {
            name: out[name].count()
            for name in ("nodes", "edges", "entities", "invalid_entities", "ledger", "alias_audit")
            if name in out
        }
    else:
        counts = dict(counts)
        counts.setdefault("nodes", out["nodes"].count())
        counts.setdefault("edges", out["edges"].count())
    write_text_file(spark, report_path, report_from_convert(out, counts=counts))
    total_nodes = counts["nodes"]
    total_edges = counts["edges"]
    # orderBy before limit: an unordered limit() samples whichever partitions
    # answer first — two runs of the same corpus would render different HTML
    nodes = [r.asDict() for r in out["nodes"].select("node_id", "node_class", "label").orderBy("node_id").limit(MAX_HTML_NODES + 1).collect()]
    edges = [r.asDict() for r in out["edges"].select("src", "dst", "label").orderBy("src", "dst", "label").limit(MAX_HTML_EDGES + 1).collect()]
    html_path = os.path.join(out_dir, "graph.html")
    write_text_file(
        spark, html_path,
        graph_html(nodes, edges, total_nodes=total_nodes, total_edges=total_edges),
    )
    return {"report": report_path, "graph_html": html_path}
