"""Single-node golden extractor — the executable spec for span emission.

This is an INDEPENDENT plain-Python implementation of the extraction
semantics (sanitize → boilerplate drop → classify → bbox normalize →
repeated-text furniture → XY-cut order → page breaks → offsets). The Spark
pipeline (clean.py + spans.py) must match it byte-exact per document:
span-sequence equality on (kind, text, media_ref, order) — the BASELINE.json
correctness invariant. Only ``xy_cut_order`` is shared (a pure function of
the box list; sharing it cannot mask a distributed-vs-sequential divergence).

Golden fixtures for pytest are produced by running this over synth.py docs.
"""

from __future__ import annotations

import re

from sparkdoc.layout import xy_cut_order

_CTRL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")

_KIND = {
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

REPEAT_FURNITURE_PAGES = 3


def extract_spans_golden(doc_nodes: list[dict]) -> list[dict]:
    """raw_nodes rows of ONE document → ordered span dicts."""
    kept = []
    for n in doc_nodes:
        text = _CTRL.sub("", n["text"] or "")
        tag = n["tag"]
        if tag == "nav" or (n["n_links"] > 0 and n["n_links"] * 2 > n["n_chars"]):
            continue  # boilerplate (link density > 0.5)
        if tag != "img" and not text.strip():
            continue
        if n["coord_origin"] == "BOTTOMLEFT" and n["page_height"] is None:
            continue  # un-normalizable geometry
        if n["bbox"] is None:
            continue  # un-renderable geometry (mirrored in classify_raw_nodes)
        bbox = list(n["bbox"])
        if n["coord_origin"] == "BOTTOMLEFT":
            l, t, r, b = bbox
            bbox = [l, int(n["page_height"] - t), r, int(n["page_height"] - b)]
        kind = _KIND.get(tag, "text")
        media_ref = f"#/pictures/{n['node_id']}" if kind == "picture" else ""
        kept.append(
            {
                "node_id": n["node_id"],
                "kind": kind,
                "text": text,
                "media_ref": media_ref,
                "page_no": n["page_no"],
                "bbox": bbox,
            }
        )

    kept.sort(key=lambda r: r["node_id"])
    pages_by_text: dict[str, set] = {}
    for r in kept:
        if r["kind"] == "text":
            pages_by_text.setdefault(r["text"], set()).add(r["page_no"])
    repeated = {t for t, ps in pages_by_text.items() if len(ps) >= REPEAT_FURNITURE_PAGES}

    by_page: dict[int, list[dict]] = {}
    for r in kept:
        by_page.setdefault(r["page_no"], []).append(r)

    spans: list[dict] = []
    offset = 0
    for pi, page in enumerate(sorted(by_page)):
        if pi > 0:
            spans.append({"kind": "page_break", "text": "", "media_ref": "", "offset": offset})
            offset += 1
        group = by_page[page]
        for i in xy_cut_order([tuple(r["bbox"]) for r in group]):
            r = group[i]
            kind = "furniture" if (r["kind"] == "text" and r["text"] in repeated) else r["kind"]
            spans.append(
                {"kind": kind, "text": r["text"], "media_ref": r["media_ref"], "offset": offset}
            )
            offset += 1
    return spans


def extract_corpus_golden(nodes: list[dict]) -> dict[str, list[dict]]:
    """All docs: doc_id → ordered spans. Documents whose nodes are all
    dropped (e.g. only un-normalizable geometry) are OMITTED — the pipeline
    emits no row for them; they show up in metrics, not in the spans table."""
    by_doc: dict[str, list[dict]] = {}
    for n in nodes:
        by_doc.setdefault(n["doc_id"], []).append(n)
    out = {d: extract_spans_golden(rows) for d, rows in by_doc.items()}
    return {d: spans for d, spans in out.items() if spans}
