"""WebVTT ingestion: cue parser → the engine's span path.

The reference's generic-document handler (core/input/handlers.py:560-563)
runs a bare docling ``DocumentConverter()``, whose default format matrix
includes WebVTT transcripts (docling's audio/subtitle route); this module
is the from-scratch Spark-side equivalent — a cue parser over the WebVTT
grammar emitting one ``p`` block per cue through the shared single-canvas
span pipeline.

WebVTT subset (documented contract, pinned by the closed-form gate):

* the ``WEBVTT`` signature line (optional trailing header text) is
  required — the mixed sniffer keys on it — and is not content
* ``NOTE`` / ``STYLE`` / ``REGION`` blocks are skipped whole (to the next
  blank line)
* a cue = optional identifier line (no ``-->``), a timing line
  (``hh:mm:ss.mmm --> hh:mm:ss.mmm`` with optional settings), then payload
  lines to the next blank line; timings and identifiers are not content
* payload lines join with a space; ``<v Speaker>`` voice tags render as a
  ``Speaker: `` prefix (speaker turns are content); all other inline tags
  (``<b>``, ``<i>``, ``<c.class>``, timestamps ``<00:00:01.000>``) are
  stripped
* one ``p`` block per cue, document order = cue order (a transcript is ONE
  unpaginated canvas; there is no geometry to recover)
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdoc.htmlparse import blocks_to_raw_nodes, blocks_to_spans
from sparkdoc.schemas import RAW_NODES

_TIMING_RE = re.compile(r"-->")
_VOICE_RE = re.compile(r"<v(?:\.[^ >]*)?\s+([^>]*)>")
_TAG_RE = re.compile(r"</?[^>]*>")


def is_vtt(text: str) -> bool:
    """The WebVTT file signature: 'WEBVTT' then EOF, space, tab, or a line
    break (the spec's exact admission rule)."""
    return text.startswith("WEBVTT") and (
        len(text) == 6 or text[6] in (" ", "\t", "\n", "\r")
    )


def _cue_text(payload: list[str]) -> str:
    """Payload lines → one cue text: voice tags become 'Speaker: ' turn
    prefixes, every other tag is stripped, lines join with a space."""
    parts: list[str] = []
    for ln in payload:
        ln = _VOICE_RE.sub(lambda m: f"{m.group(1)}: ", ln)
        ln = _TAG_RE.sub("", ln)
        if ln.strip():
            parts.append(ln.strip())
    return " ".join(parts)


def vtt_blocks_doc(text: str) -> list[dict]:
    """WebVTT text → one ``p`` block per cue (non-VTT input → zero blocks)."""
    if not is_vtt(text.lstrip("﻿")):
        return []
    lines = text.lstrip("﻿").splitlines()
    blocks: list[dict] = []
    i = 1  # past the signature line
    n = len(lines)
    # header metadata lines run to the first blank line
    while i < n and lines[i].strip():
        i += 1
    while i < n:
        if not lines[i].strip():
            i += 1
            continue
        head = lines[i].strip()
        if head.startswith(("NOTE", "STYLE", "REGION")):
            while i < n and lines[i].strip():
                i += 1
            continue
        # optional cue identifier (a line without '-->')
        if not _TIMING_RE.search(lines[i]):
            i += 1
            if i >= n or not _TIMING_RE.search(lines[i]):
                # stray non-cue line; skip its block
                while i < n and lines[i].strip():
                    i += 1
                continue
        i += 1  # past the timing line
        payload: list[str] = []
        while i < n and lines[i].strip():
            payload.append(lines[i])
            i += 1
        cue = _cue_text(payload)
        blocks.append({"tag": "p", "text": cue, "n_links": 0})
    return blocks


def flatten_vtt_doc(doc_id: str, text: str) -> list[dict]:
    """One WebVTT doc → RAW_NODES row dicts (shared canvas geometry)."""
    return blocks_to_raw_nodes(doc_id, vtt_blocks_doc(text))


def flatten_vtt(
    docs: DataFrame, vtt_col: str = "vtt", id_col: str = "doc_id"
) -> DataFrame:
    """WebVTT corpus (doc_id, vtt string) → RAW_NODES node table.
    Zero-shuffle: one Arrow-batched python stage over the scan."""
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(vtt_col).alias("vtt"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RAW_NODES.fields]
        for pdf in batches:
            out: list[dict] = []
            for did, text in zip(pdf["doc_id"], pdf["vtt"]):
                out.extend(flatten_vtt_doc(did, text or ""))
            yield (pd.DataFrame(out, columns=cols) if out
                   else pd.DataFrame({c: [] for c in cols}))

    return src.mapInPandas(gen, schema=RAW_NODES)


def vtt_spans_doc(doc_id: str, text: str) -> list[dict]:
    """Pure per-doc kernel: WebVTT → ordered span dicts, identical output
    to ``extract_documents(flatten_vtt(...))`` (parity-pinned)."""
    return blocks_to_spans(vtt_blocks_doc(text))


def vtt_to_documents(
    docs: DataFrame, vtt_col: str = "vtt", id_col: str = "doc_id"
) -> DataFrame:
    """WebVTT corpus → documents(doc_id, spans) in ONE python stage with
    ZERO shuffles (fused path; generic twin is plan-shape pinned)."""
    from sparkdoc.schemas import DOCUMENTS

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(vtt_col).alias("vtt"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                {"doc_id": did, "spans": vtt_spans_doc(did, text or "")}
                for did, text in zip(pdf["doc_id"], pdf["vtt"])
            ]
            yield (pd.DataFrame(out, columns=["doc_id", "spans"]) if out
                   else pd.DataFrame({"doc_id": [], "spans": []}))

    return src.mapInPandas(gen, schema=DOCUMENTS)
