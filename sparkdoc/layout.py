"""Geometry: bbox normalization, 512-grid quantization, XY-cut reading order.

bbox normalization and quantization are pure Spark exprs (codegen path).
``xy_cut_order`` is the deterministic pure-Python page-layout sort used by
both the Spark per-doc UDF (spans.py) and the single-node golden extractor —
it is a pure function of the box list, so sharing it across the two
implementations cannot hide a distributed-vs-sequential divergence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- bbox normalization (reference: document_processor.py:59-118) -----------


def normalize_bbox(bbox: Column, coord_origin: Column, page_height: Column) -> Column:
    """BOTTOMLEFT→TOPLEFT: [l, H-t, r, H-b]; TOPLEFT passes through.

    Caller must already have dropped BOTTOMLEFT rows with unknown height
    (clean.classify_raw_nodes does).
    """
    l, t, r, b = (bbox[0], bbox[1], bbox[2], bbox[3])
    return F.when(
        coord_origin == "BOTTOMLEFT",
        F.array(l, (page_height - t).cast("int"), r, (page_height - b).cast("int")),
    ).otherwise(bbox)


def normalize_bbox_py(bbox, coord_origin, page_height):
    """Python twin of normalize_bbox (golden path)."""
    if coord_origin == "BOTTOMLEFT":
        l, t, r, b = bbox
        return [l, int(page_height - t), r, int(page_height - b)]
    return list(bbox)


# --- 512-grid quantization (reference: provenance/models.py:72-94) ----------


def quantize_512(coord: Column, dim: Column) -> Column:
    """clamp(bround(512*coord/dim), 0, 511) — byte-exact .dclg parity rule.
    bround = ROUND_HALF_EVEN, matching the reference's Python round()
    (provenance/models.py:84-86)."""
    # dim <= 0 guard mirrors quantize_512_py: TOPLEFT rows with unknown page
    # height carry dim 0, and 512*coord/0 is DIVIDE_BY_ZERO under ANSI (or a
    # parity-breaking 511 with ANSI off)
    q = F.bround(F.lit(512.0) * coord.cast("double") / dim.cast("double")).cast("int")
    clamped = F.least(F.greatest(q, F.lit(0)), F.lit(511))
    return F.when(dim.cast("double") > 0, clamped).otherwise(F.lit(0))


def quantize_512_py(coord: float, dim: float) -> int:
    """Python twin: builtin round() (half-to-even), exactly the reference's
    dclg_location_from_bbox inner _quant."""
    if dim <= 0:
        return 0
    q = round(512.0 * float(coord) / float(dim))
    return max(0, min(511, q))


def quantize_bbox_512(bbox: Column, page_width: Column, page_height: Column) -> Column:
    """Quantize [l,t,r,b] to the 512×512 grid with corner normalization
    (l<=r, t<=b after quantization)."""
    ql = quantize_512(bbox[0], page_width)
    qt = quantize_512(bbox[1], page_height)
    qr = quantize_512(bbox[2], page_width)
    qb = quantize_512(bbox[3], page_height)
    return F.array(
        F.least(ql, qr), F.least(qt, qb), F.greatest(ql, qr), F.greatest(qt, qb)
    )


# --- XY-cut reading order -----------------------------------------------------


def _gaps(intervals: list[tuple[int, int]], min_gap: int) -> list[int]:
    """Cut positions where the union of [lo,hi) intervals has a gap >= min_gap."""
    cuts = []
    ivs = sorted(intervals)
    cur_hi = ivs[0][1]
    for lo, hi in ivs[1:]:
        if lo - cur_hi >= min_gap:
            cuts.append(cur_hi + (lo - cur_hi) // 2)
        cur_hi = max(cur_hi, hi)
    return cuts


def xy_cut_order(boxes: list[tuple[int, int, int, int]], min_gap: int = 4) -> list[int]:
    """Recursive XY-cut: return indices of ``boxes`` in reading order.

    Prefer horizontal cuts (top-to-bottom bands), then vertical cuts within a
    band (left-to-right columns), recursing until no whitespace gap remains;
    leaves sort by (top, left, index). Deterministic for any input order.
    Public-algorithm implementation (Nagy & Seth 1984 XY decomposition);
    reference analog: Docling's layout ordering consumed at
    document_processor.py:59-118.
    """

    def rec(idx: list[int], axis_first: str) -> list[int]:
        if len(idx) <= 1:
            return idx
        for axis in (axis_first, "x" if axis_first == "y" else "y"):
            if axis == "y":
                ivs = [(boxes[i][1], boxes[i][3]) for i in idx]
            else:
                ivs = [(boxes[i][0], boxes[i][2]) for i in idx]
            cuts = _gaps(ivs, min_gap)
            if cuts:
                groups: list[list[int]] = [[] for _ in range(len(cuts) + 1)]
                for i in idx:
                    lo = boxes[i][1] if axis == "y" else boxes[i][0]
                    g = sum(1 for c in cuts if lo >= c)
                    groups[g].append(i)
                out: list[int] = []
                for g in groups:
                    out.extend(rec(g, "y" if axis == "x" else "x"))
                return out
        # full-geometry tiebreak BEFORE the index: two boxes sharing a
        # top-left corner but differing in extent must order the same way
        # regardless of emission order (distributed scans don't promise
        # one); only exact duplicates fall through to the input index,
        # where either order yields the same box sequence
        return sorted(
            idx, key=lambda i: (boxes[i][1], boxes[i][0], boxes[i][3], boxes[i][2], i)
        )

    return rec(list(range(len(boxes))), "y")
