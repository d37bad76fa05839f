"""Table-structure recovery over interleaved documents.

The reference's DoclingDocument keeps tables as structured items (docling's
TableItem with a cell grid); this engine's span table flattens them to the
chunker's pipe-row rendering (``cell | cell | cell`` per line — the exact
format synth/chunker emit, chunker.py:249). These operators recover the
structured view as corpus-scale tables:

  table_cells   one row per cell: (doc_id, offset, row_idx, col_idx, cell)
  table_shapes  per table: row/col counts + raggedness flag

Everything is pure codegen exprs (split + posexplode twice) — no UDFs, no
shuffles beyond what the caller adds. At 100 TB the cell table is written
columnar once and queried with predicate pushdown on (doc_id, offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_table_cells(
    tables: DataFrame, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """Explode pipe-row table text into one row per cell.

    ``tables`` carries one row per table with its rendered text; ``keep``
    lists passthrough columns (defaults to everything except ``text_col``).
    Rows split on newline, cells on '|', cells trimmed; 0-based indexes.
    Blank lines produce a single empty cell (preserved — a blank row is
    structure, not noise); fully empty text produces one (0, 0, '') cell."""
    keep = [c for c in tables.columns if c != text_col] if keep is None else keep
    rows = tables.select(
        *keep, F.posexplode(F.split(F.col(text_col), "\n")).alias("row_idx", "_row")
    )
    return rows.select(
        *keep,
        "row_idx",
        F.posexplode(F.split(F.col("_row"), r"\|")).alias("col_idx", "_cell"),
    ).select(*keep, "row_idx", "col_idx", F.trim(F.col("_cell")).alias("cell"))


def table_cells(documents: DataFrame) -> DataFrame:
    """Cell grid of every table span in a documents table
    (doc_id, spans array<struct kind/text/media_ref/offset>)."""
    tables = (
        documents.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "table")
        .select("doc_id", F.col("s.offset").alias("offset"), F.col("s.text").alias("text"))
    )
    return split_table_cells(tables, keep=["doc_id", "offset"])


def table_shapes(cells: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Per-table shape summary from a cell grid: n_rows, n_cells, min/max
    row width, and is_ragged (rows disagree on width). One map-side-combined
    aggregation chain keyed on the table identity."""
    keys = keys or ["doc_id", "offset"]
    widths = cells.groupBy(*keys, "row_idx").agg(
        (F.max("col_idx") + 1).alias("_w"), F.count("*").alias("_cells")
    )
    return widths.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.sum("_cells").alias("n_cells"),
        F.min("_w").alias("min_cols"),
        F.max("_w").alias("max_cols"),
        (F.min("_w") != F.max("_w")).cast("int").alias("is_ragged"),
    )
