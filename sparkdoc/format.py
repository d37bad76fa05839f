"""String formatting + filename hygiene (pure exprs).

Reference: core/utils/string_formatter.py:13-76 (truncation, Title Case
keys, property display) and core/utils/output_manager.py:16-60 (filename
sanitization, deterministic artifact layout)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_DISPLAY_LEN = 120


def truncate_display(col: Column, max_len: int = MAX_DISPLAY_LEN) -> Column:
    """Ellipsis truncation for display strings — string_formatter.py:13-33
    exact: cut at max_len-3 and append ASCII "..." (parity-fuzzed in
    tests/test_reference_parity.py; the pre-r5 "…" suffix diverged)."""
    return F.when(
        F.length(col) > max_len, F.concat(F.substring(col, 1, max_len - 3), F.lit("..."))
    ).otherwise(col)


def title_case_key(col: Column) -> Column:
    """snake_case attr key → Title Case display (string_formatter.py:29-41)."""
    return F.initcap(F.replace(col, F.lit("_"), F.lit(" ")))


def property_display(key: Column, value: Column, max_len: int = MAX_DISPLAY_LEN) -> Column:
    return F.concat(title_case_key(key), F.lit(": "), truncate_display(value, max_len))


def sanitize_filename(col: Column, max_len: int = 96) -> Column:
    """Deterministic artifact filename from a doc id / title:
    non-[A-Za-z0-9._-] → '_', collapse runs, trim edges, length-capped
    (output_manager.py:16-60)."""
    s = F.regexp_replace(col, "[^A-Za-z0-9._-]+", "_")
    s = F.regexp_replace(s, "_+", "_")
    s = F.regexp_replace(s, "^_+|_+$", "")
    s = F.substring(s, 1, max_len)
    # dot-only names ('.', '..') are path-traversal segments and an
    # all-invalid id sanitizes to '' (colliding artifact dirs): both fall
    # back to a hash of the ORIGINAL id — deterministic and collision-free
    degenerate = s.isNull() | s.rlike("^[.]*$")
    return F.when(
        degenerate, F.concat(F.lit("id_"), F.substring(F.md5(F.coalesce(col, F.lit(""))), 1, 16))
    ).otherwise(s)


def artifact_path(base: Column, doc_id: Column, name: str) -> Column:
    """outputs/<stem>/<name> deterministic layout (output_manager.py:62-120)."""
    return F.concat_ws("/", base, sanitize_filename(doc_id), F.lit(name))
