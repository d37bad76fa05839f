"""Identity layer: unicode normalizers + blake2b fingerprints.

Deterministic identity is the backbone of dedup/merge — the reference pins
these exact semantics with a parity test (core/merge/identity.py:1-8); we keep
ONE pure-Python implementation and wrap it in vectorized pandas UDFs so the
Spark path and any driver-side use share bytes.

Reference semantics reproduced:
  normalize_entity_name          core/utils/entity_name_normalizer.py:16-51
  canonicalize_identity_for_dedup  entity_name_normalizer.py:58-74
  fold_text                      dense/orchestrator.py:690-694
  phrase_key                     dense/orchestrator.py:697-706
  digit_signature                alias_reconciler.py:54-56
  blake2b hashes                 provenance/models.py:30-48
  node fingerprint / node id     node_id_registry.py:58-157
  recompute parity rule          core/merge/identity.py:86-148
"""

from __future__ import annotations

import hashlib
import json
import re
import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf

ARTICLES = {"the", "a", "an", "le", "la", "les", "un", "une", "los", "las", "el", "der", "die", "das"}

_SPLIT_RE = re.compile(r"[\s_\-]+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]")
_WS_RE = re.compile(r"\s+")
_DIGITS_RE = re.compile(r"\d+")
_WORD_RE = re.compile(r"[a-z0-9]+")

#: field names treated as name-ish for canonicalization
NAMEISH_FIELDS = {"name", "title", "label", "full_name", "display_name"}


def _strip_accents(s: str) -> str:
    return "".join(c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c))


def normalize_entity_name(name: str) -> str:
    """NFKD → strip accents → drop leading article → split [\\s_-]+ →
    drop 's → UPPER_SNAKE."""
    s = _strip_accents(name or "")
    words = [w for w in _SPLIT_RE.split(s.strip()) if w]
    if words and words[0].lower() in ARTICLES:
        words = words[1:]
    words = [w[:-2] if w.lower().endswith("'s") else w for w in words]
    return "_".join(w.upper() for w in words)


def canonicalize_identity(value: str, field: str = "") -> str:
    """Name-ish fields → normalize_entity_name; others → NFKD casefold
    [^a-z0-9]-strip."""
    if field.lower() in NAMEISH_FIELDS or field.lower().endswith("_name"):
        return normalize_entity_name(value)
    s = _strip_accents(value or "").casefold()
    return _NON_ALNUM_RE.sub("", s)


def fold_text(text: str) -> str:
    """NFKD + strip accents + lower + whitespace collapse (verbatim containment)."""
    return _WS_RE.sub(" ", _strip_accents(text or "").lower()).strip()


def phrase_key(text: str) -> str:
    """Word-bounded containment key: _WORD_WORD_."""
    words = _WORD_RE.findall(fold_text(text))
    return "_" + "_".join(words) + "_" if words else ""


def digit_signature(value: str) -> str:
    """Ordered digit runs, '-'-joined ('Article 5 v2' → '5-2')."""
    return "-".join(_DIGITS_RE.findall(value or ""))


def blake2b_hex(text: str, digest_size: int = 16) -> str:
    return hashlib.blake2b((text or "").encode("utf-8"), digest_size=digest_size).hexdigest()


_ISO_T_RE = re.compile(r"^(\d{4}-\d{2}-\d{2})T(\d{2}:\d{2})")


def _canon_id_value(v) -> object:
    """Canonicalize one identity value for fingerprinting: lists → sorted
    canonical tuples; ISO 'T' temporal normalization (identity.py:100-120);
    strings canonicalized for dedup."""
    if isinstance(v, (list, tuple, set)):
        return sorted(str(_canon_id_value(x)) for x in v)
    s = str(v)
    s = _ISO_T_RE.sub(r"\1 \2", s)
    return canonicalize_identity(s)


def node_fingerprint(node_class: str, id_fields: dict) -> str:
    """blake2b-16 of sorted-keys JSON of canonicalized id fields + class
    (node_id_registry.py:58-157)."""
    payload = {k: _canon_id_value(v) for k, v in sorted(id_fields.items()) if v not in (None, "")}
    payload["__class__"] = node_class
    blob = json.dumps(payload, sort_keys=True, ensure_ascii=False, separators=(",", ":"))
    return blake2b_hex(blob, 16)


def node_id(node_class: str, id_fields: dict) -> str:
    return f"{node_class}_{node_fingerprint(node_class, id_fields)}"


def content_hash(attrs: dict, meta_prefix: str = "__") -> str:
    """blake2b-16 over sorted non-meta, non-empty attrs (graph_cleaner.py:
    273-340). 'Unknown' placeholder values keep the node distinct by mixing
    the node_id in (graph_cleaner.py:386-388) — callers pass it via attrs."""
    payload = {
        k: str(v)
        for k, v in sorted(attrs.items())
        if not k.startswith(meta_prefix) and v not in (None, "")
    }
    blob = json.dumps(payload, sort_keys=True, ensure_ascii=False, separators=(",", ":"))
    return blake2b_hex(blob, 16)


# --- vectorized pandas UDF wrappers (Arrow path; no per-row Python UDFs) -----
# Lazy factories: pandas_udf() needs an active SparkSession in PySpark 4, so
# decoration happens on first use, not at import.

from functools import lru_cache


def _series_udf(fn):
    @pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: fn(v) if v is not None else None)

    return _udf


@lru_cache(maxsize=None)
def normalize_entity_name_udf():
    return _series_udf(normalize_entity_name)


@lru_cache(maxsize=None)
def canonicalize_udf():
    return _series_udf(canonicalize_identity)


@lru_cache(maxsize=None)
def fold_text_udf():
    return _series_udf(fold_text)


@lru_cache(maxsize=None)
def phrase_key_udf():
    return _series_udf(phrase_key)


@lru_cache(maxsize=None)
def digit_signature_udf():
    return _series_udf(digit_signature)


@lru_cache(maxsize=None)
def blake2b8_udf():
    return _series_udf(lambda v: blake2b_hex(v, 8))


@lru_cache(maxsize=None)
def blake2b16_udf():
    return _series_udf(lambda v: blake2b_hex(v, 16))


@lru_cache(maxsize=None)
def node_id_udf():
    @pandas_udf("string")
    def _udf(node_class: pd.Series, ids_json: pd.Series) -> pd.Series:
        out = []
        for c, j in zip(node_class, ids_json):
            out.append(None if c is None else node_id(c, json.loads(j) if j else {}))
        return pd.Series(out)

    return _udf
