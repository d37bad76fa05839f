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

_SPLIT_RE = re.compile(r"[\s_\-]+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]")
_WS_RE = re.compile(r"\s+")
_DIGITS_RE = re.compile(r"\d+")
_WORD_RE = re.compile(r"[a-z0-9]+")

#: identity fields that use name-style normalization
#: (entity_name_normalizer.py:55 — exactly {name, title, nom})
NAMEISH_FIELDS = frozenset({"name", "title", "nom"})

#: English-only leading articles, trailing-space form, first match breaks
#: (entity_name_normalizer.py:27-33)
_ARTICLE_PREFIXES = ("The ", "the ", "A ", "a ", "An ", "an ")
_BARE_ARTICLES = ("The", "the", "A", "a", "An", "an")


def _strip_accents(s: str) -> str:
    return "".join(c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c))


def normalize_entity_name(name) -> str:
    """Byte-parity with reference entity_name_normalizer.py:16-51: NFKD +
    strip combining marks, drop ONE leading English article, split on
    [\\s_-]+, drop 's/’s possessives, join('_').upper()."""
    if not name or not isinstance(name, str):
        return ""
    trimmed = _strip_accents(name).strip()
    if not trimmed:
        return ""
    for prefix in _ARTICLE_PREFIXES:
        if trimmed.startswith(prefix):
            trimmed = trimmed[len(prefix):].strip()
            break
    if trimmed in _BARE_ARTICLES:
        return ""
    words = []
    for word in _SPLIT_RE.split(trimmed):
        if not word:
            continue
        if word.endswith("'s") or (len(word) >= 2 and word[-2:] == "’s"):
            word = word[:-2]
        if word:
            words.append(word)
    return "_".join(words).upper() if words else ""


def canonicalize_identity(value, field: str = "") -> str:
    """Byte-parity with canonicalize_identity_for_dedup
    (entity_name_normalizer.py:58-80): name/title/nom → UPPER_SNAKE name
    normalization; other fields → NFKD casefold [^a-z0-9]-strip."""
    if value is None:
        return ""
    if field in NAMEISH_FIELDS and isinstance(value, str):
        return normalize_entity_name(value)
    text = str(value).strip()
    if not text:
        return ""
    lower = unicodedata.normalize("NFKD", text).casefold()
    return _NON_ALNUM_RE.sub("", lower)


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


#: exported-ISO-datetime rewrite (core/merge/identity.py:34-47): the registry
#: canonicalizes str(datetime) ('... 12:00:00'), exports carry isoformat 'T'
_ISO_DATETIME = re.compile(
    r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?"
)


def _normalize_temporal(value):
    if isinstance(value, str) and _ISO_DATETIME.fullmatch(value):
        return value.replace("T", " ", 1)
    return value


def node_fingerprint(node_class: str, id_fields: dict, skolem_document_id=None) -> str:
    """Byte-parity with NodeIDRegistry._generate_fingerprint
    (node_id_registry.py:58-112) / recompute_node_id (merge/identity.py:86-148):
    every present id field is included (empties canonicalize to ''), list
    values become sorted deduped canonical tuples, default json.dumps
    (ensure_ascii, ', '/': ' separators, sort_keys, default=str), and the
    fingerprint is the first 16 hex chars of a default-size blake2b.

    ``skolem_document_id``: the content-bearing stamp merge skolemization
    writes onto filename-stem-colliding roots — mixed in RAW (str, not
    canonicalized), exactly like recompute_node_id (merge/identity.py:
    128-137), so re-keying a merged graph cannot recompute a skolemized
    root back to its colliding base id and silently re-fuse two documents."""
    data: dict = {}
    for k, v in id_fields.items():
        if isinstance(v, (list, tuple, set)):
            canon = {canonicalize_identity(_normalize_temporal(x), k) for x in v}
            data[k] = tuple(sorted(canon))
        else:
            data[k] = canonicalize_identity(_normalize_temporal(v), k)
    if skolem_document_id:
        data["skolem_document_id"] = str(skolem_document_id)
    data["__class__"] = node_class
    blob = json.dumps(data, sort_keys=True, default=str)
    return hashlib.blake2b(blob.encode()).hexdigest()[:16]


def node_id(node_class: str, id_fields: dict, skolem_document_id=None) -> str:
    """Class_<16hex> — identical to reference node ids, so rekey/merge of
    reference-produced graph exports collapses onto the same nodes."""
    return f"{node_class}_{node_fingerprint(node_class, id_fields, skolem_document_id)}"


def content_hash(attrs: dict, meta_prefix: str = "__") -> str:
    """blake2b-16 over sorted non-meta, non-empty attrs (graph_cleaner.py:
    273-340). 'Unknown' placeholder values keep the node distinct by mixing
    the node_id in (graph_cleaner.py:386-388) — callers pass it via attrs."""
    payload = {
        k: str(v)
        for k, v in attrs.items()
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
