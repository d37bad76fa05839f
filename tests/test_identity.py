"""Identity normalizer + fingerprint parity tests (pure Python, fast).

Ports the reference's identity pins: FIXTURES.md F4 cases and the
recompute_node_id parity rule (core/merge/identity.py:1-8).
"""

from __future__ import annotations

from sparkdoc.identity import (
    canonicalize_identity,
    content_hash,
    digit_signature,
    fold_text,
    node_fingerprint,
    node_id,
    normalize_entity_name,
    phrase_key,
)


def test_normalize_upper_snake():
    assert normalize_entity_name("Propriétaire non occupant") == "PROPRIETAIRE_NON_OCCUPANT"


def test_normalize_separator_variants_converge():
    a = normalize_entity_name("PROPRIETAIRE_NON_OCCUPANT")
    b = normalize_entity_name("Propriétaire non occupant")
    c = normalize_entity_name("propriétaire-non-occupant")
    assert a == b == c


def test_normalize_drops_leading_english_article_only():
    # reference strips exactly one leading English article (The/A/An),
    # entity_name_normalizer.py:27-33 — multilingual articles are kept
    assert normalize_entity_name("The Quick Fox") == "QUICK_FOX"
    assert normalize_entity_name("an Apple") == "APPLE"
    assert normalize_entity_name("le café") == "LE_CAFE"
    assert normalize_entity_name("The") == ""


def test_normalize_drops_possessive():
    assert normalize_entity_name("World's Fair") == "WORLD_FAIR"


def test_accent_case_variants_same_id():
    # F4: "Électroménager"/"électroménager" → one id (node_id_registry.py:80-99)
    a = node_id("Category", {"name": "Électroménager"})
    b = node_id("Category", {"name": "électroménager"})
    assert a == b


def test_digit_kept_distinctions():
    # F4: "Article 5" vs "Article 6" stay distinct
    assert node_id("Clause", {"name": "Article 5"}) != node_id("Clause", {"name": "Article 6"})
    assert digit_signature("Article 5 v2") == "5-2"
    assert digit_signature("no digits") == ""


def test_canonicalize_non_nameish():
    assert canonicalize_identity("AB-12/c", "code") == "ab12c"
    assert canonicalize_identity("Électro Ménager", "name") == "ELECTRO_MENAGER"


def test_fold_text_and_phrase_key():
    assert fold_text("  Héllo\t\nWORLD  ") == "hello world"
    assert phrase_key("Hello, World!") == "_hello_world_"
    assert phrase_key("") == ""


def test_fingerprint_stable_and_class_scoped():
    fp1 = node_fingerprint("Person", {"name": "Ada Lovelace"})
    fp2 = node_fingerprint("Person", {"name": "ada-lovelace"})
    assert fp1 == fp2
    assert node_fingerprint("Company", {"name": "Ada Lovelace"}) != fp1
    assert len(fp1) == 16  # hexdigest()[:16] of default blake2b (node_id_registry.py:110)


def test_fingerprint_list_values_order_insensitive():
    a = node_fingerprint("Tag", {"names": ["b", "a"]})
    b = node_fingerprint("Tag", {"names": ["a", "b"]})
    assert a == b


def test_fingerprint_iso_temporal_normalization():
    # exported isoformat 'T' → str(datetime) space form (merge/identity.py:34-47);
    # the rewrite requires a full ISO datetime (with seconds)
    a = node_fingerprint("Event", {"at": "2024-01-02T03:04:05"})
    b = node_fingerprint("Event", {"at": "2024-01-02 03:04:05"})
    assert a == b


def test_fingerprint_reference_byte_parity():
    # recompute_node_id replica: default json.dumps + blake2b hexdigest()[:16]
    import hashlib, json

    blob = json.dumps({"__class__": "Person", "name": "ADA_LOVELACE"}, sort_keys=True, default=str)
    expected = hashlib.blake2b(blob.encode()).hexdigest()[:16]
    assert node_id("Person", {"name": "Ada Lovelace"}) == f"Person_{expected}"


def test_fingerprint_list_values_deduped():
    # list values are SET-deduped before sorting (node_id_registry.py:93-97)
    assert node_fingerprint("Tag", {"names": ["a", "a", "b"]}) == node_fingerprint(
        "Tag", {"names": ["b", "a"]}
    )


def test_content_hash_skips_meta_and_empty():
    a = content_hash({"x": "1", "__prov__": "zzz", "empty": ""})
    b = content_hash({"x": "1"})
    assert a == b
    assert content_hash({"x": "1"}) != content_hash({"x": "2"})


def test_empty_id_fields_included():
    # the reference includes every declared id field, empties canonicalizing
    # to "" (node_id_registry.py:86-99) — presence IS identity-bearing
    assert node_fingerprint("P", {"name": "x", "code": ""}) != node_fingerprint("P", {"name": "x"})
    assert node_fingerprint("P", {"name": "x", "code": None}) == node_fingerprint(
        "P", {"name": "x", "code": ""}
    )
