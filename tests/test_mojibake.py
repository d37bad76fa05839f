from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkdoc.textops import MOJIBAKE_TABLE, fix_mojibake, with_fixed_encoding


def _fix(spark, *texts: str | None) -> list[str | None]:
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["c"] for r in df.select(fix_mojibake(F.col("text")).alias("c")).collect()]


def test_table_is_true_cp1252_misdecoding():
    # every (bad, good) pair except the double-encode bridge must satisfy
    # bad == cp1252-lenient-decode(utf8(good)) — the table is generated, so
    # this pins the generator against the real codecs
    for bad, good in MOJIBAKE_TABLE:
        if (bad, good) in (("Ãƒ", "Ã"), ("Ã‚", "Â")):
            continue
        raw = good.encode("utf-8")
        expect = "".join(
            chr(b) if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D) else bytes([b]).decode("cp1252")
            for b in raw
        )
        assert bad == expect, (bad, good)


CASES = [
    ("cafÃ©", "café"),
    ("dÃ©jÃ  vu", "déjà vu"),  # à's mojibake ends in nbsp
    ("itÃ¢â‚¬â„¢s", "it’s"),  # doubly-encoded ’
    ("naÃ¯ve", "naïve"),
    ("StraÃŸe", "Straße"),
    ("Ã‰tat", "État"),
    ("â€œquoteâ€", "“quote”"),  # ” carries the 0x9D control
    ("5â€“10", "5–10"),
    ("Â£50 â‚¬60", "£50 €60"),
    ("plain ascii stays", "plain ascii stays"),
    ("already é fine", "already é fine"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_fix_cases(spark, raw, want):
    assert _fix(spark, raw) == [want]


def test_double_encoded_single_pair(spark):
    # 'é' encoded twice: utf8 -> cp1252 -> utf8 -> cp1252 = 'ÃƒÂ©'
    twice = "é".encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")
    assert _fix(spark, twice) == ["é"]


def test_double_encoded_symbols_and_letters(spark):
    # C2-class symbols need the 'Ã‚'->'Â' bridge: '°' twice = 'Ã‚Â°'
    def twice(ch):
        return ch.encode("utf-8").decode("cp1252").encode("utf-8").decode("cp1252")

    raws = [twice(c) for c in "°©«üñ"]
    assert _fix(spark, *raws) == list("°©«üñ")


def test_python_reference_agreement(spark):
    # the Spark chain must equal applying the same table in Python
    def py_fix(s: str) -> str:
        for _ in range(2):
            for bad, good in MOJIBAKE_TABLE:
                s = s.replace(bad, good)
        return s

    raws = [r for r, _ in CASES] + ["mixed Ã© and â€œok" + "Â»"]
    assert _fix(spark, *raws) == [py_fix(r) for r in raws]


def test_null_passthrough(spark):
    assert _fix(spark, None) == [None]


def test_with_fixed_encoding_flags(spark):
    df = spark.createDataFrame(
        [(1, "cafÃ©"), (2, "clean"), (3, None)], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in with_fixed_encoding(df).collect()}
    assert (out[1]["text_fixed"], out[1]["had_mojibake"]) == ("café", 1)
    assert (out[2]["text_fixed"], out[2]["had_mojibake"]) == ("clean", 0)
    assert (out[3]["text_fixed"], out[3]["had_mojibake"]) == (None, 0)


# --- NFC normalization (clean.nfc_normalize_text) -------------------------------


def test_nfc_composes_decomposed_sequences(spark):
    from pyspark.sql import Row

    from sparkdoc.clean import nfc_normalize_text

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="café"),  # e + combining acute -> é
            Row(doc_id=1, text="plain ascii"),
            Row(doc_id=2, text=None),
            Row(doc_id=3, text="Ångström"),  # Å + ö decomposed
        ],
        schema="doc_id long, text string",
    )
    out = {r["doc_id"]: (r["text"], r["nfc_changed"]) for r in nfc_normalize_text(df).collect()}
    assert out[0] == ("café", True)
    assert out[1] == ("plain ascii", False)
    assert out[2] == (None, False)  # text NULL passes through; flag never NULL
    assert out[3] == ("Ångström", True)


def test_nfc_is_idempotent_and_supports_out_column(spark):
    import unicodedata

    from pyspark.sql import Row

    from sparkdoc.clean import nfc_normalize_text

    df = spark.createDataFrame([Row(doc_id=0, text="gärden")])
    once = nfc_normalize_text(df, "text", out="norm")
    row = once.collect()[0]
    assert row["text"] == "gärden"  # original preserved with out=
    assert row["norm"] == unicodedata.normalize("NFC", "gärden")
    twice = nfc_normalize_text(once.select("doc_id", F.col("norm").alias("text")))
    r2 = twice.collect()[0]
    assert r2["nfc_changed"] is False and r2["text"] == row["norm"]


def test_nfc_changed_false_for_null_text(spark):
    """NULL text → nfc_changed must be False, not NULL (NULL != NULL is
    NULL and silently drops the row from boolean filters)."""
    from sparkdoc.clean import nfc_normalize_text

    df = spark.createDataFrame([(1, None), (2, "abc")], "doc_id int, text string")
    out = {r["doc_id"]: r["nfc_changed"] for r in nfc_normalize_text(df).collect()}
    assert out[1] is False and out[2] is False


def test_multiline_cdata_content_survives_markup_strip(spark):
    """CDATA spanning lines must unwrap (the (?s) flag) — without it the
    tag-strip regex deleted the whole block including its content."""
    from pyspark.sql import functions as F

    from sparkdoc.clean import content_chars, strip_markup

    df = spark.createDataFrame(
        [(1, "<![CDATA[line1\nline2]]>"), (2, "<b>x</b>")], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["s"], r["n"])
        for r in df.select(
            "doc_id",
            strip_markup(F.col("text")).alias("s"),
            content_chars(F.col("text")).alias("n"),
        ).collect()
    }
    assert got[1] == ("line1\nline2", 11)
    assert got[2] == ("x", 1)
