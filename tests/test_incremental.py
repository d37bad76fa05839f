"""Incremental (delta) dedup against persisted indexes."""

from __future__ import annotations


LONG_A = "the quick brown fox jumps over the lazy dog near the quiet river bank every day"
LONG_B = "completely unrelated text about glaciers penguins and the far southern ocean winds"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_delta_exact_dups_and_index_update(spark):
    from sparkdoc.incremental import build_exact_index, delta_exact_dups, update_exact_index

    corpus = _df(spark, [(1, LONG_A), (2, LONG_B), (3, "  THE quick brown fox jumps over the lazy dog near the quiet river bank every day ")])
    idx = build_exact_index(corpus)
    # 1 and 3 normalize to the same fp -> one index row, keep_id 1
    assert {(r.fp is not None, r.keep_id) for r in idx.collect()} == {(True, 1), (True, 2)}

    new = _df(spark, [(10, LONG_A), (11, "brand new text that matches nothing in the corpus at all"), (12, None)])
    dups = {(r.doc_id, r.dup_of) for r in delta_exact_dups(new, idx).collect()}
    assert dups == {(10, 1)}

    # fold kept docs (11 only) in: existing fps keep their corpus keep_id
    kept = new.filter("doc_id = 11")
    idx2 = update_exact_index(idx, kept)
    rows = {r.keep_id for r in idx2.collect()}
    assert rows == {1, 2, 11}
    # second-generation delta: a dup of doc 11 now hits the updated index
    second = _df(spark, [(20, "brand new text that matches nothing in the corpus at all")])
    assert {(r.doc_id, r.dup_of) for r in delta_exact_dups(second, idx2).collect()} == {(20, 11)}
    # corpus fp arriving again still maps to the ORIGINAL keeper
    again = _df(spark, [(21, LONG_A)])
    assert {(r.doc_id, r.dup_of) for r in delta_exact_dups(again, idx2).collect()} == {(21, 1)}


def test_delta_near_dups_best_match(spark):
    from sparkdoc.incremental import build_band_index, delta_near_dups

    corpus = _df(spark, [(1, LONG_A), (2, LONG_A + " with two extra"), (3, LONG_B)])
    bidx = build_band_index(corpus)
    new = _df(
        spark,
        [
            (10, LONG_A),  # exact text of 1, very near 2 -> best = 1 (j=1.0)
            (11, LONG_B[:40] + " totally different second half of words here now"),
            (12, LONG_B + " tail"),  # near dup of 3
        ],
    )
    got = {r.doc_id: (r.dup_of, round(r.jaccard, 3)) for r in delta_near_dups(new, corpus, bidx, threshold=0.6).collect()}
    assert got[10][0] == 1 and got[10][1] == 1.0
    assert got[12][0] == 3 and 0.6 <= got[12][1] < 1.0
    assert 11 not in got  # prefix overlap only -> below threshold


def test_delta_near_signature_work_is_delta_only(spark):
    """The delta path must not recompute corpus signatures: the band index
    is consumed as given (here: an empty index -> no candidates, regardless
    of text equality)."""
    from sparkdoc.incremental import build_band_index, delta_near_dups

    corpus = _df(spark, [(1, LONG_A)])
    empty_idx = build_band_index(corpus.filter("doc_id < 0"))
    new = _df(spark, [(10, LONG_A)])
    assert delta_near_dups(new, corpus, empty_idx).count() == 0


def test_update_band_index_appends(spark):
    from sparkdoc.incremental import build_band_index, update_band_index

    corpus = _df(spark, [(1, LONG_A)])
    idx = build_band_index(corpus, bands=4)
    assert idx.count() == 4
    idx2 = update_band_index(idx, _df(spark, [(2, LONG_B)]), bands=4)
    assert idx2.count() == 8
    assert {r.doc_id for r in idx2.select("doc_id").distinct().collect()} == {1, 2}


def test_delta_exact_dups_full_internal(spark):
    from sparkdoc.incremental import build_exact_index, delta_exact_dups_full

    corpus = _df(spark, [(1, LONG_A), (2, LONG_B)])
    idx = build_exact_index(corpus)
    fresh = "totally new sentence that the corpus has never seen before today"
    new = _df(spark, [
        (10, LONG_A),    # corpus dup -> dup_of 1
        (11, LONG_A),    # corpus dup too (internal twin of 10) -> dup_of 1
        (12, fresh),     # internal keeper
        (13, fresh),     # internal dup -> dup_of 12
        (14, "unique survivor text that matches nothing else anywhere at all"),
        (15, None),      # NULL text: never a duplicate
    ])
    dups = {(r.doc_id, r.dup_of) for r in delta_exact_dups_full(new, idx).collect()}
    assert dups == {(10, 1), (11, 1), (13, 12)}


def test_string_doc_ids_work_everywhere(spark):
    """ANSI regression: the best-match and index-update tie-breaks must not
    arithmetically negate the id column — string doc ids (the common real-
    world shape) crashed with CAST_INVALID_INPUT before."""
    from sparkdoc.incremental import (
        build_band_index,
        build_exact_index,
        delta_near_dups,
        update_exact_index,
    )

    corpus = spark.createDataFrame(
        [("acme-1", LONG_A), ("beta-2", LONG_A + " with two extra"), ("core-3", LONG_B)],
        "doc_id string, text string",
    )
    idx = build_exact_index(corpus)
    kept = spark.createDataFrame(
        [("delta-9", "fresh never seen text body here")], "doc_id string, text string"
    )
    idx2 = update_exact_index(idx, kept)  # crashed before the fix
    assert "delta-9" in {r.keep_id for r in idx2.collect()}
    # existing fp keeps its corpus keeper (struct min: _old first)
    assert {r.keep_id for r in idx2.collect()} >= {"acme-1", "core-3"}

    bidx = build_band_index(corpus)
    new = spark.createDataFrame(
        [("zeta-7", LONG_A)], "doc_id string, text string"
    )
    got = delta_near_dups(new, corpus, bidx, threshold=0.6).collect()
    # best match: max jaccard then MIN dup_of (string order)
    assert len(got) == 1 and got[0]["dup_of"] == "acme-1" and got[0]["jaccard"] == 1.0
