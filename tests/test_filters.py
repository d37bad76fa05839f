"""Unit tests for sparkdoc.filters (Gopher repetition, PII, decontamination)
and similarity.semantic_dedup — hand-built cases with known answers; the
DuckDB gate twins (doc_repetition / doc_pii / doc_decontam /
emb_semantic_dedup) cover corpus-scale exactness."""

import math

from pyspark.sql import functions as F


def _rows(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_line_stats_hand_cases(spark):
    from sparkdoc.filters import with_line_stats

    df = spark.createDataFrame(
        [
            (1, "aa\nbb\naa\n\ncc"),   # 4 nonempty lines, 'aa' twice
            (2, "xx\nyy\nzz"),          # no dups
            (3, ""),                     # empty
            (4, "same\nsame\nsame"),    # all dup
        ],
        "doc_id int, text string",
    )
    got = _rows(with_line_stats(df))
    assert got[1]["n_lines"] == 4 and got[1]["n_dup_lines"] == 1
    assert got[1]["dup_line_chars"] == 2 and got[1]["total_line_chars"] == 8
    assert got[2]["n_dup_lines"] == 0 and got[2]["dup_line_chars"] == 0
    assert got[3]["n_lines"] == 0 and got[3]["total_line_chars"] == 0
    assert got[4]["n_lines"] == 3 and got[4]["n_dup_lines"] == 2
    assert got[4]["dup_line_chars"] == 8 and got[4]["total_line_chars"] == 12


def test_ngram_stats_counts_and_tiebreak(spark):
    from sparkdoc.filters import with_repetition_stats

    df = spark.createDataFrame(
        [
            # bigrams: (a b)x2, (b a), (b c): top 'a b' cnt 2, chars 2*2=4
            # trigrams: (a b a), (b a b), (a b c) — none repeated
            (1, "a b a b c"),
            # bigrams (x y) and (y x) both cnt 1 → lexicographic tie-break 'x y'
            (2, "x y x"),
            # trigram (w1 w2 w3) twice (overlapping-free repeat)
            (3, "w1 w2 w3 q w1 w2 w3"),
            (4, ""),  # no words at all
            (5, "solo"),  # 1 word: no bigrams/trigrams
        ],
        "doc_id int, text string",
    )
    got = _rows(with_repetition_stats(df))
    assert got[1]["top_bigram"] == "a b" and got[1]["top_bigram_cnt"] == 2
    assert got[1]["top_bigram_chars"] == 4
    assert got[1]["dup_trigram_chars"] == 0
    assert got[1]["total_trigram_chars"] == 9  # 3 trigrams x 3 chars
    assert got[1]["total_word_chars"] == 5
    assert got[2]["top_bigram"] == "x y"  # lexicographic among count ties
    # doc 3: trigram 'w1 w2 w3' occurs twice → dup chars = 2*6=12 of the
    # 5 trigram occurrences' char mass
    assert got[3]["dup_trigram_chars"] == 12
    assert got[3]["dup_trigram_chars"] < got[3]["total_trigram_chars"]
    assert got[4]["top_bigram"] is None and got[4]["top_bigram_cnt"] == 0
    assert got[4]["total_word_chars"] == 0
    assert got[5]["top_bigram"] is None and got[5]["total_trigram_chars"] == 0


def test_repetition_flags_each_gate(spark):
    from sparkdoc.filters import repetition_flags, with_repetition_stats

    clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, clean + "\n" + "lambda mu nu xi omicron pi rho sigma tau upsilon"),
            (2, "dup line\n" * 8 + clean),           # dup-line gates trip
            (3, ("hot pair " * 20) + clean),          # top-bigram gate trips
            (4, ""),                                   # empty passes (length gates own it)
        ],
        "doc_id int, text string",
    )
    got = _rows(repetition_flags(with_repetition_stats(df)))
    assert got[1]["repetition_ok"] is True
    assert got[2]["repetition_ok"] is False
    assert got[3]["repetition_ok"] is False
    assert got[4]["repetition_ok"] is True


def test_pii_counts_redaction_and_order(spark):
    from sparkdoc.filters import with_pii_stats

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@sub.example.co.uk or 555-123-4567"),
            (2, "server 192.168.001.255 and ssn 078-05-1120"),
            # the IP's digit runs must NOT be re-matched by the (looser)
            # phone/ssn patterns after [IP] replaces them
            (3, "ip 123-45-6789 is an ssn, 10.0.0.1 an ip"),
            (4, "no pii here"),
            (5, None),
        ],
        "doc_id int, text string",
    )
    got = _rows(with_pii_stats(df.filter(F.col("text").isNotNull())))
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert got[1]["redacted"] == "reach me at [EMAIL] or [PHONE]"
    assert got[2]["n_ipv4"] == 1 and got[2]["n_ssn"] == 1
    assert got[2]["redacted"] == "server [IP] and ssn [SSN]"
    assert got[3]["n_ssn"] == 1 and got[3]["n_ipv4"] == 1
    assert got[3]["redacted"] == "ip [SSN] is an ssn, [IP] an ip"
    assert got[4]["redacted"] == "no pii here"
    for k in ("n_email", "n_ipv4", "n_ssn", "n_phone"):
        assert got[4][k] == 0


def test_decontaminate_hand_corpus(spark):
    from sparkdoc.filters import decontaminate

    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine ten")],
        "doc_id int, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark 8-grams [one..eight] and [two..nine]
            (1, "zz one two three four five six seven eight nine yy"),
            # same words, different order: no 8-gram overlap
            (2, "ten nine eight seven six five four three two one"),
            # too short for any 8-gram
            (3, "one two three"),
            # exact copy: all 3 benchmark 8-grams
            (4, "one two three four five six seven eight nine ten"),
        ],
        "doc_id int, text string",
    )
    got = _rows(decontaminate(docs, bench, n=8))
    assert got[1]["n_contaminated"] == 2 and got[1]["contaminated"] is True
    assert got[2]["n_contaminated"] == 0 and got[2]["contaminated"] is False
    assert got[3]["n_contaminated"] == 0
    assert got[4]["n_contaminated"] == 3 and got[4]["contaminated"] is True


def test_semantic_dedup_chain_and_keep_rule(spark):
    from sparkdoc.similarity import semantic_dedup

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0, 0.0]

    # n_cells=1 → pure pairwise semantics. cos(20°)≈.94 ≥ .9; cos(40°)≈.766 < .9
    corpus = spark.createDataFrame(
        [
            (1, at(0)),
            (2, at(20)),    # near-twin of 1 → shadowed by 1
            (3, at(40)),    # near-twin of 2 ONLY → shadowed by 2 (chain: dropped
                            # even though its shadow 2 is itself dropped)
            (4, at(90)),    # far from everything → kept
            (5, [0.0, 0.0, 0.0, 0.0]),  # zero norm → dropped from output
        ],
        "vec_id long, embedding array<double>",
    )
    got = _rows(
        semantic_dedup(corpus, threshold=0.9, n_cells=1, dim=4), key="vec_id"
    )
    assert set(got) == {1, 2, 3, 4}  # zero-norm vector absent
    assert got[1]["kept"] is True and got[1]["shadow"] is None
    assert got[2]["kept"] is False and got[2]["shadow"] == 1
    assert got[3]["kept"] is False and got[3]["shadow"] == 2
    assert got[4]["kept"] is True


def test_semantic_dedup_cells_bound_the_join(spark):
    """Vectors in different cells are never compared: two identical vectors
    forced into distinct cells both survive. (With 2 cells over mirrored
    vectors, argmax assignment splits them.)"""
    from sparkdoc.similarity import ivf_assign, semantic_dedup

    corpus = spark.createDataFrame(
        [(i, [float(1 - 2 * (i % 2)), 0.5, 0.0, 0.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    cells = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign(corpus, n_cells=4, dim=4)[1].collect()
    }
    got = _rows(semantic_dedup(corpus, threshold=0.99, n_cells=4, dim=4), key="vec_id")
    for vid, row in got.items():
        same_cell_lower = [u for u, c in cells.items() if c == cells[vid] and u < vid]
        # identical vectors share a cell → shadowed by the smallest such id;
        # vectors alone in their cell are kept
        if same_cell_lower:
            assert row["kept"] is False and row["shadow"] == min(same_cell_lower)
        else:
            assert row["kept"] is True


def test_filters_null_text_safe(spark):
    """NULL-text docs (failed extractions): line/PII counts report 0 (not
    Spark's size(NULL) = -1), redacted stays NULL, decontaminate reports
    them uncontaminated."""
    from sparkdoc.filters import decontaminate, with_line_stats, with_pii_stats

    df = spark.createDataFrame(
        [(1, None), (2, "a@b.io x")], "doc_id int, text string"
    )
    ls = _rows(with_line_stats(df))
    assert ls[1]["n_lines"] == 0 and ls[1]["total_line_chars"] == 0
    pii = _rows(with_pii_stats(df))
    assert pii[1]["n_email"] == 0 and pii[1]["redacted"] is None
    assert pii[2]["n_email"] == 1 and pii[2]["redacted"] == "[EMAIL] x"
    bench = spark.createDataFrame([(9, "w1 w2 w3 w4 w5 w6 w7 w8")], "doc_id int, text string")
    dc = _rows(decontaminate(df, bench))
    assert dc[1]["n_contaminated"] == 0 and dc[1]["contaminated"] is False


def test_downweight_keeps_null_group_rows(spark):
    """NULL-group docs are a group like any other — the equi-join rewrite
    must not silently delete them (plain NULL = NULL never matches)."""
    from pyspark.sql import Row

    from sparkdoc.filters import downweight_frequent_groups

    rows = [Row(doc_id=i, source="a") for i in range(10)] + [
        Row(doc_id=100 + i, source=None) for i in range(5)
    ]
    out = downweight_frequent_groups(
        spark.createDataFrame(rows), "source", target=100
    )
    # both groups are under target -> EVERY row survives, including NULLs
    assert out.count() == 15
    assert out.filter("source IS NULL").count() == 5


# --- leakage-safe split ---------------------------------------------------------


def test_leakage_safe_split_clusters_move_together(spark):
    import hashlib

    from sparkdoc.filters import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 21)], "doc_id int, text string"
    )
    # two clusters: {1,2,3} rep 1, {10,11} rep 10; rest singletons
    groups = spark.createDataFrame(
        [(1, "1"), (2, "1"), (3, "1"), (10, "10"), (11, "10")],
        "doc_id int, group_id string",
    )
    got = {
        r["doc_id"]: r
        for r in leakage_safe_split(docs, groups, 0.5, salt="t").collect()
    }
    assert len(got) == 20
    # cluster members share rep_id AND side — the no-leakage property
    assert {got[i]["rep_id"] for i in (1, 2, 3)} == {"1"}
    assert len({got[i]["split"] for i in (1, 2, 3)}) == 1
    assert {got[i]["rep_id"] for i in (10, 11)} == {"10"}
    assert len({got[i]["split"] for i in (10, 11)}) == 1
    # singletons key on themselves
    assert got[7]["rep_id"] == "7"
    # membership matches the md5 ppm rule exactly (hashlib recompute)
    for i, r in got.items():
        b = int(hashlib.md5((r["rep_id"] + "t").encode()).hexdigest()[:15], 16) % 1_000_000
        assert r["split"] == ("eval" if b < 500_000 else "train"), i


def test_leakage_safe_split_no_groups_rows(spark):
    from sparkdoc.filters import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id int")
    groups = spark.createDataFrame([], "doc_id int, group_id string")
    got = leakage_safe_split(docs, groups, 0.25, salt="x").collect()
    assert len(got) == 50
    assert all(r["rep_id"] == str(r["doc_id"]) for r in got)
    # both sides populated at 50 docs with frac 0.25 (seeded rule, stable)
    sides = {r["split"] for r in got}
    assert sides == {"train", "eval"}


# --- temperature sampling -------------------------------------------------------


def test_temperature_sample_thresholds_exact(spark):
    import hashlib
    import math

    from sparkdoc.filters import temperature_sample

    # skewed groups: A=600, B=100, C=4
    rows = (
        [(i, "A") for i in range(600)]
        + [(1000 + i, "B") for i in range(100)]
        + [(2000 + i, "C") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id int, stratum string")
    got = temperature_sample(df, "stratum", target_total=150, alpha=0.5, salt="s")
    rs = got.collect()

    # python twin of the exact integer/IEEE pipeline
    ns = {"A": 600, "B": 100, "C": 4}
    sv = {g: math.floor(math.sqrt(n) * 1_000_000.0) for g, n in ns.items()}
    z = sum(sv.values())
    ppm = {
        g: min(
            1_000_000,
            math.floor((((150.0 * float(sv[g])) / float(z)) / float(ns[g])) * 1_000_000.0),
        )
        for g in ns
    }
    # alpha=0.5 upweights small groups: keep fraction ordering C > B > A
    assert ppm["C"] > ppm["B"] > ppm["A"]
    kept_expected = set()
    for i, g in rows:
        b = int(hashlib.md5((str(i) + "s").encode()).hexdigest()[:15], 16) % 1_000_000
        if b < ppm[g]:
            kept_expected.add(i)
    assert {r["doc_id"] for r in rs} == kept_expected
    assert all(r["keep_ppm"] == ppm[r["stratum"]] for r in rs)


def test_temperature_sample_cap_and_alpha_one(spark):
    from sparkdoc.filters import temperature_sample

    # a singleton group with a huge target saturates the ppm cap → kept fully
    df = spark.createDataFrame(
        [(0, "tiny")] + [(i, "big") for i in range(1, 401)],
        "doc_id int, stratum string",
    )
    got = {r["doc_id"]: r for r in temperature_sample(df, "stratum", 200, alpha=0.5).collect()}
    assert 0 in got and got[0]["keep_ppm"] == 1_000_000
    # alpha=1.0 is proportional sampling: every group keeps ~target/total
    flat = temperature_sample(df, "stratum", 200, alpha=1.0).collect()
    ppms = {r["stratum"]: r["keep_ppm"] for r in flat}
    # with alpha=1: f = target/total for every group (s ∝ n cancels)
    import math

    expect = math.floor(200.0 / 401.0 * 1_000_000) 
    for v in ppms.values():
        assert abs(v - expect) <= 1  # integer floor of s introduces ≤1 ppm drift


def test_temperature_sample_rejects_odd_alpha(spark):
    import pytest

    from sparkdoc.filters import temperature_sample

    df = spark.createDataFrame([(1, "a")], "doc_id int, stratum string")
    with pytest.raises(ValueError, match="alpha"):
        temperature_sample(df, "stratum", 10, alpha=0.3)


# --- semantic decontamination ----------------------------------------------------


def test_semantic_decontam_hand_case(spark):
    from sparkdoc.similarity import semantic_decontam

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),     # == bench 100 → cos 1.0
            (2, [0.9, 0.1, 0.0]),     # near bench 100
            (3, [0.0, 0.0, 1.0]),     # orthogonal to both
            (4, [0.0, 2.0, 0.0]),     # == bench 200 direction (scale-invariant)
            (5, [0.0, 0.0, 0.0]),     # zero norm → dropped
        ],
        "vec_id int, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [2.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])],
        "bench_id int, embedding array<double>",
    )
    got = {
        r["vec_id"]: r
        for r in semantic_decontam(
            corpus, bench, threshold=0.95, bench_id_col="bench_id"
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4}  # zero-norm doc 5 dropped
    assert got[1]["contaminated"] == 1 and got[1]["nearest_bench"] == 100
    assert got[1]["max_cos"] == 1.0
    assert got[4]["contaminated"] == 1 and got[4]["nearest_bench"] == 200
    assert got[3]["contaminated"] == 0 and got[3]["max_cos"] == 0.0
    # doc 2: cos vs bench100 = 0.9/sqrt(0.82) ≈ 0.9939 → flagged at 0.95
    assert got[2]["contaminated"] == 1 and got[2]["nearest_bench"] == 100


def test_semantic_decontam_tie_breaks_to_smallest_bench(spark):
    from sparkdoc.similarity import semantic_decontam

    corpus = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id int, embedding array<double>"
    )
    bench = spark.createDataFrame(
        # two identical bench vectors → identical cosine → smallest id wins
        [(9, [3.0, 3.0]), (5, [3.0, 3.0])],
        "bench_id int, embedding array<double>",
    )
    got = semantic_decontam(corpus, bench, threshold=0.5, bench_id_col="bench_id").collect()
    assert got[0]["nearest_bench"] == 5 and got[0]["contaminated"] == 1
