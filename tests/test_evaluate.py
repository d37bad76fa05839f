"""Extraction-evaluation harness (sparkdoc/evaluate.py) — pins the reference
semantics of 16_extraction_evaluation.py / 17_benchmark_aggregate.py on
hand-built graphs: strict vs relaxed rungs, digit-signature veto, uniqueness
gates, unkeyed exclusion, edge alias folding, completeness, fan-out,
integrity, rollup."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdoc.evaluate import (
    attribute_completeness,
    edge_fanout,
    eval_edges,
    eval_nodes,
    eval_nodes_micro,
    eval_rollup,
    integrity_stats,
    node_identity_keys,
)

ID_FIELDS = {"Root": ["title"], "Entity": ["name"], "NoId": []}

NODES_SCHEMA = (
    "doc_id string, class string, node_id string, "
    "ids map<string,string>, attrs map<string,string>"
)
EDGES_SCHEMA = "doc_id string, src string, dst string, label string"


def _nodes(spark, rows):
    return spark.createDataFrame(rows, NODES_SCHEMA)


def _edges(spark, rows):
    return spark.createDataFrame(rows, EDGES_SCHEMA)


def _truth(spark):
    return _nodes(
        spark,
        [
            # Root: strict match with got (same canonical title).
            ("d1", "Root", "tR", {"title": "Annual Report 2024"}, {"year": "2024"}),
            # e1 strict; e2 relaxed (got holds a superset string); e3 missed (fn).
            ("d1", "Entity", "te1", {"name": "Acme Corp"}, {"kind": "org", "city": "Basel"}),
            ("d1", "Entity", "te2", {"name": "Gamma"}, {"kind": "org"}),
            ("d1", "Entity", "te3", {"name": "Omega Ltd"}, {"kind": "org"}),
            # digit-sig veto: truth 'Line 12' vs got 'Line 12 34' must NOT pair.
            ("d1", "Entity", "te4", {"name": "Line 12"}, {}),
            # unkeyed: all id fields empty -> excluded from matching.
            ("d1", "Entity", "tU", {"name": "  "}, {}),
            # class without id fields -> unkeyed.
            ("d1", "NoId", "tN", {"x": "1"}, {}),
        ],
    )


def _got(spark):
    return _nodes(
        spark,
        [
            ("d1", "Root", "gR", {"title": "ANNUAL-REPORT 2024"}, {"year": "2024"}),
            ("d1", "Entity", "ge1", {"name": "acme corp"}, {"kind": "org", "city": ""}),
            # relaxed: canonical 'gammadivision' contains 'gamma'.
            ("d1", "Entity", "ge2", {"name": "Gamma Division"}, {"kind": "org"}),
            # pure fp noise.
            ("d1", "Entity", "ge9", {"name": "Zeta Zeta"}, {}),
            # digit-sig mismatch partner of te4.
            ("d1", "Entity", "ge4", {"name": "Line 12 34"}, {}),
        ],
    )


def test_node_identity_keys_unkeyed_and_canon(spark):
    keys = node_identity_keys(_truth(spark), ID_FIELDS)
    got = {r["node_id"]: (r["key"], r["sig"]) for r in keys.collect()}
    assert "tU" not in got and "tN" not in got  # unkeyed excluded
    assert got["tR"] == ("annualreport2024", "2024")
    assert got["te4"] == ("line12", "12")


def test_eval_nodes_strict_and_relaxed(spark):
    m = {
        r["class"]: r
        for r in eval_nodes(_truth(spark), _got(spark), ID_FIELDS).collect()
    }
    root = m["Root"]
    assert (root["tp_strict"], root["fp_strict"], root["fn_strict"]) == (1, 0, 0)
    assert root["f1_strict"] == 1.0
    ent = m["Entity"]
    # strict: acme only. truth keyed = {acme, gamma, omega, line12}; got
    # keyed = {acme, gammadivision, zetazeta, line1234}.
    assert (ent["tp_strict"], ent["fp_strict"], ent["fn_strict"]) == (1, 3, 3)
    # relaxed adds ONLY gamma~gammadivision (digit-sig vetoes line12 pair).
    assert (ent["tp_relaxed"], ent["fp_relaxed"], ent["fn_relaxed"]) == (2, 2, 2)
    assert abs(ent["f1_relaxed"] - 0.5) < 1e-12


def test_relaxed_requires_mutual_uniqueness(spark):
    truth = _nodes(
        spark,
        [
            ("d1", "Entity", "t1", {"name": "alpha"}, {}),
            ("d1", "Entity", "t2", {"name": "alphabeta"}, {}),
        ],
    )
    got = _nodes(spark, [("d1", "Entity", "g1", {"name": "alphabetagamma"}, {})])
    # both truth keys are contained in the single got key -> got side has two
    # candidates -> no relaxed pair at all.
    row = eval_nodes(truth, got, ID_FIELDS).filter(F.col("class") == "Entity").first()
    assert row["tp_relaxed"] == 0 and row["fn_relaxed"] == 2 and row["fp_relaxed"] == 1


def test_eval_nodes_micro_sums_before_ratio(spark):
    micro = eval_nodes_micro(eval_nodes(_truth(spark), _got(spark), ID_FIELDS)).first()
    # summed across classes: tp=2 fp=3 fn=3 strict.
    assert (micro["tp_strict"], micro["fp_strict"], micro["fn_strict"]) == (2, 3, 3)
    assert abs(micro["p_strict"] - 2 / 5) < 1e-12
    assert abs(micro["r_strict"] - 2 / 5) < 1e-12


def _truth_edges(spark):
    return _edges(
        spark,
        [
            ("d1", "tR", "te1", "has"),
            ("d1", "tR", "te2", "has"),
            ("d1", "te1", "te3", "rel"),
            ("d1", "tR", "tU", "has"),  # unkeyed endpoint -> dropped
        ],
    )


def _got_edges(spark):
    return _edges(
        spark,
        [
            ("d1", "gR", "ge1", "has"),  # strict tp
            ("d1", "gR", "ge1", "has"),  # duplicate -> set semantics
            ("d1", "gR", "ge2", "has"),  # relaxed tp via alias fold
            ("d1", "ge1", "ge9", "rel"),  # fp at both rungs
        ],
    )


def test_eval_edges_alias_fold(spark):
    m = {
        r["label"]: r
        for r in eval_edges(
            _truth(spark), _got(spark), _truth_edges(spark), _got_edges(spark), ID_FIELDS
        ).collect()
    }
    has = m["has"]
    # truth keyed 'has' edges: R->acme, R->gamma (R->tU dropped). strict tp:
    # R->acme only (duplicate collapses); relaxed folds ge2->gamma.
    assert (has["truth_n"], has["tp_strict"], has["fp_strict"], has["fn_strict"]) == (2, 1, 1, 1)
    assert (has["tp_relaxed"], has["fp_relaxed"], has["fn_relaxed"]) == (2, 0, 0)
    rel = m["rel"]
    assert (rel["tp_strict"], rel["fp_strict"], rel["fn_strict"]) == (0, 1, 1)


def test_attribute_completeness_on_strict_matches(spark):
    rows = {
        (r["class"], r["field"]): (r["filled"], r["expected"])
        for r in attribute_completeness(_truth(spark), _got(spark), ID_FIELDS).collect()
    }
    # strict pairs: Root(annualreport2024), Entity(acmecorp).
    assert rows[("Root", "year")] == (1, 1)
    assert rows[("Entity", "kind")] == (1, 1)
    # truth city filled, got city empty-string -> unfilled.
    assert rows[("Entity", "city")] == (0, 1)


def test_edge_fanout_top_share(spark):
    fan = {
        r["label"]: r
        for r in edge_fanout(_got_edges(spark), _got(spark), ID_FIELDS).collect()
    }
    has = fan["has"]
    # 3 'has' edges all from gR (duplicates NOT collapsed in fanout,
    # reference counts raw edges).
    assert has["total"] == 3 and has["sources"] == 1
    assert abs(has["top_source_share"] - 1.0) < 1e-12


def test_integrity_stats(spark):
    got = _got(spark).union(
        _nodes(spark, [("d1", "Entity", "gE", {"name": ""}, {})])
    )
    row = integrity_stats(got, _got_edges(spark), ID_FIELDS).first()
    assert row["node_n"] == 6
    assert row["empty_identity_n"] == 1  # gE: id-bearing class, empty id
    assert row["unkeyed_n"] == 1
    # referenced: gR, ge1, ge2, ge9 -> orphans = ge4, gE.
    assert row["orphan_n"] == 2


def test_structural_align_strong_containment(spark):
    from sparkdoc.evaluate import structural_align_pairs

    long = "the quick brown fox jumps over the lazy dog near the river bank"
    truth = _nodes(
        spark,
        [
            ("d1", "Entity", "tA", {"name": "qqq"}, {"desc": long, "kind": "x"}),
            ("d1", "Entity", "tB", {"name": "rrr"}, {"kind": "y"}),
        ],
    )
    got = _nodes(
        spark,
        [
            ("d1", "Entity", "gA", {"name": "sss"}, {"desc": long + " extra"}),
            ("d1", "Entity", "gB", {"name": "ttt"}, {"kind": "zz"}),
        ],
    )
    rows = structural_align_pairs(truth, got, ID_FIELDS).collect()
    assert len(rows) == 1
    r = rows[0]
    # long shared span (>=40 chars) scores a full point on its own
    assert (r["tkey"], r["gkey"], r["score"]) == ("qqq", "sss", 1.0)


def test_structural_align_greedy_best_first(spark):
    from sparkdoc.evaluate import structural_align_pairs

    truth = _nodes(
        spark,
        [
            ("d1", "Entity", "t1", {"name": "k1"}, {"a": "alpha", "b": "beta"}),
            ("d1", "Entity", "t2", {"name": "k2"}, {"a": "alpha"}),
        ],
    )
    got = _nodes(
        spark,
        [("d1", "Entity", "g1", {"name": "k9"}, {"a": "alpha", "b": "beta"})],
    )
    rows = structural_align_pairs(truth, got, ID_FIELDS).collect()
    # greedy best-first: (t1,g1) scores 2.0 and consumes g1; t2 (score 1.0)
    # goes unpaired — mutual-unique would have rejected both.
    assert len(rows) == 1 and rows[0]["tkey"] == "k1" and rows[0]["score"] == 2.0


def test_structural_align_short_containment_below_threshold(spark):
    from sparkdoc.evaluate import structural_align_pairs

    truth = _nodes(spark, [("d1", "Entity", "t1", {"name": "k1"}, {"a": "abcdef"})])
    got = _nodes(spark, [("d1", "Entity", "g1", {"name": "k9"}, {"a": "abcdefgh"})])
    # short containment alone = 0.5 < 1.0 threshold
    assert structural_align_pairs(truth, got, ID_FIELDS).count() == 0
    truth2 = _nodes(
        spark, [("d1", "Entity", "t1", {"name": "k1"}, {"a": "abcdef", "k": "v"})]
    )
    got2 = _nodes(
        spark, [("d1", "Entity", "g1", {"name": "k9"}, {"a": "abcdefgh", "k": "v"})]
    )
    rows = structural_align_pairs(truth2, got2, ID_FIELDS).collect()
    assert len(rows) == 1 and abs(rows[0]["score"] - 1.5) < 1e-12


def test_eval_nodes_aligned_arithmetic(spark):
    from sparkdoc.evaluate import eval_nodes_aligned

    long = "a shared verbatim clause easily longer than forty characters total"
    truth = _nodes(
        spark,
        [
            ("d1", "Entity", "t1", {"name": "alpha"}, {"x": "1"}),
            ("d1", "Entity", "t2", {"name": "beta"}, {"desc": long}),
        ],
    )
    got = _nodes(
        spark,
        [
            ("d1", "Entity", "g1", {"name": "alpha"}, {"x": "1"}),
            ("d1", "Entity", "g2", {"name": "unrelated"}, {"desc": long}),
        ],
    )
    row = eval_nodes_aligned(truth, got, ID_FIELDS).first()
    assert (row["tp_strict"], row["tp_relaxed"], row["tp_aligned"]) == (1, 1, 2)
    assert row["fp_aligned"] == 0 and row["fn_aligned"] == 0
    assert row["f1_aligned"] == 1.0


def test_verbatim_ratio(spark):
    from sparkdoc.evaluate import verbatim_ratio

    text = "lorem " * 30  # 180 chars
    docs = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    got = _nodes(
        spark,
        [
            (
                "d1",
                "Entity",
                "g1",
                {"name": "n"},
                {"quote": text[:100], "fab": text[:100] + "zzz", "short": "abc"},
            )
        ],
    )
    row = verbatim_ratio(got, docs).first()
    assert row["verbatim_n"] == 2  # 'short' excluded by the 80-char gate
    assert row["verbatim_hits"] == 1
    assert abs(row["verbatim_ratio"] - 0.5) < 1e-12


def test_eval_rollup_micro_across_docs(spark):
    t2 = _truth(spark).withColumn("doc_id", F.lit("d2"))
    g2 = _got(spark).withColumn("doc_id", F.lit("d2"))
    metrics = eval_nodes(
        _truth(spark).union(t2), _got(spark).union(g2), ID_FIELDS
    )
    roll = {r["class"]: r for r in eval_rollup(metrics).collect()}
    ent = roll["Entity"]
    assert ent["docs"] == 2
    assert (ent["tp_strict"], ent["fp_strict"], ent["fn_strict"]) == (2, 6, 6)
    # micro == per-doc here (identical docs), mean per-doc f1 matches micro f1.
    assert abs(ent["mean_f1_strict"] - ent["f1_strict"]) < 1e-12


def test_duplicate_node_rows_do_not_corrupt_identity_keys(spark):
    """A duplicated (doc_id, class, node_id) input row (e.g. a truth table
    unioned from two annotation exports) must not double the collected id
    values into a corrupted key that zeroes the node's matches."""
    from sparkdoc.evaluate import node_identity_keys

    nodes = spark.createDataFrame(
        [
            ("d1", "Party", "n1", {"name": "acme"}),
            ("d1", "Party", "n1", {"name": "acme"}),  # exact duplicate row
            ("d1", "Party", "n2", {"name": "beta"}),
        ],
        "doc_id string, class string, node_id string, ids map<string,string>",
    )
    keys = {
        r["node_id"]: r["key"]
        for r in node_identity_keys(nodes, {"Party": ["name"]}).collect()
    }
    assert keys["n1"] == "acme" and keys["n2"] == "beta"


def test_conflicting_duplicate_rows_resolve_deterministically(spark):
    """Duplicate input rows that CONFLICT on the id value (two annotation
    exports disagreeing about the same node) must resolve to the SAME key
    on every run/partitioning — min(canon), not an arbitrary survivor."""
    from sparkdoc.evaluate import node_identity_keys

    rows = [
        ("d1", "Party", "n1", {"name": "acme corp"}),
        ("d1", "Party", "n1", {"name": "ACME"}),  # conflicting export
    ]
    expected = None
    for nparts in (1, 2, 7):
        nodes = spark.createDataFrame(
            rows,
            "doc_id string, class string, node_id string, ids map<string,string>",
        ).repartition(nparts)
        got = {
            r["node_id"]: r["key"]
            for r in node_identity_keys(nodes, {"Party": ["name"]}).collect()
        }
        if expected is None:
            expected = got
        assert got == expected
    # min over the CANONICALIZED values, so the winner is order-free
    assert expected["n1"] == min(expected["n1"], "acme corp")
