"""dup_group_labels (connected components) and deterministic hash sampling."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def _labels(spark, edges, **kw):
    from sparkdoc.dedup_text import dup_group_labels

    pairs = spark.createDataFrame(edges, "a: long, b: long")
    rows = dup_group_labels(pairs, **kw).collect()
    return {r.doc_id: r.group_id for r in rows}


def test_dup_groups_path_star_and_islands(spark):
    # path 1-2-3-4-5 (chain transitivity), star 10<-{11,12,13}, pair (20,21)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13), (20, 21)]
    got = _labels(spark, edges)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_dup_groups_reversed_and_duplicate_edges(spark):
    # direction and multiplicity must not matter (pairs come from several
    # generators — LSH bands can emit the same pair twice)
    got = _labels(spark, [(5, 4), (4, 5), (3, 4), (5, 3), (2, 3), (9, 8)])
    assert got == {2: 2, 3: 2, 4: 2, 5: 2, 8: 8, 9: 8}


def _union_find_groups(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min per component
    comp = {}
    for n in list(parent):
        root = find(n)
        comp.setdefault(root, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_dup_groups_random_vs_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _labels(spark, edges) == _union_find_groups(edges)


def test_dup_groups_long_chain_converges_in_log_rounds(spark):
    # a 64-node path needs ~log2(64)+1 pointer-jump rounds; max_iters=10
    # would NOT suffice under plain propagation (needs 63)
    edges = [(i, i + 1) for i in range(63)]
    got = _labels(spark, edges, max_iters=10)
    assert set(got.values()) == {0} and len(got) == 64


def _py_bucket(key, salt=""):
    h = hashlib.md5((str(key) + salt).encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


def test_hash_sample_matches_reference_rule_and_is_stable(spark):
    from sparkdoc.filters import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    kept = sorted(r.doc_id for r in hash_sample(df, 0.25, salt="s1").collect())
    expect = sorted(k for k in range(2000) if _py_bucket(k, "s1") < 250_000)
    assert kept == expect
    # repartitioning must not change the kept set (df.sample would)
    kept2 = sorted(
        r.doc_id for r in hash_sample(df.repartition(13), 0.25, salt="s1").collect()
    )
    assert kept2 == kept
    # a different salt draws an (almost surely) different set of similar size
    kept3 = set(r.doc_id for r in hash_sample(df, 0.25, salt="s2").collect())
    assert set(kept) != kept3
    assert abs(len(kept3) - 500) < 100


def test_stratified_hash_sample_per_stratum_fractions(spark):
    from sparkdoc.filters import stratified_hash_sample

    df = (
        spark.range(0, 3000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.element_at(F.array(F.lit("en"), F.lit("fr"), F.lit("de")), (F.col("doc_id") % 3 + 1).cast("int")))
    )
    out = stratified_hash_sample(
        df, "lang", {"en": 1.0, "fr": 0.5}, default=0.0, salt="z"
    ).collect()
    got = {(r.doc_id, r.lang) for r in out}
    expect = set()
    for k in range(3000):
        lang = ["en", "fr", "de"][k % 3]
        frac = {"en": 1_000_000, "fr": 500_000}.get(lang, 0)
        if _py_bucket(k, "z") < frac:
            expect.add((k, lang))
    assert got == expect
    # every en kept, no de kept
    assert sum(1 for _, l in got if l == "en") == 1000
    assert all(l != "de" for _, l in got)


def test_approx_distinct_by_sketch_and_exact(spark):
    from sparkdoc.sketches import approx_distinct_by

    # 3 groups with known distinct counts (values repeat within groups)
    rows = [("a", f"v{i % 50}") for i in range(500)]
    rows += [("b", f"v{i}") for i in range(200)]
    rows += [("c", "only")] * 30
    df = spark.createDataFrame(rows, "g string, v string")

    est = {r["g"]: r for r in approx_distinct_by(df, "g", "v").collect()}
    assert set(est) == {"a", "b", "c"}
    # rsd 0.02 -> estimates land well within 10% at these cardinalities
    for g, exact in (("a", 50), ("b", 200), ("c", 1)):
        assert abs(est[g]["n_estimate"] - exact) <= max(1, 0.1 * exact)

    full = {r["g"]: r for r in approx_distinct_by(df, "g", "v", exact=True).collect()}
    assert {g: full[g]["n_distinct"] for g in full} == {"a": 50, "b": 200, "c": 1}
    assert all(full[g]["within_tol"] for g in full)

    # deterministic: the sketch has no seed, so re-running reproduces it
    again = {r["g"]: r["n_estimate"] for r in approx_distinct_by(df, "g", "v").collect()}
    assert again == {g: est[g]["n_estimate"] for g in est}
