"""Count-Min sketch (sketches.cms_build/cms_estimate): the over-count
invariant, merge-by-sum correctness, collision behavior at tiny width, and
a python twin for the cell table."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkdoc.sketches import cms_build, cms_estimate

VALS = (["apple"] * 50) + (["banana"] * 20) + (["cherry"] * 5) + ["kiwi", "lime", "fig"]


def _pos(v: str, row: int, w: int) -> int:
    return int(hashlib.md5(f"{v}:cms:{row}".encode()).hexdigest()[:15], 16) % w


def _py_cells(vals: list[str], w: int, d: int) -> dict[tuple[int, int], int]:
    out: dict[tuple[int, int], int] = {}
    for v in vals:
        for i in range(d):
            key = (i, _pos(v, i, w))
            out[key] = out.get(key, 0) + 1
    return out


@pytest.fixture(scope="module")
def vals_df(spark):
    return spark.createDataFrame([Row(term=v) for v in VALS])


def test_sketch_table_matches_python_twin(spark, vals_df):
    got = {
        (r["row"], r["pos"]): r["cnt"]
        for r in cms_build(vals_df, "term", w=64, d=3).collect()
    }
    assert got == _py_cells(VALS, 64, 3)


def test_estimate_never_undercounts(spark, vals_df):
    # w=8 forces collisions among 6 distinct values x 3 rows
    sk = cms_build(vals_df, "term", w=8, d=3)
    probes = vals_df.distinct()
    est = {r["value"]: r["est_cnt"] for r in cms_estimate(sk, probes, "term", w=8, d=3).collect()}
    true = {v: VALS.count(v) for v in set(VALS)}
    for v, t in true.items():
        assert est[v] >= t


def test_estimate_exact_when_width_is_ample(spark, vals_df):
    sk = cms_build(vals_df, "term", w=4096, d=4)
    est = {
        r["value"]: r["est_cnt"]
        for r in cms_estimate(sk, vals_df.distinct(), "term", w=4096, d=4).collect()
    }
    assert est == {v: VALS.count(v) for v in set(VALS)}


def test_unseen_probe_estimates_zero_or_collision(spark, vals_df):
    sk = cms_build(vals_df, "term", w=4096, d=4)
    probes = spark.createDataFrame([Row(term="durian")])
    est = cms_estimate(sk, probes, "term", w=4096, d=4).collect()[0]["est_cnt"]
    assert est == 0  # ample width: no collision, clean zero


def test_merge_by_sum_equals_single_build(spark, vals_df):
    half = len(VALS) // 2
    a = spark.createDataFrame([Row(term=v) for v in VALS[:half]])
    b = spark.createDataFrame([Row(term=v) for v in VALS[half:]])
    merged = (
        cms_build(a, "term", w=64, d=3)
        .unionByName(cms_build(b, "term", w=64, d=3))
        .groupBy("row", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(vals_df, "term", w=64, d=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_nulls_are_skipped(spark):
    df = spark.createDataFrame(
        [Row(term="a"), Row(term=None), Row(term="a")],
        schema="term string",
    )
    sk = cms_build(df, "term", w=64, d=2)
    total = sk.agg(F.sum("cnt")).collect()[0][0]
    assert total == 2 * 2  # two non-null occurrences x d rows
