"""Temporal joins (sparkdoc/temporal.py): as-of join semantics (inclusive
match, tiebreak, tolerance, unmatched) and the bucketed interval join
(boundary inclusion, bucket-crossing pairs, no duplicates)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkdoc.temporal import asof_join, interval_join


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(100), lid=1),
            Row(k="a", ts=_ts(50), lid=2),  # equal to a right ts (inclusive)
            Row(k="a", ts=_ts(5), lid=3),  # before every right row
            Row(k="b", ts=_ts(100), lid=4),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), rid=10, val=1.0),
            Row(k="a", ts=_ts(50), rid=20, val=2.0),
            Row(k="a", ts=_ts(50), rid=21, val=3.0),  # duplicate ts: rid wins
            Row(k="a", ts=_ts(99), rid=30, val=4.0),
        ]
    )
    return left, right


def test_asof_basic_latest_at_or_before(spark, frames):
    left, right = frames
    out = {
        r["lid"]: (r["asof_rid"], r["asof_lag_us"])
        for r in asof_join(
            left, right, ["k"], right_vals=["rid"], tiebreak="rid"
        ).collect()
    }
    assert out[1] == (30, 1_000_000)  # ts=100 -> rid 30 at 99
    assert out[2] == (21, 0)  # inclusive equal-ts; greatest rid wins the tie
    assert out[3] == (None, None)  # nothing at or before ts=5
    assert out[4] == (None, None)  # key with no right rows


def test_asof_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    out = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            left, right, ["k"], right_vals=["rid"], tiebreak="rid", tolerance_s=0.5
        ).collect()
    }
    assert out[1] is None  # 1 s lag > 0.5 s tolerance
    assert out[2] == 21  # 0 lag passes


def test_asof_carries_multiple_value_columns_and_left_columns(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, ["k"], right_vals=["rid", "val"], tiebreak="rid"
    )
    assert set(out.columns) == {"k", "ts", "lid", "asof_rid", "asof_val", "asof_lag_us"}
    row = {r["lid"]: r for r in out.collect()}[2]
    assert (row["asof_rid"], row["asof_val"]) == (21, 3.0)


def test_asof_deterministic_across_partitionings(spark, frames):
    left, right = frames
    a = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(1), right.repartition(1), ["k"], ["rid"], tiebreak="rid"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(7), right.repartition(5), ["k"], ["rid"], tiebreak="rid"
            ).collect(),
        )
    )
    assert a == b


def test_interval_join_inclusive_boundary_and_bucket_crossing(spark):
    # gap = 10 s; pairs at exactly 10 s must match, 10.000001 s must not,
    # and a pair crossing a bucket boundary must still be found
    left = spark.createDataFrame([Row(k="a", ts=_ts(20), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), rid=1),  # exactly gap behind
            Row(k="a", ts=_ts(30), rid=2),  # exactly gap ahead
            Row(k="a", ts=_ts(9.999999), rid=3),  # just out
            Row(k="a", ts=_ts(29), rid=4),  # in, adjacent bucket
            Row(k="b", ts=_ts(20), rid=5),  # wrong key
        ]
    )
    got = {
        r["r_rid"]: r["gap_us"]
        for r in interval_join(
            left, right, ["k"], max_gap_s=10, left_cols=["lid"], right_cols=["rid"]
        ).collect()
    }
    assert got == {1: 10_000_000, 2: -10_000_000, 4: -9_000_000}


def test_interval_join_no_duplicate_pairs_from_bucket_explosion(spark):
    # the same (l, r) pair must appear ONCE even though the right row is
    # replicated into 3 buckets
    left = spark.createDataFrame(
        [Row(k="a", ts=_ts(s), lid=i) for i, s in enumerate(range(0, 100, 7))]
    )
    right = spark.createDataFrame(
        [Row(k="a", ts=_ts(s), rid=100 + i) for i, s in enumerate(range(0, 100, 5))]
    )
    out = interval_join(
        left, right, ["k"], max_gap_s=15, left_cols=["lid"], right_cols=["rid"]
    ).collect()
    pairs = [(r["l_lid"], r["r_rid"]) for r in out]
    assert len(pairs) == len(set(pairs))
    # brute-force twin
    lrows = [(i, s) for i, s in enumerate(range(0, 100, 7))]
    rrows = [(100 + i, s) for i, s in enumerate(range(0, 100, 5))]
    want = {
        (li, ri)
        for li, ls in lrows
        for ri, rs in rrows
        if abs(ls - rs) <= 15
    }
    assert set(pairs) == want


def test_asof_rejects_string_tiebreak_and_skips_null_keys(spark):
    import pytest

    left = spark.createDataFrame([(1, 10), (None, 10)], "k int, ts long")
    right = spark.createDataFrame(
        [(1, 5, "a", 7.0), (None, 5, "b", 8.0)], "k int, ts long, tag string, v double"
    )
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(left, right, ["k"], ["v"], tiebreak="tag")
    out = {r["k"]: r for r in asof_join(left, right, ["k"], ["v"]).collect()}
    assert out[1]["asof_v"] == 7.0
    # NULL-keyed left row is unmatched (equality semantics), never handed
    # the NULL-keyed right row's payload by the window partition
    assert out[None]["asof_v"] is None


def test_interval_join_gap_zero_and_empty_cols(spark):
    import pytest

    l = spark.createDataFrame([(1, 100)], "k int, ts long")
    r = spark.createDataFrame([(1, 100, 5.0)], "k int, ts long, v double")
    with pytest.raises(ValueError, match="max_gap_s"):
        interval_join(l, r, ["k"], 0.0)
    # explicit [] = no payload columns from that side
    rows = interval_join(l, r, ["k"], 60.0, left_cols=[], right_cols=["v"]).collect()
    assert rows and set(rows[0].asDict()) == {"k", "r_v", "gap_us"}
