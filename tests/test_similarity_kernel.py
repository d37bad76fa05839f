"""The round-6 Arrow top-k kernel must be BIT-EXACT against the original
all-JVM HOF-fold formulation (`_brute_force_topk_hof`) — same float→double
casts, same sequential left-fold add chain, same NaN/null/tie ordering.
These tests pin kernel == HOF on the shapes where implementations diverge:
zero vectors, NaN elements, null arrays/elements, ragged dimensions (null
cos via zip_with padding), exact-duplicate vectors (cos ties → id
tie-break), and tiny magnitudes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkdoc.similarity import _brute_force_topk_hof, brute_force_topk


@pytest.fixture(scope="module")
def spark():
    from sparkdoc.session import get_spark

    s = get_spark("test-similarity-kernel", master="local[4]", shuffle_partitions=4)
    yield s


def _canon(rows):
    out = []
    for r in rows:
        cos = r[3]
        if cos is None:
            cos = "null"
        elif math.isnan(cos):
            cos = "nan"
        out.append((r[0], r[1], r[2], cos))
    return sorted(out)


HOSTILE = [
    (0, [1.0, 0.0, 0.0]),
    (1, [1.0, 0.0, 0.0]),          # exact duplicate → cos tie with 0
    (2, [0.0, 0.0, 0.0]),          # zero norm → dropped
    (3, [float("nan"), 1.0, 0.0]),  # NaN norm → kept, NaN cos sorts first
    (4, None),                      # null array → dropped
    (5, [1.0, None, 0.0]),          # null element → dropped
    (6, [0.5, 0.5]),                # ragged dim: 2-d island
    (7, [0.70710678, 0.70710678]),
    (8, [1.0, 2.0, 3.0]),
    (9, [-1.0, 0.0, 0.0]),
    (10, [1e-30, 0.0, 0.0]),        # tiny but positive norm → kept
]


def test_kernel_matches_hof_on_hostile_corpus(spark):
    df = spark.createDataFrame(
        HOSTILE, "vec_id long, embedding array<float>"
    ).repartition(3)
    got = _canon(brute_force_topk(df, df, k=3).collect())
    want = _canon(_brute_force_topk_hof(df, df, k=3).collect())
    assert got == want
    assert len(got) > 0


def test_kernel_matches_hof_on_random_vectors(spark):
    import random

    rnd = random.Random(42)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(7)
    q = df.filter(F.col("vec_id") % 25 == 0)
    got = _canon(brute_force_topk(df, q, k=10).collect())
    want = _canon(_brute_force_topk_hof(df, q, k=10).collect())
    assert got == want
    assert len(got) == 12 * 10


def test_kernel_empty_queries(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    q = df.filter(F.col("vec_id") < 0)
    out = brute_force_topk(df, q, k=3)
    assert out.columns == ["query_id", "neighbor_id", "rank", "cos"]
    assert out.count() == 0


def test_int32_ids_fall_back_to_hof(spark):
    # the kernel emits int64 Arrow arrays — narrower integral id types must
    # take the HOF path (the r6 suite caught an int32 corpus crashing with
    # an ArrowColumnVector accessor mismatch)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id int, embedding array<float>",
    )
    out = brute_force_topk(df, df, k=2).collect()
    want = _brute_force_topk_hof(df, df, k=2).collect()
    assert _canon(out) == _canon(want)
    assert len(out) == 6


def test_non_integer_ids_fall_back_to_hof(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<float>",
    )
    out = brute_force_topk(df, df, k=2).collect()
    want = _brute_force_topk_hof(df, df, k=2).collect()
    assert _canon(out) == _canon(want)
