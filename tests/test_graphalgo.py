"""PageRank (sparkdoc/graphalgo.py): python-twin integer exactness, the
structural properties PageRank promises, and determinism."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from sparkdoc.graphalgo import E9, pagerank


def _py_pagerank(edges: list[tuple[int, int]], iters: int, d: float = 0.85):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {t for _, t in e})
    n = len(nodes)
    outdeg: dict[int, int] = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = int(round((1.0 - d) * E9)) // n
    r = {v: E9 // n for v in nodes}
    for _ in range(iters):
        s_in: dict[int, int] = {}
        for a, b in e:
            s_in[b] = s_in.get(b, 0) + r[a] // outdeg[a]
        new = {}
        for v in nodes:
            x = d * s_in.get(v, 0)
            q = int(math.floor(x + 0.5))  # x >= 0 always
            new[v] = base + q
        r = new
    return r


def _run(spark, edges, iters=3, **kw):
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    return {r["node"]: r["r_e9"] for r in pagerank(df, iters=iters, **kw).collect()}


def test_two_cycle_is_symmetric_fixed_point(spark):
    got = _run(spark, [(1, 2), (2, 1)], iters=5)
    assert got[1] == got[2]
    # mass conserved exactly on a cycle (no dangling, outdeg 1: no div drip
    # beyond the shared base rounding)
    assert abs(got[1] + got[2] - E9) <= 4


def test_matches_python_twin_exactly(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (2, 4)]
    got = _run(spark, edges, iters=4)
    assert got == _py_pagerank(edges, iters=4)


def test_hub_outranks_leaves(spark):
    # star: everyone points at 0
    edges = [(i, 0) for i in range(1, 6)]
    got = _run(spark, edges, iters=3)
    assert all(got[0] > got[i] for i in range(1, 6))


def test_dangling_node_keeps_only_teleport(spark):
    # 2 -> 1; node 1 has no out-edges (dangling): after enough iterations
    # its inflow comes only from 2's teleport share
    got = _run(spark, [(2, 1)], iters=3)
    base = int(round(0.15 * E9)) // 2
    assert got[2] == base  # nothing points at 2
    assert got[1] == base + int(math.floor(0.85 * base + 0.5))


def test_multi_edges_do_not_double_count(spark):
    a = _run(spark, [(1, 2), (2, 1)], iters=3)
    b = _run(spark, [(1, 2), (1, 2), (2, 1), (2, 1), (1, 2)], iters=3)
    assert a == b


def test_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7) % 23) for i in range(40)] + [(i % 23, i) for i in range(40)]
    df1 = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges]).repartition(1)
    df8 = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges]).repartition(8)
    r1 = {r["node"]: r["r_e9"] for r in pagerank(df1, iters=3).collect()}
    r8 = {r["node"]: r["r_e9"] for r in pagerank(df8, iters=3).collect()}
    assert r1 == r8


def test_checkpoint_every_preserves_result(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    a = _run(spark, edges, iters=5, checkpoint_every=2)
    b = _run(spark, edges, iters=5, checkpoint_every=0)
    assert a == b


def test_pagerank_mass_unit_guard_and_scaling(spark):
    import pytest
    from pyspark.sql.utils import AnalysisException
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    # more nodes than units → fail fast, never silent all-zero ranks
    with pytest.raises(Exception) as ei:
        pagerank(df, iters=1, mass_units=2).collect()
    assert "mass_units" in str(ei.value)
    # > 2^53 breaks the exact damping multiply → python-side refusal
    with pytest.raises(ValueError):
        pagerank(df, iters=1, mass_units=1 << 54)
    # a larger legal unit scale still yields exact, deterministic ranks
    r = {x["node"]: x["r_e9"] for x in pagerank(df, iters=2, mass_units=10**12).collect()}
    assert set(r) == {1, 2, 3} and all(v > 0 for v in r.values())
    # 3-cycle symmetry: all ranks equal at every scale
    assert len(set(r.values())) == 1
