"""Trained vector quantization (sparkdoc/cluster.py): distributed Lloyd's
k-means, trained IVF, product quantization with ADC scoring.

The numpy twins re-derive the fit bit-for-bit (integer micro-unit updates
make the comparison exact); the behaviour tests check the METHOD does what
FAISS's IVF/PQ pair promises — trained cells track the data distribution and
ADC approximates exact cosine order.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sparkdoc.cluster import (
    E6,
    ivf_topk_trained,
    kmeans_assign,
    kmeans_fit,
    kmeans_stats,
    pq_encode,
    pq_fit,
    pq_topk,
)

DIM = 8


def _vecs(n: int, dim: int = DIM) -> list[tuple[int, list[float]]]:
    """Deterministic synthetic vectors: two obvious clusters (pos-heavy on
    the first half of dims vs the second half) plus md5-derived jitter."""
    out = []
    for i in range(n):
        h = hashlib.md5(f"v:{i}".encode()).digest()
        base = [0.0] * dim
        half = dim // 2
        if i % 2 == 0:
            for j in range(half):
                base[j] = 1.0
        else:
            for j in range(half, dim):
                base[j] = 1.0
        v = [base[j] + (h[j] - 127.5) / 512.0 for j in range(dim)]
        out.append((i, v))
    return out


def _unit(v: list[float]) -> list[float]:
    acc = 0.0
    for x in v:
        acc += x * x
    n = math.sqrt(acc)
    return [x / n for x in v]


def _dot(a: list[float], b: list[float]) -> float:
    acc = None
    for x, y in zip(a, b):
        acc = x * y if acc is None else acc + x * y
    return acc


def _half_sq(c: list[float]) -> float:
    acc = 0.0
    for x in c:
        acc += x * x
    return acc / 2


def _argmin_cell(v: list[float], cents: list[list[float]]) -> int:
    best, score = -1, float("-inf")
    for i, c in enumerate(cents):
        s = _dot(v, c) - _half_sq(c)
        if s > score:
            best, score = i, s
    return best


def _py_seed_rows(rows, k: int, seed: int):
    ranked = sorted(
        rows, key=lambda r: (hashlib.md5(f"{r[0]}:{seed}".encode()).hexdigest(), r[0])
    )
    return [(i, _unit(v)) for i, v in ranked[:k]]


def _py_kmeans(rows, k: int, iters: int, seed: int, dim: int):
    """Driver-twin Lloyd's: integer micro-unit sums, empty cells carry."""
    units = [(i, _unit(v)) for i, v in rows]
    cents = [v for _, v in _py_seed_rows(rows, k, seed)]
    for _ in range(iters):
        sums = {c: [0] * dim for c in range(k)}
        cnts = {c: 0 for c in range(k)}
        for _, u in units:
            cell = _argmin_cell(u, cents)
            cnts[cell] += 1
            for j in range(dim):
                # Spark F.round = HALF_UP away from zero
                x = u[j] * E6
                q = math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
                sums[cell][j] += int(q)
        new = [list(c) for c in cents]
        for c in range(k):
            if cnts[c]:
                new[c] = [sums[c][j] / (cnts[c] * E6) for j in range(dim)]
        cents = new
    return cents


@pytest.fixture(scope="module")
def emb(spark):
    rows = [Row(vec_id=i, embedding=v) for i, v in _vecs(40)]
    return spark.createDataFrame(rows)


def test_kmeans_fit_matches_python_twin(spark, emb):
    cents = kmeans_fit(emb, k=3, iters=2, dim=DIM, seed=13)
    twin = _py_kmeans(_vecs(40), k=3, iters=2, seed=13, dim=DIM)
    assert len(cents) == 3
    for a, b in zip(cents, twin):
        assert a == pytest.approx(b, abs=0.0)  # bit-exact, not tolerance


def test_kmeans_fit_deterministic_across_partitionings(spark, emb):
    c1 = kmeans_fit(emb.repartition(1), k=3, iters=2, dim=DIM)
    c8 = kmeans_fit(emb.repartition(8), k=3, iters=2, dim=DIM)
    assert c1 == c8  # BIGINT sums are order-independent


def test_kmeans_separates_the_two_clusters(spark, emb):
    cents = kmeans_fit(emb, k=2, iters=3, dim=DIM)
    got = {r["vec_id"]: r["cell"] for r in kmeans_assign(emb, cents).collect()}
    evens = {got[i] for i in range(0, 40, 2)}
    odds = {got[i] for i in range(1, 40, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_kmeans_stats_is_next_iteration_state(spark, emb):
    cents = kmeans_fit(emb, k=3, iters=1, dim=DIM)
    st = {
        (r["cell"], r["j"]): (r["s_e6"], r["cnt"])
        for r in kmeans_stats(emb, cents, dim=DIM).collect()
    }
    # one more python-twin iteration from the same centroids
    units = [(i, _unit(v)) for i, v in _vecs(40)]
    sums: dict[tuple[int, int], int] = {}
    cnts: dict[int, int] = {}
    for _, u in units:
        cell = _argmin_cell(u, cents)
        cnts[cell] = cnts.get(cell, 0) + 1
        for j in range(DIM):
            x = u[j] * E6
            q = math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
            sums[(cell, j)] = sums.get((cell, j), 0) + int(q)
    assert len(st) == len(sums)
    for key, (s, cnt) in st.items():
        assert sums[key] == s and cnts[key[0]] == cnt


def test_kmeans_empty_cell_carries_previous_centroid(spark):
    # 3 identical vectors, k=2 identical seeds: ties go to the LOWEST cell,
    # so cell 1 wins no rows in iteration 1 and must carry its seed EXACTLY
    # (not NaN/zero). iters=1 pins the carry itself; at iters=2 the winner
    # legitimately flips (the carried exact seed out-scores the micro-unit-
    # quantized mean), which the python twin covers.
    rows = [Row(vec_id=i, embedding=[1.0] * DIM) for i in range(3)]
    df = spark.createDataFrame(rows)
    cents = kmeans_fit(df, k=2, iters=1, dim=DIM)
    u = _unit([1.0] * DIM)
    winner = _argmin_cell(u, [u, u])  # both seeds identical -> cell 0 wins ties
    assert winner == 0
    assert cents[0] == pytest.approx(u, abs=1e-6)  # quantized mean
    assert cents[1] == u  # carried seed, bit-exact


def test_kmeans_k_larger_than_corpus_raises(spark):
    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0] * DIM)])
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kmeans_fit(df, k=2, iters=1, dim=DIM)


def test_kmeans_train_mod_samples_but_assigns_all(spark, emb):
    cents = kmeans_fit(emb, k=2, iters=2, dim=DIM, train_mod=2)
    assigned = kmeans_assign(emb, cents)
    assert assigned.count() == 40  # full corpus assigned despite sampled fit
    assert len(cents) == 2


def test_ivf_trained_topk_shape_and_exact_cosine(spark, emb):
    cents = kmeans_fit(emb, k=2, iters=2, dim=DIM)
    q = emb.filter(F.col("vec_id") < 2)
    got = ivf_topk_trained(emb, q, cents, k=3, nprobe=1).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    units = dict((i, _unit(v)) for i, v in _vecs(40))
    for qid, rs in by_q.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == list(
            range(1, len(rs) + 1)
        )
        for r in rs:
            exact = _dot(units[qid], units[r["neighbor_id"]])
            assert r["cos"] == pytest.approx(round(exact, 6), abs=1e-9)
            assert r["neighbor_id"] != qid


def test_ivf_trained_nprobe_full_equals_brute_force(spark, emb):
    from sparkdoc.similarity import brute_force_topk

    cents = kmeans_fit(emb, k=2, iters=2, dim=DIM)
    q = emb.filter(F.col("vec_id") < 3)
    trained = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk_trained(emb, q, cents, k=5, nprobe=2).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    assert trained == exact  # probing every cell == exhaustive search


def test_pq_fit_rejects_indivisible_dim(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb, m=3, ksub=2, dim=DIM)


def test_pq_encode_codes_are_per_slice_argmin(spark, emb):
    cb = pq_fit(emb, m=2, ksub=2, iters=1, dim=DIM)
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    dsub = DIM // 2
    for i, v in _vecs(40):
        u = _unit(v)
        want = [
            _argmin_cell(u[s * dsub : (s + 1) * dsub], cb[s]) for s in range(2)
        ]
        assert codes[i] == want


def test_pq_adc_score_is_sum_of_slice_dots(spark, emb):
    cb = pq_fit(emb, m=2, ksub=2, iters=1, dim=DIM)
    q = emb.filter(F.col("vec_id") == 0)
    got = pq_topk(emb, q, cb, k=3).collect()
    dsub = DIM // 2
    units = dict((i, _unit(v)) for i, v in _vecs(40))
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    for r in got:
        qu = units[0]
        want = None
        for s in range(2):
            t = _dot(qu[s * dsub : (s + 1) * dsub], cb[s][codes[r["neighbor_id"]][s]])
            want = t if want is None else want + t
        assert r["cos"] == pytest.approx(round(want, 6), abs=1e-9)


def test_pq_adc_orders_like_exact_cosine_on_separated_data(spark, emb):
    """With 2 clean clusters, PQ's rank-1 neighbor must come from the query's
    own cluster — the quality property ADC is supposed to preserve."""
    cb = pq_fit(emb, m=4, ksub=4, iters=2, dim=DIM)
    q = emb.filter(F.col("vec_id") < 4)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in pq_topk(emb, q, cb, k=1).collect()
    }
    for qid, nid in top1.items():
        assert qid % 2 == nid % 2  # same parity == same cluster


def test_semantic_dedup_with_trained_cells(spark, emb):
    """SemDeDup over trained k-means cells: keep rule preserved, cells come
    from the codebook (every vector's cell equals its kmeans_assign cell)."""
    from sparkdoc.similarity import semantic_dedup

    cents = kmeans_fit(emb, k=2, iters=2, dim=DIM)
    out = semantic_dedup(emb, threshold=0.99, cents=cents, dim=DIM)
    rows = out.collect()
    assert len(rows) == 40
    cells = {r["vec_id"]: r["cell"] for r in rows}
    want = {r["vec_id"]: r["cell"] for r in kmeans_assign(emb, cents).collect()}
    assert cells == want
    # a shadowed vector's shadow is a lower id in the same cell
    for r in rows:
        if not r["kept"]:
            assert r["shadow"] < r["vec_id"] and cells[r["shadow"]] == r["cell"]
