"""DSIR importance resampling (sparkdoc/selection.py).

The numpy twin recomputes the fit/weights bit-for-bit (integer micro-units
make the comparison exact, not tolerance-based); the acceptance test checks
the METHOD does what the paper claims — selection enriches the target topic.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from sparkdoc.selection import (
    E6,
    dsir_select,
    dsir_weights,
    fit_dsir_model,
    gumbel_e6,
    ngram_feature_rows,
)

B = 64  # small bucket space so collisions are exercised


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str) -> list[str]:
    import re

    w = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
    return [f"u:{x}" for x in w] + [f"b:{a} {b}" for a, b in zip(w, w[1:])]


def _buckets(text: str, salt: str = "dsir") -> dict[int, int]:
    out: dict[int, int] = {}
    for f in _feats(text):
        b = _h60(f + salt) % B
        out[b] = out.get(b, 0) + 1
    return out


TARGET = [
    (0, "quantum physics and quantum computing research papers"),
    (1, "physics experiments with quantum entanglement results"),
]
# length-matched (8 words each): DSIR does not length-normalize, so the
# acceptance signal must come from CONTENT, not document length
RAW = [
    (10, "quantum computing is a branch of physics research"),
    (11, "football match results and league standings published today"),
    (12, "recipe for chocolate cake with butter and sugar"),
    (13, "quantum entanglement physics experiments run in the lab"),
    (14, "celebrity gossip and fashion week highlights published today"),
    (15, ""),  # no features → weight 0, excluded from selection
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TARGET, ["doc_id", "text"])
    r = spark.createDataFrame(RAW, ["doc_id", "text"])
    return t, r


def _twin_model(alpha: float = 1.0) -> dict[int, tuple[int, int, int]]:
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for _, txt in TARGET:
        for b, c in _buckets(txt).items():
            tc[b] = tc.get(b, 0) + c
    for _, txt in RAW:
        for b, c in _buckets(txt).items():
            rc[b] = rc.get(b, 0) + c
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for b in range(B):
        lr = math.log((tc.get(b, 0) + alpha) / (tt + alpha * B)) - math.log(
            (rc.get(b, 0) + alpha) / (rt + alpha * B)
        )
        # python round is half-even; Spark F.round is HALF_UP — compare with
        # the same HALF_UP rule (Decimal quantize would be overkill here)
        out[b] = (tc.get(b, 0), rc.get(b, 0), int(math.floor(lr * E6 + 0.5)) if lr >= 0 else -int(math.floor(-lr * E6 + 0.5)))
    return out


def test_feature_rows_match_twin(spark, frames):
    _, r = frames
    rows = ngram_feature_rows(r, n_buckets=B).collect()
    got = {}
    for row in rows:
        got.setdefault(row["doc_id"], {})[row["bucket"]] = row["cnt"]
    for did, txt in RAW:
        assert got.get(did, {}) == _buckets(txt), did


def test_fit_matches_numpy_twin_exactly(spark, frames):
    t, r = frames
    m = {row["bucket"]: (row["t_cnt"], row["r_cnt"], row["lr_e6"]) for row in fit_dsir_model(t, r, n_buckets=B).collect()}
    twin = _twin_model()
    assert set(m) == set(range(B))
    off = {b: (m[b], twin[b]) for b in range(B) if m[b] != twin[b]}
    # lr_e6 may differ by 1 micro-unit ONLY on an exact .5 boundary of the
    # double ln — assert exact first, fall back to ±1 with a loud message
    for b, (got, want) in off.items():
        assert got[:2] == want[:2], (b, got, want)
        assert abs(got[2] - want[2]) <= 1, (b, got, want)


def test_weights_are_exact_integer_sums(spark, frames):
    t, r = frames
    model = fit_dsir_model(t, r, n_buckets=B)
    w = {row["doc_id"]: (row["n_feats"], row["logw_e6"]) for row in dsir_weights(r, model, n_buckets=B).collect()}
    twin = _twin_model()
    for did, txt in RAW:
        bk = _buckets(txt)
        want = sum(c * twin[b][2] for b, c in bk.items())
        assert w[did] == (sum(bk.values()), want), did
    assert w[15] == (0, 0)  # empty doc


def test_selection_enriches_target_topic(spark, frames):
    t, r = frames
    model = fit_dsir_model(t, r, n_buckets=B)
    top = dsir_select(r, model, k=2, seed=7, n_buckets=B, temperature=0).collect()
    picked = {row["doc_id"] for row in top}
    assert picked == {10, 13}  # the two quantum/physics docs
    assert [row["rank"] for row in top] == [1, 2]


def test_gumbel_key_deterministic_and_seed_sensitive(spark):
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a = [r[0] for r in df.select(gumbel_e6(F.col("doc_id"), 7)).collect()]
    b = [r[0] for r in df.select(gumbel_e6(F.col("doc_id"), 7)).collect()]
    c = [r[0] for r in df.select(gumbel_e6(F.col("doc_id"), 8)).collect()]
    assert a == b
    assert a != c
    # Gumbel(0,1) mean is Euler-Mascheroni ~0.5772; loose sanity band
    mean = sum(a) / len(a) / E6
    assert 0.2 < mean < 1.0


def test_select_with_gumbel_is_sampling_not_argmax(spark, frames):
    t, r = frames
    model = fit_dsir_model(t, r, n_buckets=B)
    s7 = [row["doc_id"] for row in dsir_select(r, model, k=3, seed=7, n_buckets=B).collect()]
    s7b = [row["doc_id"] for row in dsir_select(r, model, k=3, seed=7, n_buckets=B).collect()]
    assert s7 == s7b  # deterministic per seed
    # across many seeds the union covers more than any single top-3 —
    # i.e. the Gumbel term genuinely perturbs the ranking
    seen = set()
    for seed in range(12):
        seen.update(
            row["doc_id"]
            for row in dsir_select(r, model, k=3, seed=seed, n_buckets=B).collect()
        )
    assert len(seen) > 3


def test_null_and_empty_text_safe(spark, frames):
    t, _ = frames
    r = spark.createDataFrame(
        [(1, None), (2, ""), (3, "quantum physics")], ["doc_id", "text"]
    )
    model = fit_dsir_model(t, r, n_buckets=B)
    w = {row["doc_id"]: row["logw_e6"] for row in dsir_weights(r, model, n_buckets=B).collect()}
    assert w[1] == 0 and w[2] == 0 and w[3] > 0
