"""Hashed bag-of-words logistic regression: distributed training vs a numpy
twin, separability acceptance, and exact integer inference."""

import hashlib

import numpy as np
import pytest


GOOD = [
    "excellent careful verified thorough prose with citations and structure",
    "well researched article citing primary sources and careful analysis",
    "thorough technical documentation with verified examples and structure",
    "careful verified reporting with primary citations and clear prose",
]
SPAM = [
    "click buy pills casino winner free prize money now",
    "free casino bonus click winner pills buy now money",
    "winner prize click free money casino pills buy bonus",
    "buy now free pills winner casino prize bonus click",
]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(SPAM)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _py_bucket(word: str, n_buckets: int, salt: str = "") -> int:
    return int(hashlib.md5((word + salt).encode()).hexdigest()[:15], 16) % n_buckets


def _py_feats(texts, n_buckets):
    import re

    out = []
    for t in texts:
        v = np.zeros(n_buckets)
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                v[_py_bucket(w, n_buckets)] += 1
        out.append(v)
    return np.array(out)


def test_train_separable_and_score_roundtrip(spark):
    """Training on a linearly separable corpus reaches 100% training
    accuracy, and the quantized integer scorer reproduces the decisions."""
    from sparkdoc.classifier import quantize_weights, score_quantized, train_logreg

    df = _labeled(spark)
    w, b = train_logreg(df, "label", n_buckets=256, iters=25, lr=2.0)
    wi, bi = quantize_weights(w, b)
    got = {r["doc_id"]: r["label"] for r in score_quantized(df, wi, bi).collect()}
    want = {r["doc_id"]: r["label"] for r in df.collect()}
    assert got == want


def test_train_matches_numpy_twin(spark):
    """Three GD iterations in Spark equal the same math in numpy (within
    float-summation-order tolerance)."""
    from sparkdoc.classifier import train_logreg

    df = _labeled(spark)
    n_buckets, iters, lr, l2 = 64, 3, 2.0, 1e-6
    w, b = train_logreg(df, "label", n_buckets=n_buckets, iters=iters, lr=lr, l2=l2)

    X = _py_feats(GOOD + SPAM, n_buckets)
    y = np.array([1.0] * len(GOOD) + [0.0] * len(SPAM))
    n = len(y)
    w2 = np.zeros(n_buckets)
    b2 = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w2 + b2)))
        r = p - y
        w2 -= lr * (X.T @ r / n + l2 * w2)
        b2 -= lr * (r.sum() / n)
    assert np.allclose(w, w2, atol=1e-9)
    assert abs(b - b2) < 1e-9


def test_score_quantized_exact_margin(spark):
    """Integer margins are exact: recomputed by hand through the md5 bucket
    rule; wordless/NULL docs score the bias alone."""
    from sparkdoc.classifier import score_quantized

    n_buckets = 32
    weights = [(i * 7919) % 401 - 200 for i in range(n_buckets)]
    bias = 37
    df = spark.createDataFrame(
        [(0, "alpha beta alpha"), (1, ""), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["margin_e6"] for r in score_quantized(df, weights, bias).collect()}
    expect0 = bias + 2 * weights[_py_bucket("alpha", n_buckets)] + weights[
        _py_bucket("beta", n_buckets)
    ]
    assert got == {0: expect0, 1: bias, 2: bias}


def test_score_weights_df_requires_n_buckets(spark):
    from sparkdoc.classifier import score_quantized
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    wdf = spark.range(8).select(F.col("id").alias("bucket"), F.lit(1).alias("w"))
    with pytest.raises(ValueError, match="n_buckets"):
        score_quantized(df, None, 0, weights_df=wdf)
