"""BM25 retrieval (sparkdoc/retrieval.py): postings correctness, a
python-twin exact score check, and the ranking properties BM25 promises
(self-retrieval, rare-term preference, length normalization)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from sparkdoc.retrieval import E6, bm25_postings, bm25_topk

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox"),
    (2, "a lazy dog sleeps all day the dog dreams"),
    (3, "quantum computing with superconducting qubits"),
    (4, "the the the the the the the the"),  # pathological repetition
    (5, ""),  # empty doc: counts toward N, matches nothing
]


def _words(t: str) -> list[str]:
    import re

    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _py_bm25(query: str, k1: float = 1.2, b: float = 0.75) -> dict[int, int]:
    """Driver twin: integer micro-unit BM25 scores per doc."""
    toks = {d: _words(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = float(sum(len(w) for w in toks.values())) / n
    df: dict[str, int] = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    out: dict[int, int] = {}
    qterms = list(dict.fromkeys(_words(query)))
    for d, ws in toks.items():
        s = 0
        for t in qterms:
            tf = ws.count(t)
            if tf == 0 or t not in df:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfp = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len(ws) / avgdl))
            x = E6 * idf * tfp
            s += int(math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))
        if s:
            out[d] = s
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS])


def test_postings_tf_and_dl(spark, docs):
    rows = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in bm25_postings(docs).collect()
    }
    assert rows[("the", 4)] == (8, 8)
    assert rows[("dog", 2)] == (2, 9)
    assert rows[("fox", 1)] == (1, 4)
    assert ("the", 5) not in rows  # empty doc emits no postings


def test_scores_match_python_twin_exactly(spark, docs):
    q = spark.createDataFrame([Row(query_id=0, text="lazy dog")])
    got = {
        r["doc_id"]: r["score_e6"] for r in bm25_topk(docs, q, k=10).collect()
    }
    assert got == _py_bm25("lazy dog")  # integer-exact, no tolerance


def test_self_retrieval_rank1(spark, docs):
    q = spark.createDataFrame(
        [Row(query_id=3, text="quantum computing with superconducting qubits")]
    )
    top = bm25_topk(docs, q, k=1).collect()[0]
    assert top["doc_id"] == 3 and top["rank"] == 1


def test_rare_terms_outweigh_common(spark, docs):
    # 'qubits' appears only in doc 3; 'the' is everywhere — a query with
    # both must rank doc 3 over the 'the'-spam doc 4
    q = spark.createDataFrame([Row(query_id=0, text="the qubits")])
    ranks = {
        r["doc_id"]: r["rank"] for r in bm25_topk(docs, q, k=10).collect()
    }
    assert ranks[3] < ranks[4]


def test_duplicate_query_terms_count_once(spark, docs):
    q1 = spark.createDataFrame([Row(query_id=0, text="dog")])
    q2 = spark.createDataFrame([Row(query_id=0, text="dog dog dog")])
    s1 = {r["doc_id"]: r["score_e6"] for r in bm25_topk(docs, q1, k=10).collect()}
    s2 = {r["doc_id"]: r["score_e6"] for r in bm25_topk(docs, q2, k=10).collect()}
    assert s1 == s2


def test_deterministic_across_partitionings(spark, docs):
    q = spark.createDataFrame([Row(query_id=0, text="quick brown fox lazy dog")])
    a = sorted(map(tuple, bm25_topk(docs.repartition(1), q, k=10).collect()))
    b = sorted(map(tuple, bm25_topk(docs.repartition(8), q, k=10).collect()))
    assert a == b
