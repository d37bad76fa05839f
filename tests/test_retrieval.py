"""BM25 retrieval (sparkdoc/retrieval.py): postings correctness, a
python-twin exact score check, and the ranking properties BM25 promises
(self-retrieval, rare-term preference, length normalization)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql.functions import col as F_col

from sparkdoc.retrieval import E6, bm25_postings, bm25_topk, rrf_fuse

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


def test_max_df_frac_prunes_common_terms(spark, docs):
    # 'the' has df 4/6 ≈ 0.67 — pruning at 0.5 must score exactly as if the
    # query were only its rare term; default (None) keeps the full score
    q = spark.createDataFrame([Row(query_id=0, text="the qubits")])
    pruned = {
        r["doc_id"]: r["score_e6"]
        for r in bm25_topk(docs, q, k=10, max_df_frac=0.5).collect()
    }
    assert pruned == _py_bm25("qubits")
    full = {r["doc_id"]: r["score_e6"] for r in bm25_topk(docs, q, k=10).collect()}
    assert full == _py_bm25("the qubits") and full != pruned


def test_prebuilt_postings_match_inline(spark, docs):
    q = spark.createDataFrame([Row(query_id=0, text="lazy dog")])
    p = bm25_postings(docs)
    a = sorted(map(tuple, bm25_topk(docs, q, k=10).collect()))
    b = sorted(map(tuple, bm25_topk(docs, q, k=10, postings=p).collect()))
    assert a == b


# --- durable inverted index (build + partition-pruned query) ----------------


def test_index_roundtrip_matches_inline_exactly(spark, docs, tmp_path):
    from sparkdoc.retrieval import bm25_query_index, bm25_write_index

    idx = str(tmp_path / "bm25_idx")
    manifest = bm25_write_index(docs, idx, n_buckets=8)
    assert manifest["n_docs"] == len(DOCS)
    q = spark.createDataFrame(
        [
            Row(query_id=0, text="lazy dog"),
            Row(query_id=1, text="quantum computing with superconducting qubits"),
            Row(query_id=2, text="the quick brown fox"),
            Row(query_id=3, text="nothing matches this zzz"),
        ]
    )
    via_index = sorted(map(tuple, bm25_query_index(spark, idx, q, k=10).collect()))
    inline = sorted(map(tuple, bm25_topk(docs, q, k=10).collect()))
    assert via_index == inline  # bit-identical scores, ranks, ties


def test_index_query_prunes_partitions(spark, docs, tmp_path):
    import io
    from contextlib import redirect_stdout

    from sparkdoc.retrieval import bm25_query_index, bm25_write_index, term_bucket

    idx = str(tmp_path / "bm25_idx2")
    bm25_write_index(docs, idx, n_buckets=16)
    q = spark.createDataFrame([Row(query_id=0, text="qubits")])
    res = bm25_query_index(spark, idx, q, k=5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    # the postings scan must carry a real partition filter naming the ONE
    # bucket 'qubits' hashes to — checked inside the PartitionFilters
    # clause itself, not anywhere in the plan string (small ints appear
    # everywhere in plans)
    b = term_bucket("qubits", 16)
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines, plan
    import re

    # single probed bucket renders as equality: "(bucket#39 = 3)"; multiple
    # as "bucket#39 IN (3,7)" — accept either, but the value must be THE
    # computed bucket, inside the partition-filter clause
    pat = re.compile(rf"bucket#\d+ = {b}\)|bucket#\d+ IN \([^)]*\b{b}\b")
    assert any(pat.search(ln) for ln in pf_lines), pf_lines
    top = res.collect()
    assert top and top[0]["doc_id"] == 3 and top[0]["rank"] == 1


def test_index_bucket_expr_matches_driver_twin(spark):
    from sparkdoc.retrieval import _term_bucket_expr, term_bucket

    terms = ["the", "qubits", "dog", "zebra", "", "ünïcode", "a" * 100]
    df = spark.createDataFrame([Row(term=t) for t in terms]).select(
        "term", _term_bucket_expr(F_col("term"), 64).alias("b")
    )
    got = {r["term"]: r["b"] for r in df.collect()}
    assert got == {t: term_bucket(t, 64) for t in terms}


_word = __import__("hypothesis").strategies.text(
    alphabet="abcxyz012", min_size=1, max_size=6
)
_doc_text = __import__("hypothesis").strategies.lists(
    _word, min_size=0, max_size=12
).map(" ".join)


@pytest.mark.parametrize("n_buckets", [1, 3, 16])
def test_index_matches_inline_property(spark, tmp_path, n_buckets):
    """Randomized corpora (hypothesis-generated, fixed seed via derandomize
    profile of the suite): index-path scores must equal inline bm25_topk
    bit-for-bit at any bucket count — including n_buckets=1 (no pruning
    possible) and buckets ≫ vocab (most partitions empty)."""
    import tempfile

    from hypothesis import HealthCheck, given, settings

    from sparkdoc.retrieval import bm25_query_index, bm25_write_index

    @settings(
        max_examples=4,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=__import__("hypothesis").strategies.lists(_doc_text, min_size=1, max_size=6))
    def run(texts):
        d = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
        )
        q = spark.createDataFrame(
            [Row(query_id=i, text=" ".join(t.split()[:3])) for i, t in enumerate(texts)]
        )
        with tempfile.TemporaryDirectory(dir=str(tmp_path)) as idx:
            bm25_write_index(d, idx, n_buckets=n_buckets)
            via = sorted(map(tuple, bm25_query_index(spark, idx, q, k=5).collect()))
        inline = sorted(map(tuple, bm25_topk(d, q, k=5).collect()))
        assert via == inline

    run()


def test_index_incremental_update_equals_fresh_union(spark, docs, tmp_path):
    """bm25_update_index: index(A) + update(B) must score bit-identically
    to a fresh index over A ∪ B — df, N and avgdl all absorb the delta."""
    from sparkdoc.retrieval import (
        bm25_query_index,
        bm25_update_index,
        bm25_write_index,
    )

    a = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS[:3]])
    b_delta = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS[3:]])
    union = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in DOCS])

    inc, fresh = str(tmp_path / "inc"), str(tmp_path / "fresh")
    bm25_write_index(a, inc, n_buckets=8)
    m = bm25_update_index(b_delta, inc)
    assert m["n_docs"] == len(DOCS)
    bm25_write_index(union, fresh, n_buckets=8)

    q = spark.createDataFrame(
        [Row(query_id=0, text="lazy dog"), Row(query_id=1, text="the qubits")]
    )
    got = sorted(map(tuple, bm25_query_index(spark, inc, q, k=10).collect()))
    want = sorted(map(tuple, bm25_query_index(spark, fresh, q, k=10).collect()))
    assert got == want and got  # nonempty, bit-identical


def test_index_update_rejects_schema_drift(spark, docs, tmp_path):
    from sparkdoc.retrieval import bm25_update_index, bm25_write_index

    idx = str(tmp_path / "idx")
    bm25_write_index(docs, idx, n_buckets=4)
    drift = spark.createDataFrame([Row(doc_id="str-id", text="hello world")])
    with pytest.raises(ValueError, match="doc_id type"):
        bm25_update_index(drift, idx)


def test_index_query_empty_terms(spark, docs, tmp_path):
    from sparkdoc.retrieval import bm25_query_index, bm25_write_index

    idx = str(tmp_path / "bm25_idx3")
    bm25_write_index(docs, idx, n_buckets=4)
    q = spark.createDataFrame([Row(query_id=0, text="???!!!")])  # no words
    assert bm25_query_index(spark, idx, q, k=5).count() == 0


# --- reciprocal-rank fusion -------------------------------------------------


def _rank_df(spark, rows):
    return spark.createDataFrame(
        [Row(query_id=q, doc_id=d, rank=r) for q, d, r in rows]
    )


def _py_rrf(rankings, k_rrf=60):
    """Driver twin: integer nano-unit RRF scores per (query, doc)."""
    out: dict[tuple[int, int], list[int]] = {}
    for rows in rankings:
        for q, d, r in rows:
            x = 1e9 / (k_rrf + r)
            out.setdefault((q, d), []).append(int(math.floor(x + 0.5)))
    return {k: (sum(v), len(v)) for k, v in out.items()}


def test_rrf_matches_python_twin_exactly(spark):
    a = [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1)]
    b = [(0, 11, 1), (0, 13, 2), (1, 21, 1), (1, 20, 2)]
    fused = rrf_fuse([_rank_df(spark, a), _rank_df(spark, b)], topk=10).collect()
    got = {(r["query_id"], r["doc_id"]): (r["rrf_e9"], r["n_systems"]) for r in fused}
    assert got == _py_rrf([a, b])  # integer-exact, no tolerance


def test_rrf_consensus_beats_single_system_top(spark):
    # doc 11: rank 2 in both systems; docs 10/13: rank 1 in one system only.
    # 2/(60+2) > 1/(60+1), so the consensus doc must fuse to rank 1.
    a = [(0, 10, 1), (0, 11, 2)]
    b = [(0, 13, 1), (0, 11, 2)]
    fused = rrf_fuse([_rank_df(spark, a), _rank_df(spark, b)], topk=1).collect()
    assert len(fused) == 1 and fused[0]["doc_id"] == 11


def test_rrf_tie_breaks_on_doc_id(spark):
    a = [(0, 5, 1), (0, 9, 2)]
    b = [(0, 9, 1), (0, 5, 2)]  # symmetric: identical fused scores
    fused = rrf_fuse([_rank_df(spark, a), _rank_df(spark, b)], topk=2).collect()
    by_rank = {r["rank"]: r["doc_id"] for r in fused}
    assert by_rank == {1: 5, 2: 9}


def test_rrf_requires_two_rankings(spark):
    with pytest.raises(ValueError):
        rrf_fuse([_rank_df(spark, [(0, 1, 1)])])


def test_rrf_deterministic_across_partitionings(spark):
    a = _rank_df(spark, [(q, d, r) for q in range(4) for r, d in enumerate(range(10 + q, 20 + q), 1)])
    b = _rank_df(spark, [(q, d, r) for q in range(4) for r, d in enumerate(range(15 + q, 25 + q), 1)])
    x = sorted(map(tuple, rrf_fuse([a.repartition(1), b.repartition(1)], topk=8).collect()))
    y = sorted(map(tuple, rrf_fuse([a.repartition(8), b.repartition(3)], topk=8).collect()))
    assert x == y


def test_hybrid_bm25_plus_dense_end_to_end(spark, docs):
    # lexical side: real BM25; dense side: a stand-in ANN ranking that
    # prefers doc 3. The fused list must surface doc 3 even though the
    # query's words never mention qubits (the point of hybrid retrieval).
    q = spark.createDataFrame([Row(query_id=0, text="lazy dog")])
    lex = bm25_topk(docs, q, k=5)
    dense = _rank_df(spark, [(0, 3, 1), (0, 2, 2)])
    fused = rrf_fuse([lex, dense], topk=10).collect()
    got = {r["doc_id"] for r in fused}
    assert 3 in got and 2 in got
    # doc 2 ('lazy dog' twice) is in both systems -> must outrank doc 3
    ranks = {r["doc_id"]: r["rank"] for r in fused}
    assert ranks[2] < ranks[3]


def test_null_text_docs_do_not_poison_stats(spark, tmp_path):
    """NULL-text docs contribute dl=0 (not size(NULL)=-1) to n_docs/sum_dl:
    the manifest must record the exact word totals, and in-process scoring
    must match the index path on the same corpus."""
    import json

    from sparkdoc.io import hadoop_read_text
    from sparkdoc.retrieval import bm25_query_index, bm25_topk, bm25_write_index

    d = spark.createDataFrame(
        [Row(doc_id=1, text="cat dog"), Row(doc_id=2, text="dog fish bird cat"),
         Row(doc_id=3, text=None)]
    )
    idx = str(tmp_path / "nidx")
    man = bm25_write_index(d, idx, n_buckets=4)
    assert man["n_docs"] == 3 and man["sum_dl"] == 6
    assert json.loads(hadoop_read_text(spark, idx + "/manifest.json"))["sum_dl"] == 6
    q = spark.createDataFrame([Row(query_id=0, text="cat")])
    got = sorted(map(tuple, bm25_query_index(spark, idx, q, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(d, q, k=5).collect()))
    assert got == want and got


def test_index_update_accepts_nullability_drift(spark, tmp_path):
    """A type-identical delta whose columns differ only in NULLABILITY (e.g.
    range-derived vs parquet-read ids) must be accepted — StructType
    equality used to reject it with two identical-looking schema strings."""
    from pyspark.sql import functions as F

    from sparkdoc.retrieval import bm25_query_index, bm25_update_index, bm25_write_index

    base = spark.range(2).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta").alias("text")
    )
    idx = str(tmp_path / "nbidx")
    bm25_write_index(base, idx, n_buckets=4)
    # parquet round-trip flips nullability; the range-derived delta is non-null
    delta = spark.range(10, 12).select(
        F.col("id").alias("doc_id"), F.lit("beta gamma").alias("text")
    )
    man = bm25_update_index(delta, idx)
    assert man["n_docs"] == 4 and man["sum_dl"] == 8
    q = spark.createDataFrame([Row(query_id=0, text="gamma")])
    hits = bm25_query_index(spark, idx, q, k=5).collect()
    assert {r["doc_id"] for r in hits} == {10, 11}


def test_index_update_pending_marker_refuses(spark, tmp_path):
    """A leftover update_pending.json marks a mid-update crash: the next
    update must refuse instead of silently double-appending."""
    from sparkdoc.io import hadoop_write_text
    from sparkdoc.retrieval import bm25_update_index, bm25_write_index

    d = spark.createDataFrame([Row(doc_id=1, text="cat dog")])
    idx = str(tmp_path / "pidx")
    bm25_write_index(d, idx, n_buckets=4)
    hadoop_write_text(spark, idx + "/update_pending.json", "{}")
    with pytest.raises(RuntimeError, match="update_pending"):
        bm25_update_index(spark.createDataFrame([Row(doc_id=2, text="x y")]), idx)


def test_bm25_topk_manifest_stats_skip_corpus_scan(spark, docs):
    """Passing (n_docs, sum_dl) manifest literals with a prebuilt postings
    frame must score bit-identically to the self-computed stats path."""
    from pyspark.sql import functions as F

    from sparkdoc.retrieval import bm25_postings, bm25_topk
    from sparkdoc.textops import word_count

    q = spark.createDataFrame([Row(query_id=0, text="lazy dog")])
    posts = bm25_postings(docs)
    stats = docs.select(word_count(F.col("text")).alias("dl")).agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    want = sorted(map(tuple, bm25_topk(docs, q, k=5).collect()))
    got = sorted(
        map(
            tuple,
            bm25_topk(
                docs, q, k=5, postings=posts,
                n_docs=int(stats["n"]), sum_dl=int(stats["s"]),
            ).collect(),
        )
    )
    assert got == want and got
    with pytest.raises(ValueError, match="together"):
        bm25_topk(docs, q, k=5, n_docs=10)


def test_score_quantized_requires_some_weights(spark):
    from sparkdoc.classifier import score_quantized

    d = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError, match="weights"):
        score_quantized(d, None, 0)
