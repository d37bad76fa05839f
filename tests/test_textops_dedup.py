"""Text analytics + dedup + similarity sanity tests (small, one session).

Exactness vs the DuckDB oracle is checked by scripts/check_oracle.py and the
driver gate; these tests pin the algorithmic semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog. It was fast."),
        (2, "The quick brown fox jumps over the lazy dog. It was fast."),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog. it was FAST."),  # case-only dup
        (4, "Le chat est dans la maison et le jardin pour les amis."),
        (5, "a b a b a b a b a b a b a b a b a b a b"),  # repetitive
        (6, "completely different content about spark clusters and shuffles here."),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_dedup_normalized(docs):
    from sparkdoc.dedup_text import drop_exact_dups, exact_dup_groups

    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert sorted(groups[0]["doc_ids"]) == [1, 2, 3]  # lowercase+ws normalization folds all three
    kept = drop_exact_dups(docs)
    assert kept.count() == 4
    assert kept.filter(F.col("doc_id").isin(2, 3)).count() == 0


def test_minhash_identical_for_dups(docs):
    from sparkdoc.dedup_text import with_minhash

    sigs = {
        r["doc_id"]: tuple(r["sig"])
        for r in with_minhash(docs, k=8, out="sig").select("doc_id", "sig").collect()
    }
    assert sigs[1] == sigs[2] == sigs[3]
    assert sigs[1] != sigs[6]
    assert len(sigs[1]) == 8


def test_lsh_finds_dup_pair(docs):
    from sparkdoc.dedup_text import near_dup_pairs

    pairs = near_dup_pairs(docs, threshold=0.8).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    for r in pairs:
        assert r["jaccard"] == 1.0


def test_simhash_near_and_far(docs):
    from sparkdoc.dedup_text import simhash64, simhash_near_dups

    hashed = simhash64(docs)
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_dups(hashed, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0 and pairs.get((1, 3)) == 0
    assert (1, 6) not in pairs


def test_language_id(docs):
    from sparkdoc.textops import detect_language

    langs = {r["doc_id"]: r["l"] for r in docs.select("doc_id", detect_language(F.col("text")).alias("l")).collect()}
    assert langs[1] == "en"
    assert langs[4] == "fr"
    assert langs[5] == "und"


def test_quality_filter(docs):
    from sparkdoc.textops import quality_filter

    q = {r["doc_id"]: r for r in quality_filter(docs).collect()}
    assert q[1]["quality_keep"] == 1
    assert q[5]["quality_keep"] == 0  # repetitive: distinct fraction 0.1
    assert q[1]["ends_with_punct"] == 1


def test_rolling_fingerprints_overlap(docs):
    from sparkdoc.textops import rolling_fingerprints

    fps = {r["doc_id"]: set(r["fingerprints"]) for r in rolling_fingerprints(docs).collect()}
    assert fps[1] == fps[2]
    assert not (fps[1] & fps[6])


def test_brute_force_topk_selfsim(spark):
    from sparkdoc.similarity import brute_force_topk

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    res = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
    ranked = [r["neighbor_id"] for r in res.orderBy("rank").collect()]
    assert ranked == [1, 2, 3]


def test_lsh_topk_same_bucket_recovers_near(spark):
    from sparkdoc.similarity import lsh_topk

    rows = [(i, [float(i == j) + 0.01 * j for j in range(8)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    res = lsh_topk(emb, emb.filter(F.col("vec_id") < 2), k=3, n_bits=2)
    assert res.count() > 0
    assert res.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_ivf_topk(spark):
    from sparkdoc.similarity import ivf_topk

    rows = [(i, [float((i * 7 + j * 3) % 13) - 6.0 for j in range(16)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    res = ivf_topk(emb, emb.filter(F.col("vec_id") < 3), k=5, n_cells=8, nprobe=3, dim=16)
    got = res.groupBy("query_id").count().collect()
    assert len(got) == 3
    for r in got:
        assert 1 <= r["count"] <= 5
    assert res.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


def test_simhash_blocking_recall_complete(spark):
    """Pigeonhole property: EVERY pair within hamming <= max_hamming is found
    (blocks = max_hamming+1). Seeded corpus of bit-flipped variants."""
    import random

    from sparkdoc.dedup_text import simhash_near_dups

    rng = random.Random(42)
    base = rng.getrandbits(63)
    rows, truth = [], set()
    rows.append((0, base))
    for i in range(1, 40):
        flips = rng.randint(0, 8)
        h = base
        for _ in range(flips):
            h ^= 1 << rng.randrange(64)
        rows.append((i, h))
    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    hs = dict(rows)
    for a in hs:
        for b in hs:
            if a < b and ham(hs[a], hs[b]) <= 6:
                truth.add((a, b))
    df = spark.createDataFrame([(i, h - (1 << 64) if h >= (1 << 63) else h) for i, h in rows], "doc_id long, simhash long")
    got = {(r["a"], r["b"]) for r in simhash_near_dups(df, max_hamming=6).collect()}
    assert truth <= got
    # and nothing beyond the radius sneaks through the verify filter
    for a, b in got:
        assert ham(hs[a] & ((1 << 64) - 1), hs[b] & ((1 << 64) - 1)) <= 6


def test_embedding_near_dups_precision_and_subset(spark):
    """Every emitted pair truly has cos >= threshold (precision is exact),
    and the banded-LSH candidates are a subset of the exhaustive pair set;
    planted near-identical vectors land in the same bucket in every band and
    so are always recovered."""
    import math
    import random

    from sparkdoc.similarity import embedding_near_dups

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    rows = [(0, base), (1, [x + 1e-6 for x in base])]  # planted near-dup
    for i in range(2, 30):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_near_dups(df, threshold=0.9, n_bits=4, bands=4, dim=16).collect()

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    vecs = {i: unit(v) for i, v in rows}
    for r in got:
        true_cos = sum(x * y for x, y in zip(vecs[r["a"]], vecs[r["b"]]))
        assert true_cos >= 0.9 - 1e-9
    assert (0, 1) in {(r["a"], r["b"]) for r in got}


def test_embedding_near_dups_verify_impls_agree(spark):
    """The two cosine-verify paths (JVM HOF fold = oracle-parity default;
    Arrow-batched numpy = the billions-of-pairs scale path) must agree to
    the oracle's 6-decimal rounding on every candidate pair."""
    from pyspark.sql import functions as F

    from sparkdoc.similarity import embedding_near_dups

    rows = [(i, [float((i * 7 + j * 3) % 13) - 6.0 for j in range(16)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    hof = {
        (r["a"], r["b"]): round(r["cos"], 6)
        for r in embedding_near_dups(emb, 0.4, 4, 4, dim=16).collect()
    }
    np_ = {
        (r["a"], r["b"]): round(r["cos"], 6)
        for r in embedding_near_dups(emb, 0.4, 4, 4, dim=16, verify_impl="numpy").collect()
    }
    assert hof == np_ and len(hof) > 0


def test_hyperplane_bucket_rejects_overwide_vectors(spark):
    """A vector wider than dim must fail fast, not silently bucket to 0
    (which would degenerate the LSH join to all-pairs)."""
    import pytest
    from pyspark.sql import functions as F

    from sparkdoc.similarity import hyperplane_bucket

    df = spark.createDataFrame(
        [(1, [0.1] * 80)], "vec_id int, embedding array<double>"
    )
    with pytest.raises(Exception, match="exceeds dim"):
        df.select(hyperplane_bucket(F.col("embedding"), n_bits=2, dim=64)).collect()


def test_ivf_assign_requires_dim(spark):
    import pytest

    from sparkdoc.similarity import ivf_assign

    df = spark.createDataFrame([(1, [0.1] * 8)], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError, match="dim is required"):
        ivf_assign(df)


def test_zero_vector_never_ranks(spark):
    """A zero embedding normalizes to NaN, and Spark sorts NaN above every
    real cosine — _with_unit must drop zero/null-norm rows so they never
    appear as rank-1 neighbors."""
    from pyspark.sql import functions as F

    from sparkdoc.similarity import brute_force_topk

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    q = spark.createDataFrame([(10, [1.0, 0.0])], "vec_id int, embedding array<double>")
    rows = brute_force_topk(corpus, q, k=3).collect()
    ids = [r["neighbor_id"] for r in rows]
    assert 3 not in ids and ids[0] == 1
    assert all(r["cos"] == r["cos"] for r in rows)  # no NaN survives


def test_simhash_near_dups_exact_radius_zero(spark):
    """max_hamming=0 (single 64-bit block) must not overflow the band mask —
    it returns exactly the hamming==0 pairs."""
    from sparkdoc.dedup_text import simhash_near_dups

    df = spark.createDataFrame(
        [("a", 7), ("b", 7), ("c", 8)], "doc_id string, simhash long"
    )
    pairs = {(r["a"], r["b"]) for r in simhash_near_dups(df, max_hamming=0).collect()}
    assert pairs == {("a", "b")}


def test_minhash_lsh_shingleless_docs_never_pair(spark):
    """Docs with no shingles (short/empty/null text) share the all-'' MinHash
    signature — banding them would pair every such doc with every other."""
    import pytest

    from sparkdoc.dedup_text import minhash_lsh_candidates

    df = spark.createDataFrame(
        [("a", "hi"), ("b", "yo"), ("c", None),
         ("d", "the quick brown fox jumps over the lazy dog every day"),
         ("e", "the quick brown fox jumps over the lazy dog every night")],
        "doc_id string, text string",
    )
    pairs = {(r["a"], r["b"]) for r in minhash_lsh_candidates(df, k=16, bands=4).collect()}
    assert pairs == {("d", "e")}  # no short-doc cross-product
    with pytest.raises(ValueError, match="multiple of"):
        minhash_lsh_candidates(df, k=16, bands=20)


def test_drop_exact_dups_null_text_passthrough(spark):
    """NULL-text docs must not be treated as duplicates of each other."""
    from sparkdoc.dedup_text import drop_exact_dups, exact_dup_groups

    df = spark.createDataFrame(
        [("a", None), ("b", None), ("c", "same"), ("d", "same")],
        "doc_id string, text string",
    )
    kept = {r["doc_id"] for r in drop_exact_dups(df).collect()}
    assert kept == {"a", "b", "c"}  # both nulls survive; one of c/d dropped
    assert exact_dup_groups(df).count() == 1  # only the real group


def test_rolling_fingerprints_multibyte_short_chars(spark):
    """A text short in CHARACTERS but >= window BYTES must fingerprint (byte
    windows, byte gate)."""
    from sparkdoc.textops import rolling_fingerprints

    text = "漢字の文章テスト例語句集合体系名詞動詞形容詞副詞"  # 24 chars, 72 bytes
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    fps = rolling_fingerprints(df, window=16).collect()[0]["fingerprints"]
    assert fps  # 72 utf-8 bytes -> 57 windows; min-sampling keeps some


# --- exact substring dedup ---------------------------------------------------------


def _substr_corpus(spark):
    shared = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        "nu xi omicron pi rho sigma tau"
    )  # 19 words: 8 windows at k=12, merging into one island per occurrence
    return spark.createDataFrame(
        [
            (0, "first doc holds the canonical copy " + shared),
            (1, shared + " plus trailing unique words here"),
            (2, "lead in words " + shared + " closing remark"),
            (3, "completely unrelated text with no duplicate window at all in it anywhere truly"),
            (4, "self repeat " + "a b c d e f g h i j k l " * 2 + "done"),
            (5, "tiny"),
            (6, None),
        ],
        "doc_id long, text string",
    )


def test_substring_dup_spans_keep_first_and_merge(spark):
    """Keep-first semantics + interval merge: the shared 19-word passage is
    ONE merged span per later occurrence; the winner doc is never marked;
    an in-document repeat is caught; short/NULL docs produce nothing."""
    from sparkdoc.dedup_text import substring_dup_spans

    rows = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_dup_spans(_substr_corpus(spark), k=12).collect()
    }
    # doc 0 (winner, min (id, start)) absent; doc 1 span covers words [0,19);
    # doc 2 covers [3,22); doc 4 second copy of the 12-word block at [14,26)
    assert rows == {(1, 0, 19), (2, 3, 22), (4, 14, 26)}


def test_substring_dedup_trim_and_stats(spark):
    from sparkdoc.dedup_text import substring_dedup

    out = {r["doc_id"]: r for r in substring_dedup(_substr_corpus(spark), k=12).collect()}
    assert out[1]["text"] == "plus trailing unique words here"
    assert out[2]["text"] == "lead in words closing remark"
    assert out[1]["n_dup_words"] == 19 and out[1]["n_words"] == 24
    assert abs(out[1]["dup_frac"] - 19 / 24) < 1e-12
    # winner doc 0 untouched (token-normalized join of its own words)
    assert out[0]["n_dup_words"] == 0 and out[0]["text"].startswith("first doc holds")
    # short + NULL docs come back whole with zero dup mass; NULL text STAYS
    # NULL (failed-extraction marker — rewriting it to '' would let a later
    # exact-dup pass mass-delete every failed doc as one fingerprint group)
    assert out[5]["text"] == "tiny" and out[5]["dup_frac"] == 0.0
    assert out[6]["n_words"] == 0 and out[6]["text"] is None


def test_substring_dedup_adjacent_islands_merge(spark):
    """Two duplicated passages separated by < k words in the source doc can
    yield ADJACENT dup windows — the islands pass must merge touching
    intervals (start == running max end) rather than emit two spans."""
    from sparkdoc.dedup_text import substring_dup_spans

    p1 = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    p2 = "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11 v12"
    df = spark.createDataFrame(
        [(0, p1), (1, p2), (2, p1 + " " + p2)],
        "doc_id long, text string",
    )
    rows = [
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_dup_spans(df, k=12).collect()
    ]
    assert rows == [(2, 0, 24)]  # one merged span, not [0,12) + [12,24)


def test_dup_group_labels_string_ids(spark):
    """ANSI regression: the convergence probe must not sum the (string) id
    column — a 5-chain of string doc ids must collapse to ONE component."""
    from pyspark.sql import Row

    from sparkdoc.dedup_text import dup_group_labels

    chain = [("d-a", "d-b"), ("d-b", "d-c"), ("d-c", "d-d"), ("d-d", "d-e")]
    pairs = spark.createDataFrame([Row(a=a, b=b) for a, b in chain])
    got = {r["doc_id"]: r["group_id"] for r in dup_group_labels(pairs).collect()}
    assert set(got.values()) == {"d-a"}  # one component, min-id label
    assert len(got) == 5


def test_simhash_contentless_docs_never_pair(spark):
    """Sentinel simhash 0 (NULL/empty/no-word text) is excluded from
    blocking — contentless docs must not pair all-with-all at hamming 0."""
    from pyspark.sql import Row

    from sparkdoc.dedup_text import simhash64, simhash_near_dups

    docs = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text=""), Row(doc_id=3, text="?!"),
         Row(doc_id=4, text="real content words here"), Row(doc_id=5, text="real content words here")]
    )
    pairs = simhash_near_dups(simhash64(docs), max_hamming=3).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert got == {(4, 5)}  # only the real near-dup pair


def test_paragraph_dedup_preserves_null_text(spark):
    from pyspark.sql import Row

    from sparkdoc.dedup_text import paragraph_dedup

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="para one\n\npara two"), Row(doc_id=2, text=None)]
    )
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(docs).collect()}
    assert out[2] is None and out[1] is not None


def test_exact_dup_groups_caps_id_list(spark):
    from pyspark.sql import Row

    from sparkdoc.dedup_text import exact_dup_groups

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="same text body every time") for i in range(50)]
    )
    row = exact_dup_groups(docs, max_ids=10).collect()[0]
    assert row["n_docs"] == 50  # TRUE count survives the cap
    assert len(row["doc_ids"]) == 10 and row["keep_id"] == 0
