"""Bloom-filter membership sketch: the no-false-negative contract (the
property the exact delta-admission path relies on), the fpp bound, and the
bloom-pruned `delta_new_docs` equivalence to the plain anti-join."""

import pyspark.sql.functions as F
import pytest

from sparkdoc.incremental import build_exact_index, delta_new_docs
from sparkdoc.sketches import BloomFilter, bloom_build, bloom_might_contain


def _vals(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "v string")


def test_bloom_no_false_negatives(spark):
    members = [f"member-{i}" for i in range(2000)]
    bf = bloom_build(_vals(spark, members), "v", n_expected=2000, fpp=0.01)
    probed = bloom_might_contain(_vals(spark, members), "v", bf).collect()
    assert all(r["might_contain"] for r in probed)  # every insert probes True


def test_bloom_fpp_bound(spark):
    members = [f"member-{i}" for i in range(2000)]
    others = [f"other-{i}" for i in range(4000)]
    bf = bloom_build(_vals(spark, members), "v", n_expected=2000, fpp=0.01)
    hits = (
        bloom_might_contain(_vals(spark, others), "v", bf)
        .filter(F.col("might_contain"))
        .count()
    )
    # expectation 1% of 4000 = 40; allow generous slack, but far below 100%
    assert hits <= 4000 * 0.01 * 4


def test_bloom_null_probes_null(spark):
    bf = bloom_build(_vals(spark, ["a"]), "v", n_expected=1, fpp=0.01)
    rows = bloom_might_contain(
        spark.createDataFrame([("a",), (None,)], "v string"), "v", bf
    ).collect()
    got = {r["v"]: r["might_contain"] for r in rows}
    assert got["a"] is True and got[None] is None


def test_bloom_empty_build_rejects_everything(spark):
    bf = bloom_build(_vals(spark, []), "v", n_expected=10, fpp=0.01)
    rows = bloom_might_contain(_vals(spark, ["x", "y"]), "v", bf).collect()
    assert not any(r["might_contain"] for r in rows)


def test_bloom_roundtrip_params():
    m, k = BloomFilter.params(1000, 0.01)
    assert m % 8 == 0 and k >= 1
    bf = BloomFilter(b"\x00" * (m // 8), m, k)
    bf2 = BloomFilter.from_dict(bf.to_dict())
    assert (bf2.bits, bf2.m, bf2.k) == (bf.bits, bf.m, bf.k)


@pytest.mark.parametrize("use_bloom", [False, True])
def test_delta_new_docs_matches_anti_join(spark, use_bloom):
    corpus = spark.createDataFrame(
        [(i, f"corpus text number {i} alpha beta") for i in range(200)],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        # 50 exact twins of corpus docs (different ids), 150 fresh, 1 NULL
        [(1000 + i, f"corpus text number {i} alpha beta") for i in range(50)]
        + [(2000 + i, f"fresh delta text {i} gamma") for i in range(150)]
        + [(9999, None)],
        "doc_id long, text string",
    )
    idx = build_exact_index(corpus)
    bloom = bloom_build(idx, "fp", n_expected=200, fpp=0.01) if use_bloom else None
    got = sorted(
        r["doc_id"] for r in delta_new_docs(delta, idx, bloom=bloom).collect()
    )
    assert got == sorted(list(range(2000, 2150)) + [9999])


def test_delta_new_docs_bloom_prunes_join_traffic(spark):
    """The operator's reason to exist: probe-False docs never reach the
    anti-join. Verified on the probe column directly — on a fresh-heavy
    delta most docs clear via the sketch."""
    corpus = spark.createDataFrame(
        [(i, f"corpus text number {i}") for i in range(500)],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(5000 + i, f"fresh never seen {i}") for i in range(500)],
        "doc_id long, text string",
    )
    idx = build_exact_index(corpus)
    bloom = bloom_build(idx, "fp", n_expected=500, fpp=0.01)
    from sparkdoc.textops import doc_fingerprint

    probed = bloom_might_contain(
        delta.withColumn("fp", doc_fingerprint(F.col("text"))), "fp", bloom, out="maybe"
    )
    n_maybe = probed.filter(F.col("maybe")).count()
    assert n_maybe <= 500 * 0.01 * 4  # ~fpp of a fully-fresh delta survives
    # and correctness is unaffected: everything is admitted
    assert delta_new_docs(delta, idx, bloom=bloom).count() == 500


def test_bloom_null_in_batch_keeps_member_hits(spark):
    """Precision regression: a NULL anywhere in a probe batch used to turn
    the whole batch's int64 hashes into float64 (bits lost past 2^53 ->
    wrong positions -> FALSE NEGATIVES). Members must still probe True in
    a batch that contains NULLs."""
    members = [f"member-{i}" for i in range(500)]
    bf = bloom_build(_vals(spark, members), "v", n_expected=500, fpp=0.01)
    rows = [(m,) for m in members] + [(None,)] * 5
    probed = bloom_might_contain(
        spark.createDataFrame(rows, "v string").coalesce(1), "v", bf
    ).collect()
    got = {r["v"]: r["might_contain"] for r in probed}
    assert all(got[m] for m in members)  # no false negatives
    assert got[None] is None


def test_heavy_hitters_on_long_column(spark):
    """Non-string columns (user ids) must work — pass 1 emits a string
    summary schema, so the input is cast up front."""
    from sparkdoc.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(i % 3,) for i in range(300)] + [(99,)], "user_id long"
    )
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "user_id", k=4).collect()}
    assert got["0"] == 100 and got["1"] == 100 and got["2"] == 100
