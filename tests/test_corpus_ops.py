"""paragraph_dedup, cap_per_group, downweight_frequent_groups, tfidf_top_terms."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _bucket(key, salt=""):
    h = hashlib.md5((str(key) + salt).encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


# --- paragraph_dedup -------------------------------------------------------------


def test_paragraph_dedup_first_occurrence_wins(spark):
    from sparkdoc.dedup_text import paragraph_dedup

    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"alpha one\n\n{boiler}\n\nbody of doc one"),
        (2, f"beta two\n\n{boiler}\n\nbody of doc two"),
        (3, f"{boiler}\n\ngamma three"),
    ]
    out = {
        r.doc_id: r
        for r in paragraph_dedup(spark.createDataFrame(rows, "doc_id: long, text: string")).collect()
    }
    # doc 1 is first (min doc_id): keeps all 3 paragraphs
    assert out[1].text == rows[0][1]
    assert (out[1].n_paras, out[1].n_kept) == (3, 3)
    # docs 2/3 lose the boilerplate paragraph but keep their own
    assert out[2].text == "beta two\n\nbody of doc two"
    assert (out[2].n_paras, out[2].n_kept) == (3, 2)
    assert out[3].text == "gamma three"
    assert (out[3].n_paras, out[3].n_kept) == (2, 1)


def test_paragraph_dedup_normalization_and_blank_paras(spark):
    from sparkdoc.dedup_text import paragraph_dedup

    rows = [
        (1, "Hello   World\n\nunique a"),
        (2, "hello world\n\nunique b"),  # same normalized key (case + ws)
        (3, "   \n\n\n\n  "),  # only blank paragraphs -> empty doc retained
    ]
    out = {
        r.doc_id: r
        for r in paragraph_dedup(spark.createDataFrame(rows, "doc_id: long, text: string")).collect()
    }
    assert out[1].text == "Hello   World\n\nunique a"  # original text preserved
    assert out[2].text == "unique b"
    assert (out[3].text, out[3].n_paras, out[3].n_kept) == ("", 0, 0)


def test_paragraph_dedup_within_doc_and_group_scope(spark):
    from sparkdoc.dedup_text import paragraph_dedup

    rows = [
        (1, "same para\n\nsame para", "d1"),
        (2, "same para\n\nother", "d2"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    # corpus-wide: doc1 keeps one copy (its own first), doc2 loses it
    corpus = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert corpus[1].text == "same para" and corpus[1].n_kept == 1
    assert corpus[2].text == "other"
    # group-scoped: doc2 is alone in d2, keeps its copy
    grouped = {r.doc_id: r for r in paragraph_dedup(df, group_col="source").collect()}
    assert grouped[2].text == "same para\n\nother"


# --- cap_per_group ---------------------------------------------------------------


def _skewed(spark, n=120):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 4 != 0, F.lit("hub")).otherwise(
                F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
            ).alias("source"),
        )
    )


def test_cap_per_group_matches_hash_rule(spark):
    from sparkdoc.filters import cap_per_group

    df = _skewed(spark)
    got = {(r.doc_id, r.source) for r in cap_per_group(df, "source", 7, salt="t").collect()}
    rows = [(i, "hub" if i % 4 != 0 else f"s{i % 3}") for i in range(120)]
    expect = set()
    by_src: dict[str, list] = {}
    for i, s in rows:
        by_src.setdefault(s, []).append(i)
    for s, ids in by_src.items():
        for i in sorted(ids, key=lambda x: (_bucket(x, "t"), x))[:7]:
            expect.add((i, s))
    assert got == expect
    # group sizes: hub has 90 rows -> capped to 7; s* groups have 10 each -> 7
    srcs = [s for _, s in got]
    assert srcs.count("hub") == 7


def test_cap_per_group_two_phase_equals_single_phase(spark):
    from sparkdoc.filters import cap_per_group

    df = _skewed(spark, 200)
    two = {r.doc_id for r in cap_per_group(df, "source", 9, salt="x", fan_in=32).collect()}
    one = {r.doc_id for r in cap_per_group(df, "source", 9, salt="x", fan_in=1).collect()}
    assert two == one


def test_cap_per_group_k_exceeds_group_size(spark):
    from sparkdoc.filters import cap_per_group

    df = _skewed(spark, 40)
    assert cap_per_group(df, "source", 1000).count() == 40


# --- downweight_frequent_groups ----------------------------------------------------


def test_downweight_matches_hash_rule_and_spares_small_groups(spark):
    from sparkdoc.filters import downweight_frequent_groups

    df = _skewed(spark, 400)  # hub: 300 rows, s0/s1/s2: ~33 each
    got = {r.doc_id for r in downweight_frequent_groups(df, "source", 40, salt="w").collect()}
    rows = [(i, "hub" if i % 4 != 0 else f"s{i % 3}") for i in range(400)]
    counts: dict[str, int] = {}
    for _, s in rows:
        counts[s] = counts.get(s, 0) + 1
    expect = {
        i
        for i, s in rows
        if _bucket(i, "w") < min(1_000_000, math.floor(40 * 1_000_000.0 / counts[s]))
    }
    assert got == expect
    # small groups (<= target) keep every row
    small_ids = {i for i, s in rows if s != "hub"}
    assert small_ids <= got


# --- tfidf_top_terms ---------------------------------------------------------------


def test_tfidf_scores_and_ranking(spark):
    from sparkdoc.textops import tfidf_top_terms

    rows = [
        (1, "apple apple banana shared"),
        (2, "banana cherry shared"),
        (3, "cherry date shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = tfidf_top_terms(df, k=2).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.rank)):
        by_doc.setdefault(r.doc_id, []).append(r)

    def score(tf, dfd, n=3):
        return round(tf * math.log((n + 1) / (dfd + 1)), 6)

    # doc1: apple tf=2 df=1 -> top; banana tf=1 df=2
    assert [r.term for r in by_doc[1]] == ["apple", "banana"]
    assert by_doc[1][0].score == score(2, 1)
    assert by_doc[1][1].score == score(1, 2)
    # 'shared' appears in every doc: idf = ln(4/4) = 0 -> never outranks
    assert all(r.term != "shared" or r.score == 0.0 for r in out)
    # doc2: banana/cherry tie (tf=1, df=2) -> term-asc tiebreak
    assert [r.term for r in by_doc[2]] == ["banana", "cherry"]
    assert all(len(v) == 2 for v in by_doc.values())


# --- bigram_lm_score ---------------------------------------------------------------


def test_bigram_lm_score_hand_case(spark):
    from sparkdoc.textops import bigram_lm_score

    rows = [
        (1, "a b a b"),       # bigrams: (a,b)x2, (b,a)x1
        (2, "a b c"),         # (a,b), (b,c)
        (3, "zzz"),           # 1 word -> no bigrams
    ]
    out = {r.doc_id: r for r in bigram_lm_score(
        spark.createDataFrame(rows, "doc_id: long, text: string")).collect()}
    # corpus: c(a,b)=3, c(b,a)=1, c(b,c)=1; c1: a=3, b=2; V = {a,b,c,zzz} = 4
    V = 4
    lp_ab = math.log((3 + 1) / (3 + V))
    lp_ba = math.log((1 + 1) / (2 + V))
    lp_bc = math.log((1 + 1) / (2 + V))
    assert out[1].n_bigrams == 3
    assert out[1].lm_score == round((2 * lp_ab + lp_ba) / 3, 6)
    assert out[2].n_bigrams == 2
    assert out[2].lm_score == round((lp_ab + lp_bc) / 2, 6)
    assert out[3].n_bigrams == 0 and out[3].lm_score is None


# --- pack_sequences ---------------------------------------------------------------


def test_pack_sequences_rule_and_determinism(spark):
    from sparkdoc.filters import pack_sequences

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 10).alias("n_tokens")
    )
    out = pack_sequences(df, budget=100, n_groups=4).collect()
    # recompute expected shards in python with the same md5 grouping
    groups: dict[int, list] = {}
    for i in range(200):
        groups.setdefault(_bucket(i, "pack") % 4, []).append(i)
    expect = {}
    for g, ids in groups.items():
        run = 0
        for i in sorted(ids):
            t = i % 97 + 10
            expect[i] = (g, run // 100)
            run += t
    got = {r.doc_id: (r.pack_group, r.shard_seq) for r in out}
    assert got == expect
    # shard totals never exceed budget + last doc's tokens; oversized docs
    # occupy their own shard tail
    totals: dict[tuple, int] = {}
    for r in out:
        totals[(r.pack_group, r.shard_seq)] = totals.get((r.pack_group, r.shard_seq), 0) + r.n_tokens
    assert all(v <= 100 + 106 for v in totals.values())
    # repartitioning the input must not change any assignment
    got2 = {
        r.doc_id: (r.pack_group, r.shard_seq)
        for r in pack_sequences(df.repartition(13), budget=100, n_groups=4).collect()
    }
    assert got2 == got


# --- SQ8 scalar quantization ---------------------------------------------------------


def test_sq8_codes_bounds_and_top1(spark):
    from sparkdoc.similarity import brute_force_topk, sq8_encode, sq8_stats, sq8_topk

    # 3 well-separated directions in dim 4; third component constant
    # (degenerate dimension must encode 0, not divide by zero)
    rows = [
        (0, [10.0, 0.0, 7.0, 0.1]), (1, [9.5, 0.4, 7.0, 0.2]),
        (2, [0.0, 10.0, 7.0, 0.3]), (3, [0.3, 9.6, 7.0, 0.1]),
        (4, [5.0, 5.0, 7.0, 9.0]), (5, [5.2, 4.9, 7.0, 8.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    stats = sq8_stats(df, dim=4)
    codes = {r.vec_id: r.codes for r in sq8_encode(df, stats).collect()}
    assert all(0 <= c <= 255 for cs in codes.values() for c in cs)
    assert all(cs[2] == 0 for cs in codes.values())  # degenerate dim
    # extremes land on the extreme buckets
    assert codes[0][0] == 255 and codes[2][0] == 0

    # ANN quality: top-1 neighbor matches exact for every query
    qs = df.filter(F.col("vec_id").isin(0, 2, 4))
    exact = {(r.query_id, r.rank): r.neighbor_id
             for r in brute_force_topk(df, qs, k=1, vec_col="embedding").collect()}
    approx = {(r.query_id, r.rank): r.neighbor_id
              for r in sq8_topk(df, qs, k=1, vec_col="embedding", dim=4).collect()}
    assert approx == exact == {(0, 1): 1, (2, 1): 3, (4, 1): 5}


# --- Misra-Gries heavy hitters -------------------------------------------------------


def test_heavy_hitters_exact_and_partition_invariant(spark):
    import random

    from sparkdoc.sketches import heavy_hitters

    rng = random.Random(7)
    # zipf-ish: item i appears ~ 3000/i times; long uniform tail
    stream = []
    for i in range(1, 30):
        stream += [f"hot{i}"] * (3000 // i)
    stream += [f"tail{j}" for j in range(4000)]
    rng.shuffle(stream)
    n = len(stream)
    k = 20
    exact = {}
    for it in stream:
        exact[it] = exact.get(it, 0) + 1
    truth = {(it, c) for it, c in exact.items() if c * (k + 1) > n}
    assert truth  # the test corpus genuinely has heavy hitters

    df = spark.createDataFrame([(s,) for s in stream], "term: string")
    got = {(r.item, r.cnt) for r in heavy_hitters(df, "term", k=k).collect()}
    assert got == truth
    # MG guarantee must hold under ANY partitioning (mergeable summaries)
    got13 = {
        (r.item, r.cnt)
        for r in heavy_hitters(df.repartition(13), "term", k=k).collect()
    }
    assert got13 == truth
    # sketch-only mode: lower bounds, and every true heavy hitter is present
    lb = {r.item: r.mg_count for r in heavy_hitters(df, "term", k=k, exact=False).collect()}
    assert {it for it, _ in truth} <= set(lb)
    assert all(lb[it] <= exact[it] for it in lb if it in exact)
