"""End-to-end drive of the convert + merge spark-submit CLIs (subprocess):
the reference's `docling-graph convert` / `merge` command surfaces
(cli/commands/convert.py:192, cli/commands/merge.py:27) as cluster jobs."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, expect_ok=True):
    out = subprocess.run(
        [sys.executable, *args], cwd=REPO, capture_output=True, text=True, timeout=420
    )
    if expect_ok:
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])
    return out


def test_convert_merge_and_template_gate(tmp_path):
    g1, g2, gm = str(tmp_path / "g1"), str(tmp_path / "g2"), str(tmp_path / "gm")
    r1 = _run(["sparkdoc/jobs/convert.py", "--input", "synth:12", "--out", g1,
               "--export", "csv"])
    assert r1["validation"]["is_valid"] and r1["counts"]["nodes"] > 0
    assert os.path.isfile(os.path.join(g1, "manifest.json"))
    assert os.path.isdir(os.path.join(g1, "export_csv"))

    r2 = _run(["sparkdoc/jobs/convert.py", "--input", "synth:8", "--seed", "7",
               "--out", g2])
    assert r2["template_schema_hash"] == r1["template_schema_hash"]

    rm = _run(["sparkdoc/jobs/merge.py", "--inputs", f"{g1},{g2}", "--out", gm,
               "--precedence", "richest", "--conflicts", "keep_all"])
    assert rm["counts"]["nodes"] > 0
    assert rm["counts"]["ledger"] > 0  # provenance sidecar merged
    assert rm["schema_hashes"] == [r1["template_schema_hash"]]
    assert os.path.isfile(os.path.join(gm, "merge_report.json"))

    # strict template gate: forge a mismatched schema hash → refusal
    mpath = os.path.join(g2, "manifest.json")
    m = json.load(open(mpath))
    m["template_schema_hash"] = "deadbeefdeadbeef"
    json.dump(m, open(mpath, "w"))
    out = _run(["sparkdoc/jobs/merge.py", "--inputs", f"{g1},{g2}",
                "--out", str(tmp_path / "gm2")], expect_ok=False)
    assert out.returncode != 0
    assert "TemplateMismatch" in out.stderr or "different template schemas" in out.stderr


def test_curate_cli_full_gate_attribution(tmp_path, spark):
    """The curation CLI: every gate fires on a hand corpus, the split is
    TOTAL (kept + rejected = input, no doc in both), kept text is
    PII-redacted, and each doc lands on its FIRST failing gate."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    # doc 4: distinct filler words keep distinct_word_fraction >= 0.2 (so the
    # QUALITY gate passes and the repetition gate is the one that fires on
    # the 10x repeated 'rep pair' bigram); doc 2's tail is distinct enough to
    # stay under jaccard 0.85 vs doc 1, doc 6 is doc 1 plus one word (0.917)
    rows = [
        (1, base + " one"),                        # kept
        (2, base + " two mail bob@corp.io from the downtown office address"),
        (3, "short junk"),                         # quality (min_words)
        (4, ("rep pair " * 10) + base),            # repetition (top bigram x10)
        (5, base + " one"),                        # exact dup of 1 -> dropped
        (6, base + " one more"),                   # near-dup of 1 (jaccard 0.917)
        (7, "the quick brown fox jumps over the lazy dog benchmark sentence"),
    ]
    in_p, bench_p, out_p = (str(tmp_path / n) for n in ("in", "bench", "out"))
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(in_p)
    spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog benchmark sentence")],
        "doc_id long, text string",
    ).write.parquet(bench_p)

    s = _run(["sparkdoc/jobs/curate.py", "--input", in_p, "--out", out_p,
              "--benchmark", bench_p, "--near-dup"])
    assert s["n_input"] == 7
    assert s["rejected_by_reason"] == {
        "contaminated": 1, "exact_dup": 1, "near_dup": 1,
        "quality": 1, "repetition": 1,
    }
    kept = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(os.path.join(out_p, "kept")).collect()
    }
    rej = {
        r["doc_id"]: r["reject_reason"]
        for r in spark.read.parquet(os.path.join(out_p, "rejected")).collect()
    }
    assert set(kept) == {1, 2} and s["n_kept"] == 2
    assert set(kept) | set(rej) == {1, 2, 3, 4, 5, 6, 7}
    assert "[EMAIL]" in kept[2] and "@" not in kept[2]
    assert rej == {3: "quality", 4: "repetition", 5: "exact_dup",
                   6: "near_dup", 7: "contaminated"}
    assert os.path.isfile(os.path.join(out_p, "stats.json"))


def test_build_mix_and_dedup_delta_clis(tmp_path, spark):
    """build_mix: curate -> per-source rebalance -> shard packing, manifest
    accounting consistent. dedup_delta: build-index then ingest a delta with
    one exact dup, one near dup, one fresh doc."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (i, f"{base} tail{i} filler{i} word{i}", f"s{i % 2}") for i in range(1, 9)
    ] + [(9, "short junk", "s1")]
    in_p = str(tmp_path / "in")
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(in_p)

    mix = str(tmp_path / "mix")
    s = _run(["sparkdoc/jobs/build_mix.py", "--input", in_p, "--out", mix,
              "--budget", "64", "--groups", "2"])
    assert s["n_kept"] == 8 and s["n_rejected"] == 1
    assert set(s["by_source"]) == {"s0", "s1"}
    assert s["total_tokens"] == sum(v["tokens"] for v in s["by_source"].values())
    shards = spark.read.parquet(os.path.join(mix, "shards"))
    assert shards.count() == 8
    assert {"doc_id", "text", "lang_pred", "source", "n_tokens", "shard_seq",
            "pack_group"} <= set(shards.columns)
    # per-shard totals respect budget + last doc
    tot = shards.groupBy("pack_group", "shard_seq").sum("n_tokens").collect()
    mx = shards.agg({"n_tokens": "max"}).collect()[0][0]
    assert all(r[2] <= 64 + mx for r in tot)

    idx, ing = str(tmp_path / "idx"), str(tmp_path / "ing")
    s = _run(["sparkdoc/jobs/dedup_delta.py", "--build-index",
              "--corpus", in_p, "--index", idx])
    assert s["exact_rows"] == 9 and s["band_rows"] > 0
    delta_p = str(tmp_path / "delta")
    spark.createDataFrame(
        [(101, f"{base} tail1 filler1 word1"),          # exact dup of 1
         (102, f"{base} tail2 filler2 word2 extra"),    # near dup of 2
         (103, "совершенно новый документ о пингвинах и ледниках на юге")],
        "doc_id long, text string",
    ).write.parquet(delta_p)
    s = _run(["sparkdoc/jobs/dedup_delta.py", "--corpus", in_p, "--index", idx,
              "--delta", delta_p, "--out", ing, "--near-dup", "--jaccard", "0.7"])
    assert s["dups_by_kind"] == {"exact": 1, "near": 1} and s["n_kept"] == 1
    dups = {r["doc_id"]: (r["dup_of"], r["kind"])
            for r in spark.read.parquet(os.path.join(ing, "dups")).collect()}
    assert dups[101] == (1, "exact") and dups[102] == (2, "near")
    # updated index knows the fresh doc now
    nxt = spark.read.parquet(os.path.join(idx + "_next", "exact"))
    assert nxt.count() == 10


def test_train_classifier_and_curate_gate(tmp_path, spark):
    """Train the hashed-linear classifier on a separable corpus, then drive
    curate with --classifier (trained-model gate) and --substr-dedup (the
    duplicated-passage trim runs BEFORE the gates)."""
    good = [
        "excellent careful verified thorough prose with citations and structure today",
        "well researched article citing primary sources and careful analysis throughout",
        "thorough technical documentation with verified examples and structure provided",
        "careful verified reporting with primary citations and clear prose material",
    ]
    spam = [
        "click buy pills casino winner free prize money now bonus jackpot deal",
        "free casino bonus click winner pills buy now money jackpot prize deal",
        "winner prize click free money casino pills buy bonus deal jackpot offer",
        "buy now free pills winner casino prize bonus click offer jackpot money",
    ]
    rows = [(i, t, 1) for i, t in enumerate(good)] + [
        (100 + i, t, 0) for i, t in enumerate(spam)
    ]
    in_p, model_p, out_p = (str(tmp_path / n) for n in ("in", "model", "out"))
    spark.createDataFrame(rows, "doc_id long, text string, label int").write.parquet(in_p)

    s = _run(["sparkdoc/jobs/train_classifier.py", "--input", in_p, "--out", model_p,
              "--label-col", "label", "--n-buckets", "256", "--iters", "25"])
    assert s["train"]["accuracy"] == 1.0
    assert os.path.isdir(os.path.join(model_p, "weights"))

    # curate a fresh corpus: a good doc, a near-copy that shares only a
    # 9-word run (below k=12 — substr trim must NOT fire), and a spam doc in
    # an unseen word order (the model, not a memorized string, rejects it)
    shared = good[0]
    c_rows = [
        (1, shared),
        (2, "filler intro words " + shared.replace("today", "again")),
        (3, "casino pills winner click buy free bonus prize money now deal jackpot"),
    ]
    cur_in = str(tmp_path / "cin")
    spark.createDataFrame(c_rows, "doc_id long, text string").write.parquet(cur_in)
    s2 = _run(["sparkdoc/jobs/curate.py", "--input", cur_in, "--out", out_p,
               "--classifier", model_p, "--substr-dedup", "--min-words", "5"])
    rej = {
        r["doc_id"]: r["reject_reason"]
        for r in spark.read.parquet(os.path.join(out_p, "rejected")).collect()
    }
    kept_ids = {r["doc_id"] for r in spark.read.parquet(os.path.join(out_p, "kept")).collect()}
    assert rej[3] == "classifier"
    assert kept_ids == {1, 2}  # 9-word overlap < k: doc 2 survives untrimmed
    assert s2["knobs"]["substr_dedup"] is True and s2["knobs"]["classifier"] == model_p


def test_curate_cli_url_dedup_and_fix_encoding(tmp_path, spark):
    """--url-dedup keeps the min-id doc per canonical URL (rejects get
    'url_dup') and --fix-encoding repairs mojibake before the gates, so a
    doc whose only flaw is cp1252 damage is KEPT with clean text."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        # docs 1-3: same page under three URL spellings -> keep 1 only
        (1, base + " one", "HTTP://Ex.com/a?utm_source=s&k=1"),
        (2, base + " two", "http://ex.com/a/?k=1"),
        (3, base + " three", "http://ex.com/a?k=1#top"),
        # doc 4: distinct URL, mojibake text -> kept, repaired
        (4, base + " cafÃ© visit itÃ¢â‚¬â„¢s fine", "http://ex.com/b"),
        # docs 5-6: NULL urls must never group as duplicates -> both kept
        (5, base + " five", None),
        (6, base + " six", None),
    ]
    in_p, out_p = str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(rows, "doc_id long, text string, url string").write.parquet(in_p)

    s = _run(["sparkdoc/jobs/curate.py", "--input", in_p, "--out", out_p,
              "--url-dedup", "--fix-encoding", "--min-words", "5"])
    assert s["n_input"] == 4  # post-url-dedup gate input (incl. NULL-url docs)
    assert s["rejected_by_reason"] == {"url_dup": 2}
    assert s["knobs"]["url_dedup"] is True and s["knobs"]["fix_encoding"] is True
    kept = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(os.path.join(out_p, "kept")).collect()
    }
    assert set(kept) == {1, 4, 5, 6}
    assert "café" in kept[4] and "it’s" in kept[4] and "Ã" not in kept[4]
    rej = {
        r["doc_id"]: r["reject_reason"]
        for r in spark.read.parquet(os.path.join(out_p, "rejected")).collect()
    }
    assert rej == {2: "url_dup", 3: "url_dup"}


def test_curate_cli_dsir_selection(tmp_path, spark):
    """--dsir-target keeps the --dsir-k gate survivors whose hashed-ngram
    distribution best matches the target corpus; non-selected survivors get
    reason 'dsir' and the split stays TOTAL. temperature=0 makes the pick
    deterministic top-k by importance weight (content, not length: all raw
    docs are word-count-matched)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    target_rows = [
        (0, "quantum physics and quantum computing research papers published"),
        (1, "physics experiments with quantum entanglement results published"),
    ]
    raw_rows = [
        (10, base + " quantum computing is a branch of physics research"),
        (11, base + " football match results and league standings published today"),
        (12, base + " recipe for chocolate cake with butter and extra sugar"),
        (13, base + " quantum entanglement physics experiments run in the lab"),
    ]
    tgt_p, in_p, out_p = str(tmp_path / "tgt"), str(tmp_path / "in"), str(tmp_path / "out")
    spark.createDataFrame(target_rows, "doc_id long, text string").write.parquet(tgt_p)
    spark.createDataFrame(raw_rows, "doc_id long, text string").write.parquet(in_p)

    s = _run(["sparkdoc/jobs/curate.py", "--input", in_p, "--out", out_p,
              "--min-words", "5", "--dsir-target", tgt_p, "--dsir-k", "2",
              "--dsir-temperature", "0"])
    assert s["n_kept"] == 2
    assert s["rejected_by_reason"] == {"dsir": 2}
    assert s["knobs"]["dsir_k"] == 2 and s["knobs"]["dsir_temperature"] == 0.0
    kept = {r["doc_id"] for r in spark.read.parquet(os.path.join(out_p, "kept")).collect()}
    assert kept == {10, 13}  # the two quantum/physics docs
    rej = {r["doc_id"]: r["reject_reason"]
           for r in spark.read.parquet(os.path.join(out_p, "rejected")).collect()}
    assert rej == {11: "dsir", 12: "dsir"}

    # --dsir-target without --dsir-k is a usage error, not a silent no-op
    out = _run(["sparkdoc/jobs/curate.py", "--input", in_p,
                "--out", str(tmp_path / "out2"), "--dsir-target", tgt_p],
               expect_ok=False)
    assert out.returncode != 0 and "--dsir-k" in out.stderr


def test_corpus_stats_cli(tmp_path, spark):
    """corpus_stats job: exact totals, exact top terms, exact-dup rate and
    url-dup/domain rollups on a hand corpus where every number is known."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 words
    rows = [
        (1, base + " alpha alpha", "http://a.example.com/x", "s1"),   # alpha x3
        (2, base + " alpha alpha", "HTTP://a.example.com/x/", "s1"),  # exact dup of 1, url dup of 1
        (3, base + " beta", "http://b.other.org/y", "s2"),            # beta x2
        (4, "cafÃ© " + base, "http://c.other.org/z", "s2"),           # mojibake
    ]
    in_p, out_p = str(tmp_path / "docs"), str(tmp_path / "stats")
    spark.createDataFrame(rows, "doc_id long, text string, url string, source string").write.parquet(in_p)

    s = _run(["sparkdoc/jobs/corpus_stats.py", "--input", in_p, "--out", out_p,
              "--top-terms", "3", "--top-domains", "2"])
    assert s["n_docs"] == 4
    assert s["n_distinct_texts"] == 3
    assert s["exact_dup_rate"] == 0.25          # doc 2 beyond first of its group
    assert s["mojibake_rate"] == 0.25           # doc 4 only
    assert s["by_source"] == {"s1": 2, "s2": 2}
    # alpha appears 3x in docs 1 and 2, 1x in docs 3 and 4 -> 8
    assert s["top_terms"][0] == ["alpha", 8]
    assert len(s["top_terms"]) == 3
    assert s["url_dup_rate"] == 0.25            # doc 2's url re-spells doc 1's
    assert dict(s["top_domains"]) == {"example.com": 2, "other.org": 2}
    # vocab: 10 base + cafe variants; HLL at this size is exact for small sets
    assert s["vocab_estimate_hll"] >= 10
    # docs 1,2 have 12 tokens; GK sketch is exact at this scale
    assert s["tokens_p50"] >= 11 and s["tokens_p99"] >= s["tokens_p50"]
    rep = open(os.path.join(out_p, "report.md")).read()
    assert "## Top terms" in rep and "alpha" in rep
    assert "## Language distribution" in rep
    st = json.load(open(os.path.join(out_p, "stats.json")))
    assert st["n_docs"] == 4


def test_ann_index_cli_build_query_recall(tmp_path, spark):
    """ann_index.py end to end: build writes cell-partitioned vectors,
    PQ codes and a manifest; query produces exact-cosine-rescored top-k
    whose rank-1 hits equal brute force when nprobe covers all cells and
    the rescore head covers the corpus (the plumbing-exactness bound; at
    production settings the head is a small multiple of k and recall is
    graded, not exact)."""
    from pyspark.sql import functions as F

    from sparkdoc.similarity import brute_force_topk

    corpus_path = str(tmp_path / "emb.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb.write.parquet(corpus_path)
    queries_path = str(tmp_path / "q.parquet")
    emb.filter(F.col("vec_id") % 100 == 0).write.parquet(queries_path)

    idx = str(tmp_path / "idx")
    rb = _run(
        [
            "sparkdoc/jobs/ann_index.py", "--build", "--corpus", corpus_path,
            "--index", idx, "--cells", "4", "--m", "8", "--ksub", "4",
        ]
    )
    assert rb["n_vectors"] == emb.count()
    assert os.path.isdir(os.path.join(idx, "cells")) and os.path.isfile(
        os.path.join(idx, "manifest.json")
    )
    # cell-partitioned layout (partition pruning surface)
    assert any(d.startswith("cell=") for d in os.listdir(os.path.join(idx, "cells")))

    out = str(tmp_path / "res")
    rq = _run(
        [
            "sparkdoc/jobs/ann_index.py", "--query", queries_path, "--index", idx,
            "--out", out, "--k", "5", "--nprobe", "4", "--rescore-factor", "100",
            "--exclude-self",
        ]
    )
    assert rq["results"] == rq["queries"] * 5
    got = spark.read.parquet(out)
    top1 = {r["query_id"]: r["neighbor_id"] for r in got.filter(F.col("rank") == 1).collect()}
    exact = brute_force_topk(emb, emb.filter(F.col("vec_id") % 100 == 0), k=1)
    want = {r["query_id"]: r["neighbor_id"] for r in exact.collect()}
    # nprobe == all cells AND rescore head >= corpus: every candidate is
    # exactly rescored, so rank-1 must equal brute force everywhere
    assert top1 == want


def test_search_index_cli_build_query_exact(tmp_path, spark):
    """search_index.py end to end: build writes bucket-partitioned postings
    + a manifest; query is bit-identical to the in-memory bm25_topk over
    the same corpus (integer micro-unit scores, doc_id ties)."""
    from pyspark.sql import functions as F

    from sparkdoc.retrieval import bm25_topk
    from sparkdoc.textops import words

    corpus_path = str(tmp_path / "docs.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    docs.write.parquet(corpus_path)
    queries_path = str(tmp_path / "q.parquet")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(words(F.col("text")), 1, 6), " ").alias("text"),
    )
    queries.write.parquet(queries_path)

    idx = str(tmp_path / "bm25_idx")
    rb = _run(
        [
            "sparkdoc/jobs/search_index.py", "--build", "--corpus", corpus_path,
            "--index", idx, "--buckets", "16",
        ]
    )
    assert rb["n_docs"] == docs.count() and rb["n_postings"] > 0
    assert os.path.isfile(os.path.join(idx, "manifest.json"))
    assert any(
        d.startswith("bucket=") for d in os.listdir(os.path.join(idx, "postings"))
    )

    out = str(tmp_path / "hits")
    rq = _run(
        [
            "sparkdoc/jobs/search_index.py", "--query", queries_path, "--index", idx,
            "--out", out, "--k", "5",
        ]
    )
    assert rq["n_results"] > 0 and rq["n_queries_with_hits"] > 0
    cols = ["query_id", "doc_id", "rank", "score_e6"]
    got = sorted(map(tuple, spark.read.parquet(out).select(*cols).collect()))
    want = sorted(map(tuple, bm25_topk(docs, queries, k=5).select(*cols).collect()))
    assert got == want

    # incremental ingest: --update appends a disjoint delta and accumulates
    # the manifest (union-exactness itself is unit-pinned in test_retrieval)
    delta_path = str(tmp_path / "delta.parquet")
    base_max = docs.agg(F.max("doc_id")).collect()[0][0]
    docs.limit(3).select(
        (F.col("doc_id") + base_max + 1).alias("doc_id"), "text"
    ).write.parquet(delta_path)
    ru = _run(
        [
            "sparkdoc/jobs/search_index.py", "--update", "--corpus", delta_path,
            "--index", idx,
        ]
    )
    assert ru["n_docs"] == docs.count() + 3


def test_hybrid_search_cli_fuses_both_indexes(tmp_path, spark):
    """hybrid_search.py end to end: build the BM25 and IVF-PQ indexes over a
    shared id space (doc_id == vec_id), query with (query_id, text,
    embedding) rows, and check the CLI's fused output equals the in-process
    composition of the same index reads + rrf_fuse."""
    import json as _json

    from pyspark.sql import functions as F

    from sparkdoc.cluster import ivfpq_topk
    from sparkdoc.retrieval import bm25_query_index, rrf_fuse

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus_docs = str(tmp_path / "docs.parquet")
    corpus_emb = str(tmp_path / "emb.parquet")
    docs.write.parquet(corpus_docs)
    emb.write.parquet(corpus_emb)

    queries_path = str(tmp_path / "q.parquet")
    from sparkdoc.textops import words

    q = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(words(F.col("text")), 1, 6), " ").alias("text"),
            "embedding",
        )
    )
    q.write.parquet(queries_path)
    assert q.count() > 0

    bidx, aidx = str(tmp_path / "bm25"), str(tmp_path / "ann")
    _run(["sparkdoc/jobs/search_index.py", "--build", "--corpus", corpus_docs,
          "--index", bidx, "--buckets", "8"])
    _run(["sparkdoc/jobs/ann_index.py", "--build", "--corpus", corpus_emb,
          "--index", aidx, "--cells", "4", "--m", "8", "--ksub", "4"])

    out = str(tmp_path / "hits")
    rh = _run([
        "sparkdoc/jobs/hybrid_search.py", "--bm25-index", bidx, "--ann-index", aidx,
        "--queries", queries_path, "--out", out, "--k", "5", "--nprobe", "4",
        "--rescore-factor", "100",
    ])
    assert rh["n_results"] > 0 and rh["n_queries_with_hits"] > 0
    # each query's own doc should be surfaced by BOTH retrievers
    assert rh["n_consensus_hits"] > 0

    # in-process twin over the same persisted indexes
    lex = bm25_query_index(spark, bidx, q.select("query_id", "text"), k=5).select(
        "query_id", "doc_id", "rank"
    )
    with open(os.path.join(aidx, "manifest.json")) as f:
        man = _json.load(f)
    dense = ivfpq_topk(
        spark.read.parquet(os.path.join(aidx, "cells")),
        spark.read.parquet(os.path.join(aidx, "codes")),
        q.select(F.col("query_id").alias("vec_id"), "embedding"),
        man["centroids"],
        man["codebooks"],
        k=5,
        nprobe=4,
        rescore_factor=100,
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    want = sorted(map(tuple, rrf_fuse([lex, dense], topk=5).collect()))
    cols = ["query_id", "doc_id", "rank", "rrf_e9", "n_systems"]
    got = sorted(map(tuple, spark.read.parquet(out).select(*cols).collect()))
    assert got == want

    # --exclude-self must bind on BOTH retrievers: no fused row may carry
    # the query's own doc (previously BM25 re-admitted it)
    out2 = str(tmp_path / "hits_noself")
    _run([
        "sparkdoc/jobs/hybrid_search.py", "--bm25-index", bidx, "--ann-index", aidx,
        "--queries", queries_path, "--out", out2, "--k", "5", "--nprobe", "4",
        "--rescore-factor", "100", "--exclude-self",
    ])
    noself = spark.read.parquet(out2)
    assert noself.count() > 0
    assert noself.filter(F.col("query_id") == F.col("doc_id")).count() == 0


def test_extract_cli_html_inputs(tmp_path, spark):
    """--input html-synth:<n> and --input html:<parquet> both flatten raw
    HTML in-job and land on identical documents output (span counts equal
    the closed-form expectation)."""
    from sparkdoc.synth import expected_html_spans, html_corpus_df

    out1 = str(tmp_path / "o1")
    r1 = _run(["sparkdoc/jobs/extract.py", "--input", "html-synth:24",
               "--out", out1, "--buckets", "4", "--group-size", "2"])
    assert r1["docs"] == 24
    assert r1["spans"] == len(expected_html_spans(24, 42))

    html_pq = str(tmp_path / "html_pq")
    html_corpus_df(spark, 24, 42, partitions=2).write.parquet(html_pq)
    out2 = str(tmp_path / "o2")
    r2 = _run(["sparkdoc/jobs/extract.py", "--input", f"html:{html_pq}",
               "--out", out2, "--buckets", "4", "--group-size", "2"])
    assert r2["spans"] == r1["spans"] and r2["docs"] == 24


def test_extract_cli_mixed_resume(tmp_path, spark):
    """--input mixed-synth:<n>: format-heterogeneous blobs sniffed and
    routed in-job (documents_input path — no extract stage), with the same
    kill/resume manifest semantics: a partial run's committed buckets are
    skipped on rerun and totals match the closed-form expectation."""
    from sparkdoc.synth import expected_mixed_formats, expected_mixed_spans

    out = str(tmp_path / "mix")
    r1 = _run(["sparkdoc/jobs/extract.py", "--input", "mixed-synth:24",
               "--out", out, "--buckets", "4", "--group-size", "1"])
    assert r1["docs"] == 24
    assert r1["spans"] == len(expected_mixed_spans(24, 42))
    # resume: everything already committed → all buckets skipped
    r2 = _run(["sparkdoc/jobs/extract.py", "--input", "mixed-synth:24",
               "--out", out, "--buckets", "4", "--group-size", "1"])
    assert r2["buckets_processed"] == [] and len(r2["buckets_skipped"]) == 4
    # the fmt column survives into the written documents table
    from pyspark.sql import functions as F

    got = spark.read.parquet(os.path.join(out, "documents"))
    fmt_counts = {r["fmt"]: r["n"] for r in
                  got.groupBy("fmt").agg(F.count("*").alias("n")).collect()}
    exp: dict[str, int] = {}
    for r in expected_mixed_formats(24, 42):
        exp[r["fmt"]] = exp.get(r["fmt"], 0) + 1
    assert fmt_counts == exp
    # ...and every bucket's manifest commit carries the per-format lineage
    man = spark.read.parquet(os.path.join(out, "_manifest"))
    rows = [r for r in man.collect() if r["n_docs"] > 0]
    assert rows and all(r["fmt_counts"] for r in rows)
    total: dict[str, int] = {}
    for r in rows:
        for k, v in json.loads(r["fmt_counts"]).items():
            total[k] = total.get(k, 0) + v
    assert total == exp


def test_evaluate_cli_identity_and_cross_controls(tmp_path):
    """jobs/evaluate.py: self-evaluation must score EXACTLY 1.0 at every
    rung (identity control); a different-seed run must score near zero
    (non-vacuity control). Reference analog: 16_extraction_evaluation.py +
    17_benchmark_aggregate.py as one corpus job."""
    import json as _json

    g1, g2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    ev1, ev2 = str(tmp_path / "ev1"), str(tmp_path / "ev2")
    _run(["sparkdoc/jobs/convert.py", "--input", "synth:12", "--out", g1])
    _run(["sparkdoc/jobs/convert.py", "--input", "synth:12", "--seed", "7",
          "--out", g2])
    tpl = str(tmp_path / "t.json")
    from sparkdoc.catalog import DEMO_TEMPLATE

    _json.dump(DEMO_TEMPLATE, open(tpl, "w"), default=str)

    r = _run(["sparkdoc/jobs/evaluate.py", "--truth", g1, "--got", g1,
              "--template", tpl, "--out", ev1])
    for k in ("nodes_strict", "nodes_relaxed", "edges_strict", "edges_relaxed"):
        assert r[k]["f1"] == 1.0 and r[k]["fp"] == 0 and r[k]["fn"] == 0, (k, r[k])
    assert r["nodes_strict"]["tp"] > 0 and r["edges_strict"]["tp"] > 0
    assert r["integrity"]["unkeyed_nodes"] == 0
    assert os.path.isdir(os.path.join(ev1, "rollup"))

    r2 = _run(["sparkdoc/jobs/evaluate.py", "--truth", g1, "--got", g2,
               "--template", tpl, "--out", ev2])
    assert r2["nodes_strict"]["f1"] < 0.2 and r2["edges_strict"]["tp"] == 0

    # corpus granularity: document-agnostic identity self-eval is also
    # exactly 1.0, and the orphan count can only DROP vs doc mode (doc-
    # attribution skew adds false orphans, never removes true ones; any
    # remaining orphan is a genuinely unreferenced node)
    ev3 = str(tmp_path / "ev3")
    r3 = _run(["sparkdoc/jobs/evaluate.py", "--truth", g1, "--got", g1,
               "--template", tpl, "--out", ev3, "--granularity", "corpus"])
    for k in ("nodes_strict", "edges_strict"):
        assert r3[k]["f1"] == 1.0, (k, r3[k])
    assert r3["integrity"]["orphan_nodes"] <= r["integrity"]["orphan_nodes"]

    # exactly one of --template/--id-fields
    bad = _run(["sparkdoc/jobs/evaluate.py", "--truth", g1, "--got", g1,
                "--out", str(tmp_path / "evx")], expect_ok=False)
    assert bad.returncode != 0

    # malformed --id-fields (string instead of list) must fail fast, not
    # score 0.0 per-character
    bad2 = _run(["sparkdoc/jobs/evaluate.py", "--truth", g1, "--got", g1,
                 "--id-fields", '{"Person": "name"}',
                 "--out", str(tmp_path / "evy")], expect_ok=False)
    assert bad2.returncode != 0 and "non-empty list" in bad2.stderr


def test_web_pipeline_e2e_and_stage_guard(tmp_path):
    """jobs/web_pipeline.py: WARC containers → resumable extract →
    curated token-packed shards in one command. Rerun must skip every
    committed extract bucket AND the whole mix stage (manifest guard),
    and the shard table must be byte-stable across the rerun."""
    out = str(tmp_path / "run")
    cmd = ["sparkdoc/jobs/web_pipeline.py", "--input", "mixed-synth:24",
           "--out", out, "--buckets", "4", "--group-size", "2",
           "--budget", "2000", "--groups", "8", "--min-words", "3",
           "--shuffle-partitions", "8"]
    r1 = _run(cmd)
    assert r1["extract"]["docs"] == 24
    assert r1["mix"]["n_kept"] > 0 and r1["mix"]["n_shards"] > 0
    assert r1["mix_skipped"] is False
    assert os.path.isdir(os.path.join(out, "extract", "documents"))
    assert os.path.isdir(os.path.join(out, "mix", "shards"))
    # per-format lineage flows through: mixed ingest fmt → mix source dim
    assert len(r1["mix"]["by_source"]) > 1

    import duckdb

    shard_rows = duckdb.sql(
        f"select doc_id, pack_group, shard_seq, n_tokens from "
        f"'{out}/mix/shards/**/*.parquet' order by doc_id"
    ).fetchall()

    r2 = _run(cmd)
    assert r2["extract"]["buckets_processed"] == []
    assert len(r2["extract"]["buckets_skipped"]) == 4
    assert r2["mix_skipped"] is True
    assert r2["mix"]["n_kept"] == r1["mix"]["n_kept"]
    shard_rows2 = duckdb.sql(
        f"select doc_id, pack_group, shard_seq, n_tokens from "
        f"'{out}/mix/shards/**/*.parquet' order by doc_id"
    ).fetchall()
    assert shard_rows2 == shard_rows
