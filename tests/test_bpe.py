"""Trained BPE tokenizer: fit loop, merge-application fixpoint semantics,
encode chain — Spark vs the pure-Python twin."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkdoc.bpe import (
    FIX_PASSES,
    apply_merge_py,
    encode_word_py,
    fit_bpe_py,
)


class TestMergeSemantics:
    def test_simple_fuse(self):
        assert apply_merge_py(" h e l l o </w> ", "l", "l") == " h e ll o </w> "

    def test_chain_needs_multiple_passes(self):
        # ' a b a b ': the first match consumes the shared space, hiding the
        # second occurrence from a single pass
        s = " a b a b </w> "
        one_pass = s.replace(" a b ", " ab ")
        assert " a b " in one_pass  # single pass misses shared-space chains
        out = apply_merge_py(s, "a", "b")
        assert " a b " not in out  # fixpoint: no occurrence survives
        assert out == " ab ab </w> "
        # self-pair chains also reach a (well-defined) fixpoint
        out2 = apply_merge_py(" " + "a " * 8 + "</w> ", "a", "a")
        assert " a a " not in out2
        assert out2.replace(" ", "").count("a") == 8

    def test_fixpoint_bound_holds_for_long_words(self):
        # 2^FIX_PASSES symbols is the documented bound; real words are far
        # shorter, but the bound itself must hold
        s = " " + "a " * (2 ** FIX_PASSES) + "</w> "
        apply_merge_py(s, "a", "a")  # raises if FIX_PASSES insufficient

    @given(st.text(alphabet="ab", min_size=1, max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_fixpoint_fuzz(self, word):
        s = " " + " ".join(word) + " </w> "
        out = apply_merge_py(s, "a", "b")
        assert " a b " not in out

    def test_encode_applies_in_rank_order(self):
        # (e,r) then (er,</w>): 'ber' -> b er</w>; reversed order couldn't
        # form er</w> because 'er' doesn't exist yet
        toks = encode_word_py("ber", [("e", "r"), ("er", "</w>")])
        assert toks == ["b", "er</w>"]
        toks2 = encode_word_py("ber", [("er", "</w>"), ("e", "r")])
        assert toks2 == ["b", "er", "</w>"]


class TestFitPy:
    def test_greedy_argmax_with_ties(self):
        # 'abab' x3: pairs (a,b) cnt 6, (b,a) cnt 3 -> first merge (a,b);
        # then (ab,ab) cnt 3 beats (ab,</w>) cnt 3 on pair asc tiebreak?
        # ('ab','</w>') < ('ab','ab') lexicographically -> tie broken to </w>
        merges = fit_bpe_py({"abab": 3}, n_merges=2)
        assert merges[0] == ("a", "b")
        assert merges[1] == ("ab", "</w>")

    def test_frequency_weighting(self):
        # 'xy' freq 10 dominates 'zz' freq 1
        merges = fit_bpe_py({"xy": 10, "zz": 1}, n_merges=1)
        assert merges[0] == ("x", "y")

    def test_exhausts_gracefully(self):
        merges = fit_bpe_py({"a": 5}, n_merges=10)
        # 'a </w>' has one pair; after fusing, no pairs remain
        assert merges == [("a", "</w>")]


@pytest.mark.usefixtures("spark")
class TestSparkParity:
    def test_fit_matches_python_twin(self, spark):
        from sparkdoc.bpe import fit_bpe

        corpus = [
            ("d1", "the river runs forever under the lower tower"),
            ("d2", "river water never slower, the tower of power"),
            ("d3", "lower the rower, the mower, the thrower"),
        ]
        docs = spark.createDataFrame(corpus, "doc_id string, text string")
        from sparkdoc.bpe import word_counts

        wc_rows = word_counts(docs).collect()
        wc = {r["word"]: r["cnt"] for r in wc_rows}
        want = fit_bpe_py(wc, n_merges=6)
        got = fit_bpe(word_counts(docs), n_merges=6)
        assert got == want

    def test_encode_matches_python_twin(self, spark):
        from sparkdoc.bpe import encode_words

        merges = [("e", "r"), ("er", "</w>"), ("t", "h"), ("th", "e</w>")]
        words = spark.createDataFrame(
            [("ther",), ("the",), ("river",), ("a",)], "word string"
        )
        got = {r["word"]: list(r["tokens"]) for r in encode_words(words, merges).collect()}
        for w in ["ther", "the", "river", "a"]:
            assert got[w] == encode_word_py(w, merges), w

    def test_token_counts_roll_up(self, spark):
        from sparkdoc.bpe import bpe_token_counts

        merges = [("a", "b")]
        docs = spark.createDataFrame(
            [("d1", "ab ab cd"), ("d2", "!!!"), ("d3", "ab")],
            "doc_id string, text string",
        )
        got = {r["doc_id"]: (r["bpe_tokens"], r["bpe_words"]) for r in
               bpe_token_counts(docs, merges).collect()}
        # 'ab' -> [ab, </w>] = 2 tokens; 'cd' -> [c, d, </w>] = 3
        assert got["d1"] == (2 + 2 + 3, 3)
        assert got["d3"] == (2, 1)
        assert "d2" not in got  # no letters-only words

    def test_encode_plan_is_udf_free(self, spark):
        from sparkdoc.bpe import encode_words

        words = spark.createDataFrame([("hello",)], "word string")
        plan = encode_words(words, [("l", "l")])._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestScaleEncoder:
    @given(st.lists(st.text(alphabet="ab", min_size=1, max_size=12), min_size=1, max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_ranked_kernel_matches_sequential_twin(self, words):
        """Property: min-rank iterative encode (the pandas kernel) is
        bit-equal to the sequential merge-order twin (== the expr chain),
        over merges actually LEARNED from the words (so the
        symbols-predate-merge invariant holds, as it always does for a
        real fit)."""
        from sparkdoc.bpe import encode_word_py, encode_word_ranked, fit_bpe_py

        cnt: dict[str, int] = {}
        for w in words:
            cnt[w] = cnt.get(w, 0) + 1
        merges = fit_bpe_py(cnt, n_merges=12)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in cnt:
            assert encode_word_ranked(w, ranks) == encode_word_py(w, merges)

    def test_pandas_impl_parity_with_expr(self, spark):
        """encode_words(impl='pandas') is bit-equal to impl='expr' on a
        real fit — the pin that lets the scale path substitute for the
        oracle-replayable chain."""
        from sparkdoc.bpe import encode_words, fit_bpe, word_counts

        docs = spark.createDataFrame(
            [(i, "the quick brown fox ababab banana bandana the the fox")
             for i in range(4)],
            "doc_id int, text string",
        )
        wc = word_counts(docs).persist()
        merges = fit_bpe(wc, n_merges=10)
        a = {r["word"]: (r["tokens"], r["n_tokens"])
             for r in encode_words(wc, merges, impl="expr").collect()}
        b = {r["word"]: (r["tokens"], r["n_tokens"])
             for r in encode_words(wc, merges, impl="pandas").collect()}
        assert a == b and len(a) > 0
        wc.unpersist()

    def test_auto_selects_pandas_above_limit(self, spark):
        from sparkdoc.bpe import EXPR_MERGE_LIMIT, encode_words

        words = spark.createDataFrame([("abc",)], "word string")
        merges = [(chr(97 + i % 26), chr(97 + (i // 26) % 26))
                  for i in range(EXPR_MERGE_LIMIT + 1)]
        # must not raise building the plan; result well-formed
        out = encode_words(words, merges).collect()
        assert out and out[0]["n_tokens"] == len(out[0]["tokens"])

    def test_30k_merge_encode_completes(self, spark):
        """A real-vocab-scale merge table (30k merges, structurally
        consistent: every merge's symbols predate it) encodes the synth
        corpus' distinct words in one Arrow stage — the plan the expr
        chain cannot build (its tree would be ~2*10^5 nodes)."""
        from sparkdoc.bpe import END, encode_words, word_counts
        from sparkdoc.synth import synth_text_documents

        # deterministic consistent merge table: symbol pool seeded with
        # a-z + END; merge i combines two pool symbols picked by a fixed
        # LCG, appending the result to the pool
        pool = [chr(c) for c in range(97, 123)] + [END]
        merges = []
        x = 123456789
        for _ in range(30000):
            x = (1103515245 * x + 12345) % (1 << 31)
            a = pool[x % (len(pool) - 1)]  # END never on the left
            x = (1103515245 * x + 12345) % (1 << 31)
            b = pool[x % len(pool)]
            merges.append((a, b))
            pool.append(a + b)
        docs = synth_text_documents(spark, 2000, 42).select("doc_id", "text")
        wc = word_counts(docs)
        enc = encode_words(wc, merges)  # auto -> pandas
        rows = enc.collect()
        assert len(rows) > 0
        for r in rows[:200]:
            toks = r["tokens"]
            joined = "".join(toks).replace(END, "")
            assert joined == r["word"]


class TestFitSampling:
    def test_max_words_caps_the_fit_deterministically(self, spark):
        """The documented sampling contract: fitting on the top-N words by
        frequency equals the python twin fit on exactly that capped set,
        and the learned merges still encode EVERY word (including ones
        outside the fit sample)."""
        from pyspark.sql import functions as F

        from sparkdoc.bpe import (
            encode_word_ranked, encode_words, fit_bpe, fit_bpe_py, word_counts,
        )

        docs = spark.createDataFrame(
            [(0, "aaa aaa aaa aaa bbb bbb ccc zzz"),
             (1, "aaa aaa bbb ccc ddd qqq"),
             (2, "aaa bbb ccc xyz")],
            "doc_id int, text string",
        )
        wc = word_counts(docs).persist()
        merges = fit_bpe(wc, n_merges=6, max_words=3)
        top3 = {r["word"]: r["cnt"] for r in
                wc.orderBy(F.desc("cnt"), F.asc("word")).limit(3).collect()}
        assert merges == fit_bpe_py(top3, n_merges=6)
        # out-of-sample words still encode through the merge table
        out = {r["word"]: r["tokens"]
               for r in encode_words(wc.select("word"), merges).collect()}
        ranks = {p: i for i, p in enumerate(merges)}
        for w, toks in out.items():
            assert toks == encode_word_ranked(w, ranks)
        wc.unpersist()
